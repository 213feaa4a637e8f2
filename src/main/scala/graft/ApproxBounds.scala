package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-visible evidence for the two rows-only registry queries.
  *
  * `approx_distinct` (HLL) and `quantiles_approx` (percentile sketch) are
  * approximate BY SEMANTICS, so they can't sit under the DuckDB hash gate
  * the other queries use. Their correctness story is an error bound
  * against their exact oracled twins (`count_distinct` / `quantiles`) —
  * asserted in CoreOpsSpec on every test run, and emitted here as a
  * committed artifact (`APPROX_BOUNDS.json`) so the evidence lives in the
  * repo, not only in test output.
  *
  * Bounds mirror the spec: HLL at rsd=0.01 is checked at 5% (≫5σ);
  * approx_percentile at accuracy=10⁴ is checked at 1% relative error.
  */
object ApproxBounds {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val (cpuStr, cpus) = GraftConf.cpuSpec(8)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpuStr]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Driver-generated fixtures carry naive (isAdjustedToUTC=false) parquet
      // timestamps; read them as TIMESTAMP (session tz = UTC), not NTZ, so
      // unix_micros/window arithmetic keeps the semantics every oracle pins.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def entry(sfDir: String): String = {
      val approxD = SparkEntry.queries("approx_distinct")(spark, sfDir).collect()(0)
      val exactParts = Tables.lineitem(spark, sfDir).select("l_partkey").distinct().count()
      val exactOrders = Tables.lineitem(spark, sfDir).select("l_orderkey").distinct().count()
      val approxQ = SparkEntry.queries("quantiles_approx")(spark, sfDir).collect()(0)
      val exactQ = SparkEntry.queries("quantiles")(spark, sfDir).collect()(0)
      def relErr(a: Double, e: Double): Double = math.abs(a - e) / math.abs(e)
      val hll = Seq(
        ("approx_parts", approxD.getAs[Long]("approx_parts").toDouble, exactParts.toDouble),
        ("approx_orders", approxD.getAs[Long]("approx_orders").toDouble, exactOrders.toDouble))
      val pct = Seq("p50", "p90", "p99").map(c =>
        (c, approxQ.getAs[Double](c), exactQ.getAs[Double](c)))
      val hllJson = hll.map { case (k, a, e) =>
        f"""{"field":"$k","approx":${a.toLong},"exact":${e.toLong},"rel_err":${relErr(a, e)}%.6f,"bound":0.05,"pass":${relErr(a, e) <= 0.05}}"""
      }.mkString("[", ",", "]")
      val pctJson = pct.map { case (k, a, e) =>
        f"""{"field":"$k","approx":$a%.4f,"exact":$e%.4f,"rel_err":${relErr(a, e)}%.6f,"bound":0.01,"pass":${relErr(a, e) <= 0.01}}"""
      }.mkString("[", ",", "]")
      // DataSketches HLL tier: per-group + merged estimates vs exact
      // distincts, plus the exact mergeability equality (see SketchOps).
      val skRows = SparkEntry.queries("hll_sketch_union")(spark, sfDir).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
      val ev = Tables.events(spark, sfDir)
      val exactPer = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
      val exactAllU = ev.select("user_id").distinct().count()
      val skJson = (exactPer.toSeq.sortBy(_._1) :+ ("__ALL__", exactAllU)).map { case (t, e) =>
        val a = skRows(t).toDouble
        f"""{"field":"$t","approx":${a.toLong},"exact":$e,"rel_err":${relErr(a, e.toDouble)}%.6f,"bound":0.05,"pass":${relErr(a, e.toDouble) <= 0.05}}"""
      }.mkString("[", ",", "]")
      // KLL tier: the sketch bounds RANK, not value, so the recorded
      // error is the normalized-rank distance of each estimated quantile
      // from its target rank in the exact sort (k=800 → ~0.25% one-sided).
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
      val kllRows = SparkEntry.queries("kll_quantile_merge")(spark, sfDir).collect()
      val kllJson = kllRows.flatMap { r =>
        val slice = r.getAs[String]("slice")
        val pop = if (slice == "__ALL__") li else li.filter(col("l_returnflag") === slice)
        val n = pop.count().toDouble
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).map { case (c, p) =>
          val v = r.getAs[Double](c)
          val rankErr = math.abs(pop.filter(col("v") <= v).count() / n - p)
          f"""{"field":"$slice.$c","approx":$v%.4f,"rank_err":$rankErr%.6f,"bound":0.01,"pass":${rankErr <= 0.01}}"""
        }
      }.mkString("[", ",", "]")
      // Theta tier: set-algebra estimates vs exact distinct set ops at
      // the (user, day) grain (the grain where the populations differ).
      val thetaRow = SparkEntry.queries("theta_user_set_ops")(spark, sfDir).collect()(0)
      val userDay = graft.ops.SketchOps.userDayKey.as("ud")
      def userDays(t: String) = ev.filter(col("event_type") === t)
        .select(userDay).distinct()
      val (ca, cb) = (userDays("click").cache(), userDays("purchase").cache())
      val thetaExact = Seq(
        ("click_user_days", ca.count()), ("purchase_user_days", cb.count()),
        ("union_user_days", ca.union(cb).distinct().count()),
        ("intersect_user_days", ca.intersect(cb).count()),
        ("click_only_user_days", ca.except(cb).count()))
      val thetaJson = thetaExact.map { case (c, e) =>
        val a = thetaRow.getAs[Long](c).toDouble
        f"""{"field":"$c","approx":${a.toLong},"exact":$e,"rel_err":${relErr(a, e.toDouble)}%.6f,"bound":0.05,"pass":${relErr(a, e.toDouble) <= 0.05}}"""
      }.mkString("[", ",", "]")
      ca.unpersist(); cb.unpersist()
      s""""$sfDir": {"approx_distinct_vs_count_distinct": $hllJson, "quantiles_approx_vs_quantiles": $pctJson, "hll_sketch_union_vs_exact": $skJson, "kll_quantile_merge_rank_err": $kllJson, "theta_user_set_ops_vs_exact": $thetaJson}"""
    }

    // round + timestamp stamp: the artifact is re-generated each round's
    // session, and the stamp proves WHICH round's code produced it. The
    // fallback is the in-tree round constant (bumped per round alongside
    // the regeneration commit) — round 10 shipped "unstamped" because the
    // env var is builder-side only.
    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", GraftConf.round)
    val stamp = s""""round": "$round", "generated_at": "${java.time.Instant.now()}""""
    val json = sfDirs.map(entry).mkString("{\n" + stamp + ",\n", ",\n", "\n}\n")
    Files.writeString(Paths.get("APPROX_BOUNDS.json"), json)
    println(json)
    spark.stop()
  }
}
