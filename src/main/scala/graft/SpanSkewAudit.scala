package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew audit for the exact-substring span family: measures
  * `dedup_substring_spans` on corpora with a PLANTED boilerplate block —
  * the hot-shingle tail the operator's scaladoc documents — at sf0.1 and
  * at a ×factor replica, both uncapped and under the
  * `spark.graft.spans.maxDf` prefilter ([[graft.ops.DedupOps]]).
  *
  * The planted skew is the adversarial case for the postings join: the
  * SAME (unsuffixed) boilerplate lands on every doc_id ≡ 0 (mod 2)
  * across ALL replicas, so the hot shingles' per-source document
  * frequency grows ×factor with the corpus and their match-point volume
  * ×factor² — the quadratic term the df cap exists to cut. The honest
  * claims this audit buys:
  *  - UNCAPPED, the planted corpus scales SUPERLINEARLY (the exponent is
  *    expected ABOVE the family's 1.3 bound — that is the point);
  *  - CAPPED (maxDf well below the small-scale planted df, so both
  *    scales run the same deployed conf), the exponent returns within
  *    the bound: the prefilter restores the linear cost model under the
  *    exact skew that breaks it.
  *
  * Timing protocol = ScaleStress doctrine: count() materialization,
  * min-of-2 with clearCache + GC between reps, shuffle partitions sized
  * to data on the big corpus.
  *
  * Usage: runMain graft.SpanSkewAudit [smallDir] [factor] [outJson] [mode]
  *
  * `mode` (default "both"): "capped" times ONLY the deployed-conf capped
  * path, over BOTH span-family registry queries (`dedup_substring_spans`
  * and its consumer `span_excision`) — the ×100 third-decade audit,
  * where the uncapped planted corpus is deliberately not run: its pair
  * volume grows ×factor² BY CONSTRUCTION (that is what the ×10 run
  * proves, exponent 1.268), so timing it at ×100 would only burn hours
  * re-measuring the already-measured quadratic. The capped exponent at
  * ×100 is the number the family's 100-TB claim rides on.
  */
object SpanSkewAudit {
  private val Boiler = (0 until 20).map(i => s"zzb$i").mkString(" ")
  private val Cap = 32L
  private val Bound = 1.3

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2).getOrElse("SCALE_r14_spanskew.json")
    val mode = args.lift(3).getOrElse("both")
    val (cpuStr, cpus) = GraftConf.cpuSpec(32)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpuStr]")
      .appName("graft-span-skew-audit")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val plantedSmall = plant(spark, s"$small/documents.parquet",
      s"spanskew_small_${factor}")
    val bigBase = ScaleStress.synthesize(spark, small, factor,
      Some(Set("documents")))
    val plantedBig = plant(spark, s"$bigBase/documents.parquet",
      s"spanskew_big_${factor}")

    // planted-skew evidence: per-(shingle, source) df of the hottest key
    // at both scales — proves the df (and with it the uncapped pair
    // volume) actually grows with the corpus
    def hotDf(dir: String): Long = Tables.documents(spark, dir)
      .filter(col("text").contains("zzb0"))
      .groupBy("source").agg(countDistinct("doc_id").as("df"))
      .agg(max("df")).collect()(0).getLong(0)
    val dfSmall = hotDf(plantedSmall)
    val dfBig = hotDf(plantedBig)
    require(dfSmall > Cap,
      s"planted small-scale df $dfSmall must exceed the cap $Cap so both " +
        "scales run the deployed conf")

    def time(dir: String, conf: Map[String, String],
        query: String = "dedup_substring_spans"): Double = {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(query)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(2000)
        t
      }.min
      finally conf.keys.foreach(spark.conf.unset)
    }
    val bigParts = Map("spark.sql.shuffle.partitions" ->
      math.min(4096, cpus * factor).toString)
    val capConf = Map("spark.graft.spans.maxDf" -> Cap.toString)

    // warm the JVM before any timed run
    SparkEntry.queries("global_agg")(spark, small).count()

    if (mode == "capped") {
      // third-decade audit: the deployed (capped) conf only, both
      // span-family queries — see the usage note for why uncapped is
      // deliberately skipped here
      val rows = Seq("dedup_substring_spans", "span_excision").map { qn =>
        val ts = time(plantedSmall, capConf, qn)
        val tb = time(plantedBig, capConf ++ bigParts, qn)
        val e = math.log(tb / ts) / math.log(factor.toDouble)
        println(f"[spanskew] $qn%-22s capped small=$ts%7.2fs big=$tb%7.2fs exp=$e%5.2f")
        (qn, ts, tb, e)
      }
      val json = s"""{"mode":"capped","factor":$factor,""" +
        s""""planted_hot_df":{"small":$dfSmall,"big":$dfBig},""" +
        s""""cap":$Cap,"model_exponent_bound":$Bound,"queries":{""" +
        rows.map { case (n, ts, tb, e) =>
          s""""$n":{"t_small_sec":${f"$ts%.3f"},"t_big_sec":${f"$tb%.3f"},""" +
            s""""exponent":${f"$e%.3f"},"within_model":${e <= Bound}}"""
        }.mkString(",") +
        s"""},"n_over_model":${rows.count(_._4 > Bound)}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
        json.getBytes("UTF-8"))
      println(json)
      spark.stop()
      return
    }

    val rows = Seq(
      ("uncapped", time(plantedSmall, Map.empty),
        time(plantedBig, bigParts), false),
      ("capped", time(plantedSmall, capConf),
        time(plantedBig, capConf ++ bigParts), true))
      .map { case (name, ts, tb, bounded) =>
        val e = math.log(tb / ts) / math.log(factor.toDouble)
        println(f"[spanskew] $name%-9s small=$ts%7.2fs big=$tb%7.2fs exp=$e%5.2f")
        (name, ts, tb, e, bounded)
      }
    val capped = rows.find(_._1 == "capped").get
    val json = s"""{"query":"dedup_substring_spans","factor":$factor,""" +
      s""""planted_hot_df":{"small":$dfSmall,"big":$dfBig},""" +
      s""""cap":$Cap,"model_exponent_bound":$Bound,""" +
      rows.map { case (n, ts, tb, e, _) =>
        s""""$n":{"t_small_sec":${f"$ts%.3f"},"t_big_sec":${f"$tb%.3f"},""" +
          s""""exponent":${f"$e%.3f"}}"""
      }.mkString("", ",", ",") +
      s""""within_model":${capped._4 <= Bound}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }

  /** Appends the boilerplate block to every doc_id ≡ 0 (mod 2) of `src`
    * and writes the planted corpus once behind a marker. */
  private def plant(spark: SparkSession, src: String, tag: String): String = {
    val dst = s"${System.getProperty("java.io.tmpdir")}/graft_$tag"
    val marker = new java.io.File(dst, "_SUCCESS")
    if (!marker.exists()) {
      new java.io.File(dst).mkdirs()
      spark.read.parquet(src)
        .withColumn("text",
          when(col("doc_id") % 2 === 0, concat(col("text"), lit(" " + Boiler)))
            .otherwise(col("text")))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      marker.createNewFile()
    }
    dst
  }
}
