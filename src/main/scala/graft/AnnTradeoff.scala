package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ANN index-selection audit: recall AND wall-time for every ANN variant
  * on the SAME ×N corpus, one committed JSON (`ANN_TRADEOFF.json`) — the
  * table an operator picking an index actually consults. Each variant is
  * timed at its DOCUMENTED scale-path conf (planes +log2(factor) for
  * constant bucket occupancy, centroidMod ×factor for constant centroid
  * count — the same doctrine as ScaleStress), because that is the conf
  * it would actually run with at that corpus size.
  *
  * Two recall protocols, matching the two query shapes in the engine:
  *  - top-k probe family (`ann_topk_brute`, `ann_sq8`, `ann_binary_sign`,
  *    `ann_pq_adc`, `ann_ivf_probe`, `ann_ivf_kmeans`): recall@k against
  *    the exact brute-force top-k of the same query set (vec_id < 10) on
  *    the same corpus, k = the variant's own depth (5 for the
  *    quantized probes, 3 for IVF);
  *  - all-vectors 1-NN family (`ann_lsh_bucket`, `ann_lsh_multiprobe`):
  *    recall@1 on a deterministic 1k-vector sample (vec_id < 1000) whose
  *    true 1-NN is computed by a sample×corpus brute-force pass —
  *    full-corpus 1-NN ground truth would be O(n²) at ×10.
  *
  * `pq_encode` is an encoder, not a search: its consultable quality
  * metric is mean quantization distortion (plus encode throughput), so
  * it reports that instead of recall.
  *
  * Usage: runMain graft.AnnTradeoff [smallDir] [factor] [outJson]
  */
object AnnTradeoff {

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2).getOrElse("ANN_TRADEOFF.json")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${GraftConf.cpuSpec(32)._1}]")
      .appName("graft-ann-tradeoff")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = ScaleStress.synthesize(spark, small, factor, Some(Set("embeddings")))
    val nVec = spark.read.parquet(s"$big/embeddings.parquet").count()

    // scale-path geometry for this factor (the knob IS the design)
    val planesAtScale =
      8 + math.ceil(math.log(factor.toDouble) / math.log(2)).toInt
    val centModAtScale = (32L * factor).toString
    val scaleConf: Map[String, Map[String, String]] = Map(
      "ann_lsh_bucket" -> Map("spark.graft.ann.planes" -> planesAtScale.toString),
      "ann_lsh_multiprobe" -> Map("spark.graft.ann.planes" -> planesAtScale.toString),
      "ann_ivf_probe" -> Map("spark.graft.ann.centroidMod" -> centModAtScale),
      "ann_ivf_nprobe" -> Map("spark.graft.ann.centroidMod" -> centModAtScale),
      "ann_ivf_kmeans" -> Map("spark.graft.ann.centroidMod" -> centModAtScale),
      "ann_ivfpq" -> Map("spark.graft.ann.centroidMod" -> centModAtScale),
      "ann_ivfpq_residual" -> Map("spark.graft.ann.centroidMod" -> centModAtScale),
      "ann_ivfpq_fitted" -> Map("spark.graft.ann.centroidMod" -> centModAtScale),
      "ann_ivfpq_nprobe" -> Map("spark.graft.ann.centroidMod" -> centModAtScale),
      "ann_ivfpq_refine" -> Map("spark.graft.ann.centroidMod" -> centModAtScale))

    // warm JVM + table cache
    SparkEntry.queries("ann_topk_brute")(spark, small).count()

    def timed(name: String): (Double, Array[org.apache.spark.sql.Row]) = {
      val conf = scaleConf.getOrElse(name, Map.empty)
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // min-of-2 wall time (NOTES_r02: only the floor is meaningful on
        // a shared box); rows collected once from the final rep
        var rows: Array[org.apache.spark.sql.Row] = null
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          rows = SparkEntry.queries(name)(spark, big).collect()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache(); System.gc(); Thread.sleep(1000)
          dt
        }.min
        (t, rows)
      } finally conf.keys.foreach(spark.conf.unset)
    }

    // ---- ground truths on the big corpus ----
    // top-5 per probe query: ann_topk_brute IS the exact answer
    val (tBrute, bruteRows) = timed("ann_topk_brute")
    val truthTop: Map[Long, Seq[Long]] = bruteRows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(_._3).toSeq }

    // true 1-NN for the deterministic sample, by sample×corpus brute force
    val emb = spark.read.parquet(s"$big/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
      .withColumn("nrm", aggregate(zip_with(col("e"), col("e"), _ * _),
        lit(0.0), _ + _))
    val sample = emb.filter(col("vec_id") < 1000)
      .select(col("vec_id").as("sid"), col("e").as("se"), col("nrm").as("sn"))
    val w1 = Window.partitionBy("sid").orderBy(col("cos").desc, col("vec_id").asc)
    val truth1: Map[Long, Long] = broadcast(sample)
      .join(emb, col("vec_id") =!= col("sid"))
      .select(col("sid"), col("vec_id"),
        (aggregate(zip_with(col("se"), col("e"), _ * _), lit(0.0), _ + _) /
          sqrt(col("sn") * col("nrm"))).as("cos"))
      .withColumn("rnk", row_number().over(w1)).filter(col("rnk") === 1)
      .select("sid", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    def fmt(d: Double) = f"$d%.4f"

    def topkEntry(name: String, k: Int): String = {
      val (t, rows) = timed(name)
      val found = rows.map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val recall = truthTop.map { case (q, topk) =>
        val want = topk.take(k)
        want.count(found.getOrElse(q, Set.empty).contains).toDouble / want.size
      }.sum / truthTop.size
      println(f"[ann] $name%-20s k=$k recall=${recall}%.3f t=${t}%.2fs")
      s""""$name":{"protocol":"topk_probe","k":$k,"recall_at_k":${fmt(recall)},""" +
        s""""wall_sec":${fmt(t)},"n_queries":${truthTop.size}${confJson(name)}}"""
    }

    def nn1Entry(name: String): String = {
      val (t, rows) = timed(name)
      // LSH shape: (vec_id, bucket, neighbor_id, cos)
      val found = rows.map(r => (r.getLong(0), r.getLong(2))).toMap
      val recall = truth1.count { case (v, nn) =>
        found.get(v).contains(nn) }.toDouble / truth1.size
      println(f"[ann] $name%-20s 1nn recall=${recall}%.3f t=${t}%.2fs")
      s""""$name":{"protocol":"all_vectors_1nn_sample","k":1,""" +
        s""""recall_at_k":${fmt(recall)},"wall_sec":${fmt(t)},""" +
        s""""n_sample":${truth1.size}${confJson(name)}}"""
    }

    def confJson(name: String): String = {
      val c = scaleConf.getOrElse(name, Map.empty)
      if (c.isEmpty) ""
      else c.map { case (k, v) => s""""$k":"$v"""" }
        .mkString(""","scale_conf":{""", ",", "}")
    }

    // ---- in-cell truths for the IVF-PQ family ----
    // The coarse quantizer caps the GLOBAL recall of every single-cell
    // tier identically (measured 0.067 at ×1 and ×10 — the exact in-cell
    // probe's own ceiling), so global recall cannot distinguish the
    // codebooks. The family's differentiator is IN-CELL ordering quality:
    // recall against the exact in-cell probe (ann_ivf_probe) at the same
    // depth, reported at BOTH scales (the ×1 regime is where the 12-bit
    // code budget still orders a ~32-vector cell; at ×10 the top-10-of-
    // ~320 ADC cut dominates every book — reported honestly).
    def setsOf(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (qq, rs) => qq -> rs.map(_._2).toSet }
    def recallVs(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
      truth.toSeq.map { case (qq, t) =>
        (got.getOrElse(qq, Set.empty[Long]) & t).size
      }.sum.toDouble / truth.values.map(_.size).sum
    val cellTruthBig = {
      scaleConf("ann_ivf_probe").foreach { case (k, v) => spark.conf.set(k, v) }
      try setsOf(SparkEntry.queries("ann_ivf_probe")(spark, big).collect())
      finally scaleConf("ann_ivf_probe").keys.foreach(spark.conf.unset)
    }
    val cellTruthSmall =
      setsOf(SparkEntry.queries("ann_ivf_probe")(spark, small).collect())

    /** topkEntry + the codebook-isolating in-cell recalls at both scales. */
    def ivfPqEntry(name: String): String = {
      val (t, rows) = timed(name)
      val found = rows.map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (qq, rs) => qq -> rs.map(_._2).toSet }
      val recall = truthTop.map { case (qq, topk) =>
        val want = topk.take(3)
        want.count(found.getOrElse(qq, Set.empty).contains).toDouble / want.size
      }.sum / truthTop.size
      val icBig = recallVs(setsOf(rows), cellTruthBig)
      val icSmall = recallVs(
        setsOf(SparkEntry.queries(name)(spark, small).collect()), cellTruthSmall)
      println(f"[ann] $name%-20s k=3 recall=${recall}%.3f " +
        f"in_cell_x1=${icSmall}%.3f in_cell_x$factor%d=${icBig}%.3f t=${t}%.2fs")
      s""""$name":{"protocol":"topk_probe","k":3,"recall_at_k":${fmt(recall)},""" +
        s""""in_cell_recall_x1":${fmt(icSmall)},""" +
        s""""in_cell_recall_x$factor":${fmt(icBig)},""" +
        s""""wall_sec":${fmt(t)},"n_queries":${truthTop.size}${confJson(name)}}"""
    }

    val entries = Seq(
      s""""ann_topk_brute":{"protocol":"topk_probe","k":5,"recall_at_k":1.0,""" +
        s""""wall_sec":${fmt(tBrute)},"n_queries":${truthTop.size},""" +
        s""""note":"exact — the ground truth the others approximate"}""",
      topkEntry("ann_sq8", 5),
      topkEntry("ann_binary_sign", 5),
      topkEntry("ann_pq_adc", 5),
      topkEntry("ann_pq_adc_fitted", 5),
      topkEntry("ann_ivf_probe", 3),
      topkEntry("ann_ivf_nprobe", 3),
      topkEntry("ann_ivf_kmeans", 3),
      ivfPqEntry("ann_ivfpq"),
      ivfPqEntry("ann_ivfpq_residual"),
      ivfPqEntry("ann_ivfpq_fitted"),
      ivfPqEntry("ann_ivfpq_nprobe"),
      ivfPqEntry("ann_ivfpq_refine"),
      nn1Entry("ann_lsh_bucket"),
      nn1Entry("ann_lsh_multiprobe"), {
        val (t, rows) = timed("pq_encode")
        val meanDist = rows.map(_.getDouble(6)).sum / rows.length
        println(f"[ann] pq_encode            distortion=${meanDist}%.4f t=${t}%.2fs")
        s""""pq_encode":{"protocol":"encoder","mean_distortion":${fmt(meanDist)},""" +
          s""""wall_sec":${fmt(t)},"n_encoded":${rows.length},""" +
          s""""note":"codebook quality proxy; ann_pq_adc searches these codes"}"""
      })

    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", GraftConf.round)
    val json =
      s"""{\n"round": "$round", "generated_at": "${java.time.Instant.now()}",\n""" +
        s""""corpus": "$big", "factor": $factor, "n_vectors": $nVec,\n""" +
        entries.mkString(",\n") + "\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    println(s"[ann] wrote $outJson")
    spark.stop()
  }
}
