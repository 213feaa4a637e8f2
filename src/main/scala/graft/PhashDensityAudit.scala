package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Band-space density audit for the image near-dup tiers — the
  * [[SpanSkewAudit]] shape applied to perceptual-hash banding: measures
  * `mm_image_neardup` (64-bit hash, 8 bands of 8 bits) against
  * `mm_image_neardup_mi` (256-bit, 16 bands of 16 bits) on a DIVERSE
  * synthetic image corpus at two scales, reporting wall exponents AND the
  * underlying band-collision candidate volumes.
  *
  * Why a synthetic corpus: the fixture's tiny tiled-ASCII rasters
  * concentrate hash values so heavily that BOTH band spaces saturate at a
  * few hundred images (measured: 27% of all pairs collide in the 64-bit
  * bands at sf0.01 — the adversarial-density case, but one where no band
  * length helps). The planted corpus here is the opposite regime the
  * tiers actually differ in: deterministic pseudorandom ASCII (chained
  * md5 hex) at the image law's MAX 16×14 geometry (see [[plant]] for why
  * the geometry must be pinned), giving the long hash its full sample
  * budget, so expected false-candidate volume is bands·n²/(2·space) —
  * space 2⁸ per band for the 64-bit tier vs ~2¹⁴ effective for the
  * multi-index tier's 16-bit bands (224 distinct samples over 256 grid
  * cells).
  *
  * The honest claims this buys (mirroring spanskew's uncapped-vs-capped):
  *  - the 64-bit tier on a diverse corpus is candidate-DOMINATED already
  *    at the small scale (n²/2⁸ ≫ n), so its wall exponent over the
  *    decade is expected near 2 — that is its documented quadratic tail,
  *    now measured rather than asserted;
  *  - the multi-index tier at the same scales stays scan-dominated
  *    (n²/2¹⁶ comparable to n), so its wall exponent stays within the
  *    family bound — the 256× band-space headroom is what the tier buys;
  *  - NEITHER tier is asymptotically linear: any fixed band space goes
  *    quadratic once n ≫ space (the candidates column shows the MI
  *    tier's volume growing too). The next rung is the same multi-index
  *    construction over longer codes/more bands — the construction
  *    extends verbatim, which is the point of shipping it as a tier
  *    rather than a constant.
  *
  * Timing protocol = ScaleStress doctrine: count() materialization,
  * min-of-2 with clearCache + GC between reps, image files materialized
  * by an untimed warmup pass (they are the fixture, not the query).
  *
  * Usage: runMain graft.PhashDensityAudit [nSmall] [factor] [outJson]
  */
object PhashDensityAudit {
  private val Bound = 1.3

  def main(args: Array[String]): Unit = {
    val nSmall = args.headOption.map(_.toInt).getOrElse(5000)
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2).getOrElse(s"SCALE_${GraftConf.round}_phash_density.json")
    val (cpuStr, cpus) = GraftConf.cpuSpec(32)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpuStr]")
      .appName("graft-phash-density-audit")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val small = plant(spark, nSmall, s"phashdens_${nSmall}")
    val big = plant(spark, nSmall * factor, s"phashdens_${nSmall * factor}")
    // the SATURATED-regime corpora for the MI cap measurement (see the
    // dense tier rows below): 100-char docs → the law's small rasters,
    // where the 16-bit bands' effective space collapses to the raster
    // entropy and occupancy actually crosses any fixed cap over the
    // measured decade — the regime the cap is designed for
    val denseSmall = plant(spark, nSmall, s"phashdens_d_${nSmall}", chars = 100)
    val denseBig = plant(spark, nSmall * factor,
      s"phashdens_d_${nSmall * factor}", chars = 100)

    // untimed warmup: materializes the PNG files and warms the JVM
    Seq(small, big, denseSmall, denseBig).foreach { d =>
      SparkEntry.queries("mm_image_phash")(spark, d).count()
    }

    def time(query: String, dir: String, conf: Map[String, String]): Double = {
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

    // capped 64-bit tier: the r15 verdict's remedy measured — a FIXED
    // per-bucket occupancy cap bounds candidates to n·bands·cap (linear
    // in n) whatever the bucket skew; 64 ≈ 3× the small corpus's
    // expected occupancy n/2⁸, so genuine sparse-regime buckets survive
    // and only saturated ones drop
    val CapConf = Map("spark.graft.phash.maxBucket" -> "64")
    // capped MI tier (r16 verdict #1): the same fixed occupancy cap
    // applied to the multi-index bands — its uncapped candidate exponent
    // measured 1.995 at this planted density (SCALE_r16), so the audit
    // now measures the cap's effect on the SAME corpus
    // diffuse-regime MI cap (64 ≈ 40× the small-scale mean occupancy):
    // expected and measured TRANSPARENT here — the diffuse bulk's
    // n²/space growth is not a hot tail and a cap must not touch it
    val MiCapConf = Map("spark.graft.phash.mi.maxBucket" -> "64")
    // saturated-regime MI cap, sized by the 64-bit row's doctrine
    // (~2.5× the small-scale mean bucket occupancy of the DENSE corpus):
    // this is where occupancy crosses the cap over the decade and the
    // cap actually bounds the tail
    val MiDenseCapConf = Map("spark.graft.phash.mi.maxBucket" -> "4")
    val tiers = Seq(
      ("mm_image_neardup", "64-bit aHash, 8 bands x 8 bits (space 2^8)", 8, 8,
        "phash", "mm_image_phash", Map.empty[String, String], 0L, small, big),
      ("mm_image_neardup[maxBucket=64]",
        "64-bit aHash, 8x8-bit bands, bucket cap 64 (candidates <= n*8*64)", 8, 8,
        "phash", "mm_image_phash", CapConf, 64L, small, big),
      ("mm_image_neardup_mi", "256-bit hash, 16 bands x 16 bits (space 2^16)", 16, 16,
        "phash256", "mm_image_phash256", Map.empty[String, String], 0L, small, big),
      ("mm_image_neardup_mi[mi.maxBucket=64]",
        "256-bit hash, 16x16-bit bands, bucket cap 64 (diffuse regime: transparent by design)", 16, 16,
        "phash256", "mm_image_phash256", MiCapConf, 64L, small, big),
      ("mm_image_neardup_mi[dense]",
        "256-bit hash on the SMALL-geometry corpus (effective band space ~ raster entropy)", 16, 16,
        "phash256", "mm_image_phash256", Map.empty[String, String], 0L,
        denseSmall, denseBig),
      ("mm_image_neardup_mi[dense,mi.maxBucket=4]",
        "256-bit hash, small-geometry corpus, bucket cap 4 (candidates <= n*16*4)", 16, 16,
        "phash256", "mm_image_phash256", MiDenseCapConf, 4L,
        denseSmall, denseBig))
    val rows = tiers.map { case (label, desc, nBands, bandW, hashCol, hashQ, conf, cap, dSmall, dBig) =>
      val qn = label.takeWhile(_ != '[')
      val candSmall = candidates(spark, dSmall, hashQ, hashCol, nBands, bandW, cap)
      val candBig = candidates(spark, dBig, hashQ, hashCol, nBands, bandW, cap)
      val ts = time(qn, dSmall, conf)
      val tb = time(qn, dBig, bigParts ++ conf)
      val e = math.log(tb / ts) / math.log(factor.toDouble)
      val ce = math.log(candBig.toDouble / math.max(1L, candSmall)) /
        math.log(factor.toDouble)
      println(f"[phashdens] $label%-28s small=$ts%7.2fs big=$tb%7.2fs exp=$e%5.2f " +
        f"cand=$candSmall%,d -> $candBig%,d (exp=$ce%4.2f)")
      (label, desc, ts, tb, e, candSmall, candBig, ce)
    }
    val mi = rows.find(_._1 == "mm_image_neardup_mi").get
    val json = s"""{"n_small":$nSmall,"factor":$factor,""" +
      s""""corpus":"diverse pseudorandom ASCII (chained md5 hex, fixed 285 chars => max 16x14 geometry); [dense] rows: 100-char docs => small rasters, effective MI band space ~ raster entropy (the saturated regime the cap is designed for)",""" +
      s""""model_exponent_bound":$Bound,"queries":{""" +
      rows.map { case (n, d, ts, tb, e, cs, cb, ce) =>
        s""""$n":{"bands":"$d","t_small_sec":${f"$ts%.3f"},""" +
          s""""t_big_sec":${f"$tb%.3f"},"exponent":${f"$e%.3f"},""" +
          s""""candidates_small":$cs,"candidates_big":$cb,""" +
          s""""candidate_exponent":${f"$ce%.3f"},""" +
          s""""within_model":${e <= Bound}}"""
      }.mkString(",") +
      s"""},"mi_within_model":${mi._5 <= Bound}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }

  /** Distinct band-collision pairs BEFORE the hamming verify — the
    * volume the exchange and the verify stage actually pay. */
  private def candidates(spark: SparkSession, dir: String, hashQ: String,
      hashCol: String, nBands: Int, bandW: Int, cap: Long = 0L): Long = {
    val ph = SparkEntry.queries(hashQ)(spark, dir).select(col("doc_id"), col(hashCol))
    val allBands = ph.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => col(hashCol).substr(b * bandW + 1, lit(bandW))))
        .as(Seq("band_idx", "band")))
    // mirror of MultiModalOps.capBandBuckets for the capped row's
    // candidate measurement
    val bands =
      if (cap <= 0L) allBands
      else {
        val hot = allBands.groupBy("band_idx", "band")
          .agg(count(lit(1)).as("occ")).filter(col("occ") > cap)
          .select("band_idx", "band")
        allBands.join(broadcast(hot), Seq("band_idx", "band"), "left_anti")
      }
    bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band") === col("y.band") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .distinct()
      .count()
  }

  /** Deterministic diverse corpus at the image law's MAX geometry:
    * pseudorandom ASCII text per doc (nine chained md5 hex blocks,
    * truncated to 285 chars — 285 ≡ 12 (mod 13) and ⌊285/13⌋ ≡ 10
    * (mod 11), so every image is the law's largest 16×14 raster and its
    * 224 pixels are DISTINCT text positions). The geometry is pinned to
    * the maximum deliberately: on the fixture law's smaller rasters the
    * 16×16 sampling grid revisits pixels, so the 256-bit hash carries
    * only w·h independent bits and BOTH tiers' band spaces collapse to
    * the raster entropy (a first run with 100–196-char docs measured
    * candidate exponent ≈2.0 for both tiers with the MI tier's 16-bit
    * bands at an effective space of ~800 — the corpus, not the
    * construction, was the cap). At 16×14 the long hash draws 224
    * distinct samples (~14 independent bits per 16-bit band) while the
    * 64-bit tier's 8-bit bands stay at 2⁸ — the regime the tiers
    * actually differ in. */
  private def plant(spark: SparkSession, n: Int, tag: String,
      chars: Int = 285): String = {
    val dst = s"${System.getProperty("java.io.tmpdir")}/graft_$tag"
    val marker = new java.io.File(dst, "_SUCCESS")
    if (!marker.exists()) {
      new java.io.File(dst).mkdirs()
      val blocks = (0 until 9).map(i =>
        md5(concat(col("id").cast("string"), lit(s"_$i"))))
      spark.range(n)
        .select(col("id").as("doc_id"), concat(blocks: _*).as("s"))
        .select(col("doc_id"),
          expr(s"substring(s, 1, $chars)").as("text"),
          lit("en").as("lang"), lit("synth").as("source"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      marker.createNewFile()
    }
    dst
  }
}
