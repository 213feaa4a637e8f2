package graft

import graft.functions.VectorFunctions
import graft.ops.MultiModalOps.PngDecoder
import org.apache.spark.sql.functions._

class SimUdxSpec extends SparkSpec {

  test("native DotProduct equals the higher-order-function fold exactly") {
    val v = Tables.embeddings(spark, sf).limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val mism = v.select(
        VectorFunctions.vecDot(col("embedding"), col("embedding")).as("native"),
        hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mism === 0)
  }

  test("native SqL2Fold equals the higher-order-function fold exactly") {
    // the PQ family's l2Fold kernel (r18): bit-identical to the
    // aggregate(zip_with(...)) phrasing it replaced, on float×double
    // (the raw-embedding call shape) and double×double (residual/err)
    val v = Tables.embeddings(spark, sf).limit(200)
    val cent = array((0 until 8).map(i => lit(i * 0.125 - 0.4)): _*)
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, z) => acc + z)
    val s = slice(col("embedding"), 1, 8)
    val d = transform(slice(col("embedding"), 9, 8), _.cast("double"))
    val mism = v.select(
        VectorFunctions.vecL2Sq(s, cent).as("nf"), hof(s, cent).as("hf"),
        VectorFunctions.vecL2Sq(d, cent).as("nd"), hof(d, cent).as("hd"))
      .filter(col("nf") =!= col("hf") || col("nd") =!= col("hd")).count()
    assert(mism === 0)
  }

  test("SqL2Fold null semantics match zip_with padding (length mismatch / null element)") {
    // mismatched lengths and a null element must yield NULL (zip_with
    // pads with null and null poisons the sum); empty arrays fold to 0.0
    import spark.implicits._
    val rows = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),          // length mismatch -> null
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),     // equal -> 0.0
      (Seq.empty[Double], Seq.empty[Double])) // empty -> 0.0
      .toDF("a", "b")
      .select(VectorFunctions.vecL2Sq(col("a"), col("b")).as("d")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) === 0.0)
    assert(rows(2).getDouble(0) === 0.0)
    val withNullElem = spark.sql(
      "SELECT CAST(array(1.0, NULL) AS array<double>) a, " +
        "CAST(array(1.0, 2.0) AS array<double>) b")
      .select(VectorFunctions.vecL2Sq(col("a"), col("b")).as("d")).collect()
    assert(withNullElem(0).isNullAt(0))
  }

  test("SqL2Fold participates in whole-stage codegen and rejects float×float") {
    val v = Tables.embeddings(spark, sf)
      .select(VectorFunctions.vecL2Sq(
        transform(slice(col("embedding"), 1, 8), _.cast("double")),
        array((0 until 8).map(_ => lit(0.0)): _*)).as("d"))
    val codegen = v.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegen.isDefined, s"no codegen span in:\n${v.queryExecution.executedPlan}")
    // float×float would fold in FLOAT under zip_with coercion — the
    // native kernel refuses it instead of silently widening
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Tables.embeddings(spark, sf)
        .select(VectorFunctions.vecL2Sq(
          slice(col("embedding"), 1, 8), slice(col("embedding"), 9, 8)))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("float"))
  }

  test("DotProduct participates in whole-stage codegen") {
    val v = Tables.embeddings(spark, sf)
      .select(VectorFunctions.vecDot(col("embedding"), col("embedding")).as("d"))
    val codegen = v.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegen.isDefined, s"no codegen span in:\n${v.queryExecution.executedPlan}")
  }

  test("embed_top_pairs cosine within [-1, 1] and descending") {
    val rows = q("embed_top_pairs").collect()
    assert(rows.length === 20)
    val cs = rows.map(_.getAs[Double]("cos"))
    assert(cs.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    assert(cs.sameElements(cs.sorted(Ordering[Double].reverse)))
  }

  test("ann_topk_brute: 5 neighbors per query, none self") {
    val df = q("ann_topk_brute")
    assert(df.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() === 0)
  }

  test("ann_lsh_bucket: reported neighbor shares the bucket and cosine <= brute-force best") {
    val lsh = q("ann_lsh_bucket").filter(col("neighbor_id") >= 0)
    // brute-force best cosine per vector (no bucket restriction)
    val v = Tables.embeddings(spark, sf)
      .withColumn("nrm", VectorFunctions.vecDot(col("embedding"), col("embedding")))
    val best = v.as("a").join(v.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        (VectorFunctions.vecDot(col("a.embedding"), col("b.embedding")) /
          sqrt(col("a.nrm") * col("b.nrm"))).as("cos"))
      .groupBy("vec_id").agg(max("cos").as("best_cos"))
    val bad = lsh.join(best, "vec_id")
      .filter(col("cos") > col("best_cos") + 1e-12).count()
    assert(bad === 0)
  }

  test("ann_lsh_bucket geometry: coarser planes never worsen the found neighbor") {
    // bucket(nplanes=4) is the low-4-bit projection of bucket(nplanes=8):
    // every 8-plane bucket is contained in a 4-plane bucket, so the
    // candidate set only grows and the best in-bucket cosine is monotone.
    // This is the occupancy/recall dial documented in SimOps: more planes
    // = smaller buckets = cheaper (PairEnum-bounded) pair work, at most a
    // recall loss — never a correctness change.
    import graft.ops.SimOps
    val fine = q("ann_lsh_bucket").select(col("vec_id"), col("cos").as("fine_cos"))
    val coarse = SimOps.annLshBucketG(spark, sf, 4)
      .select(col("vec_id"), col("cos").as("coarse_cos"))
    assert(coarse.groupBy("vec_id").count().filter(col("count") > 1).count() === 0)
    val worse = fine.join(coarse, "vec_id")
      .filter(col("coarse_cos") < col("fine_cos") - 1e-12).count()
    assert(worse === 0)
  }

  test("embed_top_pairs plans without broadcast-nested-loop or cartesian") {
    val plan = q("embed_top_pairs").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"all-pairs baseline must stay block-decomposed:\n$plan")
  }

  test("ann_ivf_probe: neighbors come from the query's own cell") {
    val df = q("ann_ivf_probe")
    assert(df.count() > 0)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() === 0)
    assert(df.groupBy("query_id").count().filter(col("count") > 3).count() === 0)
  }

  test("ann_ivf_kmeans: fitted quantizer recall@3 >= deterministic quantizer recall@3") {
    // ground truth: brute-force top-3 per query
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("rnk") <= 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairSet(q("ann_topk_brute"))
    val probe = pairSet(q("ann_ivf_probe"))
    val fitted = pairSet(q("ann_ivf_kmeans"))
    def recall(s: Set[(Long, Long)]) = (s & brute).size.toDouble / brute.size
    assert(recall(fitted) >= recall(probe),
      s"k-means IVF recall ${recall(fitted)} < deterministic-quantizer recall ${recall(probe)}")
    // sanity: result shape — one ranked list of <=3 per query, no self-neighbors
    val df = q("ann_ivf_kmeans")
    assert(df.filter(col("query_id") === col("neighbor_id")).count() === 0)
    assert(df.groupBy("query_id").count().filter(col("count") > 3).count() === 0)
  }

  test("word_count_salted equals word_count exactly") {
    val a = q("word_count").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = q("word_count_salted").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("pivot_status row sums equal per-priority counts") {
    val p = q("pivot_status")
    val total = p.select((col("F") + col("O") + col("P")).as("s"))
      .agg(sum("s")).collect()(0).getLong(0)
    assert(total === Tables.orders(spark, sf).count())
  }

  test("above_customer_avg: every row beats its customer average") {
    val ca = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(avg("o_totalprice").as("a"))
    val bad = q("above_customer_avg").join(ca, "o_custkey")
      .filter(col("o_totalprice") <= col("a") - 1e-6).count()
    assert(bad === 0)
  }

  test("PngDecoder round-trips the fixture encoding and mm_decode matches it") {
    // unit: encode a known raster through the same javax.imageio path the
    // fixture writer uses, decode it back, pixels must be IDENTICAL
    // (PNG is lossless; this pins the writer↔decoder contract)
    val w = 7; val h = 5
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    for (i <- 0 until w * h) img.getRaster.setSample(i % w, i / w, 0, px(i) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = PngDecoder.decode(bos.toByteArray)
    assert(d.width === w && d.height === h)
    assert(d.raster.toSeq === px.toSeq)

    // integration: the registered query's decoded geometry and pixel sum
    // for doc 0 match the fixture formula computed directly from the text
    val row = q("mm_decode").filter(col("doc_id") === 0).collect()(0)
    val text = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .collect()(0).getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length
    val ew = (n % 13) + 4
    val eh = (n / 13) % 11 + 4
    val esum = (0 until ew * eh).map(i => (bytes(i % n) & 0xff).toLong).sum
    assert(row.getAs[Long]("width") === ew.toLong)
    assert(row.getAs[Long]("height") === eh.toLong)
    assert(row.getAs[Long]("px_sum") === esum)
  }

  test("mm_resize: thumbnail pinned to the Resizer contract on real bytes") {
    import graft.ops.MultiModalOps.Resizer
    // unit: blocks of a known byte ramp average exactly
    val ramp = Array.tabulate(128)(i => i.toByte)
    val t = Resizer.thumbnail(ramp)
    assert(t.length === Resizer.OutW * Resizer.OutH)
    assert(t(0) === 0L && t.last === 126L) // last 2-byte block: (126+127)/2
    // query row equals the same algorithm applied to the doc's UTF-8 bytes
    val row = q("mm_resize").filter(col("doc_id") === 0).collect()(0)
    val text = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .collect()(0).getAs[String]("text")
    assert(row.getAs[Long]("thumb_sum") ===
      Resizer.thumbnail(text.getBytes("UTF-8")).sum)
    assert(row.getAs[Long]("out_w") === 8L && row.getAs[Long]("out_h") === 8L)
  }

  test("mm_frame_sample: sampled slices are the real byte ranges") {
    import graft.ops.MultiModalOps.FrameSampler
    val bytes = Array.tabulate(1000)(i => (i % 251).toByte)
    val frames = FrameSampler.sample(7L, bytes).toSeq
    assert(frames.map(_.frame_idx) === Seq(0L)) // 4 frames -> sample idx 0 only
    val big = FrameSampler.sample(7L, Array.fill(256 * 9 + 10)(1.toByte)).toSeq
    assert(big.map(_.frame_idx) === Seq(0L, 4L, 8L))
    assert(big.map(_.frame_len) === Seq(256L, 256L, 256L))
  }

  test("external-command failure propagates to the action (O13: stricter than warn-and-continue)") {
    val rdd = spark.sparkContext.parallelize(Seq("x"), 1).pipe(Seq("false"))
    intercept[org.apache.spark.SparkException] { rdd.collect() }
  }

  test("pipe_cat_count equals document count") {
    val n = q("pipe_cat_count").collect()(0).getAs[Long]("n_lines")
    assert(n === Tables.documents(spark, sf).count())
  }

  test("udaf weighted mean matches direct computation") {
    val got = q("udaf_weighted_mean").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg((sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity"))).as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) => assert(math.abs(v - direct(k)) < 1e-6) }
  }

  test("udf_normalize digest is stable for already-normal text") {
    import spark.implicits._
    val df = Seq((1L, "abc def")).toDF("doc_id", "text")
    val norm = udf((s: String) =>
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim)
    val out = df.select(norm(col("text"))).collect()(0).getString(0)
    assert(out === "abc def")
  }

  test("typed_cogroup equals the untyped left-join twin row-for-row") {
    val twin = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      .groupBy("o_orderkey")
      .agg(max(col("o_totalprice")).as("o_totalprice"),
        count(col("l_orderkey")).as("n_lines"),
        coalesce(sum(col("l_quantity").cast("decimal(18,2)")), lit(0))
          .cast("double").as("sum_qty"),
        coalesce(sum(col("l_extendedprice").cast("decimal(18,2)")), lit(0))
          .cast("double").as("sum_price"))
      .orderBy("o_orderkey")
    val got = q("typed_cogroup").collect()
    assert(got.toSeq === twin.collect().toSeq)
    // cogroup keeps line-less orders (LEFT semantics): all orders present
    assert(got.length === Tables.orders(spark, sf).count())
  }

  test("SortedLongIntersect equals array_intersect on sorted distinct arrays") {
    import spark.implicits._
    // adversarial shapes: disjoint, contained, interleaved, empty, equal
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L, 4L, 5L), Seq(2L, 4L)),
      (Seq(10L, 20L, 30L), Seq(5L, 10L, 25L, 30L, 40L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val mism = df.select(
        VectorFunctions.sortedLongIntersect(col("a"), col("b")).as("native"),
        array_intersect(col("a"), col("b")).as("generic"),
        VectorFunctions.sortedLongIntersectCount(col("a"), col("b")).as("n"))
      .filter(col("native") =!= col("generic") ||
        col("n") =!= size(col("generic")).cast("long"))
      .count()
    assert(mism === 0)
  }

  test("SortedLongIntersect rejects nullable-element arrays at analysis time") {
    // the kernels read with getLong, which on a null slot of an
    // UnsafeArrayData silently reads garbage — the type gate must fail
    // analysis for containsNull = true rather than produce wrong answers
    val nullable = spark.range(4)
      .select(array(col("id"), when(col("id") > 1, col("id"))).as("a"),
        array(col("id")).as("b"))
    assert(nullable.schema("a").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      nullable.select(
        VectorFunctions.sortedLongIntersect(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("non-null"), err.getMessage)
  }

  test("SortedLongIntersect participates in whole-stage codegen") {
    // a literal table constant-folds to LocalTableScan (no codegen span),
    // so build the sorted arrays from a range scan
    val df = spark.range(16)
      .select(sequence(lit(0L), col("id") % 5).as("a"),
        sequence(col("id") % 3, lit(6L)).as("b"))
      .select(VectorFunctions.sortedLongIntersect(col("a"), col("b")).as("w"),
        VectorFunctions.sortedLongIntersectCount(col("a"), col("b")).as("n"))
    val codegen = df.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegen.isDefined, s"no codegen span in:\n${df.queryExecution.executedPlan}")
  }

  test("mm_audio_segments replays the adaptive energy gate + run fusion on the contour") {
    val frames = q("mm_audio_energy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = frames.groupBy(_._1).toSeq.flatMap { case (doc, fs) =>
      val clipEnergy = fs.map(_._3).sum
      val clipLen = fs.map(_._4).sum
      val active = fs.sortBy(_._2)
        .filter(f => f._3 * clipLen > clipEnergy * f._4)
      // fuse consecutive frame indices into maximal runs
      active.foldLeft(Vector.empty[(Long, Long, Long, Long)]) {
        case (acc, (_, idx, en, _)) =>
          acc.lastOption match {
            case Some((d, s, n, e)) if idx == s + n =>
              acc.init :+ ((d, s, n + 1, e + en))
            case _ => acc :+ ((doc, idx, 1L, en))
          }
      }
    }.sortBy { case (d, s, _, _) => (d, s) }
    val got = q("mm_audio_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want.toSeq)
    // the gate must actually partition frames: some active, some not
    assert(frames.length > got.map(_._3).sum, "every frame active — gate degenerate")
    assert(got.nonEmpty, "no active segments — gate degenerate")
    // and runs must actually fuse somewhere (a segment longer than 1 frame)
    assert(got.exists(_._3 > 1), "no multi-frame segment — fusion untested")
  }

  test("mm_image_neardup: banded join equals brute-force hamming (lossless at t=7)") {
    val ph = q("mm_image_phash").collect()
      .map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    // every phash is a 64-char bit string
    ph.foreach { case (_, p) =>
      assert(p.length === 64 && p.forall(c => c == '0' || c == '1'))
    }
    def hamming(a: String, b: String): Int =
      a.iterator.zip(b.iterator).count { case (x, y) => x != y }
    val want = (for {
      i <- ph.indices.iterator
      j <- (i + 1) until ph.length
      h = hamming(ph(i)._2, ph(j)._2) if h <= 7
    } yield (ph(i)._1, ph(j)._1, h.toLong)).toSeq.sorted
    val got = q("mm_image_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want, "banded candidate set diverged from brute force")
    // the threshold must actually admit pairs at this scale (15 at
    // sf0.001) — an empty result would make the equality above vacuous
    assert(got.nonEmpty, "no near-dup pair — threshold degenerate at fixture scale")
  }

  test("mm_image_neardup: the conf-gated bucket cap replays exactly and no-ops above occupancy") {
    val ph = q("mm_image_phash").collect()
      .map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    def hamming(a: String, b: String): Int =
      a.iterator.zip(b.iterator).count { case (x, y) => x != y }
    // driver-side replay of the capped band algorithm: per-band buckets,
    // drop buckets with occupancy > cap, pairs from surviving buckets,
    // exact hamming verify — the capBandBuckets contract
    def cappedBrute(cap: Int): Seq[(Long, Long, Long)] = {
      val buckets = (for {
        (id, p) <- ph.iterator
        b <- 0 until 8
      } yield ((b, p.substring(b * 8, b * 8 + 8)), id)).toSeq
        .groupBy(_._1).values.map(_.map(_._2)).filter(_.size <= cap)
      val byId = ph.toMap
      buckets.flatMap(ids =>
        for { i <- ids; j <- ids if i < j } yield (i, j))
        .toSeq.distinct
        .map { case (i, j) => (i, j, hamming(byId(i), byId(j)).toLong) }
        .filter(_._3 <= 7).sorted
    }
    val uncapped = q("mm_image_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def withCap(c: Long) = {
      spark.conf.set("spark.graft.phash.maxBucket", c.toString)
      try q("mm_image_neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      finally spark.conf.unset("spark.graft.phash.maxBucket")
    }
    // a cap above every bucket's occupancy is a no-op — bit-identical
    assert(withCap(1000000000L) === uncapped, "huge cap changed the result")
    // a binding cap replays the driver-side capped algorithm exactly,
    // and on this dense fixture (saturated 2⁸ buckets) it actually binds
    val capped = withCap(4L)
    assert(capped === cappedBrute(4), "capped band join diverged from replay")
    assert(capped.toSet.subsetOf(uncapped.toSet), "cap invented a pair")
    assert(capped.size < uncapped.size,
      "cap=4 did not bind on the saturated fixture — the pin is vacuous")
  }

  test("mm_image_neardup_mi: 16×16-bit multi-index equals brute force; finds planted dups") {
    def hamming(a: String, b: String): Int =
      a.iterator.zip(b.iterator).count { case (x, y) => x != y }
    def brute(ph: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
      (for {
        i <- ph.indices.iterator
        j <- (i + 1) until ph.length
        h = hamming(ph(i)._2, ph(j)._2) if h <= 15
      } yield (ph(i)._1, ph(j)._1, h.toLong)).toSeq.sorted
    // fixture: equality vs brute force (the 256-bit space is SPARSE at
    // this scale — the fixture pair set may be empty, which is exactly
    // the tier's point; the planted corpus below makes the match branch
    // non-vacuous)
    val ph = q("mm_image_phash256").collect()
      .map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    ph.foreach { case (_, p) =>
      assert(p.length === 256 && p.forall(c => c == '0' || c == '1'))
    }
    val got = q("mm_image_neardup_mi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === brute(ph.toSeq), "multi-index candidate set diverged from brute force")
    // planted corpus: two identical-text groups (identical rasters →
    // hamming 0), one single-char-perturbed doc (same length → same
    // geometry, whatever hamming it lands at brute force must agree),
    // one unrelated doc
    val dir = java.nio.file.Files.createTempDirectory("graft_mi_plant").toString
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (0L, base, "en", "s"), (1L, base, "en", "s"),
      (2L, base.replace('q', 'r'), "en", "s"),
      (3L, "a completely different text with its own raster geometry !!", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val php = SparkEntry.queries("mm_image_phash256")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    val gotP = SparkEntry.queries("mm_image_neardup_mi")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotP === brute(php.toSeq))
    assert(gotP.contains((0L, 1L, 0L)), s"identical images not paired at hamming 0: $gotP")
    assert(gotP.nonEmpty && gotP.size < 6, s"planted pair structure off: $gotP")
  }

  test("mm_image_neardup_mi: the conf-gated bucket cap replays exactly and no-ops above occupancy") {
    def hamming(a: String, b: String): Int =
      a.iterator.zip(b.iterator).count { case (x, y) => x != y }
    // planted DENSE corpus (the fixture's 2¹⁶ band space is sparse, so a
    // cap could never bind there): six identical docs — identical rasters,
    // all 16 bands collide at occupancy 6 — plus two distinct docs
    val dir = java.nio.file.Files.createTempDirectory("graft_mi_cap").toString
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    ((0L to 5L).map(i => (i, base, "en", "s")) ++ Seq(
      (6L, base.replace('q', 'r'), "en", "s"),
      (7L, "a completely different text with its own raster geometry !!", "en", "s")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val ph = SparkEntry.queries("mm_image_phash256")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    // driver-side replay of the capped band algorithm: 16×16-bit band
    // buckets, drop buckets with occupancy > cap, pairs from surviving
    // buckets, exact hamming verify — the capBandBuckets contract
    def cappedBrute(cap: Int): Seq[(Long, Long, Long)] = {
      val buckets = (for {
        (id, p) <- ph.iterator
        b <- 0 until 16
      } yield ((b, p.substring(b * 16, b * 16 + 16)), id)).toSeq
        .groupBy(_._1).values.map(_.map(_._2)).filter(_.size <= cap)
      val byId = ph.toMap
      buckets.flatMap(ids =>
        for { i <- ids; j <- ids if i < j } yield (i, j))
        .toSeq.distinct
        .map { case (i, j) => (i, j, hamming(byId(i), byId(j)).toLong) }
        .filter(_._3 <= 15).sorted
    }
    def run() = SparkEntry.queries("mm_image_neardup_mi")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val uncapped = run()
    def withCap(c: Long) = {
      spark.conf.set("spark.graft.phash.mi.maxBucket", c.toString)
      try run()
      finally spark.conf.unset("spark.graft.phash.mi.maxBucket")
    }
    // a cap above every bucket's occupancy is a no-op — bit-identical
    assert(withCap(1000000000L) === uncapped, "huge cap changed the result")
    // a binding cap replays the driver-side capped algorithm exactly, and
    // on the planted corpus (occupancy-6 buckets) cap=4 actually binds
    val capped = withCap(4L)
    assert(capped === cappedBrute(4), "capped MI band join diverged from replay")
    assert(capped.toSet.subsetOf(uncapped.toSet), "cap invented a pair")
    assert(capped.size < uncapped.size,
      "cap=4 did not bind on the planted dense corpus — the pin is vacuous")
  }

  test("mm_audio_packed decodes the packed layout bit-identically to the small-files path") {
    val direct = q("mm_audio_decode").collect().map(_.toSeq)
    val packed = q("mm_audio_packed").collect().map(_.toSeq)
    assert(packed.length === direct.length)
    assert(packed.toSeq === direct.toSeq)
  }

  test("mm_media_pack accounting equals the WAV size law and the actual packed bytes") {
    import org.apache.spark.sql.functions._
    val got = q("mm_media_pack").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // 44-byte canonical PCM header + 16 bytes of payload per text byte
    val want = graft.Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(length(col("text")) * 16 + 44).cast("long").as("b"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    // and the totals really are measured off the packed container, whose
    // clip count must match the catalog (no clip lost or duplicated)
    assert(got.values.map(_._1).sum ===
      graft.Tables.documents(spark, sf).count())
  }
}
