package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.ops.{FileOps, MultiModalOps}
import graft.ops.MultiModalOps.GifDecoder

/** The video (multi-frame GIF) tier's codec contract, unit-tested at the
  * encode/decode seam — the spec that would have caught the JDK GIF
  * writer's interlace corruption (null metadata → interlaceFlag=TRUE →
  * h=4 frames decode with row 3 dropped and rows permuted) BEFORE the
  * driver's oracle did.
  *
  * Three layers:
  *   1. exhaustive geometry sweep — every (w, h, nFrames) the fixture
  *      formulas can produce (11×7×5 = 385 combos), write→read
  *      round-trip through the PRODUCTION encode helper and decoder;
  *   2. pinned clip + per-frame digests for fixed texts, computed
  *      independently of both the engine and the oracle;
  *   3. end-to-end: `mm_video_decode` on the sf0.001 corpus vs the
  *      rolling-scan formula recomputed from `documents.text` in the JVM.
  */
class VideoSpec extends SparkSpec {

  private def synthBytes(n: Int): Array[Byte] = {
    // deterministic, full 0..255 coverage (exercises the whole gray palette)
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = ((i * 37 + 13) % 256).toByte; i += 1 }
    b
  }

  private def encode(bytes: Array[Byte], w: Int, h: Int, nf: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    try FileOps.encodeGifFrames(writer, bytes, w, h, nf, bos)
    finally writer.dispose()
    bos.toByteArray
  }

  private def expectedRaster(bytes: Array[Byte], f: Int, w: Int, h: Int): Array[Byte] = {
    val n = bytes.length
    Array.tabulate(w * h)(i => bytes((f * w * h + i) % n))
  }

  test("write→read round-trip over every (w, h, nFrames) the formulas produce") {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try {
      // n mod 11 fixes w, (n/11) mod 7 fixes h, n mod 5 fixes nFrames.
      // For each target (a, b, c) pick n = 11*(b + 7*(k+5)) + a with
      // k = 3*(c - a - b) mod 5, which satisfies all three congruences
      // (2k ≡ c-a-b mod 5; 3 is 2's inverse) and keeps n ≥ 385 > 0.
      var checked = 0
      for (a <- 0 until 11; b <- 0 until 7; c <- 0 until 5) {
        val k = java.lang.Math.floorMod(3 * (c - a - b), 5)
        val n = 11 * (b + 7 * (k + 5)) + a
        val (w, h, nf) = FileOps.videoGeometry(n)
        assert((w, h, nf) === (a + 4, b + 4, c + 3), s"geometry for n=$n")
        val bytes = synthBytes(n)
        val d = GifDecoder.decode(reader, encode(bytes, w, h, nf))
        assert(d.width === w && d.height === h, s"dims for n=$n")
        assert(d.rasters.length === nf, s"frame count for n=$n")
        var f = 0
        while (f < nf) {
          assert(java.util.Arrays.equals(d.rasters(f), expectedRaster(bytes, f, w, h)),
            s"frame $f raster for (w=$w, h=$h, nf=$nf, n=$n)")
          f += 1
        }
        checked += 1
      }
      assert(checked === 385)
    } finally reader.dispose()
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  test("pinned whole-clip digests (independent of engine and oracle)") {
    // (text, expected clip md5, expected px_sum) — computed by hand from
    // the rolling-scan formula: concatenated rasters == repeat(bytes)
    // truncated to nFrames*w*h. The 'a' row is the h=4 geometry the
    // interlaced writer corrupted.
    val pinned = Seq(
      ("the quick brown fox", "ccfab269139b0795e83b614ffdd1d1f4", 40766L),
      ("graft video fixture pinned row two", "b7453b57487e1dae1edbc96c4d50e893", 23992L),
      ("a", "b15af9cdabbaea0516866a33d8fd0f98", 7760L))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try pinned.foreach { case (text, wantMd5, wantSum) =>
      val bytes = text.getBytes(StandardCharsets.UTF_8)
      val (w, h, nf) = FileOps.videoGeometry(bytes.length)
      val d = GifDecoder.decode(reader, encode(bytes, w, h, nf))
      val all = d.rasters.flatten
      assert(md5hex(all) === wantMd5, s"clip digest for '$text'")
      assert(all.map(_ & 0xff).map(_.toLong).sum === wantSum, s"px_sum for '$text'")
    } finally reader.dispose()
  }

  test("pinned per-frame digests for one clip") {
    val text = "the quick brown fox" // n=19 → w=12, h=5, nf=7
    val pinnedFrames = Seq(
      ("fccd2ed396b51a980b579ffe0712b8d3", 5850L),
      ("63dfbb4aa94c3b0214db81d24de20a2e", 5791L),
      ("c2eb4abeff8aa502a7a105629468ffbd", 5840L),
      ("389ca4d3f8abba40e51cd5ba93675ee8", 5773L),
      ("2825573b8384c28a37103e56222399a5", 5869L),
      ("c57ec3609e89b24d2eeed8793c06e7fa", 5774L),
      ("8abd8c8368026a8534d19112e9ee5c85", 5869L))
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val (w, h, nf) = FileOps.videoGeometry(bytes.length)
    assert(nf === pinnedFrames.length)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try {
      val d = GifDecoder.decode(reader, encode(bytes, w, h, nf))
      d.rasters.zip(pinnedFrames).zipWithIndex.foreach {
        case ((ras, (wantMd5, wantSum)), f) =>
          assert(md5hex(ras) === wantMd5, s"frame $f digest")
          assert(ras.map(_ & 0xff).map(_.toLong).sum === wantSum, s"frame $f px_sum")
      }
    } finally reader.dispose()
  }

  test("mm_video_decode end-to-end matches the formula recomputed from documents.text") {
    import org.apache.spark.sql.functions.col
    val got = q("mm_video_decode")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))))
      .toMap
    val want = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map { r =>
        val bytes = r.getString(1).getBytes(StandardCharsets.UTF_8)
        val (w, h, nf) = FileOps.videoGeometry(bytes.length)
        val all = Array.tabulate(nf * w * h)(j => bytes(j % bytes.length))
        r.getLong(0) ->
          ((nf.toLong, w.toLong, h.toLong, md5hex(all),
            all.map(_ & 0xff).map(_.toLong).sum))
      }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, exp) => assert(got(id) === exp, s"doc $id") }
  }

  test("mm_video_motion equals per-frame deltas of the formula-rebuilt clip") {
    import org.apache.spark.sql.functions.col
    val got = q("mm_video_motion").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val want = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().flatMap { r =>
        val bytes = r.getString(1).getBytes(StandardCharsets.UTF_8)
        val (w, h, nf) = FileOps.videoGeometry(bytes.length)
        val px = (f: Int, i: Int) => bytes((f * w * h + i) % bytes.length) & 0xff
        (1 until nf).map { f =>
          val ds = (0 until w * h).map(i => math.abs(px(f, i) - px(f - 1, i)))
          (r.getLong(0), f.toLong) -> ((ds.map(_.toLong).sum, ds.max.toLong))
        }
      }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, exp) => assert(got(k) === exp, s"clip/frame $k") }
  }
}
