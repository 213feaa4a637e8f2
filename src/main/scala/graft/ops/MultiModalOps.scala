package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): media as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The fixture corpus has no real image/audio bytes, so the *decoder* is a
  * deterministic stub ([[FakeDecoder]]; the container has no codec libs) —
  * but everything Spark-level is real and load-bearing: the decode path
  * reads ACTUAL file bytes through the `binaryFile` source (the per-doc
  * files materialized by [[FileOps.materializeDocFiles]]), carries them as
  * a `binary` column, and decodes them per partition with the
  * `mapPartitions` batch shape (decoder state constructed once per
  * partition, streamed per row — exactly how a JNI/FFmpeg/JPEG decoder
  * would be held). The metadata queries stay in columnar land.
  *
  * At 100 TB the decode stage is the classic CPU hot spot: it's a narrow
  * map (no shuffle), so it scales linearly with executors; the metadata
  * extraction path never materializes the bytes more than once.
  */
object MultiModalOps {
  type Q = (SparkSession, String) => DataFrame

  /** The stubbed media decode: deterministic pseudo-metadata from the raw
    * bytes. A real build replaces `decode` with the actual codec call —
    * the signature (bytes → width/height/channel-stat) is the contract. */
  object FakeDecoder {
    final case class Decoded(width: Int, height: Int, meanByte: Double)
    /** Deterministic stand-in for an image decoder: shape from length,
      * "pixel mean" from the byte stream. */
    def decode(bytes: Array[Byte]): Decoded = {
      val n = bytes.length
      val w = (n % 64) + 16
      val h = (n / 64) % 64 + 16
      var s = 0L
      var i = 0
      while (i < n) { s += bytes(i) & 0xff; i += 1 }
      Decoded(w, h, if (n == 0) 0.0 else s.toDouble / n)
    }
  }

  final case class MediaMeta(doc_id: Long, width: Long, height: Long, mean_byte: Double)

  /** Columnar metadata over a binary media column — byte length and
    * content digest computed by codegen'd builtins; the binary column is
    * scanned once, nothing leaves the executors. Oracle-checked (md5 and
    * octet_length agree across engines on the UTF-8 bytes). */
  def mmMetadata(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("digest"))
      .orderBy("doc_id")

  /** Real file bytes → (doc_id, media) — the ingest half of the decode
    * path: a `binaryFile` scan of the per-doc files with the provenance
    * key parsed from the path. */
  private def mediaBytes(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = FileOps.materializeDocFiles(spark, sfDir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .load(dir)
      .select(regexp_extract(col("path"), "doc_(\\d+)\\.txt", 1).cast("long").as("doc_id"),
        col("content").as("media"))
  }

  /** The decode stage: real file bytes → typed per-item features via
    * `mapPartitions`, decoder instantiated once per partition.
    * Oracle-checked: the fixture corpus is pure ASCII, so the file bytes
    * ARE the text's code points and DuckDB recomputes the stub decoder's
    * byte math from `documents.text` — which also re-proves the per-doc
    * file round-trip. The ScalaTest spec additionally pins exact values. */
  def mmDecodeStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaBytes(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec handles, JNI)
        it.map { case (id, bytes) =>
          val d = FakeDecoder.decode(bytes)
          MediaMeta(id, d.width.toLong, d.height.toLong, d.meanByte)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Feature-extract + group: mean decoded "pixel" stat per source —
    * the file-decoded features join back to the catalog table on the
    * filename-derived key and feed a normal columnar aggregation. */
  def mmFeatureAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val decoded = mediaBytes(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val d = FakeDecoder.decode(bytes)
        MediaMeta(id, d.width.toLong, d.height.toLong, d.meanByte)
      })
      .toDF()
    Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
      .join(decoded, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_items"),
        sum(col("width")).cast("long").as("sum_width"),
        // floor-scaled exact mean (the Det doctrine): round(avg(double))
        // is merge-order dependent; integer sums are not
        (sum(floor(col("mean_byte") * 1000000).cast("long")).cast("double")
          / (count(lit(1)) * 1000000)).as("avg_mean_byte"))
      .orderBy("source")
  }

  /** The resize stage contract: media bytes → fixed-size thumbnail.
    * Stub semantics (no codec libs in the container): the byte stream is
    * cut into out_w×out_h equal blocks and each thumbnail cell is its
    * block's floored mean byte — deterministic, so the spec pins exact
    * values. A real build swaps `thumbnail` for the codec's scaler; the
    * Spark shape (narrow typed map, one pass over the bytes) is final. */
  object Resizer {
    val OutW = 8
    val OutH = 8
    def thumbnail(bytes: Array[Byte]): Array[Long] = {
      val cells = OutW * OutH
      val out = new Array[Long](cells)
      val n = bytes.length
      if (n == 0) return out
      var c = 0
      while (c < cells) {
        val from = (c.toLong * n / cells).toInt
        val until = math.max(((c + 1).toLong * n / cells).toInt, from + 1) min n
        var s = 0L
        var i = from
        while (i < until) { s += bytes(i) & 0xff; i += 1 }
        out(c) = s / (until - from)
        c += 1
      }
      out
    }
  }

  final case class Thumb(doc_id: Long, out_w: Long, out_h: Long, thumb_sum: Long)

  /** Resize/thumbnail over real file bytes — oracle-checked (the
    * ASCII-fixture byte math is SQL-expressible, including the
    * overlapping-block rule for docs shorter than 64 bytes); exact
    * values additionally pinned by spec. */
  def mmResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaBytes(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Thumb(id, Resizer.OutW.toLong, Resizer.OutH.toLong, Resizer.thumbnail(bytes).sum)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** The frame-sample stage contract: media bytes → every Nth fixed-size
    * frame (video keyframe sampling shape: one media row fans out to many
    * frame rows, each a real byte slice). */
  object FrameSampler {
    val FrameBytes = 256
    val Every = 4
    final case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long)
    def sample(id: Long, bytes: Array[Byte]): Iterator[Frame] = {
      val nFrames = (bytes.length + FrameBytes - 1) / FrameBytes
      Iterator.range(0, nFrames, Every).map { f =>
        val slice = java.util.Arrays.copyOfRange(bytes,
          f * FrameBytes, math.min((f + 1) * FrameBytes, bytes.length))
        Frame(id, f.toLong, slice.length.toLong)
      }
    }
  }

  /** Frame sampling over real file bytes. The emitted geometry
    * (which frames, their lengths) is fully oracle-checked against the
    * source table's byte lengths; the slices themselves are materialized
    * (copyOfRange), so the fan-out cost is the real one. */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaBytes(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => FrameSampler.sample(id, bytes) })
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, Q] = Map(
    "mm_metadata"     -> (mmMetadata _),
    "mm_decode_stub"  -> (mmDecodeStub _),
    "mm_feature_agg"  -> (mmFeatureAgg _),
    "mm_resize"       -> (mmResize _),
    "mm_frame_sample" -> (mmFrameSample _))

  /** Per-doc byte sums over the ASCII fixture: octet_length == length and
    * ascii(char) == byte value, so the decoder stub's byte math mirrors
    * into list arithmetic over the source text. Fixture-specific by
    * design — oracles always are — and doubles as a file round-trip
    * check (Spark reads the materialized FILES, the oracle the table). */
  private val sqlByteSums =
    """b AS (SELECT doc_id, octet_length(encode(text)) AS n,
      |  list_sum(list_transform(range(1, length(text) + 1),
      |    i -> ascii(substring(text, i, 1)))) AS s
      |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "mm_metadata" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_stub" ->
      s"""WITH $sqlByteSums
         |SELECT doc_id, CAST((n % 64) + 16 AS BIGINT) AS width,
         |  CAST((n // 64) % 64 + 16 AS BIGINT) AS height,
         |  CAST(s AS DOUBLE) / n AS mean_byte
         |FROM b ORDER BY doc_id""".stripMargin,
    "mm_feature_agg" ->
      s"""WITH $sqlByteSums,
         |d AS (SELECT doc_id, (n % 64) + 16 AS width,
         |             CAST(s AS DOUBLE) / n AS mean_byte FROM b)
         |SELECT source, count(*) AS n_items,
         |  CAST(sum(width) AS BIGINT) AS sum_width,
         |  CAST(sum(CAST(floor(mean_byte * 1000000) AS BIGINT)) AS DOUBLE)
         |    / (count(*) * 1000000) AS avg_mean_byte
         |FROM documents JOIN d USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin,
    "mm_resize" ->
      """WITH pos AS (SELECT doc_id, octet_length(encode(text)) AS n, t.i AS i,
        |    ascii(substring(text, CAST(t.i + 1 AS INTEGER), 1)) AS v
        |  FROM documents, unnest(range(0, octet_length(encode(text)))) AS t(i)),
        |docs AS (SELECT DISTINCT doc_id, n FROM pos),
        |cells AS (SELECT doc_id, n, c.c AS c,
        |    (c.c * n) // 64 AS frm,
        |    least(greatest(((c.c + 1) * n) // 64, (c.c * n) // 64 + 1), n) AS til
        |  FROM docs, unnest(range(0, 64)) AS c(c)),
        |cv AS (SELECT cells.doc_id, cells.c, sum(pos.v) // count(*) AS cell
        |  FROM cells JOIN pos ON pos.doc_id = cells.doc_id
        |    AND pos.i >= cells.frm AND pos.i < cells.til
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
        |  CAST(sum(cell) AS BIGINT) AS thumb_sum
        |FROM cv GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(least(256, octet_length(encode(text)) - i*256) AS BIGINT) AS frame_len
        |FROM documents,
        |  unnest(range(0, (octet_length(encode(text)) + 255) // 256, 4)) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
