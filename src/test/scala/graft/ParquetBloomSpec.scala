package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Parquet BLOOM FILTERS — the point-lookup half of the data-skipping
  * story. Row-group min/max stats (and the z-order layout that
  * sharpens them, `LayoutSpec`) prune RANGE predicates on clustered
  * columns; they are useless for a point lookup on a column the layout
  * did not sort — every row group's [min, max] straddles the key. A
  * per-row-group bloom filter answers "is this value possibly here"
  * probabilistically, so an unsorted high-cardinality point lookup
  * skips all but the (few) matching row groups. At 100 TB this is the
  * needle-in-haystack path: id lookups on fact tables clustered by
  * something else. Writer cost: one bit-array per row group per
  * enrolled column — enroll lookup keys only, not everything.
  */
class ParquetBloomSpec extends SparkSpec {

  private def writeCopy(tag: String, opts: Map[String, String]): String = {
    // key encodes the source path AND the write options — materializeOnce's
    // contract: every input that changes the bytes must be in the kind
    val optKey = opts.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString(",").replaceAll("[^A-Za-z0-9]", "").takeRight(40)
    graft.ops.FileOps.materializeOnce(spark, s"bloomspec_${tag}_$optKey", sf) { dir =>
      // many small row groups so skipping has granularity to work with;
      // repartition(1) keeps a single file whose groups tile the corpus,
      // and the deterministic hash scramble makes every row group span
      // ~the full key range — min/max stats provably useless. Dictionary
      // encoding is disabled on BOTH copies: at fixture cardinality every
      // row group would dictionary-encode and the reader's dictionary
      // filtering would skip point lookups on its own (observed: 2283 of
      // 6000 decoded) — at production cardinality the id column blows the
      // dictionary page limit and falls back to plain, which is exactly
      // the regime bloom filters exist for; this simulates it honestly.
      Tables.lineitem(spark, sf)
        .repartition(1)
        .sortWithinPartitions(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))))
        .write.mode("overwrite")
        .options(opts ++ Map(
          "parquet.block.size" -> (64 * 1024).toString,
          "parquet.enable.dictionary" -> "false"))
        .parquet(dir)
    }
  }

  /** Decoded-row count for a point lookup, read from the scan metric. */
  private def decodedRows(dir: String, key: Long): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(dir)
        .filter(col("l_orderkey") === key)
        .agg(count(lit(1)))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
        .sum
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("bloom filter prunes a point lookup that min/max stats cannot (unsorted layout)") {
    // shuffle the rows so every row group's orderkey range straddles the
    // probe key — stats-only pruning is provably useless on this layout
    val plain = writeCopy("plain", Map.empty)
    val bloom = writeCopy("bloom", Map(
      "parquet.bloom.filter.enabled#l_orderkey" -> "true",
      "parquet.bloom.filter.expected.ndv#l_orderkey" -> "2000"))

    val total = Tables.lineitem(spark, sf).count()
    // a needle that lives in ONE row (and so ~one row group): skipping
    // is bounded by the groups that truly hold the key, so a 6-row key
    // scattered across groups would cap the demo at ~2x
    val key = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1)
      .agg(min("l_orderkey")).collect().head.getLong(0)
    val matchRows = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === key).count()
    assert(matchRows === 1L)

    val dPlain = decodedRows(plain, key)
    val dBloom = decodedRows(bloom, key)
    info(s"decoded — stats-only: $dPlain / $total, bloom: $dBloom (true matches: $matchRows)")

    // without bloom filters the unsorted layout decodes ~everything
    assert(dPlain > (total * 0.8).toLong,
      s"stats unexpectedly pruned the shuffled layout: $dPlain of $total")
    // with bloom filters only the row groups that (probably) hold the
    // key are decoded
    assert(dBloom < dPlain / 4,
      s"bloom filter pruned nothing: $dBloom vs $dPlain")
    // and the answers agree, bloom filters are false-POSITIVE-only
    assert(spark.read.parquet(bloom).filter(col("l_orderkey") === key).count()
      === matchRows)
  }
}
