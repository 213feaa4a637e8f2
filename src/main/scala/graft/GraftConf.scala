package graft

import org.apache.spark.sql.SparkSession

/** Tunable engine constants, read from `spark.graft.*` session conf with
  * the values the oracles assume as defaults. A deployment retunes these
  * per cluster (`--conf spark.graft.compact.targetBytes=134217728` for a
  * 128 MiB shard target on a real object store) without touching code;
  * the registry oracles are written against the defaults, so the
  * correctness gate always runs the default geometry while specs prove
  * the conf actually steers the operators (`ConfParamSpec`).
  */
object GraftConf {
  /** Chunker window: tokens per chunk (`chunk_documents`, `pack_sequences`). */
  def chunkTokens(spark: SparkSession): Long =
    spark.conf.get("spark.graft.chunk.tokens", "64").toLong
  /** Chunker stride: tokens advanced per chunk (overlap = tokens − stride). */
  def chunkStride(spark: SparkSession): Long =
    spark.conf.get("spark.graft.chunk.stride", "48").toLong
  /** Packed training-sequence length in tokens (`pack_sequences`). */
  def packSeqTokens(spark: SparkSession): Long =
    spark.conf.get("spark.graft.pack.seqTokens", "256").toLong
  /** Docs per independent packing group — the partitioned-window key that
    * keeps the running sum distributed (`pack_sequences`). */
  def packGroupDocs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.pack.groupDocs", "256").toLong
  /** Compaction shard byte target (`compact_files`). */
  def compactTargetBytes(spark: SparkSession): Long =
    spark.conf.get("spark.graft.compact.targetBytes", "16384").toLong
  /** Docs per independent compaction group (`compact_files`). */
  def compactGroupDocs(spark: SparkSession): Long =
    spark.conf.get("spark.graft.compact.groupDocs", "1024").toLong
}
