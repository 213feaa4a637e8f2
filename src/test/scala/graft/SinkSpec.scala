package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sink-side behavior (SURVEY.md §2a O15): partitioned parquet egress and
  * the partition pruning it buys on re-read — the layout decision that
  * turns a 100 TB scan into a one-partition scan for selective readers.
  */
class SinkSpec extends SparkSpec {

  test("partitioned write produces hive-style layout and pruned re-reads") {
    val out = Files.createTempDirectory("graft_sink").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    // layout: one directory per lang value
    val langDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    assert(langDirs.sameElements(langs.map(l => s"lang=$l")))

    // re-read with a partition predicate: plan must show a PartitionFilter
    // and the full row set must round-trip
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val pruned = back.filter(col("lang") === langs.head)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed:\n$scan")
    assert(pruned.count() ===
      docs.filter(col("lang") === langs.head).count())
  }

  test("partitioned_prune registry query prunes at listing time (PartitionFilters)") {
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q("partitioned_prune").queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
        s"partition predicate not a PartitionFilter:\n$plan")
      assert("PartitionFilters: \\[[^\\]]*o_orderstatus[^\\]]*= F".r.findFirstIn(plan).isDefined
        || plan.contains("(o_orderstatus#"),
        s"equality predicate missing from PartitionFilters:\n$plan")
      // the partition column resolves from directory names, never file bytes
      val readSchema = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
      assert(readSchema.exists(!_.contains("o_orderstatus")),
        s"partition column read from file contents:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("sorted single-file egress preserves order through the sink (Verify contract)") {
    val out = Files.createTempDirectory("graft_sink2").toString
    val sorted = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    sorted.coalesce(1).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).collect()
    val expect = sorted.collect()
    assert(back.length === expect.length)
    back.zip(expect).foreach { case (a, b) => assert(a === b) }
  }

  test("compact_files: shard count and sizes honor the bin-packing bounds") {
    val shards = q("compact_files").collect()
    val docs = Tables.documents(spark, sf)
      .select(octet_length(col("text")).cast("long").as("nb"),
        floor(col("doc_id") / ops.FileOps.compactGroupDocs(spark)).as("grp"))
      .groupBy("grp")
      .agg(sum(col("nb")).as("bytes"), max(col("nb")).as("mx"))
      .collect()
    val target = ops.FileOps.compactTarget(spark)
    // per-group packing yields ceil(groupBytes/target) bins at most one
    // underfull tail each; totals must be preserved exactly
    val maxShards = docs.map(r => (r.getAs[Long]("bytes") + target - 1) / target).sum
    assert(shards.length <= maxShards,
      s"${shards.length} shards exceeds packing bound $maxShards")
    assert(shards.map(_.getAs[Long]("n_bytes")).sum ===
      docs.map(_.getAs[Long]("bytes")).sum, "compaction lost or grew bytes")
    // a shard closes at the first doc crossing the target, so size is
    // bounded by target + the largest doc in its group
    val maxDoc = docs.map(_.getAs[Long]("mx")).max
    shards.foreach { s =>
      assert(s.getAs[Long]("n_bytes") <= target + maxDoc,
        s"shard ${s.getString(0)} exceeds target+maxDoc") }
    // compaction actually compacted: far fewer files than documents
    assert(shards.length.toLong < Tables.documents(spark, sf).count() / 10)
  }
}
