package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DSv2 connector contract, beyond the oracle hash: full-fidelity
  * round-trip of every column, column pruning reaching the reader, and
  * the one-partition-per-file scan layout. */
class FixedWidthSourceSpec extends SparkSpec {

  private def dir = graft.ops.FileOps.materializeFixedWidthOrders(spark, sf)

  private def read() = spark.read
    .format("graft.sources.FixedWidthDataSource")
    .option("fields", graft.ops.FileOps.fixedWidthSpec)
    .option("path", dir)
    .load()

  test("round-trips every column of orders with full fidelity") {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority", "o_orderdate")
    // The text format is timezone-less, so the connector reads timestamps
    // as TIMESTAMP_NTZ by design; the parquet side reads as session-tz
    // TIMESTAMP (UTC). Cast NTZ→LTZ (exact under the pinned UTC session)
    // so fidelity is compared on values, not on the two timestamp flavors.
    val got = read()
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .select(cols.map(col): _*)
      .orderBy("o_orderkey").collect()
    val expected = Tables.orders(spark, sf).select(cols.map(col): _*)
      .orderBy("o_orderkey").collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g === e) }
  }

  test("column pruning reaches the reader: readSchema carries only projected fields") {
    val df = read().select("o_orderkey", "o_totalprice")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScan in plan")
    assert(scans.head.scan.readSchema().fieldNames.toSet ===
      Set("o_orderkey", "o_totalprice"))
    // and the pruned read still returns correct data
    val sum = df.agg(org.apache.spark.sql.functions.sum("o_orderkey")).collect()(0).getLong(0)
    val exp = Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("o_orderkey")).collect()(0).getLong(0)
    assert(sum === exp)
  }

  test("plans one input partition per shard file") {
    val df = read()
    val parts = df.rdd.getNumPartitions
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root)
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
    assert(parts === files, s"expected $files partitions, got $parts")
    assert(parts >= 1)
  }

  private def writeSrc() = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderpriority"),
      col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))

  private def readFrom(path: String) = spark.read
    .format("graft.sources.FixedWidthDataSource")
    .option("fields", graft.ops.FileOps.fixedWidthSpec)
    .option("path", path)
    .load()

  test("connector write path round-trips row-for-row and drops _SUCCESS") {
    val wdir = java.nio.file.Files.createTempDirectory("fw_write_").toString
    writeSrc().write.format("graft.sources.FixedWidthDataSource")
      .option("fields", graft.ops.FileOps.fixedWidthSpec)
      .mode("overwrite").save(wdir)
    assert(new java.io.File(wdir, "_SUCCESS").exists, "no _SUCCESS marker")
    val got = readFrom(wdir).orderBy("o_orderkey").collect()
    val exp = writeSrc().orderBy("o_orderkey").collect()
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) => assert(g === e) }
    // shard layout: the scan plans one partition per written task file
    // (skip "_" markers and the local-FS "."-hidden .crc sidecars, which
    // Hadoop's listing hides from the reader too)
    val files = new java.io.File(wdir).listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(readFrom(wdir).rdd.getNumPartitions === files)
  }

  test("overwrite truncates: a smaller second write fully replaces the first") {
    val wdir = java.nio.file.Files.createTempDirectory("fw_trunc_").toString
    writeSrc().write.format("graft.sources.FixedWidthDataSource")
      .option("fields", graft.ops.FileOps.fixedWidthSpec)
      .mode("overwrite").save(wdir)
    val subset = writeSrc().filter(col("o_orderkey") % 7 === 0)
    subset.write.format("graft.sources.FixedWidthDataSource")
      .option("fields", graft.ops.FileOps.fixedWidthSpec)
      .mode("overwrite").save(wdir)
    assert(readFrom(wdir).count() === subset.count())
  }

  test("scan reports statistics so a small fixed-width table auto-broadcasts") {
    // stats contract first: size tracks the file bytes, rows the line count
    val scan = read().queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.asInstanceOf[graft.sources.FixedWidthScan]
    val stats = scan.estimateStatistics()
    val expRows = Tables.orders(spark, sf).count()
    assert(stats.numRows.getAsLong === expRows)
    assert(stats.sizeInBytes.getAsLong > 0)
    // and the planning consequence: joined UNHINTED against a fact table,
    // the connector's size estimate (far under the 10 MB default
    // threshold at this SF) lets Catalyst pick BroadcastHashJoin on the
    // fixed-width side — before SupportsReportStatistics the relation
    // reported defaultSizeInBytes and this plan degraded to a shuffle
    val joined = Tables.lineitem(spark, sf)
      .join(read().select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected auto-broadcast of the fixed-width side:\n$plan")
    // pruning shrinks the size estimate (projected fraction of the line)
    val pruned = read().select("o_orderkey").queryExecution.executedPlan
      .collect { case b: BatchScanExec => b.scan }
      .head.asInstanceOf[graft.sources.FixedWidthScan]
    assert(pruned.estimateStatistics().sizeInBytes.getAsLong <
      stats.sizeInBytes.getAsLong)
  }

  test("writer rejects a value wider than its field") {
    val wdir = java.nio.file.Files.createTempDirectory("fw_reject_").toString
    val bad = writeSrc().withColumn("o_orderpriority",
      lit("THIS STRING IS FAR TOO LONG FOR ITS FIELD"))
    val e = intercept[Exception] {
      bad.write.format("graft.sources.FixedWidthDataSource")
        .option("fields", graft.ops.FileOps.fixedWidthSpec)
        .mode("overwrite").save(wdir)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("does not fit field")),
      s"unexpected failure: $e")
  }
}
