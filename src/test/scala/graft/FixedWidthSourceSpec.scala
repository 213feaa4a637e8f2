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
    val got = read().select(cols.map(col): _*)
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
}
