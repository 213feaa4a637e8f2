package graft

import org.apache.spark.sql.SparkSession

/** Local profiling aid: time named registry queries in one warm JVM,
  * three runs each (run1 carries JVM/codegen warmup — only later runs
  * are steady-state; see NOTES_r02 on box noise). Not driver-run.
  *
  * Usage: `sbt "runMain graft.TimeOne <query> [query ...]"`, optional
  * `SPARK_GRAFT_SF_DIR` (default sf0.1).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Driver-generated fixtures carry naive (isAdjustedToUTC=false) parquet
      // timestamps; read them as TIMESTAMP (session tz = UTC), not NTZ, so
      // unix_micros/window arithmetic keeps the semantics every oracle pins.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).count()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
