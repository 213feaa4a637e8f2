package graft

import org.apache.spark.sql.SparkSession

/** Local iteration aid: run ONE registry query and write its result to
  * parquet for ad-hoc oracle comparison (the single-query slice of what
  * [[Verify]] does for the whole registry). Not driver-run.
  *
  * Usage: `sbt "runMain graft.DumpOne <query> <sfDir> <outPath>"`
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpOne <query> <sfDir> <outPath>")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${GraftConf.cpuSpec(8)._1}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.write.mode("overwrite").parquet(args(2))
    // count the WRITTEN files, not the plan — re-counting df would
    // re-execute the whole query
    val rows = spark.read.parquet(args(2)).count()
    println(s"[dump-one] ${args(0)} -> ${args(2)} rows=$rows")
    spark.stop()
  }
}
