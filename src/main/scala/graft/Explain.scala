package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the executed physical plan of named registry
  * queries (all queries when none given). AQE is disabled so exchanges,
  * pushed filters and codegen stage boundaries are visible pre-execution
  * — the same setting the plan-shape specs use.
  *
  * Usage: runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Driver-generated fixtures carry naive (isAdjustedToUTC=false) parquet
      // timestamps; read them as TIMESTAMP (session tz = UTC), not NTZ, so
      // unix_micros/window arithmetic keeps the semantics every oracle pins.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_MODE=formatted switches to the numbered-operator
    // explain("formatted") rendering (the r18 plan artifacts); default
    // stays the raw executedPlan tree the plan-shape specs grep.
    val formatted =
      sys.env.get("SPARK_GRAFT_EXPLAIN_MODE").contains("formatted")
    names.foreach { n =>
      println(s"===== $n")
      val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
      if (formatted)
        println(qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      else println(qe.executedPlan.toString)
    }
    spark.stop()
  }
}
