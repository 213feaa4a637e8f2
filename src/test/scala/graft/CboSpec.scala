package graft

import org.apache.spark.sql.DataFrame

/** Cost-based-optimizer evidence: with `ANALYZE TABLE ... FOR COLUMNS`
  * stats in the catalog and `spark.sql.cbo.(joinReorder.)enabled`,
  * Catalyst REORDERS a deliberately badly-ordered dim chain — the
  * stats-driven decision that at 100 TB separates a fact⋈fact-sized
  * intermediate from a fact⋈1-row one. The probe query filters ONLY the
  * dim joined LAST in the SQL text (supplier, 1 row after the filter):
  * syntactic order joins the unfiltered part dim into the fact first
  * (60k-row intermediate); the cost-based order flips the chain and
  * joins the 1-row supplier first. Both orders must return identical
  * results — the reorder is a pure cost decision. */
class CboSpec extends SparkSpec {

  private val db = "graft_cbo_test"

  private def probe: DataFrame = spark.sql(
    s"""SELECT count(*) AS n
       |FROM $db.lineitem_t
       |JOIN $db.part_t ON p_partkey = l_partkey
       |JOIN $db.supplier_t ON s_suppkey = l_suppkey
       |WHERE s_nationkey = 3""".stripMargin)

  /** Inner(deepest)-join condition of the optimized plan: treeString
    * lists the outer join first, so the last `Join Inner` line is the
    * join executed first. */
  private def innermostJoin(df: DataFrame): String =
    df.queryExecution.optimizedPlan.treeString.linesIterator
      .filter(_.contains("Join Inner")).toSeq.last

  test("column stats + cbo.joinReorder flip a badly-ordered dim chain") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      for (t <- Seq("lineitem", "part", "supplier")) {
        spark.read.parquet(s"$sf/$t.parquet")
          .write.mode("overwrite").saveAsTable(s"$db.${t}_t")
        spark.sql(s"ANALYZE TABLE $db.${t}_t COMPUTE STATISTICS")
      }
      spark.sql(s"ANALYZE TABLE $db.lineitem_t COMPUTE STATISTICS FOR COLUMNS l_partkey, l_suppkey")
      spark.sql(s"ANALYZE TABLE $db.part_t COMPUTE STATISTICS FOR COLUMNS p_partkey, p_brand")
      spark.sql(s"ANALYZE TABLE $db.supplier_t COMPUTE STATISTICS FOR COLUMNS s_suppkey, s_nationkey")

      try {
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        val off = innermostJoin(probe)
        val offResult = probe.collect()
        assert(off.contains("p_partkey"),
          s"expected syntactic order to join the unfiltered part dim first, got: $off")

        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        val on = innermostJoin(probe)
        val onResult = probe.collect()
        assert(on.contains("s_suppkey"),
          s"stats did not pull the 1-row filtered supplier into the first join: $on")

        // the reorder is cost-only: answers identical
        assert(offResult.toSeq === onResult.toSeq)
      } finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
