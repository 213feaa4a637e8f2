package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning evidence for `dpp_join`: the fact's
  * partition filter is derivable only from the joined dim's rows, so it
  * cannot prune at listing time like `partitioned_prune` — Catalyst must
  * inject a `dynamicpruningexpression` into the scan and feed it the
  * broadcast dim result at runtime. Pinned both ways: the plan carries
  * the dynamic filter, and the executed scan DECODED only the matching
  * partition's rows. */
class DppSpec extends SparkSpec {

  test("dpp_join: fact scan carries dynamicpruning and decodes only the matching partition") {
    val df = q("dpp_join")
    df.collect()

    val executed = df.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val planStr = finalPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruningexpression in the fact scan:\n$planStr")

    // measured pruning: the partitioned scan decoded only the 'F' rows.
    // AQE wraps materialized stages in QueryStageExec LEAVES — descend
    // into them, or the fact scan is invisible to collect()
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case qs: QueryStageExec    => scansOf(qs.plan)
      }.flatten
    val scans = scansOf(finalPlan).filter(_.toString.contains("orderspart"))
    assert(scans.nonEmpty, s"no partitioned fact scan found in:\n$planStr")
    val decoded = scans.map(_.metrics("numOutputRows").value).sum
    val fRows = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").count()
    val allRows = Tables.orders(spark, sf).count()
    assert(decoded === fRows,
      s"scan decoded $decoded rows, expected exactly the F partition ($fRows of $allRows)")
    assert(fRows < allRows / 2) // the prune is real, not vacuous
  }
}
