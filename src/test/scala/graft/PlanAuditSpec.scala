package graft

import org.apache.spark.sql.functions._

/** Plan audits for the two properties that matter most at 100 TB: column
  * pruning and predicate pushdown must actually reach the parquet scan
  * (O14; SURVEY §2a). String-level assertions over the executed plan keep
  * these from silently regressing when queries are refactored. */
class PlanAuditSpec extends SparkSpec {

  /** AQE's wrapper plan elides scan details and codegen spans until
    * execution; audits read the non-adaptive physical plan. */
  private def planOf(name: String): String = {
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try q(name).queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("scan_project prunes the scan to exactly the projected columns") {
    val plan = planOf("scan_project")
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse(fail(s"no ReadSchema in:\n$plan"))
    val cols = readSchema.split(",").map(_.split(":")(0).trim).toSet
    assert(cols === Set("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      s"scan reads more than the projection: $cols")
  }

  test("filter_predicate pushes both predicates into the scan") {
    val plan = planOf("filter_predicate")
    // the rendered filter list is truncated at toString's field limit, so
    // match the line prefix rather than a closing bracket
    val pushed = "PushedFilters: \\[([^\\r\\n]*)".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse(fail(s"no PushedFilters in:\n$plan"))
    assert(pushed.contains("EqualTo(l_returnflag,R)"), s"flag filter not pushed: $pushed")
    assert(pushed.contains("GreaterThan(l_quantity"), s"quantity filter not pushed: $pushed")
  }

  test("group_agg keeps whole-stage codegen through the partial aggregate") {
    val plan = planOf("group_agg")
    // codegen stages render as "*(n) " prefixes in the compact plan string
    assert(plan.contains("*(1)"), s"no codegen span in:\n$plan")
    assert(plan.contains("partial_"), s"no map-side partial aggregation in:\n$plan")
  }
}
