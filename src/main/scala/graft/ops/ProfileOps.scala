package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling and reporting utilities (Q20/Q28 family, SURVEY.md
  * §2b): the schema-quality summary every ingest pipeline runs before
  * trusting a new drop, and the ordered group-concat used in report
  * sinks.
  */
object ProfileOps {
  type Q = (SparkSession, String) => DataFrame

  private val profiledCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Per-column table profile of `orders`: null count, exact distinct
    * count, min/max (rendered as strings so one long-form schema covers
    * every column type; min/max computed in the native type FIRST, then
    * cast — lexicographic min of a stringified number would be wrong).
    *
    * One scan, one aggregate row, exploded to long form driver-free.
    * The multiple exact `count(DISTINCT)`s expand the scan ×columns
    * (Catalyst's Expand); at 100 TB swap them for
    * `approx_count_distinct` — same plan shape, no expand, and
    * profiling tolerates ±2% — or profile per ingest partition and
    * merge. Kept exact here because the oracle hash-compares values.
    */
  def profileTable(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val aggs: Seq[Column] = profiledCols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    o.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(profiledCols.map { c =>
        struct(
          lit(c).as("column_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_str"),
          col(s"${c}__max").as("max_str"))
      }: _*)).as("p"))
      .select(col("p.column_name"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_str"), col("p.max_str"))
      .orderBy("column_name")
  }

  /** Ordered group-concat (LISTAGG): nations per region as a sorted
    * comma-joined list. `collect_list` is only safe when the per-group
    * value domain is bounded (25 nations here — a dimension attribute);
    * for unbounded groups the scale path is top-N truncation through
    * [[graft.plans.TopKPerKey]] before the concat, never an unbounded
    * collect. Sorting the array in-row (`array_sort`) keeps the result
    * independent of shuffle-merge order — the property the oracle's
    * `ORDER BY` inside `string_agg` asserts.
    */
  def stringAggGroup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
      .orderBy("r_name")

  /** Grouped simple linear regression + Pearson correlation
    * (price ~ quantity per return flag) from the five sufficient
    * statistics Σx, Σy, Σxy, Σx², Σy² — each an EXACT decimal sum
    * (merge-order-free across 1000 executors), combined into
    * slope/intercept/r by a fixed sequence of IEEE double ops that both
    * engines execute identically, so the floats hash-match. One
    * map-side-combined grouped pass; the naive two-pass
    * mean-then-residual formulation would rescan the fact. This is the
    * mergeable-statistics contract: partials from disjoint shards
    * combine exactly, which is what makes the statistic incremental at
    * 100 TB. */
  def regressionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,2)")
    val y = col("l_extendedprice").cast("decimal(18,2)")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sxd"), sum(y).cast("double").as("syd"),
        sum(x * y).cast("double").as("sxyd"),
        sum(x * x).cast("double").as("sxxd"),
        sum(y * y).cast("double").as("syyd"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("num", col("nd") * col("sxyd") - col("sxd") * col("syd"))
      .withColumn("den", col("nd") * col("sxxd") - col("sxd") * col("sxd"))
      .select(col("l_returnflag"), col("n"),
        (col("num") / col("den")).as("slope"),
        ((col("syd") - (col("num") / col("den")) * col("sxd")) / col("nd"))
          .as("intercept"),
        (col("num") / sqrt(col("den") *
          (col("nd") * col("syyd") - col("syd") * col("syd")))).as("r"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "profile_table"    -> (profileTable _),
    "string_agg_group" -> (stringAggGroup _),
    "regression_stats" -> (regressionStats _))

  private def profileUnionSql: String =
    profiledCols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_str,
         |  CAST(max($c) AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  val oracle: Map[String, String] = Map(
    "regression_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxd,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxyd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxxd,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syyd
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
        |        sxd, syd, sxyd, sxxd, syyd,
        |        CAST(n AS DOUBLE) * sxyd - sxd * syd AS num,
        |        CAST(n AS DOUBLE) * sxxd - sxd * sxd AS den
        |      FROM s)
        |SELECT l_returnflag, n, num / den AS slope,
        |  (syd - (num / den) * sxd) / nd AS intercept,
        |  num / sqrt(den * (nd * syyd - syd * syd)) AS r
        |FROM t ORDER BY l_returnflag""".stripMargin,
    "profile_table" -> profileUnionSql,
    "string_agg_group" ->
      """SELECT r_name, count(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
}
