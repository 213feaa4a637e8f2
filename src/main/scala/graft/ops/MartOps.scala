package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed analytics-mart pipelines — the flagship multi-join shapes a
  * warehouse user of the reference would run daily (SURVEY.md §2b
  * Q13/Q14 composed end-to-end; the TPC-H Q4/Q5 families restated over
  * the fixture tables).
  *
  * These exist to prove the JOIN TOPOLOGY at scale, not new operators:
  *   - the TRUE dimension chain (region ⋈ nation — fixed 5/25 rows at any
  *     SF) is hint-broadcast: never shuffled, at any scale;
  *   - customer is SF-PROPORTIONAL (150k × SF rows), so its joins carry
  *     no hint — Catalyst/AQE broadcast it while it fits the threshold
  *     (it does at bench SFs) and shuffle on the equi-key beyond that;
  *   - the unavoidable wide stages are the fact-side equi-joins
  *     (orders ⋈ customer on custkey, lineitem ⋈ orders on orderkey);
  *     the final group-by is dimension-cardinality and cheap.
  * At 100 TB: dims broadcast, the two fact joins shuffle once each on
  * their keys, and AQE handles orderkey skew.
  *
  * Money aggregates follow the exact-decimal rule ([[graft.Det]]): the
  * extendedprice·(1−discount) product has exactly 4 decimal digits, so
  * the DECIMAL(18,4) sum is lossless and merge-order independent.
  */
object MartOps {
  type Q = (SparkSession, String) => DataFrame

  /** Revenue per (region, nation): lineitem ⋈ orders ⋈ customer ⋈
    * nation ⋈ region with revenue = Σ extprice·(1−discount). */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val natReg = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val custNat = Tables.customer(spark, sfDir)
      .join(broadcast(natReg), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    // custNat derives from customer — SF-proportional, NOT a dimension:
    // no hint, so the planner may broadcast only while it actually fits
    val ordNat = Tables.orders(spark, sfDir)
      .join(custNat, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"), col("r_name"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ordNat, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Det.moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Late-shipment priority census (TPC-H Q4 family): orders with at
    * least one line shipped after the order date, counted per priority —
    * a fact-fact LEFT SEMI join (the EXISTS shape) followed by a tiny
    * aggregate. The semi join ships only orderkey+dates, never widens
    * rows, and dedups order-side matches inside the join. */
  def lateShipPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")

  /** Promo revenue share per order month (TPC-H Q14 family): the
    * conditional-aggregate ratio — promo-part revenue over total revenue
    * — computed in ONE grouped pass (no second scan for the denominator).
    * Both numerator and denominator follow the exact-decimal rule; the
    * share is a single double divide of two already-exact totals, so the
    * ratio is bit-deterministic at any parallelism. Join topology: two
    * fact equi-joins (lineitem⋈orders on orderkey, lineitem⋈part on
    * partkey), both unhinted — part is SF-proportional, so AQE broadcasts
    * it only while it genuinely fits. */
  def promoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), rev.as("rev"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"),
          trunc(col("o_orderdate").cast("date"), "month").as("month")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, sfDir)
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_lines"),
        Det.moneySum4(col("rev")).as("total_rev"),
        coalesce(sum(when(col("is_promo"), col("rev")).cast("decimal(18,4)"))
          .cast("double"), lit(0.0)).as("promo_rev"))
      .withColumn("promo_share", lit(100.0) * col("promo_rev") / col("total_rev"))
      .select("month", "n_lines", "total_rev", "promo_rev", "promo_share")
      .orderBy("month")
  }

  val queries: Map[String, Q] = Map(
    "revenue_by_nation"  -> (revenueByNation _),
    "late_ship_priority" -> (lateShipPriority _),
    "promo_share"        -> (promoShare _))

  val oracle: Map[String, String] = Map(
    "promo_share" ->
      s"""WITH g AS (
         |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         |    count(*) AS n_lines,
         |    ${Det.sqlMoneySum4("l_extendedprice * (1 - l_discount)")} AS total_rev,
         |    coalesce(CAST(SUM(CASE WHEN p_type = 'PROMO'
         |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
         |      END) AS DOUBLE), 0.0) AS promo_rev
         |  FROM lineitem
         |    JOIN orders ON l_orderkey = o_orderkey
         |    JOIN part   ON l_partkey = p_partkey
         |  GROUP BY 1)
         |SELECT month, n_lines, total_rev, promo_rev,
         |  100.0 * promo_rev / total_rev AS promo_share
         |FROM g ORDER BY month""".stripMargin,
    "revenue_by_nation" ->
      s"""SELECT r_name, n_name,
         |  ${Det.sqlMoneySum4("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation   ON c_nationkey = n_nationkey
         |  JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "late_ship_priority" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
