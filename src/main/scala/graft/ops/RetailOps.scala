package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retail/BI reporting operators (Q7/Q12/Q18 family, SURVEY.md §2b):
  * market-basket association mining, year-over-year growth, ratio-to-
  * report shares, Pareto (skyline) frontiers, and exact grouped medians.
  * Every determinism-sensitive float is either an exact DECIMAL sum cast
  * to double or a SINGLE IEEE division of two exactly-computed values,
  * so results hash-match the DuckDB oracle in any shuffle-merge order.
  */
object RetailOps {
  type Q = (SparkSession, String) => DataFrame

  /** Market-basket pair mining: parts co-purchased in one order, with
    * support and lift. The oracle states the classic self-join
    * (`li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk`); Spark-first the
    * pair space never shuffles — ONE exchange on the order key builds
    * each basket (`collect_set`, baskets are order-line-bounded, ≤17
    * parts in this corpus), and the a<b combinations explode IN-ROW from
    * the sorted basket array. Pair counting then aggregates with
    * map-side combine on the (a, b) key. Item frequencies and the basket
    * total reuse the basket pass. Lift multiplies longs before the one
    * IEEE division — exact here; at trillion-basket scale the product
    * moves to DECIMAL(38,0) (noted, same plan). */
  def marketBasket(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    // pinned (r18): three consumers (pair explode, item frequencies, the
    // basket total) otherwise re-run the collect_set aggregate — exchange
    // reuse shares the shuffle write, not the aggregation
    val baskets = PinCache.pinned(li.groupBy("ok")
      .agg(sort_array(collect_set(col("pk"))).as("parts")))
    val pairs = baskets.select(explode(expr(
      """flatten(transform(parts, (x, i) ->
        |  transform(slice(parts, i + 2, size(parts) - i - 1),
        |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pairCounts = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val items = baskets.select(explode(col("parts")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_item"))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    pairCounts
      .join(items.select(col("pk").as("a"), col("n_item").as("n_a")), "a")
      .join(items.select(col("pk").as("b"), col("n_item").as("n_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_orders").cast("double"))
          .as("support"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
      .limit(50)
  }

  /** Year-over-year monthly revenue growth. The naive lag(12) needs ONE
    * global month order — a single-partition window. Partitioning the
    * lag by CALENDAR month instead (`month(month)`) makes "previous row"
    * mean "same month, previous year": 12 independent partitions, each
    * year-count long, and the formulation survives any date range. The
    * growth ratio is one IEEE division of two exact-decimal sums. */
  def yoyGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(Det.moneySum(col("o_totalprice")).as("revenue"))
    val w = Window.partitionBy(month(col("month"))).orderBy(col("month"))
    rev.withColumn("prev_year", lag(col("revenue"), 1).over(w))
      .select(col("month"), col("revenue"), col("prev_year"),
        (col("revenue") / col("prev_year") - lit(1.0)).as("yoy"))
      .orderBy("month")
  }

  /** Ratio-to-report: each order priority's share of total revenue.
    * `sum() OVER ()` funnels every group row through one partition; the
    * scale-safe shape is a grouped aggregate CROSS JOIN a broadcast
    * 1-row global total (fixed-size build side however large the fact).
    * Both sides compute the total as an exact decimal sum over ALL rows
    * — never a re-sum of group doubles, whose order differs per engine. */
  def ratioToTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val byPrio = o.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Det.moneySum(col("o_totalprice")).as("revenue"))
    val total = o.agg(Det.moneySum(col("o_totalprice")).as("total_revenue"))
    byPrio.crossJoin(broadcast(total))
      .select(col("o_orderpriority"), col("n_orders"), col("revenue"),
        (col("revenue") / col("total_revenue")).as("rev_share"))
      .orderBy("o_orderpriority")
  }

  /** Per-brand Pareto (skyline) frontier: parts not dominated on
    * (maximize p_size, minimize p_retailprice). The oracle states the
    * quadratic NOT EXISTS; Spark-first it is TWO window minimums over
    * one brand exchange — `min(price)` over strictly-larger sizes (a
    * RANGE frame on the size value) and `min(price)` within the same
    * size — so the frontier falls out of an O(n log n) sort, never a
    * self-join. Domination needs one strict inequality, so equal-sized
    * equal-priced duplicates both survive (both engines agree). */
  def brandSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    val wLarger = Window.partitionBy("p_brand").orderBy(col("p_size"))
      .rangeBetween(1L, Window.unboundedFollowing)
    val wSame = Window.partitionBy("p_brand", "p_size")
    Tables.part(spark, sfDir)
      .withColumn("min_larger", min(col("p_retailprice")).over(wLarger))
      .withColumn("min_same", min(col("p_retailprice")).over(wSame))
      .filter((col("min_larger").isNull ||
          col("min_larger") > col("p_retailprice")) &&
        col("min_same") >= col("p_retailprice"))
      .select(col("p_brand"), col("p_size"), col("p_retailprice"),
        col("p_partkey"))
      .orderBy("p_brand", "p_size", "p_retailprice", "p_partkey")
  }

  /** Exact per-group median (no interpolation sketch): rank rows with a
    * deterministic tiebreaker, pick the one or two middle rows, average
    * them in DECIMAL, divide once. The window partitions on the group
    * key, so parallelism is bounded by group cardinality — for a
    * low-cardinality group over a 100 TB fact, the two-phase global-rank
    * formulation ([[CoreOps]] `equi_depth_hist`) replaces the per-group
    * sort; kept single-window here because it IS the right plan when
    * groups are plentiful. */
  def exactMedianGroups(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(n + 2) div 2"))
      .groupBy("o_orderpriority")
      .agg(max(col("n")).as("n_rows"),
        (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("median_price"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, Q] = Map(
    "market_basket"       -> (marketBasket _),
    "yoy_growth"          -> (yoyGrowth _),
    "ratio_to_total"      -> (ratioToTotal _),
    "brand_skyline"       -> (brandSkyline _),
    "exact_median_groups" -> (exactMedianGroups _))

  val oracle: Map[String, String] = Map(
    "market_basket" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
        |ic AS (SELECT pk, count(*) AS n_item FROM li GROUP BY 1),
        |pc AS (SELECT a.pk AS a, b.pk AS b, count(*) AS n_ab
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2)
        |SELECT pc.a, pc.b, pc.n_ab,
        |  CAST(pc.n_ab AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS support,
        |  CAST(pc.n_ab * n.n_orders AS DOUBLE)
        |    / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
        |FROM pc
        |JOIN ic ia ON pc.a = ia.pk
        |JOIN ic ib ON pc.b = ib.pk
        |CROSS JOIN n
        |ORDER BY n_ab DESC, a ASC, b ASC LIMIT 50""".stripMargin,
    "yoy_growth" ->
      s"""WITH rev AS (SELECT date_trunc('month', o_orderdate) AS month,
         |  ${Det.sqlMoneySum("o_totalprice")} AS revenue FROM orders GROUP BY 1),
         |w AS (SELECT month, revenue,
         |        lag(revenue) OVER (PARTITION BY month(month) ORDER BY month)
         |          AS prev_year
         |      FROM rev)
         |SELECT month, revenue, prev_year, revenue / prev_year - 1.0 AS yoy
         |FROM w ORDER BY month""".stripMargin,
    "ratio_to_total" ->
      s"""WITH g AS (SELECT o_orderpriority, count(*) AS n_orders,
         |  ${Det.sqlMoneySum("o_totalprice")} AS revenue FROM orders GROUP BY 1),
         |t AS (SELECT ${Det.sqlMoneySum("o_totalprice")} AS total_revenue
         |      FROM orders)
         |SELECT o_orderpriority, n_orders, revenue,
         |  revenue / total_revenue AS rev_share
         |FROM g CROSS JOIN t ORDER BY o_orderpriority""".stripMargin,
    "brand_skyline" ->
      """SELECT r.p_brand, r.p_size, r.p_retailprice, r.p_partkey
        |FROM part r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_brand = r.p_brand
        |    AND q.p_size >= r.p_size AND q.p_retailprice <= r.p_retailprice
        |    AND (q.p_size > r.p_size OR q.p_retailprice < r.p_retailprice))
        |ORDER BY p_brand, p_size, p_retailprice, p_partkey""".stripMargin,
    "exact_median_groups" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, max(n) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS median_price
        |FROM r
        |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
