package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window-function surface (SURVEY.md §2b Q18) — the reference's
  * "secondary sort in the reducer" pattern (sorted gather, O9) expressed
  * as Spark window specs: one hash-partition exchange on the partition
  * key, an in-partition sort, and a single streaming pass. At 100 TB the
  * partition key (customer/user) is high-cardinality, so partitions stay
  * small and spill-free; no global sort is ever needed.
  */
object WindowOps {
  type Q = (SparkSession, String) => DataFrame

  /** Q18 ranking: top-3 orders per customer by price. The window ORDER BY
    * carries a unique tiebreaker so row_number is deterministic. */
  def windowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Q18 running aggregate + lag: cumulative spend per user over the event
    * stream. The running sum accumulates in exact DECIMAL so the prefix
    * sums are order-exact and engine-independent. */
  def windowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("running_value"), coalesce(col("prev_value"), lit(-1.0)).as("prev_value"))
      .orderBy("user_id", "event_id")
  }

  /** Q18 rank-with-gaps + dense_rank + ntile on supplier balances —
    * covers the remaining ranking family in one pass.
    *
    * Executed as a TWO-PHASE global rank (no single-partition window):
    * range-partition on the ordering key, rank locally inside each range,
    * then add per-range row-count offsets (a |partitions|-row aggregate,
    * broadcast back). Because the window ORDER BY carries a unique
    * tiebreaker (s_suppkey) there are no ties, so rank == dense_rank ==
    * row_number — the offset composition is exact — and ntile(q) is a
    * closed-form function of (global row_number, total n): the first
    * n%q tiles get ⌈n/q⌉ rows, the rest ⌊n/q⌋. Range bounds are sampled
    * and may vary run-to-run, but the global position is invariant to
    * where the contiguous ranges are cut, so the result is deterministic.
    * At 100 TB this is the only formulation that works: every partition
    * sorts its own disjoint range; nothing ever funnels through one task. */
  def windowRankFamily(spark: SparkSession, sfDir: String): DataFrame = {
    val df = Tables.supplier(spark, sfDir).select("s_suppkey", "s_acctbal")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, col("s_acctbal").desc, col("s_suppkey").asc)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid")
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal).cast("long"))
    // per-range counts: |parts| rows; the prefix-sum window over them is a
    // single-partition pass over |parts| rows — bounded, not data-scaled
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn("__n", sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__off", "__n")
    local.join(broadcast(offsets), "__pid")
      .withColumn("rn", col("__lrn") + col("__off"))
      // ntile(4): the first n%4 tiles get ⌈n/4⌉ rows, the rest ⌊n/4⌋;
      // when n < 4 the else-branch (÷ by zero base) is unreachable —
      // every rn falls inside the first n tiles of size 1.
      .withColumn("bal_quartile", expr(
        """cast(case
          |  when rn <= (__n % 4) * ((__n div 4) + 1)
          |    then (rn - 1) div ((__n div 4) + 1)
          |  else (__n % 4) + (rn - (__n % 4) * ((__n div 4) + 1) - 1) div (__n div 4)
          |end + 1 as bigint)""".stripMargin))
      .select(col("s_suppkey"),
        col("rn").as("bal_rank"),
        col("rn").as("bal_dense_rank"),
        col("bal_quartile"))
      .orderBy("s_suppkey")
  }

  /** Q18 RANGE frame: 30-day trailing spend per customer — the
    * value-based window frame (peers enter/leave by timestamp distance,
    * not row position), the shape rolling-feature pipelines use.
    * One exchange on the partition key; the frame sum is DECIMAL until
    * the final cast so frame-merge order can't drift a cent. Spark needs
    * a numeric range key, so the timestamp is ordered as epoch seconds
    * and the frame is ±seconds — identical peer sets to the SQL
    * INTERVAL frame. */
  def windowTrailingRange(spark: SparkSession, sfDir: String): DataFrame = {
    // NTZ → timestamp → epoch seconds; the frame uses value DIFFERENCES,
    // so the (UTC-pinned) epoch offset cancels and peers are exactly the
    // SQL INTERVAL peers
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("trailing_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q18 navigation family: lead / first_value / last_value over a
    * bounded frame — one pass per partition, same exchange as ranking. */
  def windowNavigation(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)).as("next_price"),
        first(col("o_orderkey")).over(wFull).as("first_order"),
        last(col("o_orderkey")).over(wFull).as("last_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q18 via the custom [[graft.plans.TopKPerKey]] operator: identical
    * semantics to [[windowRank]] (same DuckDB oracle) but executed with
    * bounded per-key heaps instead of a full per-partition window sort —
    * the custom LogicalPlan → Strategy → SparkPlan extension tier,
    * correctness-gated by the oracle. */
  def windowRankCustom(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
        Tables.orders(spark, sfDir), Seq("o_custkey"),
        "o_totalprice", descending = true, tiebreakers = Seq("o_orderkey"), k = 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")

  /** Q18 distribution family: quartile (ntile), percent_rank and
    * cume_dist of each customer's balance within its nation — the
    * normalized-position window functions (the quantile-bucketing shape
    * feature pipelines use for per-group score calibration). The order
    * key carries the custkey tiebreaker, so every rank-derived ratio is
    * deterministic; the ratios themselves are single IEEE divisions of
    * integer counts — bit-identical across engines. */
  def windowCume(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as("nationkey"), col("c_custkey"),
        col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("nationkey", "c_acctbal", "c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "window_rank"        -> (windowRank _),
    "window_rank_custom" -> (windowRankCustom _),
    "window_running"     -> (windowRunning _),
    "window_rank_family" -> (windowRankFamily _),
    "window_navigation"  -> (windowNavigation _),
    "window_cume"        -> (windowCume _),
    "window_trailing_range" -> (windowTrailingRange _))

  val oracle: Map[String, String] = Map(
    "window_trailing_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate
        |     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_30d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_cume" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY nationkey, c_acctbal, c_custkey""".stripMargin,
    "window_navigation" ->
      """SELECT o_custkey, o_orderkey,
        |  coalesce(lead(o_totalprice, 1) OVER w, -1.0) AS next_price,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  last_value(o_orderkey) OVER wf AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_rank_custom" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_running" ->
      """SELECT user_id, event_id, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value,
        |  coalesce(lag(value, 1) OVER (PARTITION BY user_id
        |                               ORDER BY ts ASC, event_id ASC), -1.0)
        |    AS prev_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "window_rank_family" ->
      """SELECT s_suppkey,
        |  CAST(rank() OVER w AS BIGINT) AS bal_rank,
        |  CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank,
        |  CAST(ntile(4) OVER w AS BIGINT) AS bal_quartile
        |FROM supplier
        |WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC)
        |ORDER BY s_suppkey""".stripMargin)
}
