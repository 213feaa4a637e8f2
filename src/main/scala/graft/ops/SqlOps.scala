package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL front door (SURVEY.md §2b Q1–Q8 surface via `spark.sql`):
  * every registry query is DataFrame-declared, but a user of the engine
  * must also be able to hand it ANSI SQL text — same Catalyst pipeline,
  * same plans, zero translation layer. The query is the TPC-H Q1
  * pricing summary restated with exact-decimal sums (the fixture money
  * columns carry 2 decimal digits, so the DECIMAL casts are lossless
  * and every aggregate is merge-order-free — see [[graft.Det]]).
  *
  * `sum_charge` (the scale-6 triple product) routes its decimal→double
  * cast through an integer-valued DECIMAL(38,0): its unscaled sum tops
  * 2⁵³ at sf0.1, where DuckDB's fractional-decimal cast double-rounds
  * while Spark's rounds once (the regression_stats lesson — see
  * [[ProfileOps.regressionStats]]).
  */
object SqlOps {
  type Q = (SparkSession, String) => DataFrame

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    * (1 + CAST(l_tax AS DECIMAL(18,2)))) * 1000000 AS DECIMAL(38,0))
      |    AS DOUBLE) / CAST(1000000 AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q1 pricing summary, submitted as SQL TEXT against a temp view
    * — proving the textual surface: parse → analyze → same optimized
    * plan the DataFrame API would produce (predicate pushdown, partial
    * aggregation, the works). The oracle is the IDENTICAL string, so
    * this also pins ANSI-compatibility of the dialect used. */
  def sqlQ1Pricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q1Sql)
  }

  private val q3Sql =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q3 shipping-priority shape as SQL text (o_orderpriority
    * stands in for the fixture's missing o_shippriority): a three-table
    * join with per-table predicates, grouped exact-decimal revenue, and
    * a top-10. Catalyst plans it exactly as the DataFrame twin would —
    * both scan filters pushed down, customer broadcast into orders, the
    * one fact shuffle on the order key, TakeOrdered for the limit. */
  def sqlQ3Shipping(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q3Sql)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY total_price DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  /** TPC-H Q18 large-volume-customer shape as SQL text — the IN-subquery
    * + HAVING surface the first two front-door queries don't exercise.
    * Catalyst rewrites the IN into a LEFT SEMI join on the order key
    * (both fact inputs shuffle once on that key, the aggregate feeding
    * the semi join keeps map-side partials), customer broadcasts, and
    * the top-100 is TakeOrdered — no full sort. Quantity sums are
    * lossless DECIMAL(18,2), so the HAVING threshold and the output
    * sums are exact in both engines. */
  def sqlQ18TopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q18Sql)
  }

  private val q17Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |  / CAST(7 AS DOUBLE) AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND CAST(l_quantity AS DOUBLE) < CAST(0.2 AS DOUBLE) * (
      |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |      / COUNT(*)
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q17 small-quantity-order shape as SQL text (brand filter only
    * — the fixture part table has no container column): the CORRELATED
    * SCALAR SUBQUERY surface. Catalyst decorrelates the per-part average
    * into a grouped aggregate joined back on the part key — never a
    * per-row nested-loop re-execution; the plan spec pins the absence of
    * nested loops. Determinism doctrine: the threshold is an exact
    * DECIMAL sum cast once to DOUBLE then one IEEE division by the
    * count, spelled identically in both engines — avg(DECIMAL) itself
    * would be DECIMAL(22,6) in Spark but DOUBLE in DuckDB, and the
    * strict `<` could flip on the differently-rounded boundary. */
  def sqlQ17AvgYearly(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q17Sql)
  }

  private val q20Sql =
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7' AND s_suppkey IN (
      |  SELECT ps.suppkey FROM (
      |    SELECT l_suppkey AS suppkey, l_partkey AS partkey,
      |      SUM(CAST(l_quantity AS DECIMAL(18,2))) AS shipped97
      |    FROM lineitem
      |    WHERE l_partkey IN (
      |        SELECT p_partkey FROM part WHERE p_name LIKE 'cold%')
      |      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |    GROUP BY l_suppkey, l_partkey) ps
      |  WHERE ps.shipped97 > CAST(0.5 AS DECIMAL(2,1)) * (
      |    SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
      |    FROM lineitem l2
      |    WHERE l2.l_suppkey = ps.suppkey AND l2.l_partkey = ps.partkey))
      |ORDER BY s_name, s_suppkey""".stripMargin

  /** TPC-H Q20 potential-part-promotion shape as SQL text (the fixture has
    * no partsupp table, so the per-(part,supplier) supply relation is the
    * grouped lineitem itself — same join graph, same subquery nesting):
    * an IN whose subquery's WHERE carries a CORRELATED scalar subquery
    * with a TWO-COLUMN correlation, nested inside another IN. This is the
    * decorrelation case Q17/Q18 don't reach — Catalyst must rewrite the
    * inner correlated aggregate into a grouped join on BOTH correlation
    * keys, then fold the outer IN into a semi-join chain; the plan spec
    * pins the absence of nested-loop re-execution. All thresholds are
    * exact DECIMAL products (0.5 is DECIMAL(2,1), lossless ×2 digits), so
    * the strict `>` can't flip between engines. */
  def sqlQ20PromoSupp(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q20Sql)
  }

  private val q22Sql =
    """SELECT cntry, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntry, c_acctbal
      |  FROM customer
      |  WHERE c_nationkey % 5 IN (0, 2, 3)
      |    AND CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > (
      |      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |        / COUNT(*)
      |      FROM customer c2
      |      WHERE CAST(c2.c_acctbal AS DECIMAL(18,2)) > CAST(0.00 AS DECIMAL(18,2))
      |        AND c2.c_nationkey % 5 IN (0, 2, 3))
      |    AND c_custkey NOT IN (
      |      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |) t
      |GROUP BY cntry
      |ORDER BY cntry""".stripMargin

  /** TPC-H Q22 global-sales-opportunity shape as SQL text (the fixture
    * customer table has no phone column, so `c_nationkey % 5` stands in
    * for the country-code prefix, and "has never placed an order" becomes
    * "has never placed a 1-URGENT order" — the fixture's order coverage
    * is near-total, so the literal predicate would select ~nobody): the
    * NOT-IN + uncorrelated-scalar-average combination the other front
    * doors don't reach. Catalyst plans the single-column NOT IN as a
    * NULL-AWARE ANTI JOIN — a broadcast hash anti join with the
    * three-valued-logic null check folded in, never a per-row nested-loop
    * subquery — and the scalar average becomes a one-row broadcast
    * (plan-pinned in PlanAuditSpec). Determinism doctrine: the threshold
    * is an exact DECIMAL sum cast once to DOUBLE then one IEEE division
    * (the Q17 lesson), and the output sum is an exact DECIMAL cast once.
    *
    * Scale note: Spark's null-aware anti join REQUIRES a broadcastable
    * right side (otherwise it degenerates to BroadcastNestedLoopJoin).
    * The filtered urgent-order key list is small here and in most
    * deployments; when it is not — and the key column is known
    * non-nullable, as the fixture's is — NOT EXISTS is the scale-safe
    * spelling (it plans as a shuffled left anti join at any size). */
  def sqlQ22NoUrgent(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(q22Sql)
  }

  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND n_regionkey IN (0, 2)
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** TPC-H Q21 suppliers-who-kept-orders-waiting shape as SQL text (the
    * fixture lineitem has no commit/receipt dates, so "delivered late"
    * becomes the lineitem-intrinsic `l_returnflag = 'R'`, and the
    * nation filter widens to two regions so the fixture returns rows at
    * every SF — same join graph, same subquery nesting): the
    * DOUBLE-CORRELATED EXISTS + NOT EXISTS surface, each subquery
    * correlated on the order key AND carrying a NON-EQUI residual
    * (`l_suppkey <>`) against the outer row. This is the decorrelation
    * family Q17/Q18/Q20/Q22 don't reach: Catalyst must rewrite EXISTS
    * into a LEFT SEMI and NOT EXISTS into a LEFT ANTI hash join, both
    * keyed on `l_orderkey` with the supplier inequality folded into the
    * join CONDITION (not a post-filter — an anti join filtered after the
    * fact would be wrong), never a per-outer-row nested-loop
    * re-execution. The plan spec pins both join types and the absence of
    * nested loops. `numwait` is an exact COUNT, so the oracle compare is
    * integer-exact; ties order by (numwait DESC, s_name) so the top-100
    * cut is deterministic in both engines. */
  def sqlQ21Waiting(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q21Sql)
  }

  /** The Q2 supply relation (the `ps` CTE), its own statement so the
    * Spark side can materialize it ONCE: the CTE feeds both the outer
    * join chain and the decorrelated per-part min, and Catalyst's
    * exchange reuse shares only the SHUFFLE WRITE of the aggregate —
    * the finalize pass re-ran per consumer (r19, measured: two
    * 590k-record exchange reads + two finalize aggregates at sf0.1; the
    * market_basket r18 lesson). The oracle still sees the one-statement
    * `WITH ps AS (...)` form, assembled from the same text below. */
  private val q2PsSql =
    """SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      |  FROM lineitem GROUP BY 1, 2""".stripMargin

  private val q2BodySql =
    """SELECT s_name, n_name, p_partkey, CAST(ps.cost AS DOUBLE) AS cost
      |FROM part p JOIN ps ON ps.partkey = p.p_partkey
      |JOIN supplier s ON s.s_suppkey = ps.suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE p.p_name LIKE 'cold%' AND n.n_regionkey = 1
      |  AND ps.cost = (
      |    SELECT MIN(ps2.cost) FROM ps ps2
      |    JOIN supplier s2 ON s2.s_suppkey = ps2.suppkey
      |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      |    WHERE ps2.partkey = p.p_partkey AND n2.n_regionkey = 1)
      |ORDER BY cost ASC, s_name ASC, p_partkey ASC
      |LIMIT 100""".stripMargin

  private val q2Sql = s"WITH ps AS ($q2PsSql)\n$q2BodySql"

  /** TPC-H Q2 minimum-cost-supplier shape as SQL text (the fixture has no
    * partsupp/region tables, so the supply relation is MIN-price-grouped
    * lineitem and the region filter is `n_regionkey` directly — same join
    * graph, same subquery nesting): a correlated scalar MIN whose
    * subquery CONTAINS ITS OWN JOIN CHAIN (supply × supplier × nation) —
    * the decorrelation variant Q17/Q20 (single-table correlated
    * aggregates) don't reach. Catalyst must decorrelate the aggregate
    * THROUGH the joins: the inner chain becomes a per-part grouped MIN
    * joined back on the part key, with the region filter applied inside
    * — never a per-part re-execution of the three-way join. Ties at the
    * minimum cost return every tied supplier (as in real Q2); cost is an
    * exact DECIMAL MIN so the tie set is engine-identical, and the ORDER
    * BY carries full tiebreakers. */
  def sqlQ2MinCost(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    // materialize the supply CTE once (see q2PsSql); the pinned frame
    // replaces the CTE by NAME, so q2BodySql is textually the oracle's
    // body and the result is byte-identical
    PinCache.pinned(spark.sql(q2PsSql)).createOrReplaceTempView("ps")
    spark.sql(q2BodySql)
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** TPC-H Q5 local-supplier-volume shape as SQL text: the six-way join
    * whose distinguishing edge is the NON-FK equality `c_nationkey =
    * s_nationkey` — customer and supplier must share a nation, a join
    * predicate that rides on a DIFFERENT table pair than the key chain
    * (customer→orders→lineitem→supplier). The planner must fold it into
    * the supplier join condition rather than produce a
    * nation-cross-product and post-filter; nation/region broadcast, the
    * date range pushes to the orders scan, and revenue is the classic
    * price×(1−discount) DECIMAL product — exact on both engines, so the
    * hash gate covers the arithmetic as well as the join graph. */
  def sqlQ5LocalVolume(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.region(spark, sfDir).createOrReplaceTempView("region")
    spark.sql(q5Sql)
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q4 order-priority-checking shape as SQL text (the fixture
    * lineitem has no commit/receipt dates, so the lateness predicate is
    * `l_shipdate > o_orderdate` — same correlation structure): an EXISTS
    * whose subquery correlates on the order key AND compares an inner
    * column against an OUTER column (`o_orderdate`) — a non-equi
    * residual riding on an outer attribute, the decorrelation case Q21's
    * self-side residual (`l_suppkey <>` within lineitem) doesn't cover.
    * Catalyst plans it as ONE left-semi hash join on the key with the
    * date comparison folded into the join condition, then the grouped
    * count over the survivors — never a per-order subquery execution.
    * All-integer output (count), so the hash gate is trivially exact. */
  def sqlQ4PriorityCheck(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q4Sql)
  }

  private val q11Sql =
    """SELECT l_partkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS part_value
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |    * (SELECT 2 * COUNT(DISTINCT l_partkey) FROM lineitem)
      |  > (SELECT 3 * SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |     FROM lineitem)
      |ORDER BY part_value DESC, l_partkey ASC""".stripMargin

  /** TPC-H Q11 important-stock shape as SQL text (no partsupp in the
    * fixture, so the value relation is per-part lineitem revenue — same
    * query structure): a HAVING clause comparing each group's aggregate
    * against UNCORRELATED SCALAR subqueries over the same corpus-sized
    * table — the "group share of global total" gate. Q11's literal
    * FRACTION·SF threshold is scale-dependent by spec; here the gate is
    * "part value > 1.5× the mean part value", spelled as the integer
    * cross-multiplication `part_sum · 2·nparts > 3 · total_sum` so BOTH
    * sides stay exact DECIMAL/integer products (a decimal DIVISION for
    * the mean would round differently across engines) and the survivor
    * set stays populated at every fixture scale. Catalyst evaluates each
    * scalar ONCE (separate 1-row aggregate subqueries injected into the
    * post-aggregation filter), never per group, and the group-side
    * aggregate keeps map-side partials. */
  def sqlQ11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q11Sql)
  }

  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q15 top-supplier shape as SQL text: the classic VIEW + global
    * MAX pattern — a derived per-supplier revenue relation referenced
    * TWICE (once as the join input, once under the scalar MAX), spelled
    * as a CTE (the modern form of Q15's CREATE VIEW). Catalyst plans the
    * scalar MAX as a 1-row aggregate over the CTE and the equality as a
    * post-join filter — the CTE's grouped aggregate is the only
    * corpus-sized work, and ties at the maximum all return (per the
    * TPC-H definition) with `s_suppkey` ordering keeping the output
    * deterministic. Revenue is the exact price×(1−discount) DECIMAL
    * product, so the max TIE SET — the part a float spelling would get
    * wrong — is engine-identical. */
  def sqlQ15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q15Sql)
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q13 customer-distribution shape as SQL text (the priority
    * filter stands in for the spec's comment NOT LIKE): the
    * LEFT OUTER JOIN whose non-key predicate lives in the ON clause —
    * semantically NOT a WHERE (it must preserve customers with no
    * qualifying orders as zero-count rows, so the optimizer may push it
    * to the orders SCAN but never below the join as a post-filter) —
    * followed by the double aggregation: per-customer order counts, then
    * the histogram over those counts. `COUNT(o_orderkey)` counts
    * non-null keys only, so outer-join null extension becomes the 0 bin.
    * All-integer output — the hash gate is exact by construction. */
  def sqlQ13CustDist(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(q13Sql)
  }

  private val q14Sql =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
      |    AS promo_revenue,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS total_revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  /** TPC-H Q14 promotion-effect shape as SQL text: conditional
    * aggregation — a CASE branch INSIDE the SUM splitting one pass's
    * revenue by a dimension attribute, over a month-windowed
    * fact-to-dimension join. The spec's `100·promo/total` float division
    * is the one part that would round differently across engines, so the
    * numerator and denominator are returned as separate exact-DECIMAL
    * sums instead (the caller's division is presentation, not
    * semantics). The CASE has no ELSE — SUM ignores NULLs, the idiomatic
    * conditional-sum spelling both engines agree on exactly. Part
    * broadcasts; the month filter pushes to the fact scan. */
  def sqlQ14PromoEffect(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    spark.sql(q14Sql)
  }

  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5'
      |  AND p_type <> 'MEDIUM'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q16 parts-supplier-relationship shape as SQL text (lineitem
    * stands in for partsupp; the low-balance exclusion for the spec's
    * complaints subquery): the NOT IN subquery — the one decorrelation
    * family none of the other fronts cover, because NOT IN is
    * THREE-VALUED: if the subquery produced a NULL, the whole predicate
    * is UNKNOWN for every row and the result is empty, so a plain
    * left-anti join is wrong unless the planner can prove no nulls.
    * Catalyst plans it as a broadcast NULL-AWARE anti join
    * (`isNullAwareAntiJoin` in the physical plan — single-key,
    * broadcast-able exclusion set), never a per-row subquery or a
    * cartesian. On top of it: COUNT(DISTINCT) over the surviving
    * fact side and the dimension predicates pushed to the part scan. */
  def sqlQ16PartSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    spark.sql(q16Sql)
  }

  private val q19Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q19 discounted-revenue shape as SQL text: the disjunction of
    * conjunctions — three OR'd arms each constraining BOTH sides of the
    * join (part brand/size AND lineitem quantity). The naive plan
    * evaluates the whole disjunction post-join over the full cross of
    * surviving rows; the right plan extracts each side's implied
    * disjunction (`p_brand IN (…) AND p_size ≤ 25` to the part scan,
    * `l_quantity BETWEEN 1 AND 30` to the fact scan) so both inputs
    * shrink BEFORE the join and the full residual evaluates only on
    * key-matched pairs — the CNF-extraction behavior PlanAuditSpec pins.
    * Exact-DECIMAL revenue, so the arm boundaries (quantity endpoints,
    * size endpoints) are engine-identical. */
  def sqlQ19DiscountedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    spark.sql(q19Sql)
  }

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q6 forecasting-revenue shape as SQL text: the pure
    * scan-predicate aggregate — every predicate (date range, discount
    * band, quantity cap) must reach the parquet scan as a pushed filter;
    * no join, no shuffle beyond the 1-row gather. The discount band
    * compares DOUBLES directly: both engines parse `0.05` to the same
    * IEEE value the fixture stores, so the band edges are exact without
    * a cast (a DECIMAL cast here would block parquet pushdown — the
    * plan pin is the point). Revenue is price×discount in exact
    * DECIMAL. */
  def sqlQ6Forecast(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q6Sql)
  }

  private val q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q7 volume-shipping shape as SQL text: the SAME dimension
    * table joined TWICE under different roles (supplier's nation and
    * customer's nation) with a symmetric two-arm disjunction over the
    * pair — the planner must keep both alias scans independent, push
    * the per-alias nation-name disjunction (`n_name IN (A,B)` implied on
    * EACH side) into both tiny scans, and evaluate the cross-arm
    * residual post-join; plus the derived-column GROUP BY (extract-year)
    * that must not block partial aggregation. */
  def sqlQ7VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    spark.sql(q7Sql)
  }

  private val q8Sql =
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE)
      |    AS nation_volume,
      |  CAST(SUM(volume) AS DOUBLE) AS total_volume
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
      |    n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region   ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q8 national-market-share shape as SQL text: the eight-way
    * join (nation twice — the customer side filters through region, the
    * supplier side labels the volume) feeding a conditional share per
    * year. The spec's `share = Σ(case)/Σ` float division is returned as
    * exact numerator and denominator (the Q14 doctrine). The market
    * nation rides ONLY in the CASE — no filter — so the planner keeps
    * one pass over the region-filtered join for both sums. */
  def sqlQ8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.region(spark, sfDir).createOrReplaceTempView("region")
    spark.sql(q8Sql)
  }

  private val q9Sql =
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      - CAST(p_retailprice AS DECIMAL(18,2))
      |        * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q9 product-type-profit shape as SQL text (retail price ×
    * quantity stands in for the missing partsupp supply cost — same
    * expression structure: a DIFFERENCE of two exact-DECIMAL products):
    * the contains-LIKE (`%red%`, not a prefix — no range conversion
    * possible, must evaluate as a scan filter), a five-way join, and
    * profit aggregated by a dimension attribute × derived year. Amounts
    * can be NEGATIVE (cost exceeds revenue) — exact DECIMAL keeps the
    * sign crossings engine-identical where float sums could differ. */
  def sqlQ9ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    spark.sql(q9Sql)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  /** TPC-H Q10 returned-item-reporting shape as SQL text: the
    * quarter-windowed fact join filtered on the RETURN flag, grouped per
    * customer with the nation label carried through, top-20 by exact
    * revenue with the key as tiebreaker (the TakeOrdered pattern — no
    * full sort). Both the order-date range and the return-flag equality
    * must reach their respective scans. */
  def sqlQ10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    spark.sql(q10Sql)
  }

  private val q12Sql =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q12 shipping-mode-priority shape as SQL text (l_linestatus
    * stands in for the fixture's missing shipmode; the cross-table
    * lateness inequality `l_shipdate > o_orderdate` echoes the spec's
    * receipt/commit comparison): a fact-fact join with a NON-EQUI
    * residual riding the equi-join, feeding the two complementary
    * conditional counts over an ORDERS attribute grouped by a LINEITEM
    * attribute — the "count by priority class" split. The integer CASE
    * sums are cast to BIGINT on both engines (DuckDB sums ints into
    * HUGEINT). */
  def sqlQ12ShipPriority(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(q12Sql)
  }

  private val pipeSql =
    """FROM lineitem
      ||> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      ||> AGGREGATE
      |     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |       AS sum_base_price,
      |     COUNT(*) AS count_order
      |   GROUP BY l_returnflag, l_linestatus
      ||> ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** SQL PIPE syntax front door (Spark 4's `|>` operator chains — the
    * linear spelling of the same relational algebra, increasingly the
    * house dialect of analytics SQL): the Q1 pricing shape restated as
    * FROM |> WHERE |> AGGREGATE |> ORDER BY. Same parser entry point,
    * same Catalyst plan as the ANSI spelling — which is exactly what the
    * oracle pins: DuckDB has no pipe syntax, so the oracle is the ANSI
    * twin and the hash gate proves the two dialects are the SAME query
    * (exact-decimal sums make the comparison bit-identical). */
  def sqlPipePricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    spark.sql(pipeSql)
  }

  val queries: Map[String, Q] = Map(
    "sql_pipe_pricing"  -> (sqlPipePricing _),
    "sql_q4_prioritycheck" -> (sqlQ4PriorityCheck _),
    "sql_q11_importantparts" -> (sqlQ11ImportantParts _),
    "sql_q6_forecast"   -> (sqlQ6Forecast _),
    "sql_q7_volumeshipping" -> (sqlQ7VolumeShipping _),
    "sql_q8_marketshare" -> (sqlQ8MarketShare _),
    "sql_q9_productprofit" -> (sqlQ9ProductProfit _),
    "sql_q10_returneditems" -> (sqlQ10ReturnedItems _),
    "sql_q12_shippriority" -> (sqlQ12ShipPriority _),
    "sql_q13_custdist"  -> (sqlQ13CustDist _),
    "sql_q14_promoeffect" -> (sqlQ14PromoEffect _),
    "sql_q16_partsuppliers" -> (sqlQ16PartSuppliers _),
    "sql_q19_discountedrev" -> (sqlQ19DiscountedRevenue _),
    "sql_q15_topsupplier" -> (sqlQ15TopSupplier _),
    "sql_q2_mincost"    -> (sqlQ2MinCost _),
    "sql_q5_localvolume" -> (sqlQ5LocalVolume _),
    "sql_q1_pricing"    -> (sqlQ1Pricing _),
    "sql_q3_shipping"   -> (sqlQ3Shipping _),
    "sql_q17_avgyearly" -> (sqlQ17AvgYearly _),
    "sql_q18_toporders" -> (sqlQ18TopOrders _),
    "sql_q20_promosupp" -> (sqlQ20PromoSupp _),
    "sql_q21_waiting"   -> (sqlQ21Waiting _),
    "sql_q22_nourgent"  -> (sqlQ22NoUrgent _))

  val oracle: Map[String, String] = Map(
    "sql_pipe_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "sql_q4_prioritycheck" -> q4Sql,
    "sql_q11_importantparts" -> q11Sql,
    "sql_q6_forecast"   -> q6Sql,
    "sql_q7_volumeshipping" -> q7Sql,
    "sql_q8_marketshare" -> q8Sql,
    "sql_q9_productprofit" -> q9Sql,
    "sql_q10_returneditems" -> q10Sql,
    "sql_q12_shippriority" -> q12Sql,
    "sql_q13_custdist"  -> q13Sql,
    "sql_q14_promoeffect" -> q14Sql,
    "sql_q16_partsuppliers" -> q16Sql,
    "sql_q19_discountedrev" -> q19Sql,
    "sql_q15_topsupplier" -> q15Sql,
    "sql_q2_mincost"    -> q2Sql,
    "sql_q5_localvolume" -> q5Sql,
    "sql_q1_pricing"    -> q1Sql,
    "sql_q3_shipping"   -> q3Sql,
    "sql_q17_avgyearly" -> q17Sql,
    "sql_q18_toporders" -> q18Sql,
    "sql_q20_promosupp" -> q20Sql,
    "sql_q21_waiting"   -> q21Sql,
    "sql_q22_nourgent"  -> q22Sql)
}
