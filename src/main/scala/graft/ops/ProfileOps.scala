package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    // decimal→double via an INTEGER-VALUED decimal: DuckDB's cast of a
    // fractional-scale DECIMAL to DOUBLE divides in floating point (two
    // roundings — observed 1 ulp off the correctly-rounded value on the
    // 17-significant-digit Σy² at sf0.001), while Spark's BigDecimal
    // path rounds once. Scaling to DECIMAL(38,0) first makes both
    // engines do the same two steps: one correctly-rounded int→double
    // conversion, then one IEEE division by the power of ten.
    def exactD(s: Column, scale: Long): Column =
      (s * lit(scale)).cast("decimal(38,0)").cast("double") / lit(scale.toDouble)
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        exactD(sum(x), 100L).as("sxd"), exactD(sum(y), 100L).as("syd"),
        exactD(sum(x * y), 10000L).as("sxyd"),
        exactD(sum(x * x), 10000L).as("sxxd"),
        exactD(sum(y * y), 10000L).as("syyd"))
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

  /** Data-quality expectations report: each rule yields one long-form
    * row (rule, n_violations, n_checked) — the contract-check table an
    * ingest gate publishes before promoting a drop. Single-table rules
    * (nulls, ranges, duplicate keys) share ONE pruned scan per table and
    * explode from a single aggregate row; cross-table rules are keyed
    * joins — referential orphans as anti-joins on the foreign key,
    * order-consistency as an equi-join — so every rule is a shuffle-
    * keyed or scan-local pass, nothing driver-side, and the report
    * unions a handful of 1-to-3-row frames. */
  def dqChecks(spark: SparkSession, sfDir: String): DataFrame = {
    val o  = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val c  = Tables.customer(spark, sfDir)
    val orderRules = o
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_key"),
        count(when(col("o_custkey").isNull, lit(1))).as("null_cust"),
        count(when(col("o_totalprice") <= 0, lit(1))).as("bad_price"))
      .select(explode(array(
        struct(lit("orders_dup_orderkey").as("rule"),
          col("dup_key").as("n_violations"), col("n").as("n_checked")),
        struct(lit("orders_null_custkey").as("rule"),
          col("null_cust").as("n_violations"), col("n").as("n_checked")),
        struct(lit("orders_nonpositive_totalprice").as("rule"),
          col("bad_price").as("n_violations"), col("n").as("n_checked"))))
        .as("r"))
      .select(col("r.rule"), col("r.n_violations"), col("r.n_checked"))
    val lineRules = li
      .agg(count(lit(1)).as("n"),
        count(when(col("l_discount") < 0 || col("l_discount") > 1, lit(1)))
          .as("bad_disc"),
        count(when(col("l_extendedprice") <= 0, lit(1))).as("bad_price"))
      .select(explode(array(
        struct(lit("lineitem_discount_range").as("rule"),
          col("bad_disc").as("n_violations"), col("n").as("n_checked")),
        struct(lit("lineitem_nonpositive_extendedprice").as("rule"),
          col("bad_price").as("n_violations"), col("n").as("n_checked"))))
        .as("r"))
      .select(col("r.rule"), col("r.n_violations"), col("r.n_checked"))
    val orphanLi = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(li.agg(count(lit(1)).as("n_checked")))
      .select(lit("lineitem_orphan_orderkey").as("rule"),
        col("n_violations"), col("n_checked"))
    val orphanO = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(o.agg(count(lit(1)).as("n_checked")))
      .select(lit("orders_orphan_custkey").as("rule"),
        col("n_violations"), col("n_checked"))
    val shipBefore = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .agg(count(when(col("l_shipdate") < col("o_orderdate"), lit(1)))
          .as("n_violations"),
        count(lit(1)).as("n_checked"))
      .select(lit("lineitem_ship_before_order").as("rule"),
        col("n_violations"), col("n_checked"))
    orderRules.unionAll(lineRules).unionAll(orphanLi).unionAll(orphanO)
      .unionAll(shipBefore)
      .orderBy("rule")
  }

  /** Two-sample Welch z-test per segment (click vs purchase value by ISO
    * weekday) — the experiment-readout query an A/B platform serves.
    * Same mergeable-statistics contract as [[regressionStats]]: n, Σx,
    * Σx² per (segment, arm) are exact decimal sums in ONE conditional
    * grouped pass over the fact (never one pass per arm); mean,
    * variance and z combine them in a fixed IEEE sequence both engines
    * execute identically, so the doubles hash-match. */
  def abTestZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val v = col("value").cast("decimal(18,2)")
    def armAgg(arm: String, suffix: String): Seq[Column] = Seq(
      count(when(col("event_type") === arm, lit(1))).as(s"n$suffix"),
      sum(when(col("event_type") === arm, v)).cast("double").as(s"s$suffix"),
      sum(when(col("event_type") === arm, v * v)).cast("double").as(s"ss$suffix"))
    val aggs = armAgg("click", "1") ++ armAgg("purchase", "2")
    def meanOf(s: String, n: String) = col(s) / col(n).cast("double")
    def varOf(s: String, ss: String, n: String) =
      (col(ss) - col(s) * col(s) / col(n).cast("double")) /
        (col(n).cast("double") - lit(1.0))
    Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("dow", (weekday(col("ts")) + lit(1)).cast("long"))
      .groupBy("dow")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("m1", meanOf("s1", "n1"))
      .withColumn("m2", meanOf("s2", "n2"))
      .withColumn("v1", varOf("s1", "ss1", "n1"))
      .withColumn("v2", varOf("s2", "ss2", "n2"))
      .select(col("dow"), col("n1"), col("n2"), col("m1"), col("m2"),
        ((col("m1") - col("m2")) /
          sqrt(col("v1") / col("n1").cast("double") +
            col("v2") / col("n2").cast("double"))).as("z"))
      .orderBy("dow")
  }

  /** Robust outlier gate: per-priority median + MAD (median absolute
    * deviation) on order totals, counting rows beyond 3×MAD — the
    * heavy-tail-safe twin of the mean/σ gate (`outlier_zscore`), which a
    * single extreme value cannot drag. Both medians use the exact
    * two-middle-rows selection of `exact_median_groups` (deterministic
    * tiebreaker, DECIMAL mean for the value median; the deviation median
    * averages at most TWO doubles, where IEEE `+` is commutative, so it
    * is merge-order-free without a decimal cast). Each median is one
    * window pass on the segment key; the 5-row med/MAD tables broadcast
    * back over the fact. Low-cardinality caveat and its two-phase
    * global-rank fallback as documented on `exact_median_groups`. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").as("p"), col("o_orderkey").as("k"),
      col("o_totalprice").as("x"))
    def twoMiddle(df: DataFrame, v: String, agg: Column, out: String) = {
      val w = Window.partitionBy("p").orderBy(col(v).asc, col("k").asc)
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("p")))
        .filter(col("rn") === expr("(n + 1) div 2") ||
          col("rn") === expr("(n + 2) div 2"))
        .groupBy("p").agg(agg.as(out))
    }
    val med = twoMiddle(o, "x",
      sum(col("x").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double"), "med")
    val dev = o.join(broadcast(med), "p")
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = twoMiddle(dev, "dev",
      sum(col("dev")) / count(lit(1)).cast("double"), "mad")
    dev.join(broadcast(mad), "p")
      .groupBy("p")
      .agg(count(lit(1)).as("n_rows"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumnRenamed("p", "o_orderpriority")
      .orderBy("o_orderpriority")
  }

  /** Winsorization: clamp each segment's account balances to its exact
    * [P5, P95] rank boundaries and report the mean before/after — the
    * standard outlier-robust preprocessing step before model features.
    * Boundaries are VALUES AT EXACT RANKS (ceil(q·n) with a unique
    * tiebreaker — no interpolation), so the clamped values are still
    * members of the 2-decimal input domain and the winsorized mean stays
    * an exact DECIMAL sum with one IEEE division. One window pass on the
    * segment key finds both boundaries; the 5-row bounds table
    * broadcasts back over the fact for the clamp — no second sort. The
    * multiply `0.05 * n` runs in exact decimal in BOTH engines, so the
    * rank selection cannot drift. Low-cardinality caveat and the
    * two-phase global-rank fallback as documented on
    * `exact_median_groups`. */
  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(
      col("c_mktsegment").as("seg"), col("c_custkey").as("k"),
      col("c_acctbal").as("x"))
    val w = Window.partitionBy("seg").orderBy(col("x").asc, col("k").asc)
    val bounds = c.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("seg")))
      .groupBy("seg")
      .agg(max(when(col("rn") === expr("CAST(ceil(0.05 * n) AS BIGINT)"),
          col("x"))).as("p05"),
        max(when(col("rn") === expr("CAST(ceil(0.95 * n) AS BIGINT)"),
          col("x"))).as("p95"))
    c.join(broadcast(bounds), "seg")
      .withColumn("wx", least(greatest(col("x"), col("p05")), col("p95")))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_rows"), max(col("p05")).as("p05"),
        max(col("p95")).as("p95"),
        (sum(col("x").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_raw"),
        (sum(col("wx").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_wins"))
      .withColumnRenamed("seg", "c_mktsegment")
      .orderBy("c_mktsegment")
  }

  /** Distribution DRIFT detection per source — the two-sample
    * Kolmogorov–Smirnov statistic between the prior snapshot (the
    * `doc_id ≤ max/2` half, [[DedupOps.dedupIncremental]]'s data-derived
    * cut standing in for yesterday's table) and the new batch, over the
    * per-document token count. The monitoring gate a training-data
    * pipeline runs on every ingest: a KS spike on a source says its
    * length distribution moved (scraper change, truncation bug, new
    * template) before any downstream model sees it.
    *
    * KS = sup over the union support of |F_old(x) − F_new(x)|, computed
    * EXACTLY in integers: D_num = max |cum_old·n_new − cum_new·n_old|
    * and the statistic is one final IEEE division by n_old·n_new — no
    * float CDFs to merge-order-drift, so the result hash-compares.
    *
    * Scale shape: one counting scan (plus the 1-row snapshot-cut
    * aggregate's own 2-column scan — in production the cut is the known
    * snapshot boundary, not derived) → (source, value)-keyed conditional
    * counts (map-side combined — the shuffle carries distinct
    * (source, value) pairs, bounded by |sources|·|support|, not docs) →
    * one per-source cumulative window over the compact support → a
    * |sources|-row max rollup. */
  def qualityKsDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("v"))
    val cut = docs.agg(expr("max(doc_id) DIV 2").as("cut"))
    val per = docs.crossJoin(broadcast(cut))
      .groupBy("source", "v").agg(
        count(when(col("doc_id") <= col("cut"), 1)).as("c1"),
        count(when(col("doc_id") > col("cut"), 1)).as("c2"))
    ksFromCounts(per)
  }

  /** The KS rollup from a per-(source, value) count table with columns
    * (source, v, c1, c2) — exposed so the STREAMING drift monitor
    * ([[graft.streaming.StreamOps]]) computes the statistic from its
    * incrementally-maintained count store with the SAME definition
    * instead of a copy that can drift. */
  private[graft] def ksFromCounts(per: DataFrame): DataFrame = {
    val w = Window.partitionBy("source").orderBy("v")
    val tot = per.groupBy("source")
      .agg(sum("c1").as("n_old"), sum("c2").as("n_new"))
    per.withColumn("cum1", sum("c1").over(w))
      .withColumn("cum2", sum("c2").over(w))
      .join(tot, "source")
      .groupBy(col("source"), col("n_old"), col("n_new"))
      .agg(max(abs(col("cum1") * col("n_new") - col("cum2") * col("n_old")))
        .as("d_num"))
      .select(col("source"),
        col("n_old").cast("long").as("n_old"),
        col("n_new").cast("long").as("n_new"),
        col("d_num").cast("long").as("d_num"),
        // a source on only ONE side of the cut (new scraper, vanished
        // feed) is the strongest drift there is: sup|F_old − F_new| = 1
        // by definition, but the cross-product form degenerates to 0/0
        // — guard it to the exact value instead of NaN, which would
        // silently pass every `ks > threshold` monitor (review finding)
        when(col("n_old") === 0 || col("n_new") === 0, lit(1.0))
          .otherwise(col("d_num").cast("double") /
            (col("n_old") * col("n_new")).cast("double")).as("ks_stat"))
      .orderBy("source")
  }

  val queries: Map[String, Q] = Map(
    "quality_ks_drift" -> (qualityKsDrift _),
    "profile_table"    -> (profileTable _),
    "string_agg_group" -> (stringAggGroup _),
    "regression_stats" -> (regressionStats _),
    "ab_test_zscore"   -> (abTestZscore _),
    "mad_outliers"     -> (madOutliers _),
    "winsorize"        -> (winsorize _),
    "dq_checks"        -> (dqChecks _))

  private def profileUnionSql: String =
    profiledCols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_str,
         |  CAST(max($c) AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  private val dqSql: String =
    """SELECT 'orders_dup_orderkey' AS rule,
      |  count(*) - count(DISTINCT o_orderkey) AS n_violations,
      |  count(*) AS n_checked FROM orders
      |UNION ALL
      |SELECT 'orders_null_custkey',
      |  count(CASE WHEN o_custkey IS NULL THEN 1 END), count(*) FROM orders
      |UNION ALL
      |SELECT 'orders_nonpositive_totalprice',
      |  count(CASE WHEN o_totalprice <= 0 THEN 1 END), count(*) FROM orders
      |UNION ALL
      |SELECT 'lineitem_discount_range',
      |  count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END), count(*)
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_nonpositive_extendedprice',
      |  count(CASE WHEN l_extendedprice <= 0 THEN 1 END), count(*) FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_orphan_orderkey',
      |  (SELECT count(*) FROM lineitem li
      |   WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                     WHERE o.o_orderkey = li.l_orderkey)),
      |  (SELECT count(*) FROM lineitem)
      |UNION ALL
      |SELECT 'orders_orphan_custkey',
      |  (SELECT count(*) FROM orders o
      |   WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                     WHERE c.c_custkey = o.o_custkey)),
      |  (SELECT count(*) FROM orders)
      |UNION ALL
      |SELECT 'lineitem_ship_before_order',
      |  count(CASE WHEN l_shipdate < o_orderdate THEN 1 END), count(*)
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY rule""".stripMargin

  private val abTestSql: String = {
    def arm(a: String, i: Int) =
      s"""count(CASE WHEN event_type = '$a' THEN 1 END) AS n$i,
         |    CAST(SUM(CASE WHEN event_type = '$a'
         |      THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s$i,
         |    CAST(SUM(CASE WHEN event_type = '$a'
         |      THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))
         |      END) AS DOUBLE) AS ss$i""".stripMargin
    s"""WITH s AS (
       |  SELECT isodow(ts) AS dow,
       |    ${arm("click", 1)},
       |    ${arm("purchase", 2)}
       |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
       |t AS (SELECT dow, n1, n2,
       |    s1 / CAST(n1 AS DOUBLE) AS m1, s2 / CAST(n2 AS DOUBLE) AS m2,
       |    (ss1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
       |    (ss2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS v2
       |  FROM s)
       |SELECT dow, n1, n2, m1, m2,
       |  (m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) AS z
       |FROM t ORDER BY dow""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "quality_ks_drift" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS v
        |  FROM documents),
        |c AS (SELECT max(doc_id) // 2 AS cut FROM d),
        |per AS (SELECT source, v,
        |    count(CASE WHEN doc_id <= cut THEN 1 END) AS c1,
        |    count(CASE WHEN doc_id > cut THEN 1 END) AS c2
        |  FROM d CROSS JOIN c GROUP BY 1, 2),
        |cum AS (SELECT source, v,
        |    sum(c1) OVER (PARTITION BY source ORDER BY v) AS cum1,
        |    sum(c2) OVER (PARTITION BY source ORDER BY v) AS cum2
        |  FROM per),
        |tot AS (SELECT source, sum(c1) AS n_old, sum(c2) AS n_new
        |  FROM per GROUP BY 1)
        |SELECT source,
        |  CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
        |  CAST(max(abs(cum1 * n_new - cum2 * n_old)) AS BIGINT) AS d_num,
        |  CASE WHEN n_old = 0 OR n_new = 0 THEN CAST(1.0 AS DOUBLE)
        |    ELSE CAST(max(abs(cum1 * n_new - cum2 * n_old)) AS DOUBLE)
        |      / CAST(n_old * n_new AS DOUBLE) END AS ks_stat
        |FROM cum JOIN tot USING (source)
        |GROUP BY source, n_old, n_new
        |ORDER BY source""".stripMargin,
    "ab_test_zscore" -> abTestSql,
    "dq_checks" -> dqSql,
    "winsorize" ->
      """WITH c AS (SELECT c_mktsegment AS seg, c_custkey AS k, c_acctbal AS x
        |           FROM customer),
        |r AS (SELECT seg, k, x,
        |        row_number() OVER (PARTITION BY seg ORDER BY x ASC, k ASC) AS rn,
        |        count(*) OVER (PARTITION BY seg) AS n
        |      FROM c),
        |b AS (SELECT seg,
        |        max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN x END) AS p05,
        |        max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN x END) AS p95
        |      FROM r GROUP BY seg)
        |SELECT c.seg AS c_mktsegment, count(*) AS n_rows,
        |  max(b.p05) AS p05, max(b.p95) AS p95,
        |  CAST(SUM(CAST(c.x AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_raw,
        |  CAST(SUM(CAST(least(greatest(c.x, b.p05), b.p95) AS DECIMAL(18,2)))
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_wins
        |FROM c JOIN b ON c.seg = b.seg
        |GROUP BY c.seg ORDER BY c_mktsegment""".stripMargin,
    "mad_outliers" ->
      """WITH o AS (SELECT o_orderpriority AS p, o_orderkey AS k,
        |                  o_totalprice AS x FROM orders),
        |r1 AS (SELECT p, k, x,
        |         row_number() OVER (PARTITION BY p ORDER BY x ASC, k ASC) AS rn,
        |         count(*) OVER (PARTITION BY p) AS n
        |       FROM o),
        |med AS (SELECT p,
        |          CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
        |            / CAST(count(*) AS DOUBLE) AS med
        |        FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |        GROUP BY p),
        |d AS (SELECT o.p, o.k, abs(o.x - med.med) AS dev
        |      FROM o JOIN med ON o.p = med.p),
        |r2 AS (SELECT p, k, dev,
        |         row_number() OVER (PARTITION BY p ORDER BY dev ASC, k ASC) AS rn,
        |         count(*) OVER (PARTITION BY p) AS n
        |       FROM d),
        |mad AS (SELECT p, SUM(dev) / CAST(count(*) AS DOUBLE) AS mad
        |        FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |        GROUP BY p)
        |SELECT d.p AS o_orderpriority, count(*) AS n_rows,
        |  max(med.med) AS med, max(mad.mad) AS mad,
        |  CAST(SUM(CASE WHEN d.dev > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN med ON d.p = med.p JOIN mad ON d.p = mad.p
        |GROUP BY d.p ORDER BY d.p""".stripMargin,
    "regression_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100
        |      AS DECIMAL(38,0)) AS DOUBLE) / 100.0 AS sxd,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |      AS DECIMAL(38,0)) AS DOUBLE) / 100.0 AS syd,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000
        |      AS DECIMAL(38,0)) AS DOUBLE) / 10000.0 AS sxyd,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) * 10000
        |      AS DECIMAL(38,0)) AS DOUBLE) / 10000.0 AS sxxd,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000
        |      AS DECIMAL(38,0)) AS DOUBLE) / 10000.0 AS syyd
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
