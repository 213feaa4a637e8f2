package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Core relational surface (SURVEY.md §2b Q1, Q2, Q3, Q6–Q12, Q17, Q19,
  * Q20, Q23): the MapReduce-expressible query class the reference's opaque
  * mapper/reducer slots compute (`Program.cs:332-378`, `App.config:16-17`),
  * expressed declaratively so Catalyst gets to push filters/projections into
  * the parquet scan and pick map-side partial aggregation — the two
  * properties that matter most at 100 TB (scan less, shuffle less).
  *
  * Every query ends in a total ORDER BY with a unique tiebreaker and uses
  * exact-decimal float aggregation ([[graft.Det]]) so the DuckDB oracle
  * hash-compare is deterministic.
  */
object CoreOps {
  type Q = (SparkSession, String) => DataFrame

  /** Q1 scan + projection: column pruning reaches the parquet footer
    * (ReadSchema shows only 4 of 11 lineitem columns). */
  def scanProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select($("l_orderkey"), $("l_linenumber"), $("l_quantity"), $("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q2 filter/grep: predicate pushed to the scan (PushedFilters). */
  def filterPredicate(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .select($("l_orderkey"), $("l_linenumber"), $("l_quantity"), $("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q3 per-source map+count — the reference's one-task-per-file fan-out
    * (`Program.cs:332-349`) re-expressed as a group-by over the provenance
    * key; partial aggregation makes it one shuffle of |sources| rows. */
  def perSourceStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("source")

  /** Q6 global aggregate — the reference's N→1 gather (`Program.cs:355`)
    * as a two-phase agg: map-side partials, single merge row. */
  def globalAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      Det.moneySum(col("l_quantity")).as("sum_qty"),
      Det.moneySum(col("l_extendedprice")).as("sum_price"),
      min("l_orderkey").as("min_okey"),
      max("l_orderkey").as("max_okey"))

  /** Q7 grouped aggregation (TPC-H Q1 shape): low-cardinality keys ⇒
    * map-side combine collapses 100 TB to a handful of shuffle rows. */
  def groupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.moneySum(col("l_quantity")).as("sum_qty"),
        Det.moneySum(col("l_extendedprice")).as("sum_base_price"),
        Det.moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q8 group + HAVING: the aggregate filter runs post-shuffle on already
    * reduced data — no second pass over the fact table. */
  def groupHaving(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_suppkey")
      .agg(Det.moneySum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
      .filter(col("sum_qty") > 1000)
      .orderBy("l_suppkey")

  /** Q9 exact distinct — hash-dedup, shuffle carries only distinct keys
    * after partial dedup per partition. */
  def distinctRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select($("o_orderstatus"), $("o_orderpriority"))
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** Q10 exact multi-column distinct counts (one shuffle via expand). */
  def countDistinctQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_returnflag")).as("n_flags"))

  /** Q10b HLL approx distinct — the sketch that replaces exact distinct at
    * 100 TB (mergeable, constant memory per partition). No SQL oracle
    * (approximate); rows-only check. */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))

  /** Q11 total-order sort: Spark range-partitions (sampled bounds) so each
    * of N executors sorts one disjoint range — no single-node sort. */
  def sortTotal(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select($("o_orderkey"), $("o_custkey"), $("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  /** Q12 top-K: TakeOrderedAndProject — per-partition heaps of K, merge K·P
    * rows at the driver; never materializes a global sort. */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select($("l_orderkey"), $("l_linenumber"), $("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)

  /** Q23 histogram: bin on the map side, count per bin — shuffle is
    * |bins| rows regardless of input size. */
  def histogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Q23 equi-depth histogram: decile buckets with equal ROW counts
    * (value boundaries fall where the data is dense — the histogram
    * shape optimizers and feature-binning pipelines want, where
    * [[histogram]]'s fixed-width bins would starve).
    *
    * Needs a global position per row — computed TWO-PHASE exactly like
    * [[WindowOps.windowRankFamily]]: range-partition on the (unique-
    * tiebroken) order key, rank locally, add broadcast per-range offsets;
    * the decile is then the closed-form ntile(10) split of (rn, n). No
    * single-partition window ever sees the data, so the plan holds at
    * any scale. The SQL oracle states plain `ntile(10) OVER (ORDER BY…)`
    * — hash equality proves the decomposition reproduces SQL ntile
    * exactly. */
  def equiDepthHist(spark: SparkSession, sfDir: String): DataFrame = {
    val df = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, col("l_extendedprice").asc,
        col("l_orderkey").asc, col("l_linenumber").asc)
      .withColumn("__pid", spark_partition_id())
    val wLocal = org.apache.spark.sql.expressions.Window.partitionBy("__pid")
      .orderBy(col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal).cast("long"))
    val wOff = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy("__pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn("__n", sum("__cnt").over(wAll))
      .select("__pid", "__off", "__n")
    local.join(broadcast(offsets), "__pid")
      .withColumn("rn", col("__lrn") + col("__off"))
      .withColumn("decile", expr(
        """cast(case
          |  when rn <= (__n % 10) * ((__n div 10) + 1)
          |    then (rn - 1) div ((__n div 10) + 1)
          |  else (__n % 10) + (rn - (__n % 10) * ((__n div 10) + 1) - 1) div (__n div 10)
          |end + 1 as bigint)""".stripMargin))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        Det.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("decile")
  }

  /** Q19 rollup: grouping-set expansion happens pre-shuffle; the NULL
    * subtotal marker is coalesced to a sentinel so the sort key is
    * null-free (Spark and DuckDB default NULL order differ). */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .rollup("c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), Det.moneySum(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("c_mktsegment"), lit("(all)")).as("segment"), col("n_cust"), col("sum_bal"))
      .orderBy("segment")

  /** Q19 cube: full grouping-set lattice over two dimensions, NULL
    * markers coalesced to sentinels for engine-neutral ordering. */
  def cubeAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .cube("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n_cust"), Det.moneySum(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
        coalesce(col("c_nationkey"), lit(-1)).cast("long").as("nationkey"),
        col("n_cust"), col("sum_bal"))
      .orderBy("segment", "nationkey")

  /** Q19 arbitrary GROUPING SETS — {(segment), (nationkey), ()}: a set
    * list that is neither a rollup nor a cube, completing the Q19 family.
    * Same Expand-based plan as rollup/cube: the set expansion happens
    * pre-shuffle, so shuffle volume is |sets|·|distinct keys|, not |rows|. */
  def groupingSetsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq()),
        col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), Det.moneySum(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
        coalesce(col("c_nationkey"), lit(-1)).cast("long").as("nationkey"),
        col("n_cust"), col("sum_bal"))
      .orderBy("segment", "nationkey")

  /** Q6/Q12 percentiles: exact interpolated quantiles (sort-based). At
    * 100 TB the approx_percentile sketch replaces this; exact stays as
    * the oracle-checkable baseline. */
  def quantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      expr("percentile(l_extendedprice, 0.5)").as("p50"),
      expr("percentile(l_extendedprice, 0.9)").as("p90"),
      expr("percentile(l_extendedprice, 0.99)").as("p99"))

  /** Q6/Q7/Q12 grouped percentiles: exact interpolated quantiles PER KEY —
    * one hash-partition exchange on the group key, quantile computed
    * within each group (no global sort). Spark `percentile` and DuckDB
    * `quantile_cont` interpolate identically (verified bit-exact round 1),
    * so the grouped form is oracled too. At 100 TB swap the aggregate for
    * `approx_percentile` per key — same plan shape, sketch-valued. */
  def groupQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Q6/Q12 approx percentiles — the mergeable sketch that replaces the
    * exact sort-based quantile at 100 TB: constant memory per partition,
    * one merge per executor tree level, accuracy set by the accuracy knob
    * (10⁴ ⇒ ~0.01% rank error). No SQL oracle (sketch-valued); the spec
    * bounds the error against the exact `quantiles` result. */
  def quantilesApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
      expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("p90"),
      expr("approx_percentile(l_extendedprice, 0.99, 10000)").as("p99"))

  /** Q6/Q7 second-moment statistics (variance / covariance / correlation)
    * per group — computed from EXACT decimal power sums (Σx, Σy, Σxy, Σx²,
    * Σy², n) rather than the built-in one-pass co-moment aggregates: the
    * built-ins merge partial co-moments in floating point, so their last
    * bits depend on partition merge order; exact integer-decimal moments
    * make the derived statistics bit-deterministic at any parallelism and
    * let DuckDB mirror the arithmetic exactly. Same single map-side
    * combined aggregation — the moments are just wider partials. */
  def statsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    // precisions chosen so every moment sum's unscaled value stays below
    // 2^53 at fixture scales: the decimal→double conversion is then a
    // single exact-int read + one division rounding, identical on both
    // engines (a price² sum would exceed that and risk cross-engine
    // double-rounding, which is why corr is not derived here)
    val x = col("l_quantity").cast(DecimalType(12, 2))
    val y = col("l_extendedprice").cast(DecimalType(14, 2))
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x * y).as("sxy"), sum(x).as("sx"), sum(y).as("sy"), sum(x * x).as("sxx"))
      .select(col("l_returnflag"), col("n"),
        ((col("sxy").cast(DoubleType) - col("sx").cast(DoubleType) * col("sy").cast(DoubleType) / col("n"))
          / (col("n") - 1)).as("covar_qty_price"),
        sqrt((col("sxx").cast(DoubleType) - col("sx").cast(DoubleType) * col("sx").cast(DoubleType) / col("n"))
          / (col("n") - 1)).as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** Q20 scalar string/date/math functions — all codegen'd builtins, no
    * UDF boundary in the hot path. Int-ish results cast to BIGINT to match
    * DuckDB's wider return types. */
  def scalarFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        $("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        (col("o_totalprice") / 10).as("tithe"),
        abs(col("o_totalprice") - 100000).as("dist_100k"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"))
      .orderBy("o_orderkey")

  /** Q20 date/time function pack: truncation, parts, arithmetic — all
    * codegen'd builtins on the timestamp column. */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        $("o_orderkey"),
        trunc(to_date(col("o_orderdate")), "month").as("month_start"),
        dayofmonth(col("o_orderdate")).cast("long").as("day_of_month"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        to_date(col("o_orderdate")).as("order_date"),
        datediff(to_date(lit("1999-01-01")), to_date(col("o_orderdate")))
          .cast("long").as("days_to_1999"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"))
      .orderBy("o_orderkey")

  /** Q20 string function pack: pad/trim/replace/locate/split-part. */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        $("c_custkey"),
        lpad(col("c_name"), 25, "_").as("padded"),
        replace(col("c_name"), lit("Customer"), lit("Cust")).as("replaced"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        split_part(col("c_name"), lit("#"), lit(-1)).as("num_part"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lower_vowels"))
      .orderBy("c_custkey")

  /** Q7/Q19 pivot: status × priority count matrix via DataFrame `pivot`
    * (compiled to a single aggregation with conditional counters — the
    * oracle states that form explicitly). */
  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  /** Pivot with MULTIPLE measures per pivoted value (count + exact-decimal
    * sum) — the wide-report shape [[pivotStatus]]'s single measure doesn't
    * exercise. Explicit pivot values keep planning single-pass (no
    * distinct-values pre-query); absent (priority, status) cells surface
    * as NULL from the pivot and are coalesced to typed zeros identically
    * in the oracle's FILTER restatement. Still one exchange on the
    * groupBy key: the pivot widens columns, never rows. */
  def pivotMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val piv = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .as("total"))
    def cnt(s: String) = coalesce(col(s"${s}_n"), lit(0L)).as(s"${s.toLowerCase}_n")
    def tot(s: String) = coalesce(col(s"${s}_total").cast("double"),
      expr("CAST(0 AS DOUBLE)")).as(s"${s.toLowerCase}_total")
    piv.select(col("o_orderpriority"),
        cnt("F"), tot("F"), cnt("O"), tot("O"), cnt("P"), tot("P"))
      .orderBy("o_orderpriority")
  }

  /** Q14 scalar-subquery pattern: orders above their customer's average
    * order value — decorrelated into an aggregate + equi-join on the
    * correlation key (exactly what Catalyst does to a correlated
    * subquery), in exact decimal. */
  def aboveCustomerAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val custAvg = orders.groupBy("o_custkey")
      .agg((Det.moneySum(col("o_totalprice")) / count(lit(1))).as("cust_avg"))
    orders.join(custAvg, "o_custkey")
      .filter(col("o_totalprice") > col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Q1/Q4 unpivot (wide → long): each fact row melts into one row per
    * measure — a narrow map (Expand), no shuffle until the final sort. */
  def unpivotMeasures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  /** Q17 set ops: union distinct / intersect / except — each a hash-dedup
    * shuffle on the key. */
  def setUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey").as("custkey"))
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
    cust.union(big).distinct().orderBy("custkey")
  }

  def setIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    val f = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
    f.intersect(o).orderBy("custkey")
  }

  def setExcept(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables.customer(spark, sfDir).select(col("c_custkey").as("custkey"))
    val have = Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
    all.except(have).orderBy("custkey")
  }

  private def $(c: String) = col(c)

  val queries: Map[String, Q] = Map(
    "scan_project"    -> (scanProject _),
    "filter_predicate" -> (filterPredicate _),
    "per_source_stats" -> (perSourceStats _),
    "global_agg"      -> (globalAgg _),
    "group_agg"       -> (groupAgg _),
    "group_having"    -> (groupHaving _),
    "distinct_rows"   -> (distinctRows _),
    "count_distinct"  -> (countDistinctQ _),
    "approx_distinct" -> (approxDistinct _),
    "sort_total"      -> (sortTotal _),
    "topk"            -> (topK _),
    "histogram"       -> (histogram _),
    "equi_depth_hist" -> (equiDepthHist _),
    "rollup_agg"      -> (rollupAgg _),
    "cube_agg"        -> (cubeAgg _),
    "grouping_sets_agg" -> (groupingSetsAgg _),
    "quantiles"       -> (quantiles _),
    "group_quantiles" -> (groupQuantiles _),
    "quantiles_approx" -> (quantilesApprox _),
    "stats_moments"   -> (statsMoments _),
    "scalar_funcs"    -> (scalarFuncs _),
    "date_funcs"      -> (dateFuncs _),
    "string_funcs"    -> (stringFuncs _),
    "pivot_status"    -> (pivotStatus _),
    "pivot_multi"     -> (pivotMulti _),
    "above_customer_avg" -> (aboveCustomerAvg _),
    "unpivot_measures" -> (unpivotMeasures _),
    "set_union"       -> (setUnion _),
    "set_intersect"   -> (setIntersect _),
    "set_except"      -> (setExcept _))

  import Det.{sqlMoneySum, sqlMoneySum4}

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "per_source_stats" ->
      """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "global_agg" ->
      s"""SELECT count(*) AS n_rows,
         |  ${sqlMoneySum("l_quantity")} AS sum_qty,
         |  ${sqlMoneySum("l_extendedprice")} AS sum_price,
         |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
         |FROM lineitem""".stripMargin,
    "group_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlMoneySum("l_quantity")} AS sum_qty,
         |  ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
         |  ${sqlMoneySum4("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "group_having" ->
      s"""SELECT l_suppkey, ${sqlMoneySum("l_quantity")} AS sum_qty, count(*) AS n_items
         |FROM lineitem GROUP BY l_suppkey
         |HAVING ${sqlMoneySum("l_quantity")} > 1000
         |ORDER BY l_suppkey""".stripMargin,
    "distinct_rows" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "count_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem""".stripMargin,
    "sort_total" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
    "histogram" ->
      """SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "equi_depth_hist" ->
      s"""WITH t AS (
         |  SELECT l_extendedprice,
         |    CAST(ntile(10) OVER (ORDER BY l_extendedprice ASC,
         |      l_orderkey ASC, l_linenumber ASC) AS BIGINT) AS decile
         |  FROM lineitem)
         |SELECT decile, count(*) AS n_rows,
         |  min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
         |  ${sqlMoneySum("l_extendedprice")} AS sum_price
         |FROM t GROUP BY decile ORDER BY decile""".stripMargin,
    "rollup_agg" ->
      s"""SELECT coalesce(c_mktsegment, '(all)') AS segment,
         |  count(*) AS n_cust, ${sqlMoneySum("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY ROLLUP(c_mktsegment) ORDER BY segment""".stripMargin,
    "cube_agg" ->
      s"""SELECT coalesce(c_mktsegment, '(all)') AS segment,
         |  CAST(coalesce(c_nationkey, -1) AS BIGINT) AS nationkey,
         |  count(*) AS n_cust, ${sqlMoneySum("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)
         |ORDER BY segment, nationkey""".stripMargin,
    "stats_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / (n - 1)
        |    AS covar_qty_price,
        |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))
        |    AS stddev_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "grouping_sets_agg" ->
      s"""SELECT coalesce(c_mktsegment, '(all)') AS segment,
         |  CAST(coalesce(c_nationkey, -1) AS BIGINT) AS nationkey,
         |  count(*) AS n_cust, ${sqlMoneySum("c_acctbal")} AS sum_bal
         |FROM customer
         |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
         |ORDER BY segment, nationkey""".stripMargin,
    "quantiles" ->
      """SELECT quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  quantile_cont(l_extendedprice, 0.99) AS p99
        |FROM lineitem""".stripMargin,
    "group_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.95) AS p95,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS pri_upper,
        |  substring(o_orderpriority, 1, 1) AS pri_code,
        |  CAST(length(o_orderstatus) AS BIGINT) AS status_len,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
        |  o_totalprice / 10 AS tithe,
        |  abs(o_totalprice - 100000) AS dist_100k,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_pri
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(day(o_orderdate) AS BIGINT) AS day_of_month,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT)
        |    AS days_to_1999,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "string_funcs" ->
      """SELECT c_custkey,
        |  lpad(c_name, 25, '_') AS padded,
        |  replace(c_name, 'Customer', 'Cust') AS replaced,
        |  CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
        |  split_part(c_name, '#', -1) AS num_part,
        |  reverse(c_mktsegment) AS seg_rev,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "pivot_multi" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE),
        |    CAST(0 AS DOUBLE)) AS f_total,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE),
        |    CAST(0 AS DOUBLE)) AS o_total,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE),
        |    CAST(0 AS DOUBLE)) AS p_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "above_customer_avg" ->
      s"""WITH ca AS (
         |  SELECT o_custkey, ${sqlMoneySum("o_totalprice")} / count(*) AS cust_avg
         |  FROM orders GROUP BY o_custkey)
         |SELECT o_orderkey, o_custkey, o_totalprice
         |FROM orders JOIN ca USING (o_custkey)
         |WHERE o_totalprice > cust_avg
         |ORDER BY o_orderkey""".stripMargin,
    "unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
        |  FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 100) t
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "set_union" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |ORDER BY custkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin)
}
