package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse maintenance operators (SURVEY.md §2b Q7/Q18 compositions):
  * the mutation-shaped workloads a batch analytics engine expresses as
  * joins and windows — MERGE/upsert (SCD type 1), slowly-changing-
  * dimension history (SCD type 2), and re-aggregation of partial
  * aggregates (the algebraic contract behind incremental rollups).
  *
  * The reference's pipeline rewrites its sink wholesale per run
  * (`Program.cs:430-470` — egress is a full re-upload); these operators
  * are the incremental alternatives a 100 TB warehouse actually runs,
  * and each is a pure declarative plan: MERGE is a full-outer shuffle
  * join on the key (AQE free to broadcast a small update batch), SCD-2
  * is one window over the natural key, and partial-merge is two
  * map-side-combined aggregates whose exactness rests on DECIMAL sums
  * being associative — the same property that makes them safe across
  * 1000 executors and across incremental batches.
  */
object WarehouseOps {
  type Q = (SparkSession, String) => DataFrame

  /** MERGE/upsert, SCD type 1: apply a keyed update batch to a base
    * table in one pass. The update batch is the per-customer open-order
    * position (plus one synthetic key absent from the base, so the
    * INSERT branch is exercised); the result tags every row with the
    * branch it took. At scale the base side shuffles on the key once —
    * or not at all when the update batch fits the broadcast threshold
    * (no hint: AQE decides from the batch's actual size). */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val updates = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("u_custkey"))
      .agg(count(lit(1)).as("n_open"),
        Det.moneySum(col("o_totalprice")).as("open_spend"))
      .unionByName(
        spark.range(1).select(lit(-1L).as("u_custkey"),
          lit(0L).as("n_open"), lit(0.0).as("open_spend")))
    Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal")
      .join(updates, col("c_custkey") === col("u_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("u_custkey")).as("custkey"),
        coalesce(col("c_name"), lit("NEW")).as("name"),
        coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("open_spend"), lit(0.0)).as("open_spend"),
        when(col("c_custkey").isNull, "insert")
          .when(col("u_custkey").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy("custkey")
  }

  /** SCD type 2: rebuild a validity-interval history from an event-keyed
    * fact — each order opens a version of its customer's state, closed by
    * the next order's date (`lead`), open-ended for the latest. One
    * window per natural key, no self-join: the O(n) formulation that
    * replaces the quadratic "match each row with its successor" join.
    * Ties on the date are broken by the orderkey so versioning is total
    * and deterministic at any parallelism. */
  def scd2Intervals(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("custkey")
      .orderBy(col("valid_from").asc, col("orderkey").asc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
        col("o_orderstatus").as("status"), col("o_orderdate").as("valid_from"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select("custkey", "version", "orderkey", "status",
        "valid_from", "valid_to", "is_current")
      .orderBy("custkey", "version")
  }

  /** Partial-aggregate merge: shard-local partial aggregates re-combined
    * to the final grouping, hash-gated equal to the direct single-pass
    * aggregate. This is the algebraic contract incremental pipelines
    * depend on (per-batch partials + a merge instead of a full rescan),
    * and it holds exactly here because the partial sums stay DECIMAL
    * until the final cast — associative and merge-order independent,
    * where double partials would drift. The shard key is synthetic
    * (orderkey mod 32) standing in for a partition/batch id. */
  def partialAggMerge(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        pmod(col("l_orderkey"), lit(32)).as("shard"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("pq"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("pp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("cnt")).as("n_items"),
        sum(col("pq")).cast("double").as("sum_qty"),
        sum(col("pp")).cast("double").as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Snapshot reconciliation: diff two keyed table versions into
    * added / removed / changed / same cohorts with exact net deltas —
    * the data-quality audit that runs after every warehouse load. The
    * "next" snapshot is derived deterministically from the base (price
    * bump on open orders, every 97th key deleted, every 101st mirrored
    * as a new negative key), so the oracle states the identical
    * derivation. One full-outer shuffle on the key; per-row comparison
    * is column equality, no row digests needed when schemas align (at
    * 100 TB you'd md5 the value columns once per side instead — same
    * join shape, 16-byte compares). Deltas sum in DECIMAL cents. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val next = base.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .select(col("o_orderkey"),
        col("o_orderstatus"),
        when(col("o_orderstatus") === "O", col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .unionByName(base.filter(pmod(col("o_orderkey"), lit(101)) === 0)
        .select((-col("o_orderkey")).as("o_orderkey"),
          lit("N").as("o_orderstatus"), col("o_totalprice")))
    val b = base.select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("bs"), col("o_totalprice").as("bp"))
    val n = next.select(col("o_orderkey").as("k2"),
      col("o_orderstatus").as("ns"), col("o_totalprice").as("np"))
    b.join(n, col("k") === col("k2"), "full_outer")
      .select(
        when(col("k").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(col("bs") =!= col("ns") || col("bp") =!= col("np"), "changed")
          .otherwise("same").as("change_type"),
        coalesce(col("np"), lit(0.0)).as("npv"),
        coalesce(col("bp"), lit(0.0)).as("bpv"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_rows"),
        Det.moneySum(col("npv") - col("bpv")).as("net_price_delta"))
      .orderBy("change_type")
  }

  /** CDC changelog apply: replay an ORDERED change stream (insert /
    * update / delete records with a total per-key sequence) onto a base
    * snapshot — the consumer side of change-data-capture, and the
    * batch-shaped core of what a streaming MERGE does per micro-batch.
    * Last-writer-wins per key: one window (row_number DESC over the
    * sequence) reduces the changelog to its final record per key, then a
    * single full-outer shuffle join applies it — deletes drop the row,
    * inserts/updates take the change's value, untouched base rows pass
    * through. The changelog is derived deterministically from orders
    * (orderkey = the monotone sequence; every 19th record a delete,
    * every 101st mirrored as an insert under a fresh negative key) so
    * the oracle states the identical derivation. At 100 TB both the
    * window and the join shuffle once on the same key — AQE can even
    * co-plan them — and the changelog side is typically a small daily
    * batch the planner broadcasts. */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val changes = o.select(col("o_custkey").as("key"), col("o_orderkey").as("seq"),
        when(pmod(col("o_orderkey"), lit(19)) === 0, "D").otherwise("U").as("op"),
        col("o_totalprice").as("new_bal"))
      .unionByName(o.filter(pmod(col("o_orderkey"), lit(101)) === 0)
        .select((-col("o_custkey")).as("key"), col("o_orderkey").as("seq"),
          lit("I").as("op"), col("o_totalprice").as("new_bal")))
    val byKeySeq = Window.partitionBy("key").orderBy(col("seq").desc)
    val fin = changes
      .withColumn("rn", row_number().over(byKeySeq))
      .withColumn("n_changes", count(lit(1)).over(Window.partitionBy("key")))
      .filter(col("rn") === 1)
      .select(col("key"), col("op"), col("new_bal"), col("n_changes"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .join(fin, col("c_custkey") === col("key"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        coalesce(col("c_custkey"), col("key")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("mktsegment"),
        coalesce(col("new_bal"), col("c_acctbal")).as("balance"),
        when(col("key").isNull, "unchanged")
          .when(col("op") === "I", "inserted")
          .otherwise("updated").as("last_op"),
        coalesce(col("n_changes"), lit(0L)).as("n_changes"))
      .orderBy("custkey")
  }

  val queries: Map[String, Q] = Map(
    "merge_upsert"      -> (mergeUpsert _),
    "scd2_intervals"    -> (scd2Intervals _),
    "partial_agg_merge" -> (partialAggMerge _),
    "snapshot_diff"     -> (snapshotDiff _),
    "cdc_apply"         -> (cdcApply _))

  val oracle: Map[String, String] = Map(
    "cdc_apply" ->
      """WITH ch AS (
        |  SELECT o_custkey AS key, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 19 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice AS new_bal
        |  FROM orders
        |  UNION ALL
        |  SELECT -o_custkey, o_orderkey, 'I', o_totalprice
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |fin AS (
        |  SELECT key, op, new_bal, n_changes FROM (
        |    SELECT key, op, new_bal,
        |      row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn,
        |      count(*) OVER (PARTITION BY key) AS n_changes
        |    FROM ch) t
        |  WHERE rn = 1)
        |SELECT coalesce(c_custkey, key) AS custkey,
        |  coalesce(c_mktsegment, 'UNKNOWN') AS mktsegment,
        |  coalesce(new_bal, c_acctbal) AS balance,
        |  CASE WHEN key IS NULL THEN 'unchanged'
        |       WHEN op = 'I' THEN 'inserted'
        |       ELSE 'updated' END AS last_op,
        |  coalesce(n_changes, 0) AS n_changes
        |FROM customer FULL OUTER JOIN fin ON c_custkey = key
        |WHERE coalesce(op, '') <> 'D'
        |ORDER BY custkey""".stripMargin,
    "merge_upsert" ->
      """WITH upd AS (
        |  SELECT o_custkey AS u_custkey, count(*) AS n_open,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_spend
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
        |  UNION ALL SELECT -1, 0, 0.0)
        |SELECT coalesce(c_custkey, u_custkey) AS custkey,
        |  coalesce(c_name, 'NEW') AS name,
        |  coalesce(c_acctbal, 0.0) AS acctbal,
        |  coalesce(n_open, 0) AS n_open,
        |  coalesce(open_spend, 0.0) AS open_spend,
        |  CASE WHEN c_custkey IS NULL THEN 'insert'
        |       WHEN u_custkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM customer FULL OUTER JOIN upd ON c_custkey = u_custkey
        |ORDER BY custkey""".stripMargin,
    "scd2_intervals" ->
      """SELECT o_custkey AS custkey,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  o_orderkey AS orderkey, o_orderstatus AS status,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate, 1) OVER w AS valid_to,
        |  lead(o_orderdate, 1) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY custkey, version""".stripMargin,
    "partial_agg_merge" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |nxt AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey, 'N', o_totalprice
        |  FROM base WHERE o_orderkey % 101 = 0),
        |d AS (
        |  SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
        |              WHEN n.o_orderkey IS NULL THEN 'removed'
        |              WHEN b.o_orderstatus <> n.o_orderstatus
        |                OR b.o_totalprice <> n.o_totalprice THEN 'changed'
        |              ELSE 'same' END AS change_type,
        |    coalesce(n.o_totalprice, 0.0) - coalesce(b.o_totalprice, 0.0) AS delta
        |  FROM base b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey)
        |SELECT change_type, count(*) AS n_rows,
        |  CAST(SUM(CAST(delta AS DECIMAL(18,2))) AS DOUBLE) AS net_price_delta
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin)
}
