package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2b Q13–Q16): the reference's reduce-side
  * gather topology (`Program.cs:365-378`) generalized to keyed joins.
  *
  * Scale strategy: dimension tables (region/nation/customer/supplier/part
  * — a few MB even at 100 TB fact scale) are broadcast explicitly, so the
  * fact table never shuffles for enrichment joins. Fact-to-fact joins
  * (orders⋈lineitem) shuffle on the join key once and aggregate in the
  * same exchange; AQE handles skewed keys at runtime.
  */
object JoinOps {
  type Q = (SparkSession, String) => DataFrame

  /** Q13 broadcast (map-side) join chain: customer ⋈ nation ⋈ region with
    * both dims broadcast — zero shuffle of the probe side for the join
    * itself; the only exchange is the final small aggregation. */
  def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_cust"), Det.moneySum(col("c_acctbal")).as("sum_bal"))
      .orderBy("region", "nation")

  /** Q14 at steady state: the BUCKETED co-located fact-fact join — the
    * pre-partitioning strategy for joins that RECUR at 100 TB. Both
    * sides are written once into the warehouse bucketed (and
    * bucket-sorted) on the join key; every subsequent join on that key
    * reads bucket-aligned sorted files and needs NO Exchange at query
    * time — the shuffle is amortized into the ingest (and with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` the
    * per-bucket Sort is elided too, since the write keeps one file per
    * bucket). Plan pinned by PlanAuditSpec (SortMergeJoin with zero
    * exchanges and zero sorts on the key) alongside BucketingSpec; the oracle
    * recomputes from the raw parquet, so bucketed-write fidelity is
    * hash-gated too. Table creation is idempotent per sfDir (warm
    * warehouse, same staleness contract as the file-fixture caches). */
  /** Idempotent bucketed-table provisioning that survives metastore
    * churn: each harness JVM has a fresh in-memory catalog but they all
    * share the on-disk warehouse, so "table missing from the catalog"
    * does not imply "files missing". If the location already holds a
    * previous JVM's bucketed files, re-REGISTER them as an external
    * table with the same bucket spec (bucket identity is metadata +
    * deterministic file naming, so the registration is lossless);
    * only write when the location is genuinely absent. */
  private def ensureBucketed(spark: SparkSession, db: String, name: String,
      schema: String, write: => org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): Unit = {
    val qn = s"$db.$name"
    if (!spark.catalog.tableExists(qn)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$db.db/$name")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc))
        spark.sql(s"""CREATE TABLE $qn ($schema) USING PARQUET
                     |CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey) INTO 8 BUCKETS
                     |LOCATION '$loc'""".stripMargin)
      else
        write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(qn)
    }
  }

  def joinBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val db = "graft_bkt_" + sfDir.replaceAll("[^A-Za-z0-9_]", "_")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // repartition(8, key) before the bucketed write: the repartition hash
    // equals the bucket hash, so each task holds exactly one bucket and
    // writes ONE file per bucket — the layout that lets the merge join
    // use the buckets' sort order (multi-file buckets are only sorted
    // per FILE, and Spark must re-sort them)
    ensureBucketed(spark, db, "orders_b",
      "o_orderkey BIGINT, o_orderstatus STRING",
      Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite"))
    ensureBucketed(spark, db, "lineitem_b",
      "o_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE",
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"), col("l_discount"))
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite"))
    spark.table(s"$db.orders_b")
      .join(spark.table(s"$db.lineitem_b"), "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        Det.moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** Q14 skew-hardened: the SALTED fact-dim join — the explicit rewrite
    * for when one join key carries a disproportionate share of the fact
    * rows and a single reducer would serialize the stage (AQE's
    * skew-split is the adaptive version; explicit salting is the tool
    * when the skew is known, extreme, or AQE can't split the build
    * side). The probe side gets a deterministic per-row salt, the build
    * side is replicated S ways with every salt value, and the join keys
    * on (key, salt) — a hot key's rows now spread over S tasks. The
    * salt provably cancels (each probe row still matches its build row
    * exactly once), so the oracle is the PLAIN join's SQL — the rewrite
    * must be invisible in the result. SkewJoinSpec additionally proves
    * the spread on a 90%-one-key dataset. */
  def joinSkewSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val S = 8
    val probe = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"),
        pmod(xxhash64(col("l_orderkey") * 7 + col("l_linenumber")), lit(S)).as("salt"))
    val build = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))
      .withColumn("salt", explode(sequence(lit(0L), lit(S - 1L))))
    probe.join(build,
        probe("l_partkey") === build("p_partkey") && probe("salt") === build("salt"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        Det.moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("p_brand")
  }

  /** Q14 shuffle (sort-merge/hash) fact-to-fact join + aggregate: revenue
    * per order, top 100. Both sides hash-partition on the order key; the
    * groupBy reuses that partitioning (no second exchange). */
  def joinShuffleAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority")
      .agg(Det.moneySum4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(100)

  /** Q15 left-semi (EXISTS): customers having at least one open order.
    * Semi join ships only the key column of the build side. */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val open = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "O")
    Tables.customer(spark, sfDir)
      .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Q15 left-anti (NOT EXISTS): customers with no orders at all. */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Q16 left-outer join preserving unmatched orders; count(col) skips
    * NULLs on both engines so empty orders report 0 items. */
  def joinOuter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy("o_orderkey")
      .agg(count(col("l_orderkey")).as("n_items"),
        Det.moneySum(coalesce(col("l_quantity"), lit(0.0))).as("sum_qty"))
      .orderBy("o_orderkey")

  /** Q16 full-outer join: per-customer counts of finished ('F') vs pending
    * ('P') orders — each status slice has customers the other lacks, so
    * both null-extension sides are exercised. Both inputs aggregate before
    * joining (shuffle rows = |custkeys|, not |orders|) and the join reuses
    * the aggregation's hash partitioning — one exchange per side total.
    * NULL keys/counts are coalesced to sentinels for engine-neutral sort. */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    def slice(status: String, out: String) =
      Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === status)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as(out))
    slice("F", "f_orders").join(slice("P", "p_orders"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey").as("custkey"),
        coalesce(col("f_orders"), lit(0L)).as("f_orders"),
        coalesce(col("p_orders"), lit(0L)).as("p_orders"))
      .orderBy("custkey")
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — the join-family
    * member Q13–Q16 don't cover: NULL keys MATCH each other instead of
    * dropping. Keys are made nullable by NULLIF-ing one status value, the
    * right side is the per-key summary of the same rows, and the per-key
    * re-aggregation proves every row (null-keyed included) found its
    * group row: n_orders == group_n on every output row. Planning-wise
    * `<=>` still hashes on the key (null hashes like a value), so this
    * stays a hash join, never a nested loop — same scale shape as any
    * equi-join. Null sort position is spelled explicitly on both engines
    * (Spark ASC defaults nulls-first, DuckDB nulls-last). */
  def joinNullSafe(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("st"))
    val summary = keyed.groupBy("st").agg(count(lit(1)).as("group_n"))
    keyed.as("k").join(summary.as("s"), col("k.st") <=> col("s.st"))
      .groupBy(col("k.st").as("st"))
      .agg(count(lit(1)).as("n_orders"), max(col("group_n")).as("group_n"))
      .orderBy(col("st").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "join_null_safe"   -> (joinNullSafe _),
    "join_broadcast"   -> (joinBroadcast _),
    "join_bucketed"    -> (joinBucketed _),
    "join_skew_salted" -> (joinSkewSalted _),
    "join_shuffle_agg" -> (joinShuffleAgg _),
    "join_semi"        -> (joinSemi _),
    "join_anti"        -> (joinAnti _),
    "join_outer"       -> (joinOuter _),
    "join_full_outer"  -> (joinFullOuter _))

  import Det.{sqlMoneySum, sqlMoneySum4}

  val oracle: Map[String, String] = Map(
    "join_null_safe" ->
      """WITH keyed AS (
        |  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st FROM orders),
        |summary AS (SELECT st, count(*) AS group_n FROM keyed GROUP BY st)
        |SELECT k.st AS st, count(*) AS n_orders, max(s.group_n) AS group_n
        |FROM keyed k JOIN summary s ON k.st IS NOT DISTINCT FROM s.st
        |GROUP BY k.st
        |ORDER BY st ASC NULLS FIRST""".stripMargin,
    "join_bucketed" ->
      s"""SELECT o_orderstatus, count(*) AS n_lines,
         |  ${sqlMoneySum4("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the salt cancels by construction, so the oracle is the PLAIN join
    "join_skew_salted" ->
      s"""SELECT p_brand, count(*) AS n_lines,
         |  ${sqlMoneySum4("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_broadcast" ->
      s"""SELECT r_name AS region, n_name AS nation,
         |  count(*) AS n_cust, ${sqlMoneySum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY region, nation""".stripMargin,
    "join_shuffle_agg" ->
      s"""SELECT o_orderkey, o_orderpriority,
         |  ${sqlMoneySum4("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderkey, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_outer" ->
      s"""SELECT o_orderkey, count(l_orderkey) AS n_items,
         |  ${sqlMoneySum("coalesce(l_quantity, 0.0)")} AS sum_qty
         |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "join_full_outer" ->
      """WITH f AS (SELECT o_custkey, count(*) AS f_orders FROM orders
        |           WHERE o_orderstatus = 'F' GROUP BY o_custkey),
        |     p AS (SELECT o_custkey, count(*) AS p_orders FROM orders
        |           WHERE o_orderstatus = 'P' GROUP BY o_custkey)
        |SELECT coalesce(f.o_custkey, p.o_custkey) AS custkey,
        |  CAST(coalesce(f_orders, 0) AS BIGINT) AS f_orders,
        |  CAST(coalesce(p_orders, 0) AS BIGINT) AS p_orders
        |FROM f FULL JOIN p ON f.o_custkey = p.o_custkey
        |ORDER BY custkey""".stripMargin)
}
