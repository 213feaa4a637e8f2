package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-extension surface (SURVEY.md §2b Q28): the reference's entire
  * computation model is "user code in the mapper/reducer slot"
  * (`App.config:16-17`) — here that slot is (a) a registered scalar UDF
  * and (b) a typed `Aggregator` UDAF, both usable from the Column API and
  * SQL. The third, faster extension tier — native Catalyst expressions —
  * lives in [[graft.functions]] and powers the similarity path.
  */
object Udx {
  type Q = (SparkSession, String) => DataFrame

  /** Scalar UDF slot: text normalization (lowercase, strip non-alnum,
    * collapse whitespace). A real pipeline would prefer the builtin
    * `lower`/`regexp_replace` chain (codegen'd — the oracle uses exactly
    * that); the UDF registration is the point being proven. */
  private val normalizeFn: String => String = s =>
    if (s == null) null
    else s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  def udfNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    val norm = udf(normalizeFn)
    spark.udf.register("graft_normalize", norm)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), norm(col("text")).as("norm_text"))
      .select(col("doc_id"), md5(col("norm_text")).as("norm_digest"),
        length(col("norm_text")).cast("long").as("norm_len"))
      .orderBy("doc_id")
  }

  /** Typed Aggregator (UDAF slot): weighted mean in exact fixed-point —
    * the buffer holds integer 1e-4/1e-2 units so merge order (and hence
    * 1000-executor parallelism) cannot change the result; the fixture
    * money columns are 2-decimal so the per-row scaling is exact. */
  final case class WBuf(sumXW: Long, sumW: Long)
  object WeightedMean extends Aggregator[(Double, Double), WBuf, Double] {
    override def zero: WBuf = WBuf(0L, 0L)
    override def reduce(b: WBuf, in: (Double, Double)): WBuf =
      WBuf(b.sumXW + math.round(in._1 * in._2 * 10000.0), b.sumW + math.round(in._2 * 100.0))
    override def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.sumXW + b.sumXW, a.sumW + b.sumW)
    override def finish(b: WBuf): Double =
      if (b.sumW == 0L) 0.0 else (b.sumXW / 10000.0) / (b.sumW / 100.0)
    override def bufferEncoder: org.apache.spark.sql.Encoder[WBuf] =
      org.apache.spark.sql.Encoders.product[WBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Quantity-weighted mean extended price per return flag via the
    * Aggregator, oracle-checked against the exact decimal formulation. */
  def udafWeightedMean(spark: SparkSession, sfDir: String): DataFrame = {
    val wmean = udaf(WeightedMean)
    spark.udf.register("graft_wmean", wmean)
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(wmean(col("l_extendedprice"), col("l_quantity")).as("w_mean_price"))
      .orderBy("l_returnflag")
  }

  /** Row type for the typed-Dataset slot; field names match the parquet
    * schema so the Encoder binds by name. */
  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)

  /** Typed `Dataset[T]` pipeline — the compile-time-checked flavor of the
    * user-code slot: case-class Encoder, typed filter, `groupByKey` +
    * `mapValues` + `reduceGroups`. `reduceGroups` is an Aggregator under
    * the hood, so it KEEPS map-side partial aggregation (unlike
    * `mapGroups`, which would ship every row to its reducer — the typed
    * API's classic scale trap, avoided here by construction). The money
    * sum is held in integer cents inside the typed buffer, so merge
    * order can't drift it — the typed twin of [[graft.Det.moneySum]]. */
  def typedAggPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[OrderRow]
      .filter((o: OrderRow) => o.o_orderstatus == "F")
      .groupByKey((o: OrderRow) => o.o_custkey)
      .mapValues((o: OrderRow) => (1L, math.round(o.o_totalprice * 100.0)))
      .reduceGroups((a: (Long, Long), b: (Long, Long)) => (a._1 + b._1, a._2 + b._2))
      .map { case (custkey, (n, cents)) => (custkey, n, cents / 100.0) }
      .toDF("custkey", "n_f", "spend")
      .orderBy("custkey")
  }

  /** Row type for the lineitem side of the typed cogroup. */
  final case class LineRow(l_orderkey: Long, l_quantity: Double,
      l_extendedprice: Double)

  /** Typed `cogroup` — the remaining `KeyValueGroupedDataset` surface:
    * both Datasets co-partition on the key in ONE shuffle each and the
    * user function sees the two full iterators per key (reconciliation /
    * interleaving / custom-merge logic that neither a join nor an
    * aggregate expresses). Per-key state here is O(1) (running integer
    * cents — merge-order-free, the typed twin of [[graft.Det]]), and
    * orders missing from lineitem still emit (the LEFT JOIN semantics
    * the oracle states). Scale note: cogroup ships whole groups like
    * `mapGroups` — for purely aggregate-shaped per-key logic,
    * [[typedAggPipeline]]'s `reduceGroups` (map-side partials) is the
    * right tool; cogroup earns its shuffle only when the per-key logic
    * needs both iterators. */
  def typedCogroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[OrderRow]
    val lines = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .as[LineRow]
    orders.groupByKey((o: OrderRow) => o.o_orderkey)
      .cogroup(lines.groupByKey((l: LineRow) => l.l_orderkey)) {
        (k: Long, os: Iterator[OrderRow], ls: Iterator[LineRow]) =>
          val head = if (os.hasNext) Some(os.next()) else None
          head match {
            case None => Iterator.empty // lineitem key with no order row
            case Some(o) =>
              var n = 0L; var qtyCents = 0L; var priceCents = 0L
              ls.foreach { l =>
                n += 1
                qtyCents += math.round(l.l_quantity * 100.0)
                priceCents += math.round(l.l_extendedprice * 100.0)
              }
              Iterator((k, o.o_totalprice, n, qtyCents / 100.0, priceCents / 100.0))
          }
      }
      .toDF("o_orderkey", "o_totalprice", "n_lines", "sum_qty", "sum_price")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "udf_normalize"      -> (udfNormalize _),
    "udaf_weighted_mean" -> (udafWeightedMean _),
    "typed_cogroup"      -> (typedCogroup _),
    "typed_agg_pipeline" -> (typedAggPipeline _))

  val oracle: Map[String, String] = Map(
    "udf_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                          ' +', ' ', 'g'))) AS norm_digest,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                          ' +', ' ', 'g'))) AS BIGINT) AS norm_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "udaf_weighted_mean" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(round(l_extendedprice * l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS w_mean_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "typed_agg_pipeline" ->
      """SELECT o_custkey AS custkey, count(*) AS n_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY custkey""".stripMargin,
    "typed_cogroup" ->
      """SELECT o.o_orderkey, max(o.o_totalprice) AS o_totalprice,
        |  count(l.l_orderkey) AS n_lines,
        |  CAST(coalesce(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 0) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(coalesce(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
        |    AS sum_price
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderkey ORDER BY o_orderkey""".stripMargin)
}
