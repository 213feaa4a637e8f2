package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof within-bucket pair enumeration.
  *
  * LSH-style dedup generates candidates by self-joining a bucketed table
  * on its bucket key. A plain equi-join enumerates each bucket's pair
  * matrix inside ONE task — a bucket of m rows costs O(m²) on a single
  * core, so one hot bucket (near-universal shingle, dense near-dup
  * cluster) serializes the whole stage regardless of cluster size. AQE
  * skew-splitting doesn't save it: it splits a *partition*, but the
  * matching build-side bucket still replays per split.
  *
  * The fix is the block-nested decomposition: order each bucket, cut it
  * into blocks of `blockSize`, and key the join by (bucket, blockA,
  * blockB). A row in block g is emitted once per block-pair it
  * participates in — (nblocks−g) times as the lower side, (g+1) times as
  * the upper side — so a bucket of m rows becomes ⌈m/B⌉·(⌈m/B⌉+1)/2
  * independent join cells of ≤ B² work each. Parallelism scales with the
  * pair count, not the bucket count, and per-task work is bounded by B²
  * at any corpus size.
  *
  * Returns one row per unordered pair (a < b by `orderCol`) with the
  * requested payload columns prefixed `a_` / `b_`.
  */
object PairEnum {

  /** All-pairs (no bucket key) blocked enumeration. The per-bucket
    * variant's dense index comes from a per-bucket window — fine when
    * buckets are many and small, but under a single constant bucket that
    * window funnels the whole table through one task. Here the dense
    * index is assigned TWO-PHASE instead (range-partition on `orderCol`,
    * count per range, broadcast prefix offsets — the same decomposition
    * as the global-rank operator), so no stage ever sees more than one
    * range of the data, at any scale. Block geometry and output contract
    * match [[blockedSelfJoinPairs]]. */
  def blockedAllPairs(
      df: DataFrame,
      orderCol: String,
      payload: Seq[String],
      blockSize: Int = 512): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy(col(orderCol))
    val local = ranged.withColumn("__lrn", row_number().over(wLocal).cast("long"))
    val wOff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(wOff), lit(0L)))
      .withColumn("__m", sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__pid", "__off", "__m")
    val indexed = local.join(broadcast(offsets), "__pid")
      .withColumn("__r", col("__lrn") + col("__off") - 1)
      .withColumn("__nb", ceil(col("__m") / lit(blockSize)).cast("int"))
      .withColumn("__g", (col("__r") / lit(blockSize)).cast("int"))
    joinBlocks(indexed, Seq.empty, orderCol, payload)
  }

  def blockedSelfJoinPairs(
      df: DataFrame,
      bucketCols: Seq[String],
      orderCol: String,
      payload: Seq[String],
      blockSize: Int = 512): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*).orderBy(col(orderCol))
    val indexed = df
      .withColumn("__r", row_number().over(w) - 1)
      .withColumn("__m", count(lit(1)).over(
        Window.partitionBy(bucketCols.map(col): _*)))
      .withColumn("__nb", ceil(col("__m") / lit(blockSize)).cast("int"))
      .withColumn("__g", (col("__r") / lit(blockSize)).cast("int"))
    joinBlocks(indexed, bucketCols, orderCol, payload)
  }

  /** Shared block-join tail: rows carry (__g, __nb) block coordinates;
    * emit each row into every block-pair it participates in and equi-join
    * on (bucket?, blockA, blockB). */
  private def joinBlocks(
      indexed: DataFrame,
      bucketCols: Seq[String],
      orderCol: String,
      payload: Seq[String]): DataFrame = {
    val lower = indexed
      .withColumn("__gb", explode(expr("sequence(__g, __nb - 1)")))
      .withColumnRenamed("__g", "__ga")
    val upper = indexed
      .withColumn("__ga", explode(expr("sequence(0, __g)")))
      .withColumnRenamed("__g", "__gb")
    val joinKeys = bucketCols ++ Seq("__ga", "__gb")
    def side(d: DataFrame, p: String): DataFrame =
      d.select((joinKeys.map(col) :+ col(orderCol).as(s"${p}_$orderCol")) ++
        payload.map(c => col(c).as(s"${p}_$c")): _*)
    // The join MUST shuffle on (bucket, blockA, blockB): a broadcast join
    // would preserve the probe side's bucket-skewed partitioning and
    // serialize hot cells right back onto one task. shuffle_hash forces
    // the exchange that spreads cells across the cluster.
    side(lower, "a").hint("shuffle_hash")
      .join(side(upper, "b").hint("shuffle_hash"), joinKeys)
      .filter(col(s"a_$orderCol") < col(s"b_$orderCol"))
      .drop("__ga", "__gb")
  }
}
