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
