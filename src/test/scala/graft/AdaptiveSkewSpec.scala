package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** OBSERVED evidence that AQE's skew-join splitting fires — the runtime
  * half of the skew story. `join_skew_salted` demonstrates the explicit
  * rewrite (salt the key yourself when you know the skew); this spec
  * pins the adaptive path the other joins rely on: a shuffle join whose
  * key distribution funnels most rows into ONE reducer partition gets
  * that partition SPLIT at runtime by `OptimizeSkewedJoin`, with no
  * change to the query. At 100 TB this is the difference between one
  * straggler task sorting a quarter of the fact table and N parallel
  * tasks each joining a slice against the (replicated) matching build
  * rows.
  *
  * Thresholds are lowered to fixture scale (the detection rule is
  * size-relative: partition > max(threshold, factor × median)); the
  * MECHANISM exercised is exactly the production one.
  */
class AdaptiveSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true in the final plan)") {
    val confs = Seq(
      // force the shuffle-join path: broadcast would hide the skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // keep AQE from first coalescing the skew away into one partition
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // fixture-scale skew detection: flag a partition at >2x median and
      // >8 KB (compressed shuffle bytes), split toward 4 KB targets
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.shuffle.partitions" -> "8")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of the fact lands on join key 0 — the classic hot key. The
      // payload column keeps the hot partition's COMPRESSED shuffle bytes
      // above the detection threshold (a bare all-zero key column would
      // compress under any sane threshold).
      // Skew splitting divides a reducer partition along MAP-OUTPUT
      // boundaries — with one map task (the sf0.001 fixture is a single
      // file-split) there is nothing to divide and the rule reports zero
      // skewed partitions (observed). 16 map tasks give the splitter 16
      // chunks; a real cluster always has this parallelism for free.
      val fact = Tables.lineitem(spark, sf)
        .repartition(16)
        .withColumn("jk",
          when(col("l_orderkey") % 5 =!= 0, lit(0L))
            .otherwise(col("l_orderkey") % 1000))
        .withColumn("payload",
          md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))))
        .select("jk", "payload")
      val dim = spark.range(0, 1000).select(
        col("id").as("jk"), (col("id") * 7).as("dim_val"))
      val joined = fact.join(dim, "jk")
        .agg(count(lit(1)).as("n"), sum("dim_val").as("s"),
          sum(length(col("payload"))).as("pl"))
      val rows = joined.collect()
      // correctness first: every fact row finds its dim match
      assert(rows.head.getAs[Long]("n") === Tables.lineitem(spark, sf).count())

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p                        => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not mark the join as skew-split:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
