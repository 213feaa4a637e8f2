package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed co-located joins — the pre-partitioning strategy that removes
  * the shuffle from recurring fact-fact joins at 100 TB: both tables are
  * written bucketed on the join key, so the join reads bucket-aligned
  * files and needs NO Exchange at query time.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // default (session-static) warehouse dir; DROP ... CASCADE cleans up
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.orders(spark, sf)
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      Tables.lineitem(spark, sf)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.orders_b")
        .join(spark.table(s"$db.lineitem_b"), "o_orderkey")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      // same answer as the shuffle-join formulation on the raw parquet
      val reference = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderkey").collect()
        .sameElements(reference.orderBy("o_orderkey").collect()))
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("mismatched bucket counts coalesce instead of shuffling (8 buckets join 4)") {
    // Real warehouses accumulate tables bucketed at different k (grown
    // clusters, different eras of ingest). Re-bucketing everything to
    // one k is a full rewrite of the larger table; bucket COALESCING
    // reads the finer table's buckets 2-per-task to align with the
    // coarser one — still no Exchange. The knob exists precisely so a
    // bucket-count migration is never urgent.
    val db = "graft_bucket_coalesce_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    // force the merge-join path: a broadcast join would ignore bucketing
    // entirely (and hide what this test pins)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf)
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b4")
      Tables.lineitem(spark, sf)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.lineitem_b8")

      val joined = spark.table(s"$db.orders_b4")
        .join(spark.table(s"$db.lineitem_b8"), "o_orderkey")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"mismatched-bucket join shuffled instead of coalescing:\n$plan")
      assert(plan.contains("Coalesced"),
        s"no bucket coalescing marker in:\n$plan")

      val reference = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderkey").collect()
        .sameElements(reference.orderBy("o_orderkey").collect()))
    } finally {
      spark.conf.unset("spark.sql.bucketing.coalesceBucketsInJoin.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
