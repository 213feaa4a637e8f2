package graft

import graft.ops.PairEnum
import org.apache.spark.sql.functions._

class PairEnumSpec extends SparkSpec {

  test("blocked pair enumeration equals the plain bucket self-join") {
    import spark.implicits._
    // skewed buckets: one giant, several small, singletons
    val rows = (0 until 700).map(i => (i.toLong, "hot")) ++
      (700 until 760).map(i => (i.toLong, s"small${i % 7}")) ++
      (760 until 770).map(i => (i.toLong, s"single$i"))
    val df = rows.toDF("id", "bucket")
    val plain = df.as("x").join(df.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
    val blocked = PairEnum.blockedSelfJoinPairs(df, Seq("bucket"), "id", Seq.empty, blockSize = 64)
      .select(col("a_id"), col("b_id"))
    assert(blocked.count() === plain.count())
    assert(blocked.except(plain).count() === 0)
    assert(plain.except(blocked).count() === 0)
    // exactly-once: no duplicate pairs
    assert(blocked.groupBy("a_id", "b_id").count().filter(col("count") > 1).count() === 0)
  }

  test("blocked enumeration bounds per-cell work by blockSize², any bucket size") {
    import spark.implicits._
    // one 700-row hot bucket: the pathological case a plain self-join
    // serializes onto a single task (700²/2 ≈ 245k pairs in one cell)
    val B = 64
    val df = (0 until 700).map(i => (i.toLong, "hot")).toDF("id", "bucket")
    val pairs = PairEnum.blockedSelfJoinPairs(df, Seq("bucket"), "id", Seq.empty, blockSize = B)
      .select("a_id", "b_id").collect()
    // ids are assigned in orderCol order, so position == id and the cell of
    // a pair is (a_id/B, b_id/B); reconstruct per-cell work from the output
    val perCell = pairs.groupBy(r => (r.getLong(0) / B, r.getLong(1) / B)).view.mapValues(_.length)
    val nb = math.ceil(700.0 / B).toInt
    assert(perCell.values.max <= B.toLong * B,
      "a join cell must never exceed blockSize² pairs")
    assert(perCell.size === nb * (nb + 1) / 2,
      "the bucket's pair matrix must decompose into exactly ⌈m/B⌉·(⌈m/B⌉+1)/2 cells")
  }

  test("blockedAllPairs equals the constant-bucket enumeration, no global data window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val df = (0 until 300).map(i => (i.toLong, s"p$i")).toDF("id", "p")
    val viaBucket = PairEnum
      .blockedSelfJoinPairs(df.withColumn("__bk", lit(0)), Seq("__bk"), "id", Seq("p"), 64)
      .select("a_id", "b_id", "a_p", "b_p")
    val allPairs = PairEnum.blockedAllPairs(df, "id", Seq("p"), 64)
      .select("a_id", "b_id", "a_p", "b_p")
    assert(allPairs.count() === 300L * 299 / 2)
    assert(allPairs.except(viaBucket).count() === 0)
    assert(viaBucket.except(allPairs).count() === 0)
    // two-phase indexing: any empty-partition window sits above the
    // per-range aggregate, never over row data
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = PairEnum.blockedAllPairs(df, "id", Seq("p"), 64).queryExecution.executedPlan
      val globalWindows = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      globalWindows.foreach { w =>
        val overAggregate = w.collectFirst {
          case a: BaseAggregateExec => a
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec
            if r.child.collectFirst { case a: BaseAggregateExec => a }.isDefined => r
        }.isDefined
        assert(overAggregate, s"global window over raw data:\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("blocked enumeration carries payload columns") {
    import spark.implicits._
    val df = Seq((1L, "b", "x"), (2L, "b", "y"), (3L, "b", "z")).toDF("id", "bucket", "p")
    val pairs = PairEnum.blockedSelfJoinPairs(df, Seq("bucket"), "id", Seq("p"), blockSize = 2)
      .orderBy("a_id", "b_id").collect()
    assert(pairs.length === 3)
    val r = pairs.map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id"),
      x.getAs[String]("a_p"), x.getAs[String]("b_p")))
    assert(r.contains((1L, 2L, "x", "y")) && r.contains((1L, 3L, "x", "z")) &&
      r.contains((2L, 3L, "y", "z")))
  }
}
