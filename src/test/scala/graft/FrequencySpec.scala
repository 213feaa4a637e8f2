package graft

import org.apache.spark.sql.functions._
import graft.functions.FrequencyFunctions._
import graft.ops.SketchOps

/** Frequent-items sketch tier properties: the candidate guarantee that
  * makes `fi_topk_merge` deterministic, and slice-mergeability. */
class FrequencySpec extends SparkSpec {

  private lazy val toks = Tables.documents(spark, sf)
    .select(col("source"), explode(split(col("text"), " ")).as("token"))

  private lazy val exactCounts: Map[String, Long] =
    toks.groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("merged per-source sketches nominate every token above the error bound (no false negatives)") {
    val m = SketchOps.fiMaxMap(spark)
    val merged = toks.groupBy("source")
      .agg(fiSketchAgg(col("token"), m).as("sk"))
      .agg(fiUnionAgg(col("sk"), m).as("sk"))
    val row = merged.select(
      fiSketchItems(col("sk")).as("items"),
      fiSketchMaxError(col("sk")).as("maxerr")).collect().head
    val cand = row.getSeq[String](0).toSet
    val maxErr = row.getLong(1)

    // the NO_FALSE_NEGATIVES contract: every token whose TRUE count
    // exceeds the sketch's error bound must be nominated
    val missed = exactCounts.filter { case (t, n) => n > maxErr && !cand(t) }
    assert(missed.isEmpty, s"sketch missed heavy tokens: ${missed.take(5)}")

    // determinism PRECONDITION of the registry query: the 20th exact
    // count sits far above the bound, so the top-20 always survives
    // nomination regardless of merge order
    val top20 = exactCounts.values.toSeq.sorted(Ordering[Long].reverse).take(20)
    assert(top20.last > 2 * maxErr,
      s"20th count ${top20.last} too close to sketch error $maxErr")
  }

  test("fi_topk_merge equals the exact sketch-free top-20") {
    val got = q("fi_topk_merge").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("sketch slicing is merge-order-robust: per-source merge nominates what a direct build nominates") {
    val m = SketchOps.fiMaxMap(spark)
    val direct = toks.agg(fiSketchAgg(col("token"), m).as("sk"))
      .select(fiSketchItems(col("sk")).as("items"), fiSketchMaxError(col("sk")).as("e"))
      .collect().head
    val sliced = toks.groupBy("source")
      .agg(fiSketchAgg(col("token"), m).as("sk"))
      .agg(fiUnionAgg(col("sk"), m).as("sk"))
      .select(fiSketchItems(col("sk")).as("items"), fiSketchMaxError(col("sk")).as("e"))
      .collect().head
    // internals (and so the exact candidate SETS) may differ with merge
    // order, but both must nominate everything above their OWN bound —
    // so the intersection must contain all tokens above the larger bound
    val bound = math.max(direct.getLong(1), sliced.getLong(1))
    val heavy = exactCounts.filter(_._2 > bound).keySet
    val both = direct.getSeq[String](0).toSet intersect sliced.getSeq[String](0).toSet
    assert(heavy.subsetOf(both),
      s"heavy tokens missing from a nomination path: ${(heavy -- both).take(5)}")
  }
}
