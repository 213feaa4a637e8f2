package graft

import org.apache.spark.sql.functions._

/** Round-9 sketch-tier hardening: the HLL persistence round-trip, the
  * mergeable KLL percentile tier, and theta set algebra.
  *
  * All three queries are approximate by semantics (rows-only at the
  * driver), so these specs — together with [[graft.ApproxBounds]] — ARE
  * their correctness story:
  *
  *   - `hll_sketch_persist` must EQUAL `hll_sketch_union` exactly: HLL
  *     union is a register-wise max, so (sketch slice 1 → parquet → read
  *     back → union slice 2) and (one sketch over everything) are the
  *     same fold — IF the serialized sketch bytes survive the
  *     write/read boundary intact. That byte-fidelity is what this spec
  *     actually pins.
  *   - `kll_quantile_merge` is bounded in NORMALIZED RANK vs the exact
  *     sort: rank is the quantity KLL controls (k=800 → ~0.25%
  *     one-sided), and the bound holds for every internal random draw;
  *     value-space comparison would couple the test to the price
  *     distribution's local density.
  *   - `theta_user_set_ops` estimates |A|, |B|, |A∪B|, |A∩B|, |A\B| of
  *     the click/purchase user populations; each is checked against its
  *     exact DataFrame twin, plus the inclusion–exclusion identity.
  */
class SketchTierSpec extends SparkSpec {

  test("hll_sketch_persist: persisted+merged estimates == in-session union exactly") {
    def toMap(name: String) = q(name).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users"))
      .toMap
    val persisted = toMap("hll_sketch_persist")
    val direct = toMap("hll_sketch_union")
    assert(persisted === direct,
      "sketch bytes must survive the parquet round-trip: register-wise max " +
        s"makes the folds identical, so any drift is serialization damage " +
        s"(persisted=$persisted direct=$direct)")
  }

  test("kll_quantile_merge: per-slice and merged quantiles within 1% rank of exact") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
    val out = q("kll_quantile_merge").collect()
    assert(out.map(_.getAs[String]("slice")).toSet.contains("__ALL__"))
    out.foreach { r =>
      val slice = r.getAs[String]("slice")
      val pop = if (slice == "__ALL__") li else li.filter(col("l_returnflag") === slice)
      val n = pop.count().toDouble
      // the bound is the LIBRARY's own 99%-confidence normalized rank
      // error for the operator's configured k (not a hand-picked 1%):
      // 2× for merge-of-slices on the __ALL__ row, + one grid step for
      // the finite fixture's rank discreteness
      val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(
        graft.ops.SketchOps.KllK, false)
      val bound = 2 * eps + 1.0 / n
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (c, p) =>
        val v = r.getAs[Double](c)
        val rank = pop.filter(col("v") <= v).count() / n
        assert(math.abs(rank - p) <= bound,
          s"$slice.$c: value $v has rank $rank, expected within $bound of $p")
      }
    }
  }

  test("theta_user_set_ops: set-algebra estimates within 5% of exact; inclusion-exclusion holds") {
    val userDay = graft.ops.SketchOps.userDayKey.as("ud")
    val ev = Tables.events(spark, sf)
    def userDays(t: String) = ev.filter(col("event_type") === t)
      .select(userDay).distinct()
    val a = userDays("click").cache()
    val b = userDays("purchase").cache()
    val exact = Map(
      "click_user_days" -> a.count(),
      "purchase_user_days" -> b.count(),
      "union_user_days" -> a.union(b).distinct().count(),
      "intersect_user_days" -> a.intersect(b).count(),
      "click_only_user_days" -> a.except(b).count())
    // the user-day grain must actually separate the populations —
    // otherwise this test degenerates to five copies of one number
    assert(exact("click_only_user_days") > 0, "populations coincide; grain too coarse")
    val r = q("theta_user_set_ops").collect()(0)
    exact.foreach { case (c, e) =>
      val est = r.getAs[Long](c).toDouble
      assert(math.abs(est - e) <= math.max(0.05 * e, 1.0), s"$c: est=$est exact=$e")
    }
    // inclusion–exclusion on the estimates themselves: theta's union /
    // intersection operate on the same retained hash set, so the identity
    // survives estimation (loose tolerance for sampling-mode rounding)
    val ie = (r.getAs[Long]("click_user_days") +
      r.getAs[Long]("purchase_user_days") -
      r.getAs[Long]("intersect_user_days")).toDouble
    assert(math.abs(ie - r.getAs[Long]("union_user_days")) <=
      0.05 * r.getAs[Long]("union_user_days"))
    a.unpersist(); b.unpersist()
  }
}
