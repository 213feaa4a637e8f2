package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: the Spark 4 VARIANT front door and the mergeable
  * HLL sketch tier.
  *
  * `variant_extract` is fully oracled (the driver hash-compares it against
  * base-column SQL), so the spec pins only the semantics the oracle can't
  * see: the VARIANT null taxonomy (failed cast vs absent path) and that
  * the binary encoding round-trips every fixture value.
  *
  * `hll_sketch_union` is approximate by semantics (rows-only at the
  * driver), so the spec IS its correctness story, together with
  * [[graft.ApproxBounds]]: estimates sit within 5σ of exact, and the
  * union of per-group sketches is EXACTLY the sketch of the union —
  * the mergeability contract that makes per-day sketch persistence the
  * right 100-TB architecture.
  */
class VariantSketchSpec extends SparkSpec {

  test("variant_extract: typed paths round-trip; bad casts and absent paths are NULL") {
    val rows = q("variant_extract").collect()
    assert(rows.nonEmpty)
    // every row: bad_cast (object→long) and missing path are NULL
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("bad_cast")), "object→long cast must be NULL")
      assert(r.isNullAt(r.fieldIndex("missing")), "absent path must be NULL")
    }
    // spot-check value transparency against the raw table
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id").collect()
    assert(rows.length === ev.length)
    rows.zip(ev).foreach { case (v, e) =>
      assert(v.getAs[String]("vtype") === e.getAs[String]("event_type"))
      assert(v.getAs[Long]("k") === e.getAs[Long]("k"))
      assert(v.getAs[Double]("second_val") === e.getAs[Double]("value") * 2,
        s"double JSON round-trip drifted at event ${e.getAs[Long]("event_id")}")
    }
  }

  test("hll_sketch_union: per-group within 5% of exact; merged == direct-build estimate") {
    val out = q("hll_sketch_union").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val ev = Tables.events(spark, sf)
    val exactPer = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val exactAll = ev.select("user_id").distinct().count()
    exactPer.foreach { case (t, exact) =>
      val approx = out(t)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.05, s"$t: approx=$approx exact=$exact relErr=$relErr")
    }
    val relAll = math.abs(out("__ALL__") - exactAll).toDouble / exactAll
    assert(relAll <= 0.05, s"__ALL__: approx=${out("__ALL__")} exact=$exactAll")
    // mergeability: union of per-type sketches ≡ one sketch over all rows
    // (register-wise max is associative/commutative — equality is exact)
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("n"))
      .collect()(0).getAs[Long]("n")
    assert(out("__ALL__") === direct,
      s"merged estimate ${out("__ALL__")} != direct-build estimate $direct")
  }
}
