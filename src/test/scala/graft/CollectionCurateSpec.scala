package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the MapType surface, PMI collocations, negative
  * sampling, and winsorization beyond the DuckDB hash gate. */
class CollectionCurateSpec extends SparkSpec {

  private def qln(x: Double): Double =
    math.floor(math.log(x) * 1048576.0) / 1048576.0

  test("map_ops: lookups match a relational recompute; keys sorted") {
    val dedup = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(min("l_quantity").as("q")).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    val got = q("map_ops").collect()
    assert(got.length === 100)
    got.foreach { r =>
      val ok = r.getAs[Long]("l_orderkey")
      val lines = dedup.keys.filter(_._1 == ok).map(_._2).toSeq.sorted
      assert(r.getAs[Long]("n_lines") === lines.length.toLong)
      assert(r.getAs[String]("line_keys") === lines.mkString(","))
      def expect(ln: Int): Option[Double] = dedup.get((ok, ln))
      assert(Option(r.getAs[java.lang.Double]("qty_line1")).map(_.toDouble) === expect(1))
      assert(Option(r.getAs[java.lang.Double]("qty_line2")).map(_.toDouble) === expect(2))
    }
  }

  test("pmi_bigrams equals a sequential PMI recompute (same quantized ln)") {
    val bigrams = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toSeq)
    val c2 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cf = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cl = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = bigrams.length.toLong
    val expected = c2.toSeq.filter(_._2 >= 5L).map { case ((w1, w2), c) =>
      (w1, w2, c, qln(c.toDouble * n.toDouble / (cf(w1).toDouble * cl(w2).toDouble)))
    }.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }.take(50)
    val got = q("pmi_bigrams").collect().map(r =>
      (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c2"), r.getAs[Double]("pmi")))
    assert(got.toSeq === expected)
  }

  test("negative_sample: no emitted pair is a positive; hash domain bounded") {
    val positives = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val maxPk = Tables.part(spark, sf).agg(max("p_partkey")).collect()(0).getLong(0)
    val nSupp = Tables.supplier(spark, sf).count()
    val got = q("negative_sample").collect()
    assert(got.nonEmpty && got.length <= nSupp * 10)
    got.foreach { r =>
      val (s, pk) = (r.getAs[Long]("s_suppkey"), r.getAs[Long]("cand_pk"))
      assert(!positives.contains((s, pk)), s"positive ($s, $pk) leaked through")
      assert(pk >= 1L && pk <= maxPk)
      assert(r.getAs[Long]("trial") >= 0L && r.getAs[Long]("trial") <= 9L)
    }
    // every (supplier, trial) whose candidate was NOT positive must appear
    val emitted = got.map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("trial"))).toSet
    val dropped = nSupp * 10 - emitted.size
    assert(dropped >= 0 && dropped <= positives.size)
  }

  test("winsorize: exact rank boundaries; clamped mean sits inside them") {
    val rows = Tables.customer(spark, sf)
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = q("winsorize").collect()
    assert(got.map(_.getAs[String]("c_mktsegment")).toSet === rows.map(_._1).toSet)
    got.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      val grp = rows.filter(_._1 == seg).sortBy(t => (t._3, t._2)).map(_._3)
      val n = grp.length
      val p05 = grp(math.ceil(0.05 * n).toInt - 1)
      val p95 = grp(math.ceil(0.95 * n).toInt - 1)
      assert(r.getAs[Double]("p05") === p05, s"p05 of $seg")
      assert(r.getAs[Double]("p95") === p95, s"p95 of $seg")
      assert(p05 <= p95)
      val mw = r.getAs[Double]("mean_wins")
      assert(mw >= p05 && mw <= p95, s"winsorized mean of $seg outside bounds")
      // winsorization shrinks (or keeps) the spread of the mean
      val clamped = grp.map(v => math.min(math.max(v, p05), p95))
      val expMw = clamped.map(v => BigDecimal(v).setScale(2)).sum.toDouble / n
      assert(mw === expMw, s"winsorized mean recompute of $seg")
    }
  }
}
