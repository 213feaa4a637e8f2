package graft

import org.apache.spark.sql.functions._

/** Properties for the round-6 retail / series / text / match / graph
  * operators beyond the DuckDB hash gate: brute-force cross-checks for
  * the blocked and window-based formulations (skyline vs NOT EXISTS,
  * neighborhood blocking vs the O(n²) scan, adjacency credits vs the
  * wedge join), algebraic identities for the ratio queries, and an
  * independent Scala recomputation of the dyadic EWMA.
  */
class RetailSeriesSpec extends SparkSpec {

  test("market_basket: pair counts equal the self-join formulation") {
    val got = q("market_basket").collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val expected = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("a"), col("b.pk").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("a").asc, col("b").asc)
      .limit(50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("n_ab"))).toSeq === expected.toSeq)
    val nOrders = li.select("ok").distinct().count()
    got.foreach { r =>
      // support and lift restate the counts exactly (exact small longs)
      assert(r.getAs[Double]("support") * nOrders === r.getAs[Long]("n_ab").toDouble)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("brand_skyline: equals the quadratic NOT EXISTS frontier") {
    val got = q("brand_skyline").collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Int]("p_size"),
        r.getAs[Double]("p_retailprice"), r.getAs[Long]("p_partkey")))
    val p = Tables.part(spark, sf)
      .select("p_brand", "p_size", "p_retailprice", "p_partkey")
    val dominated = p.as("r").join(p.as("q"),
      col("q.p_brand") === col("r.p_brand") &&
        col("q.p_size") >= col("r.p_size") &&
        col("q.p_retailprice") <= col("r.p_retailprice") &&
        (col("q.p_size") > col("r.p_size") ||
          col("q.p_retailprice") < col("r.p_retailprice")),
      "left_semi")
    val expected = p.exceptAll(dominated)
      .orderBy("p_brand", "p_size", "p_retailprice", "p_partkey")
      .collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Int]("p_size"),
        r.getAs[Double]("p_retailprice"), r.getAs[Long]("p_partkey")))
    assert(got.toSeq === expected.toSeq)
  }

  test("exact_median_groups: matches Spark's exact percentile(0.5)") {
    val got = q("exact_median_groups").collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Double]("median_price"))
      .toMap
    val exp = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("m"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Double]("m"))
      .toMap
    assert(got.keySet === exp.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-6, k) }
  }

  test("ratio_to_total: shares are positive and sum to exactly 1 in decimal") {
    val rows = q("ratio_to_total").collect()
    rows.foreach(r => assert(r.getAs[Double]("rev_share") > 0.0))
    // revenues are exact decimal sums, so group revenues sum to the total:
    // share_i = rev_i / total with a common exact denominator
    val revs = rows.map(r => BigDecimal(r.getAs[Double]("revenue")))
    val shares = rows.map(_.getAs[Double]("rev_share"))
    val total = revs.sum
    rows.zip(shares).foreach { case (r, s) =>
      assert(math.abs(s - (BigDecimal(r.getAs[Double]("revenue")) / total).toDouble) < 1e-12)
    }
  }

  test("yoy_growth: growth restates the revenue ratio; first year has no prior") {
    val rows = q("yoy_growth").collect()
    val byMonth = rows.map(r => r.getAs[java.sql.Timestamp]("month") -> r).toMap
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    rows.foreach { r =>
      val m = r.getAs[java.sql.Timestamp]("month")
      cal.setTime(m)
      cal.add(java.util.Calendar.YEAR, -1)
      val prior = new java.sql.Timestamp(cal.getTimeInMillis)
      if (byMonth.contains(prior)) {
        assert(r.getAs[Double]("prev_year") === byMonth(prior).getAs[Double]("revenue"))
        assert(r.getAs[Double]("yoy") ===
          r.getAs[Double]("revenue") / r.getAs[Double]("prev_year") - 1.0)
      } else {
        assert(r.isNullAt(r.fieldIndex("prev_year")))
        assert(r.isNullAt(r.fieldIndex("yoy")))
      }
    }
  }

  test("fuzzy_name_pairs: neighborhood blocking finds every distance-1 pair") {
    val perPos = q("fuzzy_name_pairs").collect()
      .map(r => r.getAs[Int]("pos") -> r.getAs[Long]("n_pairs")).toMap
    val names = Tables.customer(spark, sf).select("c_name")
      .collect().map(_.getString(0))
    // brute force: all O(n²) pairs at Levenshtein distance exactly 1
    // (names are fixed-width, so distance 1 ⇔ one substituted position)
    var total = 0L
    var i = 0
    while (i < names.length) {
      var j = i + 1
      while (j < names.length) {
        val (a, b) = (names(i), names(j))
        var diffs = 0
        var p = 0
        while (p < a.length && diffs <= 1) {
          if (a.charAt(p) != b.charAt(p)) diffs += 1
          p += 1
        }
        if (diffs == 1) total += 1
        j += 1
      }
      i += 1
    }
    assert(perPos.values.sum === total)
    // masked positions cover only the digit suffix
    assert(perPos.keySet.forall(p => p >= 10 && p <= 18))
  }

  test("ewma_daily: matches a sequential Scala recomputation exactly") {
    val rows = q("ewma_daily").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("d").toString)
      val counts = sorted.map(_.getAs[Long]("c"))
      sorted.zipWithIndex.foreach { case (r, t) =>
        val window = (0 to math.min(6, t)).map(k => counts(t - k))
        val num = window.zipWithIndex.map { case (c, k) => c * (1L << (6 - k)) }.sum
        val den = window.indices.map(k => 1L << (6 - k)).sum
        assert(r.getAs[Double]("ewma") === num.toDouble / den.toDouble)
      }
    }
  }

  test("dq_checks: consistent fixture passes structural rules; date rule fires") {
    val rows = q("dq_checks").collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Long]("n_checked"))).toMap
    assert(rows.size === 8)
    Seq("orders_dup_orderkey", "orders_null_custkey",
      "orders_nonpositive_totalprice", "lineitem_discount_range",
      "lineitem_nonpositive_extendedprice", "lineitem_orphan_orderkey",
      "orders_orphan_custkey").foreach { rule =>
      assert(rows(rule)._1 === 0L, rule)
      assert(rows(rule)._2 > 0L, rule)
    }
    // synthetic dates are independent, so roughly half the lines violate
    val (viol, checked) = rows("lineitem_ship_before_order")
    assert(viol > 0L && viol < checked)
  }

  test("unicode_nfc: composition shortens by exactly one code point; idempotent") {
    import graft.functions.TextFunctions.nfcNormalize
    q("unicode_nfc").collect().foreach { r =>
      assert(r.getAs[Int]("len_nfc") === r.getAs[Int]("len_raw") - 1)
    }
    import spark.implicits._
    val probe = Seq(
      ("cafe\u0301", "caf\u00e9"),  // decomposed -> precomposed
      ("caf\u00e9", "caf\u00e9"),   // already NFC: unchanged
      ("ascii only", "ascii only"))
      .toDF("s", "expected")
    val out = probe
      .select(nfcNormalize(col("s")).as("n"),
        nfcNormalize(nfcNormalize(col("s"))).as("nn"), col("expected"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[String]("n") === r.getAs[String]("expected"))
      assert(r.getAs[String]("nn") === r.getAs[String]("n"))
    }
  }

  test("vocab_coverage: ranks dense, freqs non-increasing, coverage monotone to ≤1") {
    val rows = q("vocab_coverage").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("freq") >= b.getAs[Long]("freq"))
        assert(a.getAs[Double]("cum_share") <= b.getAs[Double]("cum_share"))
      case _ =>
    }
    assert(rows.last.getAs[Double]("cum_share") <= 1.0)
    // top-100 of a 31-token fixture vocabulary covers everything
    if (rows.length < 100) assert(rows.last.getAs[Double]("cum_share") === 1.0)
  }

  test("graph_local_cc: credits match the wedge-join recount; lcc bounded") {
    val got = q("graph_local_cc").collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("x"), col("b.pk").as("y")).distinct().cache()
    val tri = e.as("e1").join(e.as("e2"), col("e1.y") === col("e2.x"))
      .join(e.as("e3"),
        col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"), col("e2.y").as("c"))
    val credits = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap
    got.foreach { r =>
      assert(credits(r.getAs[Long]("node")) === r.getAs[Long]("n_tri"))
      val lcc = r.getAs[Double]("lcc")
      assert(lcc > 0.0 && lcc <= 1.0)
    }
    e.unpersist()
  }
}
