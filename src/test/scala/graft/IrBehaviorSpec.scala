package graft

import org.apache.spark.sql.functions._

/** Cross-checks for the IR / rolling-distinct / robust-stats / BFS /
  * SQL-front-door operators beyond the DuckDB hash gate: each result is
  * recomputed independently (driver-side Scala over the collected
  * fixture, or the DataFrame twin of the SQL text) and compared exactly.
  */
class IrBehaviorSpec extends SparkSpec {

  private def qln(x: Double): Double =
    math.floor(math.log(x) * 1048576.0) / 1048576.0

  test("bm25_rank equals a sequential BM25 recompute (same quantized ln)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val terms = Seq("join", "vector", "dup")
    val n = docs.length.toLong
    val sumDl = docs.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / n.toDouble
    val dfT = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def idf(t: String): Double =
      qln(1.0 + ((n - dfT(t)).toDouble + 0.5) / (dfT(t).toDouble + 0.5))
    def contrib(t: String, tf: Long, dl: Long): Double =
      if (tf == 0) 0.0
      else idf(t) * (tf.toDouble * 2.2 /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)))
    val expected = docs.map { case (id, toks) =>
      val dl = toks.length.toLong
      val score = terms.map(t => contrib(t, toks.count(_ == t).toLong, dl))
        .reduceLeft(_ + _)
      (id, score)
    }.filter(_._2 > 0.0).sortBy { case (id, s) => (-s, id) }.take(50)
    val got = q("bm25_rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.toSeq === expected.toSeq)
  }

  test("hybrid_rrf_fuse equals a sequential RRF recompute over both ranked lists") {
    // sparse side: the bm25 replay's top-50, ranked
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val terms = Seq("join", "vector", "dup")
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n.toDouble
    val dfT = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def idf(t: String): Double =
      qln(1.0 + ((n - dfT(t)).toDouble + 0.5) / (dfT(t).toDouble + 0.5))
    def contrib(t: String, tf: Long, dl: Long): Double =
      if (tf == 0) 0.0
      else idf(t) * (tf.toDouble * 2.2 /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl)))
    val sparseRnk = docs.map { case (id, toks) =>
        val dl = toks.length.toLong
        (id, terms.map(t => contrib(t, toks.count(_ == t).toLong, dl))
          .reduceLeft(_ + _))
      }.filter(_._2 > 0.0).sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // dense side: exact cosine vs the vec_id-0 query, ranked top-50
    def dotLR(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qe = vecs.find(_._1 == 0L).get._2
    val qn = dotLR(qe, qe)
    val denseRnk = vecs.filter(_._1 != 0L)
      .map { case (id, e) => (id, dotLR(qe, e) / math.sqrt(qn * dotLR(e, e))) }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    def term(r: Option[Long]): Double =
      r.map(x => 1.0 / (60.0 + x.toDouble)).getOrElse(0.0)
    val want = (sparseRnk.keySet ++ denseRnk.keySet).toSeq
      .map(id => (id, sparseRnk.get(id), denseRnk.get(id),
        term(sparseRnk.get(id)) + term(denseRnk.get(id))))
      .sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    val got = q("hybrid_rrf_fuse").collect().map(r =>
      (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3))).toSeq
    assert(got === want)
    assert(got.size === 20)
    // fusion non-degenerate: both rankers contribute to the fused top-20
    // (each list's rank-1 doc carries at least 1/61 and cannot be pushed
    // out of the top-20 by single-list docs alone)
    assert(got.exists(_._2.nonEmpty), "no sparse-ranked doc in the fused list")
    assert(got.exists(_._3.nonEmpty), "no dense-ranked doc in the fused list")
  }

  test("inverted_index: df and postings match a sequential rebuild") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).distinct))
    val byToken = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = q("inverted_index").collect()
    assert(got.map(_.getAs[String]("token")).toSet === byToken.keySet)
    got.foreach { r =>
      val exp = byToken(r.getAs[String]("token"))
      assert(r.getAs[Long]("df") === exp.length.toLong)
      assert(r.getAs[String]("postings") === exp.take(10).mkString("|"))
    }
    // sorted by df desc, token asc
    val order = got.map(r => (-r.getAs[Long]("df"), r.getAs[String]("token")))
    assert(order.toSeq === order.sortBy(identity).toSeq)
  }

  test("rolling_dau equals a per-day trailing-window distinct recount") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    val got = q("rolling_dau").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toLocalDate
      val exp = ud.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau7") === exp, s"day $day")
    }
    // span: min activity day .. max activity day, nothing outside
    val days = got.map(_.getAs[java.sql.Date]("day").toLocalDate)
    assert(days.min === ud.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)))
    assert(days.max === ud.map(_._2).max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)))
  }

  test("mad_outliers equals a sequential median/MAD recompute") {
    val rows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def twoMiddleMean(vs: Seq[Double], exactDecimal: Boolean): Double = {
      val n = vs.length
      val picks = Seq((n + 1) / 2, (n + 2) / 2).distinct.map(i => vs(i - 1))
      if (exactDecimal)
        picks.map(v => BigDecimal(v).setScale(2)).sum.toDouble / picks.length.toDouble
      else picks.sum / picks.length.toDouble
    }
    val got = q("mad_outliers").collect()
    assert(got.length === rows.map(_._1).distinct.length)
    got.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      val grp = rows.filter(_._1 == p)
      val med = twoMiddleMean(
        grp.sortBy(t => (t._3, t._2)).map(_._3).toSeq, exactDecimal = true)
      val devs = grp.map(t => (math.abs(t._3 - med), t._2))
      val mad = twoMiddleMean(devs.sortBy(identity).map(_._1).toSeq, exactDecimal = false)
      assert(r.getAs[Long]("n_rows") === grp.length.toLong)
      assert(r.getAs[Double]("med") === med, s"median of $p")
      assert(r.getAs[Double]("mad") === mad, s"MAD of $p")
      assert(r.getAs[Long]("n_outliers") ===
        devs.count(_._1 > 3.0 * mad).toLong, s"outliers of $p")
    }
  }

  test("graph_bfs_levels equals a sequential BFS over the collected graph") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (li.map { case (p, s) => (p * 2, s * 2 + 1) } ++
      li.map { case (p, s) => (s * 2 + 1, p * 2) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val src = li.map(_._1).min * 2
    var dist = Map(src -> 0)
    var frontier = Set(src)
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    val got = q("graph_bfs_levels").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Int]("hop")).toMap
    assert(got === dist)
  }

  test("graph_bfs_converged: depth-3 BFS is a prefix; frontier truly drained") {
    val full = q("graph_bfs_converged").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Int]("hop")).toMap
    val bounded = q("graph_bfs_levels").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Int]("hop")).toMap
    // prefix property: the depth-bounded run IS the converged run cut at 3
    assert(full.filter(_._2 <= 3) === bounded)
    // convergence property: every edge out of a settled node leads to a
    // node settled at most one hop later — no undiscovered neighbor left
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.map { case (p, s) => (p * 2, s * 2 + 1) } ++
      li.map { case (p, s) => (s * 2 + 1, p * 2) }
    edges.foreach { case (a, b) =>
      full.get(a).foreach { ha =>
        assert(full.contains(b) && full(b) <= ha + 1,
          s"neighbor $b of settled $a (hop $ha) not settled within ${ha + 1}")
      }
    }
  }

  test("tfidf_doc_sim equals a sequential sparse-cosine recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = docs.length.toLong
    val tf: Map[(Long, String), Long] = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, xs) => ((d, t), xs.length.toLong) }
    }.toMap
    val dfT = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def w(d: Long, t: String): Double =
      tf.getOrElse((d, t), 0L).toDouble * qln(n.toDouble / dfT(t).toDouble)
    def q20sum(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1048576.0).toLong).sum.toDouble / 1048576.0
    val nrm = docs.map { case (d, ts) =>
      d -> math.sqrt(q20sum(ts.distinct.toSeq.map(t => { val x = w(d, t); x * x })))
    }.toMap
    val rare = dfT.filter { case (_, df) => df * 5 <= n }.keySet
    val hasRare = docs.filter(_._2.exists(rare)).map(_._1)
    val cands = for {
      d1 <- hasRare; d2 <- hasRare
      if d1 < d2 && docs.find(_._1 == d1).get._2.toSet
        .intersect(docs.find(_._1 == d2).get._2.toSet).exists(rare)
    } yield (d1, d2)
    val expected = cands.map { case (d1, d2) =>
      val shared = docs.find(_._1 == d1).get._2.distinct.toSeq
        .filter(t => tf.contains((d2, t))).sorted
      val dot = q20sum(shared.map(t => w(d1, t) * w(d2, t)))
      (d1, d2, dot, dot / (nrm(d1) * nrm(d2)))
    }.filter { case (d1, d2, _, _) => nrm(d1) > 0.0 && nrm(d2) > 0.0 }
      .sortBy { case (d1, d2, _, c) => (-c, d1, d2) }.take(20)
    val got = q("tfidf_doc_sim").collect().map(r =>
      (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Double]("dot"), r.getAs[Double]("cos")))
    assert(got.toSeq === expected.toSeq)
    got.foreach { case (_, _, _, c) => assert(c >= 0.0 && c <= 1.0 + 1e-9) }
  }

  test("interval_overlap_join equals the naive theta join on the small fixture") {
    val rows = q("interval_overlap_join").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("window_id"), r.getAs[Long]("overlap_sec")))
    // sequential recompute: sessions by 30-min gap fold, windows from the
    // day-truncated min bound, then the quadratic overlap scan
    val evs = Tables.events(spark, sf).select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).getTime * 1000L, r.getLong(2)))
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var sid = 0L; var start = ts.head; var last = ts.head
      ts.tail.foreach { t =>
        if (t - last > 1800L * 1000000L) { sid += 1; out += ((u, sid, start, last)); start = t }
        last = t
      }
      out += ((u, sid + 1, start, last))
      // re-number from 1 (running-sum semantics): first emitted got sid+1=1 when no splits
      out.zipWithIndex.map { case ((uu, _, s, e), i) => (uu, i + 1L, s, e) }
    }
    val d0 = {
      val m = evs.map(_._2).min
      m - java.lang.Math.floorMod(m, 86400L * 1000000L)
    }
    val mx = evs.map(_._2).max
    val expected = for {
      (u, sid, s, e) <- sessions
      i <- 0L to ((mx - d0) / 21600000000L)
      ws = d0 + i * 21600000000L
      we = ws + 7200000000L
      if s < we && ws < e
    } yield (u, sid, i, (math.min(e, we) - math.max(s, ws)) / 1000000L)
    assert(rows.sorted.toSeq === expected.sorted.toSeq)
    assert(rows.nonEmpty)
  }

  test("interval_overlap_join: data-derived bin width bounds the explode fan-out") {
    val sess = ops.TimeOps.sessionIntervals(spark, sf)
    val binw = ops.TimeOps.overlapBinWidth(sess).collect()(0).getAs[Long]("binw")
    // width covers the P99 session length (hour-rounded, floor 1h) …
    assert(binw >= 3600000000L)
    assert(binw % 3600000000L === 0L)
    val lens = sess.select((col("e_us") - col("s_us")).as("len"))
      .collect().map(_.getLong(0)).sorted
    val p99 = lens(math.min(lens.length - 1, math.ceil(lens.length * 0.99).toInt - 1))
    assert(binw + 3600000000L >= p99,
      s"binw $binw not within one hour-round of p99 $p99")
    // … so ≥99% of intervals span ≤2 bins and the explode stays ~linear:
    // average bins-per-session ≤ 2 + the ≤1% tail's maxLen/binw surplus
    val bins = sess.select(
        (col("e_us") / binw).cast("long") - (col("s_us") / binw).cast("long") + 1L)
      .collect().map(_.getLong(0))
    val avg = bins.sum.toDouble / bins.length
    val tailBound = 2.0 + 0.01 * (lens.last.toDouble / binw + 1.0)
    assert(avg <= tailBound, s"average bins/session $avg exceeds bound $tailBound")
  }

  test("sql_q3_shipping equals its DataFrame-API twin") {
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
    val twin = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, sf).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)")) *
        (lit(1) - col("l_discount").cast("decimal(18,2)")))
        .cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
    assert(q("sql_q3_shipping").collect().toSeq === twin.collect().toSeq)
  }

  test("entropy_segments equals a sequential Shannon-entropy recompute") {
    val rows = Tables.events(spark, sf)
      .select(expr("CAST(weekday(ts) + 1 AS BIGINT)").as("dow"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (dow, es) =>
      val n = es.length.toLong
      val counts = es.groupBy(_._2).values.map(_.length.toLong)
      val sumq = counts.map(c => c * math.floor(math.log(c.toDouble) * 1048576.0).toLong).sum
      val h = math.floor(math.log(n.toDouble) * 1048576.0).toLong / 1048576.0 -
        sumq.toDouble / (n.toDouble * 1048576.0)
      (dow, n, h)
    }
    val got = q("entropy_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    // entropy is bounded by ln(observed |types|); quantization can dip a
    // near-degenerate mix at most one 2^-20 grid step below zero (the
    // ln(N) term floors DOWN while the subtracted per-type terms floor UP
    // in effect), so the lower bound is the quantization floor, not 0
    val nTypes = rows.map(_._2).distinct.length
    got.foreach { case (_, _, h) =>
      assert(h >= -1.0 / 1048576 && h <= math.log(nTypes.toDouble) + 1.0 / 1048576) }
  }

  test("chi2_type_dow equals a sequential contingency-table recompute") {
    val rows = Tables.events(spark, sf)
      .select(expr("CAST(weekday(ts) + 1 AS BIGINT)").as("dow"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cells = rows.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val rt = rows.groupBy(_._1).map { case (k, v) => (k, v.length.toLong) }
    val ct = rows.groupBy(_._2).map { case (k, v) => (k, v.length.toLong) }
    val tot = rows.length.toLong
    val sumQ = cells.map { case ((d, t), o) =>
      val num = (o * tot - rt(d) * ct(t)).toDouble
      math.floor(num * num / (tot.toDouble * rt(d).toDouble * ct(t).toDouble)
        * 1048576.0).toLong
    }.sum
    val Array(row) = q("chi2_type_dow").collect()
    assert(row.getLong(0) === tot)
    assert(row.getLong(1) === (rt.size - 1).toLong * (ct.size - 1).toLong)
    assert(row.getDouble(2) === sumQ.toDouble / 1048576.0)
  }

  test("seasonal_anomaly returns each type's top-3 ratio days, ratios consistent") {
    val got = q("seasonal_anomaly").collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
      // ranked by descending ratio within each type
      val byRk = rows.sortBy(_.getLong(2)).map(_.getDouble(5))
      assert(byRk.sameElements(byRk.sorted.reverse))
    }
    got.foreach { r =>
      val (actual, baseline, ratio) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // ratio recomputed from the dequantized outputs agrees to the ulp
      // tolerance the two extra divides introduce
      assert(math.abs(ratio - actual / baseline) < 1e-9)
      assert(ratio > 0.0 && baseline > 0.0 && actual > 0.0)
    }
  }

  test("sql_q18_toporders equals its DataFrame-API twin") {
    val bigOrders = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
      .filter(col("sq") > 300)
      .select("l_orderkey")
    val twin = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf)
          .join(bigOrders, Seq("l_orderkey"), "left_semi"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("total_price"),
        col("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey").asc)
      .limit(100)
    assert(q("sql_q18_toporders").collect().toSeq === twin.collect().toSeq)
  }
}
