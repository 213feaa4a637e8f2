package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the time-series and profiling operators
  * beyond the DuckDB hash gate: hopping-window multiplicity, grid
  * density + LOCF carry of the gap fill, island/day conservation, and
  * profile counts vs direct queries. */
class SeriesProfileSpec extends SparkSpec {

  test("hopping_window: every event lands in exactly size/slide = 4 windows") {
    val total = q("hopping_window").agg(sum("n")).collect().head.getLong(0)
    val events = Tables.events(spark, sf).count()
    assert(total === 4 * events)
  }

  test("hopping_window: window starts are 15-minute aligned and span each event") {
    val starts = q("hopping_window").select("win_start").distinct().collect()
      .map(_.getTimestamp(0).getTime)
    assert(starts.forall(_ % (15L * 60 * 1000) == 0))
  }

  test("time_gap_fill: grid is dense and zero hours carry the last observed sum") {
    val rows = q("time_gap_fill").collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val hours = rows.map(_.getAs[java.sql.Timestamp]("h")).distinct
    assert(rows.length === types.length * hours.length)
    // within each type, a zero-count hour repeats the previous locf_sum
    types.foreach { t =>
      val series = rows.filter(_.getAs[String]("event_type") == t)
        .sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
      series.sliding(2).foreach {
        case Array(prev, cur) if cur.getAs[Long]("n") == 0 =>
          assert(cur.getAs[Double]("locf_sum") === prev.getAs[Double]("locf_sum"))
        case _ =>
      }
    }
  }

  test("gaps_islands: island lengths conserve active days for every user") {
    val out = q("gaps_islands").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("longest_run"))).toMap
    val days = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    days.foreach { case (u, ds) =>
      // brute-force island split on consecutive days
      val runs = ds.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (acc @ (cur :: rest), d)
            if cur.nonEmpty && cur.head.plusDays(1) == d => (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }
      val (nIslands, longest) = out(u)
      assert(nIslands === runs.length.toLong, s"user $u island count")
      assert(longest === runs.map(_.length).max.toLong, s"user $u longest run")
    }
  }

  test("profile_table: counts match direct queries; min <= max in native type") {
    val rows = q("profile_table").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val o = Tables.orders(spark, sf)
    assert(rows("o_custkey").getAs[Long]("n_distinct") ===
      o.select("o_custkey").distinct().count())
    assert(rows("o_orderstatus").getAs[Long]("n_nulls") === 0L)
    val tp = rows("o_totalprice")
    assert(tp.getAs[String]("min_str").toDouble <= tp.getAs[String]("max_str").toDouble)
  }

  test("cohort_retention: offset-0 cells partition the user base") {
    val rows = q("cohort_retention").collect()
    val day0 = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_active")).sum
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(day0 === users) // every user appears in exactly one cohort at offset 0
    // retention never exceeds the cohort's size
    val size = day0Sizes(rows)
    rows.foreach(r => assert(r.getAs[Long]("n_active") <=
      size(r.getAs[java.sql.Date]("cohort"))))
  }

  private def day0Sizes(rows: Array[org.apache.spark.sql.Row]) =
    rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(r => r.getAs[java.sql.Date]("cohort") -> r.getAs[Long]("n_active")).toMap

  test("event_transitions: rows per from-type sum to probability 1") {
    val rows = q("event_transitions").collect()
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
    }
    val nPairs = rows.map(_.getAs[Long]("n")).sum
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nPairs === expected) // each user contributes (events − 1) transitions
  }

  test("segment_gini: bounded by 1 − 1/k and matches a brute-force recompute") {
    val rows = q("segment_gini").collect()
    val k = Tables.events(spark, sf).select("event_type").distinct().count()
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g <= 1.0 - 1.0 / k)
    }
    // brute-force one segment
    val ev = Tables.events(spark, sf)
      .withColumn("dow", (weekday(col("ts")) + lit(1)).cast("long"))
    val seg = rows.head.getAs[Long]("dow")
    val counts = ev.filter(col("dow") === seg).groupBy("event_type").count()
      .collect().map(_.getAs[Long]("count"))
    val n = counts.sum.toDouble
    val expected = 1.0 - counts.map(c => c * c).sum / (n * n)
    assert(math.abs(rows.head.getAs[Double]("gini") - expected) < 1e-12)
  }

  test("regression_stats: matches Spark's built-in corr/regr aggregates") {
    val rows = q("regression_stats").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(corr(col("l_extendedprice"), col("l_quantity")).as("c"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("s"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("i"))
      .collect()
    builtin.foreach { b =>
      val mine = rows(b.getAs[String]("l_returnflag"))
      assert(math.abs(mine.getAs[Double]("r") - b.getAs[Double]("c")) < 1e-6)
      assert(math.abs(mine.getAs[Double]("slope") - b.getAs[Double]("s")) < 1e-6)
      assert(math.abs(mine.getAs[Double]("intercept") - b.getAs[Double]("i")) < 1e-3)
    }
  }

  test("string_agg_group: lists are sorted and cover all 25 nations") {
    val rows = q("string_agg_group").collect()
    val all = rows.flatMap(_.getAs[String]("nations").split(","))
    assert(all.length === 25)
    assert(all.distinct.length === 25)
    rows.foreach { r =>
      val ns = r.getAs[String]("nations").split(",").toSeq
      assert(ns === ns.sorted)
      assert(ns.length.toLong === r.getAs[Long]("n_nations"))
    }
  }

  test("ksFromCounts: a one-sided source reports KS = 1.0, never NaN") {
    // a source present on only one side of the snapshot cut is the
    // strongest drift (appeared/vanished feed); the cross-product form
    // degenerates to 0/0 there — the guard must pin it to exactly 1.0
    import spark.implicits._
    val per = Seq(
      ("new_src", 10L, 0L, 3L), ("new_src", 20L, 0L, 2L),
      ("old_src", 10L, 4L, 0L),
      ("both", 10L, 2L, 1L), ("both", 20L, 1L, 2L)
    ).toDF("source", "v", "c1", "c2")
    val got = graft.ops.ProfileOps.ksFromCounts(per).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4))))
      .toMap
    assert(got("new_src") === ((0L, 5L, 1.0)))
    assert(got("old_src") === ((4L, 0L, 1.0)))
    val (bo, bn, bks) = got("both")
    assert(bo === 3L && bn === 3L)
    assert(!bks.isNaN && bks >= 0.0 && bks <= 1.0)
  }

  test("quality_ks_drift replays the exact integer two-sample KS per source") {
    val docs = Tables.documents(spark, sf).select("source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    val cut = docs.map(_._2).max / 2
    val want = docs.groupBy(_._1).map { case (src, rs) =>
      val old = rs.filter(_._2 <= cut).map(_._3)
      val neu = rs.filter(_._2 > cut).map(_._3)
      val support = (old ++ neu).distinct.sorted
      val dNum = support.map(x =>
        math.abs(old.count(_ <= x).toLong * neu.length -
          neu.count(_ <= x).toLong * old.length)).max
      (src, old.length.toLong, neu.length.toLong, dNum,
        dNum.toDouble / (old.length.toLong * neu.length).toDouble)
    }.toSeq.sortBy(_._1)
    val got = q("quality_ks_drift").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === want)
    // the statistic is a proper KS value and the fixture actually drifts
    assert(got.forall { case (_, _, _, _, ks) => ks >= 0.0 && ks <= 1.0 })
    assert(got.exists(_._5 > 0.0), "no source shows any drift — degenerate fixture")
  }
}
