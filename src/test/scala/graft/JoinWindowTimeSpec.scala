package graft

import org.apache.spark.sql.functions._

class JoinWindowTimeSpec extends SparkSpec {

  test("join_broadcast: every customer lands in exactly one (region, nation)") {
    val total = q("join_broadcast").agg(sum("n_cust")).collect()(0).getLong(0)
    assert(total === Tables.customer(spark, sf).count())
  }

  test("join_broadcast plan actually broadcasts the dimensions") {
    val plan = q("join_broadcast").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("join_shuffle_agg revenue is positive and ranked descending") {
    val rows = q("join_shuffle_agg").collect()
    assert(rows.length === 100)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("semi + anti partition the customer set") {
    val semiAll = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    val anti = q("join_anti").count()
    assert(semiAll + anti === Tables.customer(spark, sf).count())
  }

  test("join_outer preserves all orders") {
    assert(q("join_outer").count() === Tables.orders(spark, sf).count())
  }

  test("range_join_binned: overlapping intervals, binned plan (no nested loop)") {
    val df = q("range_join_binned")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join must stay a binned equi-join:\n$plan")
    // the campaign windows overlap: memberships exceed the order count,
    // so rows genuinely land in multiple intervals (a real range join,
    // not a disguised partition-by)
    val memberships = df.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(memberships > Tables.orders(spark, sf).count())
  }

  test("window_rank: rn within [1,3] and unique per customer") {
    val df = q("window_rank")
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() === 0)
    val dupes = df.groupBy("o_custkey", "rn").count().filter(col("count") > 1).count()
    assert(dupes === 0)
  }

  test("custom TopKPerKey operator equals the row_number window formulation") {
    val custom = q("window_rank_custom").collect()
    val window = q("window_rank").collect()
    assert(custom.length === window.length)
    custom.zip(window).foreach { case (c, w) =>
      assert(c.getAs[Long]("o_custkey") === w.getAs[Long]("o_custkey"))
      assert(c.getAs[Int]("rn") === w.getAs[Int]("rn"))
      assert(c.getAs[Long]("o_orderkey") === w.getAs[Long]("o_orderkey"))
    }
  }

  test("TopKPerKeyExec sort fallback (key budget exceeded) equals the heap path") {
    // orders at sf0.001 has ~1500 distinct custkeys per partition; a key
    // budget of 16 forces the overflow path in every partition, and the
    // 1024-row chunk bound forces real spilled runs + k-way merge.
    val spilled = graft.plans.TopKPerKey.topKPerKey(
        Tables.orders(spark, sf), Seq("o_custkey"),
        "o_totalprice", descending = true, tiebreakers = Seq("o_orderkey"), k = 3,
        maxKeysInMemory = 16)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn").collect()
    val window = q("window_rank").collect()
    assert(spilled.length === window.length)
    spilled.zip(window).foreach { case (s, w) =>
      assert(s.getAs[Long]("o_custkey") === w.getAs[Long]("o_custkey"))
      assert(s.getAs[Int]("rn") === w.getAs[Int]("rn"))
      assert(s.getAs[Long]("o_orderkey") === w.getAs[Long]("o_orderkey"))
    }
  }

  test("custom TopKPerKey plans as TopKPerKeyExec with a single hash exchange") {
    val plan = q("window_rank_custom").queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing in:\n$plan")
  }

  test("join_full_outer covers every customer from either status slice exactly once") {
    val df = q("join_full_outer")
    assert(df.groupBy("custkey").count().filter(col("count") > 1).count() === 0)
    // full-outer semantics: unmatched rows survive on BOTH sides
    assert(df.filter(col("f_orders") === 0 && col("p_orders") > 0).count() > 0,
      "expected P-only customers (right null-extension)")
    assert(df.filter(col("p_orders") === 0 && col("f_orders") > 0).count() > 0,
      "expected F-only customers (left null-extension)")
  }

  test("join_full_outer plan reuses the aggregation partitioning — no join exchange") {
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q("join_full_outer").queryExecution.executedPlan.toString
      // one hash exchange per aggregated side + the final ORDER BY range
      // exchange; the full-outer join itself rides the agg partitioning
      assert("Exchange".r.findAllIn(plan).length === 3, s"unexpected exchanges:\n$plan")
      assert(plan.contains("FullOuter"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("window_rank_family: empty-partition windows only over the |parts|-row aggregate") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q("window_rank_family").queryExecution.executedPlan
      val globalWindows = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(globalWindows.nonEmpty, "expected the offsets prefix-sum window")
      globalWindows.foreach { w =>
        assert(w.collectFirst { case a: BaseAggregateExec => a }.isDefined,
          s"a global window must sit above the per-range aggregate, not raw data:\n$w")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("window_running: running value equals sum of values per user at final row") {
    val df = q("window_running")
    val lastRunning = df.groupBy("user_id").agg(max("running_value").as("final_run"))
    val direct = Tables.events(spark, sf).groupBy("user_id")
      .agg(Det.moneySum(col("value")).as("direct"))
    val mism = lastRunning.join(direct, "user_id")
      .filter(abs(col("final_run") - col("direct")) > 1e-9).count()
    assert(mism === 0)
  }

  test("sessionize: session counts are bounded by event counts") {
    val bad = q("sessionize")
      .filter(col("n_sessions") < 1 || col("n_sessions") > col("n_events")).count()
    assert(bad === 0)
  }

  test("session_spans rows equal total sessions") {
    val spans = q("session_spans").count()
    val totalSessions = q("sessionize").agg(sum("n_sessions")).collect()(0).getLong(0)
    assert(spans === totalSessions)
  }

  test("time_tumbling: window counts sum to event count") {
    val total = q("time_tumbling").agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("session_window gap boundary is inclusive: an exact-gap event merges") {
    // pins the boundary the session_window_native oracle depends on (its
    // split rule is the lag formulation's strict >): user 1's second
    // event lands EXACTLY 30 min after the first and MERGES; user 2's
    // lands one microsecond past the gap and splits. The fixture's
    // timestamps never hit the tie, so only this constructed pair
    // distinguishes > from >=.
    import spark.implicits._
    val t0 = 1700000000000000L // epoch micros, arbitrary
    val gap = 1800L * 1000000L
    val df = Seq(
      (1L, t0), (1L, t0 + gap),
      (2L, t0), (2L, t0 + gap + 1L)).toDF("user_id", "us")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"))
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions(1L) === 1L, "exact-gap event must MERGE (inclusive gap)")
    assert(sessions(2L) === 2L, "event past the gap must start a new session")
  }
}
