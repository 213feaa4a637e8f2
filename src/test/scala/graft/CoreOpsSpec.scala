package graft

import org.apache.spark.sql.functions._

class CoreOpsSpec extends SparkSpec {

  test("scan_project returns lineitem-shaped rows in key order") {
    val rows = q("scan_project").limit(5).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).sameElements(rows.map(_.getLong(0)).sorted))
  }

  test("filter_predicate only returns matching rows") {
    val df = q("filter_predicate")
    assert(df.filter(col("l_returnflag") =!= "R" || col("l_quantity") <= 45).count() === 0)
    assert(df.count() > 0)
  }

  test("global_agg row count matches table count") {
    val row = q("global_agg").collect()(0)
    val n = Tables.lineitem(spark, sf).count()
    assert(row.getAs[Long]("n_rows") === n)
  }

  test("group_agg counts partition the table") {
    val total = q("group_agg").agg(sum("count_order")).collect()(0).getLong(0)
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("group_having: every surviving group exceeds the threshold") {
    assert(q("group_having").filter(col("sum_qty") <= 1000).count() === 0)
  }

  test("distinct_rows is idempotent and minimal") {
    val d = q("distinct_rows")
    assert(d.count() === d.distinct().count())
  }

  test("count_distinct matches groupBy cardinality") {
    val row = q("count_distinct").collect()(0)
    val parts = Tables.lineitem(spark, sf).select("l_partkey").distinct().count()
    assert(row.getAs[Long]("n_parts") === parts)
  }

  test("approx_distinct within 5% of exact") {
    val row = q("approx_distinct").collect()(0)
    val exact = Tables.lineitem(spark, sf).select("l_partkey").distinct().count()
    assert(math.abs(row.getAs[Long]("approx_parts") - exact) <= exact / 20 + 1)
  }

  test("quantiles_approx within 1% relative error of the exact quantiles") {
    val approx = q("quantiles_approx").collect()(0)
    val exact = q("quantiles").collect()(0)
    Seq("p50", "p90", "p99").foreach { c =>
      val a = approx.getAs[Double](c)
      val e = exact.getAs[Double](c)
      assert(math.abs(a - e) <= math.abs(e) * 0.01 + 1e-9, s"$c: approx $a vs exact $e")
    }
  }

  test("sort_total is totally ordered by (price desc, key asc)") {
    val rows = q("sort_total").collect()
    val pairs = rows.map(r => (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
    assert(pairs.sameElements(pairs.sorted))
  }

  test("topk returns exactly K of the global maxima") {
    val top = q("topk").collect()
    assert(top.length === 100)
    val kth = top.last.getAs[Double]("l_extendedprice")
    val higher = Tables.lineitem(spark, sf)
      .filter(col("l_extendedprice") > kth).count()
    assert(higher < 100)
  }

  test("histogram bin counts sum to table count") {
    val total = q("histogram").agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("rollup_agg grand total row equals table count") {
    val all = q("rollup_agg").filter(col("segment") === "(all)").collect()(0)
    assert(all.getAs[Long]("n_cust") === Tables.customer(spark, sf).count())
  }

  test("set ops: union ⊇ intersect; except disjoint from source") {
    val except = q("set_except")
    val have = Tables.orders(spark, sf).select(col("o_custkey").as("custkey"))
    assert(except.join(have, "custkey").count() === 0)
  }

  test("Observation metrics ride a pipeline without a second scan (O12 monitoring)") {
    // the observe() API is the Spark-native form of the reference's
    // task-progress monitoring (Program.cs:397-425): metrics accumulate
    // on the executors DURING the action, no extra pass over the data
    val obs = org.apache.spark.sql.Observation("graft_obs")
    val li = Tables.lineitem(spark, sf)
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    val grouped = li.groupBy("l_returnflag").count().collect()
    val metrics = obs.get
    assert(metrics("n_rows") === Tables.lineitem(spark, sf).count())
    assert(grouped.map(_.getAs[Long]("count")).sum === metrics("n_rows"))
    val expectQty = Tables.lineitem(spark, sf)
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(metrics("sum_qty") === expectQty)
  }
}
