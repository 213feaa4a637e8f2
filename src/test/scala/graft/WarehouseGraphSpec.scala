package graft

import org.apache.spark.sql.functions._

/** Properties for the round-5 warehouse/graph/classification operators
  * beyond the DuckDB hash gate: branch semantics of MERGE, interval
  * contiguity of SCD-2, algebraic equality of the partial-aggregate
  * merge, a brute-force triangle cross-check, and vote sanity for kNN. */
class WarehouseGraphSpec extends SparkSpec {

  test("merge_upsert: exactly one insert branch, keep+update partition the base") {
    val rows = q("merge_upsert").collect()
    val byAction = rows.groupBy(_.getAs[String]("action")).view.mapValues(_.length).toMap
    assert(byAction.getOrElse("insert", 0) === 1)
    val inserted = rows.filter(_.getAs[String]("action") == "insert").head
    assert(inserted.getAs[Long]("custkey") === -1L)
    assert(inserted.getAs[String]("name") === "NEW")
    val baseCount = Tables.customer(spark, sf).count()
    assert(byAction.getOrElse("keep", 0) + byAction.getOrElse("update", 0) === baseCount)
    // updated rows carry a real open position; kept rows carry the default
    rows.filter(_.getAs[String]("action") == "update")
      .foreach(r => assert(r.getAs[Long]("n_open") > 0))
    rows.filter(_.getAs[String]("action") == "keep")
      .foreach(r => assert(r.getAs[Long]("n_open") === 0))
  }

  test("scd2_intervals: versions are dense, intervals chain, one current row per key") {
    val rows = q("scd2_intervals").collect()
    rows.groupBy(_.getAs[Long]("custkey")).foreach { case (_, hist) =>
      val sorted = hist.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq === (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Any]("valid_to") === b.getAs[Any]("valid_from"))
        case _ =>
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) === 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
    }
  }

  test("partial_agg_merge: equals the direct single-pass aggregate exactly") {
    val merged = q("partial_agg_merge").collect()
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(merged.toSeq === direct.toSeq)
  }

  test("graph_triangles: matches the naive triple-join count on the small graph") {
    val row = q("graph_triangles").collect().head
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("x"), col("b.pk").as("y")).distinct().cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.y") === col("e2.x"))
      .join(e.as("e3"), col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .count()
    assert(row.getAs[Long]("n_triangles") === naive)
    assert(row.getAs[Long]("n_edges") === e.count())
    e.unpersist()
  }

  test("window_cume: ratios in (0,1], quartiles dense 1..4, cume monotone in rank") {
    val rows = q("window_cume").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("quartile") >= 1L && r.getAs[Long]("quartile") <= 4L)
      assert(r.getAs[Double]("pct_rank") >= 0.0 && r.getAs[Double]("pct_rank") <= 1.0)
      assert(r.getAs[Double]("cume") > 0.0 && r.getAs[Double]("cume") <= 1.0)
    }
    rows.groupBy(_.getAs[Long]("nationkey")).foreach { case (_, grp) =>
      // rows arrive ordered by (acctbal, custkey) within nation: cume and
      // quartile must be non-decreasing along that order
      grp.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("cume") <= b.getAs[Double]("cume"))
          assert(a.getAs[Long]("quartile") <= b.getAs[Long]("quartile"))
        case _ =>
      }
      assert(grp.last.getAs[Double]("cume") === 1.0)
    }
  }

  test("embed_knn_classify: one prediction per query, votes bounded by k") {
    val rows = q("embed_knn_classify").collect()
    val nQueries = Tables.embeddings(spark, sf).filter(col("vec_id") < 50).count()
    assert(rows.length === nQueries)
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length === rows.length)
    rows.foreach { r =>
      val v = r.getAs[Long]("n_votes")
      assert(v >= 1L && v <= 5L)
    }
    // majority vote can't be beaten by an unreported label: winner has
    // strictly more than k/2 votes OR ties were broken toward smaller
    // label — spot-check that at least some queries predict their own
    // true label (embeddings are label-clustered by construction)
    val acc = rows.count(r => r.getAs[Long]("pred_label") == r.getAs[Long]("true_label"))
    assert(acc > 0, "kNN should recover at least one true label on clustered fixtures")
  }

  test("dup_ngram_spans: every reported span occurs in >=2 docs and occ >= docs") {
    val rows = q("dup_ngram_spans").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2L)
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_docs"))
    }
  }
}
