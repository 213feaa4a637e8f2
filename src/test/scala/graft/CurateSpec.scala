package graft

import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {

  private lazy val total = Tables.documents(spark, sf).count()

  test("curation pipeline only removes documents (never invents)") {
    val kept = q("curation_pipeline").agg(sum("n_docs")).collect()(0).getLong(0)
    assert(kept > 0 && kept <= total)
  }

  test("curation dedup plans through the TopKPerKey rewrite (extensions live)") {
    val plan = q("curation_pipeline").queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"keep-first dedup should be rewritten to the heap operator:\n$plan")
    assert(!plan.contains("Window ["), s"no window sort expected:\n$plan")
  }

  test("train/val split partitions every source exactly") {
    val df = q("train_val_split")
    val sums = df.agg(sum(col("n_train") + col("n_val"))).collect()(0).getLong(0)
    assert(sums === total)
    // the hash split actually lands in both partitions
    assert(df.agg(sum("n_val")).collect()(0).getLong(0) > 0)
    assert(df.agg(sum("n_train")).collect()(0).getLong(0) > 0)
  }

  test("decontamination removes at least the eval set's own members") {
    val clean = q("decontaminate").agg(sum("n_clean")).collect()(0).getLong(0)
    val evalDocs = Tables.documents(spark, sf).filter(col("doc_id") % 97 === 0).count()
    assert(clean <= total - evalDocs)
    assert(clean > 0)
  }

  test("stratified sample rates: en kept at roughly half the rate of others") {
    val counts = q("stratified_sample").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_sampled")).toMap
    val perLang = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    counts.foreach { case (lang, n) =>
      val frac = n.toDouble / perLang(lang)
      val target = if (lang == "en") 0.25 else 0.50
      // md5 bytes are uniform; at fixture sizes ±60% relative slack is ample
      assert(frac > target * 0.4 && frac < target * 1.6, s"$lang: $frac vs $target")
    }
  }

  test("split membership is a pure function of content (stable under repartition)") {
    val a = q("train_val_split").collect()
    val b = q("train_val_split").collect()
    assert(a.sameElements(b))
  }
}
