package graft

import graft.plans.{GraftExtensions, TopKPerKeyStrategy, TopKRewriteRule}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions tier: the window-top-K rewrite rule turns
  * the row_number idiom into the custom TopKPerKeyExec without changing
  * query text. The shared test session can't be rebuilt with
  * `withExtensions` (getOrCreate returns the existing session), so the
  * rule/strategy are installed through the equivalent `experimental`
  * hooks — the same objects GraftExtensions injects — and removed again
  * afterwards. */
class ExtensionsSpec extends SparkSpec {

  private def windowTopK = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  test("TopKRewriteRule rewrites row_number+filter into TopKPerKeyExec, same results") {
    val baseline = windowTopK.collect()
    val prevStrategies = spark.experimental.extraStrategies
    val prevOpts = spark.experimental.extraOptimizations
    spark.experimental.extraStrategies = prevStrategies :+ TopKPerKeyStrategy
    spark.experimental.extraOptimizations = prevOpts :+ TopKRewriteRule
    try {
      val df = windowTopK
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("Window ["), s"window exec should be gone:\n$plan")
      assert(!plan.contains("WindowGroupLimit"),
        s"redundant group-limit (and its sorts) should be stripped:\n$plan")
      assert(!plan.contains(", false, 0"),
        s"no partition-local sort should remain below the heap exec:\n$plan")
      val rewritten = df.collect()
      assert(rewritten.length === baseline.length)
      rewritten.zip(baseline).foreach { case (r, b) =>
        assert(r.getAs[Long]("o_custkey") === b.getAs[Long]("o_custkey"))
        assert(r.getAs[Int]("rn") === b.getAs[Int]("rn"))
        assert(r.getAs[Long]("o_orderkey") === b.getAs[Long]("o_orderkey"))
      }
    } finally {
      spark.experimental.extraStrategies = prevStrategies
      spark.experimental.extraOptimizations = prevOpts
    }
  }

  test("rewrite is conservative: compound predicates and multi-expr windows untouched") {
    val prevStrategies = spark.experimental.extraStrategies
    val prevOpts = spark.experimental.extraOptimizations
    spark.experimental.extraStrategies = prevStrategies :+ TopKPerKeyStrategy
    spark.experimental.extraOptimizations = prevOpts :+ TopKRewriteRule
    try {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      // compound predicate — must stay a Window plan
      val compound = Tables.orders(spark, sf)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("o_totalprice") > 1000)
      assert(compound.queryExecution.executedPlan.toString.contains("Window"))
      // second window expression — must stay a Window plan
      val multi = Tables.orders(spark, sf)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .filter(col("rn") <= 3)
      assert(multi.queryExecution.executedPlan.toString.contains("Window"))
    } finally {
      spark.experimental.extraStrategies = prevStrategies
      spark.experimental.extraOptimizations = prevOpts
    }
  }

  test("GraftExtensions installs strategy and rule on a fresh extensions object") {
    // the builder accepts both injections without error; end-to-end
    // behavior of the same rule/strategy objects is covered by the tests
    // above (the build* accessors are private[sql], so a full
    // withExtensions session — impossible beside the shared test session —
    // is exercised in deployment, not here)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
