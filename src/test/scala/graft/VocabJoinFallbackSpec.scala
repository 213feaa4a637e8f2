package graft

/** The vocabulary-sized join-backs (tfidf_top_terms df join, bigram_lm
  * denominator join, unigram_lm_score vocab join) carry NO forced
  * broadcast hint: under Zipf the vocabulary grows with the corpus, and a
  * forced hint would OOM driver/executors at 100 TB. The strategy choice
  * belongs to Catalyst's size estimate (+ AQE at runtime). These tests
  * pin BOTH regimes by moving `autoBroadcastJoinThreshold`: with the
  * default threshold the (small) vocab side broadcasts; with broadcast
  * disabled the plan must degrade to a shuffle join on the token key —
  * the scale fallback — not to a nested loop.
  */
class VocabJoinFallbackSpec extends SparkSpec {

  private def planWith(threshold: String, name: String): String = {
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    val thrWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    try q(name).queryExecution.executedPlan.toString
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thrWas)
    }
  }

  /** The equi-joins in these queries are all token-keyed; the only other
    * join shapes are the single-row cross joins (explicit, always-safe
    * broadcasts). So BroadcastHashJoin presence/absence isolates the
    * vocab join's strategy. */
  for (name <- Seq("tfidf_top_terms", "bigram_lm", "unigram_lm_score")) {
    test(s"$name: vocab side broadcasts below the size threshold") {
      val plan = planWith("10485760", name)
      assert(plan.contains("BroadcastHashJoin"),
        s"small vocab should broadcast under the default threshold in:\n$plan")
    }

    test(s"$name: vocab join degrades to a token-keyed shuffle join above the threshold") {
      val plan = planWith("-1", name)
      assert(!plan.contains("BroadcastHashJoin"),
        s"vocab join still broadcast with broadcasting disabled (forced hint?) in:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"no shuffle-join fallback for the vocab join in:\n$plan")
    }
  }
}
