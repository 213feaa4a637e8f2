package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data quality gates beyond the basic text stats (north-star
  * LLM-pipeline operators): repetition signals of the Gopher/C4 family,
  * corpus-language-model typicality scoring, and PII-style redaction /
  * pseudonymization. Everything is exact integer arithmetic plus single
  * IEEE divisions, so each query is fully DuckDB-oracle-checked.
  *
  * Scale notes (100 TB):
  *   - [[repSignals]] is one narrow map (array-side bigram/distinct
  *     counts) plus one doc-keyed aggregate for the token mode — shuffle
  *     volume is (doc, token) partial counts, collapsed map-side.
  *   - [[unigramLmScore]] builds the vocabulary with a map-side-combined
  *     count and joins it back UNHINTED: Catalyst's size estimate + AQE
  *     broadcast the vocab while it fits `autoBroadcastJoinThreshold`
  *     (the corpus side then never shuffles) and fall back to a shuffle
  *     join on `token` — already the natural key — when the vocabulary
  *     outgrows it (billions of distinct tokens at 100 TB under Zipf; a
  *     forced hint would OOM there). Both plan regimes are pinned by
  *     VocabJoinFallbackSpec.
  *   - [[piiRedact]] is a pure narrow map — regex passes run inside
  *     whole-stage codegen, no shuffle at all.
  */
object QualityOps {
  type Q = (SparkSession, String) => DataFrame

  private def toks: Column = split(col("text"), " ")

  /** Gopher-style repetition signals per document:
    *   - `top_token_ratio`: frequency of the modal token / token count
    *     (catches "the the the ..." degeneracy),
    *   - `dup_token_ratio`: 1 − distinct/total tokens,
    *   - `dup_bigram_ratio`: 1 − distinct/total bigrams (catches looped
    *     phrases that distinct-token ratios miss).
    * Bigrams are formed array-side with the shifted-slice `zip_with`
    * trick (one evaluation of the token array per row — see
    * [[TextOps.docShingleSketch]] for why `element_at` in a lambda is
    * quadratic). Ratios are exact integer counts with one final IEEE
    * division, so they hash-compare exactly. */
  def repSignals(spark: SparkSession, sfDir: String): DataFrame = {
    val perTok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("mx"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), toks.as("t"), size(toks).as("n"))
      .filter(col("n") >= 2)
      .withColumn("bg", zip_with(
        slice(col("t"), lit(1), (col("n") - 1).cast("int")),
        slice(col("t"), lit(2), (col("n") - 1).cast("int")),
        (a, b) => concat_ws(" ", a, b)))
      .join(perTok, "doc_id")
      .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        (col("mx").cast("double") / col("n")).as("top_token_ratio"),
        ((col("n") - size(array_distinct(col("t")))).cast("double") / col("n"))
          .as("dup_token_ratio"),
        ((col("n") - 1 - size(array_distinct(col("bg")))).cast("double") / (col("n") - 1))
          .as("dup_bigram_ratio"))
      .orderBy("doc_id")
  }

  /** Corpus-unigram-LM typicality score: mean corpus probability of the
    * document's tokens, Σ count(tok) / (n_tokens · total_tokens), plus
    * the rarest-token count. The natural-log perplexity formulation is
    * deliberately avoided: `ln` is not IEEE-exactly-specified and differs
    * across engines in the last ulp, while this rational form is integer
    * sums with one final division — bit-identical everywhere. Low
    * `mean_tok_prob` / low `min_tok_count` = atypical/rare-vocabulary
    * documents, the same ranking a unigram logprob gives at the tails. */
  def unigramLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(toks).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).cast("long").as("total"))
    tok.join(vocab, "token")
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("sum_c"), count(lit(1)).as("n"),
        min(col("c")).as("min_tok_count"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n").as("n_tokens"),
        (col("sum_c").cast("double") / (col("n") * col("total"))).as("mean_tok_prob"),
        col("min_tok_count"))
      .orderBy("doc_id")
  }

  /** PII-style redaction + pseudonymization over a log-line projection of
    * `events`: emails → `<EMAIL>`, IPv4 → `<IP>`, remaining 3+-digit runs
    * → `<NUM>` (three ordered regex passes — order matters, an email
    * contains digit runs), and the stable join key survives as an md5
    * pseudonym instead of the raw id. The regexes stick to character
    * classes + bounded repetition, the portable core of Java and RE2
    * syntax. Narrow map, codegen'd end to end. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("msg", concat(
        lit("user "), col("user_id"),
        lit(" (user"), col("user_id"), lit("@mail.example) sent "),
        col("event_type"),
        lit(" from 10."), col("user_id") % 256, lit(".0."), col("event_id") % 256))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("msg"), "[a-zA-Z0-9_]+@[a-zA-Z0-9.]+", "<EMAIL>"),
            "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+", "<IP>"),
          "[0-9]{3,}", "<NUM>"))
      .withColumn("user_pseudonym", substring(md5(col("user_id").cast("string")), 1, 8))
      .select(col("event_id"), col("user_pseudonym"), col("redacted"))
      .orderBy("event_id")

  /** Misra–Gries candidate pass: one k-counter summary per partition,
    * emitted as the partition's candidate token set. Guarantee (used by
    * [[heavyHitters]]): any token with GLOBAL frequency > total/k has
    * partition frequency > partition_total/k in at least one partition
    * (pigeonhole), and MG(k) never evicts such a token — so the union of
    * per-partition candidates is a superset of the true heavy hitters.
    * O(k) memory per partition, zero shuffle. */
  def mgCandidates(tokens: DataFrame, k: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    tokens.select(col(tokens.columns(0)).cast("string")).as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (counters.contains(t)) counters(t) += 1L
          else if (counters.size < k) counters(t) = 1L
          else {
            // decrement-all; evict zeros (the classic MG step)
            val dead = List.newBuilder[String]
            counters.mapValuesInPlace((_, v) => v - 1L)
            counters.foreach { case (key, v) => if (v <= 0L) dead += key }
            dead.result().foreach(counters.remove)
          }
        }
        counters.keysIterator
      }
      .toDF("token").distinct()
  }

  /** Exact heavy hitters at threshold total/k via sketch-then-verify —
    * the 100 TB shape for "which tokens dominate the corpus": pass 1 is
    * the shuffle-free [[mgCandidates]] map-side summary (k counters per
    * partition, candidates ≤ k · partitions rows however large the
    * corpus), pass 2 semi-joins the token stream against the BROADCAST
    * candidate set and counts exactly. Because the sketch provably never
    * misses a true heavy hitter and the verify pass filters exactly, the
    * result is the EXACT answer — deterministic whatever the
    * partitioning, so it is fully oracle-checked against the plain
    * group-by-having formulation a small engine can afford. */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 50
    val tok = Tables.documents(spark, sfDir)
      .select(explode(toks).as("token"))
    val cand = mgCandidates(tok, k)
    val total = tok.agg(count(lit(1)).as("total"))
    tok.join(broadcast(cand), "token")
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * k > col("total"))
      .select(col("token"), col("n"),
        (col("n").cast("double") / col("total")).as("share"))
      .orderBy(col("n").desc, col("token").asc)
  }

  /** Statistical anomaly gate: per customer segment, flag orders whose
    * price sits more than 2.5σ from the segment mean — the numeric-column
    * outlier check a data-quality pipeline runs on every load. Two
    * aggregate-shaped passes: segment stats (count / exact-decimal sum /
    * quantized sum of squares), then a broadcast of the segment-cardinality
    * stats table back over the fact to count exceedances — the fact table
    * never shuffles for the second pass.
    *
    * Float determinism: Σx is the exact-decimal money sum; Σx² is
    * quantized to 1/16 via `floor(x²·16)` summed in DECIMAL(38,0) — the
    * binary fixed-point trick ([[GraphOps.graphPagerank]]): ·16 and /16
    * are IEEE-exact, floor is engine-identical, the integer sum is exact
    * at any merge order and any SF. The 1/16 quantization shifts σ by
    * <1e-6 relative — irrelevant to a 2.5σ gate and identical in both
    * engines, which is what the hash compare needs. */
  def outlierZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val oc = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_totalprice").as("price"))
    val stats = oc.groupBy("segment").agg(
        count(lit(1)).as("n_orders"),
        sum(col("price").cast("decimal(18,2)")).as("s1"),
        sum(floor(col("price") * col("price") * lit(16.0)).cast("decimal(38,0)"))
          .as("s2q"))
      .withColumn("mean_price", col("s1").cast("double") / col("n_orders").cast("double"))
      .withColumn("sd_price",
        sqrt((col("s2q").cast("double") / lit(16.0) -
          col("n_orders").cast("double") * col("mean_price") * col("mean_price")) /
          (col("n_orders") - lit(1)).cast("double")))
      .select("segment", "n_orders", "mean_price", "sd_price")
    oc.join(broadcast(stats), "segment")
      .withColumn("z", (col("price") - col("mean_price")) / col("sd_price"))
      .groupBy("segment")
      .agg(count(when(abs(col("z")) > 2.5, lit(1))).as("n_outliers"),
        max(abs(col("z"))).as("max_abs_z"))
      .join(stats, "segment")
      .select("segment", "n_orders", "mean_price", "sd_price",
        "n_outliers", "max_abs_z")
      .orderBy("segment")
  }

  /** Quality-gate FUNNEL — the per-rule attrition report of an ordered
    * filter pipeline (the Gopher/C4-style rule chain a curation run
    * applies before dedup): for each rule, how many documents fail it in
    * isolation, and how many survive the pipeline up to and including it.
    * Rules (all exact integer comparisons — no float thresholds to
    * drift):
    *   1. `token_count_bounds`   — 20 ≤ n_tokens ≤ 90,
    *   2. `mean_word_len_bounds` — 4·n ≤ total_word_chars ≤ 5·n
    *      (total_word_chars = n_chars − (n − 1) separators),
    *   3. `stopword_presence`    — contains BOTH 'the' and 'a',
    *   4. `distinct_token_ratio` — 5·distinct ≥ 2·n (dup ratio ≤ 0.6).
    *
    * Scale shape: ONE corpus scan computes every per-doc boolean inside
    * whole-stage codegen (array ops on the split — no token explode, no
    * shuffle), then ONE global aggregate of eight conditional counts
    * (partial map-side, 1-row result); the 4-row funnel is exploded from
    * that single row. At 100 TB this is scan-bound by construction. */
  def filterFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.documents(spark, sfDir)
      .select(size(toks).cast("long").as("n"),
        (col("n_chars") - size(toks) + 1).cast("long").as("chars"),
        (array_contains(toks, "the") && array_contains(toks, "a")).as("stopok"),
        size(array_distinct(toks)).cast("long").as("d"))
      .select((col("n") >= 20 && col("n") <= 90).as("r1"),
        (col("chars") >= col("n") * 4 && col("chars") <= col("n") * 5).as("r2"),
        col("stopok").as("r3"),
        (col("d") * 5 >= col("n") * 2).as("r4"))
    val agg = per.agg(
      count(when(!col("r1"), 1)).as("f1"),
      count(when(!col("r2"), 1)).as("f2"),
      count(when(!col("r3"), 1)).as("f3"),
      count(when(!col("r4"), 1)).as("f4"),
      count(when(col("r1"), 1)).as("c1"),
      count(when(col("r1") && col("r2"), 1)).as("c2"),
      count(when(col("r1") && col("r2") && col("r3"), 1)).as("c3"),
      count(when(col("r1") && col("r2") && col("r3") && col("r4"), 1)).as("c4"))
    agg.select(explode(array(
        struct(lit(1L).as("rule_rank"), lit("token_count_bounds").as("rule_name"),
          col("f1").as("n_fail_rule"), col("c1").as("n_pass_cum")),
        struct(lit(2L).as("rule_rank"), lit("mean_word_len_bounds").as("rule_name"),
          col("f2").as("n_fail_rule"), col("c2").as("n_pass_cum")),
        struct(lit(3L).as("rule_rank"), lit("stopword_presence").as("rule_name"),
          col("f3").as("n_fail_rule"), col("c3").as("n_pass_cum")),
        struct(lit(4L).as("rule_rank"), lit("distinct_token_ratio").as("rule_name"),
          col("f4").as("n_fail_rule"), col("c4").as("n_pass_cum")))).as("r"))
      .select(col("r.rule_rank"), col("r.rule_name"),
        col("r.n_fail_rule"), col("r.n_pass_cum"))
      .orderBy("rule_rank")
  }

  val queries: Map[String, Q] = Map(
    "filter_funnel"    -> (filterFunnel _),
    "rep_signals"      -> (repSignals _),
    "unigram_lm_score" -> (unigramLmScore _),
    "pii_redact"       -> (piiRedact _),
    "heavy_hitters"    -> (heavyHitters _),
    "outlier_zscore"   -> (outlierZscore _))

  val oracle: Map[String, String] = Map(
    "filter_funnel" ->
      """WITH t AS (
        |  SELECT len(string_split(text, ' ')) AS n,
        |    n_chars - len(string_split(text, ' ')) + 1 AS chars,
        |    list_contains(string_split(text, ' '), 'the')
        |      AND list_contains(string_split(text, ' '), 'a') AS stopok,
        |    len(list_distinct(string_split(text, ' '))) AS d
        |  FROM documents),
        |r AS (SELECT (n BETWEEN 20 AND 90) AS r1,
        |    (chars BETWEEN 4 * n AND 5 * n) AS r2,
        |    stopok AS r3, (5 * d >= 2 * n) AS r4
        |  FROM t),
        |a AS (SELECT
        |    count(CASE WHEN NOT r1 THEN 1 END) AS f1,
        |    count(CASE WHEN NOT r2 THEN 1 END) AS f2,
        |    count(CASE WHEN NOT r3 THEN 1 END) AS f3,
        |    count(CASE WHEN NOT r4 THEN 1 END) AS f4,
        |    count(CASE WHEN r1 THEN 1 END) AS c1,
        |    count(CASE WHEN r1 AND r2 THEN 1 END) AS c2,
        |    count(CASE WHEN r1 AND r2 AND r3 THEN 1 END) AS c3,
        |    count(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 END) AS c4
        |  FROM r)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS rule_rank,
        |    'token_count_bounds' AS rule_name,
        |    CAST(f1 AS BIGINT) AS n_fail_rule, CAST(c1 AS BIGINT) AS n_pass_cum
        |  FROM a
        |  UNION ALL SELECT 2, 'mean_word_len_bounds', f2, c2 FROM a
        |  UNION ALL SELECT 3, 'stopword_presence', f3, c3 FROM a
        |  UNION ALL SELECT 4, 'distinct_token_ratio', f4, c4 FROM a)
        |ORDER BY rule_rank""".stripMargin,
    "outlier_zscore" ->
      """WITH oc AS (
        |  SELECT c_mktsegment AS segment, o_totalprice AS price
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |st AS (
        |  SELECT segment, count(*) AS n_orders,
        |    CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS s1d,
        |    CAST(SUM(CAST(FLOOR(price * price * 16.0) AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s2d
        |  FROM oc GROUP BY 1),
        |st2 AS (
        |  SELECT segment, n_orders, s1d / CAST(n_orders AS DOUBLE) AS mean_price,
        |    s2d, s1d
        |  FROM st),
        |st3 AS (
        |  SELECT segment, n_orders, mean_price,
        |    sqrt((s2d / 16.0 - CAST(n_orders AS DOUBLE) * mean_price * mean_price)
        |      / CAST(n_orders - 1 AS DOUBLE)) AS sd_price
        |  FROM st2),
        |fl AS (
        |  SELECT o.segment, (o.price - s.mean_price) / s.sd_price AS z
        |  FROM oc o JOIN st3 s USING (segment)),
        |agg AS (
        |  SELECT segment, count(CASE WHEN abs(z) > 2.5 THEN 1 END) AS n_outliers,
        |    max(abs(z)) AS max_abs_z
        |  FROM fl GROUP BY 1)
        |SELECT s.segment, s.n_orders, s.mean_price, s.sd_price,
        |  a.n_outliers, a.max_abs_z
        |FROM st3 s JOIN agg a USING (segment)
        |ORDER BY s.segment""".stripMargin,
    "rep_signals" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) x
        |  GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS mx FROM tf GROUP BY 1),
        |base AS (SELECT doc_id, len(tk) AS n,
        |    len(list_distinct(tk)) AS nd,
        |    len(list_distinct(list_transform(range(1, len(tk)),
        |      i -> tk[i] || ' ' || tk[i + 1]))) AS nbg
        |  FROM t WHERE len(tk) >= 2)
        |SELECT base.doc_id, CAST(base.n AS BIGINT) AS n_tokens,
        |  CAST(top.mx AS DOUBLE) / base.n AS top_token_ratio,
        |  CAST(base.n - base.nd AS DOUBLE) / base.n AS dup_token_ratio,
        |  CAST(base.n - 1 - base.nbg AS DOUBLE) / (base.n - 1) AS dup_bigram_ratio
        |FROM base JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,
    "unigram_lm_score" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |            FROM documents),
        |vocab AS (SELECT token, count(*) AS c FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab),
        |per AS (SELECT tk.doc_id, CAST(sum(v.c) AS BIGINT) AS sum_c,
        |    count(*) AS n, min(v.c) AS min_tok_count
        |  FROM tk JOIN vocab v USING (token) GROUP BY 1)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(sum_c AS DOUBLE) / (n * tot.total) AS mean_tok_prob,
        |  CAST(min_tok_count AS BIGINT) AS min_tok_count
        |FROM per, tot ORDER BY doc_id""".stripMargin,
    "heavy_hitters" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT count(*) AS total FROM tk)
        |SELECT token, count(*) AS n,
        |  CAST(count(*) AS DOUBLE) / tot.total AS share
        |FROM tk, tot GROUP BY token, tot.total
        |HAVING count(*) * 50 > tot.total
        |ORDER BY n DESC, token ASC""".stripMargin,
    "pii_redact" ->
      """WITH m AS (SELECT event_id,
        |    'user ' || user_id || ' (user' || user_id || '@mail.example) sent '
        |      || event_type || ' from 10.' || (user_id % 256) || '.0.'
        |      || (event_id % 256) AS msg,
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS user_pseudonym
        |  FROM events)
        |SELECT event_id, user_pseudonym,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(msg, '[a-zA-Z0-9_]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
        |      '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g'),
        |    '[0-9]{3,}', '<NUM>', 'g') AS redacted
        |FROM m ORDER BY event_id""".stripMargin)
}
