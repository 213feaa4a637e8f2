package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution / fuzzy matching (Q26 family, SURVEY.md §2b; the
  * record-linkage step a dedup pipeline runs on identifier-like fields
  * where token sketches are useless — names, SKUs, URLs).
  */
object MatchOps {
  type Q = (SparkSession, String) => DataFrame

  /** Edit-distance-1 near-duplicate names via NEIGHBORHOOD BLOCKING:
    * every name emits one key per character position with that position
    * masked; two names collide on a key iff they agree everywhere
    * except the masked position, i.e. iff they are exactly one
    * SUBSTITUTION apart — so the candidate set is exact for distance-1
    * substitutions, never O(n²). Each record emits L keys (L = the
    * 9-digit suffix of `c_name`), buckets are alphabet-bounded (≤10
    * names: one per digit), pairs explode IN-ROW from the sorted bucket
    * array, and the `levenshtein(a,b) = 1` filter is the standard
    * verify step of a block-then-verify matcher (Spark's builtin and
    * DuckDB's agree on edit-distance semantics — the oracle runs the
    * same blocked join as SQL). One exchange on the masked key; the
    * report aggregates pair counts per masked position.
    *
    * A pair differing in exactly one position collides under exactly
    * one mask, so no cross-mask dedup pass is needed — the same
    * property that makes the deletion-neighborhood method (FastSS) safe
    * to aggregate without a distinct. */
  def fuzzyNamePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = graft.Tables.spreadCompactSource(Tables.customer(spark, sfDir))
      // guarded compact-source spread (the minhashLsh rationale): the
      // L-way masked-key explode + bucket collect is the operator's CPU
      // bulk and would otherwise run inside the one-split scan's task
      .select(col("c_name").as("name"))
      .select(col("name"), explode(expr(
        """transform(sequence(10, 18), p -> struct(p AS pos,
          |  concat(substring(name, 1, p - 1), '_',
          |         substring(name, p + 1, length(name))) AS k))""".stripMargin))
        .as("e"))
      .select(col("e.pos").as("pos"), col("e.k").as("k"), col("name"))
    val buckets = keyed.groupBy("pos", "k")
      .agg(sort_array(collect_set(col("name"))).as("names"))
      .filter(size(col("names")) > 1)
    buckets.select(col("pos"), explode(expr(
        """flatten(transform(names, (x, i) ->
          |  transform(slice(names, i + 2, size(names) - i - 1),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("pos"), col("p.a").as("a"), col("p.b").as("b"))
      .filter(levenshtein(col("a"), col("b")) === 1)
      .groupBy("pos")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("pos")
  }

  val queries: Map[String, Q] = Map(
    "fuzzy_name_pairs" -> (fuzzyNamePairs _))

  val oracle: Map[String, String] = Map(
    "fuzzy_name_pairs" ->
      """WITH pos AS (SELECT unnest(range(10, 19)) AS p),
        |k AS (SELECT p AS pos,
        |        substr(c_name, 1, CAST(p AS INT) - 1) || '_' ||
        |          substr(c_name, CAST(p AS INT) + 1) AS k,
        |        c_name AS name
        |      FROM customer CROSS JOIN pos),
        |pr AS (SELECT a.pos, a.name AS x, b.name AS y
        |       FROM k a JOIN k b
        |         ON a.pos = b.pos AND a.k = b.k AND a.name < b.name)
        |SELECT pos, count(*) AS n_pairs
        |FROM pr WHERE levenshtein(x, y) = 1
        |GROUP BY pos ORDER BY pos""".stripMargin)
}
