package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over `events` (Q24/Q18 family, SURVEY.md
  * §2b): cohort retention, Markov transition matrices, and segment
  * impurity — the product-analytics queries a warehouse serves daily.
  * All determinism-sensitive ratios are a SINGLE IEEE division of two
  * exactly-computed integers (bit-identical across engines and across
  * any shuffle-merge order), never a float aggregation.
  */
object BehaviorOps {
  type Q = (SparkSession, String) => DataFrame

  /** Cohort retention: users are cohorted by first active day; each
    * (cohort, day-offset) cell counts users active that day. The SQL
    * formulation (the oracle) runs distinct-days → min-over-window —
    * two user-grid exchanges. Spark-first it is ONE exchange on
    * `user_id`: a map-side-deduping `collect_set(day)` gives each
    * user's distinct days in-row, the cohort is `array_min`, and the
    * explode back to (cohort, offset) rows happens after the shuffle.
    * Per-user state is the distinct-day array (calendar-bounded), the
    * day grid means `count(*)` IS distinct users, and the second
    * exchange is on the tiny (cohort, offset) domain. Plan-pinned. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(collect_set(col("d")).as("ds"))
      .select(array_min(col("ds")).as("cohort"), explode(col("ds")).as("d"))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort", "day_offset")

  /** First-order Markov transition matrix of event types: one `lead`
    * window pass per user, then a grouped count over the (from, to)
    * domain (|types|² rows). Transition probability = n / row-total —
    * two exact longs, one IEEE division, so the doubles hash-match.
    * The probability normalization runs as a window over the tiny
    * counts table, not a second pass over the data. */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("from_type")).cast("double"))
      .orderBy("from_type", "to_type")
  }

  /** Per-segment Gini impurity of the event-type mix (day-of-week
    * segments, ISO numbering on both engines). The naive Σ(nᵢ/N)² sums
    * doubles — merge-order-dependent in the last ulp — so it is
    * restated as 1 − Σnᵢ²/N²: both Σnᵢ² and N² are exact LONG
    * arithmetic and the single final division is IEEE-deterministic.
    * Two keyed aggregations, the second over |segments|×|types| rows. */
  def segmentGini(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("dow", (weekday(col("ts")) + lit(1)).cast("long"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("dow"))
      .agg(sum(col("n")).as("n_events"), sum(col("n") * col("n")).as("sumsq"))
      .select(col("dow"), col("n_events"),
        (lit(1.0) - col("sumsq").cast("double") /
          (col("n_events") * col("n_events")).cast("double")).as("gini"))
      .orderBy("dow")

  /** Exact per-segment mode (most frequent event type per ISO weekday)
    * with a DETERMINISTIC tiebreak — `mode()` builtins leave ties
    * unspecified, so both sides state the same count-then-rank
    * formulation: grouped counts (map-side combined), then a
    * row_number window over the tiny |segments|×|types| counts table.
    * The heavy pass is the count; the ranking never touches raw rows. */
  def modePerSegment(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .withColumn("dow", (weekday(col("ts")) + lit(1)).cast("long"))
      .groupBy("dow", "event_type")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("dow")
      .orderBy(col("n").desc, col("event_type").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("dow"), col("event_type").as("mode_type"), col("n"))
      .orderBy("dow")
  }

  val queries: Map[String, Q] = Map(
    "cohort_retention"  -> (cohortRetention _),
    "event_transitions" -> (eventTransitions _),
    "mode_per_segment"  -> (modePerSegment _),
    "segment_gini"      -> (segmentGini _))

  val oracle: Map[String, String] = Map(
    "mode_per_segment" ->
      """WITH c AS (SELECT isodow(ts) AS dow, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT dow, event_type, n, row_number() OVER (
        |        PARTITION BY dow ORDER BY n DESC, event_type ASC) AS rk
        |      FROM c)
        |SELECT dow, event_type AS mode_type, n
        |FROM r WHERE rk = 1 ORDER BY dow""".stripMargin,
    "cohort_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |w AS (SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cohort
        |      FROM days)
        |SELECT cohort, d - cohort AS day_offset, count(*) AS n_active
        |FROM w GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,
    "event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
        |    AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "segment_gini" ->
      """WITH c AS (SELECT isodow(ts) AS dow, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT dow, CAST(sum(n) AS BIGINT) AS n_events,
        |             CAST(sum(n * n) AS BIGINT) AS sumsq
        |      FROM c GROUP BY 1)
        |SELECT dow, n_events,
        |  1.0 - CAST(sumsq AS DOUBLE) / CAST(n_events * n_events AS DOUBLE) AS gini
        |FROM s ORDER BY dow""".stripMargin)
}
