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

  /** Rolling 7-day distinct active users (the DAU/WAU family): for each
    * calendar day, how many distinct users were active in the trailing
    * 7-day window. A `count(DISTINCT) OVER (RANGE 7 days)` window would
    * re-scan each window per day; the scale shape is CONTRIBUTION
    * EXPLODE — dedup (user, day) once, fan each active day out to the
    * ≤7 window days it contributes to (bounded in-row `sequence`), and
    * count distinct users per target day. Two key exchanges total
    * ((user, day) dedup; day gather with map-side partial dedup), both
    * on uniform keys, volume bounded at 7× the deduped user-days.
    * Trailing-window semantics: head days see a partial history; days
    * past the data's end are cut by the broadcast 1-row max-day bound. */
  def rollingDau(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val mx = ud.agg(max(col("d")).as("mxd"))
    ud.select(col("user_id"),
        explode(expr("sequence(d, date_add(d, 6))")).as("day"))
      .crossJoin(broadcast(mx))
      .filter(col("day") <= col("mxd"))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("dau7"))
      .orderBy("day")
  }

  val queries: Map[String, Q] = Map(
    "cohort_retention"  -> (cohortRetention _),
    "event_transitions" -> (eventTransitions _),
    "mode_per_segment"  -> (modePerSegment _),
    "rolling_dau"       -> (rollingDau _),
    "segment_gini"      -> (segmentGini _))

  val oracle: Map[String, String] = Map(
    "rolling_dau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |mx AS (SELECT max(d) AS mxd FROM ud),
        |c AS (SELECT user_id,
        |        CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
        |          CAST(d AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE)
        |          AS day
        |      FROM ud)
        |SELECT day, count(DISTINCT user_id) AS dau7
        |FROM c CROSS JOIN mx WHERE day <= mxd
        |GROUP BY day ORDER BY day""".stripMargin,
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
