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

  /** Shared quantized-ln fragment (the 2⁻²⁰ grid convention introduced
    * for [[IrOps]] BM25 — see its class doc for why `ln` needs it and
    * why the grid constant must be `CAST(1048576 AS DOUBLE)`): floored
    * onto a binary grid immediately after the log, so the one libm op
    * IEEE does not pin across engines is removed from every sum. */
  private def qln(x: String): String =
    s"CAST(FLOOR(LN(CAST($x AS DOUBLE)) * CAST(1048576 AS DOUBLE)) AS BIGINT)"

  /** Per-segment Shannon entropy of the event-type mix — the
    * information-theoretic twin of [[segmentGini]] (entropy is the
    * diversity signal a data-mixing pipeline monitors per slice).
    * Merge-order determinism: H = ln N − (Σ nᵢ·ln nᵢ)/N is restated
    * with the quantized ln, so Σ nᵢ·qln(nᵢ) is EXACT LONG arithmetic
    * (bounded: n·qln(n) < 6e5·2e7 ≈ 1e13 per cell at sf0.1, far under
    * 2⁶³) and the only float steps are two final IEEE divisions both
    * engines evaluate identically. Same two keyed aggregations as the
    * Gini query: the raw-event exchange, then |segments|×|types|. */
  def entropySegments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("dow", (weekday(col("ts")) + lit(1)).cast("long"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("dow"))
      .agg(sum(col("n")).as("n_events"),
        sum(expr(s"n * ${qln("n")}")).as("sumq"))
      .select(col("dow"), col("n_events"),
        expr(s"CAST(${qln("n_events")} AS DOUBLE) / CAST(1048576 AS DOUBLE)" +
          " - CAST(sumq AS DOUBLE)" +
          " / (CAST(n_events AS DOUBLE) * CAST(1048576 AS DOUBLE))")
          .as("entropy"))
      .orderBy("dow")

  /** χ² independence test of event type × ISO weekday — "is the event
    * mix stable across days?", the drift test run over every categorical
    * slice pair before a training-data refresh ships. One exchange over
    * raw events builds the |dow|×|types| contingency table; marginals
    * ride that ~35-row table as windows (never a second data pass) and
    * the output is a single summary row.
    *
    * Float determinism: each cell's (O·N − R·C)²/(N·R·C) is computed
    * entirely in DOUBLE — every factor cast BEFORE the first multiply.
    * Not in BIGINT: R·C reaches N², which wraps silently past 2⁶³ in
    * Spark (non-ANSI) but raises in DuckDB, so an int64 numerator
    * silently diverges from the oracle beyond ~3e9 events (≈sf500).
    * Double multiplies are correctly-rounded IEEE in both engines, so
    * the identical left-associated chain stays bit-equal at ANY scale
    * (exact below 2⁵³, identically-rounded above). The result is then
    * floor-quantized to the 2⁻²⁰ grid so the cross-cell SUM is
    * exact-integer (merge-order-free). */
  def chi2TypeDow(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.events(spark, sfDir)
      .withColumn("dow", (weekday(col("ts")) + lit(1)).cast("long"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val dev = "(CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)" +
      " - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))"
    val term = s"$dev * $dev" +
      " / (CAST(tot AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))"
    c.withColumn("rt", sum(col("n")).over(Window.partitionBy("dow")))
      .withColumn("ct", sum(col("n")).over(Window.partitionBy("event_type")))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy()))
      .withColumn("q",
        expr(s"CAST(FLOOR(($term) * CAST(1048576 AS DOUBLE)) AS BIGINT)"))
      .agg(max(col("tot")).as("n_events"),
        ((countDistinct(col("dow")) - 1) *
          (countDistinct(col("event_type")) - 1)).as("dof"),
        expr("CAST(SUM(q) AS DOUBLE) / CAST(1048576 AS DOUBLE)").as("chi2"))
  }

  /** Seasonal-baseline anomaly report: per (event type, calendar day),
    * the day's total value against that type's same-weekday mean, and
    * the TOP-3 days per type by that ratio — top-k rather than an
    * absolute threshold because daily totals concentrate as volume
    * grows (at sf0.1 no day strays 1.2× from its weekday baseline;
    * a fixed 1.5× gate is non-vacuous only on small samples). The heavy
    * pass is ONE exchange of raw events onto (type, day); baseline and
    * ranking are windows over the resulting |types|×|days| daily table
    * (~1.8k rows at any SF — calendar-bounded, so the query's shape
    * past the first aggregate is SF-invariant).
    *
    * `value` doubles are floor-quantized to 2⁻²⁰ fixed point BEFORE
    * summing (×2²⁰ is an exponent shift — exact; daily sums stay under
    * 2⁵³), so both aggregation levels are exact-integer; the mean/ratio
    * are a fixed two-division IEEE chain, making the rank ordering
    * bit-stable across engines (date tiebreak for exact ratio ties). */
  def seasonalAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        expr("CAST(FLOOR(value * CAST(1048576 AS DOUBLE)) AS BIGINT)").as("q"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("q")).as("s"))
      .withColumn("dow", (weekday(col("d")) + lit(1)).cast("long"))
    val w = Window.partitionBy("event_type", "dow")
    daily
      .withColumn("bs", sum(col("s")).over(w))
      .withColumn("bn", count(lit(1)).over(w))
      .withColumn("ratio", expr(
        "CAST(s AS DOUBLE) / (CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE))"))
      .withColumn("rk", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("ratio").desc, col("d").asc)))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("d"), col("rk").cast("long").as("rk"),
        expr("CAST(s AS DOUBLE) / CAST(1048576 AS DOUBLE)").as("actual"),
        expr("CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE) / CAST(1048576 AS DOUBLE)")
          .as("baseline"),
        col("ratio"))
      .orderBy("event_type", "rk")
  }

  val queries: Map[String, Q] = Map(
    "chi2_type_dow"     -> (chi2TypeDow _),
    "cohort_retention"  -> (cohortRetention _),
    "entropy_segments"  -> (entropySegments _),
    "event_transitions" -> (eventTransitions _),
    "mode_per_segment"  -> (modePerSegment _),
    "rolling_dau"       -> (rollingDau _),
    "seasonal_anomaly"  -> (seasonalAnomaly _),
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
        |FROM s ORDER BY dow""".stripMargin,
    "entropy_segments" ->
      s"""WITH c AS (SELECT isodow(ts) AS dow, event_type, count(*) AS n
         |           FROM events GROUP BY 1, 2),
         |s AS (SELECT dow, CAST(sum(n) AS BIGINT) AS n_events,
         |             CAST(sum(n * ${qln("n")}) AS BIGINT) AS sumq
         |      FROM c GROUP BY 1)
         |SELECT dow, n_events,
         |  CAST(${qln("n_events")} AS DOUBLE) / CAST(1048576 AS DOUBLE)
         |  - CAST(sumq AS DOUBLE)
         |    / (CAST(n_events AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS entropy
         |FROM s ORDER BY dow""".stripMargin,
    "chi2_type_dow" ->
      """WITH c AS (SELECT isodow(ts) AS dow, event_type, count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |m AS (SELECT dow, event_type, n,
        |        CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS rt,
        |        CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS ct,
        |        CAST(sum(n) OVER () AS BIGINT) AS tot
        |      FROM c)
        |SELECT CAST(max(tot) AS BIGINT) AS n_events,
        |  CAST((count(DISTINCT dow) - 1) * (count(DISTINCT event_type) - 1)
        |    AS BIGINT) AS dof,
        |  CAST(CAST(SUM(CAST(FLOOR((
        |      (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)
        |        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)
        |        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |      / (CAST(tot AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)))
        |      * CAST(1048576 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / CAST(1048576 AS DOUBLE) AS chi2
        |FROM m""".stripMargin,
    "seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(FLOOR(value * CAST(1048576 AS DOUBLE)) AS BIGINT))
        |      AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, d, s,
        |    CAST(sum(s) OVER (PARTITION BY event_type, isodow(d)) AS BIGINT) AS bs,
        |    CAST(count(*) OVER (PARTITION BY event_type, isodow(d)) AS BIGINT) AS bn
        |  FROM daily),
        |r AS (SELECT event_type, d, s, bs, bn,
        |    CAST(s AS DOUBLE) / (CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE)) AS ratio
        |  FROM w),
        |t AS (SELECT event_type, d, s, bs, bn, ratio,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ratio DESC, d ASC) AS rk
        |  FROM r)
        |SELECT event_type, d, rk,
        |  CAST(s AS DOUBLE) / CAST(1048576 AS DOUBLE) AS actual,
        |  CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE) / CAST(1048576 AS DOUBLE)
        |    AS baseline,
        |  ratio
        |FROM t WHERE rk <= 3
        |ORDER BY event_type, rk""".stripMargin)
}
