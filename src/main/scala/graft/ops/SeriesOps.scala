package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completions of the Q24 family (SURVEY.md §2b): sliding
  * (hopping) windows, date-spine gap filling with LOCF, and
  * gaps-and-islands run detection. All three are single-exchange shapes:
  * the window key (`event_type` / `user_id`) is the only shuffle key, so
  * at 100 TB they scale with key cardinality, never with row count per
  * partition beyond one group.
  */
object SeriesOps {
  type Q = (SparkSession, String) => DataFrame

  /** Q24 sliding/hopping windows: 1-hour windows advancing every 15
    * minutes, so each event lands in exactly 4 overlapping windows.
    * Spark's `window(ts, size, slide)` explodes the assignment map-side
    * (bounded ×(size/slide) row growth — a constant, unlike a
    * grid-join), then aggregates with map-side combine; epoch-aligned
    * starts match the oracle's integer-microsecond truncation exactly.
    */
  def hoppingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))
      .orderBy("win_start", "event_type")

  /** Q24 date-spine gap fill + last-observation-carried-forward: the
    * dense hour × event_type grid, hours with no events zero-counted and
    * their metric carried forward from the last observed hour (the
    * standard time-series regularization before resampling/joining).
    *
    * Scale shape: the spine derives from a 1-row global min/max
    * aggregate and explodes on an executor — hours × types rows (a grid
    * of key-domain size, NOT data size; 10 years × 1 M types ≈ 90 G rows
    * is still explodable because `sequence` is lazy per row). The join
    * back to the hourly partials is an equi-join on (hour, type), and the
    * LOCF pass is one `last(..., ignoreNulls)` window per type — no
    * self-join against history.
    */
  def timeGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n_raw"), Det.moneySum(col("value")).as("sum_value"))
    val spine = ev
      .agg(min(date_trunc("hour", col("ts"))).as("lo"),
        max(date_trunc("hour", col("ts"))).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val grid = spine.crossJoin(ev.select(col("event_type")).distinct())
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("h", "event_type"), "left_outer")
      .withColumn("locf_sum",
        coalesce(last(col("sum_value"), ignoreNulls = true).over(w), lit(0.0)))
      .select(col("h"), col("event_type"),
        coalesce(col("n_raw"), lit(0L)).as("n"), col("locf_sum"))
      .orderBy("h", "event_type")
  }

  /** Q24 gaps-and-islands: per user, maximal runs of consecutive active
    * days. The classic SQL does `date − row_number()` anchoring — a
    * distinct on (user, day), a window pass, and two more aggregations:
    * four exchanges (the oracle keeps that formulation). Spark-first,
    * the whole per-user computation fits in ONE exchange: a map-side-
    * deduping `collect_set(day)` groups each user's distinct days into
    * a row, and islands fall out of an in-row sorted fold
    * (`zip_with` day-gaps + `aggregate` run-length scan). Per-user
    * state is the distinct-day array — bounded by calendar history
    * (≤ a few thousand), never by event count — so the shape holds at
    * 100 TB where the window variant would shuffle the day grid twice
    * more. Plan-pinned: exactly one hash exchange, no Window.
    */
  def gapsIslands(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("d"))).as("ds"))
      .withColumn("gaps", expr(
        "zip_with(slice(ds, 2, size(ds) - 1), slice(ds, 1, size(ds) - 1), (a, b) -> datediff(a, b))"))
      .select(
        col("user_id"),
        expr("CAST(size(filter(gaps, g -> g > 1)) + 1 AS BIGINT)").as("n_islands"),
        expr("""aggregate(gaps,
                named_struct('cur', CAST(1 AS BIGINT), 'best', CAST(1 AS BIGINT)),
                (acc, g) -> named_struct(
                  'cur',  IF(g = 1, acc.cur + 1, CAST(1 AS BIGINT)),
                  'best', GREATEST(acc.best, IF(g = 1, acc.cur + 1, CAST(1 AS BIGINT)))),
                acc -> acc.best)""").as("longest_run"))
      .orderBy("user_id")

  /** Exponentially-weighted moving average of per-user daily activity,
    * over each user's last 7 active days. EWMA's textbook recurrence is
    * sequential; the DYADIC restatement keeps it exact and parallel:
    * α = 1/2 makes every weight a power of two, so the weighted sum
    * Σ cₖ·2^(6−k) is pure LONG arithmetic (merge-order-free, no float
    * accumulation), normalized by the sum of the weights actually
    * present, with ONE IEEE division at the end — hash-identical in any
    * engine. Seven lags share one window spec ⇒ one user-key exchange,
    * one sort. */
  def ewmaDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("user_id").orderBy("d")
    def lagK(k: Int) = if (k == 0) col("c") else lag(col("c"), k).over(w)
    val num = (0 to 6).map(k => coalesce(lagK(k), lit(0L)) * lit(1L << (6 - k)))
      .reduce(_ + _)
    val den = (0 to 6).map(k =>
        when(lagK(k).isNotNull, lit(1L << (6 - k))).otherwise(lit(0L)))
      .reduce(_ + _)
    daily
      .select(col("user_id"), col("d"), col("c"),
        (num.cast("double") / den.cast("double")).as("ewma"))
      .orderBy("user_id", "d")
  }

  val queries: Map[String, Q] = Map(
    "hopping_window" -> (hoppingWindow _),
    "time_gap_fill"  -> (timeGapFill _),
    "gaps_islands"   -> (gapsIslands _),
    "ewma_daily"     -> (ewmaDaily _))

  private val ewmaSql: String = {
    val lags = (1 to 6).map(k => s"lag(c, $k) OVER w AS c$k").mkString(",\n|    ")
    val num = "c * 64" +
      (1 to 6).map(k => s" + coalesce(c$k, 0) * ${1L << (6 - k)}").mkString
    val den = "64" +
      (1 to 6).map(k => s" + CASE WHEN c$k IS NULL THEN 0 ELSE ${1L << (6 - k)} END")
        .mkString
    s"""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS c
       |               FROM events GROUP BY 1, 2),
       |l AS (SELECT user_id, d, c,
       |    $lags
       |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d))
       |SELECT user_id, d, c,
       |  CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS ewma
       |FROM l ORDER BY user_id, d""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "hopping_window" ->
      s"""SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
         |    - CAST(k AS BIGINT) * 900000000) AS win_start,
         |  event_type, count(*) AS n, ${Det.sqlMoneySum("value")} AS sum_value
         |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) ks
         |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "time_gap_fill" ->
      s"""WITH hourly AS (
         |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n_raw,
         |    ${Det.sqlMoneySum("value")} AS sum_value
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT min(date_trunc('hour', ts)) AS lo,
         |             max(date_trunc('hour', ts)) AS hi FROM events),
         |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
         |          FROM b),
         |grid AS (SELECT h, event_type FROM spine
         |         CROSS JOIN (SELECT DISTINCT event_type FROM events) et)
         |SELECT g.h AS h, g.event_type AS event_type,
         |  coalesce(n_raw, 0) AS n,
         |  coalesce(last_value(sum_value IGNORE NULLS) OVER (
         |    PARTITION BY g.event_type ORDER BY g.h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS locf_sum
         |FROM grid g LEFT JOIN hourly
         |  ON g.h = hourly.h AND g.event_type = hourly.event_type
         |ORDER BY h, event_type""".stripMargin,
    "ewma_daily" -> ewmaSql,
    "gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |i AS (SELECT user_id, d - CAST(row_number() OVER (
        |        PARTITION BY user_id ORDER BY d) AS INT) AS anchor FROM days),
        |g AS (SELECT user_id, anchor, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands, max(len) AS longest_run
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)
}
