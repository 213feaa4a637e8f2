package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch tier (SURVEY.md §2b Q10 approx-distinct family, scale
  * path): at 100 TB the right architecture for distinct-counting is NOT a
  * one-shot `approx_count_distinct` over the whole corpus — it is
  * per-partition (per-day / per-shard / per-type) SKETCHES that are
  * persisted small and UNION-MERGED later, so yesterday's sketch is never
  * recomputed and any slice roll-up is a register-wise max over a few KB
  * per group. Spark 4 exposes exactly this via the DataSketches HLL
  * functions: `hll_sketch_agg` (build, shuffles only the 2^lgK register
  * array per group), `hll_union_agg` (merge), `hll_sketch_estimate`.
  *
  * The query materializes the per-event-type user sketches once, emits
  * each group's estimate, and derives the GLOBAL distinct-user estimate by
  * merging those same five sketches — never rescanning the events table.
  * Both levels are approximate by semantics, so the row is registry
  * rows-only (like `approx_distinct`); its correctness story is
  * [[graft.ApproxBounds]] + SketchSpec:
  *
  *   - every estimate within 5% of its exact `count_distinct` twin
  *     (lgK=12 → rsd ≈ 1.04%, so the bound sits ≈ 5σ out);
  *   - the merged global estimate EQUALS the estimate of a sketch built
  *     directly over all users — HLL union is a register-wise max, the
  *     same fold the direct build performs, so merge-vs-direct is exact
  *     equality (not approximate agreement) at any partitioning. That
  *     equality is the mergeability contract the 100-TB architecture
  *     rests on.
  *
  * Reference anchor: the reference's reducer merges per-file partial
  * outputs into one result (Program.cs:365-378); a sketch union is that
  * same gather with an O(KB) mergeable state instead of raw rows.
  */
object SketchOps {
  type Q = (SparkSession, String) => DataFrame

  private val LgK = 12

  def hllUserSketches(spark: SparkSession, sfDir: String): DataFrame = {
    val perType = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(LgK)).as("sk"))
    // Reuse the 5-row sketch table for both levels: Catalyst inlines the
    // tiny aggregate twice; each branch is one exchange over 5 rows of
    // ~4 KB registers, so no checkpoint is warranted.
    val per = perType
      .select(col("event_type"), hll_sketch_estimate(col("sk")).as("approx_users"))
    val all = perType
      .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
      .select(lit("__ALL__").as("event_type"),
        hll_sketch_estimate(col("sk")).as("approx_users"))
    per.unionByName(all).orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "hll_sketch_union" -> (hllUserSketches _))

  // Approximate by semantics — no DuckDB hash oracle (rows-only check);
  // bounded against the exact twin in APPROX_BOUNDS.json and SketchSpec.
  val oracle: Map[String, String] = Map.empty
}
