package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each ops module contributes `queries` (name → builder)
  * and `oracle` (name → equivalent DuckDB SQL). Names and column aliases
  * are identical on both sides — the driver sorts columns by name and
  * hash-compares values.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed training-prep pipeline (gates → dedup → decontaminate
    * → split → chunk → pack → accounting, ONE Catalyst plan — SURVEY
    * E105) — the single query that exercises the most engine at once. */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreOps.queries ++ JoinOps.queries ++ WindowOps.queries ++
      TimeOps.queries ++ SemiOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimOps.queries ++ MultiModalOps.queries ++
      PipeOps.queries ++ Udx.queries ++ FileOps.queries ++ CurateOps.queries ++
      QualityOps.queries ++ MartOps.queries ++ WarehouseOps.queries ++
      GraphOps.queries ++ SeriesOps.queries ++ ProfileOps.queries ++
      BehaviorOps.queries ++ RetailOps.queries ++ MatchOps.queries ++
      SqlOps.queries ++ IrOps.queries ++ SketchOps.queries ++
      LayoutOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreOps.oracle ++ JoinOps.oracle ++ WindowOps.oracle ++
      TimeOps.oracle ++ SemiOps.oracle ++ TextOps.oracle ++
      DedupOps.oracle ++ SimOps.oracle ++ MultiModalOps.oracle ++
      PipeOps.oracle ++ Udx.oracle ++ FileOps.oracle ++ CurateOps.oracle ++
      QualityOps.oracle ++ MartOps.oracle ++ WarehouseOps.oracle ++
      GraphOps.oracle ++ SeriesOps.oracle ++ ProfileOps.oracle ++
      BehaviorOps.oracle ++ RetailOps.oracle ++ MatchOps.oracle ++
      SqlOps.oracle ++ IrOps.oracle ++ SketchOps.oracle ++
      LayoutOps.oracle
}
