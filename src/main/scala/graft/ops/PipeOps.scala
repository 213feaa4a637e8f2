package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-command map — literal parity with the reference's operator
  * model, where the mapper body is an arbitrary shell command line run
  * against each input (`App.config:16`, `Program.cs:332-349`). Spark's
  * `RDD.pipe` is the same contract: lines in on stdin, lines out on
  * stdout, non-zero exit ⇒ task failure (the reference inspects exit
  * codes the same way, `Program.cs:440-456`).
  *
  * This is the one deliberate drop to the RDD layer (SURVEY.md §7) and is
  * isolated here. It's a narrow per-partition map — one external process
  * per partition, streaming, no shuffle — so it scales with executors
  * exactly like the reference's one-task-per-file fan-out, minus the
  * blob round-trips.
  */
object PipeOps {
  type Q = (SparkSession, String) => DataFrame

  /** Pipe every document line through `cat` (identity command) and count
    * the surviving lines — proves the subprocess plumbing end-to-end and
    * is oracle-checkable (texts are single-line, so lines == docs). */
  def pipeCatCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val piped = Tables.documents(spark, sfDir)
      .select(col("text")).as[String]
      .rdd.pipe("cat")
    spark.createDataset(piped).toDF("line")
      .agg(count(lit(1)).as("n_lines"))
  }

  /** Pipe through a real transforming command (`tr a-z A-Z`) and histogram
    * first characters of the output — shows data actually flows through
    * the external process, not just past it. */
  def pipeTrHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val piped = Tables.documents(spark, sfDir)
      .select(col("text")).as[String]
      .rdd.pipe(Seq("tr", "a-z", "A-Z"))
    spark.createDataset(piped).toDF("line")
      .select(substring(col("line"), 1, 1).as("first_char"))
      .groupBy("first_char")
      .agg(count(lit(1)).as("n"))
      .orderBy("first_char")
  }

  val queries: Map[String, Q] = Map(
    "pipe_cat_count"    -> (pipeCatCount _),
    "pipe_tr_histogram" -> (pipeTrHistogram _))

  val oracle: Map[String, String] = Map(
    "pipe_cat_count" ->
      "SELECT count(*) AS n_lines FROM documents",
    "pipe_tr_histogram" ->
      """SELECT upper(substring(text, 1, 1)) AS first_char, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY first_char""".stripMargin)
}
