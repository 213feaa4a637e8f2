package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.ops.LayoutOps

/** MEASURED evidence for the Z-order layout claim: the same rows, the
  * same 2-D box predicate, three physical layouts — and the parquet scan
  * decodes a different number of rows in each. `numOutputRows` on the
  * scan node counts rows the reader actually DECODED (i.e. rows in row
  * groups whose min/max stats overlapped the pushed predicate — the
  * residual filter runs above the scan), so it is exactly the
  * data-skipping signal.
  *
  * Expected ordering, and why:
  * - unclustered (source order): quantity/price are uncorrelated with
  *   insertion order, every row group spans ~the full value range,
  *   nothing skips → decodes ≈ everything.
  * - linear sort on quantity: row groups are tight in quantity only; the
  *   box's quantity side (~20% of the range) prunes, its price side
  *   prunes nothing → decodes ≈ 20%.
  * - z-order on (quantity, price): row groups are tight boxes in BOTH
  *   dimensions → decodes toward the box AREA (~4%) plus Morton boundary
  *   overhead.
  */
class LayoutSpec extends SparkSpec {

  private def writeLayout(tag: String, files: Int)(shape: DataFrame => DataFrame): String =
    // keyed on the source fixture path like every cache dir (FileOps rule)
    graft.ops.FileOps.materializeOnce(spark, s"layoutspec_${files}_$tag", sf) { dir =>
      shape(Tables.lineitem(spark, sf)).write.mode("overwrite").parquet(dir)
    }

  /** Decoded-row count of the box scan over a parquet dir: run the
    * aggregate, then read the scan leaf's numOutputRows metric. AQE off
    * so the executed plan is the plain physical tree. */
  private def decodedRows(dir: String): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.read.parquet(dir)
        .filter(col("l_quantity") >= 10 && col("l_quantity") < 20 &&
          col("l_extendedprice") >= 20000 && col("l_extendedprice") < 40000)
        .agg(count(lit(1)))
      df.collect()
      val plan = df.queryExecution.executedPlan
      val scans = plan.collectLeaves().collect {
        case s: FileSourceScanExec => s
        case a: AdaptiveSparkPlanExec => a.executedPlan.collectLeaves()
          .collectFirst { case s: FileSourceScanExec => s }.get
      }
      assert(scans.nonEmpty, s"no parquet scan leaf in:\n$plan")
      scans.map(_.metrics("numOutputRows").value).sum
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("z-order layout skips row groups on BOTH box dimensions; linear sort on one; unclustered on none") {
    // all three layouts at the SAME chunk granularity — the comparison
    // is about ORDER, so the pruning unit must be held equal
    val files = LayoutOps.layoutFiles(spark)
    // unclustered: the source's own (orderkey-ish) order, re-chunked
    val unclustered = writeLayout("unclustered", files)(
      _.repartition(files))
    // linear: classic single-column sort layout
    val linear = writeLayout("linear", files)(
      _.repartitionByRange(files, col("l_quantity"))
        .sortWithinPartitions("l_quantity"))
    // z-order: the registry query's own layout pass
    val zorder = LayoutOps.materializeZorderLayout(spark, sf)

    val total = Tables.lineitem(spark, sf).count()
    val dUn = decodedRows(unclustered)
    val dLin = decodedRows(linear)
    val dZ = decodedRows(zorder)
    info(s"decoded rows — unclustered: $dUn / $total, linear: $dLin, zorder: $dZ")

    // unclustered layouts skip ~nothing: every chunk spans the range
    assert(dUn > (total * 0.9).toLong, s"unclustered unexpectedly pruned: $dUn of $total")
    // single-column sort prunes the quantity dimension only (~20% + chunk
    // boundary slop, never the price side)
    assert(dLin < (total * 0.45).toLong, s"linear sort pruned nothing: $dLin of $total")
    // z-order prunes BOTH dimensions: strictly better than the linear
    // sort with real margin, approaching the box's ~4% area
    assert(dZ < dLin / 2, s"zorder ($dZ) not materially better than linear ($dLin)")
    assert(dZ < (total * 0.25).toLong, s"zorder decoded $dZ of $total — no 2-D pruning")
  }

  test("zorder_skipping values are layout-invariant (equal the unclustered aggregate)") {
    // the layout changes WHICH row groups are decoded, never the result
    val fromZ = q("zorder_skipping").collect()
    val fromSrc = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 10 && col("l_quantity") < 20 &&
        col("l_extendedprice") >= 20000 && col("l_extendedprice") < 40000)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(20,2)")).cast("long").as("sum_qty"),
        graft.Det.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag").collect()
    assert(fromZ.toSeq === fromSrc.toSeq)
  }
}
