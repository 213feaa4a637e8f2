package graft.ops

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order clustering) for scan pruning —
  * the `OPTIMIZE ZORDER BY` capability of Delta/Iceberg, re-expressed
  * with nothing but Spark built-ins (SURVEY.md §2b Q1/Q14 scan tier;
  * reference egress `Program.cs:379-409` fixes ONE physical order at
  * sink time — this op is the scale answer to "which order?").
  *
  * Why it matters at 100 TB: parquet keeps min/max statistics per row
  * group, and the reader skips any row group whose stats exclude the
  * pushed predicate. A table sorted by ONE column prunes scans on that
  * column only; a query filtering two dimensions still decodes every row
  * group that matches the first. Interleaving the bits of BOTH sort keys
  * (the Z-order / Morton curve) makes each row group a tight HYPER-RECTANGLE
  * in (d1, d2) space, so a 2-D box predicate skips on both dimensions at
  * once — the scan cost falls toward the box's area fraction instead of
  * its widest side. The layout pass is one range-exchange + local sort
  * (exactly what a sort-based shuffle already does), embarrassingly
  * parallel, and pays for itself on every subsequent scan.
  *
  * Everything here is codegen'd built-ins: the bit-spread is the classic
  * mask-shift cascade (`shiftleft`/`&`/`|`), the write is
  * `repartitionByRange(zval) + sortWithinPartitions(zval)` — a plain
  * range exchange, no custom partitioner, no UDF. File count comes from
  * `spark.graft.layout.files` (the per-deployment knob: files ≈ cluster
  * write parallelism; row-group granularity then subdivides each file).
  */
object LayoutOps {
  type Q = (SparkSession, String) => DataFrame

  /** Bit-spread of a 16-bit value into the even bit positions of a
    * 32-bit lane (Morton encode half): the standard mask cascade,
    * expressed over LONG columns so every step is a codegen'd built-in. */
  private def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-value (Morton code) of two 16-bit grid coordinates: `a` on even
    * bits, `b` on odd. Rows close in z are close in BOTH dimensions. */
  def zorderValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** The two clustered dimensions, normalized onto full 10-bit grids.
    * The value ranges are SCALE-INVARIANT (quantity is 1–50 and price
    * ~900–105000 at every SF, so the grid — and the box predicates
    * below — need no per-SF constants; a production pass would
    * range-bucket percentiles instead). Normalizing to the FULL grid
    * matters: both dimensions then contribute equal bit-weight to the
    * curve, so z-locality is isotropic. floor() yields BIGINT — exactly
    * what the bit cascade wants. */
  private def grid(c: Column, lo: Double, hi: Double): Column =
    greatest(lit(0L), least(lit(1023L),
      floor((c - lo) / (hi - lo) * 1024.0)))
  private def qtyBin: Column = grid(col("l_quantity"), 1.0, 50.001)
  private def priceBin: Column = grid(col("l_extendedprice"), 900.0, 105000.0)

  /** Layout granularity — the PRUNING unit, not a write-parallelism
    * knob: a box query decodes every chunk whose z-range it touches, so
    * decoded volume ≈ box area + (boundary cells) · (rows per chunk).
    * 256 chunks at fixture scale ≈ a few thousand rows each; at 100 TB
    * the same role is played by row groups WITHIN files (set
    * `parquet.block.size` so each file carries many), and this knob
    * sizes the file count above them. Measured on the fixture box:
    * 64 chunks decode 12.5%, 256 decode 6.4% (linear-sort floor: 19.6%). */
  def layoutFiles(spark: SparkSession): Int =
    spark.conf.get("spark.graft.layout.files", "256").toInt

  /** Write the z-ordered copy of lineitem once per (root, geometry,
    * sfDir), behind the usual marker ([[FileOps.materializeOnce]]). The
    * zval is a TRANSIENT sort key: it is dropped before the write
    * (projection after sort preserves order), so the stored schema is
    * byte-identical to the source — the layout is invisible to readers
    * except through its row-group statistics. */
  def materializeZorderLayout(spark: SparkSession, sfDir: String): String = {
    val files = layoutFiles(spark)
    FileOps.materializeOnce(spark, s"zorder_$files", sfDir) { dir =>
      Tables.lineitem(spark, sfDir)
        .withColumn("zval", zorderValue(qtyBin, priceBin))
        .repartitionByRange(files, col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite").parquet(dir)
    }
  }

  /** The 2-D box the skipping evidence and the oracle share: ~20% of the
    * quantity range × ~19% of the price range ≈ 3.8% of rows at every
    * SF. Literals, not scalar subqueries — parquet row-group pruning
    * happens at scan planning, so the predicate must reach the reader as
    * constants (a data-derived threshold would plan as a join and skip
    * nothing). */
  private def boxFilter(df: DataFrame): DataFrame =
    df.filter(col("l_quantity") >= 10 && col("l_quantity") < 20 &&
      col("l_extendedprice") >= 20000 && col("l_extendedprice") < 40000)

  /** Z-order layout + 2-D box scan: lineitem rewritten in Morton order
    * over (quantity, price), re-read with a two-dimensional box
    * predicate, aggregated per returnflag. The VALUES equal the same
    * aggregate over the original table (layout is row order, nothing
    * else — that is what the oracle pins); the point of the layout is
    * the row groups the re-read never decodes, which LayoutSpec measures
    * via the scan's numOutputRows against linear and unclustered copies
    * of the same rows. */
  def zorderSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = materializeZorderLayout(spark, sfDir)
    boxFilter(spark.read.parquet(dir))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(20,2)")).cast("long").as("sum_qty"),
        graft.Det.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "zorder_skipping" -> (zorderSkipping _))

  val oracle: Map[String, String] = Map(
    "zorder_skipping" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_lines,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS BIGINT) AS sum_qty,
         |  ${graft.Det.sqlMoneySum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |WHERE l_quantity >= 10 AND l_quantity < 20
         |  AND l_extendedprice >= 20000 AND l_extendedprice < 40000
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
