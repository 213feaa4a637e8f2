package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable FREQUENT-ITEMS sketch tier (SURVEY.md §2b Q25/Q10 heavy-
  * hitter family, scale path) — the fourth member of the sketch family
  * next to HLL (distinct), KLL (quantiles) and theta (set algebra),
  * which Spark's built-in DataSketches surface does not expose; these
  * expressions wrap `org.apache.datasketches.frequencies.ItemsSketch`
  * in the same `TypedImperativeAggregate` shape Spark's own
  * `hll_sketch_agg` uses: a LIVE sketch object rides the aggregation
  * buffer (updated per row at native speed), and serialization happens
  * only at partial-aggregate shuffle boundaries — never per row.
  *
  * At 100 TB: per-slice (per-source / per-day) sketches are a few KB
  * each, persist like any column, and union-merge associatively — the
  * same build-per-slice/merge-on-rollup architecture as the HLL tier,
  * for "what are the heavy tokens" instead of "how many distinct". The
  * sketch guarantees NO FALSE NEGATIVES above its error bound (≤ 3.5·n/k
  * for purge-based ItemsSketch), so the candidate set provably contains
  * every true heavy hitter — the engine then verifies candidates with
  * EXACT counts, making the final answer deterministic and oracled even
  * though sketch internals vary with merge order.
  */
case class FiSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  @transient private lazy val serde = new ArrayOfStringsSerDe

  // analysis-time guard (same doctrine as DotProduct): a wrong child
  // type must fail at planning, not as an executor-side ClassCastException
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING child, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
    buf.merge(other)

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "fi_sketch_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): FiSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FiSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FiSketchAgg =
    copy(child = newChild)
}

/** Union-merge of serialized frequent-items sketches (BinaryType input) —
  * the rollup half: per-slice sketch binaries in, one merged sketch out.
  * Same buffer type as the builder, so partial merges stay live objects. */
case class FiUnionAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY (serialized sketch) child, " +
          s"got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
    buf.merge(other)

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "fi_union_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): FiUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FiUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FiUnionAgg =
    copy(child = newChild)
}

/** Candidate extraction: the sketch's NO_FALSE_NEGATIVES item list — a
  * guaranteed SUPERSET of every item with true count above the sketch's
  * error bound. Scalar, runs on one merged-sketch row; CodegenFallback
  * is fine off the hot path. */
case class FiSketchItems(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "fi_sketch_items"

  override def nullSafeEval(input: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(
      rows.map(r => UTF8String.fromString(r.getItem).asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): FiSketchItems =
    copy(child = newChild)
}

/** Maximum-error bound of a serialized sketch (the no-false-negative
  * threshold) — lets callers ASSERT the candidate guarantee instead of
  * assuming it. */
case class FiSketchMaxError(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "fi_sketch_max_error"

  override def nullSafeEval(input: Any): Any =
    ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe)
      .getMaximumError

  override protected def withNewChildInternal(newChild: Expression): FiSketchMaxError =
    copy(child = newChild)
}

object FrequencyFunctions {
  /** Build a frequent-items sketch of a string column (per group). */
  def fiSketchAgg(c: Column, maxMapSize: Int): Column =
    ColumnBridge.column(
      FiSketchAgg(ColumnBridge.expression(c), maxMapSize).toAggregateExpression())

  /** Union-merge serialized sketches (per group / globally). */
  def fiUnionAgg(c: Column, maxMapSize: Int): Column =
    ColumnBridge.column(
      FiUnionAgg(ColumnBridge.expression(c), maxMapSize).toAggregateExpression())

  /** NO_FALSE_NEGATIVES candidate items of a serialized sketch. */
  def fiSketchItems(c: Column): Column =
    ColumnBridge.column(FiSketchItems(ColumnBridge.expression(c)))

  /** Maximum error (no-false-negative threshold) of a serialized sketch. */
  def fiSketchMaxError(c: Column): Column =
    ColumnBridge.column(FiSketchMaxError(ColumnBridge.expression(c)))
}
