package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

import scala.collection.mutable

/** Per-key top-K as a first-class operator — the full custom-operator
  * stack (SURVEY.md §7 preference (c)): logical node → planner strategy →
  * physical exec, registered through `spark.experimental.extraStrategies`.
  *
  * Why bother when `row_number().over(window).filter(rn <= k)` exists:
  * the window formulation must SORT every key group in full before it can
  * rank (O(n log n) per partition, full materialization, spill for big
  * groups); this operator keeps one bounded heap of K rows per key —
  * O(n log K) time and O(keys·K) memory — and never sorts the losers. At
  * 100 TB with hot keys that is the difference between a spilling sort
  * and a streaming pass. Semantics are identical; the harness checks this
  * operator against the SAME DuckDB row_number oracle as the window
  * formulation.
  *
  * Memory safety: the hash-of-heaps memory is O(keys-per-partition · K),
  * which is unbounded in key cardinality. When a partition exceeds
  * `maxKeysInMemory` distinct keys, the operator degrades to a sort-based
  * path: the rows already KEPT in the heaps (evicted rows are provably
  * outside their key's top-K, so dropping them is lossless) plus the rest
  * of the input go through an external chunk sort on (key, order) —
  * bounded in-memory chunks, spilled sorted runs, k-way merge — and the
  * ranked rows stream out of the merge. Memory is then O(chunk), not
  * O(keys).
  */
case class TopKPerKeyNode(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rank: Attribute,
    child: LogicalPlan,
    maxKeysInMemory: Int) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rank
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rank :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(grouping, order, k, rank, child, maxKeys) =>
      TopKPerKeyExec(grouping, order, k, rank, planLater(child), maxKeys) :: Nil
    case _ => Nil
  }
}

/** External sort of UnsafeRows: bounded in-memory chunks, each sorted and
  * spilled as a length-prefixed run file, then k-way merged. Run files are
  * task-temp and removed at task completion (or at EOF of their reader). */
private[plans] final class ExternalRowSorter(
    ord: Ordering[UnsafeRow], numFields: Int, chunkRows: Int) {
  private val chunks = mutable.ArrayBuffer.empty[File]
  private var buf = new mutable.ArrayBuffer[UnsafeRow](math.min(chunkRows, 1 << 12))

  def insert(row: UnsafeRow): Unit = {
    buf += row.copy()
    if (buf.length >= chunkRows) spillChunk()
  }

  private def spillChunk(): Unit = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]],
      ord.asInstanceOf[java.util.Comparator[Object]])
    val f = File.createTempFile("graft-topk-run", ".bin")
    f.deleteOnExit()
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => f.delete()))
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
    try arr.foreach { r => val b = r.getBytes; out.writeInt(b.length); out.write(b) }
    finally out.close()
    chunks += f
    buf = new mutable.ArrayBuffer[UnsafeRow](math.min(chunkRows, 1 << 12))
  }

  private def runIterator(f: File): Iterator[UnsafeRow] = new Iterator[UnsafeRow] {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(f), 1 << 16))
    private var nextRow: UnsafeRow = advance()
    private def advance(): UnsafeRow = {
      val lenOrEof = try in.readInt() catch { case _: java.io.EOFException => -1 }
      if (lenOrEof < 0) { in.close(); f.delete(); null }
      else {
        val bytes = new Array[Byte](lenOrEof)
        in.readFully(bytes)
        val r = new UnsafeRow(numFields)
        r.pointTo(bytes, lenOrEof)
        r
      }
    }
    override def hasNext: Boolean = nextRow != null
    override def next(): UnsafeRow = { val r = nextRow; nextRow = advance(); r }
  }

  /** Globally sorted stream over everything inserted. Call once. */
  def sortedIterator(): Iterator[UnsafeRow] = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]],
      ord.asInstanceOf[java.util.Comparator[Object]])
    val ins = (chunks.map(runIterator).toSeq :+ arr.iterator).map(_.buffered).filter(_.hasNext)
    if (ins.sizeIs <= 1) ins.headOption.getOrElse(Iterator.empty)
    else {
      val pq = mutable.PriorityQueue.empty[collection.BufferedIterator[UnsafeRow]](
        Ordering.by[collection.BufferedIterator[UnsafeRow], UnsafeRow](_.head)(ord.reverse))
      ins.foreach(pq.enqueue(_))
      new Iterator[UnsafeRow] {
        override def hasNext: Boolean = pq.nonEmpty
        override def next(): UnsafeRow = {
          val it = pq.dequeue()
          val r = it.next()
          if (it.hasNext) pq.enqueue(it)
          r
        }
      }
    }
  }
}

case class TopKPerKeyExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rank: Attribute,
    child: SparkPlan,
    maxKeysInMemory: Int) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rank
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rank :: Nil)

  /** One exchange on the grouping key; EnsureRequirements inserts it. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(grouping) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupingExprs = grouping
    val sortOrder = order
    val kk = k
    val maxKeys = maxKeysInMemory
    val outputTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val base = RowOrdering.create(sortOrder, childOutput)
      implicit val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => base.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      var overflowed = false
      while (iter.hasNext && !overflowed) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(row.copy())
            else if (base.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            if (heaps.size >= maxKeys) overflowed = true
            val heap = mutable.PriorityQueue.empty[UnsafeRow]
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      val toUnsafe = UnsafeProjection.create(outputTypes)
      if (!overflowed) {
        heaps.iterator.flatMap { case (_, heap) =>
          val ranked: IndexedSeq[UnsafeRow] = heap.dequeueAll.toIndexedSeq.reverse
          ranked.iterator.zipWithIndex.map { case (row, i) =>
            val rankRow = new GenericInternalRow(Array[Any](i + 1))
            toUnsafe(new JoinedRow(row, rankRow)).copy()
          }
        }
      } else {
        // Sort-based fallback: key cardinality exceeded the heap budget.
        // Rows evicted from heaps so far are outside their key's top-K by
        // construction, so the kept rows + the remaining input are a
        // sufficient set. Sort them externally by (key, order) and stream
        // the ranked prefix of each key group out of the merge.
        val fullOrd = RowOrdering.create(
          groupingExprs.map(SortOrder(_, Ascending)) ++ sortOrder, childOutput)
        implicit val sortKeyOrd: Ordering[UnsafeRow] =
          (a: UnsafeRow, b: UnsafeRow) => fullOrd.compare(a, b)
        val chunkRows = math.max(maxKeys * math.max(kk, 2), 1 << 10)
        val sorter = new ExternalRowSorter(sortKeyOrd, childOutput.length, chunkRows)
        heaps.valuesIterator.foreach(_.foreach(sorter.insert))
        heaps.clear()
        iter.foreach(r => sorter.insert(r.asInstanceOf[UnsafeRow]))
        var curKey: UnsafeRow = null
        var rn = 0
        sorter.sortedIterator().flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); rn = 1 }
          else rn += 1
          if (rn <= kk) {
            val rankRow = new GenericInternalRow(Array[Any](rn))
            Iterator.single(toUnsafe(new JoinedRow(row, rankRow)).copy(): InternalRow)
          } else Iterator.empty
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Column-API front door + strategy registration. */
object TopKPerKey {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Default per-partition distinct-key budget for the heap path; beyond
    * it the exec falls back to the external sort (see class doc). */
  val DefaultMaxKeysInMemory: Int = 1 << 16

  /** Top `k` rows per key under (orderCol, tiebreakers asc), ranked 1..k
    * in a `rn` column — drop-in for the row_number window pattern. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      descending: Boolean, tiebreakers: Seq[String], k: Int,
      maxKeysInMemory: Int = DefaultMaxKeysInMemory): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val dir = if (descending) Descending else Ascending
    val order = SortOrder(attr(orderCol), dir) +:
      tiebreakers.map(t => SortOrder(attr(t), Ascending))
    val rank = AttributeReference("rn", IntegerType, nullable = false)()
    val node = TopKPerKeyNode(keyCols.map(attr), order, k, rank, analyzed, maxKeysInMemory)
    ColumnBridge.ofRows(spark, node)
  }
}
