package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
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
  */
case class TopKPerKeyNode(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rank: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rank
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rank :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(grouping, order, k, rank, child) =>
      TopKPerKeyExec(grouping, order, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rank: Attribute,
    child: SparkPlan) extends UnaryExecNode {

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
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val base = RowOrdering.create(sortOrder, childOutput)
      // max-heap under the requested order: head = worst row currently kept
      implicit val rowOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => base.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { r =>
        val row = r.asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(row.copy())
            else if (base.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[UnsafeRow]
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      val toUnsafe = UnsafeProjection.create(output.map(_.dataType).toArray)
      heaps.iterator.flatMap { case (_, heap) =>
        val ranked: IndexedSeq[UnsafeRow] = heap.dequeueAll.toIndexedSeq.reverse
        ranked.iterator.zipWithIndex.map { case (row, i) =>
          val rankRow = new GenericInternalRow(Array[Any](i + 1))
          toUnsafe(new JoinedRow(row, rankRow)).copy()
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

  /** Top `k` rows per key under (orderCol, tiebreakers asc), ranked 1..k
    * in a `rn` column — drop-in for the row_number window pattern. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      descending: Boolean, tiebreakers: Seq[String], k: Int): DataFrame = {
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
    val node = TopKPerKeyNode(keyCols.map(attr), order, k, rank, analyzed)
    ColumnBridge.ofRows(spark, node)
  }
}
