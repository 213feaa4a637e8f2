package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule rewriting the ubiquitous top-K-per-group idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).filter($"rn" <= k) }}}
  *
  * into the [[TopKPerKeyNode]] custom operator, turning the full
  * per-partition window SORT (O(n log n), spills on hot keys) into
  * bounded per-key heaps (O(n log K)) with the same semantics — the
  * optimization a user gets for free by enabling [[GraftExtensions]],
  * without changing their query text.
  *
  * Deliberately conservative: it only fires on a Filter DIRECTLY above a
  * Window whose single window expression is a row_number, with a
  * non-empty PARTITION BY (the exec hash-clusters on it) and an ORDER BY,
  * where the predicate is a bare comparison of that row_number against an
  * integer literal. Anything else — extra window expressions, compound
  * predicates, casts around the rank column — falls through untouched.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def kOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn.exprId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn.exprId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn.exprId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn.exprId => Some(k - 1)
    case _ => None
  }

  private object RewritableTopK {
    def unapply(p: LogicalPlan): Option[TopKPerKeyNode] = p match {
      case Filter(cond, w: Window)
          if w.windowExpressions.sizeIs == 1 &&
            w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
        w.windowExpressions.head match {
          case alias @ Alias(WindowExpression(_: RowNumber, _), _) =>
            kOf(cond, alias.toAttribute).filter(_ > 0).map { k =>
              // Spark's own InferWindowGroupLimit has usually already
              // slipped a WindowGroupLimit (partial per-partition top-k
              // + sort) under the Window by the time user rules run;
              // the heap exec subsumes it, so strip a matching one —
              // otherwise the plan keeps its redundant sorts.
              val child = w.child match {
                case wgl: WindowGroupLimit
                    if wgl.partitionSpec == w.partitionSpec &&
                      wgl.orderSpec == w.orderSpec && wgl.limit >= k => wgl.child
                case c => c
              }
              // alias.toAttribute keeps the original exprId, so every
              // downstream reference to the rank column resolves unchanged
              TopKPerKeyNode(w.partitionSpec, w.orderSpec, k,
                alias.toAttribute, child, TopKPerKey.DefaultMaxKeysInMemory)
            }
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case RewritableTopK(node) => node
  }
}

/** Session-extensions entry point (`spark.sql.extensions=graft.plans.GraftExtensions`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`): installs
  * the custom-operator tier — the planner strategy for [[TopKPerKeyNode]]
  * and the [[TopKRewriteRule]] window-top-K rewrite — the deployment-grade
  * registration path (the imperative `experimental.extraStrategies` hook in
  * [[TopKPerKey.topKPerKey]] stays as the per-call fallback for sessions
  * built without extensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
  }
}
