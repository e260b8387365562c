package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous hand-written top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *       .filter($"rn" <= k) }}}
  *
  * to run over [[TopKPerKey]]. The window formulation shuffles EVERY row
  * into per-key partitions and fully sorts them before the filter can drop
  * anything; inserting TopKPerKey under the Window bounds the shuffle at
  * k rows per (input partition, key) and the surviving Window ranks ≤ k·keys
  * rows — at scale, the difference between sorting the dataset per key and
  * sorting k rows per key. The Window + Filter are left in place, so output
  * columns, exprIds, and rank values are untouched; only row cardinality
  * reaching the Window changes, and by construction those are exactly the
  * rows whose row_number passes the filter (ties resolve arbitrarily in
  * both formulations — row_number over a non-total order was never
  * deterministic).
  *
  * Applies only when the Window computes a single row_number expression and
  * the filter is a sole conjunct on it (`rn <= k`, `rn < k`, `rn = 1`, or
  * the mirrored `k >= rn`) — the shapes where the rewrite is provably
  * semantics-preserving. Registered via [[GraftExtensions]]
  * (injectOptimizerRule), so any session built `withExtensions` optimizes
  * user-written window top-ks automatically.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rnId => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType))
      if a.exprId == rnId => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rnId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rnId => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partSpec, orderSpec, child, _))
        if !child.isInstanceOf[TopKPerKey] => // idempotent under fixed point
      limitOf(cond, alias.exprId) match {
        case Some(k) if k > 0 =>
          f.copy(child = w.copy(child = TopKPerKey(partSpec, orderSpec, k, child)))
        case _ => f
      }
  }
}
