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
  * Applies when the Window computes a single row_number expression and ANY
  * conjunct of the filter bounds it from above (`rn <= k`, `rn < k`,
  * `rn = k`, or the mirrored forms). The other conjuncts stay valid
  * because row_number recomputed over the retained top-k rows EQUALS the
  * original row_number for exactly those rows (they are the first k in the
  * window order), so every predicate on `rn` sees unchanged values.
  * Registered via [[GraftExtensions]] (injectOptimizerRule), so any
  * session built `withExtensions` optimizes user-written window top-ks
  * automatically.
  */
object TopKRewrite extends Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private def limitOf(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rnId => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rnId => Some(k)
    case EqualTo(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rnId => Some(k)
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
      // the tightest upper bound on rn across all conjuncts wins; the full
      // filter is left in place untouched
      val bounds = splitConjunctivePredicates(cond)
        .flatMap(limitOf(_, alias.exprId))
      // partSpec.nonEmpty: a global top-k (empty partitionBy) would build
      // TopKPerKey(keys=Nil), whose ClusteredDistribution(Nil) is rejected
      // at planning — and Spark already plans that case optimally via
      // InferWindowGroupLimit/TakeOrderedAndProject, so leave it alone
      bounds.reduceOption(_ min _) match {
        case Some(k) if k > 0 && partSpec.nonEmpty =>
          f.copy(child = w.copy(child = TopKPerKey(partSpec, orderSpec, k, child)))
        case _ => f
      }
  }
}
