package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.GraftSqlBridge

/** Per-key top-k as a first-class operator (custom LogicalPlan + Strategy +
  * SparkPlan — preference (c) of the build brief, used where built-ins
  * genuinely can't express the computation).
  *
  * The built-in formulation — `row_number().over(partitionBy(key).orderBy(o))
  * .filter(rn <= k)` — must shuffle EVERY row and fully sort every
  * partition before it can drop anything. This operator runs two phases:
  * a map-side pass keeps a bounded k-heap per key per input partition, the
  * shuffle then carries at most `k · distinctKeys` rows per partition, and
  * the reduce-side pass merges heaps. At 100 TB with bounded k this is the
  * difference between shuffling the dataset and shuffling k rows per key —
  * the same partial/final shape Spark uses for aggregates, applied to
  * order statistics.
  *
  * Semantics: the first k rows per key group in `order` (output order
  * unspecified, like any exchange — callers sort downstream if they care).
  */
case class TopKPerKey(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan, partial: Boolean)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ordering: negative compare = earlier in the requested sort = better
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap on ord: head is the WORST retained row, evicted first.
      // Buffered rows are InternalRow, not UnsafeRow — a child outside
      // whole-stage codegen may emit generic rows and copy() preserves
      // the concrete class.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer — copy only on first insert
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans logical TopKPerKey as partial(map-side) → [exchange] → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partialExec, partial = false) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Per-key top-k over a DataFrame. Self-registers the planner strategy in
    * the session (also available via [[GraftExtensions]] for
    * `withExtensions`-built sessions).
    *
    * Key/order columns are referenced by name and resolved against the
    * frame's analyzed output here (Spark 4's Column nodes resolve lazily
    * through connect-agnostic wrappers that a custom logical node can't
    * rely on). `order` entries are (columnName, "asc"|"desc"). */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, String)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    // check-then-append under the session lock: concurrent first calls must
    // not register the strategy twice (harmless for planning, but planner
    // state should not grow per call)
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = GraftSqlBridge.plan(df)
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val keyExprs: Seq[Expression] = keys.map(attr)
    val orderExprs = order.map {
      case (name, "desc") => SortOrder(attr(name), Descending)
      case (name, _) => SortOrder(attr(name), Ascending)
    }
    GraftSqlBridge.ofRows(spark, TopKPerKey(keyExprs, orderExprs, k, analyzed))
  }
}

/** SparkSessionExtensions entry point: registers the TopK planner strategy,
  * the [[TopKRewrite]] optimizer rule (window-top-k auto-rewrite), and the
  * graft SQL functions at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => TopKRewrite)
    graft.functions.VectorExpressions.injectInto(e)
    graft.functions.UrlExpressions.injectInto(e)
    graft.functions.TextNormExpressions.injectInto(e)
  }
}
