package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}

/** URL canonicalization as a native codegen'd expression.
  *
  * Same preference-order-(b) rationale as [[VectorExpressions]]: a Scala UDF
  * would force serialization out of the Tungsten row per URL and break the
  * WholeStageCodegen span around the dedup groupBy; this expression emits one
  * static call on the UTF8String and stays inside the generated stage, so
  * scan → canonicalize → digest-groupBy compiles into a single codegen span.
  */
object UrlExpressions {

  case class UrlCanonicalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"url_canonicalize expects string, got ${t.simpleString}")
    }

    override def nullSafeEval(u: Any): Any =
      UrlKernels.canonicalizeUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u =>
        s"${ev.value} = graft.functions.UrlKernels.canonicalizeUtf8($u);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column face: `urlCanonicalize($"url")`. */
  def urlCanonicalize(c: Column): Column =
    GraftSqlBridge.toColumn(UrlCanonicalize(GraftSqlBridge.toExpression(c)))

  /** Register as a SQL function (`graft_url_canonicalize`) so `spark.sql`
    * users get the normalizer too — the [[VectorExpressions.register]]
    * discipline. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = GraftSqlBridge.functionRegistry(spark)
    reg.createOrReplaceTempFunction("graft_url_canonicalize",
      es => UrlCanonicalize(es.head), "scala_udf")
  }

  /** Build-time registration for `withExtensions`/`spark.sql.extensions`
    * sessions ([[graft.plans.GraftExtensions]] calls this). */
  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("graft_url_canonicalize"),
      new ExpressionInfo(classOf[UrlCanonicalize].getName, "graft_url_canonicalize"),
      (es: Seq[Expression]) => UrlCanonicalize(es.head)))
  }
}
