package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}

/** NFC normalization + mojibake repair as native codegen'd expressions —
  * the [[UrlExpressions]] preference-order-(b) rationale: a Scala UDF would
  * serialize every document out of the Tungsten row and break the
  * WholeStageCodegen span around the scan; these emit one static call on
  * the UTF8String, so scan → normalize → digest/length projections compile
  * into a single generated stage. */
object TextNormExpressions {

  private def stringOnly(name: String, t: DataType): TypeCheckResult = t match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects string, got ${other.simpleString}")
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      stringOnly("nfc_normalize", child.dataType)
    override def nullSafeEval(u: Any): Any =
      TextNormKernels.nfcUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u =>
        s"${ev.value} = graft.functions.TextNormKernels.nfcUtf8($u);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class MojibakeRepair(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      stringOnly("mojibake_repair", child.dataType)
    override def nullSafeEval(u: Any): Any =
      TextNormKernels.repairUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u =>
        s"${ev.value} = graft.functions.TextNormKernels.repairUtf8($u);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fixture-side garble (UTF-8 bytes reread as Latin-1) — an expression so
    * the planted corruption ALSO rides the scan's codegen span instead of a
    * driver-side detour. */
  case class MojibakeGarble(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): TypeCheckResult =
      stringOnly("mojibake_garble", child.dataType)
    override def nullSafeEval(u: Any): Any =
      TextNormKernels.garbleUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u =>
        s"${ev.value} = graft.functions.TextNormKernels.garbleUtf8($u);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nfcNormalize(c: Column): Column =
    GraftSqlBridge.toColumn(NfcNormalize(GraftSqlBridge.toExpression(c)))
  def mojibakeRepair(c: Column): Column =
    GraftSqlBridge.toColumn(MojibakeRepair(GraftSqlBridge.toExpression(c)))
  def mojibakeGarble(c: Column): Column =
    GraftSqlBridge.toColumn(MojibakeGarble(GraftSqlBridge.toExpression(c)))

  /** SQL faces (`graft_nfc_normalize`, `graft_mojibake_repair`) — the
    * [[UrlExpressions.register]] discipline. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = GraftSqlBridge.functionRegistry(spark)
    reg.createOrReplaceTempFunction("graft_nfc_normalize",
      es => NfcNormalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_mojibake_repair",
      es => MojibakeRepair(es.head), "scala_udf")
  }

  /** Build-time registration ([[graft.plans.GraftExtensions]] calls this). */
  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("graft_nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    e.injectFunction((FunctionIdentifier("graft_mojibake_repair"),
      new ExpressionInfo(classOf[MojibakeRepair].getName, "graft_mojibake_repair"),
      (es: Seq[Expression]) => MojibakeRepair(es.head)))
  }
}
