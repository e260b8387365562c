package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector/hash hot path.
  *
  * Why not UDFs or the higher-order-function (`aggregate`/`zip_with`)
  * formulation: HOFs are CodegenFallback — every row pays interpreted
  * lambda dispatch and an intermediate array per operator, which measured
  * ~10 s per similarity query at sf0.1. These expressions generate a single
  * static-kernel call inside WholeStageCodegen: same IEEE arithmetic (see
  * [[VectorKernels]]), ~10-100× less overhead, and they compose with every
  * other codegen'd expression in the stage.
  *
  * This is preference order (b) from the build brief: a native Expression
  * with `doGenCode`, used where built-in operators can't express the
  * per-element loop efficiently.
  */
object VectorExpressions {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  private def checkVec(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float|double>, got ${t.simpleString}")
    }

  /** Dot product of two numeric arrays, double accumulation. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(left, "dot") match {
        case TypeCheckResult.TypeCheckSuccess => checkVec(right, "dot")
        case f => f
      }

    private def kernel: String = (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) => "dotFF"
      case (FloatType, DoubleType) => "dotFD"
      case (DoubleType, DoubleType) => "dotDD"
      case (DoubleType, FloatType) => "dotFD" // commutative: swap at eval
    }
    private def swapped = elemType(left) == DoubleType && elemType(right) == FloatType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = if (swapped) (b, a) else (a, b)
      val k = kernel
      val xd = x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val yd = y.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      k match {
        case "dotFF" => VectorKernels.dotFF(xd, yd)
        case "dotFD" => VectorKernels.dotFD(xd, yd)
        case "dotDD" => VectorKernels.dotDD(xd, yd)
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (x, y) = if (swapped) (b, a) else (a, b)
        s"${ev.value} = graft.functions.VectorKernels.$kernel($x, $y);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm of a numeric array. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = checkVec(child, "l2norm")
    private def kernel = if (elemType(child) == FloatType) "l2F" else "l2D"

    override def nullSafeEval(a: Any): Any = {
      val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (elemType(child) == FloatType) VectorKernels.l2F(ad) else VectorKernels.l2D(ad)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.$kernel($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Squared L2 distance over one aligned vector slice — the PQ subspace
    * kernel ([[VectorKernels.subSqFF]]). `off` is an expression (the
    * subspace index scales it), `len` a literal param. */
  case class SubSqDist(first: Expression, second: Expression, third: Expression,
      len: Int) extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(first, "subSqDist") match {
        case TypeCheckResult.TypeCheckSuccess =>
          if (elemType(first) != elemType(second))
            TypeCheckResult.TypeCheckFailure("subSqDist: mixed element types")
          else if (third.dataType != IntegerType)
            TypeCheckResult.TypeCheckFailure("subSqDist: offset must be int")
          else TypeCheckResult.TypeCheckSuccess
        case f => f
      }
    private def kernel = if (elemType(first) == FloatType) "subSqFF" else "subSqDD"

    override def nullSafeEval(a: Any, b: Any, o: Any): Any = {
      val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val bd = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val off = o.asInstanceOf[Int]
      if (elemType(first) == FloatType) VectorKernels.subSqFF(ad, bd, off, len)
      else VectorKernels.subSqDD(ad, bd, off, len)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, o) =>
        s"${ev.value} = graft.functions.VectorKernels.$kernel($a, $b, $o, $len);")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** Winnowing (MOSS) fingerprint of a tokenized string — see
    * [[VectorKernels.winnowFingerprint]]. */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint expects string, got ${t.simpleString}")
    }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.winnowFingerprint(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.winnowFingerprint($a, $k, $w);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Content-defined chunk boundary positions of a tokenized string —
    * see [[VectorKernels.cdcBounds]]. */
  case class CdcBounds(child: Expression, w: Int, d: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"cdc_bounds expects string, got ${t.simpleString}")
    }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.cdcBounds(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w, d)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.cdcBounds($a, $w, $d);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Span-corruption account [n_tokens, n_masked, n_spans] — see
    * [[VectorKernels.spanCorruption]]. */
  case class SpanCorruption(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"span_corruption expects string, got ${t.simpleString}")
    }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.spanCorruption(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.spanCorruption($a);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Distinct word n-gram shingles of a whitespace-tokenized string —
    * see [[VectorKernels.wordShingles]]. */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got ${t.simpleString}")
    }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.wordShingles(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.wordShingles($a, $n);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `[tf(terms(0)), …, tf(terms(k-1)), n_tokens]` of a whitespace-
    * tokenized string — see [[VectorKernels.termTfs]]. */
  case class TermTfs(child: Expression, terms: Seq[String]) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"term_tfs expects string, got ${t.simpleString}")
    }
    private lazy val termsArr: Array[String] = terms.toArray
    override def nullSafeEval(a: Any): Any =
      VectorKernels.termTfs(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], termsArr)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // the term list rides the codegen references array — generated code
      // can't splice an array literal, but a reference object is free
      val ref = ctx.addReferenceObj("termTfsTerms", termsArr, "java.lang.String[]")
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.termTfs($a, $ref);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Hashed-bigram bucket codes of a whitespace-tokenized string —
    * see [[VectorKernels.bigramBuckets]]. */
  case class BigramBuckets(child: Expression, b: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bigram_buckets expects string, got ${t.simpleString}")
    }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.bigramBuckets(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], b)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.bigramBuckets($a, $b);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 16-element MinHash signature of an array<string> of shingles. */
  case class MinHashSig(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${t.simpleString}")
    }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.minhashSig(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.minhashSig($a);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit SimHash of an array<string> of tokens. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${t.simpleString}")
    }
    override def nullSafeEval(a: Any): Any =
      VectorKernels.simhash64(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.simhash64($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Sign-bit binary quantization of an embedding into one packed long —
    * see [[VectorKernels.signPackF]]. */
  case class SignPack(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = checkVec(child, "sign_pack")
    private def kernel = if (elemType(child) == FloatType) "signPackF" else "signPackD"
    override def nullSafeEval(a: Any): Any = {
      val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (elemType(child) == FloatType) VectorKernels.signPackF(ad)
      else VectorKernels.signPackD(ad)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.$kernel($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** All sign-LSH table buckets of an embedding — one expression node
    * backed by the static plane bank ([[VectorKernels.lshBucketsF]]);
    * see that kernel's note on why the bank must not live in the plan. */
  case class LshBuckets(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = checkVec(child, "lsh_buckets")
    private def kernel = if (elemType(child) == FloatType) "lshBucketsF" else "lshBucketsD"
    override def nullSafeEval(a: Any): Any = {
      val ad = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (elemType(child) == FloatType) VectorKernels.lshBucketsF(ad)
      else VectorKernels.lshBucketsD(ad)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        a => s"${ev.value} = graft.functions.VectorKernels.$kernel($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // ---- Column-API surface ----------------------------------------------
  def lshBuckets(a: Column): Column =
    GraftSqlBridge.toColumn(LshBuckets(ex(a)))
  def signPack(a: Column): Column =
    GraftSqlBridge.toColumn(SignPack(ex(a)))
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(DotProduct(ex(a), ex(b)))
  def l2norm(a: Column): Column =
    GraftSqlBridge.toColumn(L2Norm(ex(a)))
  def simhash64(a: Column): Column =
    GraftSqlBridge.toColumn(SimHash64(ex(a)))
  def wordShingles(a: Column, n: Int): Column =
    GraftSqlBridge.toColumn(WordShingles(ex(a), n))
  def cdcBounds(a: Column, w: Int, d: Int): Column =
    GraftSqlBridge.toColumn(CdcBounds(ex(a), w, d))
  def spanCorruption(a: Column): Column =
    GraftSqlBridge.toColumn(SpanCorruption(ex(a)))
  def winnowFingerprint(a: Column, k: Int, w: Int): Column =
    GraftSqlBridge.toColumn(WinnowFingerprint(ex(a), k, w))
  def minhashSig(a: Column): Column =
    GraftSqlBridge.toColumn(MinHashSig(ex(a)))
  def termTfs(a: Column, terms: Seq[String]): Column =
    GraftSqlBridge.toColumn(TermTfs(ex(a), terms))
  def bigramBuckets(a: Column, b: Int): Column =
    GraftSqlBridge.toColumn(BigramBuckets(ex(a), b))
  def subSqDist(a: Column, b: Column, off: Column, len: Int): Column =
    GraftSqlBridge.toColumn(SubSqDist(ex(a), ex(b), ex(off), len))

  private def ex(c: Column): Expression = GraftSqlBridge.toExpression(c)

  /** Register as SQL functions (graft_dot / graft_l2norm / graft_simhash64)
    * so `spark.sql` users get them too. */
  def register(spark: SparkSession): Unit = {
    val reg = GraftSqlBridge.functionRegistry(spark)
    reg.createOrReplaceTempFunction("graft_dot", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_l2norm", es => L2Norm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash64", es => SimHash64(es.head), "scala_udf")
  }

  /** Build-time registration of the same functions for
    * `withExtensions`/`spark.sql.extensions` sessions
    * ([[graft.plans.GraftExtensions]] calls this). */
  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) =
      new ExpressionInfo(classOf[DotProduct].getName, name)
    e.injectFunction((FunctionIdentifier("graft_dot"), info("graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_l2norm"), info("graft_l2norm"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash64"), info("graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
  }
}
