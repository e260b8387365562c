package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the custom Catalyst expressions
  * ([[VectorExpressions]]). Static methods so generated code can call them
  * directly (`graft.functions.VectorKernels.dotFF(a, b)`) — no virtual
  * dispatch, no per-row allocation, no boxing.
  *
  * Arithmetic is float→double widening multiply + left-to-right double
  * adds: bit-identical to the higher-order-function formulation
  * (`CAST(x AS DOUBLE)` then fold) these kernels replace, and to DuckDB's
  * `list_reduce` fold — so swapping them in changes nothing the oracle can
  * see.
  */
object VectorKernels {

  /** dot of two float arrays (double accumulation). */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** dot of a float array with a double array (e.g. LSH plane literals). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def l2F(a: ArrayData): Double = math.sqrt(dotFF(a, a))
  def l2D(a: ArrayData): Double = math.sqrt(dotDD(a, a))

  /** Distinct word n-gram shingles of a whitespace-tokenized text, one
    * pass. Replaces the `transform(sequence(...))` higher-order-function
    * formulation, which is interpreted AND re-evaluates the `split` child
    * per lambda iteration after projection collapse (measured seconds/doc
    * at sf0.1). First-occurrence order — stable, though nothing downstream
    * depends on element order (set semantics). */
  def wordShingles(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(' ')
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** 64-bit SimHash over an array of string tokens: one xxhash64 (seed 42,
    * matching Spark SQL's `xxhash64`) per token, ±1 per-bit vote, sign
    * pack. One pass, no intermediate arrays. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }
}
