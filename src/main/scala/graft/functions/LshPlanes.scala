package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic random-hyperplane bank for sign-LSH over 64-dim vectors.
  *
  * `tables` independent hash tables × `planesPerTable` hyperplanes, each a
  * ±1 vector derived from a fixed integer mix (no RNG state, reproducible
  * across sessions/executors). The planes are embedded in the plan as
  * literals: on a cluster they ship once inside the serialized plan, cost
  * nothing per row beyond the fused multiply-add fold, and keep the whole
  * signature computation inside codegen.
  */
object LshPlanes {

  val dims = 64
  val tables = 16
  val planesPerTable = 5

  /** Stateless integer mix (xorshift-multiply) → ±1. */
  private def sign(table: Int, plane: Int, dim: Int): Double = {
    var h = (table * 1000003L + plane * 8191L + dim * 131L + 0x9e3779b97f4a7c15L)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    if ((h & 1L) == 0L) 1.0 else -1.0
  }

  /** tables × planes × dims matrix of ±1 weights. */
  val planes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    (0 until tables).map(t => (0 until planesPerTable).map(p =>
      (0 until dims).map(d => sign(t, p, d))))

  /** The plane bank as DuckDB `VALUES` rows `(tbl, plane, w)` — one row per
    * hyperplane, weight vector as a ±1 list literal. Lets SQL oracles
    * reproduce the exact bucket assignments (same IEEE dot fold). */
  def sqlValuesRows: String =
    (for (t <- 0 until tables; p <- 0 until planesPerTable) yield {
      val w = planes(t)(p).map(x => if (x > 0) "1" else "-1").mkString(",")
      s"($t, $p, [$w])"
    }).mkString(",\n          ")

  /** `array<struct<table:int,bucket:int>>` of the vector's bucket in every
    * table; input column is `array<float|double>` of length [[dims]].
    * Each plane dot is a codegen'd [[VectorExpressions.DotProduct]] against
    * the literal plane — no interpreted lambdas, no intermediate arrays. */
  def bucketsCol(v: Column): Column = {
    val perTable = (0 until tables).map { t =>
      val bucket = (0 until planesPerTable).map { p =>
        val dot = VectorExpressions.dot(v, typedlit(planes(t)(p)))
        when(dot >= 0, 1).otherwise(0)
      }.foldLeft(lit(0))((acc, bit) => acc * 2 + bit)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    array(perTable: _*)
  }
}
