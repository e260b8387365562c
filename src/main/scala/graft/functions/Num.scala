package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic numeric aggregation helpers.
  *
  * Summing doubles in a distributed plan is order-dependent: partial
  * aggregates combine in partition-completion order, so two runs (or two
  * engines) can differ in the last ulps — fatal for a hash-compared oracle
  * and a real reproducibility hazard at 1000-executor scale. We instead sum
  * in exact DECIMAL (order-independent, overflow-checked), convert the exact
  * result to double once (correctly rounded, engine-agnostic), and round to
  * a fixed scale. DuckDB's `SUM(CAST(x AS DECIMAL(18,s)))` is exact the same
  * way (hugeint accumulator), so both engines produce bit-identical doubles.
  */
object Num {

  /** Exact decimal sum of a double column carrying `scale` decimals. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale)))

  /** Exact sum surfaced as a rounded double (stable across engines/runs). */
  def dsumAsDouble(c: Column, scale: Int = 2, outScale: Int = 2): Column =
    round(dsum(c, scale).cast(DoubleType), outScale)

  /** Order-independent average rounded to `outScale` decimals, computed
    * entirely in exact integer arithmetic.
    *
    * round() on the double quotient is NOT engine-portable at ties: when
    * sum/count lands exactly on a .xxx5 boundary at `outScale` (any count
    * whose prime factors are only 2 and 5 can produce one), Spark's
    * BigDecimal HALF_UP on the binary double and DuckDB's rounding
    * disagree by one output ulp — gap_fill hit four such cells at sf0.1.
    * Instead: T = sum scaled to an integer, d = count·10^(M−outScale),
    * half-up quotient = (2T + d) div (2d), then one exact double division
    * by 10^outScale. Every step is integral in both engines, so the
    * rounding is bit-identical by construction.
    *
    * `colName` is a SQL EXPRESSION string, not just an identifier — the
    * text is spliced verbatim into `expr`/oracle SQL (TextAnalysis passes
    * `round(ln(...),6)`), which both engines must parse identically. Plain
    * identifiers needing quoting (spaces, reserved words, embedded quotes)
    * would produce an opaque parse error: backtick-quote them on the Spark
    * side / double-quote in the oracle BEFORE passing them here. Same
    * contract for [[sqlDsum]]/[[sqlDavg]]. */
  def davg(colName: String, scale: Int = 2, outScale: Int = 4): Column = {
    val m = math.max(scale, outScale)
    val tEx = s"CAST(sum(CAST($colName AS DECIMAL(18,$scale))) * ${p10(m)} AS DECIMAL(38,0))"
    val dEx = s"count(1) * ${p10(m - outScale)}"
    // `div` (and DuckDB's //) truncate toward zero, so the half offset
    // must carry the sum's sign: rounds half AWAY from zero either way,
    // matching BigDecimal HALF_UP for negative averages (log-probs) too
    val num = s"(2 * $tEx + (CASE WHEN $tEx < 0 THEN -($dEx) ELSE $dEx END))"
    expr(s"CAST($num div (2 * ($dEx)) AS DOUBLE)") / p10(outScale).toDouble
  }

  private def p10(k: Int): Long = math.pow(10, k).toLong

  /** RESIDUAL TIE SURFACE (documented, not migrated): queries that round
    * an integer/integer quotient computed in double (text_quality ratios,
    * repetition fractions, decontaminate contamination, corpus_filter
    * avg_chars) can in principle hit the same cross-engine .xxx5
    * divergence when the denominator's only prime factors are 2 and 5 AND
    * the quotient's decimal expansion terminates exactly one digit past
    * the output scale with a trailing 5 (e.g. 7/160 rounded to 4). Dyadic
    * denominators are safe (the double is exact, both engines agree on
    * the true tie); factor-5 denominators are the exposure. Four rounds ×
    * three scale factors have produced no instance; if one surfaces,
    * rewrite that site over an exact-integer half-up like [[davg]] rather
    * than adjusting the oracle. */

  /** DuckDB SQL fragment mirroring [[dsumAsDouble]]. */
  def sqlDsum(col: String, scale: Int = 2, outScale: Int = 2): String =
    s"round(CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE), $outScale)"

  /** DuckDB SQL fragment mirroring [[davg]] — same exact-integer half-up. */
  def sqlDavg(col: String, scale: Int = 2, outScale: Int = 4): String = {
    val m = math.max(scale, outScale)
    val t = s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) * ${p10(m)} AS HUGEINT)"
    val d = s"(count(*) * ${p10(m - outScale)})"
    val num = s"(2 * $t + (CASE WHEN $t < 0 THEN -$d ELSE $d END))"
    s"(CAST($num // (2 * $d) AS DOUBLE) / ${p10(outScale)}.0)"
  }
}
