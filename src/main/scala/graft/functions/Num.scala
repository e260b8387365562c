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

  /** Order-independent average: exact decimal sum / count, in IEEE double.
    *
    * KNOWN TIE HAZARD: when sum/count lands exactly on a .xxx5 boundary at
    * `outScale` (possible whenever count's only prime factors are 2 and 5),
    * Spark's round (BigDecimal HALF_UP on the binary double) and DuckDB's
    * round can disagree by one ulp of the output scale. If a dataset
    * surfaces such a tie, switch the affected query to the exact-integer
    * half-up formulation gap_fill uses ((2t + n) div (2n) over sums in
    * 10^-outScale units) — bit-identical by construction. */
  def davg(c: Column, scale: Int = 2, outScale: Int = 4): Column =
    round(dsum(c, scale).cast(DoubleType) / count(lit(1)), outScale)

  /** DuckDB SQL fragment mirroring [[dsumAsDouble]]. */
  def sqlDsum(col: String, scale: Int = 2, outScale: Int = 2): String =
    s"round(CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE), $outScale)"

  /** DuckDB SQL fragment mirroring [[davg]]. */
  def sqlDavg(col: String, scale: Int = 2, outScale: Int = 4): String =
    s"round(CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE) / count(*), $outScale)"
}
