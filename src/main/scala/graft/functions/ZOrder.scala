package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data layout.
  *
  * At 100 TB, files sorted on a single column skip row groups only for
  * filters on that column; interleaving the bits of two filter dimensions
  * gives one sort key whose ordering keeps BOTH dimensions locally
  * clustered, so parquet min/max statistics prune row groups for filters
  * on either (the standard Z-order layout optimization). The spread is
  * the classic shift-or-mask Morton construction — plain integer
  * arithmetic on built-in expressions, fully codegen'd, and exactly
  * reproducible in any engine (which makes the key oracle-checkable).
  *
  * All arithmetic runs in 64-bit: the final odd-bit shift pushes past
  * Int.MaxValue (0xAAAAAAAA), which would wrap in Spark and raise an
  * overflow error in DuckDB if done in 32-bit.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions (Morton
    * "part1by1"), in 64-bit. Inputs outside [0, 65535] are masked. */
  def spread16(v: Column): Column = {
    val a = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key interleaving the low 16 bits of `x` (even bit positions)
    * and `y` (odd bit positions); fits in 32 bits, carried as long. */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same construction as DuckDB SQL over a column expression. */
  def sqlSpread16(v: String): String = {
    val a = s"(CAST($v AS BIGINT) & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  def sqlMortonKey(x: String, y: String): String =
    s"(${sqlSpread16(x)} | (${sqlSpread16(y)} << 1))"
}
