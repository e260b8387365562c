package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting.
  *
  * AQE's skew-join handling splits oversized partitions at runtime, but it
  * only applies to sort-merge joins and can't help when one key dominates a
  * broadcast-ineligible join. Salting is the planner-independent fix: the
  * skewed (probe) side scatters each key into `factor` sub-keys; the
  * build side replicates each row `factor` times, once per sub-key. The
  * join result is identical; the hot key's rows now spread over `factor`
  * reducers.
  *
  * The salt is derived from a hash of the probe row's other columns (not
  * `rand()`): deterministic output, reproducible runs, no RNG state on
  * executors — important for oracle-checked pipelines and retries.
  */
object Salting {

  /** Equi-join `left.key == right.key` with the left side salted.
    * `saltBy` should be a column (or expr) varying within a key group. */
  def saltedEquiJoin(
      left: DataFrame, right: DataFrame,
      key: String, saltBy: Column, factor: Int,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would null-extend every unmatched right REPLICA
    // (factor copies instead of one) — those types need a different scheme
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase),
      s"saltedEquiJoin supports left-preserving joins only, got $joinType")
    val salted = left.withColumn("_salt", pmod(xxhash64(saltBy), lit(factor)).cast("int"))
    val replicated = right
      .withColumn("_salt", explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
