package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{GraftQuery, Tables}

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

  /** Registered proof of the salting invariant: the salted join must be
    * bit-identical to the plain join — the DuckDB oracle IS the plain
    * join, so the driver's hash compare certifies the rewrite. (On this
    * testdata the replicated build side still broadcasts; the technique
    * pays off when the build side exceeds the broadcast threshold AND one
    * probe key dominates — semantics are what's being certified here.) */
  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "salted_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val sup = Tables.supplier(s, dir)
          .withColumnRenamed("s_suppkey", "l_suppkey")
        saltedEquiJoin(li, sup, "l_suppkey", col("l_orderkey"), factor = 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_items"),
            graft.functions.Num.dsumAsDouble(col("l_extendedprice")).as("revenue"))
          .orderBy("s_nationkey")
      },
      Some("""
        SELECT s_nationkey, count(*) AS n_items,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
        ORDER BY s_nationkey""")),

    // ---- skew diagnosis: hottest-key share report -------------------------
    // The step BEFORE salting: which keys dominate, and by how much. Top
    // 20 hottest event keys with their share of all rows and a hot flag
    // at 5× the uniform share — the report that decides whether a join
    // needs saltedEquiJoin, a higher AQE skew factor, or a key drop.
    // The hot flag is EXACT WIDE-INTEGER arithmetic (n·n_keys > 5·total
    // in DECIMAL(38,0) / HUGEINT), not a rounded-double comparison, so
    // both engines decide identically at the boundary — and the products
    // cannot overflow at any realistic scale (a bare BIGINT multiply
    // would wrap in Spark and error in DuckDB past 2^63, two different
    // wrong behaviors). One partial-agg count shuffle over the keys, a
    // broadcast 1-row totals frame, TakeOrderedAndProject for the top-k —
    // nothing here scales with rows beyond the first count.
    GraftQuery(
      "skew_profile",
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        val tot = counts.agg(sum("n_events").as("total"),
          count(lit(1)).as("n_keys"))
        counts.crossJoin(broadcast(tot))
          .withColumn("share",
            round(col("n_events").cast(DoubleType) / col("total"), 6))
          .withColumn("is_hot",
            col("n_events").cast(DecimalType(38, 0)) * col("n_keys") >
              col("total").cast(DecimalType(38, 0)) * 5)
          .select("user_id", "n_events", "share", "is_hot")
          .orderBy(col("n_events").desc, col("user_id"))
          .limit(20)
      },
      Some("""
        WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) n_events
                   FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(n_events) AS BIGINT) total,
                     CAST(count(*) AS BIGINT) n_keys FROM c)
        SELECT user_id, n_events,
               round(CAST(n_events AS DOUBLE) / total, 6) AS share,
               CAST(n_events AS HUGEINT) * n_keys
                 > CAST(total AS HUGEINT) * 5 AS is_hot
        FROM c, t
        ORDER BY n_events DESC, user_id
        LIMIT 20"""))
  )
}
