package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability exposed through the driver contract.
  *
  * @param plan   builds the DataFrame lazily against a scale-factor dir
  *               (`/root/testdata/sfX`); pure logical-plan construction,
  *               no actions — Catalyst owns physical planning. Documented
  *               exceptions: dedup_clusters and dedup_keep_list run
  *               connected-components actions (edge count + convergence
  *               checks) and release every cached intermediate before
  *               returning; OperatorSpec asserts every other builder is
  *               action-free.
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables (registered under their bare names). None for
  *               operators whose output is not SQL-reproducible across
  *               engines (e.g. hash-seeded LSH) — the driver then records a
  *               weaker rows-only check.
  *
  * Determinism rules every query obeys (so hash-compares are stable):
  *  - total ORDER BY with a unique tiebreaker key in BOTH plans;
  *  - double aggregates routed through exact DECIMAL sums (Num.scala), cast
  *    to double and rounded only at the end;
  *  - event-time emitted at µs precision in both engines.
  */
final case class GraftQuery(
    name: String,
    plan: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
