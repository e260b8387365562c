package graft.operators

import org.apache.spark.sql.DataFrame

/** Batch-sink shapes used from `foreachBatch` (reference
  * `spark-processor/processor.py:124-140`).
  *
  * The reference writes every micro-batch with JDBC `mode=append` and
  * swallows exceptions — non-idempotent on retry and silently lossy
  * (SURVEY.md §4). These writers offer the spectrum explicitly:
  *  - [[appendParquet]]: reference-parity append (duplicates on replay);
  *  - [[idempotentParquet]]: dynamic partition overwrite keyed by a
  *    partition column (e.g. window_start) — replaying a batch rewrites the
  *    same partitions, giving effectively-once output at any scale;
  *  - [[jdbc]]: the reference's JDBC path, compiled but unexercised in the
  *    offline harness (no database; exercised shape-only in tests).
  */
object Sinks {

  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Idempotent by partition: requires spark.sql.sources.partitionOverwriteMode=dynamic
    * (set per-write here so the session default is untouched). */
  def idempotentParquet(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Reference-parity JDBC append (processor.py:133). Caller owns retries;
    * errors propagate — we never swallow (unlike processor.py:139-140). */
  def jdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, table, props)
}
