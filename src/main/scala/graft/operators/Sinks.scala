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

  /** Size-bounded parquet write: the small-files guard. At 100 TB an
    * uncontrolled write emits one file per shuffle partition — either
    * thousands of KB-scale files (metadata storms for every downstream
    * scan) or multi-GB monsters (no scan parallelism). `maxRecordsPerFile`
    * caps file size from above; `coalesceTo` bounds the file COUNT from
    * above without a shuffle (coalesce, not repartition — narrowing is
    * free). Rows stay sorted within partitions by `sortCols` so min/max
    * row-group statistics stay tight and downstream range filters can skip
    * row groups. */
  def sizedParquet(df: DataFrame, path: String, maxRecordsPerFile: Long,
      coalesceTo: Int = 0, sortCols: Seq[String] = Nil): Unit = {
    val narrowed = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    val sorted =
      if (sortCols.nonEmpty)
        narrowed.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      else narrowed
    sorted.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
