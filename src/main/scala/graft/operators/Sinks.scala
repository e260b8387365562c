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
  *  - [[jdbc]]: the reference's JDBC path, exercised end-to-end in tests
  *    against embedded Derby (StreamingSpec "JDBC sink (Derby)" cases:
  *    update-mode duplicate-window appends and clean append-after-close).
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

  /** Replay-idempotent JDBC batch sink — the production FIX for the
    * reference's non-idempotent append (`processor.py:133`): foreachBatch
    * re-delivers a batch after failure recovery, so a plain append
    * duplicates every row the crashed attempt already landed. This writer
    * first deletes any rows a previous attempt of THIS batch id wrote,
    * then appends the batch tagged with its id. Delete + append need not
    * share a transaction: a crash anywhere between them replays the same
    * (delete, append) pair, which converges — at-least-once delivery
    * becomes exactly-once table CONTENT. The batch_id column doubles as
    * write lineage for auditing.
    *
    * Scale: the delete is one indexed predicate (put an index on
    * batch_id); the append is Spark's ordinary parallel JDBC write. Use
    * from foreachBatch as `(df, id) => Sinks.idempotentJdbc(df, url,
    * table, props, id)`. Assumes the streaming engine's guarantee that
    * batch ids are not re-run CONCURRENTLY (a zombie attempt racing the
    * retry is the engine's fencing problem, same as every JDBC sink). */
  def idempotentJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.lit
    Option(props.getProperty("driver")).foreach(Class.forName)
    // Spark's JDBC writer passes the TABLE name through verbatim but
    // QUOTES every column name when it creates the table, making columns
    // case-sensitive in Derby/Postgres — the delete must mirror exactly
    // that split (measured: quoting the table misses it entirely, and an
    // unquoted batch_id resolves to BATCH_ID and hits a column error)
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"DELETE FROM $table " +
          s"WHERE ${dialect.quoteIdentifier("batch_id")} = $batchId")
      catch {
        // first-ever batch: the table does not exist yet — the append
        // below creates it. Anything else (permissions, bad schema)
        // must propagate.
        case e: java.sql.SQLException if e.getSQLState == "42X05" ||
          e.getSQLState == "42P01" => // Derby / Postgres "table not found"
      } finally st.close()
    } finally conn.close()
    df.withColumn("batch_id", lit(batchId))
      .write.mode("append").jdbc(url, table, props)
  }

  /** CDC-compacting upsert: merge the incoming batch into the stored
    * table, keeping ONE row per key — the newest by `versionCol` (ties
    * impossible when versionCol is unique per key, e.g. an offset or
    * (ts, event_id) struct column). The merge is the same struct-ordered
    * max_by hash agg the `latest_by_key` query uses, so the compaction is
    * a single shuffle on the key regardless of history size. Read-merge-
    * rewrite of the whole table is the plain-parquet ceiling — a real
    * 100 TB deployment swaps the storage layer for a table format with
    * row-level MERGE (the sink's signature is format-agnostic on purpose)
    * or partitions the store so each batch rewrites only touched
    * partitions (as [[idempotentParquet]] does). Replay-safe: replaying a
    * batch re-merges the same rows into the same survivors. */
  def compactedParquet(df: DataFrame, path: String,
      keyCols: Seq[String], versionCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, max_by, struct}
    val spark = df.sparkSession
    val existing =
      try Some(spark.read.parquet(path)) catch {
        case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") => None
      }
    val all = existing.fold(df)(_.unionByName(df))
    val keys = keyCols.map(col)
    val compacted = all
      .groupBy(keys: _*)
      .agg(max_by(struct(all.columns.map(col): _*), col(versionCol)).as("_r"))
      .select(all.columns.map(c => col(s"_r.$c")): _*)
      // self-overwrite: the plan reads `path`, so materialize before the
      // overwrite truncates it
      .localCheckpoint(true)
    compacted.write.mode("overwrite").parquet(path)
  }

  /** One parquet file per packed shard — the layout export_manifest
    * describes and a training loader consumes (one shard = one sequential
    * read). `repartition(shardCols)` puts every shard's rows in exactly
    * one task, and the partitioned write then emits exactly one file per
    * shard directory (a task writes one file per partition value it
    * holds); rows sort within the shard file by `sortCol` so the loader's
    * order is the manifest digest's order. Scale: the exchange is keyed
    * on the shard id, per-task state is bounded by the shard budget, and
    * file count = shard count by construction — the small-files storm and
    * the monster-file ceiling are both structurally impossible.
    * LayoutSpec pins file-per-shard and manifest↔layout accounting. */
  def packedShards(df: DataFrame, path: String, shardCols: Seq[String],
      sortCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(shardCols.map(col): _*)
      .sortWithinPartitions((shardCols :+ sortCol).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(shardCols: _*)
      .parquet(path)
  }

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
