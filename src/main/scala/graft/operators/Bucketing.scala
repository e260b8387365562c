package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-level bucketing: the co-located-join discipline.
  *
  * At 100 TB the dominant cost of a repeated fact-fact join (lineitem ⋈
  * orders every batch, the delta-dedup digest probe every batch) is the
  * shuffle of the big side — paid again on every run. Bucketed tables move
  * that shuffle to WRITE time, once: `bucketBy(n, key)` hash-partitions the
  * rows into n files per write-task group, records the bucket spec in the
  * catalog, and every later scan reports `HashPartitioning(key, n)` to the
  * planner, so joins and aggregations on the bucket key plan with ZERO
  * exchanges (and with `sortBy`, zero sorts on the merge side when bucket
  * files are single-sorted). Point filters on the key additionally prune to
  * one bucket at planning time (`SelectedBucketsCount` in the scan) —
  * the file-level analogue of partition pruning for high-cardinality keys,
  * where directory partitioning would explode the namespace.
  *
  * Posture notes, asserted by BucketingSpec:
  *  - both sides of a co-located join must share the bucket COUNT and key
  *    (mismatched counts re-shuffle the smaller-bucketed side);
  *  - aggregation on the bucket key is one-phase — no partial→final
  *    exchange;
  *  - this is catalog metadata, not a layout hint: `spark.table`, not
  *    `read.parquet`, or the partitioning is invisible to the planner.
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-file sorted) managed parquet table.
    * One shuffle now, none on any future join/agg over `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their shared bucket key. With equal
    * bucket counts this plans shuffle-free (no Exchange on either side). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Aggregate a bucketed table on its bucket key: the scan's reported
    * partitioning satisfies the grouping, so the agg runs one-phase. */
  def colocatedAgg(spark: SparkSession, table: String, key: String,
      aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    spark.table(table).groupBy(key).agg(aggs.head, aggs.tail: _*)
}
