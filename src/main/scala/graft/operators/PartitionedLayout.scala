package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directory-partitioned layout: the partition-pruning disciplines.
  *
  * Bucketing ([[Bucketing]]) kills the join SHUFFLE; directory
  * partitioning kills the join SCAN. A 100 TB fact laid out as
  * `date=…/source=…` directories serves three pruning regimes, each
  * asserted by LayoutSpec:
  *
  *  1. STATIC pruning — a literal predicate on the partition column never
  *     reads the other directories (`PartitionFilters` on the scan;
  *     ComponentSpec pins the basic case).
  *  2. DYNAMIC partition pruning (DPP) — the 100-TB star-join workhorse:
  *     when the filter is on the DIMENSION (`WHERE n_name = 'X'` joined to
  *     a fact partitioned by nation key), no literal ever touches the fact
  *     scan. Catalyst inserts a `dynamicpruning` subquery that runs the
  *     dim side first and prunes fact DIRECTORIES with the surviving keys
  *     at runtime — without it, a selective dim filter still scans the
  *     full fact. The plan gate is `dynamicpruning#…` inside the fact
  *     scan's PartitionFilters.
  *  3. Partition-wise writes — `partitionBy` at write time is the one-off
  *     shuffle that buys every later query its pruning; low-cardinality
  *     columns only (a high-cardinality partition column explodes the
  *     namespace — that regime belongs to [[Bucketing]]).
  */
object PartitionedLayout {

  /** Write `df` directory-partitioned by `partCol` (low-cardinality). */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Star join whose fact side is a partitioned layout and whose filter
    * lives on the dimension: the shape DPP exists for. `dimFilter` is a
    * predicate over the dim table; the join key on the fact side must be
    * the partition column for pruning to reach the directories. */
  def dppJoin(spark: SparkSession, factPath: String, factKey: String,
      dim: DataFrame, dimKey: String, dimFilter: Column): DataFrame =
    spark.read.parquet(factPath)
      .join(dim.filter(dimFilter), col(factKey) === col(dimKey))
}
