package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.{SensorGen, SensorInputPartition}

/** The `graft-sensors` DataSource V2: row parity with the SensorGen plan,
  * plus the three scan-time contracts (timestamp-range partition pruning,
  * column pruning, limit pushdown) asserted against the physical plan. */
class SensorSourceV2Spec extends SparkSuite {

  private def read(n: Long = 1000, parts: Int = 8): DataFrame =
    spark.read.format("graft-sensors")
      .option("rows", n).option("numPartitions", parts).load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  private def partitionsOf(df: DataFrame): Seq[SensorInputPartition] =
    scanOf(df).batch.planInputPartitions().toSeq
      .map(_.asInstanceOf[SensorInputPartition])

  test("rows are bit-identical to the SensorGen.batch recipe") {
    val v2 = read(500).collect().map(_.toSeq).toSet
    val plan = SensorGen.batch(spark, 500).collect().map(_.toSeq).toSet
    assert(v2 == plan)
  }

  test("short name resolves through DataSourceRegister and honors options") {
    val df = spark.read.format("graft-sensors")
      .option("rows", 60).option("seed", 7)
      .option("start", "2030-06-01 12:00:00").option("stepSeconds", 60).load()
    assert(df.count() == 60)
    val expect = SensorGen.batch(spark, 60, seed = 7,
      start = "2030-06-01 12:00:00", stepSeconds = 60).collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == expect)
  }

  test("timestamp range predicate prunes the generated id range") {
    // rows 1000, step 1s from 2024-01-01 00:00:00: a [00:01:00, 00:02:00)
    // window is ids [60, 120) — the scan must plan ONLY that window
    val df = read().filter(
      col("timestamp") >= "2024-01-01 00:01:00" &&
        col("timestamp") < "2024-01-01 00:02:00")
    val parts = partitionsOf(df)
    assert(parts.map(p => p.hi - p.lo).sum == 60,
      s"expected 60 pruned ids, planned ${parts}")
    assert(parts.head.lo == 60 && parts.last.hi == 120)
    assert(df.count() == 60)
    // parity with the unpruned plan filtered the ordinary way
    val expect = SensorGen.batch(spark, 1000)
      .filter(col("timestamp") >= "2024-01-01 00:01:00" &&
        col("timestamp") < "2024-01-01 00:02:00").collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == expect)
    assert(scanOf(df).batch.asInstanceOf[org.apache.spark.sql.connector.read.Scan]
      .description().contains("ids=[60,120)"))
  }

  test("off-grid timestamp equality plans zero partitions") {
    val none = read().filter(col("timestamp") === "2024-01-01 00:00:00.5")
    assert(partitionsOf(none).isEmpty)
    assert(none.count() == 0)
    val one = read().filter(col("timestamp") === "2024-01-01 00:00:30")
    assert(one.count() == 1)
  }

  test("non-timestamp predicates come back to Spark and stay correct") {
    val df = read().filter(col("device_type") === "humidity" &&
      col("timestamp") < "2024-01-01 00:05:00")
    // the ts bound pruned generation to 300 ids; device_type is Spark's
    assert(partitionsOf(df).map(p => p.hi - p.lo).sum == 300)
    val expect = SensorGen.batch(spark, 1000)
      .filter(col("device_type") === "humidity" &&
        col("timestamp") < "2024-01-01 00:05:00").count()
    assert(df.count() == expect && expect > 0)
  }

  test("column pruning reaches the reader") {
    val df = read().select("device_type", "value")
    assert(scanOf(df).output.map(_.name) == Seq("device_type", "value"))
    assert(df.distinct().count() > 0)
  }

  test("limit pushdown truncates the planned id range") {
    val df = read().limit(10)
    assert(partitionsOf(df).map(p => p.hi - p.lo).sum == 10)
    assert(df.count() == 10)
  }

  test("partition planning splits evenly and never exceeds the range") {
    val parts = partitionsOf(read(1000, parts = 8))
    assert(parts.size == 8)
    assert(parts.map(p => p.hi - p.lo).sum == 1000)
    assert(parts.sliding(2).forall { case Seq(a, b) => a.hi == b.lo; case _ => true })
    // a range smaller than numPartitions collapses to one id per part
    assert(partitionsOf(read(3, parts = 8)).size == 3)
  }
}
