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

  private def scanOf(df: DataFrame): BatchScanExec = {
    // an exchange anywhere wraps the plan in AdaptiveSparkPlanExec, which
    // collects as a leaf — look through to its initial plan
    val plan = df.queryExecution.executedPlan
    val roots = plan +: plan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
    }
    roots.flatMap(_.collect { case b: BatchScanExec => b })
      .headOption.getOrElse(fail("no BatchScanExec in plan"))
  }

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

  test("count/min/max(timestamp) push to the source and answer from one agg partition") {
    val df = read(1000).agg(
      count(lit(1)).as("n"), min("timestamp").as("lo"), max("timestamp").as("hi"))
    val parts = scanOf(df).batch.planInputPartitions()
    assert(parts.length == 1 && parts.head.isInstanceOf[graft.sources.SensorAggPartition],
      s"expected one agg partition, got ${parts.toSeq}")
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 1000)
    assert(r.getAs[java.sql.Timestamp]("lo").toInstant.toString == "2024-01-01T00:00:00Z")
    assert(r.getAs[java.sql.Timestamp]("hi").toInstant.toString == "2024-01-01T00:16:39Z")
    // parity with the ordinary aggregation over the generator plan
    val e = SensorGen.batch(spark, 1000)
      .agg(count(lit(1)), min("timestamp"), max("timestamp")).collect().head
    assert(r.toSeq == e.toSeq)
  }

  test("pushed aggregates compose with pushed timestamp filters") {
    val df = read().filter(
        col("timestamp") >= "2024-01-01 00:01:00" &&
          col("timestamp") < "2024-01-01 00:02:00")
      .agg(count(lit(1)).as("n"), max("timestamp").as("hi"))
    assert(scanOf(df).batch.planInputPartitions().length == 1)
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 60)
    assert(r.getAs[java.sql.Timestamp]("hi").toInstant.toString == "2024-01-01T00:01:59Z")
  }

  test("unsupported aggregates fall back to row generation and stay correct") {
    val df = read(200).agg(min("value").as("mv"), count(lit(1)).as("n"))
    // min(value) is not range-derivable → no agg partition, normal scan
    val parts = scanOf(df).batch.planInputPartitions()
    assert(parts.forall(_.isInstanceOf[graft.sources.SensorInputPartition]))
    val e = SensorGen.batch(spark, 200).agg(min("value"), count(lit(1))).collect().head
    assert(df.collect().head.toSeq == e.toSeq)
  }

  test("reported statistics let Catalyst auto-broadcast the source in joins") {
    // no explicit broadcast() hint anywhere: the scan's estimateStatistics
    // must be what makes the small generator side the broadcast side
    val dim = read(50).select(col("device_id"), col("device_type")).distinct()
    val fact = Tables.events(spark, sf)
      .select(concat(lit("sensor_"), (col("user_id") % 100) + 1).as("device_id"),
        col("value"))
    val joined = fact.join(dim, "device_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"source not auto-broadcast:\n$plan")
    assert(joined.count() > 0)
  }

  test("micro-batch stream delivers the full id space bit-identical to batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-v2-stream")
    val q = spark.readStream.format("graft-sensors")
      .option("rows", 250).option("rowsPerBatch", 100).load()
      .writeStream.format("memory").queryName("v2stream")
      .option("checkpointLocation", dir.toString).start()
    try {
      q.processAllAvailable()
      val got = spark.table("v2stream").collect().map(_.toSeq).toSet
      val expect = SensorGen.batch(spark, 250).collect().map(_.toSeq).toSet
      assert(got == expect)
      // offsets advanced in rowsPerBatch steps and stopped at the cap
      assert(q.lastProgress.sources.head.endOffset == "250")
    } finally q.stop()
  }

  test("micro-batch stream drives the real windowed-agg pipeline") {
    import graft.streaming.StreamingPipeline
    val dir = java.nio.file.Files.createTempDirectory("graft-v2-agg")
    val stream = spark.readStream.format("graft-sensors")
      .option("rows", 200).option("rowsPerBatch", 90).load()
    val q = StreamingPipeline.aggregates(stream, "1 minute", "1 minute")
      .writeStream.outputMode("complete").format("memory").queryName("v2agg")
      .option("checkpointLocation", dir.toString).start()
    try {
      q.processAllAvailable()
      // 200 ids at 1/s from 00:00 → windows 00:00-00:03; totals must
      // match the batch plan aggregated the same way
      val got = spark.table("v2agg")
        .agg(sum("reading_count")).collect().head.getLong(0)
      assert(got == 200L)
    } finally q.stop()
  }

  test("Trigger.Once drains all available rows (ReadLimit.allAvailable honored)") {
    // Trigger.Once passes ReadLimit.allAvailable(), whose contract is
    // "admit everything" — a source that steps by rowsPerBatch anyway
    // would commit one 64-row batch and terminate with data silently
    // undelivered
    val dir = java.nio.file.Files.createTempDirectory("graft-v2-once")
    val q = spark.readStream.format("graft-sensors")
      .option("rows", 300).option("rowsPerBatch", 64).load()
      .writeStream.format("memory").queryName("v2once")
      .option("checkpointLocation", dir.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("v2once").count() == 300)
    } finally q.stop()
  }

  test("micro-batch stream restart resumes from the committed offset without re-delivery") {
    // memory sinks refuse checkpoint recovery — a parquet sink is the
    // recovering pair, and also proves end-to-end append idempotence
    val ckpt = java.nio.file.Files.createTempDirectory("graft-v2-restart")
    val out = java.nio.file.Files.createTempDirectory("graft-v2-restart-out")
    def runTo(rows: Int): Unit = {
      val q = spark.readStream.format("graft-sensors")
        .option("rows", rows).option("rowsPerBatch", 64).load()
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    runTo(200)
    assert(spark.read.parquet(out.toString).count() == 200)
    // same checkpoint, larger cap: the restarted query must deliver ONLY
    // ids [200, 400) — a fresh stream instance recovering the committed
    // offset through deserializeOffset, never re-admitting below it
    runTo(400)
    val all = spark.read.parquet(out.toString).collect().map(_.toSeq)
    assert(all.length == 400, s"re-delivery: ${all.length} rows")
    assert(all.toSet == SensorGen.batch(spark, 400).collect().map(_.toSeq).toSet)
  }

  test("e2e reference parity: update-mode revisions converge to the append-after-close rows") {
    // The whole reference pipeline (A1→A11) off the broker-free V2
    // source, BOTH sink semantics: mimicReference=true re-emits a window
    // per revision (the duplicate-row behavior the reference's update-
    // mode writer exhibits into its append-only sensor_aggregates table,
    // processor.py:105,133), default append emits each window exactly
    // once after the watermark closes it. The parity contract tying them
    // together: for every window append closed, the LAST update-mode
    // revision must equal the append row exactly — revisions are
    // monotone refinements, not a different answer.
    import graft.streaming.StreamingPipeline
    val root = java.nio.file.Files.createTempDirectory("graft-v2-parity")
    def runMode(mimic: Boolean, name: String): Seq[(Long, org.apache.spark.sql.Row)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, org.apache.spark.sql.Row)]
      val stream = spark.readStream.format("graft-sensors")
        .option("rows", 200).option("rowsPerBatch", 50).load()
      val q = StreamingPipeline.aggregateWriter(
        StreamingPipeline.aggregates(stream, "1 minute", "1 minute"),
        s"$root/$name",
        (df, bid) => {
          val rows = df.collect()
          buf.synchronized { buf ++= rows.map(r => (bid, r)) }
        },
        mimicReference = mimic).start()
      try q.processAllAvailable() finally q.stop()
      buf.toSeq
    }
    val updates = runMode(mimic = true, "upd")
    val appends = runMode(mimic = false, "app")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("device_type"), r.getAs[String]("location"))
    // 200 ids at 1/s across 50-row batches: windows straddle batch
    // boundaries, so at least one key must have been revised (emitted
    // more than once) — otherwise update mode degenerated to append
    val updCounts = updates.groupBy { case (_, r) => key(r) }
    assert(updCounts.values.exists(_.size > 1),
      "no window was ever revised — update-mode parity test is vacuous")
    // append emits once per closed window, never twice
    val appByKey = appends.groupBy { case (_, r) => key(r) }
    assert(appByKey.values.forall(_.size == 1),
      "append mode emitted a window twice")
    assert(appByKey.nonEmpty, "watermark closed no windows — test is vacuous")
    // last revision per key == the append row, for every closed window
    val lastRev = updCounts.map { case (k, rs) => k -> rs.maxBy(_._1)._2.toSeq }
    appByKey.foreach { case (k, rs) =>
      assert(lastRev.contains(k), s"append emitted $k but update never did")
      assert(lastRev(k) == rs.head._2.toSeq,
        s"final update revision for $k diverges from the append-after-close row")
    }
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
