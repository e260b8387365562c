package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the sensor generator — the engine-side
  * equivalent of pointing `spark.read` at the reference's Kafka topic
  * (reference `data-generator/generator.py:37-48` defines the value
  * domains; [[SensorGen]] defines the hash recipe; this source produces
  * BIT-IDENTICAL rows to `SensorGen.batch`, pinned by test).
  *
  * Why a V2 source and not just the `spark.range` plan: a TableProvider
  * is the seam where SCAN-TIME optimization lives. This one implements
  * the three scan contracts that matter at 100 TB:
  *
  *  - **Filter pushdown with range pruning** ([[SupportsPushDownFilters]]):
  *    event time here is monotonic in the generator's id space
  *    (`ts = start + id·step`), so a timestamp range predicate inverts to
  *    an id-range restriction — the source plans partitions ONLY for the
  *    matching id window, the DSv2 analog of parquet row-group/partition
  *    pruning. A `WHERE ts >= X` over a year of synthetic data generates
  *    a day, not a year filtered down.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): only the
  *    requested columns are computed — each pruned column saves two
  *    xxhash64 evaluations per row at generation time.
  *  - **Limit pushdown** ([[SupportsPushDownLimit]]): `LIMIT n` truncates
  *    the id range before partitions are planned (Spark only offers the
  *    limit to the source once every filter above it is pushed, so the
  *    truncation is exact).
  *
  * Registered as `graft-sensors` via the DataSourceRegister service file;
  * options: `rows` (default 1000), `seed` (42), `start` (2024-01-01
  * 00:00:00, session TZ), `stepSeconds` (1), `numPartitions` (8).
  */
class SensorSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sensors"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SensorSourceV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SensorTable(new CaseInsensitiveStringMap(properties))
}

object SensorSourceV2 {
  val schema: StructType = StructType(Seq(
    StructField("device_id", StringType, nullable = false),
    StructField("device_type", StringType, nullable = false),
    StructField("location", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("battery_level", DoubleType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))

  /** Identical arithmetic to the Catalyst recipe in [[SensorGen.cols]]:
    * `xxhash64(id, lit(k))` folds its ARGUMENTS left to right starting
    * from the expression's fixed initial seed 42 — the second column is
    * data, not the hash seed — so the equivalent here is
    * hash(k, hash(id, 42)). */
  private[sources] def hash(id: Long, k: Long): Long =
    XxHash64Function.hash(k, LongType, XxHash64Function.hash(id, LongType, 42L))

  private[sources] def pmod(h: Long, m: Long): Long = ((h % m) + m) % m
}

private[sources] final class SensorTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-sensors(rows=${options.getLong("rows", 1000L)})"
  override def schema(): StructType = SensorSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new SensorScanBuilder(options)
}

private[sources] final class SensorScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private val rows = options.getLong("rows", 1000L)
  private val seed = options.getLong("seed", 42L)
  private val stepSeconds = options.getLong("stepSeconds", 1L)
  // every pushdown relies on timestamps being STRICTLY INCREASING in id:
  // step 0 divides by zero in filter inversion, negative steps silently
  // prune the wrong window and swap pushed min/max — fail loudly instead
  require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
  private val numPartitions = options.getInt("numPartitions", 8)
  // parsed in the SESSION time zone, matching to_timestamp of a literal
  // in SensorGen.batch (the builder runs on the driver, so SQLConf.get
  // sees the active session's zone)
  private val startMicros: Long = {
    val zone = java.time.ZoneId.of(SQLConf.get.sessionLocalTimeZone)
    // NOTE: CaseInsensitiveStringMap has no two-arg get — a careless
    // options.get(key, default) auto-tuples into get(Object) and returns
    // null silently
    val ldt = java.time.LocalDateTime.parse(
      Option(options.get("start")).getOrElse("2024-01-01 00:00:00").replace(' ', 'T'))
    val ins = ldt.atZone(zone).toInstant
    ins.getEpochSecond * 1000000L + ins.getNano / 1000L
  }
  private val stepMicros = stepSeconds * 1000000L

  // id range under construction: [lo, hi) over the generator id space
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SensorSourceV2.schema

  private def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  /** ceil-div that stays exact for the negative intermediate a filter
    * before `start` produces. */
  private def ceilDiv(a: Long, b: Long): Long = math.floorDiv(a + b - 1, b)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      // ts = start + id·step is strictly increasing in id, so each bound
      // inverts to an id bound; everything else goes back to Spark
      case GreaterThanOrEqual("timestamp", v) => tsMicros(v).isDefined
      case GreaterThan("timestamp", v)        => tsMicros(v).isDefined
      case LessThanOrEqual("timestamp", v)    => tsMicros(v).isDefined
      case LessThan("timestamp", v)           => tsMicros(v).isDefined
      case EqualTo("timestamp", v)            => tsMicros(v).isDefined
      case IsNotNull("timestamp")             => true // never null: no-op
      case _                                  => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("timestamp", v) =>
        lo = math.max(lo, ceilDiv(tsMicros(v).get - startMicros, stepMicros))
      case GreaterThan("timestamp", v) =>
        lo = math.max(lo, math.floorDiv(tsMicros(v).get - startMicros, stepMicros) + 1)
      case LessThanOrEqual("timestamp", v) =>
        hi = math.min(hi, math.floorDiv(tsMicros(v).get - startMicros, stepMicros) + 1)
      case LessThan("timestamp", v) =>
        hi = math.min(hi, ceilDiv(tsMicros(v).get - startMicros, stepMicros))
      case EqualTo("timestamp", v) =>
        val us = tsMicros(v).get - startMicros
        if (us % stepMicros == 0) {
          lo = math.max(lo, us / stepMicros); hi = math.min(hi, us / stepMicros + 1)
        } else { hi = lo } // off-grid equality matches nothing
      case IsNotNull("timestamp") => ()
      case _ => ()
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(limit: Int): Boolean = {
    // Spark only offers the limit once all filters above the scan are
    // pushed, so truncating the id range is exact
    hi = math.min(hi, lo + limit)
    true
  }

  // ---- aggregate pushdown: answered in O(1) from the id range ----------
  // count(*) is the range size and timestamps are MONOTONIC in id, so
  // min/max(timestamp) are the range endpoints — a global
  // count/min/max over a year of data returns one row without generating
  // any. Complete pushdown (Spark plans no agg on top); composes with the
  // pushed timestamp filters because the range is already narrowed.
  private var pushedAgg: Option[Array[AggregateFunc]] = None

  private def isTs(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("timestamp"))
      case _ => false
    }

  private def aggField(f: AggregateFunc): Option[StructField] = f match {
    case _: CountStar => Some(StructField("count(*)", LongType, nullable = false))
    case m: Min if isTs(m.column) => Some(StructField("min(timestamp)", TimestampType))
    case m: Max if isTs(m.column) => Some(StructField("max(timestamp)", TimestampType))
    case _ => None
  }

  private def canPush(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(aggField(_).isDefined)

  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    canPush(agg) && {
      pushedAgg = Some(agg.aggregateExpressions)
      required = StructType(agg.aggregateExpressions.map(aggField(_).get))
      true
    }

  override def build(): Scan =
    new SensorScan(math.max(lo, 0L), math.max(math.min(hi, rows), math.max(lo, 0L)),
      seed, startMicros, stepMicros, numPartitions, required, pushed, pushedAgg,
      math.max(options.getLong("rowsPerBatch", 100L), 1L))
}

final case class SensorInputPartition(lo: Long, hi: Long)
    extends InputPartition

/** Marker partition for a completely-pushed aggregate: the reader answers
  * from the range arithmetic alone. */
final case class SensorAggPartition(lo: Long, hi: Long)
    extends InputPartition

/** Stream offset = the next generator id to admit. */
final case class SensorOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** Micro-batch generator stream over the id space [lo, hi): each trigger
  * admits up to `rowsPerBatch` further ids; a batch [start, end) plans the
  * same sliced partitions and row recipe as the batch path, so streamed
  * rows are bit-identical to the batch read of the same range. Once the
  * cap is reached the offset stops advancing and the query idles —
  * deterministic, wall-clock-free, which is what makes watermark/window
  * semantics assertable in tests.
  *
  * Admission is STATELESS via [[SupportsAdmissionControl]]: Spark hands
  * `latestOffset` the restart-recovered start offset, so a recovering
  * query resumes exactly at its committed id with no re-delivery — a
  * stream-side `var` tracking "ids offered so far" cannot know about a
  * previous run's checkpoint (measured: 136 duplicated rows across a
  * restart before this design). */
private[sources] final class SensorMicroBatchStream(
    lo: Long, hi: Long, rowsPerBatch: Long, seed: Long,
    startMicros: Long, stepMicros: Long, numPartitions: Int,
    required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = SensorOffset(lo)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = math.max(start.asInstanceOf[SensorOffset].id, lo)
    SensorOffset(math.min(admit(s, limit), hi))
  }

  /** Honor the trigger's ReadLimit contract — Trigger.Once/AvailableNow
    * pass allAvailable() and require EVERYTHING to be admitted (ignoring
    * it would commit one rowsPerBatch batch and terminate with data
    * silently undelivered); rate-style maxRows caps the step; a
    * composite takes its most specific member; anything else (minRows,
    * maxBytes — meaningless for fixed-width generated rows) falls back
    * to the configured batch size. */
  private def admit(s: Long, limit: ReadLimit): Long = limit match {
    case _: ReadAllAvailable => hi
    case m: ReadMaxRows => s + math.min(m.maxRows(), rowsPerBatch)
    case c: CompositeReadLimit =>
      val ls = c.getReadLimits
      if (ls.exists(_.isInstanceOf[ReadAllAvailable])) hi
      else ls.collectFirst { case m: ReadMaxRows => s + math.min(m.maxRows(), rowsPerBatch) }
        .getOrElse(s + rowsPerBatch)
    case _ => s + rowsPerBatch
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  override def deserializeOffset(json: String): Offset =
    SensorOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[SensorOffset].id
    val b = end.asInstanceOf[SensorOffset].id
    val n = math.max(b - a, 0L)
    if (n == 0) return Array.empty
    val parts = math.min(numPartitions.toLong, n).toInt
    Array.tabulate(parts) { i =>
      SensorInputPartition(a + i * n / parts, a + (i + 1) * n / parts)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SensorReaderFactory(seed, startMicros, stepMicros, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] final class SensorScan(
    lo: Long, hi: Long, seed: Long, startMicros: Long, stepMicros: Long,
    numPartitions: Int, required: StructType, pushed: Array[Filter],
    pushedAgg: Option[Array[AggregateFunc]] = None,
    rowsPerBatch: Long = 100L)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Exact statistics from the (already filter-narrowed) id range.
    * Without these a V2 relation defaults to
    * `spark.sql.defaultSizeInBytes` (max) and can NEVER be auto-chosen as
    * a broadcast side — reporting real size is what plugs the source into
    * Catalyst's join-strategy costing. Row width = pruned-schema estimate
    * (strings dominated by the ≤10-char device_id). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(hi - lo, 0L)
    private val rowBytes = math.max(8L * required.size, 8L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * rowBytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
  }

  override def description(): String =
    s"graft-sensors ids=[$lo,$hi) PushedFilters: [${pushed.mkString(", ")}], " +
      pushedAgg.map(a => s"PushedAggregates: [${a.mkString(", ")}], ").getOrElse("") +
      s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // pushed aggregates: one partition, one row, zero generated readings
    // — even an empty range answers (count 0, null min/max)
    if (pushedAgg.isDefined) return Array(SensorAggPartition(lo, hi))
    val n = math.max(hi - lo, 0L)
    if (n == 0) return Array.empty
    val parts = math.min(numPartitions.toLong, n).toInt
    // contiguous slices, remainder spread over the first partitions —
    // the same even split spark.range plans
    Array.tabulate(parts) { i =>
      val a = lo + i * n / parts
      val b = lo + (i + 1) * n / parts
      SensorInputPartition(a, b)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SensorReaderFactory(seed, startMicros, stepMicros, required, pushedAgg)

  /** Streaming surface: the same generator behind the MicroBatchStream
    * contract — offsets ARE generator ids, each trigger admits the next
    * `rowsPerBatch` ids (up to `rows`), and a micro-batch plans the same
    * id-sliced partitions the batch path uses. Deterministic (no
    * wall-clock coupling), so streaming semantics — watermarks, windowed
    * aggs, sinks — are testable end to end without a broker; the
    * reference's generator→Kafka→decode front half collapses into one
    * `readStream.format("graft-sensors")`. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SensorMicroBatchStream(lo, hi, rowsPerBatch, seed, startMicros,
      stepMicros, numPartitions, required)
}

private[sources] final class SensorReaderFactory(
    seed: Long, startMicros: Long, stepMicros: Long, required: StructType,
    pushedAgg: Option[Array[AggregateFunc]] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case SensorAggPartition(lo, hi) =>
        new SensorAggReader(lo, hi, startMicros, stepMicros, pushedAgg.get)
      case p: SensorInputPartition =>
        new SensorPartitionReader(p.lo, p.hi, seed, startMicros, stepMicros, required)
      case other =>
        throw new IllegalArgumentException(s"unknown partition: $other")
    }
}

/** One row answering the pushed aggregates from the id-range arithmetic:
  * count = range size; min/max(timestamp) = the endpoints (timestamps are
  * strictly increasing in id). Empty range → count 0, null min/max —
  * matching what the full aggregation over zero rows returns. */
private[sources] final class SensorAggReader(
    lo: Long, hi: Long, startMicros: Long, stepMicros: Long,
    aggs: Array[AggregateFunc])
    extends PartitionReader[InternalRow] {
  private var emitted = false
  override def next(): Boolean = { val r = !emitted; emitted = true; r }
  override def get(): InternalRow = {
    val n = math.max(hi - lo, 0L)
    InternalRow.fromSeq(aggs.toIndexedSeq.map {
      case _: CountStar => n
      case _: Min => if (n == 0) null else startMicros + lo * stepMicros
      case _: Max => if (n == 0) null else startMicros + (hi - 1) * stepMicros
      case other => throw new IllegalArgumentException(s"unpushable agg: $other")
    })
  }
  override def close(): Unit = ()
}

/** Generates one id per `next()` call, computing ONLY the pruned columns
  * — each generator closure below is bound once at reader construction,
  * so the per-row loop is a flat array walk with no schema dispatch. */
private[sources] final class SensorPartitionReader(
    lo: Long, hi: Long, seed: Long, startMicros: Long, stepMicros: Long,
    required: StructType)
    extends PartitionReader[InternalRow] {

  import SensorSourceV2.{hash, pmod}

  private val deviceTypes = SensorGen.deviceTypes.map(UTF8String.fromString).toArray
  private val locations = SensorGen.locations.map(UTF8String.fromString).toArray

  private val gens: Array[Long => Any] = required.fields.map { f =>
    f.name match {
      case "device_id" =>
        (id: Long) => UTF8String.fromString("sensor_" + (pmod(hash(id, seed), 100) + 1))
      case "device_type" =>
        (id: Long) => deviceTypes(pmod(hash(id, seed + 1), 5).toInt)
      case "location" =>
        (id: Long) => locations(pmod(hash(id, seed + 2), 6).toInt)
      case "value" =>
        (id: Long) => pmod(hash(id, seed + 3), 10000) / 100.0
      case "battery_level" =>
        (id: Long) => pmod(hash(id, seed + 4), 10000) / 100.0
      case "timestamp" =>
        (id: Long) => startMicros + id * stepMicros
      case other =>
        throw new IllegalArgumentException(s"unknown column: $other")
    }
  }

  private var id = lo - 1

  override def next(): Boolean = { id += 1; id < hi }

  override def get(): InternalRow =
    InternalRow.fromSeq(gens.map(g => g(id)).toIndexedSeq)

  override def close(): Unit = ()
}
