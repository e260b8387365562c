package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Declared-schema file sources — the batch and streaming faces of the
  * same contract [[graft.Tables]] applies to parquet: schemas are DECLARED,
  * never inferred (inference costs a full pre-scan before the first task
  * and silently widens types on drift — fatal at millions of files; the
  * reference pins its stream schema the same way,
  * `spark-processor/processor.py:48-55`).
  *
  * The streaming variants read a DIRECTORY as an unbounded source (each
  * new file is a micro-batch input — the standard landing-zone pattern and
  * the offline-verifiable stand-in for the Kafka source, which needs a
  * broker). `maxFilesPerTrigger` bounds per-batch work so one listing
  * burst cannot produce an unbounded batch.
  */
object FileSources {

  /** Batch JSON-lines with a declared schema; corrupt records are captured
    * in `_corrupt_record` (PERMISSIVE), never silently dropped.
    *
    * PERMISSIVE only populates the corrupt column when it EXISTS in the
    * read schema — without the add + option below, a malformed line
    * silently becomes an all-null row and selecting `_corrupt_record`
    * throws (same pattern as Ingest.decodeWithCorrupt). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add(org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Batch CSV with a declared schema and an explicit header flag —
    * header inference is another silent-drift channel. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Batch ORC with a declared schema — the columnar alternative where
    * the lake standardized on ORC instead of parquet; same no-inference
    * contract (ORC self-describes, but declaring the schema pins the
    * expected shape and fails loudly on drift instead of widening). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Streaming ORC directory source. */
  def orcStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .orc(dir)

  /** Streaming JSON-lines directory source. */
  def jsonlStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Streaming CSV directory source. */
  def csvStream(spark: SparkSession, dir: String, schema: StructType,
      header: Boolean = true, maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", header.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Raw binary files (images/audio/video blobs) as a DataFrame — Spark's
    * `binaryFile` source: (path, modificationTime, length, content). The
    * ingestion face of the multimodal stack: one row per file, content as
    * an opaque binary column, schema fixed by the source itself.
    *
    * `pathGlobFilter` prunes at LISTING time (e.g. "*.jpg") — at millions
    * of landing-zone files, filtering paths after the scan would still
    * pay the full read. `recursiveFileLookup` walks nested date/shard
    * directories. Payload size is bounded per-row by the driver config
    * `spark.sql.sources.binaryFile.maxLength` (2 GB hard cap per file —
    * larger media must land pre-chunked). */
  def binaryFiles(spark: SparkSession, dir: String,
      pathGlobFilter: Option[String] = None,
      recursive: Boolean = true): DataFrame = {
    val base = spark.read.format("binaryFile")
      .option("recursiveFileLookup", recursive.toString)
    pathGlobFilter.fold(base)(g => base.option("pathGlobFilter", g)).load(dir)
  }

  /** binaryFile rows bridged into the multimodal pipeline's
    * [[graft.operators.Multimodal.MediaRecord]] shape: a stable 64-bit id
    * from the path digest (content-independent, so re-landing the same
    * path updates in place), media type from the file extension. From
    * here `Multimodal.decodeStub`/`features` apply unchanged — this is
    * the missing hop between files on disk and the feature extractor. */
  def binaryAsMedia(spark: SparkSession, dir: String,
      pathGlobFilter: Option[String] = None):
      org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    binaryFiles(spark, dir, pathGlobFilter)
      .select(
        xxhash64(col("path")).as("doc_id"),
        // extension → media type; unknown extensions stay opaque binary
        when(col("path").rlike("(?i)\\.(jpg|jpeg)$"), "image/jpeg")
          .when(col("path").rlike("(?i)\\.png$"), "image/png")
          .when(col("path").rlike("(?i)\\.(wav|wave)$"), "audio/wav")
          .when(col("path").rlike("(?i)\\.mp4$"), "video/mp4")
          .otherwise("application/octet-stream").as("media_type"),
        col("content").as("payload"))
      .as[graft.operators.Multimodal.MediaRecord]
  }
}
