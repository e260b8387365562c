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
}
