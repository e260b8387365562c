package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-ingest pipeline: raw Kafka-shaped bytes → typed rows.
  *
  * Re-expresses the reference's decode chain (reference
  * `spark-processor/processor.py:72-76`: CAST value to string → `from_json`
  * against a declared schema → flatten → ISO-string timestamp cast) as a
  * reusable `DataFrame => DataFrame` plan fragment. Works identically on a
  * streaming DataFrame (Kafka source) and a batch DataFrame, because it is
  * pure logical-plan construction.
  *
  * Scale notes: `from_json` (JsonToStructs) is a codegen'd Catalyst
  * expression — the whole decode chain stays inside one WholeStageCodegen
  * span, no UDF boundary, no shuffle. Malformed JSON yields null structs
  * (PERMISSIVE mode, same silent-null semantics as the reference); callers
  * that need auditing can use [[decodeWithCorrupt]] which keeps the raw
  * payload of bad records instead of dropping them.
  */
object Ingest {

  /** Declared sensor-reading schema — reference `processor.py:48-55`. */
  val sensorSchema: StructType = StructType(Seq(
    StructField("device_id", StringType),
    StructField("device_type", StringType),
    StructField("location", StringType),
    StructField("value", DoubleType),
    StructField("battery_level", DoubleType),
    StructField("timestamp", StringType)))

  /** Kafka value bytes → typed sensor rows (ts cast to event time).
    * `try_cast` (not cast): Spark 4 runs ANSI mode by default, where a bad
    * timestamp string would fail the batch — the reference's semantics are
    * silent null (`from_json` permissive + pre-ANSI cast). */
  def decode(raw: DataFrame): DataFrame =
    raw.selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), sensorSchema).as("data"))
      .select("data.*")
      .withColumn("timestamp", expr("try_cast(timestamp AS timestamp)"))

  /** Like [[decode]] but keeps a `_corrupt` column holding the raw payload
    * for rows that failed to parse (null otherwise) — data-quality audit at
    * scale instead of the reference's silent nulls. Uses PERMISSIVE mode's
    * corrupt-record column (a malformed row parses to an all-null struct,
    * NOT a null struct, so `isNull` can't detect it). */
  def decodeWithCorrupt(raw: DataFrame): DataFrame = {
    val withCorrupt = sensorSchema.add(StructField("_corrupt", StringType))
    raw.selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("data"))
      .select(col("data.*"))
      .withColumn("timestamp", expr("try_cast(timestamp AS timestamp)"))
  }
}
