package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic sensor-reading generator — the engine-side
  * analog of the reference's Kafka producer (reference
  * `data-generator/generator.py:37-48`: device_id `sensor_1..100`, 5
  * device types, 6 locations, uniform(0,100) value/battery, ISO
  * timestamp).
  *
  * Batch: `spark.range` + hash-derived columns — distributed, seeded, no
  * driver-side loop, any size. Streaming: the `rate` source mapped through
  * the same column recipe, giving a broker-free stand-in for the Kafka
  * topic at a configurable rows/sec (the reference's design point is
  * 10 msg/s, `docker-compose.yml:51`).
  */
object SensorGen {

  val deviceTypes: Seq[String] =
    Seq("temperature", "humidity", "pressure", "motion", "light")
  val locations: Seq[String] =
    Seq("room1", "room2", "kitchen", "living_room", "bathroom", "outdoor")

  /** Map an id column + seed to the sensor-reading shape. */
  private def cols(idCol: String, tsExpr: String, seed: Long) = Seq(
    concat(lit("sensor_"), (pmod(xxhash64(col(idCol), lit(seed)), lit(100)) + 1))
      .as("device_id"),
    element_at(typedlit(deviceTypes),
      (pmod(xxhash64(col(idCol), lit(seed + 1)), lit(5)) + 1).cast("int"))
      .as("device_type"),
    element_at(typedlit(locations),
      (pmod(xxhash64(col(idCol), lit(seed + 2)), lit(6)) + 1).cast("int"))
      .as("location"),
    round(pmod(xxhash64(col(idCol), lit(seed + 3)), lit(10000)) / 100.0, 2)
      .as("value"),
    (pmod(xxhash64(col(idCol), lit(seed + 4)), lit(10000)) / 100.0)
      .as("battery_level"),
    expr(tsExpr).as("timestamp"))

  /** n deterministic readings, event times spaced evenly from `start`.
    * The timestamp is built as a typed column (to_timestamp of a literal),
    * not by splicing `start` into SQL text — a quote or ISO-'T' form in
    * the string would otherwise surface as an opaque parse error. */
  def batch(spark: SparkSession, n: Long, seed: Long = 42L,
      start: String = "2024-01-01 00:00:00", stepSeconds: Int = 1): DataFrame =
    spark.range(n).select(
      cols("id", s"to_timestamp('${start.replace("'", "''")}') + make_interval(0,0,0,0,0,0, id * $stepSeconds)", seed): _*)

  /** Streaming variant over the rate source (rowsPerSecond ≈ the
    * reference's MESSAGES_PER_SECOND). */
  def stream(spark: SparkSession, rowsPerSecond: Int = 10, seed: Long = 42L): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(cols("value", "timestamp", seed): _*)
}
