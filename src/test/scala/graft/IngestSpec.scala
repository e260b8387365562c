package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** JSON decode chain (SURVEY.md §2 A2-A5): valid, malformed, missing-field
  * and bad-timestamp payloads. */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  private def raw(jsons: String*) =
    jsons.toDF("s").select($"s".cast("binary").as("value"))

  test("valid reading decodes with typed timestamp") {
    val df = Ingest.decode(raw(
      """{"device_id":"sensor_1","device_type":"temperature","location":"room1",
         "value":21.5,"battery_level":88.0,"timestamp":"2024-01-01T10:00:30"}"""
        .replaceAll("\n\\s*", "")))
    val r = df.collect().head
    assert(r.getAs[String]("device_id") == "sensor_1")
    assert(r.getAs[Double]("value") == 21.5)
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant.toString
      == "2024-01-01T10:00:30Z")
  }

  test("malformed JSON yields null fields (reference silent-null parity)") {
    val df = Ingest.decode(raw("""not json at all"""))
    val r = df.collect().head
    assert(r.isNullAt(r.fieldIndex("device_id")))
  }

  test("missing fields decode as nulls, present ones survive") {
    val df = Ingest.decode(raw("""{"device_id":"x"}"""))
    val r = df.collect().head
    assert(r.getAs[String]("device_id") == "x")
    assert(r.isNullAt(r.fieldIndex("value")))
  }

  test("unparseable timestamp casts to null, not an error") {
    val df = Ingest.decode(raw(
      """{"device_id":"x","timestamp":"yesterday-ish"}"""))
    assert(df.collect().head.isNullAt(df.schema.fieldIndex("timestamp")))
  }

  test("decodeWithCorrupt keeps raw payload only for bad rows") {
    val df = Ingest.decodeWithCorrupt(raw(
      """{"device_id":"ok","device_type":"t","location":"l","value":1.0,
         "battery_level":2.0,"timestamp":"2024-01-01T00:00:00"}"""
        .replaceAll("\n\\s*", ""),
      """garbage"""))
    val rows = df.orderBy($"_corrupt".asc_nulls_first).collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("_corrupt")))
    assert(rows(1).getAs[String]("_corrupt") == "garbage")
  }
}
