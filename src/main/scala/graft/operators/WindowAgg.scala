package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation — the reference engine's core
  * computation (reference `spark-processor/processor.py:82-95`): watermark →
  * `window(ts, dur)` grouping → avg/min/max/count, flattened to the
  * `sensor_aggregates` output shape (`api-service/app.py:89-102`).
  *
  * One plan builder serves both execution modes: applied to a streaming
  * DataFrame it compiles to StateStoreSave (incremental, watermark-bounded
  * state); applied to a batch DataFrame it is an ordinary two-phase hash
  * aggregate (partial map-side combine → shuffle on the window+keys → final),
  * which is exactly the shape that scales: state/shuffle is proportional to
  * group cardinality, never input size.
  */
object WindowAgg {

  /** Reference-parity sensor rollup: group by (1-min window, device_type,
    * location), compute avg/min/max value, avg battery, count. */
  def sensorAggregates(
      readings: DataFrame,
      windowDuration: String = "1 minute",
      watermark: Option[String] = Some("1 minute")): DataFrame = {
    val withWm = watermark.fold(readings)(readings.withWatermark("timestamp", _))
    withWm
      .groupBy(
        window(col("timestamp"), windowDuration),
        col("device_type"), col("location"))
      .agg(
        avg("value").as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        avg("battery_level").as("avg_battery"),
        count(lit(1)).as("reading_count"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("device_type"), col("location"),
        col("avg_value"), col("min_value"), col("max_value"),
        col("avg_battery"), col("reading_count"))
  }

  /** Generic tumbling-window rollup over any (tsCol, keys, valueCol) —
    * the same plan shape over the harness `events` table. Aggregates are
    * routed through exact decimal sums (see [[graft.functions.Num]]) so the
    * result is order-independent and oracle-comparable. */
  def tumbling(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCol: String,
      windowDuration: String = "1 minute"): DataFrame = {
    import graft.functions.Num
    // decimal scale 6: covers inputs with up to 6 decimals exactly — a
    // 2-decimal corpus is unchanged, arbitrary doubles lose <5e-7 (vs the
    // order-dependent error a plain double sum has at high parallelism)
    df.groupBy(window(col(tsCol), windowDuration) +: keys.map(col): _*)
      .agg(
        Num.davg(valueCol, scale = 6).as("avg_value"),
        min(valueCol).as("min_value"),
        max(valueCol).as("max_value"),
        Num.dsumAsDouble(col(valueCol), scale = 6).as("sum_value"),
        count(lit(1)).as("reading_count"))
      .select(
        (col("window.start").as("window_start") +:
         col("window.end").as("window_end") +:
         keys.map(col)) ++
        Seq(col("avg_value"), col("min_value"), col("max_value"),
            col("sum_value"), col("reading_count")): _*)
  }
}
