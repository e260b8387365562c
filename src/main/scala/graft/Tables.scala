package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed loaders for the harness testdata (`/root/testdata/sf*`).
  *
  * Schemas are DECLARED, never inferred: at production scale (100 TB =
  * millions of parquet files) schema inference costs a footer sweep before the
  * first task runs, and silently widens types on drift. The reference takes
  * the same declared-schema stance for its stream
  * (`spark-processor/processor.py:48-55`); we extend it to every table.
  *
  * `events.ts` is written as parquet INT64 TIMESTAMP(NANOS) which Spark 4
  * refuses to map to TimestampType. We read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong=true`) and truncate to
  * microseconds — exactly the coercion DuckDB applies, so oracle comparisons
  * agree (see FIXTURES.md §2).
  */
object Tables {

  /** Monotonic suffix for per-call unique temp-view names — catalog
    * hygiene for the SQL-only query surfaces (views are registered inside
    * try, inlined by sql()'s eager analysis, and dropped in finally, so
    * concurrent builds against different dirs can't read each other's
    * data). Lives here, not in a query module: it's shared infrastructure
    * for every module that needs a view. */
  val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Raw (pre-conversion) events schema: ts is INT64 nanos on disk. */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema, "nation" -> nationSchema,
    "customer" -> customerSchema, "supplier" -> supplierSchema,
    "part" -> partSchema, "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema, "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** SQL conf required to read the ns-typed events file at all (no per-read
    * parquet option exists for it — verified against ParquetOptions in
    * Spark 4.1). Our mains/suites set it at session BUILD time so plan
    * construction never mutates session state; [[ensureNanosAsLong]] is the
    * idempotent fallback for externally-built sessions (the harness driver
    * smoke-checks `SparkEntry.entry(spark)` with its own session). */
  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Bootstrap-on-first-use guard: reads are cheap, the set runs at most
    * once per session and only converges the conf to the constant "true"
    * under a lock — no torn state under concurrent plan building (the
    * round-1 version set it unconditionally on every call). */
  private def ensureNanosAsLong(spark: SparkSession): Unit =
    if (spark.conf.get(NanosAsLongConf, "false") != "true")
      Tables.synchronized {
        if (spark.conf.get(NanosAsLongConf, "false") != "true")
          spark.conf.set(NanosAsLongConf, "true")
      }

  /** Events with `ts` converted nanos → TimestampType (µs, truncating —
    * matches DuckDB's parquet ns → TIMESTAMP coercion). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosAsLong(spark)
    spark.read.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Events restricted to `ts >= sinceMicros`, with the bound translated
    * onto the RAW nanos column BEFORE the timestamp conversion. A filter
    * on the converted column cannot push past the `timestamp_micros(ns
    * div 1000)` projection, so it scans everything; filtering the raw
    * INT64 reaches the parquet scan as a pushed filter and skips row
    * groups by min/max — at 100 TB the difference between reading a time
    * slice and reading the table. Exact: floor(ns/1000) ≥ T ⟺
    * ns ≥ 1000·T — for NONNEGATIVE epochs. `ts div 1000` truncates toward
    * zero, so for pre-1970 nanos truncation ≠ floor and the raw-column
    * bound would drop rows the converted-column filter keeps; guarded
    * rather than silently diverging. */
  def eventsSince(spark: SparkSession, dir: String, sinceMicros: Long): DataFrame = {
    require(sinceMicros >= 0,
      "eventsSince requires a nonnegative epoch bound: the raw-nanos " +
        "pushdown is equivalence-proven only for ts >= 0 (div truncates)")
    ensureNanosAsLong(spark)
    spark.read.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet")
      .filter(col("ts") >= sinceMicros * 1000L)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")
}
