package graft

import org.apache.spark.sql.functions._

import graft.functions.ResultCache
import graft.sources.SensorGen

/** ResultCache (B9 parity) and SensorGen (C1 parity) behavior. */
class ComponentSpec extends SparkSuite {
  import spark.implicits._

  test("integer division truncates toward zero on negative operands (davg contract)") {
    // Num.davg's half-away-from-zero rounding feeds a NEGATIVE numerator
    // to `div` for negative averages (log-probs), so its cross-engine
    // exactness rests on Spark `div` and DuckDB `//` agreeing there.
    // Pin Spark's side; DuckDB's was measured directly (-7 // 2 = -3,
    // truncation, not floor — same for HUGEINT) and every davg oracle
    // re-verifies it empirically at each sweep. If either engine ever
    // flipped to floor division this would drift by one output ulp.
    val r = spark.sql(
      "SELECT -7 div 2 AS a, 7 div 2 AS b, CAST(-7 AS DECIMAL(38,0)) div 2 AS c")
      .collect().head
    assert(r.getLong(0) == -3L, "Spark div no longer truncates toward zero")
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == -3L, "DECIMAL div no longer truncates toward zero")
  }

  test("rangeBucket: monotone, in-range on sparse 63-bit id spans (overflow contract)") {
    // The divide-first form exists because the multiply-first binning
    // `((v - lo) * n) div (hi - lo + 1)` overflows Long once the key span
    // exceeds Long.MaxValue/n — snowflake-style sparse ids. Under ANSI
    // mode (Spark 4 default, ours) that ABORTS the whole job at runtime;
    // with ANSI off it silently wraps into negative, non-monotone
    // buckets. Pin both halves of the claim at the worst span.
    import graft.operators.PipelineOps
    val hi = Long.MaxValue - 1
    val ids = Seq(0L, hi / 7, hi / 3, hi / 2, hi - 5, hi)
    val df = ids.toDF("id")
      .withColumn("lo", lit(0L)).withColumn("hi", lit(hi))
    val bkts = df.withColumn("bkt", PipelineOps.rangeBucket("id", "lo", "hi", 32))
      .orderBy("id").select("bkt").as[Long].collect()
    assert(bkts.forall(b => b >= 0 && b < 32),
      s"bucket out of [0,32): ${bkts.mkString(",")}")
    assert(bkts.sameElements(bkts.sorted), "binning is not monotone in the key")
    // degenerate single-key span: everything lands in bucket 0, no div-by-0
    val one = Seq(42L).toDF("id")
      .withColumn("lo", lit(42L)).withColumn("hi", lit(42L))
      .select(PipelineOps.rangeBucket("id", "lo", "hi", 32)).as[Long].head()
    assert(one == 0L)
    // and the multiply-first form really does overflow here — under ANSI
    // that kills the query (if this stops throwing, Spark changed
    // overflow semantics: re-evaluate rangeBucket's comment)
    val ex = intercept[Exception] {
      df.withColumn("b", expr("((id - lo) * 32) div (hi - lo + 1)"))
        .select("b").as[Long].collect()
    }
    def overflowy(t: Throwable): Boolean = t != null &&
      (t.isInstanceOf[ArithmeticException] || overflowy(t.getCause))
    assert(overflowy(ex), s"expected an arithmetic overflow, got $ex")
  }

  test("ResultCache: hit within TTL, rebuild after expiry, invalidate works") {
    var now = 0L
    var builds = 0
    val cache = new ResultCache(ttlMillis = 1000L, clock = () => now)
    def build = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val a = cache.getOrBuild("k")(build)
    val b = cache.getOrBuild("k")(build)
    assert(builds == 1 && (a eq b))          // served from cache
    assert(cache.contains("k"))
    now = 1500L                              // past the deadline
    assert(!cache.contains("k"))
    cache.getOrBuild("k")(build)
    assert(builds == 2)                      // rebuilt after expiry
    cache.invalidate("k")
    cache.getOrBuild("k")(build)
    assert(builds == 3)                      // rebuilt after invalidate
  }

  test("Salting.saltedEquiJoin: identical result to the plain join") {
    import graft.operators.Salting
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val r = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .toDF("l_orderkey", "o_totalprice")
    val plain = l.join(r, Seq("l_orderkey"))
    val salted = Salting.saltedEquiJoin(l, r, "l_orderkey",
      saltBy = col("l_linenumber"), factor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("Sinks.idempotentParquet: replaying a batch does not duplicate rows") {
    import graft.operators.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val batch = Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
    Sinks.idempotentParquet(batch, dir, "day")
    val n1 = spark.read.parquet(dir).count()
    Sinks.idempotentParquet(batch, dir, "day") // replay same batch
    val n2 = spark.read.parquet(dir).count()
    assert(n1 == n2, s"replay duplicated rows: $n1 -> $n2")
    // append sink, by contrast, duplicates (the reference's behavior)
    Sinks.appendParquet(batch.drop("day"), s"$dir-append")
    Sinks.appendParquet(batch.drop("day"), s"$dir-append")
    assert(spark.read.parquet(s"$dir-append").count() == 2 * n1)
  }

  test("dynamicFilter composes pushed-down equality conjuncts") {
    import graft.operators.RelationalQueries.dynamicFilter
    val e = Tables.events(spark, sf)
    val both = dynamicFilter(e, Map("event_type" -> "purchase", "user_id" -> 7))
    val manual = e.filter(col("event_type") === "purchase" && col("user_id") === 7)
    assert(both.count() == manual.count())
    assert(dynamicFilter(e, Map.empty).count() == e.count())
    val scan = both.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(event_type,purchase)"))
  }

  test("bucketed tables: co-located join plans without a shuffle") {
    // default warehouse dir (spark-warehouse/, gitignored) — the
    // warehouse location is a static conf, not settable post-session.
    // DROP TABLE only clears this JVM's in-memory catalog; stale dirs
    // from previous JVMs must be removed physically.
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    val planStr = joined.queryExecution.executedPlan.toString
    // bucket-aligned scan: join consumes both sides with NO exchange
    assert(!planStr.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$planStr")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }

  test("partitioned parquet: lang filter becomes a partition filter (pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sf).write.mode("overwrite").partitionBy("lang").parquet(dir)
    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    val planStr = en.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("lang"))
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(en.count() == expected)
    // pruned scan reads only the en=... directory
    assert(planStr.contains("isnotnull(lang") || planStr.contains("(lang"))
  }

  test("SensorGen.batch: reference value domains, deterministic by seed") {
    val df = SensorGen.batch(spark, 500).cache()
    val types = df.select("device_type").distinct().as[String].collect().toSet
    assert(types.subsetOf(SensorGen.deviceTypes.toSet))
    val locs = df.select("location").distinct().as[String].collect().toSet
    assert(locs.subsetOf(SensorGen.locations.toSet))
    val mm = df.agg(min("value"), max("value"), min("battery_level"), max("battery_level"))
      .collect().head
    assert(mm.getDouble(0) >= 0 && mm.getDouble(1) <= 100)
    assert(mm.getDouble(2) >= 0 && mm.getDouble(3) <= 100)
    assert(df.filter(!col("device_id").rlike("^sensor_([1-9][0-9]?|100)$")).count() == 0)
    // deterministic: same seed → same rows; different seed → different
    val again = SensorGen.batch(spark, 500)
    assert(again.exceptAll(df).count() == 0)
    val other = SensorGen.batch(spark, 500, seed = 7L)
    assert(other.exceptAll(df).count() > 0)
    // pipes cleanly through the reference aggregation
    val aggs = operators.WindowAgg.sensorAggregates(df, watermark = None)
    assert(aggs.agg(sum("reading_count")).collect().head.getLong(0) == 500)
  }

  test("SQL-surface builders are race-free under concurrent construction across dirs") {
    // regression for the fixed-temp-view-name hazard: rolling_1h and
    // sql_over_view used global view names, so two concurrent builds
    // against different data dirs could silently read each other's data.
    // Unique per-call names (dropped post-analysis) must make concurrent
    // construction agree with sequential results.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val names = Seq("rolling_1h", "sql_over_view", "grouping_sets_orders")
    val expected = (for { d <- dirs; n <- names }
      yield (n, d) -> SparkEntry.queries(n)(spark, d).count()).toMap
    val futs = for { _ <- 1 to 5; d <- dirs; n <- names } yield Future {
      (n, d, SparkEntry.queries(n)(spark, d).count())
    }
    Await.result(Future.sequence(futs), 180.seconds).foreach { case (n, d, c) =>
      assert(c == expected((n, d)), s"$n against $d diverged under concurrency")
    }
  }

  test("Sinks.compactedParquet: upsert keeps the newest row per key, replay-safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val b1 = Seq(("k1", 1L, "v1"), ("k2", 1L, "v2")).toDF("k", "ver", "payload")
    val b2 = Seq(("k1", 2L, "v1b"), ("k3", 1L, "v3")).toDF("k", "ver", "payload")
    operators.Sinks.compactedParquet(b1, dir, Seq("k"), "ver")
    operators.Sinks.compactedParquet(b2, dir, Seq("k"), "ver")
    def snapshot() = spark.read.parquet(dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val expect = Set(("k1", 2L, "v1b"), ("k2", 1L, "v2"), ("k3", 1L, "v3"))
    assert(snapshot() == expect)
    // replaying the last batch must not change the table (at-least-once safe)
    operators.Sinks.compactedParquet(b2, dir, Seq("k"), "ver")
    assert(snapshot() == expect)
  }

  test("TopKIdsAgg: buffer stays bounded and sorted under NaN inputs") {
    // regression: `>` is false both ways for NaN, which let a NaN entry
    // bypass the full-buffer reject branch and append past k. Under the
    // Double.compare total order NaN ranks above every real value, the
    // buffer never exceeds k, and output is deterministic.
    val agg = functions.TopKIdsAgg(3)
    val nan = Double.NaN
    var buf = agg.zero
    Seq((1.0, 1L), (2.0, 2L), (3.0, 3L), (nan, 4L), (nan, 5L), (2.5, 6L))
      .foreach { case (v, id) => buf = agg.reduce(buf, functions.TopKAgg.In(v, id)) }
    assert(buf.entries.size <= 3, s"buffer grew past k: ${buf.entries}")
    // NaN sorts first (total order), then 3.0 — and merge keeps the bound
    assert(agg.finish(buf) == "4,5,3")
    // merging a buffer with itself models duplicate rows across partitions:
    // duplicates legitimately occupy slots (list-with-duplicates semantics,
    // same as the DuckDB oracle's list(...)[1:k]) but the bound must hold
    val merged = agg.merge(buf, buf)
    assert(merged.entries.size <= 3)
    assert(agg.finish(merged) == "4,4,5")
  }

  test("SQL-first parity: the whole registry is reachable and composable through spark.sql") {
    // the reference's ad-hoc surface is raw SQL (app.py:114-288); after
    // registerAll every engine capability is a named temp view a SQL user
    // can SELECT from and JOIN — this walks the FULL registry through the
    // catalog, executes a cross-family sample through spark.sql, and
    // composes two views in one statement
    val names = SparkEntry.registerAll(spark, sf)
    assert(names.size == SparkEntry.all.size)
    names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n missing from the catalog")
    }
    // execute a cross-family sample through the SQL entry path and pin it
    // to the direct plan output (same rows, same order)
    val sample = Seq("windowed_agg", "q1_pricing", "dedup_exact", "url_normalize",
      "html_text", "warc_records", "bm25_topk", "token_count", "ann_ivf_topk",
      "zorder_cells")
    assert(sample.forall(names.contains), "sample names drifted from the registry")
    sample.foreach { n =>
      val viaSql = spark.sql(s"SELECT * FROM `$n`").collect()
      val direct = SparkEntry.queries(n)(spark, sf).collect()
      assert(viaSql.sameElements(direct), s"$n: SQL view diverges from the direct plan")
    }
    // composition: join two capability views in ONE SQL statement
    val fused = spark.sql("""
      SELECT h.doc_id, h.content_chars, w.content_length
      FROM html_text h JOIN warc_records w USING (doc_id)
      WHERE h.content_chars > 0
      ORDER BY h.doc_id LIMIT 5""").collect()
    assert(fused.nonEmpty, "composed SQL over two capability views returned nothing")
    fused.foreach(r => assert(r.getLong(2) > r.getLong(1),
      "warc record length must exceed its extracted content"))
    // round-10 families compose the same way: head metadata × canonical
    // URLs (the rel=canonical cross-check, this time as a SQL user would
    // write it) and the chat lint × normalization readouts on one key
    val canon = spark.sql("""
      SELECT m.doc_id
      FROM html_meta m JOIN url_normalize u USING (doc_id)
      WHERE m.canonical_url != u.canonical_url""").collect()
    assert(canon.isEmpty,
      "rel=canonical must agree with url_normalize on every doc")
    val lint = spark.sql("""
      SELECT l.source, l.valid_rate, r.mojibake_rate
      FROM chat_lint l JOIN mojibake_rate r USING (source)
      ORDER BY l.source LIMIT 5""").collect()
    assert(lint.nonEmpty, "chat lint × mojibake rate composition returned nothing")
  }
}
