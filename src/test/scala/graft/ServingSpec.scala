package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ResultCache
import graft.operators.WindowAgg
import graft.serving.ApiServer
import graft.sources.SensorGen

/** The serving layer (reference `api-service/app.py`) end-to-end over the
  * engine's own pipeline: SensorGen readings → WindowAgg rollup → HTTP.
  * Every assertion recomputes the expectation directly from the frames the
  * server was given, so the HTTP layer is checked against the engine, not
  * against itself. */
class ServingSpec extends SparkSuite {

  private val http = HttpClient.newHttpClient()
  private def get(port: Int, path: String): (Int, String) = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  // 600 readings, 1/s from 2024-01-01 00:00:00 → spans ten 1-min windows
  private lazy val raw: DataFrame = SensorGen.batch(spark, 600).cache()
  private lazy val agg: DataFrame =
    WindowAgg.sensorAggregates(raw, watermark = None).cache()
  // NOW() for the lookback: just past the end of the data
  private val now = Instant.parse("2024-01-01T00:10:00Z")

  private def withServer[A](cache: ResultCache = new ResultCache())(
      f: (Int, ResultCache) => A): A = {
    val srv = new ApiServer(() => raw, () => agg, cache, () => now).start()
    try f(srv.boundPort, cache) finally srv.stop()
  }

  test("GET /health reports healthy with the injected clock") {
    withServer() { (port, _) =>
      val (code, body) = get(port, "/health")
      assert(code == 200)
      assert(body.contains("\"status\": \"healthy\""))
      assert(body.contains(now.toString))
    }
  }

  test("GET /api/sensors returns every distinct device triple, ordered (app.py:122-126)") {
    withServer() { (port, _) =>
      val (code, body) = get(port, "/api/sensors")
      assert(code == 200)
      val expected = raw.select("device_id", "device_type", "location").distinct().count()
      assert(countObjects(body) == expected)
      // ordered by (device_type, location): extract the pair sequence
      val pairs = """"device_type":"([a-z_]+)","location":"([a-z_0-9]+)"""".r
        .findAllMatchIn(body).map(m => (m.group(1), m.group(2))).toVector
      assert(pairs == pairs.sorted, "response not ordered by (device_type, location)")
    }
  }

  test("GET /api/data/latest: LIMIT 100 newest, unfiltered requests bypass the cache") {
    withServer() { (port, cache) =>
      val (code, body) = get(port, "/api/data/latest")
      assert(code == 200)
      assert(countObjects(body) == 100)
      // newest timestamp present, oldest absent (rows are 1 s apart)
      val newest = raw.agg(max("timestamp")).head().getTimestamp(0)
      assert(body.contains(newest.toInstant.toString.stripSuffix("Z").replace('T', ' ')
        .take(19)) || body.contains("2024-01-01T00:09:59"))
      assert(!cache.contains("latest:None:None"), "unfiltered request must not cache (app.py:178)")
    }
  }

  test("GET /api/data/latest?device_type=: filter applies and result is cached under the reference key") {
    withServer() { (port, cache) =>
      val (code, body) = get(port, "/api/data/latest?device_type=temperature")
      assert(code == 200)
      val n = countObjects(body)
      val expected = math.min(100, raw.filter(col("device_type") === "temperature").count())
      assert(n == expected)
      // only the requested type appears
      assert("""\"device_type\":\"(\w+)\"""".r.findAllMatchIn(body)
        .forall(_.group(1) == "temperature"))
      assert(cache.contains("latest:temperature:None"), "filtered result must be cached (app.py:180)")
      // second request serves from the cached frame (same body)
      assert(get(port, "/api/data/latest?device_type=temperature")._2 == body)
    }
  }

  test("GET /api/aggregates: lookback + ordering + conjunctive filters (app.py:189-227)") {
    withServer() { (port, _) =>
      // 24 h lookback covers all ten windows
      val (c1, b1) = get(port, "/api/aggregates?hours=24")
      assert(c1 == 200)
      assert(countObjects(b1) == agg.count())
      // window_start DESC ordering
      val starts = """"window_start":"([^"]+)"""".r.findAllMatchIn(b1).map(_.group(1)).toVector
      assert(starts == starts.sorted.reverse)
      // hours=1 from 00:10 covers windows starting ≥ 23:10 prev day → all ten too;
      // use a filter to narrow: location filter must match the engine count
      val (c2, b2) = get(port, "/api/aggregates?hours=24&location=kitchen")
      assert(c2 == 200)
      assert(countObjects(b2) == agg.filter(col("location") === "kitchen").count())
    }
  }

  test("GET /api/aggregates validates hours into [1,24] like FastAPI (app.py:193)") {
    withServer() { (port, _) =>
      assert(get(port, "/api/aggregates?hours=25")._1 == 422)
      assert(get(port, "/api/aggregates?hours=0")._1 == 422)
      assert(get(port, "/api/aggregates?hours=abc")._1 == 422)
      assert(get(port, "/api/aggregates?hours=24")._1 == 200)
    }
  }

  test("GET /api/stats matches the engine's own counts (app.py:238-288)") {
    withServer() { (port, _) =>
      val (code, body) = get(port, "/api/stats")
      assert(code == 200)
      assert(body.contains(s""""total_readings": ${raw.count()}"""))
      // every device type's count appears in the distribution
      raw.groupBy("device_type").count().collect().foreach { r =>
        assert(body.contains(s""""${r.getString(0)}": ${r.getLong(1)}"""))
      }
      val earliest = raw.agg(min("timestamp")).head().getTimestamp(0).toInstant.toString
      assert(body.contains(earliest))
    }
  }

  test("GET /api/aggregates pages under the cap: stable order, X-Next-Cursor chain") {
    // a tiny injected cap (7) exercises the truncation path the real
    // MaxQueryRows=1000 only hits at 100× group cardinality
    val srv = new ApiServer(() => raw, () => agg, new ResultCache(),
      () => now, maxRows = 7).start()
    try {
      val port = srv.boundPort
      val total = agg.count().toInt
      assert(total > 7, "fixture must overflow the injected cap")
      // walk the cursor chain; pages must concatenate to the full result
      var cursor = Option(0)
      val pages = Vector.newBuilder[String]
      var guard = 0
      while (cursor.isDefined && guard < 100) {
        val resp = http.send(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/api/aggregates?hours=24&cursor=${cursor.get}"))
            .GET().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200)
        val n = countObjects(resp.body())
        cursor = Option(resp.headers()
          .firstValue(ApiServer.NextCursorHeader).orElse(null)).map(_.toInt)
        if (cursor.isDefined)
          assert(n == 7, s"non-final page carried $n rows, expected the cap")
        pages += resp.body()
        guard += 1
      }
      val all = pages.result()
      assert(all.map(countObjects).sum == total,
        "cursor chain did not cover the full result exactly once")
      // pages are stable and disjoint: the window_start+type+loc triples
      // across pages must equal the engine's own ordered sequence
      val key = """"window_start":"([^"]+)","window_end":"[^"]+","device_type":"([^"]+)","location":"([^"]+)"""".r
      val served = all.flatMap(b =>
        key.findAllMatchIn(b).map(m => (m.group(1), m.group(2), m.group(3))))
      assert(served.distinct.size == total, "pages overlap or drop rows")
      // an invalid cursor is a 422, like the hours validation
      assert(get(port, "/api/aggregates?cursor=-1")._1 == 422)
      assert(get(port, "/api/aggregates?cursor=abc")._1 == 422)
      // /api/stats under the same cap: each distribution truncates to the
      // cap under its OWN cursor + continuation header (5 types / 6
      // locations > 4; a shared cursor couldn't tell "no such keys" from
      // "page past the shorter distribution's end")
      val srv2 = new ApiServer(() => raw, () => agg, new ResultCache(),
        () => now, maxRows = 4)
      srv2.start()
      try {
        def statsGet(path: String) = http.send(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:${srv2.boundPort}$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        val r1 = statsGet("/api/stats")
        assert(r1.statusCode() == 200)
        assert(r1.headers().firstValue(ApiServer.NextCursorTypeHeader).orElse("") == "4",
          "type distribution over the cap must carry its next cursor")
        assert(r1.headers().firstValue(ApiServer.NextCursorLocationHeader).orElse("") == "4",
          "location distribution over the cap must carry its next cursor")
        // bare `cursor` stays the set-both shorthand
        val page2 = statsGet("/api/stats?cursor=4")
        assert(page2.statusCode() == 200)
        // 5 types / 6 locations: page 2 holds the remaining 1 + 2 entries
        // and no further continuation on either distribution
        assert(page2.headers().firstValue(ApiServer.NextCursorTypeHeader).isEmpty)
        assert(page2.headers().firstValue(ApiServer.NextCursorLocationHeader).isEmpty)
        val typeEntries = """"device_type_distribution": \{([^}]*)\}""".r
          .findFirstMatchIn(page2.body()).get.group(1)
        assert(typeEntries.split(",").count(_.contains(":")) ==
          raw.select("device_type").distinct().count().toInt - 4)
        // asymmetric paging: advance ONLY the location cursor — the type
        // distribution restarts at its full first page (with continuation)
        // while location reaches its own end
        val asym = statsGet("/api/stats?cursor_location=4")
        assert(asym.statusCode() == 200)
        assert(asym.headers().firstValue(ApiServer.NextCursorTypeHeader).orElse("") == "4")
        assert(asym.headers().firstValue(ApiServer.NextCursorLocationHeader).isEmpty)
        val locEntries = """"location_distribution": \{([^}]*)\}""".r
          .findFirstMatchIn(asym.body()).get.group(1)
        assert(locEntries.split(",").count(_.contains(":")) ==
          raw.select("location").distinct().count().toInt - 4)
        assert(statsGet("/api/stats?cursor_type=-1").statusCode() == 422)
      } finally srv2.stop()
    } finally srv.stop()
  }

  test("expired cache entries rebuild: TTL semantics mirror the 300 s setex (app.py:183)") {
    @volatile var tick = 0L
    val cache = new ResultCache(ttlMillis = 300000L, clock = () => tick)
    withServer(cache) { (port, _) =>
      get(port, "/api/data/latest?location=kitchen")
      assert(cache.contains("latest:None:kitchen"))
      tick = 300001L // past the TTL deadline
      assert(!cache.contains("latest:None:kitchen"))
      // request after expiry rebuilds and re-caches
      assert(get(port, "/api/data/latest?location=kitchen")._1 == 200)
      assert(cache.contains("latest:None:kitchen"))
    }
  }

  test("GET /api/query/<name> serves the registered repertoire with a bounded limit") {
    val reg = ApiServer.QueryRegistry(spark, sf, SparkEntry.queries)
    val srv = new ApiServer(() => raw, () => agg, new ResultCache(),
      () => now, port = 0, registry = Some(reg)).start()
    try {
      val port = srv.boundPort
      // a registered relational query over the harness tables
      val (c1, b1) = get(port, "/api/query/groupby_count")
      assert(c1 == 200)
      val expected = SparkEntry.queries("groupby_count")(spark, sf).count()
      assert(countObjects(b1) == math.min(100, expected))
      // the limit parameter applies and is capped server-side
      assert(countObjects(get(port, "/api/query/distinct_pairs?limit=7")._2) == 7)
      val (cBig, bBig) = get(port, s"/api/query/distinct_pairs?limit=99999")
      assert(cBig == 200)
      assert(countObjects(bBig) <= ApiServer.MaxQueryRows)
      // unknown names 404 instead of evaluating anything
      assert(get(port, "/api/query/drop_tables")._1 == 404)
    } finally srv.stop()
  }

  test("end-to-end reference topology: generate -> stream-process -> dual sinks -> serve") {
    // the whole docker-compose in one JVM: the DataSource V2 generator
    // micro-batch stream (C1/A1 stand-in) through the real decode-free
    // pipeline into BOTH sinks (A11-A14), then the serving layer answers
    // HTTP from what the pipeline landed (EP2) — each layer is tested
    // in isolation elsewhere; this pins the seams between them
    val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-ckpt").toString
    val rawOut = java.nio.file.Files.createTempDirectory("graft-e2e-raw").toString
    val aggOut = java.nio.file.Files.createTempDirectory("graft-e2e-agg").toString
    val stream = spark.readStream.format("graft-sensors")
      .option("rows", 600).option("rowsPerBatch", 150).load()
    val (aggQ, rawQ) = graft.streaming.StreamingPipeline.runBoth(
      stream, ckpt,
      aggSink = (df, _) => graft.operators.Sinks.appendParquet(df, aggOut),
      rawSink = (df, _) => graft.operators.Sinks.appendParquet(df, rawOut))
    try { aggQ.processAllAvailable(); rawQ.processAllAvailable() }
    finally { aggQ.stop(); rawQ.stop() }

    // serve what the pipeline landed: suppliers re-read the sink dirs
    val srv = new ApiServer(
      () => spark.read.parquet(rawOut),
      () => spark.read.parquet(aggOut),
      new ResultCache(), () => now).start()
    try {
      val port = srv.boundPort
      val (c1, stats) = get(port, "/api/stats")
      assert(c1 == 200)
      assert(stats.contains("\"total_readings\": 600"),
        s"raw sink must land every generated row: $stats")
      // 600 rows at 1/s from 00:00 → watermark closes windows ending
      // <= 00:08:59: exactly eight 1-minute windows reach the agg sink
      val (c2, aggs) = get(port, "/api/aggregates?hours=24")
      assert(c2 == 200)
      val starts = """"window_start":"([^"]+)"""".r
        .findAllMatchIn(aggs).map(_.group(1)).toSet
      assert(starts.size == 8, s"expected 8 closed windows, got $starts")
      // per-window reading counts over the whole response must cover all
      // rows in closed windows: 8 windows x 60 rows
      val counts = """"reading_count":(\d+)""".r
        .findAllMatchIn(aggs).map(_.group(1).toLong).toSeq
      assert(counts.sum == 480, s"closed-window rows: ${counts.sum}")
      // the serving layer computes over the same frames the sinks wrote
      val (c3, sensors) = get(port, "/api/sensors")
      assert(c3 == 200 && countObjects(sensors) ==
        spark.read.parquet(rawOut)
          .select("device_id", "device_type", "location").distinct().count())
    } finally srv.stop()
  }

  /** Count top-level JSON objects in a one-level array of flat objects. */
  private def countObjects(arrayJson: String): Long =
    if (arrayJson == "[]") 0L else arrayJson.count(_ == '{').toLong
}
