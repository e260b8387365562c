package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.time.Instant
import java.util.concurrent.Executors

import scala.language.implicitConversions

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ResultCache

/** The reference's serving layer (`api-service/app.py`) re-expressed over
  * the engine itself: every endpoint's SQL runs as a Spark plan against the
  * pipeline's own tables instead of being delegated to Postgres, and the
  * Redis result cache (`app.py:143-148,179-186`) is [[ResultCache]] —
  * block-manager-pinned DataFrames with the same 300 s TTL.
  *
  * Endpoint parity (reference `api-service/app.py`):
  *  - `GET /api/sensors` — DISTINCT (device_id, device_type, location)
  *    ORDER BY device_type, location (`app.py:114-132`);
  *  - `GET /api/data/latest?device_type=&location=` — dynamic conjunctive
  *    equality filters + ORDER BY timestamp DESC LIMIT 100
  *    (`app.py:134-186`), cached under `latest:{type}:{loc}` only when a
  *    filter is present (`app.py:143,178-185`; the reference additionally
  *    skips caching empty results because Redis would serve `[]` for the
  *    TTL — a block-manager cache recomputes from lineage, so caching the
  *    empty frame is harmless and we cache unconditionally);
  *  - `GET /api/aggregates?device_type=&location=&hours=` — lookback
  *    `window_start >= NOW() - INTERVAL h HOURS` with h validated into
  *    [1, 24] (FastAPI `ge=1, le=24`, `app.py:193`; out-of-range → 422
  *    like FastAPI), ORDER BY window_start DESC (`app.py:189-227`);
  *  - `GET /health` (`app.py:229-235`);
  *  - `GET /api/stats` — total count, per-device_type and per-location
  *    distributions, global min/max timestamp (`app.py:237-288`).
  *
  * Server is the JDK's built-in `com.sun.net.httpserver` (no framework
  * dependency). Row JSON comes from `Dataset.toJSON`, so types/timestamps
  * serialize by Spark's own rules. Every endpoint's collect is bounded:
  * /api/sensors and /api/data/latest by the reference's own LIMITs, and
  * the two endpoints the reference leaves unbounded in group cardinality
  * (/api/aggregates, app.py:202-218; the /api/stats distributions,
  * app.py:247-266) by a [[maxRows]] page with an offset
  * `cursor` parameter — the body stays the reference's exact shape and
  * the continuation offset rides the [[ApiServer.NextCursorHeader]]
  * response header, so a 100×-cardinality corpus pages instead of
  * OOM-ing the driver. The heavy lifting stays distributed in the plans.
  *
  * @param raw        supplier of the `sensor_data`-shaped frame
  *                   (device_id, device_type, location, value,
  *                   battery_level, timestamp) — a supplier so a streaming
  *                   deployment can re-read the sink per request
  * @param aggregates supplier of the `sensor_aggregates`-shaped frame
  *                   (window_start, window_end, device_type, location,
  *                   avg_value, min_value, max_value, avg_battery,
  *                   reading_count)
  * @param clock      injectable NOW() for the /api/aggregates lookback
  * @param registry   optional named-query surface: when set,
  *                   `GET /api/query/<name>?limit=N` runs the registered
  *                   plan builder against the registry's pinned session +
  *                   data dir (never a client-supplied path) and returns
  *                   up to N rows (≤ [[maxRows]]) — the
  *                   engine's whole SparkEntry repertoire served the way
  *                   the reference serves Postgres SQL
  */
final class ApiServer(
    raw: () => DataFrame,
    aggregates: () => DataFrame,
    cache: ResultCache = new ResultCache(),
    clock: () => Instant = () => Instant.now(),
    port: Int = 0,
    registry: Option[ApiServer.QueryRegistry] = None,
    maxRows: Int = ApiServer.MaxQueryRows) {

  import ApiServer.Resp

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(Executors.newFixedThreadPool(4))
  server.createContext("/health", handler(health _))
  server.createContext("/api/sensors", handler(sensors _))
  server.createContext("/api/data/latest", handler(latest _))
  server.createContext("/api/aggregates", handler(aggs _))
  server.createContext("/api/stats", handler(stats _))
  registry.foreach { _ =>
    server.createContext("/api/query/", pathHandler(namedQuery _))
  }

  def start(): ApiServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort

  // ---- endpoints ---------------------------------------------------------

  private def health(q: Map[String, String]): (Int, String) =
    (200, s"""{"status": "healthy", "timestamp": ${jstr(clock().toString)}}""")

  private def sensors(q: Map[String, String]): (Int, String) =
    (200, rowsJson(
      raw().select("device_id", "device_type", "location").distinct()
        .orderBy("device_type", "location", "device_id")))

  private def latest(q: Map[String, String]): (Int, String) = {
    val dt = q.get("device_type")
    val loc = q.get("location")
    def build: DataFrame = {
      val f1 = dt.fold(raw())(v => raw().filter(col("device_type") === v))
      val f2 = loc.fold(f1)(v => f1.filter(col("location") === v))
      f2.orderBy(col("timestamp").desc, col("device_id")).limit(100)
    }
    // reference cache key shape `latest:{device_type}:{location}`
    // (app.py:143); unfiltered requests bypass the cache (app.py:178).
    val df =
      if (dt.isDefined || loc.isDefined)
        cache.getOrBuild(s"latest:${dt.getOrElse("None")}:${loc.getOrElse("None")}")(build)
      else build
    (200, rowsJson(df))
  }

  private def aggs(q: Map[String, String]): Resp = {
    val hours = q.get("hours").fold[Either[String, Int]](Right(1)) { h =>
      h.toIntOption.filter(v => v >= 1 && v <= 24)
        .toRight("hours must be an integer in [1, 24]")
    }
    (hours, cursorOf(q)) match {
      case (Left(err), _) => Resp(422, s"""{"detail": ${jstr(err)}}""")
      case (_, Left(err)) => Resp(422, s"""{"detail": ${jstr(err)}}""")
      case (Right(h), Right(cursor)) =>
        val since = Timestamp.from(clock().minusSeconds(h * 3600L))
        val base = aggregates().filter(col("window_start") >= lit(since))
        val f1 = q.get("device_type").fold(base)(v => base.filter(col("device_type") === v))
        val f2 = q.get("location").fold(f1)(v => f1.filter(col("location") === v))
        // the reference returns the whole lookback (app.py:202-218 has no
        // LIMIT), which is unbounded in the GROUP-CELL cardinality — fine
        // at 5×6 cells, a driver OOM at 100× — so the collect is capped at
        // MaxQueryRows with an offset cursor; the body stays the same bare
        // array the reference emits and the continuation rides a header.
        // The ORDER BY is total (window_start, device_type, location is
        // the aggregate's key), so pages are stable across requests.
        pageJson(f2.orderBy(col("window_start").desc,
          col("device_type"), col("location")), cursor)
    }
  }

  private def stats(q: Map[String, String]): Resp = {
    // one scan for the global numbers, one for each distribution — the
    // same four statements the reference issues (app.py:247-274). The
    // distributions are bounded only by key cardinality (app.py:247-266
    // has no LIMIT), so each is capped at MaxQueryRows entries under its
    // OWN offset cursor (`cursor_type` / `cursor_location`; bare `cursor`
    // is the set-both shorthand) with its own continuation header —
    // distributions have independent cardinalities, and a shared cursor
    // made "page past the shorter one's end" indistinguishable from "no
    // such keys". The deterministic (count desc, key) order keeps pages
    // stable.
    def cursorNamed(name: String): Either[String, Int] =
      q.get(name).orElse(q.get("cursor"))
        .fold[Either[String, Int]](Right(0)) { c =>
          c.toIntOption.filter(_ >= 0)
            .toRight(s"$name must be a non-negative integer")
        }
    (cursorNamed("cursor_type"), cursorNamed("cursor_location")) match {
      case (Left(err), _) => Resp(422, s"""{"detail": ${jstr(err)}}""")
      case (_, Left(err)) => Resp(422, s"""{"detail": ${jstr(err)}}""")
      case (Right(ct), Right(cl)) =>
        val r = raw()
        val global = r.agg(
          count(lit(1)).as("total"),
          min("timestamp").as("earliest"), max("timestamp").as("latest")).head()
        def page(keyed: DataFrame, key: String, cursor: Int): Array[org.apache.spark.sql.Row] =
          keyed.groupBy(key).agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col(key))
            .offset(cursor).limit(maxRows + 1).collect()
        val byType = page(r, "device_type", ct)
        val byLoc = page(r, "location", cl)
        def dist(rows: Array[org.apache.spark.sql.Row]): String =
          rows.take(maxRows)
            .map(r => s"${jstr(r.getString(0))}: ${r.getLong(1)}").mkString("{", ", ", "}")
        def iso(i: Int): String =
          if (global.isNullAt(i)) "null" else jstr(global.getTimestamp(i).toInstant.toString)
        val headers =
          (if (byType.length > maxRows)
            Map(ApiServer.NextCursorTypeHeader -> (ct + maxRows).toString)
          else Map.empty[String, String]) ++
            (if (byLoc.length > maxRows)
              Map(ApiServer.NextCursorLocationHeader -> (cl + maxRows).toString)
            else Map.empty[String, String])
        Resp(200,
          s"""{"total_readings": ${global.getLong(0)}, """ +
            s""""device_type_distribution": ${dist(byType)}, """ +
            s""""location_distribution": ${dist(byLoc)}, """ +
            s""""time_range": {"earliest": ${iso(1)}, "latest": ${iso(2)}}}""",
          headers)
    }
  }

  /** `cursor` query param: a non-negative row offset (422 otherwise). */
  private def cursorOf(q: Map[String, String]): Either[String, Int] =
    q.get("cursor").fold[Either[String, Int]](Right(0)) { c =>
      c.toIntOption.filter(_ >= 0)
        .toRight("cursor must be a non-negative integer")
    }

  /** Collect one MaxQueryRows page at `offset` (fetching one extra row to
    * detect a continuation); the body is the same bare JSON array an
    * uncapped response would carry, the next-page offset rides
    * [[ApiServer.NextCursorHeader]]. The input MUST be totally ordered. */
  private def pageJson(df: DataFrame, offset: Int): Resp = {
    val rows = df.offset(offset).limit(maxRows + 1).toJSON.collect()
    val headers =
      if (rows.length > maxRows)
        Map(ApiServer.NextCursorHeader -> (offset + maxRows).toString)
      else Map.empty[String, String]
    Resp(200, rows.take(maxRows).mkString("[", ",", "]"), headers)
  }

  private def namedQuery(path: String, q: Map[String, String]): (Int, String) = {
    val reg = registry.get
    val name = path.stripPrefix("/api/query/")
    reg.queries.get(name) match {
      case None =>
        (404, s"""{"detail": ${jstr(s"unknown query '$name'")}}""")
      case Some(build) =>
        val limit = q.get("limit").flatMap(_.toIntOption)
          .getOrElse(100).min(maxRows).max(1)
        (200, rowsJson(build(reg.spark, reg.dataDir).limit(limit)))
    }
  }

  // ---- plumbing ----------------------------------------------------------

  private implicit def pairResp(p: (Int, String)): Resp = Resp(p._1, p._2)

  private def rowsJson(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def handler(f: Map[String, String] => Resp): com.sun.net.httpserver.HttpHandler =
    pathHandler((_, q) => f(q))

  private def pathHandler(f: (String, Map[String, String]) => Resp): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => {
      val r =
        try f(ex.getRequestURI.getPath, parseQuery(Option(ex.getRequestURI.getRawQuery)))
        catch {
          case e: Exception =>
            Resp(500, s"""{"detail": ${jstr(String.valueOf(e.getMessage))}}""")
        }
      val bytes = r.body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      r.headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
      ex.sendResponseHeaders(r.code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

  private def parseQuery(raw: Option[String]): Map[String, String] =
    raw.filter(_.nonEmpty).fold(Map.empty[String, String]) {
      _.split("&").iterator.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty =>
            Some(java.net.URLDecoder.decode(k, UTF_8) ->
              java.net.URLDecoder.decode(v, UTF_8))
          case _ => None
        }
      }.toMap
    }
}

object ApiServer {
  /** Hard row ceiling for every serving collect: /api/query responses,
    * one /api/aggregates page, and each /api/stats distribution — the
    * driver-side collect is bounded regardless of table size, group
    * cardinality, or the client's limit parameter. */
  val MaxQueryRows = 1000

  /** Response header carrying the next page's `cursor` offset when a
    * capped endpoint truncated its result; absent on the last page. */
  val NextCursorHeader = "X-Next-Cursor"

  /** `/api/stats` per-distribution continuation headers: each distribution
    * paginates to its own end (feeds `cursor_type` / `cursor_location`),
    * so clients can distinguish "no such keys" from "page past the
    * shorter distribution's end". */
  val NextCursorTypeHeader = "X-Next-Cursor-Type"
  val NextCursorLocationHeader = "X-Next-Cursor-Location"

  /** An endpoint response: status, JSON body, extra headers (the
    * pagination cursor — body shapes stay reference-identical). */
  private[serving] final case class Resp(
      code: Int, body: String, headers: Map[String, String] = Map.empty)

  /** Named-query serving surface: a pinned session + data directory and
    * the plan-builder registry (e.g. `graft.SparkEntry.queries`). The
    * directory is fixed server-side — clients choose the query and a row
    * limit, never a filesystem path. */
  final case class QueryRegistry(
      spark: org.apache.spark.sql.SparkSession,
      dataDir: String,
      queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame])
}
