package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.{GraftQuery, Tables}

/** Time-series operators Spark lacks as single built-ins, composed from
  * primitives (preference (a) of the build brief — no custom physical
  * operator needed because the composition is already shuffle-optimal).
  *
  * As-of join: the naive formulation (range join + row_number) explodes to
  * O(|left|·|right|) per key. The scalable shape used here is the classic
  * union + carry-forward: tag both sides, sort within key by event time
  * (one shuffle, same as any windowed op), and carry the last right-side
  * attributes forward with `last(..., ignoreNulls)` over a running frame.
  * Cost is one sort-shuffle of |L|+|R| — the same plan a 1000-executor
  * cluster wants at 100 TB.
  *
  * Sessionization: batch uses the same gap semantics as Spark's
  * `session_window` (a session extends while the next event arrives
  * strictly within `gap` of the previous one); the streaming face of this
  * operator is `session_window` + watermark (StreamingSpec).
  */
object TimeSeries {

  /** For each left event, the greatest right event-time ≤ the left time
    * within the same key (inclusive), as a plan fragment.
    *
    * Output contract: rows of the LEFT side projected to
    * (key, tsCol, tieBreak) plus `_asof_ts` — the matched right time or
    * null. Callers needing further left payload join back on tieBreak
    * (must be a unique id present on both inputs; it also makes the sort
    * within equal timestamps deterministic). */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String, tieBreak: String = "event_id"): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val unioned = l.select(col(key), col(tsCol), col("_side"), col(tieBreak))
      .unionByName(r.select(col(key), col(tsCol), col("_side"), col(tieBreak)))
    // right rows sort before left rows at equal ts (ASOF >= is inclusive)
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("_side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("_asof_ts",
        last(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Forward as-of: for each left row, the EARLIEST right time at or
    * after it — the "next event" direction [[asofJoin]]'s carry-forward
    * can't answer. Same union + single-sort shape; right rows (_side 2)
    * sort after left rows (_side 1) at equal ts so the following-frame
    * first() still sees an exactly-simultaneous right row (inclusive ≥,
    * matching the backward join's inclusive ≤). */
  def asofForwardJoin(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String, tieBreak: String = "event_id"): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(2))
    val unioned = l.select(col(key), col(tsCol), col("_side"), col(tieBreak))
      .unionByName(r.select(col(key), col(tsCol), col("_side"), col(tieBreak)))
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("_side"), col(tieBreak))
      .rowsBetween(0, Window.unboundedFollowing)
    unioned
      .withColumn("_asof_ts",
        first(when(col("_side") === 2, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Time-weighted average per user over (user_id, event_id, value, us
    * [event-time µs]) rows: Σ value·Δt / span, each reading weighted by
    * how long it was current. Factored out so tests can pin the semantics
    * on hand-computable series (a constant series averages to exactly its
    * constant; single-sample users have zero span and drop out). */
  def timeWeightedAvg(samples: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    samples
      .withColumn("nxt", lead("us", 1).over(w))
      .withColumn("term", round(col("value") * (col("nxt") - col("us")), 6))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("term").cast(
            org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast(org.apache.spark.sql.types.DoubleType)
          / (max("us") - min("us")), 6).as("twa"),
        (max("us") > min("us")).as("_keep"))
      .filter(col("_keep"))
      .select("user_id", "n_events", "twa")
      .orderBy("user_id")
  }

  def queries: Seq[GraftQuery] = Seq(

    // ---- binned range join: time-proximity join as an equi-join ----------
    // Naive `ON user AND v_ts BETWEEN p_ts - 1h AND p_ts` plans as a
    // nested-loop/cartesian per key — quadratic per user at scale. The
    // at-scale formulation bins event time into interval-width buckets
    // (exact µs arithmetic, no truncation drift), gives each probe row its
    // two candidate bins, and equi-joins on (user, bin) — a plain hash
    // shuffle — before the exact range filter. A (probe, build) pair can
    // match in at most one bin (the build row has exactly one), so no
    // dedup pass is needed. The oracle is the plain theta join: same
    // result, the plan is the point.
    GraftQuery(
      "range_join_binned",
      (s, dir) => {
        val binUs = 3600000000L // 1 hour in microseconds
        val e = Tables.events(s, dir)
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("v_id"), col("ts").as("v_ts"))
          .withColumn("bin", floor(unix_micros(col("v_ts")) / binUs))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
          .withColumn("b", floor(unix_micros(col("p_ts")) / binUs))
          .withColumn("bin", explode(array(col("b") - 1, col("b"))))
        p.join(v, Seq("user_id", "bin"))
          .filter(col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("v_ts") <= col("p_ts"))
          .select("p_id", "v_id", "user_id")
          .orderBy("p_id", "v_id")
      },
      Some("""
        SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        ORDER BY p_id, v_id""")),

    // ---- as-of join: each purchase ↔ latest prior view of the same user --
    GraftQuery(
      "asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
        val views = e.filter(col("event_type") === "view")
        asofJoin(purchases, views, "user_id", "ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("_asof_ts").as("last_view_ts"))
          .orderBy("event_id")
      },
      Some("""
        WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts
                   FROM events WHERE event_type = 'purchase'),
             v AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts
                   FROM events WHERE event_type = 'view')
        SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
        FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id""")),

    // ---- forward as-of join: the next event at or after ------------------
    // asof_join answers "the last view BEFORE this purchase"; this answers
    // "the NEXT view after it" (attribution's post-purchase window). Same
    // union + one per-key sort, carry-FIRST over the following frame. The
    // oracle is an INDEPENDENT formulation (correlated min() subquery,
    // which DuckDB decorrelates), not a mirror of the window trick — so
    // the two engines cross-check the semantics, not the implementation.
    GraftQuery(
      "asof_forward",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
        val views = e.filter(col("event_type") === "view")
        asofForwardJoin(purchases, views, "user_id", "ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("_asof_ts").as("next_view_ts"))
          .orderBy("event_id")
      },
      Some("""
        WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts
                   FROM events WHERE event_type = 'purchase'),
             v AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts
                   FROM events WHERE event_type = 'view')
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT min(v.ts) FROM v
                WHERE v.user_id = p.user_id AND v.ts >= p.ts) AS next_view_ts
        FROM p
        ORDER BY p.event_id""")),

    // ---- sessionization: 30-min-gap sessions per user --------------------
    GraftQuery(
      "sessionize",
      (s, dir) => Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          (col("sw.end") - expr("INTERVAL 30 MINUTES")).as("session_last"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      // WHERE ts IS NOT NULL mirrors session_window()'s generated
      // IsNotNull(ts) filter — a null event-time row belongs to no session
      Some("""
        WITH t AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) ts,
                 CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                      WHEN CAST(ts AS TIMESTAMP)
                           - lag(CAST(ts AS TIMESTAMP)) OVER w
                           >= INTERVAL 30 MINUTES THEN 1
                      ELSE 0 END AS new_session
          FROM events
          WHERE ts IS NOT NULL
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM t)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
               count(*) AS n_events
        FROM s
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start""")),

    // ---- funnel analysis: ordered view → click → purchase ----------------
    // Stage timestamps collapse to one min() per (user, stage) via
    // conditional aggregation — a single scan + one hash agg per user,
    // then a second tiny agg over users. The ORDER constraint (each stage
    // strictly after the previous one's first occurrence) is plain column
    // arithmetic on the collapsed row — no self-joins, no window sorts,
    // which is what keeps the funnel one shuffle at any scale.
    GraftQuery(
      "funnel_counts",
      (s, dir) => {
        def firstTs(t: String) =
          min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
        val stages = Tables.events(s, dir)
          .groupBy("user_id")
          .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
        val reachedClick = col("t_view").isNotNull &&
          col("t_click") > col("t_view")
        val reachedPurchase = reachedClick && col("t_purchase") > col("t_click")
        stages.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("t_view").isNotNull, 1).otherwise(0))
            .cast(LongType).as("stage_view"),
          sum(when(reachedClick, 1).otherwise(0))
            .cast(LongType).as("stage_click"),
          sum(when(reachedPurchase, 1).otherwise(0))
            .cast(LongType).as("stage_purchase"))
      },
      Some("""
        WITH s AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
          FROM events GROUP BY user_id)
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS stage_view,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                        THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                             AND t_purchase > t_click
                        THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
        FROM s""")),

    // ---- time-weighted average over irregular samples --------------------
    // The aggregate a plain avg() gets WRONG on irregularly-sampled series:
    // each reading must be weighted by how long it was current
    // (Σ value·Δt / span — the standard IoT/financial TWA). One window
    // pass for the next-sample gap (same per-key sort-shuffle every
    // windowed op pays), then one hash agg. Terms are rounded and summed
    // as exact DECIMAL so partial-merge order can't leak into the result;
    // single-sample users have zero span and drop out in both engines.
    GraftQuery(
      "time_weighted_avg",
      (s, dir) => timeWeightedAvg(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            unix_micros(col("ts")).as("us"))),
      Some("""
        WITH x AS (SELECT user_id, event_id, value,
                          epoch_us(CAST(ts AS TIMESTAMP)) us FROM events),
        g AS (SELECT user_id, value, us,
                     lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) nxt
              FROM x),
        t AS (SELECT user_id, us, round(value * (nxt - us), 6) term FROM g)
        SELECT user_id, count(*) AS n_events,
               round(CAST(sum(CAST(term AS DECIMAL(38,6))) AS DOUBLE)
                     / (max(us) - min(us)), 6) AS twa
        FROM t GROUP BY user_id
        HAVING max(us) > min(us)
        ORDER BY user_id""")),

    // ---- gap filling: dense hourly grid + forward fill -------------------
    // The missing-bucket problem every time-series pipeline hits: a
    // groupBy(hour) silently drops empty hours, so downstream
    // rolling/join logic sees a ragged axis. The scalable shape: aggregate
    // per (type, hour) first — ONE shuffle over the data; the dense axis
    // is generated from a 1-row min/max aggregate (sequence + explode)
    // cross-joined with the distinct types — both broadcast-sized at any
    // corpus scale, so densification never touches the big table again.
    // Missing hours get count 0 and a forward-filled average
    // (last-observation-carried-forward via last(ignoreNulls) over a
    // running frame — the window runs over the GRID (types × hours), not
    // the events). Averages are rounded BEFORE the fill so both engines
    // carry identical doubles forward.
    GraftQuery(
      "gap_fill",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            col("value"))
        // Num.davg rounds in exact integer arithmetic — round() on the
        // double quotient diverges between engines on .xxxx5 ties, which
        // hourly cells hit at sf0.1 (power-of-two counts)
        val buckets = e.groupBy("event_type", "h")
          .agg(count(lit(1)).as("n"),
            graft.functions.Num.davg("value").as("avg_v"))
        // bounds and the type list derive from the (types × hours)-sized
        // buckets aggregate, NOT from fresh scans of the events table —
        // the three identical bucket subtrees collapse to one scan via
        // exchange reuse, so densification really never rereads the corpus
        val bounds = buckets.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        val grid = buckets.select("event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        val w = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, 0)
        grid.join(buckets, Seq("event_type", "h"), "left")
          .select(col("event_type"), col("h").as("hour"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            last(col("avg_v"), ignoreNulls = true).over(w).as("filled_avg"))
          .orderBy("event_type", "hour")
      },
      Some(s"""
        WITH b AS (
          SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) h,
                 count(*) n,
                 ${graft.functions.Num.sqlDavg("value")} avg_v
          FROM events GROUP BY 1, 2),
        r AS (SELECT min(h) h0, max(h) h1 FROM b),
        grid AS (
          SELECT t.event_type, g.h
          FROM (SELECT DISTINCT event_type FROM b) t
          CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) h
                      FROM r) g),
        j AS (SELECT grid.event_type, grid.h, coalesce(b.n, 0) AS n_events,
                     b.avg_v
              FROM grid LEFT JOIN b
                ON grid.event_type = b.event_type AND grid.h = b.h)
        SELECT event_type, h AS hour, n_events,
               last_value(avg_v IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY h
                 ROWS UNBOUNDED PRECEDING) AS filled_avg
        FROM j ORDER BY event_type, hour""")),

    // ---- cohort retention: first-seen day × activity-day offset ----------
    // cohort = each user's first active day (one agg), joined back against
    // the user's active days (distinct user-day pairs — the broadcastable
    // side is the per-user cohort frame), counting distinct users per
    // (cohort day, day offset). The standard retention triangle, all
    // equi-shuffles on user_id.
    GraftQuery(
      "cohort_retention",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val cohorts = e.groupBy("user_id").agg(min(col("d")).as("cohort_d"))
        e.distinct()
          .join(cohorts, "user_id")
          .groupBy(col("cohort_d"), datediff(col("d"), col("cohort_d")).as("day_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_d", "day_offset")
      },
      Some("""
        WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d FROM events),
        c AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY user_id)
        SELECT c.cohort_d, date_diff('day', c.cohort_d, e.d) AS day_offset,
               count(*) AS n_users
        FROM e JOIN c USING (user_id)
        GROUP BY 1, 2
        ORDER BY cohort_d, day_offset""")),

    // ---- mean-shift changepoints: per-series hourly peak shift -----------
    // The time-series segmentation pass: at each sample, compare the mean
    // of the 30 rows before against the 30 from here on (full frames
    // only), then keep each (series, hour)'s strongest shift — the crude
    // non-max suppression that turns a dense score curve into one
    // changepoint candidate per bucket. Frame sums are exact DECIMAL:
    // sliding-frame implementations ADD AND REMOVE rows from the
    // accumulator (Spark) or segment-tree partials (DuckDB), so double
    // sums would drift engine-to-engine; decimal add/remove is exact
    // either way, and the one double division per side is identical on
    // identical inputs. Scale: `event_type` is a HANDFUL of series, so a
    // plain per-series window would sort each series' billions of rows in
    // ONE task. The registered shape is therefore the CHUNKED variant:
    //  1. a scale-safe global per-series row index g (the two-phase
    //     bucket + broadcast-offset pattern from global_row_number —
    //     256-way ts-range buckets, local row_number, tiny offsets frame
    //     broadcast back);
    //  2. chunk each series BY ROW INDEX into [[ChangepointChunk]]-row
    //     chunks and copy the ±[[ChangepointWin]] boundary rows into the
    //     neighboring chunk — row-index chunking (unlike time-range
    //     chunking) guarantees every frame's context rows are present by
    //     construction, under any timestamp skew;
    //  3. score frames within (series, chunk) — ≤ chunk+2·win rows per
    //     partition, parallelism GROWS with data — keep only home rows.
    // Overlap rows score garbage in their copy and are dropped by the
    // home filter; full-frame home rows see exactly the rows the
    // single-window formulation sees, so the oracle (plain per-series
    // windows) is unchanged.
    GraftQuery(
      "changepoints",
      (s, dir) => {
        val D = org.apache.spark.sql.types.DecimalType(18, 2)
        val nBkts = 256
        val base = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("ts"), col("value"))
        // phase 1: global per-series row index, no single-task sort
        val bounds = base.agg(min(unix_micros(col("ts"))).as("tmin"),
          max(unix_micros(col("ts"))).as("tmax"))
        val bucketed = base.crossJoin(broadcast(bounds))
          .withColumn("bkt",
            PipelineOps.rangeBucket("unix_micros(ts)", "tmin", "tmax", nBkts))
          .drop("tmin", "tmax")
        val byBkt = Window.partitionBy("event_type", "bkt")
          .orderBy(col("ts"), col("event_id"))
        val ranked = bucketed.withColumn("rn", row_number().over(byBkt))
        // bucket sizes are plain row COUNTS (max rn over a gap-free
        // row_number ≡ count), so the offsets branch is a map-side
        // partial agg off the bucketed scan — NO second sort+window.
        // Deriving them from `ranked` looked like exchange reuse but
        // column pruning rewrites the two subtrees apart, so the
        // executed plan rebuilt the entire ranked window (scan + sort +
        // window over the corpus) a second time — the r12 bench drift
        // (cold 6.9 s → 4.2 s at sf0.1 from this edit alone).
        val offsets = bucketed.groupBy("event_type", "bkt")
          .agg(count(lit(1)).cast("int").as("n"))
          .withColumn("off", coalesce(
            sum("n").over(Window.partitionBy("event_type").orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("event_type", "bkt", "off")
        val indexed = ranked
          .join(broadcast(offsets), Seq("event_type", "bkt"))
          .withColumn("g", col("off") + col("rn") - 1) // 0-based series index
          .drop("bkt", "rn", "off")
        // phase 2: row-index chunks + guaranteed boundary overlap. Each
        // row EXPLODES into its home chunk plus (for the ±win boundary
        // rows) the neighboring chunk — one pass, where a 3-way union of
        // home/context branches would recompute the whole phase-1
        // subtree per branch (measured 9.3 s vs 1.6 s at sf0.1)
        // explode the raw 3-slot array and drop the NULL copies with a
        // plain Filter AFTER the Generate: a filter(..., lambda) inside
        // the explode is a higher-order function that evaluates
        // interpreted per row (the r12 codegen suspect); array-of-IFs +
        // explode + IS NOT NULL keeps the whole hot path inside
        // whole-stage codegen at identical row volume
        val exploded = indexed
          .withColumn("chk", expr(s"g div $ChangepointChunk"))
          .withColumn("grp", explode(expr(s"""
            array(
              chk,
              IF(chk > 0 AND g % $ChangepointChunk < $ChangepointWin,
                 chk - 1, NULL),
              IF(g % $ChangepointChunk >= ${ChangepointChunk - ChangepointWin},
                 chk + 1, NULL)
            )""")))
          .filter(col("grp").isNotNull)
          .withColumn("is_home", col("grp") === col("chk"))
        val ord = Window.partitionBy("event_type", "grp").orderBy("g")
        val pre = ord.rowsBetween(-ChangepointWin, -1)
        val post = ord.rowsBetween(0, ChangepointWin - 1)
        val scored = exploded
          .withColumn("sL", sum(col("value").cast(D)).over(pre).cast(org.apache.spark.sql.types.DoubleType))
          .withColumn("nL", count(lit(1)).over(pre))
          .withColumn("sR", sum(col("value").cast(D)).over(post).cast(org.apache.spark.sql.types.DoubleType))
          .withColumn("nR", count(lit(1)).over(post))
          .filter(col("is_home") &&
            col("nL") === ChangepointWin && col("nR") === ChangepointWin)
          .withColumn("score", abs(col("sR") / col("nR") - col("sL") / col("nL")))
        val peak = Window.partitionBy(col("event_type"), date_trunc("hour", col("ts")))
          .orderBy(round(col("score"), 6).desc, col("event_id"))
        scored
          .withColumn("rn", row_number().over(peak))
          .filter(col("rn") === 1)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
            col("event_id"), round(col("score"), 4).as("shift"))
          .orderBy("event_type", "hour")
      },
      Some(s"""
        WITH w AS (
          SELECT event_id, event_type, ts, value,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) OVER pre AS DOUBLE) sL,
                 count(*) OVER pre nL,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) OVER post AS DOUBLE) sR,
                 count(*) OVER post nR
          FROM events
          WINDOW pre AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN $ChangepointWin PRECEDING AND 1 PRECEDING),
                 post AS (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN CURRENT ROW AND ${ChangepointWin - 1} FOLLOWING)),
        s AS (SELECT event_id, event_type, ts, abs(sR / nR - sL / nL) score
              FROM w WHERE nL = $ChangepointWin AND nR = $ChangepointWin),
        p AS (SELECT event_type, date_trunc('hour', ts) AS hour, event_id, score,
                     row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                        ORDER BY round(score, 6) DESC, event_id) rn
              FROM s)
        SELECT event_type, hour, event_id, round(score, 4) AS shift
        FROM p
        WHERE rn = 1
        ORDER BY event_type, hour""")),

    // ---- seasonal profile + residual anomalies ---------------------------
    // The daily-cycle complement to changepoints (level shifts) and
    // mad_outliers (static robust bounds): a per-(series, hour-of-day)
    // seasonal mean learned from the data itself, then the events
    // farthest from their seasonal expectation — what an ops monitor
    // alerts on when "high for 3am" differs from "high for 3pm".
    //
    // Scale: one scan builds the profile (exact-decimal davg — the
    // rounding is integer arithmetic, so profile cells are bit-identical
    // cross-engine), profile is series×24 cells → broadcast back onto a
    // second scan; residual arithmetic is plain IEEE on exact inputs, so
    // even the top-50 ordering hash-checks. No window functions, no
    // data-sized shuffle beyond the profile agg.
    GraftQuery(
      "seasonal_baseline",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("ts"), col("value"))
          .withColumn("hr", hour(col("ts")))
        val profile = e.groupBy("event_type", "hr")
          .agg(graft.functions.Num.davg("value", scale = 2).as("seasonal_avg"),
            count(lit(1)).as("n_cell"))
        e.join(broadcast(profile), Seq("event_type", "hr"))
          .withColumn("residual", col("value") - col("seasonal_avg"))
          .orderBy(abs(col("residual")).desc, col("event_id"))
          .limit(50)
          .select(col("event_id"), col("event_type"), col("hr"),
            col("value"), col("seasonal_avg"),
            round(col("residual"), 2).as("residual"), col("n_cell"))
      },
      Some(s"""
        WITH e AS (
          SELECT event_id, event_type,
                 CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INT) AS hr,
                 value
          FROM events),
        prof AS (
          SELECT event_type, hr,
                 ${graft.functions.Num.sqlDavg("value", scale = 2)} AS seasonal_avg,
                 count(*) AS n_cell
          FROM e GROUP BY event_type, hr),
        r AS (
          SELECT e.event_id, e.event_type, e.hr, e.value, p.seasonal_avg,
                 e.value - p.seasonal_avg AS resid, p.n_cell
          FROM e JOIN prof p USING (event_type, hr))
        SELECT event_id, event_type, hr, value, seasonal_avg,
               round(resid, 2) AS residual, n_cell
        FROM r
        ORDER BY abs(resid) DESC, event_id
        LIMIT 50""")),

    // ---- nearest as-of join: closest view in EITHER direction ------------
    // Completes the as-of family (asof_join = last-before, asof_forward =
    // next-after): each purchase pairs with whichever same-user view is
    // closest in absolute time, ties resolved toward the earlier (before)
    // side. One union + ONE sort: both the carry-forward (backward match)
    // and carry-first (forward match) frames share the same window
    // partitioning and ordering, so Catalyst plans a single WindowExec —
    // the nearest join costs exactly what either directional join costs.
    // Views sort before purchases at equal ts, so an exactly-simultaneous
    // view is the backward match with Δ = 0, which always wins "nearest";
    // the forward frame not seeing it is therefore harmless (the oracle's
    // inclusive min(ts >= p.ts) agrees on the final answer).
    GraftQuery(
      "asof_nearest",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("_side"), col("event_id"))
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), lit(0).as("_side"), col("event_id"))
        val ord = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("_side"), col("event_id"))
        p.unionByName(v)
          .withColumn("_back", last(when(col("_side") === 0, col("ts")),
            ignoreNulls = true).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("_fwd", first(when(col("_side") === 0, col("ts")),
            ignoreNulls = true).over(ord.rowsBetween(0, Window.unboundedFollowing)))
          .filter(col("_side") === 1)
          .withColumn("nearest_view_ts",
            when(col("_back").isNull, col("_fwd"))
              .when(col("_fwd").isNull, col("_back"))
              .when(unix_micros(col("ts")) - unix_micros(col("_back")) <=
                unix_micros(col("_fwd")) - unix_micros(col("ts")), col("_back"))
              .otherwise(col("_fwd")))
          .withColumn("delta_us",
            abs(unix_micros(col("ts")) - unix_micros(col("nearest_view_ts"))))
          .withColumn("direction",
            when(col("nearest_view_ts").isNull, lit(null).cast("string"))
              .when(col("nearest_view_ts") <= col("ts"), "before")
              .otherwise("after"))
          .select("event_id", "user_id", "ts", "nearest_view_ts",
            "delta_us", "direction")
          .orderBy("event_id")
      },
      Some("""
        WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts
                   FROM events WHERE event_type = 'purchase'),
             v AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts
                   FROM events WHERE event_type = 'view'),
        m AS (
          SELECT p.event_id, p.user_id, p.ts,
                 (SELECT max(v.ts) FROM v
                  WHERE v.user_id = p.user_id AND v.ts <= p.ts) AS b,
                 (SELECT min(v.ts) FROM v
                  WHERE v.user_id = p.user_id AND v.ts >= p.ts) AS f
          FROM p),
        n AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN b IS NULL THEN f WHEN f IS NULL THEN b
                      WHEN epoch_us(ts) - epoch_us(b)
                           <= epoch_us(f) - epoch_us(ts) THEN b
                      ELSE f END AS nearest_view_ts
          FROM m)
        SELECT event_id, user_id, ts, nearest_view_ts,
               abs(epoch_us(ts) - epoch_us(nearest_view_ts)) AS delta_us,
               CASE WHEN nearest_view_ts IS NULL THEN NULL
                    WHEN nearest_view_ts <= ts THEN 'before'
                    ELSE 'after' END AS direction
        FROM n
        ORDER BY event_id""")),

    // ---- daily new/active users + running cumulative distinct ------------
    // "Distinct users to date" per day without a quadratic
    // distinct-over-expanding-window: a user's contribution to the
    // cumulative count happens exactly once, on their FIRST day — so the
    // running distinct total is a running SUM of per-day first-appearance
    // counts. Two partial-agg shuffles over (user, day) cardinality; the
    // only window runs over the GROUPED day frame (365 rows/year no
    // matter the corpus width), never the events.
    GraftQuery(
      "cumulative_distinct",
      // ts IS NOT NULL on both sides: a dateless event attributes to no
      // day, and the running-sum window would otherwise place the NULL
      // day first (Spark) vs last (DuckDB), skewing every cumulative count
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val newPerDay = e.groupBy("user_id").agg(min("d").as("d"))
          .groupBy("d").agg(count(lit(1)).as("n_new"))
        val activePerDay = e.groupBy("d").agg(count(lit(1)).as("n_active"))
        activePerDay.join(newPerDay, Seq("d"), "left")
          .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
          .withColumn("cum_users", sum("n_new").over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
          .select("d", "n_active", "n_new", "cum_users")
          .orderBy("d")
      },
      Some("""
        WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d FROM events
                   WHERE ts IS NOT NULL),
        f AS (SELECT user_id, min(d) AS d FROM e GROUP BY 1),
        nw AS (SELECT d, count(*) AS n_new FROM f GROUP BY 1),
        ac AS (SELECT d, count(*) AS n_active FROM e GROUP BY 1)
        SELECT ac.d, ac.n_active, coalesce(nw.n_new, 0) AS n_new,
               CAST(sum(coalesce(nw.n_new, 0)) OVER (
                 ORDER BY ac.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_users
        FROM ac LEFT JOIN nw USING (d)
        ORDER BY d""")),

    // ---- Markov transition matrix over per-user event sequences ----------
    // The user-journey model funnel_counts summarizes one path of: for
    // every consecutive (prev → next) event pair within a user's
    // time-ordered stream, the transition count and its row-normalized
    // probability in exact ppm (floor(n·1e6 / row total) — integer-exact
    // in both engines, so the matrix hash-checks; the DECIMAL(38,0)
    // product keeps the numerator exact at any corpus size).
    //
    // Scale: the lag window shuffles on user_id (the sessionize shuffle);
    // the transition matrix is |event_types|² rows, so the normalizing
    // window runs over a frame that never grows with the data.
    GraftQuery(
      "event_transitions",
      // ts IS NOT NULL on both sides: a transition is defined by temporal
      // adjacency, and an un-timestamped row would slot first in Spark's
      // sequence but last in DuckDB's (NULLS FIRST vs LAST defaults),
      // producing different (prev → next) pairs
      (s, dir) => Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p_ppm", expr(
          """CAST(CAST(n AS DECIMAL(38,0)) * 1000000
               DIV sum(n) OVER (PARTITION BY from_type) AS BIGINT)"""))
        .orderBy("from_type", "to_type"),
      Some("""
        WITH s AS (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
          FROM events
          WHERE ts IS NOT NULL),
        t AS (SELECT prev AS from_type, event_type AS to_type, count(*) AS n
              FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type)
                 AS BIGINT) AS p_ppm
        FROM t
        ORDER BY from_type, to_type""")),

    // ---- lag-k autocorrelation of the hourly series (ACF) ----------------
    // The seasonality DETECTOR feeding seasonal_baseline's profile: the
    // Pearson autocorrelation of each event type's hourly-mean series at
    // lags {1,2,3,6,12,24} h. A daily cycle shows as acf(24) ≫ acf(12);
    // white noise shows nothing — run this before trusting any seasonal
    // adjustment. Scale shape: the raw scan collapses to an hourly frame
    // via ONE partial agg (davg cells, the seasonal_baseline discipline);
    // every lag then probes that tiny frame through a single equi-join on
    // (type, hour-number + k) — integer keys, no per-lag self-joins, no
    // windows over raw rows. Moments follow the corr_stats exact-DECIMAL
    // discipline; degenerate cells (n<2 or zero variance — constant
    // series) are filtered by the SAME double comparison in both engines.
    GraftQuery(
      "autocorr",
      (s, dir) => {
        val lags = Seq(1, 2, 3, 6, 12, 24)
        val W = DecimalType(30, 8)
        val D8 = DecimalType(18, 8)
        val series = Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("hu"))
          .agg(graft.functions.Num.davg("value", scale = 4).as("y"))
        val probes = series
          .withColumn("k", explode(typedlit(lags)))
          .select(col("event_type"), (col("hu") + col("k")).as("hu"),
            col("k"), col("y").as("ylag"))
        val sums = series.join(probes, Seq("event_type", "hu"))
          .groupBy("event_type", "k")
          .agg(count(lit(1)).as("n"),
            sum(col("y").cast(D8)).cast(DoubleType).as("sx"),
            sum(col("ylag").cast(D8)).cast(DoubleType).as("sy"),
            sum((col("y") * col("ylag")).cast(W)).cast(DoubleType).as("sxy"),
            sum((col("y") * col("y")).cast(W)).cast(DoubleType).as("sxx"),
            sum((col("ylag") * col("ylag")).cast(W)).cast(DoubleType).as("syy"))
        sums
          .filter(col("n") >= 2 &&
            (col("sxx") / col("n")) - (col("sx") / col("n")) * (col("sx") / col("n")) > 0 &&
            (col("syy") / col("n")) - (col("sy") / col("n")) * (col("sy") / col("n")) > 0)
          .select(col("event_type"), col("k").as("lag_hours"),
            col("n").as("n_pairs"),
            round(((col("sxy") / col("n")) - (col("sx") / col("n")) * (col("sy") / col("n"))) /
              (sqrt((col("sxx") / col("n")) - (col("sx") / col("n")) * (col("sx") / col("n"))) *
               sqrt((col("syy") / col("n")) - (col("sy") / col("n")) * (col("sy") / col("n")))), 6)
              .as("acf"))
          .orderBy("event_type", "lag_hours")
      },
      Some(s"""
        WITH e AS (
          SELECT event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hu, value
          FROM events WHERE value IS NOT NULL),
        series AS (
          SELECT event_type, hu,
                 ${graft.functions.Num.sqlDavg("value", scale = 4)} AS y
          FROM e GROUP BY 1, 2),
        probes AS (
          SELECT event_type, hu + k AS hu, k, y AS ylag
          FROM series CROSS JOIN (SELECT unnest([1,2,3,6,12,24]) AS k) l),
        sums AS (
          SELECT s.event_type, p.k, count(*) AS n,
                 CAST(sum(CAST(s.y AS DECIMAL(18,8))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(p.ylag AS DECIMAL(18,8))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(s.y * p.ylag AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
                 CAST(sum(CAST(s.y * s.y AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(p.ylag * p.ylag AS DECIMAL(30,8))) AS DOUBLE) AS syy
          FROM series s JOIN probes p
            ON s.event_type = p.event_type AND s.hu = p.hu
          GROUP BY 1, 2)
        SELECT event_type, k AS lag_hours, n AS n_pairs,
               round(((sxy / n) - (sx / n) * (sy / n)) /
                     (sqrt((sxx / n) - (sx / n) * (sx / n)) *
                      sqrt((syy / n) - (sy / n) * (sy / n))), 6) AS acf
        FROM sums
        WHERE n >= 2
          AND (sxx / n) - (sx / n) * (sx / n) > 0
          AND (syy / n) - (sy / n) * (sy / n) > 0
        ORDER BY event_type, lag_hours""")),

    // ---- inter-arrival regularity per user (bot detection) ---------------
    // Humans are bursty; schedulers are metronomes. Per user with ≥
    // [[BotMinGaps]] inter-event gaps: gap count, half-up integer mean gap,
    // coefficient of variation, and the bot flag CV ≤ 0.1 decided ENTIRELY
    // in integer arithmetic — cv² = (n·Σd² − S²)/S², so the gate is
    // 100·n·Σd² ≤ 101·S² with exact DECIMAL products (an all-ties user has
    // S = 0 and trips 0 ≤ 0 — simultaneous timestamps ARE the scheduler
    // signature). One window pass per user for the deltas (the state is
    // hash-partitioned by user — co-located, like event_transitions), one
    // partial agg for the moments. CV's doubles come from identical
    // DECIMAL casts in both engines; NULL when S = 0.
    GraftQuery(
      "bot_gaps",
      (s, dir) => {
        val dec = DecimalType(38, 0)
        val d = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("prev", lag("us", 1).over(
            Window.partitionBy("user_id").orderBy("us", "event_id")))
          .filter(col("prev").isNotNull)
          .withColumn("d", col("us") - col("prev"))
        d.groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"),
            sum(col("d").cast(dec)).as("sd"),
            sum(col("d").cast(dec) * col("d")).as("sd2"))
          .filter(col("n_gaps") >= BotMinGaps)
          // gap sums are µs over one table's time span — far inside BIGINT;
          // the DECIMAL moments only guard the squared term
          .select(col("user_id"), col("n_gaps"),
            expr("(2 * CAST(sd AS BIGINT) + n_gaps) DIV (2 * n_gaps)").as("mean_gap_us"),
            expr("""CASE WHEN sd > 0 THEN
                      round(sqrt(CAST(n_gaps * sd2 - sd * sd AS DOUBLE))
                            / CAST(sd AS DOUBLE), 4)
                    END""").as("cv"),
            (col("sd2") * 100L * col("n_gaps") <= col("sd") * col("sd") * 101L)
              .as("bot_flag"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH g AS (
          SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS d
          FROM events),
        m AS (
          SELECT user_id, count(*) AS n_gaps,
                 sum(CAST(d AS HUGEINT)) AS sd,
                 sum(CAST(d AS HUGEINT) * d) AS sd2
          FROM g WHERE d IS NOT NULL
          GROUP BY 1
          HAVING count(*) >= $BotMinGaps)
        SELECT user_id, n_gaps,
               CAST((2 * sd + n_gaps) // (2 * n_gaps) AS BIGINT) AS mean_gap_us,
               CASE WHEN sd > 0 THEN
                 round(sqrt(CAST(n_gaps * sd2 - sd * sd AS DOUBLE))
                       / CAST(sd AS DOUBLE), 4)
               END AS cv,
               sd2 * 100 * n_gaps <= sd * sd * 101 AS bot_flag
        FROM m
        ORDER BY user_id"""))
  )

  /** bot_gaps: minimum inter-event gaps before a user is profiled —
    * below this the CV estimate is noise, not evidence. */
  private val BotMinGaps = 5

  /** changepoints: samples per side of the two-sided mean window. */
  private val ChangepointWin = 30

  /** changepoints: rows per per-series scoring chunk. Must exceed
    * 2·[[ChangepointWin]]; larger ⇒ fewer, bigger partitions. */
  private val ChangepointChunk = 1024
}
