package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}

/** Statistical aggregates and reshape operators beyond the reference's
  * repertoire (its serving layer stops at count/min/max/avg —
  * `api-service/app.py:238-288`); these complete the agg surface a
  * training-data pipeline's profiling stage needs.
  *
  * Determinism discipline: corr/covar/stddev are NOT computed with the
  * built-in floating aggregates (their partial-merge order varies run to
  * run and engine to engine). Every moment is an exact DECIMAL sum
  * (order-independent), converted to double once, then combined with the
  * identical IEEE expression in both engines — the same Σ-decomposition
  * Spark's own partial aggregation uses, made bit-reproducible. That also
  * makes them trivially scalable: each is one map-side-combined hash agg.
  */
object Stats {

  private val D = DecimalType(18, 8)

  /** The robust-z gate shared by batch mad_outliers and the streaming
    * robustAnomalies monitor: |v − median| / (MAD·consistency) > z. One
    * definition, so the batch and stream verdicts cannot drift. 1.4826
    * is the Gaussian consistency constant (MAD → σ); 3.5 the standard
    * robust outlier threshold. */
  val MadConsistency = 1.4826
  val RobustZThreshold = 3.5

  /** Per-key robust location/scale: (key, median_value, mad) — the static
    * side of the streaming anomaly monitor
    * ([[graft.streaming.StreamingPipeline.robustAnomalies]]) and the same
    * statistics mad_outliers thresholds on. Two passes with per-group
    * partial aggregation; the intermediate median frame is ≤|keys| rows
    * and broadcasts back onto the second scan. */
  def robustStats(df: org.apache.spark.sql.DataFrame, keyCol: String,
      valueCol: String): org.apache.spark.sql.DataFrame = {
    val med = df.groupBy(keyCol)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 4).as("median_value"))
    df.join(broadcast(med), keyCol)
      .withColumn("_d", abs(col(valueCol) - col("median_value")))
      .groupBy(keyCol, "median_value")
      .agg(round(expr("percentile(_d, 0.5)"), 4).as("mad"))
      .select(keyCol, "median_value", "mad")
  }


  def queries: Seq[GraftQuery] = Seq(

    // ---- z-score anomaly detection from exact moments --------------------
    // The profiling stage's outlier gate: per-group mean/std from exact
    // DECIMAL moment sums (order-independent — see the object note), then
    // each row scored scan-side against its group's broadcast statistics.
    // Two passes over the data (moments, then scoring) but only ONE
    // shuffle — the 5-row stats frame rides a broadcast back onto the
    // scan. DECIMAL(28,8) on the squared term: value² sums grow with
    // corpus size, and 18 digits would saturate around SF 1.
    GraftQuery(
      "zscore_outliers",
      (s, dir) => {
        val D28 = DecimalType(28, 8)
        val v = col("value")
        val stats = Tables.events(s, dir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(v.cast(D28)).cast(DoubleType).as("sx"),
            sum((v * v).cast(D28)).cast(DoubleType).as("sxx"))
          .select(col("event_type"), (col("sx") / col("n")).as("mean"),
            // clamp: a (near-)constant group's variance can round to a
            // tiny NEGATIVE double (the per-row DECIMAL cast rounds the
            // squared term), where Spark's sqrt yields NaN rows but
            // DuckDB's sqrt ERRORS — and NaN compares > 3 in Spark's
            // ordering, emitting the whole group. Zero-variance groups
            // are then dropped: no value is an outlier of a constant.
            sqrt(greatest(col("sxx") / col("n")
              - (col("sx") / col("n")) * (col("sx") / col("n")), lit(0.0))).as("std"))
          .filter(col("std") > 0)
        Tables.events(s, dir)
          .join(broadcast(stats), "event_type")
          .withColumn("z", (col("value") - col("mean")) / col("std"))
          .filter(abs(col("z")) > 3)
          .select(col("event_id"), col("event_type"), col("value"),
            round(col("z"), 4).as("zscore"))
          .orderBy("event_id")
      },
      Some("""
        WITH s AS (
          SELECT event_type, count(*) n,
                 CAST(sum(CAST(value AS DECIMAL(28,8))) AS DOUBLE) sx,
                 CAST(sum(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) sxx
          FROM events GROUP BY 1),
        st AS (SELECT event_type, sx / n AS mean,
                      sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0)) AS std
               FROM s
               WHERE greatest(sxx / n - (sx / n) * (sx / n), 0) > 0)
        SELECT event_id, e.event_type AS event_type, value,
               round((value - mean) / std, 4) AS zscore
        FROM events e JOIN st ON e.event_type = st.event_type
        WHERE abs((value - mean) / std) > 3
        ORDER BY event_id""")),

    // ---- correlation / covariance / stddev from exact moment sums --------
    GraftQuery(
      "corr_stats",
      (s, dir) => {
        val x = col("l_discount"); val y = col("l_tax")
        // fanOutNarrow: same single-task decimal-sum bottleneck as
        // regr_stats (1.85 s quiet baseline); order-insensitive sums.
        val sums = Tables.fanOutNarrow(Tables.lineitem(s, dir)
            .select(col("l_returnflag"), x, y))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x.cast(D)).cast(DoubleType).as("sx"),
            sum(y.cast(D)).cast(DoubleType).as("sy"),
            sum((x * y).cast(D)).cast(DoubleType).as("sxy"),
            sum((x * x).cast(D)).cast(DoubleType).as("sxx"),
            sum((y * y).cast(D)).cast(DoubleType).as("syy"))
        // variances clamp at 0 (fp cancellation on a constant column can
        // land at -1e-18 → NaN sqrt in both engines, which no compare
        // survives) and the correlation emits NULL — inside a lazy CASE
        // branch, since ANSI aborts on x/0.0 — when either stddev is 0
        // (zero-variance group, hostile-relational sweep finding)
        val varx = (col("sxx") / col("n")) - (col("sx") / col("n")) * (col("sx") / col("n"))
        val vary = (col("syy") / col("n")) - (col("sy") / col("n")) * (col("sy") / col("n"))
        val cov = (col("sxy") / col("n")) - (col("sx") / col("n")) * (col("sy") / col("n"))
        val sd = sqrt(greatest(varx, lit(0.0))) * sqrt(greatest(vary, lit(0.0)))
        sums.select(col("l_returnflag"), col("n"),
            round(cov, 8).as("covar_pop"),
            round(sqrt(greatest(varx, lit(0.0))), 8).as("stddev_pop_discount"),
            when(sd =!= 0.0, round(cov / sd, 6)).as("corr_discount_tax"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH sums AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum(CAST(l_discount AS DECIMAL(18,8))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(l_tax AS DECIMAL(18,8))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(l_discount * l_tax AS DECIMAL(18,8))) AS DOUBLE) AS sxy,
                 CAST(sum(CAST(l_discount * l_discount AS DECIMAL(18,8))) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(l_tax * l_tax AS DECIMAL(18,8))) AS DOUBLE) AS syy
          FROM lineitem GROUP BY l_returnflag),
        v AS (
          SELECT l_returnflag, n,
                 (sxy / n) - (sx / n) * (sy / n) AS cov,
                 sqrt(greatest((sxx / n) - (sx / n) * (sx / n), 0))
                 * sqrt(greatest((syy / n) - (sy / n) * (sy / n), 0)) AS sd,
                 sqrt(greatest((sxx / n) - (sx / n) * (sx / n), 0)) AS sdx
          FROM sums)
        SELECT l_returnflag, n,
               round(cov, 8) AS covar_pop,
               round(sdx, 8) AS stddev_pop_discount,
               CASE WHEN sd != 0 THEN round(cov / sd, 6) END AS corr_discount_tax
        FROM v
        ORDER BY l_returnflag""")),

    // ---- per-group least-squares regression (slope/intercept/R²) ---------
    // price-on-quantity OLS per return flag — the profiling step that
    // turns "are these correlated" (corr_stats) into "by how much per
    // unit". Same exact-decimal moment discipline: one partial-agg pass
    // collects {n, Σx, Σy, Σxy, Σx², Σy²}, the closed forms are pure
    // arithmetic on the six scalars, and every division happens in the
    // SAME order in both engines so the doubles agree bit-for-bit before
    // the presentation rounding.
    GraftQuery(
      "regr_stats",
      (s, dir) => {
        // price² is ~1e10 with 8 decimals — the squared/cross moments
        // need the wide decimal (18,8 overflows under ANSI)
        val W = DecimalType(30, 8)
        val x = col("l_quantity"); val y = col("l_extendedprice")
        // fanOutNarrow: the five wide-decimal moment sums are the cost,
        // and a single-file scan serialized them on one task (2.1 s ->
        // 0.8 s at sf0.1); exact decimal sums are order-insensitive, so
        // the rebalance cannot move a bit. No-op on parallel layouts.
        val sums = Tables.fanOutNarrow(Tables.lineitem(s, dir)
            .select(col("l_returnflag"), x, y))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x.cast(D)).cast(DoubleType).as("sx"),
            sum(y.cast(D)).cast(DoubleType).as("sy"),
            sum((x * y).cast(W)).cast(DoubleType).as("sxy"),
            sum((x * x).cast(W)).cast(DoubleType).as("sxx"),
            sum((y * y).cast(W)).cast(DoubleType).as("syy"))
        // OLS on a zero-variance regressor has no slope: the denominators
        // go through lazy CASE branches (ANSI aborts on x/0.0) and the
        // row emits NULL slope/intercept/r2 — mirrored in the oracle
        // (hostile-relational sweep finding)
        val sxxc = col("sxx") - col("sx") * col("sx") / col("n")
        val slope = (col("sxy") - col("sx") * col("sy") / col("n")) / sxxc
        val sd = sqrt(greatest(
            (col("sxx") / col("n")) - (col("sx") / col("n")) * (col("sx") / col("n")), lit(0.0))) *
          sqrt(greatest(
            (col("syy") / col("n")) - (col("sy") / col("n")) * (col("sy") / col("n")), lit(0.0)))
        val corr = ((col("sxy") / col("n")) - (col("sx") / col("n")) * (col("sy") / col("n"))) / sd
        sums.select(col("l_returnflag"), col("n"),
            when(sxxc =!= 0.0, round(slope, 6)).as("slope"),
            when(sxxc =!= 0.0,
              round((col("sy") - slope * col("sx")) / col("n"), 4)).as("intercept"),
            when(sd =!= 0.0, round(corr * corr, 6)).as("r2"))
          .orderBy("l_returnflag")
      },
      Some("""
        WITH sums AS (
          SELECT l_returnflag, count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,8))) AS DOUBLE) AS sx,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,8))) AS DOUBLE) AS sy,
                 CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sxy,
                 CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
                 CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS syy
          FROM lineitem GROUP BY l_returnflag),
        v AS (
          SELECT l_returnflag, n, sx, sy, sxy,
                 sxx - sx * sx / n AS sxxc,
                 sqrt(greatest((sxx / n) - (sx / n) * (sx / n), 0))
                 * sqrt(greatest((syy / n) - (sy / n) * (sy / n), 0)) AS sd,
                 (sxy / n) - (sx / n) * (sy / n) AS cov
          FROM sums)
        SELECT l_returnflag, n,
               CASE WHEN sxxc != 0
                 THEN round((sxy - sx * sy / n) / sxxc, 6) END AS slope,
               CASE WHEN sxxc != 0
                 THEN round((sy - ((sxy - sx * sy / n) / sxxc) * sx) / n, 4)
               END AS intercept,
               CASE WHEN sd != 0
                 THEN round((cov / sd) * (cov / sd), 6) END AS r2
        FROM v
        ORDER BY l_returnflag""")),

    // ---- GROUPING SETS (finer than rollup/cube: explicit set list) -------
    // Built with the Dataset.groupingSets API (Spark 4) — pure plan
    // construction, no temp-view catalog mutation (two concurrent builds
    // against different data dirs used to race on a shared view name).
    // Grouped-out columns are coalesced to a sentinel so ordering is
    // engine-neutral (no NULLS FIRST/LAST divergence).
    GraftQuery(
      "grouping_sets_orders",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
                Seq(col("o_orderstatus")), Seq.empty),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            graft.functions.Num.dsumAsDouble(col("o_totalprice")).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total"))
          .orderBy("status", "priority")
      },
      Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY status, priority""")),

    // ---- argmin/argmax with a deterministic tiebreak ---------------------
    // min_by/max_by pick an arbitrary row on ties; ranking by a STRUCT
    // (value, event_id) makes the tiebreak part of the ordering itself —
    // lexicographic struct comparison is exact in both engines at any
    // scale, unlike the previous arithmetic fold (value·1e7 + id), whose
    // id term could outweigh a 0.01 value gap once ids pass 1e5.
    // max side ties resolve to the LARGEST id, min side to the smallest,
    // so both picks are total orders. A NULL value must not win either
    // side: Spark's struct comparison sorts a null field FIRST while
    // DuckDB's sorts it LAST, so the engines would pick different rows —
    // the rank is nulled for null-value rows (max_by/min_by skip null
    // ranks, like max/min skip nulls) and the oracle FILTERs them, making
    // "argmin/argmax ignore null values" the pinned semantics.
    GraftQuery(
      "minmax_by",
      (s, dir) => {
        val rank = when(col("value").isNotNull,
          struct(col("value"), col("event_id")))
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(max_by(col("event_id"), rank).as("max_value_event"),
               min_by(col("event_id"), rank).as("min_value_event"),
               count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               max(struct_pack(v := value, id := event_id))
                 FILTER (WHERE value IS NOT NULL).id AS max_value_event,
               min(struct_pack(v := value, id := event_id))
                 FILTER (WHERE value IS NOT NULL).id AS min_value_event,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- CDC-style compaction: latest full row per key -------------------
    // The upsert-snapshot shape: collapse an event log to the most recent
    // row per (user, event_type), latest decided by (ts, event_id) struct
    // order — one map-side-combined hash agg carrying a single struct per
    // key, not a per-key window sort. At scale this is the compaction pass
    // a foreachBatch merge sink runs per microbatch.
    // A null-ts row can never be "latest": the rank is nulled for it
    // (max_by skips null ranks) and the oracle FILTERs it — without the
    // pin, Spark's struct comparison sorts the null ts field first while
    // DuckDB's sorts it last, so DuckDB would crown the null-ts row.
    GraftQuery(
      "latest_by_key",
      (s, dir) => {
        val rank = when(col("ts").isNotNull,
          struct(col("ts"), col("event_id")))
        Tables.events(s, dir)
          .groupBy("user_id", "event_type")
          .agg(max_by(struct(col("event_id"), col("value"), col("ts")), rank)
            .as("last"))
          .select(col("user_id"), col("event_type"),
            col("last.event_id").as("event_id"),
            col("last.value").as("value"), col("last.ts").as("ts"))
          .orderBy("user_id", "event_type")
      },
      // CAST to µs inside the ranking struct AND the projection: the raw
      // column is TIMESTAMP_NS, and ranking by nanos while Spark ranks by
      // truncated µs could pick a different winner for two events inside
      // the same microsecond (GraftQuery's µs-precision rule)
      Some("""
        SELECT user_id, event_type,
               max(struct_pack(ts := CAST(ts AS TIMESTAMP), id := event_id, v := value))
                 FILTER (WHERE ts IS NOT NULL).id AS event_id,
               max(struct_pack(ts := CAST(ts AS TIMESTAMP), id := event_id, v := value))
                 FILTER (WHERE ts IS NOT NULL).v AS value,
               max(struct_pack(ts := CAST(ts AS TIMESTAMP), id := event_id, v := value))
                 FILTER (WHERE ts IS NOT NULL).ts AS ts
        FROM events
        GROUP BY user_id, event_type
        ORDER BY user_id, event_type""")),

    // ---- UNPIVOT / melt (inverse of the pivot reshape) -------------------
    // Wide per-flag aggregate → long (flag, metric, amount) via the typed
    // Dataset.unpivot API. The oracle uses the equivalent UNION ALL
    // formulation (engine-neutral, no UNPIVOT dialect dependence).
    GraftQuery(
      "unpivot_lineitem",
      (s, dir) => {
        val wide = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            graft.functions.Num.dsumAsDouble(col("l_quantity")).as("sum_qty"),
            graft.functions.Num.dsumAsDouble(col("l_extendedprice")).as("sum_price"))
        wide.unpivot(
            Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price")),
            "metric", "amount")
          .orderBy("l_returnflag", "metric")
      },
      Some(s"""
        WITH wide AS (
          SELECT l_returnflag,
                 ${graft.functions.Num.sqlDsum("l_quantity")} AS sum_qty,
                 ${graft.functions.Num.sqlDsum("l_extendedprice")} AS sum_price
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS amount FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        ORDER BY l_returnflag, metric""")),

    // ---- time-based RANGE window frame (1-hour rolling per user) ---------
    // The bounded-memory rolling metric every monitoring pipeline needs:
    // RANGE frames keyed on event time hold only the horizon in memory and
    // include all timestamp peers, so ties cannot make output
    // run-dependent. The windowed sum goes through an exact DECIMAL
    // accumulator — window-function floating sums are
    // accumulation-order-sensitive across engines.
    GraftQuery(
      "rolling_1h",
      (s, dir) => {
        // The INTERVAL RANGE frame is SQL-only, so a view is unavoidable —
        // but the name is unique per call and dropped as soon as the plan
        // is analyzed (sql() analyzes eagerly, inlining the view), so plan
        // construction leaves no catalog residue and concurrent builds
        // against different dirs can't read each other's data.
        val v = s"events_roll_${Tables.viewSeq.incrementAndGet()}"
        Tables.events(s, dir).createOrReplaceTempView(v)
        try s.sql(s"""
          SELECT event_id, user_id, ts,
                 count(*) OVER w AS cnt_1h,
                 round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS sum_1h
          FROM $v
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          ORDER BY event_id""")
        finally s.catalog.dropTempView(v)
      },
      // CAST in the frame's ORDER BY and the projection: the raw column is
      // TIMESTAMP_NS — ns-precision peer groups / horizon membership could
      // differ from the Spark side's µs event time
      Some("""
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               count(*) OVER w AS cnt_1h,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                     RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ---- quantile sketch, oracle-checked via its accuracy bound ----------
    // Same discipline as approx_distinct: the sketch estimate itself is
    // engine-private (Greenwald-Khanna variant, returns actual data
    // points while percentile() interpolates), so the registered row
    // emits the exact interpolated percentiles (hash-checked) plus the
    // sketch's RANK-window claim. The claim is checked on RANKS, not
    // values: the estimate's rank interval [#(v<ap)+1, #(v<=ap)] must
    // sit within q·n ± (n/1000 + 1) — the actual 0.1%-rank-error
    // guarantee plus the discrete-rank slack. The earlier value-window
    // formulation (estimate between interpolated p45..p55 / p90..p99)
    // is NOT implied by the guarantee: on a sparse tail (4-row group
    // with a ±1e9 outlier — hostile-events sweep finding) the returned
    // DATA POINT legitimately exceeds interpolated p99.
    GraftQuery(
      "approx_quantiles",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("event_type"), col("value"))
        val ap = e.groupBy(col("event_type").as("_et"))
          .agg(count(col("value")).as("nv"),
            expr("approx_percentile(value, 0.5, 1000)").as("ap50"),
            expr("approx_percentile(value, 0.95, 1000)").as("ap95"),
            expr("percentile(value, 0.5)").as("ex50"),
            expr("percentile(value, 0.95)").as("ex95"))
        // null-safe join key: a NULL event_type is a legitimate group in
        // both engines, but a plain equi-join would silently drop it from
        // the rank-check rejoin (hostile-events sweep finding)
        e.join(broadcast(ap), e("event_type") <=> ap("_et"))
          .drop("_et")
          .groupBy("event_type")
          .agg(first("nv").as("nv"),
            first("ex50").as("ex50"), first("ex95").as("ex95"),
            sum(when(col("value") < col("ap50"), 1L).otherwise(0L)).as("lt50"),
            sum(when(col("value") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
            sum(when(col("value") < col("ap95"), 1L).otherwise(0L)).as("lt95"),
            sum(when(col("value") <= col("ap95"), 1L).otherwise(0L)).as("le95"))
          .select(col("event_type"),
            round(col("ex50"), 4).as("p50"),
            round(col("ex95"), 4).as("p95"),
            (col("nv") === 0L ||
             (col("lt50") <= col("nv") * 0.5 + col("nv") * 0.001 + 1 &&
              col("le50") >= col("nv") * 0.5 - col("nv") * 0.001 - 1 &&
              col("lt95") <= col("nv") * 0.95 + col("nv") * 0.001 + 1 &&
              col("le95") >= col("nv") * 0.95 - col("nv") * 0.001 - 1))
              .as("sketch_in_rank_window"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95,
               true AS sketch_in_rank_window
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- discrete percentiles (actual data points, no interpolation) -----
    // percentile_disc picks the first value whose cumulative distribution
    // reaches p (SQL standard); DuckDB's quantile_disc lands on the same
    // order statistic for p in (0,1), so the values hash-match exactly —
    // no rounding needed, unlike the interpolated family.
    GraftQuery(
      "percentile_disc",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").as("p25"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").as("p75"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type,
               quantile_disc(value, 0.25) AS p25,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.75) AS p75
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- custom typed Aggregator: bounded top-k ids as an agg function ---
    // The UDAF surface: graft.functions.TopKIdsAgg is an
    // Aggregator[IN, BUF, OUT] whose ≤k-element sorted buffer gets partial
    // aggregation + map-side combine from Catalyst automatically. The
    // oracle is DuckDB's ordered list aggregate, sliced to k.
    GraftQuery(
      "topk_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(graft.functions.TopKAgg.topkIds(5)(col("value"), col("event_id"))
          .as("top5_ids"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type,
               array_to_string(list(event_id ORDER BY value DESC, event_id)[1:5], ',')
                 AS top5_ids,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- fixed-width histogram (the profiling-stage binning shape) -------
    GraftQuery(
      "value_histogram",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"),
          least(floor(col("value") / 10).cast(IntegerType), lit(9)).as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin"),
      Some("""
        SELECT event_type,
               least(CAST(floor(value / 10) AS INT), 9) AS bin,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, bin""")),

    // ---- robust outliers via median absolute deviation -------------------
    // zscore_outliers' mean/stddev gate is itself dragged by the outliers
    // it hunts; the MAD version is the robust standard (50% breakdown
    // point): med = median(value), MAD = median(|value − med|), flag when
    // |value − med| / (1.4826·MAD) > 3.5. Both medians are exact
    // interpolated percentiles (the median_value parity surface), rounded
    // to 4 decimals BEFORE any arithmetic so every downstream double op
    // (subtract / multiply / divide, each exactly rounded over identical
    // inputs) is bit-identical across engines. Zero-MAD groups (majority-
    // constant values) are dropped: the statistic is undefined there.
    //
    // Scale: two passes over events with per-group partial aggregation;
    // both stats frames are ≤|groups| rows and ride broadcasts — no
    // shuffle ever carries the fact table. At 100 TB the exact median
    // would swap for approx_percentile(…, 0.5, ε) — same plan shape, the
    // sketch mergeable map-side; the exact form is kept registered
    // because it is what the oracle can hash-check.
    GraftQuery(
      "mad_outliers",
      (s, dir) => {
        val med = Tables.events(s, dir).groupBy("event_type")
          .agg(round(expr("percentile(value, 0.5)"), 4).as("median_value"))
        val dev = Tables.events(s, dir)
          .join(broadcast(med), "event_type")
          .withColumn("d", abs(col("value") - col("median_value")))
        val mad = dev.groupBy("event_type")
          .agg(round(expr("percentile(d, 0.5)"), 4).as("mad"))
        dev.join(broadcast(mad), "event_type")
          .filter(col("mad") > 0 &&
            col("d") / (col("mad") * MadConsistency) > RobustZThreshold)
          .select(col("event_id"), col("event_type"), col("value"),
            col("median_value"), col("mad"),
            round(col("d") / (col("mad") * MadConsistency), 4).as("robust_z"))
          .orderBy("event_id")
      },
      Some("""
        WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median_value
                     FROM events GROUP BY 1),
        dev AS (SELECT event_id, e.event_type AS event_type, value, median_value,
                       abs(value - median_value) AS d
                FROM events e JOIN med USING (event_type)),
        mad AS (SELECT event_type, round(quantile_cont(d, 0.5), 4) AS mad
                FROM dev GROUP BY 1)
        SELECT event_id, dev.event_type AS event_type, value, median_value, mad,
               round(d / (mad * 1.4826), 4) AS robust_z
        FROM dev JOIN mad USING (event_type)
        WHERE mad > 0 AND d / (mad * 1.4826) > 3.5
        ORDER BY event_id""")),

    // ---- winsorization: percentile clipping per group --------------------
    // The feature-hygiene pass before training on heavy-tailed values:
    // clip each group's values into [p01, p99]. Bounds are exact
    // interpolated percentiles rounded BEFORE the comparison (the
    // median_value/mad_outliers discipline), so clip decisions are
    // bit-identical cross-engine; the bounds frame is ≤|groups| rows and
    // broadcasts back onto the only scan of the fact table. At 100 TB
    // the same plan runs on approx_percentile bounds.
    GraftQuery(
      "winsorize",
      (s, dir) => {
        val bounds = Tables.events(s, dir).groupBy("event_type")
          .agg(round(expr("percentile(value, 0.01)"), 4).as("lo"),
            round(expr("percentile(value, 0.99)"), 4).as("hi"))
        Tables.events(s, dir)
          .join(broadcast(bounds), "event_type")
          .withColumn("clipped", least(greatest(col("value"), col("lo")), col("hi")))
          .select(col("event_id"), col("event_type"), col("value"),
            col("clipped"), (col("value") =!= col("clipped")).as("was_clipped"))
          .orderBy("event_id")
      },
      Some("""
        WITH b AS (SELECT event_type,
                          round(quantile_cont(value, 0.01), 4) AS lo,
                          round(quantile_cont(value, 0.99), 4) AS hi
                   FROM events GROUP BY 1)
        SELECT event_id, e.event_type AS event_type, value,
               least(greatest(value, lo), hi) AS clipped,
               value != least(greatest(value, lo), hi) AS was_clipped
        FROM events e JOIN b USING (event_type)
        ORDER BY event_id""")),

    // ---- binned two-sample Kolmogorov–Smirnov drift ----------------------
    // The distribution-drift monitor corr/regr can't provide: the KS
    // distance between two cohorts' value distributions ('view' vs
    // 'purchase' events here — in production, this-week vs last-week).
    // The at-scale shape is the BINNED variant every monitoring stack
    // runs: values land in [[KsBins]] equal-width bins against broadcast
    // global bounds (one scan, partial agg per (bin) — never a global
    // sort of raw values, whose distinct count grows with the data), and
    // the CDF walk is a window over ≤[[KsBins]] rows. The statistic is
    // exact: D's numerator max|cumA·nB − cumB·nA| is pure BIGINT (the
    // one double division happens once, on identical integer inputs).
    // The bin rule ((v−mn)·bins/(mx−mn), floored, clamped) runs the same
    // IEEE ops on the same doubles in both engines.
    GraftQuery(
      "ks_drift",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("event_type"), col("value"))
        val bounds = e.agg(min("value").as("mn"), max("value").as("mx"))
        val binned = e.crossJoin(broadcast(bounds))
          .withColumn("bin", when(col("mx") > col("mn"),
            least(lit(KsBins - 1),
              floor((col("value") - col("mn")) * KsBins / (col("mx") - col("mn")))))
            .otherwise(lit(0L)))
          .groupBy("bin")
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("a"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
        // lit(1) partitions: same single-partition execution over the
        // KsBins-row binned aggregate, minus WindowExec's WARN noise
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1)).orderBy("bin")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        binned
          .withColumn("ca", sum("a").over(w))
          .withColumn("cb", sum("b").over(w))
          .withColumn("na", sum("a").over(wAll))
          .withColumn("nb", sum("b").over(wAll))
          // DECIMAL products (the event_transitions discipline): cohort
          // counts ≥ ~3.1e9 would overflow a BIGINT ca·nb — the oracle's
          // HUGEINT would then disagree (or ANSI would abort). The one
          // remaining boundary is the OUTPUT cast of d_num, documented
          // where a reader sizes the query, not hidden mid-expression.
          .agg(max("na").as("n_a"), max("nb").as("n_b"),
            max(expr("""abs(CAST(ca AS DECIMAL(38,0)) * nb
                        - CAST(cb AS DECIMAL(38,0)) * na)""")).as("d_dec"))
          .select(col("n_a"), col("n_b"),
            expr("CAST(d_dec AS BIGINT)").as("d_num"),
            round(col("d_dec").cast(DoubleType) /
              (col("n_a").cast(DoubleType) * col("n_b")), 6).as("ks_d"))
      },
      Some(s"""
        WITH e AS (SELECT event_type, value FROM events
                   WHERE event_type IN ('view', 'purchase')),
        bounds AS (SELECT min(value) AS mn, max(value) AS mx FROM e),
        binned AS (
          SELECT CASE WHEN mx > mn
                   THEN least(${KsBins - 1},
                     CAST(floor((value - mn) * $KsBins / (mx - mn)) AS BIGINT))
                   ELSE 0 END AS bin,
                 sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
          FROM e, bounds
          GROUP BY 1),
        cdf AS (
          SELECT bin, a, b,
                 sum(a) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                 sum(b) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
                 sum(a) OVER () AS na, sum(b) OVER () AS nb
          FROM binned)
        SELECT CAST(max(na) AS BIGINT) AS n_a,
               CAST(max(nb) AS BIGINT) AS n_b,
               CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
               round(CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
                     / (CAST(max(na) AS DOUBLE) * max(nb)), 6) AS ks_d
        FROM cdf""")),

    // ---- population stability index (time-cohort drift) ------------------
    // The OTHER production drift staple next to ks_drift: PSI between the
    // first and second half of the event timeline ("last week vs this
    // week"). PSI = Σ (pA−pB)·ln(pA/pB) over [[PsiBins]] equal-width value
    // bins with add-one (Laplace) smoothing over the FIXED bin universe —
    // the standard guard that keeps empty bins finite, mirrored exactly.
    // Everything after the one binning scan is ≤[[PsiBins]] rows.
    //
    // Exactness: the cohort split compares 2·epoch_µs against the summed
    // bounds (pure integer — no midpoint division), the bin rule is the
    // shared ks_drift IEEE expression, each ln runs on an INTEGER smoothed
    // count quantized to micro-nats (the bigram_pmi discipline), and the
    // per-bin contribution (sa·Nb − sb·Na)·Δln is a DECIMAL product summed
    // exactly; ONE double division at the end. The major-drift flag at the
    // industry 0.2 threshold is cross-multiplied so no float decides it.
    // Scale: two scans of events (bounds + binning, the ks_drift shape),
    // partial agg per bin; cohort counts ~3e9 would overflow BIGINT
    // products, hence DECIMAL(38,0) numerators (the ks_drift precedent).
    GraftQuery(
      "psi_drift",
      (s, dir) => {
        // ts IS NOT NULL too: a row with no event-time belongs to neither
        // cohort — without the filter Spark's when().otherwise() counts it
        // in NEITHER (null condition → otherwise on both branches) while
        // the oracle's CASE ELSE counts it in cohort B
        val e = Tables.events(s, dir)
          .filter(col("value").isNotNull && col("ts").isNotNull)
          .select(unix_micros(col("ts")).as("us"), col("value"))
        val bounds = e.agg(min("us").as("t0"), max("us").as("t1"),
          min("value").as("mn"), max("value").as("mx"))
        val counts = e.crossJoin(broadcast(bounds))
          .withColumn("bin", when(col("mx") > col("mn"),
            least(lit(PsiBins - 1),
              floor((col("value") - col("mn")) * PsiBins / (col("mx") - col("mn")))))
            .otherwise(lit(0L)))
          .withColumn("inA", col("us") * 2 <= col("t0") + col("t1"))
          .groupBy("bin")
          .agg(sum(when(col("inA"), 1L).otherwise(0L)).as("a"),
            sum(when(!col("inA"), 1L).otherwise(0L)).as("b"))
        val universe = s.range(PsiBins).toDF("bin")
        // lit(1): single-partition over PsiBins rows, minus the WARN
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        universe.join(counts, Seq("bin"), "left")
          .withColumn("sa", coalesce(col("a"), lit(0L)) + 1L)
          .withColumn("sb", coalesce(col("b"), lit(0L)) + 1L)
          .withColumn("na", sum("sa").over(wAll))
          .withColumn("nb", sum("sb").over(wAll))
          .withColumn("l6", expr(
            """CAST(round(ln(CAST(sa AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(round(ln(CAST(sb AS DOUBLE)) * 1e6) AS BIGINT)
               + CAST(round(ln(CAST(nb AS DOUBLE)) * 1e6) AS BIGINT)
               - CAST(round(ln(CAST(na AS DOUBLE)) * 1e6) AS BIGINT)"""))
          .withColumn("contrib", expr(
            """(CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)
               * l6"""))
          .agg(max(col("na") - PsiBins).as("n_a"),
            max(col("nb") - PsiBins).as("n_b"),
            sum("contrib").as("p6"), max("na").as("na"), max("nb").as("nb"))
          .select(col("n_a"), col("n_b"),
            round(col("p6").cast(DoubleType) /
              (col("na").cast(DoubleType) * col("nb") * 1e6), 6).as("psi"),
            (col("p6") * 5 >
              col("na").cast(DecimalType(38, 0)) * col("nb") * 1000000L)
              .as("major_drift"))
      },
      Some(s"""
        WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
                   FROM events
                   WHERE value IS NOT NULL AND ts IS NOT NULL),
        bounds AS (SELECT min(us) AS t0, max(us) AS t1,
                          min(value) AS mn, max(value) AS mx FROM e),
        counts AS (
          SELECT CASE WHEN mx > mn
                   THEN least(${PsiBins - 1},
                     CAST(floor((value - mn) * $PsiBins / (mx - mn)) AS BIGINT))
                   ELSE 0 END AS bin,
                 sum(CASE WHEN us * 2 <= t0 + t1 THEN 1 ELSE 0 END) AS a,
                 sum(CASE WHEN us * 2 <= t0 + t1 THEN 0 ELSE 1 END) AS b
          FROM e, bounds
          GROUP BY 1),
        sm AS (
          SELECT u.bin, coalesce(a, 0) + 1 AS sa, coalesce(b, 0) + 1 AS sb
          FROM range($PsiBins) u(bin) LEFT JOIN counts ON u.bin = counts.bin),
        tot AS (
          SELECT bin, sa, sb, sum(sa) OVER () AS na, sum(sb) OVER () AS nb
          FROM sm),
        terms AS (
          SELECT na, nb,
                 (CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)
                 * (CAST(round(ln(CAST(sa AS DOUBLE)) * 1e6) AS BIGINT)
                    - CAST(round(ln(CAST(sb AS DOUBLE)) * 1e6) AS BIGINT)
                    + CAST(round(ln(CAST(nb AS DOUBLE)) * 1e6) AS BIGINT)
                    - CAST(round(ln(CAST(na AS DOUBLE)) * 1e6) AS BIGINT)) AS contrib
          FROM tot)
        SELECT CAST(max(na) - $PsiBins AS BIGINT) AS n_a,
               CAST(max(nb) - $PsiBins AS BIGINT) AS n_b,
               round(CAST(sum(contrib) AS DOUBLE)
                     / (CAST(max(na) AS DOUBLE) * max(nb) * 1e6), 6) AS psi,
               sum(contrib) * 5 >
                 CAST(max(na) AS DECIMAL(38,0)) * max(nb) * 1000000 AS major_drift
        FROM terms""")))

  /** ks_drift: equal-width CDF bins — the binned-KS resolution every
    * monitoring stack trades for never sorting raw values globally. */
  private val KsBins = 256

  /** psi_drift: fewer, coarser bins than KS — PSI is a Σ over per-bin
    * ratios, where sparse bins inject smoothing noise rather than signal
    * (the industry default is 10-20 bins; 64 keeps resolution while every
    * smoothed bin still sees real mass at sf0.001). */
  private val PsiBins = 64
}
