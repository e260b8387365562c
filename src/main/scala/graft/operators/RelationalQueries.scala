package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}
import graft.functions.Num

/** The relational query repertoire.
  *
  * Covers the reference's ad-hoc SQL surface (reference
  * `api-service/app.py:114-288` — Layer B in SURVEY.md §2: distinct+sort,
  * dynamic conjunctive filters, top-k latest, time-range lookback, global
  * stats, group-by counts) re-expressed as Spark plans over the harness
  * `events` table, plus the relational completion the north star requires
  * (joins, semi/anti, set ops, rollup, analytic window functions) over the
  * TPC-H-ish tables.
  *
  * Scale notes (100 TB posture):
  *  - filters/projections sit directly on the scan so Catalyst pushes them
  *    into parquet (PushedFilters + ReadSchema pruning);
  *  - small dims (nation/region) are explicitly `broadcast()`; big-big joins
  *    shuffle on their equi-keys and rely on AQE for skew/coalescing;
  *  - top-k = `orderBy(...).limit(k)` which Spark executes as
  *    TakeOrderedAndProject (per-partition heaps, no global sort);
  *  - aggregates run partial→final; doubles go through exact decimal sums
  *    (order-independent at any parallelism — see [[graft.functions.Num]]).
  */
object RelationalQueries {

  /** The reference's dynamic conjunctive filter builder
    * (`api-service/app.py:154-168`: optional equality predicates composed
    * onto `WHERE 1=1`) as a compositional plan fragment: every supplied
    * (column → value) pair becomes an equality conjunct. Catalyst pushes
    * the whole conjunction to the scan. */
  def dynamicFilter(df: DataFrame, eq: Map[String, Any]): DataFrame =
    eq.foldLeft(df) { case (d, (c, v)) => d.filter(col(c) === lit(v)) }

  private val revenueExpr: Column =
    col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18, 2)))

  private val sqlRevenue =
    "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))"

  /** Data-derived temporal cut: the µs midpoint of `c`'s span over `df`
    * (integer DIV — deterministic at every sf, no calendar literal to go
    * stale on regenerated data; Spark `DIV` and DuckDB `//` both truncate
    * toward zero, pinned in ComponentSpec). Returns a 1-row frame to
    * `crossJoin(broadcast(...))` onto the fact scan. One definition so
    * the q3/q5/q6/q12/q15 cuts cannot drift apart (review finding). */
  private def spanCut(df: DataFrame, c: Column): DataFrame =
    df.select(unix_micros(c).as("du"))
      .agg(expr("(min(du) + max(du)) DIV 2").as("cut"))

  /** Data-derived third-quarter window [w0, w1) over `c`'s span — the
    * recency slice q4/q10 filter on. Same DIV discipline as [[spanCut]]. */
  private def spanWindow(df: DataFrame, c: Column): DataFrame =
    df.select(unix_micros(c).as("du"))
      .agg(expr("min(du) + (max(du) - min(du)) DIV 2").as("w0"),
        expr("min(du) + (max(du) - min(du)) * 3 DIV 4").as("w1"))

  def queries: Seq[GraftQuery] = Seq(

    // ---- Reference Layer A parity: tumbling event-time windowed agg ------
    // (processor.py:82-95 shape over the harness events table)
    GraftQuery(
      "windowed_agg",
      // repartition before the agg: the single-file scan otherwise runs the
      // whole partial-aggregate phase (~250k groups at sf0.1) as one task
      (s, dir) => WindowAgg.tumbling(
          Tables.events(s, dir)
            .repartition(s.sparkContext.defaultParallelism, col("ts")),
          "ts", Seq("event_type"), "value")
        .orderBy("window_start", "event_type"),
      // avg via Num.sqlDavg: the Spark side uses davg's exact-integer
      // half-up, and a hand-rolled round(double/count) here would diverge
      // on the same .xxxx5 ties gap_fill hit. WHERE ts IS NOT NULL mirrors
      // Spark's window() semantics — a null event-time row belongs to no
      // window and is dropped by the generated IsNotNull filter, while
      // date_trunc would happily keep a NULL bucket (hostile-events sweep).
      Some(s"""
        SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS window_start,
               date_trunc('minute', CAST(ts AS TIMESTAMP)) + INTERVAL 1 MINUTE AS window_end,
               event_type,
               ${Num.sqlDavg("value", scale = 6)} AS avg_value,
               min(value) AS min_value,
               max(value) AS max_value,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value,
               count(*) AS reading_count
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY window_start, event_type""")),

    // ---- sliding event-time windows (reference has tumbling only) --------
    // Each event lands in win/slide = 2 overlapping windows; the oracle
    // reproduces Spark's epoch-aligned window origin via time_bucket.
    GraftQuery(
      "sliding_window_agg",
      (s, dir) => Tables.events(s, dir)
        .repartition(s.sparkContext.defaultParallelism, col("ts"))
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             Num.dsumAsDouble(col("value"), scale = 6).as("sum_value"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type"),
      Some("""
        SELECT ws AS window_start,
               ws + INTERVAL 10 MINUTES AS window_end,
               event_type, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
        FROM (
          SELECT time_bucket(INTERVAL 5 MINUTES, CAST(ts AS TIMESTAMP))
                   - to_microseconds(k * 5 * 60 * 1000000) AS ws,
                 event_type, value
          FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
          WHERE ts IS NOT NULL)
        GROUP BY ws, event_type
        ORDER BY window_start, event_type""")),

    // ---- B1: DISTINCT projection + multi-column sort (app.py:122-126) ----
    GraftQuery(
      "distinct_pairs",
      (s, dir) => Tables.events(s, dir)
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type"),
      Some("""
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")),

    // ---- B2: dynamic conjunctive equality filter (app.py:154-168) --------
    GraftQuery(
      "filter_eq",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("user_id") === 7)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id"),
      Some("""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        FROM events
        WHERE event_type = 'purchase' AND user_id = 7
        ORDER BY event_id""")),

    // ---- B3: latest-k top-k (ORDER BY ts DESC LIMIT, app.py:170) ---------
    GraftQuery(
      "latest_events",
      (s, dir) => Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(100),
      Some("""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 100""")),

    // ---- B4: time-range lookback filter (app.py:202-208) -----------------
    // NOW() is replaced by max(ts) so the predicate is reproducible.
    GraftQuery(
      "time_range",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val mx = e.agg(max("ts").as("_mx"))
        e.crossJoin(broadcast(mx))
          .filter(col("ts") >= col("_mx") - expr("INTERVAL 24 HOURS"))
          .select("event_id", "ts", "user_id", "event_type", "value")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >=
              (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 24 HOURS
        ORDER BY event_id""")),

    // ---- B4 production form: LITERAL time slice with raw-column pushdown -
    // In production the lookback bound is a plan-time literal (the
    // reference computes NOW() - INTERVAL h HOURS in SQL text), which lets
    // the bound push to the parquet scan. Tables.eventsSince translates it
    // onto the RAW nanos column — a predicate on the converted timestamp
    // cannot push past the projection (PlanSpec asserts the pushed
    // filter). time_range above keeps the data-relative (reproducible)
    // variant; this one is the plan you'd run at 100 TB.
    GraftQuery(
      "time_slice",
      (s, dir) => {
        val since = java.time.Instant.parse("2024-01-24T00:00:00Z")
          .toEpochMilli * 1000L
        Tables.eventsSince(s, dir, since)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            min("ts").as("first_ts"), max("ts").as("last_ts"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n,
               min(CAST(ts AS TIMESTAMP)) AS first_ts,
               max(CAST(ts AS TIMESTAMP)) AS last_ts
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-24 00:00:00'
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- B6+B8: global stats (count, min/max ts, app.py:247,269-274) -----
    GraftQuery(
      "global_stats",
      (s, dir) => Tables.events(s, dir).agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        min("ts").as("first_ts"),
        max("ts").as("last_ts"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        Num.dsumAsDouble(col("value")).as("sum_value")),
      Some("""
        SELECT count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               min(CAST(ts AS TIMESTAMP)) AS first_ts,
               max(CAST(ts AS TIMESTAMP)) AS last_ts,
               min(value) AS min_value,
               max(value) AS max_value,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        FROM events""")),

    // ---- B7: group-by count, sorted by count desc (app.py:251-266) -------
    GraftQuery(
      "groupby_count",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("event_type")),
      Some("""
        SELECT event_type, count(*) AS cnt FROM events
        GROUP BY event_type
        ORDER BY cnt DESC, event_type""")),

    // ---- TPC-H Q1-shaped pricing summary over lineitem -------------------
    GraftQuery(
      "q1_pricing",
      // fanOutNarrow (r14): eight exact-decimal aggregates were
      // serialized on the single-file scan's one task; the rebalance is
      // conditional (no-op at production scan parallelism) and decimal
      // sums are order-insensitive, so no bit moves.
      (s, dir) => Tables.fanOutNarrow(Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Num.dsumAsDouble(col("l_quantity")).as("sum_qty"),
          Num.dsumAsDouble(col("l_extendedprice")).as("sum_base_price"),
          round(sum(revenueExpr).cast(DoubleType), 2).as("sum_disc_price"),
          Num.davg("l_quantity").as("avg_qty"),
          Num.davg("l_extendedprice").as("avg_price"),
          Num.davg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${Num.sqlDsum("l_quantity")} AS sum_qty,
               ${Num.sqlDsum("l_extendedprice")} AS sum_base_price,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS sum_disc_price,
               ${Num.sqlDavg("l_quantity")} AS avg_qty,
               ${Num.sqlDavg("l_extendedprice")} AS avg_price,
               ${Num.sqlDavg("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- 3-way big-big join: revenue per customer, top 20 ----------------
    // Eager aggregation (push the agg below the join): lineitem collapses
    // to one row per orderkey BEFORE joining — the per-order partial agg
    // shares its orderkey shuffle with the orders join (co-partitioned),
    // and the custkey shuffle then carries |orders| rows instead of
    // |lineitem| (4× less here, ~10× on real TPC-H). Exact-decimal sums
    // reassociate exactly, so the two-level sum is bit-identical to the
    // flat one. AQE handles skew; top-k via TakeOrderedAndProject (no
    // global sort).
    GraftQuery(
      "top_customers",
      (s, dir) => {
        // key-aligned rebalance before the heavy decimal aggregation: the
        // testdata ships single-row-group parquet (scan parallelism 1 —
        // same constraint shingled() documents), and the groupBy reuses
        // this exact hash partitioning, so it costs no extra exchange. On
        // a many-split production layout the scan parallelizes naturally
        // and this line would be dropped in favor of partial-agg-first.
        val perOrder = Tables.lineitem(s, dir)
          .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(revenueExpr).as("rev"), count(lit(1)).as("n"))
        perOrder
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_name")
          .agg(round(sum(col("rev")).cast(DoubleType), 2).as("revenue"),
               sum(col("n")).as("n_lineitems"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    // ---- TPC-H Q3 shape: unshipped-revenue top-10 ------------------------
    // The classic segment × date-window 3-way join: BUILDING customers,
    // orders placed before a cutoff, lineitems shipping after it, top 10
    // open orders by discounted revenue. The cutoff is data-derived (the
    // µs midpoint of the order-date span, integer DIV — deterministic at
    // every sf, no calendar literal to go stale on regenerated data) and
    // broadcasts; the segment filter prunes customer before the join,
    // both date filters sit on the fact scans, revenue is the exact
    // DECIMAL sum, and the top-10 is a TakeOrderedAndProject over a
    // total (revenue DESC, o_orderkey) order. Null dates fail both
    // cutoff comparisons identically in the two engines.
    GraftQuery(
      "q3_shipping",
      (s, dir) => {
        val cut = spanCut(Tables.orders(s, dir), col("o_orderdate"))
        val bld = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val oc = Tables.orders(s, dir)
          .crossJoin(broadcast(cut))
          .filter(unix_micros(col("o_orderdate")) < col("cut"))
          .join(bld, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"), col("cut"))
        Tables.lineitem(s, dir)
          .join(oc, col("l_orderkey") === col("o_orderkey"))
          .filter(unix_micros(col("l_shipdate")) > col("cut"))
          .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
          .agg(round(sum(revenueExpr).cast(DoubleType), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""
        WITH b AS (
          SELECT (min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                  + max(epoch_us(CAST(o_orderdate AS TIMESTAMP)))) // 2 AS cut
          FROM orders)
        SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               o_orderpriority,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey, b
        WHERE c_mktsegment = 'BUILDING'
          AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) < cut
          AND epoch_us(CAST(l_shipdate AS TIMESTAMP)) > cut
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")),

    // ---- TPC-H Q2 shape: min-cost supplier per part within one region ----
    // The classic correlated-subquery shape (Q2's "supplier with minimum
    // supplycost"), re-derived from lineitem since this corpus ships no
    // partsupp: a supplier's offer for a part is its minimum observed
    // unit price (l_extendedprice / l_quantity — double ÷ double, the
    // same IEEE quotient in both engines, the cosine-family precedent),
    // the region is data-derived (alphabetically first r_name — no
    // literal to go stale on regenerated data, the q3_shipping cut
    // discipline), and the per-part argmin runs through the TopKPerKey
    // heap, not a full per-part window sort. Offers require
    // l_quantity > 0 and a non-null price: NULL min_unit would rank
    // NULLS FIRST in Spark and NULLS LAST in DuckDB, and a zero/negative
    // quantity is not a priceable offer (its ±Inf would also abort the
    // BIGINT cast under ANSI). The ranking compares RAW doubles
    // (identical quotient ⇒ identical order) and the displayed price is
    // floor(unit·1e4) — constructed decimal prices land on .5 display
    // boundaries where Spark's binary-expansion HALF_UP and DuckDB's
    // decimal round disagree (measured on three parts at sf0.001), while
    // floor of the same double is exact in both.
    //
    // Scale: supplier⋈nation⋈region is a broadcast dim chain onto the
    // lineitem scan; the (part, supp) partial agg collapses lineitem
    // before any wide shuffle; part attributes broadcast onto the ≤1-row-
    // per-part winners.
    GraftQuery(
      "min_cost_supplier",
      (s, dir) => {
        val r0 = Tables.region(s, dir).agg(min(col("r_name")).as("r0"))
        val sup = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
          .crossJoin(broadcast(r0))
          .filter(col("r_name") === col("r0"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val offers = Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 0 && col("l_extendedprice").isNotNull)
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") / col("l_quantity")).as("unit"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy("l_partkey", "s_suppkey", "s_name", "n_name")
          .agg(min(col("unit")).as("min_unit"))
        graft.plans.TopK.perKey(offers,
          Seq("l_partkey"), Seq(("min_unit", "asc"), ("s_suppkey", "asc")), 1)
          .join(broadcast(Tables.part(s, dir)
            .select("p_partkey", "p_name", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_name"), col("p_brand"),
            col("s_suppkey"), col("s_name"), col("n_name"),
            expr("CAST(floor(min_unit * 10000) AS BIGINT)").as("unit_price_e4"))
          .orderBy("p_partkey")
      },
      Some("""
        WITH r0 AS (SELECT min(r_name) AS r0 FROM region),
        sup AS (
          SELECT s_suppkey, s_name, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey, r0
          WHERE r_name = r0),
        offers AS (
          SELECT l_partkey, s_suppkey, s_name, n_name,
                 min(l_extendedprice / l_quantity) AS min_unit
          FROM lineitem
          JOIN sup ON l_suppkey = s_suppkey
          WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL
          GROUP BY 1, 2, 3, 4),
        best AS (
          SELECT l_partkey, s_suppkey, s_name, n_name, min_unit,
                 row_number() OVER (PARTITION BY l_partkey
                   ORDER BY min_unit, s_suppkey) AS rn
          FROM offers)
        SELECT p_partkey, p_name, p_brand, s_suppkey, s_name, n_name,
               CAST(floor(min_unit * 10000) AS BIGINT) AS unit_price_e4
        FROM best JOIN part ON l_partkey = p_partkey
        WHERE rn = 1
        ORDER BY p_partkey""")),

    // ---- TPC-H Q7 shape: bilateral trade volume by ship year -------------
    // Revenue flowing between a small nation GROUP, split by direction
    // and ship year — the classic two-role dimension join (nation enters
    // the tree twice: once as the supplier's country, once as the
    // customer's). The group is data-derived (the four smallest
    // nationkeys — the q3_shipping cut discipline, no name literal to go
    // stale; four, because a bare pair yields zero cross-nation trades
    // at the smoke scale), each role rides its own broadcast of the same
    // 4-row frame, and the direction filter (supp_nation != cust_nation)
    // runs AFTER both roles resolve.
    //
    // Scale: the supplier role collapses to a 4/25-of-suppliers map
    // (broadcast — min_cost_supplier precedent; at a scale where 16% of
    // suppliers outgrow the broadcast threshold this side degrades to a
    // shuffle join and the plan still holds). The customer role is big —
    // it stays a shuffled equi-join on custkey, as does the
    // lineitem⋈orders spine on orderkey; the nation filter prunes both
    // fact sides BEFORE the spine join, so the wide shuffle moves only
    // group-relevant rows (~(4/25)² of lineitem).
    GraftQuery(
      "q7_volume",
      (s, dir) => {
        // asc_nulls_last: a hostile NULL nationkey must not displace a
        // real key from the group (Spark default NULLS FIRST vs DuckDB
        // NULLS LAST would pick different groups); n_name tiebreak: on a
        // hostile corpus with DUPLICATE nationkeys a bare key sort is
        // engine-underdetermined at the LIMIT boundary (review finding)
        val n2 = Tables.nation(s, dir)
          .orderBy(col("n_nationkey").asc_nulls_last,
            col("n_name").asc_nulls_last).limit(4)
          .select(col("n_nationkey"), col("n_name"))
        val sup = Tables.supplier(s, dir)
          .join(broadcast(n2), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(n2), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        val li = Tables.lineitem(s, dir)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("supp_nation"),
            year(col("l_shipdate")).as("l_year"), revenueExpr.as("rev"))
        val oc = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("cust_nation"))
        li.join(oc, col("l_orderkey") === col("o_orderkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(round(sum(col("rev")).cast(DoubleType), 2).as("revenue"),
            count(lit(1)).as("n_lineitems"))
          // l_year is NULL for a dateless lineitem (inner joins keep the
          // row) — pin the cross-engine null placement (registry NULLS
          // LAST discipline)
          .orderBy(col("supp_nation"), col("cust_nation"),
            col("l_year").asc_nulls_last)
      },
      Some(s"""
        WITH n2 AS (SELECT n_nationkey, n_name FROM nation
                    ORDER BY n_nationkey NULLS LAST, n_name NULLS LAST
                    LIMIT 4)
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS INT) AS l_year,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN n2 sn    ON s_nationkey = sn.n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN n2 cn    ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3 NULLS LAST""")),

    // ---- TPC-H Q14 shape: promo revenue share by ship month --------------
    // Conditional-aggregate-over-join: what fraction of each month's
    // revenue came from PROMO-type parts. One equi-join lineitem⋈part on
    // partkey (only p_type survives the projection — the scan reads two
    // of part's six columns), revenue split by a CASE inside the same
    // partial agg (one pass, no second scan for the denominator), and
    // the share computed on the tiny per-month frame. 'PROMO' is a
    // stable generator domain value (the q3 'BUILDING' precedent).
    //
    // Scale: part scales with sf, so the join is written as a plain
    // equi-join — AQE broadcasts it while it fits and degrades to a
    // shuffled hash join beyond the threshold; either way the CASE rides
    // the map side and the month agg is partial→final over ≤ a few
    // hundred groups.
    GraftQuery(
      "q14_promo",
      (s, dir) => {
        val promoRev = sum(when(col("p_type") === "PROMO", revenueExpr)
          .otherwise(lit(0).cast(DecimalType(18, 2)))).as("promo_rev")
        // fanOutNarrow (r14): the per-row decimal revenue products ran on
        // the single-file scan's one task (1.39 s quiet baseline);
        // conditional rebalance, exact decimal sums.
        Tables.fanOutNarrow(Tables.lineitem(s, dir)
            .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount"))
          .join(Tables.part(s, dir).select("p_partkey", "p_type"),
            col("l_partkey") === col("p_partkey"))
          .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
          .agg(promoRev, sum(revenueExpr).as("total_rev"),
            count(lit(1)).as("n_lineitems"))
          .select(col("ship_month"),
            // lazy CASE around the division (the corr_stats ANSI
            // discipline): a month whose rows are all 100%-discounted
            // sums to exactly 0 revenue, and the divide would abort
            // under ANSI — its share is undefined, not an error. The
            // quotient itself is DOUBLE ÷ DOUBLE of the exact decimal
            // sums (the cosine-family precedent): decimal division
            // rounds at engine-specific result scales, while the IEEE
            // quotient of identical operands is identical.
            round(when(col("total_rev") =!= 0,
              lit(100) * col("promo_rev").cast(DoubleType)
                / col("total_rev").cast(DoubleType)), 4)
              .as("promo_share_pct"),
            round(col("total_rev").cast(DoubleType), 2).as("revenue"),
            col("n_lineitems"))
          // a dateless lineitem groups under a NULL month in both
          // engines — pin its placement
          .orderBy(col("ship_month").asc_nulls_last)
      },
      Some(s"""
        SELECT date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS ship_month,
               round(CASE WHEN $sqlRevenue = 0 THEN NULL
                 ELSE 100 * CAST(sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST($sqlRevenue AS DOUBLE) END, 4) AS promo_share_pct,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
        ORDER BY 1 NULLS LAST""")),

    // ---- TPC-H Q15 shape: top supplier(s) by recent revenue --------------
    // Per-supplier revenue inside a data-derived recency window (ship
    // dates at-or-after the span midpoint — the q3 cut), then the
    // supplier(s) whose revenue equals the global max. Q15 semantics
    // keep ALL tied winners: the tie test compares the EXACT decimal
    // sums (order-independent, engine-identical), never the rounded
    // display value, so a display-precision collision cannot fabricate
    // a tie. The max rides a broadcast 1-row frame onto the per-supplier
    // aggregate — no global window sort, no second scan (the agg subtree
    // is shared and exchange-reused).
    //
    // Scale: one partial→final agg over |suppliers| groups, a 1-row
    // broadcast, and a filter. Nothing global except the 1-row max.
    GraftQuery(
      "q15_top_supplier",
      (s, dir) => {
        val cut = spanCut(Tables.lineitem(s, dir), col("l_shipdate"))
        val rev = Tables.lineitem(s, dir)
          .crossJoin(broadcast(cut))
          .filter(unix_micros(col("l_shipdate")) >= col("cut"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revenueExpr).as("rev"), count(lit(1)).as("n_lineitems"))
        val top = rev.agg(max(col("rev")).as("max_rev"))
        rev.join(broadcast(top), col("rev") === col("max_rev"))
          .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("rev").cast(DoubleType), 2).as("revenue"),
            col("n_lineitems"))
          .orderBy("s_suppkey")
      },
      Some(s"""
        WITH b AS (
          SELECT (min(epoch_us(CAST(l_shipdate AS TIMESTAMP)))
                  + max(epoch_us(CAST(l_shipdate AS TIMESTAMP)))) // 2 AS cut
          FROM lineitem),
        rev AS (
          SELECT l_suppkey, $sqlRevenue AS r, count(*) AS n_lineitems
          FROM lineitem, b
          WHERE epoch_us(CAST(l_shipdate AS TIMESTAMP)) >= cut
          GROUP BY 1),
        top AS (SELECT max(r) AS max_rev FROM rev)
        SELECT s_suppkey, s_name, round(CAST(r AS DOUBLE), 2) AS revenue,
               n_lineitems
        FROM rev JOIN top ON r = max_rev
        JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY s_suppkey""")),

    // ---- TPC-H Q19 shape: disjunctive multi-table predicate revenue ------
    // Revenue under an OR of three (brand, size-range, quantity-range)
    // triples — the classic disjunction spanning both join sides. The
    // full OR can only evaluate after the join, but its per-table
    // IMPLIED conjuncts (brand IN the three brands, size within the
    // union of ranges; quantity within the union) are hoisted onto each
    // scan explicitly — the factoring Q19 exists to test — so the join
    // builds from pre-pruned inputs and the residual OR touches only
    // candidate rows. Brand literals are stable generator domain values.
    //
    // Scale: both scans carry pushed range/IN filters; the join is a
    // plain equi-join on partkey (AQE picks broadcast vs shuffle); the
    // final agg is a single global row via partial sums.
    GraftQuery(
      "q19_disjunct",
      (s, dir) => {
        val triple = (b: String, s0: Int, s1: Int, q0: Int, q1: Int) =>
          col("p_brand") === b &&
            col("p_size").between(s0, s1) &&
            col("l_quantity").between(q0, q1)
        val disjunct = triple("Brand#1", 1, 15, 1, 20) ||
          triple("Brand#2", 10, 30, 10, 30) ||
          triple("Brand#3", 20, 50, 20, 40)
        val partPruned = Tables.part(s, dir)
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_size").between(1, 50))
          .select("p_partkey", "p_brand", "p_size")
        Tables.lineitem(s, dir)
          .filter(col("l_quantity").between(1, 40))
          .join(partPruned, col("l_partkey") === col("p_partkey"))
          .filter(disjunct)
          .agg(round(sum(revenueExpr).cast(DoubleType), 2).as("revenue"),
            count(lit(1)).as("n_lineitems"))
      },
      Some(s"""
        SELECT round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)""")),

    // ---- TPC-H Q20 shape: suppliers with excess stock of a named part -----
    // The last of the 22 shapes (closing SURVEY wave-10 #4's open
    // question): suppliers in one nation holding EXCESS inventory of a
    // name-prefixed part family. The corpus ships no partsupp, so
    // availqty needs a surrogate that keeps Q20's distinctive
    // inventory-vs-demand comparison WITHOUT collapsing into q17 (per-part
    // average over one brand) or q18 (per-order totals): availqty per
    // (part, supplier) = the largest single-shipment quantity that pair
    // has ever fulfilled (proven on-hand capacity), and the demand side is
    // the PART-level season total across all suppliers (this corpus's
    // (part,supplier) pairs average 1.16 lineitems, so any per-pair demand
    // makes the comparison vacuous — measured 51 727 of 51 731 pairs
    // passing; at part granularity the TPC-H 0.5 multiplier genuinely
    // bites: 17% of pairs pass). Excess ⇔ 2·availqty > season demand,
    // exact staged decimals. Every constant is data-derived (the q3/q6
    // discipline): the part family is the first word of the
    // alphabetically-first p_name, the season is the ship-span's second
    // calendar year, the nation is the alphabetically-first one that HAS
    // suppliers (sf0.001 ships 10 suppliers across 10 of 25 nations, so a
    // blind min(n_name) selects an empty nation).
    //
    // Scale: the name-filtered part family broadcasts into BOTH lineitem
    // subtrees before their aggregates (≈1/8 of the fact survives the
    // semi-join); ps shuffles once on the composite (part, supplier) key;
    // dem is ≤|parts| rows and broadcasts back onto ps; the supplier
    // probe touches only the distinct qualifying suppkeys. No join ever
    // carries more than the pruned fact; nothing non-broadcast is small.
    GraftQuery(
      "q20_excess_parts",
      (s, dir) => {
        val pfx = Tables.part(s, dir)
          .agg(split(min(col("p_name")), " ").getItem(0).as("w"))
        val fp = Tables.part(s, dir)
          .crossJoin(broadcast(pfx))
          .filter(col("p_name").startsWith(col("w")))
          .select("p_partkey")
        val yr = Tables.lineitem(s, dir)
          .agg((year(min(col("l_shipdate"))) + 1).as("y"))
        val fam = Tables.lineitem(s, dir)
          .join(broadcast(fp), col("l_partkey") === col("p_partkey"))
        val ps = fam
          .groupBy("l_partkey", "l_suppkey")
          .agg(max(col("l_quantity").cast(DecimalType(18, 2))).as("availqty"))
        val dem = fam
          .crossJoin(broadcast(yr))
          .filter(year(col("l_shipdate")) === col("y"))
          .groupBy(col("l_partkey").as("dp"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("season_demand"))
        // availqty(18,2) × 2(2,0) → (21,2) exact; the sum is (28,2)
        val ex = ps
          .join(broadcast(dem), col("l_partkey") === col("dp"), "left_outer")
          .filter(col("availqty") * lit(2).cast(DecimalType(2, 0))
            > coalesce(col("season_demand"), lit(0).cast(DecimalType(28, 2))))
          .select("l_suppkey").distinct()
        val nat = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .agg(min(col("n_name")).as("nn"))
        Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .crossJoin(broadcast(nat))
          .filter(col("n_name") === col("nn"))
          .join(broadcast(ex), col("s_suppkey") === col("l_suppkey"))
          .select("s_suppkey", "s_name")
          .orderBy("s_name", "s_suppkey")
      },
      Some("""
        WITH pfx AS (SELECT split_part(min(p_name), ' ', 1) AS w FROM part),
        yr AS (SELECT year(min(CAST(l_shipdate AS TIMESTAMP))) + 1 AS y
               FROM lineitem),
        nat AS (SELECT min(n_name) AS nn
                FROM nation JOIN supplier ON n_nationkey = s_nationkey),
        fp AS (SELECT p_partkey FROM part, pfx WHERE p_name LIKE w || '%'),
        ps AS (
          SELECT l_partkey, l_suppkey,
                 max(CAST(l_quantity AS DECIMAL(18,2))) AS availqty
          FROM lineitem JOIN fp ON l_partkey = p_partkey
          GROUP BY 1, 2),
        dem AS (
          SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS season_demand
          FROM lineitem JOIN fp ON l_partkey = p_partkey, yr
          WHERE year(CAST(l_shipdate AS TIMESTAMP)) = y
          GROUP BY 1),
        ex AS (
          SELECT DISTINCT l_suppkey
          FROM ps LEFT JOIN dem USING (l_partkey)
          WHERE availqty * CAST(2 AS DECIMAL(2,0))
                > coalesce(season_demand, CAST(0 AS DECIMAL(28,2))))
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey, nat
        JOIN ex ON l_suppkey = s_suppkey
        WHERE n_name = nn
        ORDER BY s_name, s_suppkey""")),

    // ---- TPC-H Q22 shape: well-funded customers gone quiet ---------------
    // Customers with an account balance above the average POSITIVE
    // balance and NO orders in the most recent quarter of the
    // order-date span, rolled up by market segment (this corpus has no
    // phone column, so segment stands in for Q22's country code; every
    // customer in this corpus has SOME order, so the recency window is
    // what makes the anti-join non-vacuous — the cut is data-derived,
    // the q3 discipline). The global average and the cut are 1-row
    // broadcasts; the "gone quiet" test is a LEFT ANTI join against the
    // DISTINCT-projected keys of recent orders (one BIGINT per recent
    // order, collapsed before the join). A dateless order fails the
    // recency comparison in both engines — it cannot mark a customer
    // active.
    //
    // Scale: filter → anti-join on custkey (shuffled hash; the probe
    // side is already average-filtered down) → partial agg over
    // |segments| groups. NULL balances fail the > comparison in both
    // engines and NULL segments group as their own key (both engines
    // group NULLs together).
    GraftQuery(
      "q22_idle_customers",
      (s, dir) => {
        val avgBal = Tables.customer(s, dir)
          .filter(col("c_acctbal") > 0)
          .agg(avg(col("c_acctbal")).as("avg_bal"))
        val cut = Tables.orders(s, dir)
          .select(unix_micros(col("o_orderdate")).as("du"))
          .agg(expr("min(du) + (max(du) - min(du)) * 3 DIV 4").as("cut"))
        val recent = Tables.orders(s, dir)
          .crossJoin(broadcast(cut))
          .filter(unix_micros(col("o_orderdate")) >= col("cut"))
          .select("o_custkey").distinct()
        Tables.customer(s, dir)
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            round(sum(col("c_acctbal").cast(DecimalType(18, 2)))
              .cast(DoubleType), 2).as("total_bal"))
          // NULL segments group as their own key in both engines —
          // pin the ordering slot
          .orderBy(col("c_mktsegment").asc_nulls_last)
      },
      // NOT EXISTS, not NOT IN: Spark's left_anti KEEPS a NULL-custkey
      // probe row (the key matches nothing), while NOT IN over any
      // null-polluted subquery collapses to NULL and drops EVERY row —
      // NOT EXISTS with the equality predicate reproduces the anti-join
      // truth table exactly (hostile-relational-corpus discipline).
      Some("""
        WITH a AS (SELECT avg(c_acctbal) AS avg_bal FROM customer
                   WHERE c_acctbal > 0),
        b AS (SELECT min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                     + (max(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                        - min(epoch_us(CAST(o_orderdate AS TIMESTAMP))))
                       * 3 // 4 AS cut
              FROM orders)
        SELECT c_mktsegment, count(*) AS n_customers,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total_bal
        FROM customer c, a
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o, b
                          WHERE o.o_custkey = c.c_custkey
                            AND epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) >= cut)
        GROUP BY 1
        ORDER BY 1 NULLS LAST""")),

    // ---- TPC-H Q4 shape: priority mix of orders with a late line ---------
    // Orders in the third quarter of the order-date span (data-derived —
    // the q3 no-stale-literal discipline) that have AT LEAST ONE lineitem
    // shipping strictly after the order date, counted by priority. The
    // at-least-one is a LEFT SEMI join on orderkey whose extra non-equi
    // conjunct (l_shipdate > o_orderdate) rides as the join filter — the
    // classic EXISTS shape where the correlation carries a comparison,
    // not just the key. A null ship or order date fails the comparison in
    // both engines; a null orderkey matches nothing.
    //
    // Scale: the window filter prunes orders on its scan; the semi join
    // shuffles on orderkey and short-circuits per probe row (no fanout —
    // an order with 3 000 late lines contributes once); the final agg is
    // |priorities| groups.
    GraftQuery(
      "q4_priority",
      (s, dir) => {
        val win = spanWindow(Tables.orders(s, dir), col("o_orderdate"))
        val o = Tables.orders(s, dir)
          .crossJoin(broadcast(win))
          .filter(unix_micros(col("o_orderdate")) >= col("w0") &&
            unix_micros(col("o_orderdate")) < col("w1"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        o.join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority").asc_nulls_last)
      },
      Some("""
        WITH b AS (
          SELECT min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                 + (max(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                    - min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))) // 2 AS w0,
                 min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                 + (max(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                    - min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))) * 3 // 4 AS w1
          FROM orders)
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o, b
        WHERE epoch_us(CAST(o_orderdate AS TIMESTAMP)) >= w0
          AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) < w1
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND CAST(l.l_shipdate AS TIMESTAMP)
                            > CAST(o.o_orderdate AS TIMESTAMP))
        GROUP BY 1
        ORDER BY 1 NULLS LAST""")),

    // ---- TPC-H Q5 shape: local-supplier revenue by nation -----------------
    // Revenue per nation where the SUPPLYING nation equals the CUSTOMER's
    // nation, inside the first half of the order-date span — q7's two-role
    // join flipped from inequality to equality. The nationkey equality is
    // applied as a join conjunct on the orderkey spine join (after both
    // roles resolve to keys), and only then does the 25-row nation name
    // table broadcast on. Null nationkeys fail the equality in both
    // engines.
    //
    // Scale: supplier collapses to a broadcastable (suppkey → nationkey)
    // map; orders carries its window filter on the scan and joins customer
    // shuffled on custkey; the spine shuffles on orderkey; the name
    // broadcast is 25 rows. Group count = |nations|.
    GraftQuery(
      "q5_local_volume",
      (s, dir) => {
        val cut = spanCut(Tables.orders(s, dir), col("o_orderdate"))
        val oc = Tables.orders(s, dir)
          .crossJoin(broadcast(cut))
          .filter(unix_micros(col("o_orderdate")) < col("cut"))
          .select("o_orderkey", "o_custkey")
          .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "c_nationkey")
        val li = Tables.lineitem(s, dir)
          .join(broadcast(Tables.supplier(s, dir)
              .select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("s_nationkey"), revenueExpr.as("rev"))
        li.join(oc, col("l_orderkey") === col("o_orderkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(Tables.nation(s, dir)
              .select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("rev")).cast(DoubleType), 2).as("revenue"),
            count(lit(1)).as("n_lineitems"))
          .orderBy(col("revenue").desc, col("n_name").asc_nulls_last)
      },
      Some(s"""
        WITH b AS (
          SELECT (min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                  + max(epoch_us(CAST(o_orderdate AS TIMESTAMP)))) // 2 AS cut
          FROM orders)
        SELECT n_name, round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey, b
        WHERE c_nationkey = s_nationkey
          AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) < cut
        GROUP BY 1
        ORDER BY revenue DESC, n_name NULLS LAST""")),

    // ---- TPC-H Q13 shape: customer order-count distribution ---------------
    // How many customers placed exactly k above-average orders, for each
    // k INCLUDING ZERO — the zero bucket is the whole point and forces a
    // LEFT OUTER join (an inner join silently drops the quietest
    // customers). "Above average" is the exact cross-multiplied test
    // price·n > Σprice on DECIMAL sums (an avg-of-DOUBLE threshold is
    // association-order-dependent in its last ulp — a row landing ON the
    // mean could flip between engines), broadcast as one row. count(key)
    // — not count(*) — so an unmatched customer counts 0, not 1.
    //
    // Scale: the mean filter prunes orders before the join; the outer
    // join shuffles on custkey; level-2 collapses |customers| rows to
    // |distinct counts| groups via partial aggs.
    GraftQuery(
      "q13_custdist",
      (s, dir) => {
        // n staged to DECIMAL(12,0): price(18,2) × bigint(20,0) would
        // need precision 39 > Spark's 38 clamp and silently round at
        // extreme magnitudes (the q11 staging discipline, applied after
        // review); (18,2)×(12,0) → (31,2), exact
        val mean = Tables.orders(s, dir)
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("tot"),
            count(col("o_totalprice")).cast(DecimalType(12, 0)).as("n"))
        val big = Tables.orders(s, dir)
          .crossJoin(broadcast(mean))
          .filter(col("o_totalprice").cast(DecimalType(18, 2)) * col("n")
            > col("tot"))
          .select("o_orderkey", "o_custkey")
        Tables.customer(s, dir).select("c_custkey")
          .join(big, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        WITH m AS (
          SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot,
                 CAST(count(o_totalprice) AS DECIMAL(12,0)) AS n
          FROM orders),
        co AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders, m
                     WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n > tot) o
            ON c_custkey = o_custkey
          GROUP BY 1)
        SELECT c_count, count(*) AS custdist
        FROM co
        GROUP BY 1
        ORDER BY custdist DESC, c_count DESC""")),

    // ---- TPC-H Q17 shape: small-quantity revenue for one brand ------------
    // Revenue sitting in lineitems whose quantity is below a fifth of
    // their part's average quantity, over the alphabetically-first brand
    // (data-derived, broadcast — no literal to go stale). The correlated
    // scalar subquery is re-expressed as a join of the brand's lineitems
    // against their own per-part aggregate, and the "< 0.2·avg" test is
    // the exact integer-decimal cross-multiplication 5·qty·n < Σqty —
    // never a divided average. Null quantities fail both the aggregate
    // (count(qty) counts non-null, matching DuckDB) and the comparison.
    //
    // Scale: the brand join prunes lineitem FIRST (≈1/|brands| survives)
    // on BOTH sides of the self-aggregate join; the probe and stats
    // subtrees carry different pruned projections, so Spark re-scans the
    // narrow columns rather than reusing one exchange — the canonical
    // Q17 plan shape (the alternative, a global window, serializes).
    // Final agg is one global row.
    GraftQuery(
      "q17_small_qty",
      (s, dir) => {
        val brand = Tables.part(s, dir).agg(min(col("p_brand")).as("b"))
        val bp = Tables.part(s, dir)
          .crossJoin(broadcast(brand))
          .filter(col("p_brand") === col("b"))
          .select("p_partkey")
        val li = Tables.lineitem(s, dir)
          .join(broadcast(bp), col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"),
            col("l_quantity").cast(DecimalType(18, 2)).as("qty"),
            revenueExpr.as("rev"))
        // staged precisions (the q11 discipline, applied after review):
        // qty(18,2) × 5(3,0) → (22,2), × nq(12,0) → (35,2) — exact;
        // an unstaged qty*5*bigint clamps at Spark's 38-precision limit
        val stats = li.groupBy(col("l_partkey").as("sp"))
          .agg(sum(col("qty")).as("sq"),
            count(col("qty")).cast(DecimalType(12, 0)).as("nq"))
        li.join(stats, col("l_partkey") === col("sp"))
          .filter(col("qty") * lit(5).cast(DecimalType(3, 0)) * col("nq")
            < col("sq"))
          .agg(round(sum(col("rev")).cast(DoubleType), 2).as("revenue"),
            count(lit(1)).as("n_lineitems"))
      },
      Some("""
        WITH b AS (SELECT min(p_brand) AS b FROM part),
        li AS (
          SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty,
                 CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey, b
          WHERE p_brand = b),
        st AS (SELECT l_partkey AS sp, sum(qty) AS sq,
                      CAST(count(qty) AS DECIMAL(12,0)) AS nq
               FROM li GROUP BY 1)
        SELECT round(CAST(sum(rev) AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM li JOIN st ON l_partkey = sp
        WHERE qty * CAST(5 AS DECIMAL(3,0)) * nq < sq""")),

    // ---- TPC-H Q18 shape: large-volume orders --------------------------
    // Orders whose total quantity exceeds TWICE the mean per-order
    // quantity, joined back to their customer — the HAVING-on-aggregate →
    // rejoin shape. The threshold is the exact cross-multiplication
    // Σq_order · n_orders > 2 · Σq_total on DECIMAL sums (same rationale
    // as q13). The global total re-derives the per-order aggregate on a
    // narrower projection (column pruning differentiates the subtrees,
    // so no exchange reuse — the q15 two-scan precedent, both scans two
    // columns wide) and broadcasts back as one row. No LIMIT: the filter
    // is the operator under test (top_customers/q3 cover top-k).
    //
    // Scale: orderkey-shuffled per-order aggs; a 1-row broadcast; the
    // customer join touches only the qualifying orders.
    GraftQuery(
      "q18_big_orders",
      (s, dir) => {
        // staged precisions (the q11 discipline, applied after review):
        // sum_qty re-staged to (18,2), no to (12,0) → product (31,2)
        // exact; tq(28,2) × 2(2,0) → (31,2) exact. Unstaged, the
        // (28,2)×bigint product needs precision 49 and Spark's 38-clamp
        // rounds where DuckDB computes the wider product exactly.
        //
        // NOTE (r14, VERDICT ask #3, negative results — don't redo
        // blind): the scalar-total branch re-derives perOrder (second
        // lineitem scan + orderkey shuffle), and BOTH removal techniques
        // were built and disproven. (a) Eager localCheckpoint of
        // perOrder: MEASURED and lost at both rungs (sf0.1 bench median
        // 1.31→1.40 s, 10× facts ladder 2.0→3.5 s) — block-manager
        // materialization of |orders| rows costs more than the
        // column-pruned re-scan it saves. (b) ReuseExchange alignment
        // (keep n_lineitems alive in the total branch with a
        // value-neutral `0 * coalesce(max(n_lineitems), 0)` so the
        // partial aggregates match): the exchanges STILL don't
        // canonicalize, because the orders equi-join pushes an inferred
        // isnotnull(l_orderkey) Filter below the MAIN branch's partial
        // agg (constraint propagation) and no such filter exists under
        // the total branch — the subtrees differ below the exchange in a
        // way the query cannot neutralize from above. The q11 window
        // trick doesn't apply either (the scalar spans ALL orders — an
        // unbounded single-partition frame). The second pass IS the
        // floor for a pure plan; both scans are two columns wide.
        val perOrder = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DecimalType(18, 2)).as("sum_qty"),
            count(lit(1)).as("n_lineitems"))
        val total = perOrder
          .agg(sum(col("sum_qty")).as("tq"),
            count(col("sum_qty")).cast(DecimalType(12, 0)).as("no"))
        perOrder
          .crossJoin(broadcast(total))
          .filter(col("sum_qty") * col("no")
            > col("tq") * lit(2).cast(DecimalType(2, 0)))
          .join(Tables.orders(s, dir)
              .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"),
            round(col("o_totalprice").cast(DoubleType), 2).as("total_price"),
            col("sum_qty").cast(DoubleType).as("sum_qty"),
            col("n_lineitems"))
          .orderBy(col("o_orderkey").asc_nulls_last)
      },
      Some("""
        WITH po AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DECIMAL(18,2)) AS sum_qty,
                 count(*) AS n_lineitems
          FROM lineitem GROUP BY 1),
        t AS (SELECT sum(sum_qty) AS tq,
                     CAST(count(sum_qty) AS DECIMAL(12,0)) AS no FROM po)
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               round(CAST(o_totalprice AS DOUBLE), 2) AS total_price,
               CAST(sum_qty AS DOUBLE) AS sum_qty, n_lineitems
        FROM po JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey, t
        WHERE sum_qty * no > tq * CAST(2 AS DECIMAL(2,0))
        ORDER BY o_orderkey NULLS LAST""")),

    // ---- TPC-H Q21 shape: the sole late shipper in multi-supplier orders --
    // Suppliers who, in an order sourced from MORE THAN ONE supplier,
    // were the ONLY one to ship late — Q21's double-correlated
    // EXISTS/NOT-EXISTS collapsed into one per-order aggregate: distinct
    // suppliers, distinct LATE suppliers, and the (unique when n_late=1)
    // late supplier via max-over-CASE. "Late" is a ship lead (shipdate −
    // orderdate, µs) at-or-beyond the span midpoint of all leads —
    // data-derived; leads can be negative on hostile data and the
    // midpoint stays exact because both engines' integer DIV truncates
    // toward zero (pinned in ComponentSpec). Null dates make a null
    // lead, which fails the late test and never pollutes the distincts
    // (count distinct and max both skip the CASE's null branch).
    //
    // Scale: one narrow fact-fact join projected to three columns, one
    // orderkey shuffle for the per-order profile, a |suppliers|-group
    // count, a broadcast name join. No per-order fanout, no self-join
    // of lineitem against itself on the full width.
    GraftQuery(
      "q21_late_solo",
      (s, dir) => {
        // NOTE (r14, negative result — don't redo blind): lo feeds both
        // the span-midpoint scalar and the per-order profile, so the
        // lineitem+orders join runs twice per query. An eager
        // localCheckpoint of the 3-column join output was built and
        // MEASURED and lost at both rungs (sf0.1 bench median
        // 1.49→1.61 s, 10× facts ladder 2.83→3.38 s): block-manager
        // materialization of a |lineitem|-sized frame costs more than
        // the column-pruned re-scan + broadcast join it saves. The q18
        // ReuseExchange alignment doesn't apply either — the scalar
        // branch's join has no exchange to reuse while the orders side
        // broadcasts (nothing shuffles on the lineitem side), and when
        // it degrades to a sort-merge join at real scale the subtrees
        // still differ by the pruned l_suppkey column inside the JOIN,
        // whose width the scalar branch cannot neutralize from above.
        // The second pass IS the floor for a pure plan here.
        val lo = Tables.lineitem(s, dir)
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (unix_micros(col("l_shipdate"))
              - unix_micros(col("o_orderdate"))).as("lead"))
        val cut = lo.agg(expr("(min(lead) + max(lead)) DIV 2").as("cut"))
        lo.crossJoin(broadcast(cut))
          // key-aligned rebalance (the top_customers constraint): the
          // single-row-group testdata scans with parallelism 1; on a
          // many-split production layout this line would be dropped.
          // The orderkey partitioning is a PREFIX of both grouping keys
          // below, so neither aggregate adds an exchange.
          .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
          // dedup to (order, supplier) pairs FIRST instead of Spark's
          // dual-countDistinct plan (a 3× Expand + three agg levels):
          // both distincts then become plain counts over the pairs, one
          // exchange total. A null lead CASEs to 0 — never late.
          .groupBy("l_orderkey", "l_suppkey")
          .agg(max(when(col("lead") >= col("cut"), lit(1)).otherwise(lit(0)))
            .as("late"))
          .groupBy("l_orderkey")
          // count(suppkey), not count(*): the null-supplier pair group
          // must not count toward either distinct (countDistinct skips
          // nulls, and so must this rewrite)
          .agg(count(col("l_suppkey")).as("n_supp"),
            count(when(col("late") === 1, col("l_suppkey"))).as("n_late"),
            max(when(col("late") === 1, col("l_suppkey"))).as("the_supp"))
          .filter(col("n_supp") > 1 && col("n_late") === 1)
          .groupBy("the_supp")
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(Tables.supplier(s, dir)
              .select("s_suppkey", "s_name")),
            col("the_supp") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
      },
      Some("""
        WITH lo AS (
          SELECT l_orderkey, l_suppkey,
                 epoch_us(CAST(l_shipdate AS TIMESTAMP))
                   - epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS lead
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        b AS (SELECT (min(lead) + max(lead)) // 2 AS cut FROM lo),
        po AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN lead >= cut THEN l_suppkey END)
                   AS n_late,
                 max(CASE WHEN lead >= cut THEN l_suppkey END) AS the_supp
          FROM lo, b
          GROUP BY 1),
        -- aggregate BEFORE the name join (as the plan does): on a hostile
        -- corpus with duplicate supplier keys, count-after-join would
        -- double the waits while the plan replicates them per name row
        w AS (SELECT the_supp, count(*) AS numwait FROM po
              WHERE n_supp > 1 AND n_late = 1 GROUP BY 1)
        SELECT s_suppkey, s_name, numwait
        FROM w JOIN supplier ON the_supp = s_suppkey
        ORDER BY numwait DESC, s_suppkey""")),

    // ---- TPC-H Q6 shape: forecast revenue change ---------------------------
    // The pure scan-side query: revenue that WOULD move if mid-band
    // discounts were eliminated, over the first half of the ship-date
    // span. Every predicate (derived date bound, discount band, quantity
    // cap) sits on the lineitem scan — PlanSpec asserts all three reach
    // PushedFilters; the delta is the exact decimal Σ price·discount.
    // The discount band endpoints are structural domain values (the
    // generator's 11-step 0.00–0.10 grid, the 'PROMO' precedent); a
    // stored double compares identically against the same literal in
    // both engines.
    GraftQuery(
      "q6_forecast",
      (s, dir) => {
        val cut = spanCut(Tables.lineitem(s, dir), col("l_shipdate"))
        Tables.lineitem(s, dir)
          .filter(col("l_discount").between(0.02, 0.06) &&
            col("l_quantity") < 24)
          .crossJoin(broadcast(cut))
          .filter(unix_micros(col("l_shipdate")) < col("cut"))
          .agg(round(sum(col("l_extendedprice").cast(DecimalType(18, 2))
              * col("l_discount").cast(DecimalType(18, 2)))
            .cast(DoubleType), 2).as("revenue_delta"),
            count(lit(1)).as("n_lineitems"))
      },
      Some("""
        WITH b AS (
          SELECT (min(epoch_us(CAST(l_shipdate AS TIMESTAMP)))
                  + max(epoch_us(CAST(l_shipdate AS TIMESTAMP)))) // 2 AS cut
          FROM lineitem)
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS revenue_delta,
               count(*) AS n_lineitems
        FROM lineitem, b
        WHERE l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
          AND epoch_us(CAST(l_shipdate AS TIMESTAMP)) < cut""")),

    // ---- TPC-H Q8 shape: national market share by order year --------------
    // Inside ONE region's customer market (the alphabetically-first
    // region — data-derived), what share of supplied revenue came from
    // ONE target nation (the region's alphabetically-first nation), per
    // order year. Combines the two-role dimension join (q7) with the
    // conditional-share aggregate (q14): the customer role restricts the
    // market through the nation⋈region chain, the supplier role carries
    // its nation NAME into a CASE inside the same partial agg, and the
    // share divides the exact decimal sums as DOUBLE÷DOUBLE under a
    // zero-total guard.
    //
    // Scale: region/nation chains and the supplier→nation map broadcast;
    // orders prunes through the market join before the orderkey spine;
    // the final agg is |years| groups.
    GraftQuery(
      "q8_market_share",
      (s, dir) => {
        val rg = Tables.region(s, dir).agg(min(col("r_name")).as("rg"))
        val natInReg = Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
          .crossJoin(broadcast(rg))
          .filter(col("r_name") === col("rg"))
          .select("n_nationkey", "n_name")
        val tn = natInReg.agg(min(col("n_name")).as("tn"))
        val market = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
          .join(broadcast(natInReg.select(col("n_nationkey").as("mk"))),
            col("c_nationkey") === col("mk"))
          .select("c_custkey")
        val oc = Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate")
          .join(market, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"),
            year(col("o_orderdate")).as("o_year"))
        val li = Tables.lineitem(s, dir)
          .join(broadcast(Tables.supplier(s, dir)
              .select("s_suppkey", "s_nationkey")
              .join(broadcast(Tables.nation(s, dir)
                .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))),
                col("s_nationkey") === col("sk"))
              .select("s_suppkey", "supp_nation")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("supp_nation"), revenueExpr.as("rev"))
        li.join(oc, col("l_orderkey") === col("o_orderkey"))
          .crossJoin(broadcast(tn))
          .groupBy("o_year")
          .agg(sum(when(col("supp_nation") === col("tn"), col("rev"))
              .otherwise(lit(0).cast(DecimalType(18, 2)))).as("target_rev"),
            sum(col("rev")).as("total_rev"),
            count(lit(1)).as("n_lineitems"))
          .select(col("o_year"),
            round(when(col("total_rev") =!= 0,
              lit(100) * col("target_rev").cast(DoubleType)
                / col("total_rev").cast(DoubleType)), 4).as("mkt_share_pct"),
            round(col("total_rev").cast(DoubleType), 2).as("revenue"),
            col("n_lineitems"))
          .orderBy(col("o_year").asc_nulls_last)
      },
      Some(s"""
        WITH rg AS (SELECT min(r_name) AS rg FROM region),
        nr AS (SELECT n_nationkey, n_name
               FROM nation JOIN region ON n_regionkey = r_regionkey, rg
               WHERE r_name = rg),
        tn AS (SELECT min(n_name) AS tn FROM nr)
        SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_year,
               round(CASE WHEN $sqlRevenue = 0 THEN NULL
                 ELSE 100 * CAST(sum(CASE WHEN sn.n_name = tn
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST($sqlRevenue AS DOUBLE) END, 4) AS mkt_share_pct,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nr cn    ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey, tn
        GROUP BY 1
        ORDER BY 1 NULLS LAST""")),

    // ---- TPC-H Q9 shape: product-line profit by nation and year -----------
    // Profit = discounted revenue − part cost (this corpus ships no
    // partsupp, so the part's retail price × quantity stands in for
    // ps_supplycost × quantity — same join tree, same arithmetic shape),
    // rolled up to the supplier's nation per order year. Every term is an
    // exact decimal product, so the two-level sum reassociates exactly at
    // any parallelism.
    //
    // Scale: part joins the spine as a plain equi-join (AQE broadcasts
    // while it fits); the supplier→nation map broadcasts; the orderkey
    // spine shuffles once; |nations × years| final groups.
    GraftQuery(
      "q9_profit",
      (s, dir) => {
        val profit = revenueExpr -
          col("p_retailprice").cast(DecimalType(18, 2)) *
            col("l_quantity").cast(DecimalType(18, 2))
        // fanOutNarrow (r14): profit's two decimal products per row ran on
        // the single-file scan's one task; conditional rebalance, exact
        // decimal sums downstream.
        val li = Tables.fanOutNarrow(Tables.lineitem(s, dir)
            .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
              "l_extendedprice", "l_discount"))
          .join(Tables.part(s, dir).select("p_partkey", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, dir)
              .select("s_suppkey", "s_nationkey")
              .join(broadcast(Tables.nation(s, dir)
                .select("n_nationkey", "n_name")),
                col("s_nationkey") === col("n_nationkey"))
              .select("s_suppkey", "n_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("n_name"), profit.as("profit"))
        li.join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(col("profit")).cast(DoubleType), 2).as("profit"),
            count(lit(1)).as("n_lineitems"))
          .orderBy(col("n_name").asc_nulls_last,
            col("o_year").desc_nulls_last)
      },
      Some("""
        SELECT n_name, CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_year,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 - CAST(p_retailprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS profit,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        ORDER BY 1 NULLS LAST, 2 DESC NULLS LAST""")),

    // ---- TPC-H Q10 shape: returned-item revenue by customer ---------------
    // Which customers returned the most revenue in the third quarter of
    // the order-date span: lineitems flagged 'R' (a stable generator
    // domain value) joined through their window-filtered orders to the
    // customer and nation dims, top 20 by lost revenue. The returnflag
    // filter rides the lineitem scan; the top-k is a
    // TakeOrderedAndProject over (revenue DESC, c_custkey, c_name) — the
    // custkey tiebreak makes the LIMIT deterministic across engines.
    GraftQuery(
      "q10_returns",
      (s, dir) => {
        val win = spanWindow(Tables.orders(s, dir), col("o_orderdate"))
        val oc = Tables.orders(s, dir)
          .crossJoin(broadcast(win))
          .filter(unix_micros(col("o_orderdate")) >= col("w0") &&
            unix_micros(col("o_orderdate")) < col("w1"))
          .select("o_orderkey", "o_custkey")
        Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), revenueExpr.as("rev"))
          .join(oc, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir)
              .select("c_custkey", "c_name", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)
              .select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(round(sum(col("rev")).cast(DoubleType), 2).as("revenue"),
            count(lit(1)).as("n_lineitems"))
          // all three GROUP KEYS in the tiebreak: duplicate dim keys on
          // a hostile corpus can yield two groups sharing (custkey,
          // name) that tie on revenue and differ only in n_name — the
          // LIMIT boundary must still be a total order (review finding)
          .orderBy(col("revenue").desc, col("c_custkey").asc_nulls_last,
            col("c_name").asc_nulls_last, col("n_name").asc_nulls_last)
          .limit(20)
      },
      Some(s"""
        WITH b AS (
          SELECT min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                 + (max(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                    - min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))) // 2 AS w0,
                 min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                 + (max(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                    - min(epoch_us(CAST(o_orderdate AS TIMESTAMP)))) * 3 // 4 AS w1
          FROM orders)
        SELECT c_custkey, c_name, n_name,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey, b
        WHERE l_returnflag = 'R'
          AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) >= w0
          AND epoch_us(CAST(o_orderdate AS TIMESTAMP)) < w1
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey NULLS LAST, c_name NULLS LAST,
                 n_name NULLS LAST
        LIMIT 20""")),

    // ---- TPC-H Q12 shape: priority mix per line status ---------------------
    // Per line status (this corpus's stand-in for ship mode): how many
    // lineitems shipped in the second half of the span belong to
    // critical-priority orders (1-URGENT / 2-HIGH — stable generator
    // domain values) vs everything else. The CASE pair rides one partial
    // agg; a NULL priority counts on the low side in both engines (the
    // IN predicate evaluates NULL → else-branch).
    GraftQuery(
      "q12_priority_mix",
      (s, dir) => {
        val cut = spanCut(Tables.lineitem(s, dir), col("l_shipdate"))
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linestatus", "l_shipdate")
          .crossJoin(broadcast(cut))
          .filter(unix_micros(col("l_shipdate")) >= col("cut"))
          .join(Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(sum(when(hi, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
            sum(when(hi, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
          .orderBy(col("l_linestatus").asc_nulls_last)
      },
      Some("""
        WITH b AS (
          SELECT (min(epoch_us(CAST(l_shipdate AS TIMESTAMP)))
                  + max(epoch_us(CAST(l_shipdate AS TIMESTAMP)))) // 2 AS cut
          FROM lineitem)
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey, b
        WHERE epoch_us(CAST(l_shipdate AS TIMESTAMP)) >= cut
        GROUP BY 1
        ORDER BY 1 NULLS LAST""")),

    // ---- TPC-H Q16 shape: supplier diversity per part attribute -----------
    // How many DISTINCT suppliers ship each (brand, type, size) — with
    // the supplier-part relation re-derived from lineitem (no partsupp
    // in this corpus), one brand excluded by a data-derived <>
    // (q17's alphabetically-first — the anti-literal), and suppliers
    // with a NEGATIVE balance excluded via LEFT ANTI (Q16's
    // customer-complaints exclusion; the driver corpus has none, the
    // hostile corpus exercises it — written as NOT EXISTS, never NOT IN,
    // for null-key safety). countDistinct fans (part,supp) pairs into
    // one Expand — acceptable here because the grouping is the part
    // attribute triple, not a per-order profile (no q21-style rewrite
    // needed: the distinct IS the aggregate).
    GraftQuery(
      "q16_supplier_cnt",
      (s, dir) => {
        val mb = Tables.part(s, dir).agg(min(col("p_brand")).as("mb"))
        val badSupp = Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
          .join(Tables.part(s, dir)
              .select("p_partkey", "p_brand", "p_type", "p_size")
              .crossJoin(broadcast(mb))
              .filter(col("p_brand") =!= col("mb"))
              .select("p_partkey", "p_brand", "p_type", "p_size"),
            col("l_partkey") === col("p_partkey"))
          .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand").asc_nulls_last,
            col("p_type").asc_nulls_last, col("p_size").asc_nulls_last)
      },
      Some("""
        WITH mb AS (SELECT min(p_brand) AS mb FROM part)
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part ON l_partkey = p_partkey, mb
        WHERE p_brand <> mb
          AND NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey
                            AND s.s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, 1 NULLS LAST, 2 NULLS LAST, 3 NULLS LAST""")),

    // ---- TPC-H Q11 shape: important stock value by nation ------------------
    // The HAVING-against-a-global-fraction shape Q11 exists for: nations
    // whose stock value exceeds an equal share (1/|nations|, data-derived
    // — Q11's 0.0001/SF constant re-expressed without a literal) of the
    // corpus total. partsupp is re-derived from lineitem (the
    // min_cost_supplier precedent): per (part, supplier), availqty = Σ
    // shipped quantity and unit cost = the minimum observed
    // floor(price/quantity·1e4) — an IEEE double division floored to an
    // integer, identical in both engines. Every product stages through
    // explicit decimal precisions (aq 18,2 × u4 12,0 → 31,2; sv 28,2 ×
    // nn 4,0 → 33,2) so Spark's 38-precision clamp never rounds — an
    // unstaged (38,2)×bigint multiply silently loses exactness at the
    // precision ceiling.
    //
    // Scale: one (part,supp) agg over the offer-filtered scan, a
    // broadcast supplier→nation map, a 25-row rollup, two 1-row
    // broadcasts. The HAVING compares exact decimals cross-multiplied.
    GraftQuery(
      "q11_stock_value",
      (s, dir) => {
        val unit4 = floor(col("l_extendedprice") / col("l_quantity")
          * lit(10000)).cast(LongType)
        val ps = Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 0 && col("l_extendedprice").isNotNull)
          // key-aligned rebalance (the top_customers constraint): the
          // single-row-group testdata scans with parallelism 1; partkey
          // is a prefix of the grouping, so the agg adds no exchange
          .repartition(s.sparkContext.defaultParallelism, col("l_partkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DecimalType(18, 2)).as("aq"),
            min(unit4).cast(DecimalType(12, 0)).as("u4"))
        val stock = ps
          .join(broadcast(Tables.supplier(s, dir)
              .select("s_suppkey", "s_nationkey")
              .join(broadcast(Tables.nation(s, dir)
                .select("n_nationkey", "n_name")),
                col("s_nationkey") === col("n_nationkey"))
              .select("s_suppkey", "n_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("n_name")
          .agg(sum(col("aq") * col("u4")).as("sv"))
        val nn = Tables.nation(s, dir)
          .agg(count(lit(1)).cast(DecimalType(4, 0)).as("nn"))
        // the total is a WINDOW over the aggregated frame, not a second
        // crossJoin(broadcast(agg)) derivation: `stock` is one row per
        // nation (≤ |nation| rows at ANY corpus scale), so a single-
        // partition window is bounded and free, while the broadcast-agg
        // formulation re-derived the whole lineitem→groupBy→join→groupBy
        // chain a second time (pure plans have no cache; two renamed
        // subtrees don't share exchanges — guide §7.2 duplicated
        // subtrees). Plan: 2 full fact passes → 1. The lit(1) partition
        // key keeps WindowExec's "no partition defined" WARN out of every
        // bench log without changing the (single-partition) execution.
        stock
          .withColumn("tot", sum(col("sv")).over(
            Window.partitionBy(lit(1))))
          .crossJoin(broadcast(nn))
          .filter(col("sv").cast(DecimalType(28, 2)) * col("nn") > col("tot"))
          .select(col("n_name"),
            round(col("sv").cast(DoubleType), 2).as("stock_value"))
          .orderBy(col("stock_value").desc, col("n_name").asc_nulls_last)
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                   AS DECIMAL(18,2)) AS aq,
                 CAST(min(CAST(floor(l_extendedprice / l_quantity * 10000)
                   AS BIGINT)) AS DECIMAL(12,0)) AS u4
          FROM lineitem
          WHERE l_quantity > 0 AND l_extendedprice IS NOT NULL
          GROUP BY 1, 2),
        st AS (
          SELECT n_name, sum(aq * u4) AS sv
          FROM ps
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          GROUP BY 1),
        t AS (SELECT sum(sv) AS tot FROM st),
        c AS (SELECT CAST(count(*) AS DECIMAL(4,0)) AS nn FROM nation)
        SELECT n_name, round(CAST(sv AS DOUBLE), 2) AS stock_value
        FROM st, t, c
        WHERE CAST(sv AS DECIMAL(28,2)) * nn > tot
        ORDER BY stock_value DESC, n_name NULLS LAST""")),

    // ---- star join with broadcast dims: orders rolled up to region -------
    GraftQuery(
      "region_rollup",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_orders"),
               Num.dsumAsDouble(col("o_totalprice")).as("total_price"))
          .orderBy("r_name")
      },
      Some(s"""
        SELECT r_name, count(*) AS n_orders,
               ${Num.sqlDsum("o_totalprice")} AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // ---- left-semi join (EXISTS) -----------------------------------------
    GraftQuery(
      "semi_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // ---- left-anti join (NOT EXISTS) -------------------------------------
    // The probe side is filtered first (filter pushes below the join), so
    // the anti-join build set is a fraction of orders.
    GraftQuery(
      "anti_join",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ---- set operations ---------------------------------------------------
    GraftQuery(
      "set_union",
      (s, dir) => Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
        .distinct().orderBy("nationkey"),
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey""")),

    GraftQuery(
      "set_intersect",
      (s, dir) => Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey"),
      Some("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey""")),

    GraftQuery(
      "set_except",
      (s, dir) => Tables.customer(s, dir)
        .filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, dir)
          .filter(col("s_acctbal") > 5000).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey"),
      Some("""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        EXCEPT
        SELECT DISTINCT s_nationkey FROM supplier WHERE s_acctbal > 5000
        ORDER BY nationkey""")),

    // ---- bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) --------------
    // The multiset variants the plain set ops miss: multiplicities
    // survive, so "how many of each priority appear in BOTH status
    // classes" is answerable without a groupBy-join reformulation. Spark
    // plans these as aggregate+generate (count-min replication), not a
    // distinct — the output is a bag, made hash-comparable by the total
    // ORDER BY over tagged rows.
    GraftQuery(
      "set_ops_all",
      (s, dir) => {
        val open = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "O").select("o_orderpriority")
        val done = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F").select("o_orderpriority")
        open.intersectAll(done).withColumn("op", lit("intersect_all"))
          .union(open.exceptAll(done).withColumn("op", lit("except_all")))
          .select("op", "o_orderpriority")
          .orderBy("op", "o_orderpriority")
      },
      Some("""
        SELECT 'intersect_all' AS op, o_orderpriority FROM (
          SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
          INTERSECT ALL
          SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT 'except_all' AS op, o_orderpriority FROM (
          SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
          EXCEPT ALL
          SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
        ORDER BY op, o_orderpriority""")),

    // ---- correlated LATERAL join with LIMIT (top-n per driving row) ------
    // The SQL face of TopKPerKey: each nation drives a correlated
    // LATERAL subquery returning its top-3 customers by balance — the
    // text is identical in both engines (lateral joins landed in Spark 4
    // SQL). Catalyst decorrelates the limit into a ranked window under
    // the hood; the DataFrame-native alternative stays the TopKPerKey
    // operator, which skips the full per-key sort — registered both ways
    // on purpose so the SQL surface and the physical operator are each
    // covered.
    GraftQuery(
      "lateral_topk",
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("graft_nation_v")
        Tables.customer(s, dir).createOrReplaceTempView("graft_customer_v")
        s.sql("""
          SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
          FROM graft_nation_v n,
          LATERAL (SELECT c_custkey, c_name, c_acctbal FROM graft_customer_v c
                   WHERE c.c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
          ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")
      },
      Some("""
        SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_name, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")),

    // ---- ROLLUP (hierarchical subtotals) ---------------------------------
    // NULL grouping keys are coalesced to 'ALL' so both engines sort alike.
    GraftQuery(
      "rollup_lineitem",
      // fanOutNarrow (r14): the 3x Expand + decimal sum ran on the
      // single-file scan's one task; conditional rebalance, exact sums.
      (s, dir) => Tables.fanOutNarrow(Tables.lineitem(s, dir)
          .select("l_returnflag", "l_linestatus", "l_quantity"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
             Num.dsumAsDouble(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls"),
      Some(s"""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n,
               ${Num.sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ---- analytic window: top-3 per group via row_number -----------------
    GraftQuery(
      "window_rank",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("value").desc, col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
                  row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("user_id", "rn")
      },
      Some("""
        SELECT user_id, event_id, value, rn FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events)
        WHERE rn <= 3
        ORDER BY user_id, rn""")),

    // ---- analytic window: lag / event-time deltas ------------------------
    // asc_nulls_last + NULLS LAST pin the null-ts placement: Spark's ASC
    // default is NULLS FIRST, DuckDB's NULLS LAST, so an unpinned ordering
    // silently reshuffles a null-event-time row's lag neighbors
    // (hostile-events sweep finding).
    GraftQuery(
      "window_lag",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc_nulls_last, col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
                  lag("value", 1).over(w).as("prev_value"),
                  (unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
                    .as("delta_us"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        SELECT user_id, event_id, value,
               lag(value, 1) OVER w AS prev_value,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER w) AS delta_us
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP) NULLS LAST, event_id)
        ORDER BY user_id, event_id""")),

    // ---- analytic window: 3-row moving average ---------------------------
    // Spelled with explicit lags (fixed-order arithmetic) instead of a
    // sliding-frame avg so both engines sum in the same order — DuckDB's
    // frame aggregation may subtract/re-add, which breaks FP determinism.
    // Null-ts ordering pinned NULLS LAST (window_lag's rationale).
    GraftQuery(
      "moving_avg",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc_nulls_last, col("event_id"))
        val l1 = lag("value", 1).over(w)
        val l2 = lag("value", 2).over(w)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            round((col("value") + coalesce(l1, lit(0.0)) + coalesce(l2, lit(0.0))) /
              (lit(1) + l1.isNotNull.cast(IntegerType) + l2.isNotNull.cast(IntegerType)),
              4).as("mavg3"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        SELECT user_id, event_id, value,
               round((value + coalesce(lag(value, 1) OVER w, 0)
                            + coalesce(lag(value, 2) OVER w, 0))
                     / (1 + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 1 END
                          + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 1 END),
                     4) AS mavg3
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP) NULLS LAST, event_id)
        ORDER BY user_id, event_id""")),

    // ---- JSON extraction from string props (events.props) ---------------
    GraftQuery(
      "json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          // try_cast, not cast: Spark 4 runs ANSI by default, so a
          // non-integer k (props = {"k":"v"}) would ABORT the query
          // mid-corpus instead of nulling the row (adversarial-events
          // sweep finding); get_json_object itself already nulls
          // malformed/empty JSON
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
        .orderBy("event_id"),
      // DuckDB mirror of the same tolerance: TRY_CAST(props AS JSON)
      // nulls malformed/empty JSON (raw json_extract_string ERRORS on
      // them), TRY_CAST ... AS BIGINT nulls non-integer values
      Some("""
        SELECT event_id,
               TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                 AS BIGINT) AS k
        FROM events
        ORDER BY event_id""")),

    // ---- VARIANT semi-structured path (Spark 4 native) -------------------
    // The modern shape of the json_extract query above: props parses ONCE
    // into Spark's binary VariantType and typed fields come out via
    // variant_get — at scale this is the open-table-format pattern where
    // semi-structured columns are stored as variant and never re-tokenize
    // JSON text per access (json_extract re-walks the string for every
    // path). The extraction runs UNDER the aggregation, so the shuffle
    // carries only (event_type, bigint), never the raw JSON. try_parse_json
    // keeps a malformed row NULL in both engines instead of aborting.
    GraftQuery(
      "variant_stats",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          try_variant_get(try_parse_json(col("props")), "$.k", "bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
          sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type"),
      // TRY_CAST(props AS JSON) mirrors try_parse_json's tolerance —
      // raw json_extract_string ERRORS on malformed/empty props where
      // the Spark side nulls them (adversarial-events sweep finding)
      Some("""
        WITH x AS (
          SELECT event_type,
                 TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k')
                   AS BIGINT) AS k
          FROM events)
        SELECT event_type, count(*) AS n,
               count(k) AS n_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k,
               max(k) AS max_k
        FROM x
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- CUBE (all grouping-set combinations) ----------------------------
    GraftQuery(
      "cube_orders",
      (s, dir) => Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
             Num.dsumAsDouble(col("o_totalprice")).as("total_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total_price"))
        .orderBy("status", "priority"),
      Some(s"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               ${Num.sqlDsum("o_totalprice")} AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- exact interpolated median per group -----------------------------
    // Spark `percentile` and DuckDB `quantile_cont` both sort-and-
    // interpolate with the same (a+b)/2 midpoint formula on doubles.
    GraftQuery(
      "median_value",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("median_value"),
             round(expr("percentile(value, 0.9)"), 4).as("p90_value"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS median_value,
               round(quantile_cont(value, 0.9), 4) AS p90_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- scalar-function battery (string / math / date) ------------------
    GraftQuery(
      "scalar_funcs",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderkey") % 97 === 0) // deterministic sample
        .select(
          col("o_orderkey"),
          upper(col("o_orderstatus")).as("status_uc"),
          substring(col("o_orderpriority"), 1, 1).as("prio_digit"),
          concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
          length(col("o_orderpriority")).as("prio_len"),
          regexp_replace(col("o_orderpriority"), "[0-9]-", "").as("prio_name"),
          round(abs(col("o_totalprice") * -1), 1).as("abs_price"),
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast(TimestampType))
            .cast(LongType).as("days_since_epoch_start"))
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
               upper(o_orderstatus) AS status_uc,
               substring(o_orderpriority, 1, 1) AS prio_digit,
               concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
               length(o_orderpriority) AS prio_len,
               regexp_replace(o_orderpriority, '[0-9]-', '') AS prio_name,
               round(abs(o_totalprice * -1), 1) AS abs_price,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               date_trunc('month', o_orderdate) AS month_start,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
        FROM orders
        WHERE o_orderkey % 97 = 0
        ORDER BY o_orderkey""")),

    // ---- A6 + EP2: the SQL-string surface over registered temp views -----
    // (reference registers a temp view at processor.py:79 and serves ad-hoc
    // SQL via Postgres; here the engine itself parses and plans the SQL)
    GraftQuery(
      "sql_over_view",
      (s, dir) => {
        // unique per-call view names, dropped once sql() has analyzed the
        // plan (views inline at analysis): same catalog-hygiene fix as
        // Stats.rolling_1h — two concurrent builds against different dirs
        // must not read each other's tables
        val id = Tables.viewSeq.incrementAndGet()
        val (vo, vc, vn) = (s"graft_orders_$id", s"graft_customer_$id", s"graft_nation_$id")
        // registration INSIDE the try: a loader failure after the first
        // view would otherwise leak it in the session catalog (the drop
        // in finally tolerates not-yet-registered names)
        try {
          Tables.orders(s, dir).createOrReplaceTempView(vo)
          Tables.customer(s, dir).createOrReplaceTempView(vc)
          Tables.nation(s, dir).createOrReplaceTempView(vn)
          s.sql(s"""
          SELECT n.n_name AS nation,
                 count(*) AS n_orders,
                 round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_price
          FROM $vo o
          JOIN $vc c ON o.o_custkey = c.c_custkey
          JOIN $vn n ON c.c_nationkey = n.n_nationkey
          WHERE o.o_orderstatus <> 'P'
          GROUP BY n.n_name
          ORDER BY nation""")
        } finally Seq(vo, vc, vn).foreach(s.catalog.dropTempView(_))
      },
      Some("""
        SELECT n_name AS nation, count(*) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderstatus <> 'P'
        GROUP BY n_name
        ORDER BY nation""")),

    // ---- full outer join (null-extended both sides) ----------------------
    GraftQuery(
      "full_outer_join",
      (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_acctbal") > 9500)
          .select("c_custkey", "c_name")
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_f_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_name"), col("n_f_orders"))
          .orderBy("custkey")
      },
      Some("""
        SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_f_orders
        FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9500) c
        FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_f_orders
                         FROM orders WHERE o_orderstatus = 'F'
                         GROUP BY o_custkey) o
          ON c_custkey = o_custkey
        ORDER BY custkey""")),

    // ---- LIKE / IN / BETWEEN predicate shapes ----------------------------
    GraftQuery(
      "like_in_between",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "signup") &&
          col("value").between(10, 20) &&
          col("props").like("%\"k\": 1%"))
        .select("event_id", "event_type", "value", "props")
        .orderBy("event_id"),
      Some("""
        SELECT event_id, event_type, value, props
        FROM events
        WHERE event_type IN ('purchase', 'signup')
          AND value BETWEEN 10 AND 20
          AND props LIKE '%"k": 1%'
        ORDER BY event_id""")),

    // ---- navigation/ranking window-function battery ----------------------
    GraftQuery(
      "window_navigation",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("prank"),
            first_value(col("value")).over(w).as("top_value"),
            last_value(col("value")).over(wf).as("bottom_value"))
          .orderBy("user_id", "rnk")
      },
      Some("""
        SELECT user_id, event_id, value,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS prank,
               first_value(value) OVER w AS top_value,
               last_value(value) OVER (PARTITION BY user_id
                 ORDER BY value DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS bottom_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        ORDER BY user_id, rnk""")),

    // ---- ordered string aggregation --------------------------------------
    GraftQuery(
      "string_agg_nations",
      (s, dir) => Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
             count(lit(1)).as("n_nations"))
        .orderBy("r_name"),
      Some("""
        SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // ---- per-key top-k via the custom physical operator ------------------
    // graft.plans.TopKPerKey: partial per-partition k-heaps → shuffle of at
    // most k·keys rows → final merge. Same result set as the row_number
    // formulation (the oracle), radically less shuffle at scale.
    GraftQuery(
      "topk_per_group",
      (s, dir) => graft.plans.TopK.perKey(
          Tables.events(s, dir).select("user_id", "event_id", "value"),
          keys = Seq("user_id"),
          order = Seq("value" -> "desc", "event_id" -> "asc"),
          k = 3)
        .orderBy(col("user_id"), col("value").desc, col("event_id")),
      Some("""
        SELECT user_id, event_id, value FROM (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events)
        WHERE rn <= 3
        ORDER BY user_id, value DESC, event_id""")),

    // ---- pivot (wide reshape) --------------------------------------------
    // Explicit value list: pivot without one triggers a blocking distinct
    // scan to discover columns — never acceptable on a 100 TB table.
    GraftQuery(
      "pivot_events",
      // fill scoped to the pivoted columns: an unscoped na.fill(0) also
      // rewrites a NULL user_id key to 0, silently merging the null group
      // into user 0's row (hostile-events sweep finding)
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("user_id"),
      Some("""
        SELECT user_id,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    // ---- HLL-sketch distinct, oracle-checked via its accuracy bound ------
    // approx_count_distinct is Spark's HyperLogLog++; raw estimates differ
    // legitimately across engines, so the registered row emits (a) the
    // exact count, hash-checked against DuckDB, and (b) the HLL estimate
    // folded into its accuracy CLAIM — |approx − exact| ≤ 5%·exact — which
    // the oracle pins to true. The sketch still runs in the registered
    // plan; rel. error is additionally asserted numerically in
    // OperatorSpec. rsd=0.02 keeps the 5% bound at ≈2.5σ.
    GraftQuery(
      "approx_distinct",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users"),
             approx_count_distinct("user_id", 0.02).as("_approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("_approx") - col("exact_users"))
            <= col("exact_users") * 0.05).as("approx_within_5pct"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS exact_users,
               true AS approx_within_5pct
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ---- deep join tree: the TPC-H Q5 shape ------------------------------
    // Six-table join with a non-key equi-condition (customer and supplier
    // must share a nation). The fact-side chain customer⋈orders⋈lineitem
    // shuffles on its keys; supplier/nation/region are dimensions and ride
    // broadcasts, so the region filter prunes the whole tree at the scan.
    // Catalyst reorders the dimension joins; the plan to check at scale is
    // "three shuffles, three broadcasts, no cartesian".
    GraftQuery(
      "revenue_by_nation",
      (s, dir) => {
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name").isin("AMERICA", "ASIA") &&
            col("o_orderstatus") =!= "P")
          .groupBy(col("n_name").as("nation"))
          // the ONE revenue definition every revenue query shares
          .agg(count(lit(1)).as("n_items"),
            round(sum(revenueExpr).cast(DoubleType), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("nation"))
      },
      Some(s"""
        SELECT n_name AS nation, count(*) AS n_items,
               round(CAST($sqlRevenue AS DOUBLE), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('AMERICA', 'ASIA') AND o_orderstatus <> 'P'
        GROUP BY n_name
        ORDER BY revenue DESC, nation""")),

    // ---- correlated EXISTS / NOT EXISTS subqueries -----------------------
    // The subquery surface of the SQL front door: Catalyst decorrelates
    // EXISTS into a left-semi and NOT EXISTS into a left-anti join (both
    // plain hash shuffles on the correlation key — same plans the
    // DataFrame semi_join/anti_join queries register), so the declarative
    // form costs nothing over the hand-built one. Same catalog hygiene as
    // sql_over_view: unique per-call view names, dropped after analysis.
    GraftQuery(
      "exists_subquery",
      (s, dir) => {
        val id = Tables.viewSeq.incrementAndGet()
        val (vc, vo) = (s"graft_customer_ex_$id", s"graft_orders_ex_$id")
        // registration inside the try — same leak-on-loader-failure
        // hygiene as sql_over_view
        try {
          Tables.customer(s, dir).createOrReplaceTempView(vc)
          Tables.orders(s, dir).createOrReplaceTempView(vo)
          s.sql(s"""
          SELECT c_custkey, c_name
          FROM $vc c
          WHERE EXISTS (SELECT 1 FROM $vo o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 200000)
            AND NOT EXISTS (SELECT 1 FROM $vo o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'F')
          ORDER BY c_custkey""")
        } finally Seq(vc, vo).foreach(s.catalog.dropTempView(_))
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ---- distribution window functions: cume_dist / nth_value ------------
    // Rounds out the analytic-window surface (rank/lag/ntile families are
    // covered elsewhere). cume_dist is computed over the value ordering
    // alone — peers share a value, so tie order can't leak into the
    // result; nth_value uses a full-partition frame with a unique
    // (value, event_id) ordering so "second lowest" is deterministic.
    GraftQuery(
      "window_distribution",
      (s, dir) => {
        // NULLS LAST pinned in both engines — unpinned, Spark's NULLS-FIRST
        // ASC default makes a null-value row rank 1 and shifts nth_value(2)
        // onto the true minimum (hostile-events sweep finding)
        val byValue = Window.partitionBy("event_type")
          .orderBy(col("value").asc_nulls_last)
        val full = Window.partitionBy("event_type")
          .orderBy(col("value").asc_nulls_last, col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            round(cume_dist().over(byValue), 6).as("value_cume_dist"),
            round(nth_value(col("value"), 2).over(full), 2).as("second_lowest"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, event_type,
               round(cume_dist() OVER (
                 PARTITION BY event_type ORDER BY value NULLS LAST), 6)
                 AS value_cume_dist,
               round(nth_value(value, 2) OVER (
                 PARTITION BY event_type ORDER BY value NULLS LAST, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
                 AS second_lowest
        FROM events
        ORDER BY event_id"""))
  )
}
