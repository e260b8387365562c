package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Storage-bucketing gates: the write-once-shuffle-never discipline that a
  * 100 TB deployment relies on for repeated fact-fact joins. These assert
  * the PLANNER behavior (exchanges elided, buckets pruned), not just the
  * results — a silent regression here re-introduces a full-corpus shuffle
  * per batch at scale. ComponentSpec pins the raw `bucketBy` write path;
  * this suite drives the `operators.Bucketing` API and the three gates the
  * raw test doesn't cover: one-phase aggregation, point-filter bucket
  * pruning (and the autoBucketedScan demotion that forfeits it), and the
  * mismatched-bucket-count trap. */
class BucketingSpec extends SparkSuite {

  private val buckets = 8

  private def withBucketedTables[A](f: => A): A = {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity",
        "l_extendedprice"), "bkt_lineitem", "l_orderkey", buckets)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey",
        "o_orderpriority").withColumnRenamed("o_orderkey", "l_orderkey"),
      "bkt_orders", "l_orderkey", buckets)
    try f
    finally Seq("bkt_lineitem", "bkt_orders", "bkt_orders_12").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("co-located join on the bucket key plans with zero exchanges") {
    withBucketedTables {
      // force the big-big path: broadcast would hide the co-location win
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Bucketing.colocatedJoin(spark, "bkt_lineitem", "bkt_orders",
          "l_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n${plan.take(1500)}")
        // parity with the plain (shuffled) join — bucketing is layout,
        // never semantics
        val plain = Tables.lineitem(spark, sf)
          .select(col("l_orderkey"), col("l_quantity"))
          .join(Tables.orders(spark, sf)
            .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
            Seq("l_orderkey"))
        assert(j.count() == plain.count(),
          "bucketed join row count diverges from the shuffled join")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("aggregation on the bucket key runs one-phase — no partial exchange") {
    withBucketedTables {
      val a = Bucketing.colocatedAgg(spark, "bkt_lineitem", "l_orderkey",
        Seq(sum(col("l_quantity")).as("q"), count(lit(1)).as("n")))
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key aggregation still shuffles:\n${plan.take(1500)}")
      // parity against the unbucketed aggregate
      val exp = Tables.lineitem(spark, sf).groupBy("l_orderkey")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1))
        .toMap
      val got = a.collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
          r.getAs[Long]("n")).toMap
      assert(got == exp, "bucketed aggregate diverges from the plain one")
    }
  }

  test("a point filter on the bucket key prunes to one bucket at plan time") {
    withBucketedTables {
      // autoBucketedScan demotes a scan with no distribution-hungry
      // operator above it to a plain read — which silently forfeits
      // bucket pruning. A point-lookup deployment turns it off; pin
      // both the knob and the pruned plan it buys.
      val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val saved = spark.conf.get(k)
      spark.conf.set(k, "false")
      try {
        val someKey = spark.table("bkt_lineitem")
          .select("l_orderkey").filter(col("l_orderkey").isNotNull)
          .head().getLong(0)
        val q = spark.table("bkt_lineitem")
          .filter(col("l_orderkey") === someKey)
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains(s"SelectedBucketsCount: 1 out of $buckets"),
          s"bucket pruning did not engage:\n${plan.take(1500)}")
        assert(q.count() > 0)
      } finally spark.conf.set(k, saved)
    }
  }

  test("mismatched bucket counts re-shuffle one side — the deploy-time trap") {
    withBucketedTables {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        "bkt_orders_12", "l_orderkey", 12)
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Bucketing.colocatedJoin(spark, "bkt_lineitem",
          "bkt_orders_12", "l_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        // Spark coalesces/re-shuffles ONE side; the pinned fact is that
        // the plan is no longer exchange-free, which is exactly why the
        // posture requires a shared bucket count across the fact tables
        assert(plan.contains("Exchange") ||
          plan.contains("REBALANCE") || plan.contains("coalesced"),
          "expected a re-shuffle (or bucket coalesce) on mismatched counts")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }
}
