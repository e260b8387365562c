package graft

import org.apache.spark.sql.functions.col

/** Physical-plan quality gates over the registered queries — the scale
  * disciplines the engine promises, asserted so a regression (a lost
  * pushdown, an accidental cartesian, a de-broadcast dimension) fails CI
  * instead of surfacing as a 100 TB incident. */
class PlanSpec extends SparkSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("no registered plan contains an unbroadcast cartesian product") {
    // includes the actionful cluster builders: their CC iteration runs a
    // few sf0.001 jobs here, a fair price for keeping every registered
    // query's executed plan under the cartesian gate
    SparkEntry.all.foreach { q =>
      val plan = q.plan(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct — a cross join lost its broadcast")
    }
  }

  test("selective filters reach the parquet scan as pushed filters") {
    for (name <- Seq("filter_eq", "like_in_between")) {
      val plan = planOf(name)
      assert(plan.contains("PushedFilters: [") &&
        !plan.matches("(?s).*PushedFilters: \\[\\].*"),
        s"$name scan has no pushed filters")
    }
  }

  test("star-schema dimension joins broadcast the dimension side") {
    assert(planOf("region_rollup").contains("BroadcastHashJoin"))
    assert(planOf("top_customers").contains("Join")) // big-big: shuffled join is correct
  }

  test("global top-k plans as TakeOrderedAndProject, not sort-all") {
    assert(planOf("latest_events").contains("TakeOrderedAndProject"))
  }

  test("literal time bounds push onto the events scan column") {
    import org.apache.spark.sql.functions._
    val since = 1700000000000000L // any µs literal
    val df = Tables.eventsSince(spark, sf, since)
    val plan = df.queryExecution.executedPlan.toString
    // either encoding: the bound must reach PushedFilters on ts (raw ns
    // long or µs timestamp — same pushed-predicate shape)
    assert(plan.contains("GreaterThanOrEqual(ts,"),
      s"time bound not pushed to the scan:\n$plan")
    // semantics identical to filtering the converted column
    val expected = Tables.events(spark, sf)
      .filter(col("ts") >= timestamp_micros(lit(since))).count()
    assert(df.count() == expected)
  }

  test("aggregations keep map-side partial aggregation") {
    // partial+final pair → two HashAggregates around the exchange
    val plan = planOf("groupby_count")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "groupby_count lost its partial aggregation")
  }

  test("decontaminate broadcasts the eval-gram side") {
    val plan = planOf("decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      "eval grams must ride a broadcast, not a shuffle")
  }

  test("revenue_by_nation: dimensions broadcast, no cartesian in the six-table tree") {
    val plan = planOf("revenue_by_nation")
    assert(!plan.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "supplier/nation/region must ride broadcasts")
  }

  test("knn_classify ranks through TopKPerKeyExec, not a per-query window sort") {
    assert(planOf("knn_classify").contains("TopKPerKey"))
  }

  test("zscore_outliers broadcasts the stats frame back onto the scan") {
    assert(planOf("zscore_outliers").contains("BroadcastHashJoin"),
      "per-group stats must ride a broadcast, not shuffle the events")
  }

  test("gap_fill shuffles the data once: grid joins are broadcast-sized") {
    val plan = planOf("gap_fill")
    // the dense grid side (types × hours) must never shuffle the events
    // table a second time: bounds and buckets meet the grid via broadcast
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("bloom_semi_join probes the bloom ahead of the join and matches the plain semi join") {
    val plan = planOf("bloom_semi_join")
    assert(plan.contains("might_contain"),
      "bloom probe missing from the physical plan")
    // the probe must appear in a Filter over the lineitem SCAN side, i.e.
    // before any exchange — that is the entire point of the operator
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("LeftSemi")
    assert(filterIdx >= 0 && joinIdx >= 0)
    // exact-equivalence: identical to the unpruned semi join
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val plain = Tables.lineitem(spark, sf)
      .join(urgent.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val pruned = operators.JoinPruning.bloomSemiJoin(
      Tables.lineitem(spark, sf), urgent, "l_orderkey", "o_orderkey")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("block_dedup scans the corpus exactly once") {
    // the canonical-instance mark is a windowed min, not a groupBy joined
    // back — the join formulation re-scans and re-shingles everything and
    // plans an unbroadcastable join; this gate keeps the one-scan shape
    val plan = planOf("block_dedup")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"block_dedup plans $scans corpus scans, expected 1")
    assert(plan.contains("Window"), "canonical-instance window missing")
  }

  test("lang_divergence scans the corpus exactly twice (tf + scalar G)") {
    // the marginals are window sums over the vocabulary-bounded tf frame;
    // deriving them as separate aggregation branches re-plans the whole
    // explode subtree per branch (8 static corpus scans, measured)
    val plan = planOf("lang_divergence")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"lang_divergence plans $scans corpus scans, expected 2")
  }

  test("pq_topk and mad_outliers broadcast their small frames") {
    for (name <- Seq("pq_topk", "mad_outliers", "fuzzy_join", "domain_mix_weights",
        "heavy_hitters", "mrl_topk", "winsorize", "winnow_decontaminate",
        "semantic_decontaminate")) {
      val plan = planOf(name)
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin")
        || plan.contains("BroadcastNestedLoopJoin"),
        s"$name lost its broadcast")
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("dsir_weights scans the corpus exactly twice and broadcasts the ratio table") {
    // bucket stats + per-doc counts are the two passes; the B-row
    // log-ratio table must ride a broadcast onto the per-doc side —
    // a shuffled join there would re-partition the whole exploded corpus
    val plan = planOf("dsir_weights")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"dsir_weights plans $scans corpus scans, expected 2")
    assert(plan.contains("BroadcastHashJoin"),
      "dsir_weights ratio table lost its broadcast")
  }

  test("packing cumsums window over (lang, bucket), never lang alone") {
    // lang is a handful of values: a doc_id-ordered window partitioned by
    // lang alone funnels each language's whole corpus through one task.
    // The two-phase build's only data-sized windows partition by
    // (lang, bkt); the lang-alone window that remains orders by bkt over
    // the #langs×#buckets offsets frame, which is fine and allowed here.
    // the partition key is lkey (lang null-coalesced for the offsets
    // join — hostile-corpus fix); the hazard shapes are lang OR lkey alone
    val badShape = """\], \[l(?:ang|key)#\d+\], \[doc_id#\d+L? ASC""".r
    val goodShape = """\[lkey#\d+, bkt#\d+L?\], \[doc_id#\d+L? ASC""".r
    for (name <- Seq("shard_packing", "pack_sequences")) {
      val plan = planOf(name)
      assert(badShape.findFirstIn(plan).isEmpty,
        s"$name regressed to a per-language single-task cumsum window")
      assert(goodShape.findFirstIn(plan).isDefined,
        s"$name lost its (lang, bucket) two-phase cumsum window")
    }
  }

  test("changepoints windows over (series, chunk), never the series alone") {
    // same discipline for the frame scoring: event_type has a handful of
    // values, so the scoring window must partition by (event_type, grp)
    // (row-index chunks), and no window may sort a whole series in one
    // task. The tiny offsets frame (partition event_type, order bkt) and
    // the (event_type, hour) peak window are the allowed 1-key shapes.
    val plan = planOf("changepoints")
    val badShape = """\], \[event_type#\d+\], \[ts#\d+""".r
    assert(badShape.findFirstIn(plan).isEmpty,
      "changepoints regressed to a per-series single-task window sort")
    assert("""\[event_type#\d+, grp#\d+L?\], \[g#\d+L? ASC""".r
      .findFirstIn(plan).isDefined,
      "changepoints lost its (event_type, grp) chunked scoring window")
  }

  test("chunkers are shuffle-free up to the presentation sort") {
    // both chunkers promise pure per-row arithmetic: the only exchange in
    // the plan is the final rangepartitioning for the output ordering
    for (name <- Seq("chunk_documents", "cdc_chunks")) {
      val plan = planOf(name)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1, s"$name plans $exchanges exchanges, expected only the sort")
      assert(plan.contains("rangepartitioning"), s"$name lost its presentation sort")
    }
  }

  test("kmeans_refine stays hash-aggregated: no sorts before the output sort") {
    // the packed-scalar argmin exists precisely so the assignment never
    // leaves HashAggregate — min(struct) / row_number formulations each
    // plan SortAggregate or Window with sorts around the argmin exchange
    val plan = planOf("kmeans_refine")
    assert(!plan.contains("SortAggregate"),
      "kmeans_refine argmin fell back to SortAggregate")
    assert(!plan.contains("Window"), "kmeans_refine regained a window sort")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "seed assignment lost its broadcast")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts == 1, s"kmeans_refine plans $sorts sorts, expected only the output sort")
  }

  test("feature_hash and pca_power_iter scan once with map-side partials") {
    for (name <- Seq("feature_hash", "pca_power_iter")) {
      val plan = planOf(name)
      val scans = "FileScan parquet".r.findAllIn(plan).length
      assert(scans == 1, s"$name plans $scans corpus scans, expected 1")
      assert(plan.contains("HashAggregate"), s"$name lost hash aggregation")
    }
  }

  test("bpe_encode's returned frame is one scan of chained rewrites") {
    // training runs at build time (actionful); the ENCODE plan the query
    // returns — the part that runs at corpus scale — must stay one
    // parquet scan through narrow per-row replaces: no join back to the
    // raw text (n_words is recovered from the sentinels), no shuffle
    // before the presentation sort
    val plan = planOf("bpe_encode")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"bpe_encode plans $scans corpus scans, expected 1")
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"bpe_encode plans $exchanges exchanges, expected only the output sort's")
  }

  test("quality_classifier's scoring frame scans the corpus exactly twice") {
    // one scan derives features, one derives the per-doc label frame the
    // margins join back onto; the trained weights ride as a broadcast
    // local relation, never a third scan
    val plan = planOf("quality_classifier")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"quality_classifier plans $scans corpus scans, expected 2")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "trained weights lost their broadcast")
  }

  test("round-6 rollups keep their intended scan counts") {
    // zipf_slope / lang_confusion: one corpus scan, everything after is
    // vocabulary- or matrix-bounded. vocab_coverage: two (tf branch +
    // vocab branch — the lang_divergence trade). skew_profile: two
    // single-column count scans. neardup_rate_by_source: exactly ONE
    // narrow (doc_id, source) scan on top of minhash_pairs' adjudicated
    // shape — if the pair chain regresses, both gates move together.
    def scans(name: String) =
      "FileScan parquet".r.findAllIn(planOf(name)).length
    assert(scans("zipf_slope") == 1, "zipf_slope must scan once")
    assert(scans("lang_confusion") == 1, "lang_confusion must scan once")
    assert(scans("vocab_coverage") == 2, "vocab_coverage must scan twice")
    assert(scans("skew_profile") == 2, "skew_profile must scan twice")
    assert(scans("neardup_rate_by_source") == scans("minhash_pairs") + 1,
      "neardup_rate_by_source must add exactly one narrow scan to the pair chain")
  }

  test("delta_dedup joins on digests only and keeps partial aggregation") {
    // both join keys are 32-hex digests — the plan must never carry text
    // into an exchange, and the within-batch min-id survivor agg keeps
    // its map-side partial
    val plan = planOf("delta_dedup")
    assert(!plan.matches("(?s).*Exchange hashpartitioning\\([^)]*text.*"),
      "delta_dedup shuffles document text")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "delta_dedup lost partial aggregation")
  }

  test("graph queries iterate over the checkpointed edge set, never the LSH chain") {
    // dup_pagerank's recurrence references the edge frame five times and
    // dup_triangles three; as pure plans each mention re-derives the whole
    // MinHash chain (measured: 88 parquet scans). The eager localCheckpoint
    // must leave ZERO parquet scans in the returned plan — every iteration
    // hangs off the materialized RDD.
    for (name <- Seq("dup_pagerank", "dup_triangles")) {
      val plan = planOf(name)
      val scans = "FileScan parquet".r.findAllIn(plan).length
      assert(scans == 0, s"$name re-derives the corpus: $scans parquet scans")
      assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
        s"$name does not read the checkpointed edges")
    }
  }

  test("variant_stats extracts under the aggregation: no raw JSON in the shuffle") {
    val plan = planOf("variant_stats")
    // the scan must read only (event_type, props) ...
    assert(!plan.matches("(?s).*ReadSchema:[^\\n]*user_id.*"),
      "variant_stats scan reads columns the query never touches")
    // ... and the exchange key carries the grouping column, never props:
    // the variant decode + typed extraction happen below the partial agg
    assert(!plan.matches("(?s).*Exchange hashpartitioning\\([^)]*props.*"),
      "variant_stats shuffles raw JSON")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "variant_stats lost partial aggregation")
  }

  test("asof_nearest computes both directional frames over one sort-shuffle") {
    // the design claim: backward carry-last and forward carry-first share
    // one partitioning+ordering. Spark splits the two frame shapes into
    // two stacked WindowExec nodes, but they must hang off a SINGLE
    // Sort+Exchange on user_id — a second hash exchange or a second sort
    // under the windows means the frames stopped sharing the shuffle and
    // the nearest join got twice as expensive as either directional join.
    val plan = planOf("asof_nearest")
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected one hash exchange, got $hashExchanges")
    // one sort under the windows + the final presentation orderBy
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(sorts <= 2, s"expected <=2 sorts, got $sorts")
  }

  test("bq_topk reranks over broadcasts and ranks through TopKPerKey") {
    val plan = planOf("bq_topk")
    assert(plan.contains("TopKPerKey"),
      "shortlist/rank must run the two-phase heap exec, not window sorts")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "rerank joins (shortlist, query side) must ride broadcasts")
    assert(!plan.contains("SortMergeJoin"),
      "bq_topk must never shuffle the corpus for the rerank")
  }

  test("dup_spans shuffles gram digests, not gram text, and keeps partial agg") {
    val plan = planOf("dup_spans")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "dup-gram doc-count lost its partial aggregation")
    // the exchange key must be the md5 digest column `g`; the gram text
    // itself is never a shuffle key (it only exists inside the scan-side
    // projection that feeds the digest)
    assert(plan.matches("(?s).*Exchange hashpartitioning\\(g#.*"),
      "dup_spans does not shuffle on the gram digest")
  }

  test("wave-8 plans: scan counts, shuffle reuse, heap-based ranking") {
    def scans(name: String) =
      "FileScan parquet".r.findAllIn(planOf(name)).length
    // psi_drift inherits ks_drift's shape: one bounds scan + one binning
    // scan; everything after is <=PsiBins rows
    assert(scans("psi_drift") == 2, "psi_drift must scan events exactly twice")
    // autocorr: series + probes re-derive the hourly rollup — exactly two
    // scans TOTAL, never one per lag (one integer join carries all six)
    assert(scans("autocorr") == 2, "autocorr must not scan per lag")
    // bot_gaps: the deltas window hash-partitions by user_id and the
    // moments groupBy must REUSE that partitioning — one hash exchange
    // end to end (the presentation orderBy adds only a range exchange)
    val bg = planOf("bot_gaps")
    assert("Exchange hashpartitioning".r.findAllIn(bg).size == 1,
      "bot_gaps' aggregation stopped reusing the window's user_id shuffle")
    // hard_negatives: per-anchor argmax through the two-phase heap exec,
    // never a full per-anchor window sort
    assert(planOf("hard_negatives").contains("TopKPerKey"),
      "hard_negatives must rank via TopKPerKey")
  }

  test("wave-9 plans: scan counts, broadcast pool re-fetch, heap shortlist") {
    def scans(name: String) =
      "FileScan parquet".r.findAllIn(planOf(name)).length
    // filter_funnel / readability: one corpus scan, per-row arithmetic
    // only — output is 5 rows / per-doc rows with no pre-sort shuffle
    // beyond the aggregate
    assert(scans("filter_funnel") == 1, "filter_funnel must scan once")
    assert(scans("readability") == 1, "readability must scan once")
    // shingle_novelty: posting-heads branch + occurrence branch + the
    // doc-universe left join — three narrow scans, independent of corpus
    // degeneracy (the min() partial agg absorbs hot shingles)
    assert(scans("shingle_novelty") == 3,
      "shingle_novelty's scan count moved — a branch re-derived the corpus")
    // mmr_rerank: the pool's embedding re-fetch must broadcast the
    // ≤ q·pool id set onto the scan (never shuffle the corpus for a
    // 250-row join) and the shortlist itself must rank through the
    // two-phase heap exec, not a per-query window sort
    val mmr = planOf("mmr_rerank")
    assert(mmr.contains("TopKPerKey"), "mmr_rerank must shortlist via TopKPerKey")
    assert(!mmr.contains("SortMergeJoin"),
      "mmr_rerank shuffled the corpus for the pool re-fetch")
    // bitext_margin: the margin readout references the scored candidate
    // chain three times (pairs + both endpoint neighborhoods) — it must
    // hang off the eager checkpoint, never re-derive the LSH chain
    // (the dup_pagerank discipline)
    val bt = planOf("bitext_margin")
    assert("FileScan parquet".r.findAllIn(bt).isEmpty,
      "bitext_margin re-derives the candidate chain from parquet")
    assert(bt.contains("ExistingRDD") || bt.contains("Scan ExistingRDD"),
      "bitext_margin does not read the checkpointed scored frame")
    assert("TopKPerKey".r.findAllIn(bt).size >= 2,
      "bitext_margin must rank neighborhoods AND best-pairs via TopKPerKey")
  }

  test("round-8 plans: scan-side codecs, banded hash joins, fused ranking") {
    def scans(name: String) =
      "FileScan parquet".r.findAllIn(planOf(name)).length
    // the codec queries run their whole encode->decode inside the scan
    // task: exactly ONE corpus scan, nothing binary in any shuffle
    assert(scans("jpeg_decode") == 1, "jpeg_decode must scan the corpus once")
    assert(scans("unigram_encode") == 1,
      "unigram_encode's returned plan must be one scan (training is memoized)")
    // the fingerprint dedups shuffle on the (band, value) keys — the
    // 8-byte code rides the rows; payloads and luma/energy arrays never
    // reach an exchange (their only exchange keys are band/v and the
    // final orderBy)
    for (q <- Seq("phash_neardup", "audio_neardup")) {
      val plan = planOf(q)
      assert(plan.matches("(?s).*Exchange hashpartitioning\\(band#.*"),
        s"$q lost its (band, v) bucket shuffle")
      assert(!plan.matches("(?s).*Exchange [^\\n]*payload#.*"),
        s"$q shuffles the binary payload")
    }
    // rrf_fusion: the three persisted rank legs are read from the block
    // manager (not re-derived per reference) and the top-25 is a heap,
    // not a global sort-all
    val rrf = planOf("rrf_fusion")
    assert(rrf.contains("InMemoryTableScan"),
      "rrf_fusion's rank legs lost their persist — each leg re-derives 3x")
    assert(rrf.contains("TakeOrderedAndProject"),
      "rrf_fusion's top-25 degraded to a global sort")
  }

  test("TPC-H wave plans: pushed disjunction factors, pruned dims, anti shape") {
    // q19: the per-table conjuncts IMPLIED by the cross-table OR must be
    // hoisted onto each scan — brand IN-list + size envelope on part,
    // quantity envelope on lineitem (Catalyst also pushes the per-table
    // OR residual; the factored bounds are what prune row groups)
    val q19 = planOf("q19_disjunct")
    assert(q19.contains("In(p_brand"),
      "q19's brand IN-list no longer reaches the part scan")
    assert(q19.contains("LessThanOrEqual(l_quantity,40.0)"),
      "q19's quantity envelope no longer reaches the lineitem scan")
    // q14: the part side must project exactly (p_partkey, p_type) — a
    // wider ReadSchema means the join ships dead columns at 100 TB
    assert(planOf("q14_promo").contains(
      "ReadSchema: struct<p_partkey:bigint,p_type:string>"),
      "q14's part scan reads more than the join key + p_type")
    // q22: the "gone quiet" test must plan as a LEFT ANTI join (a NOT IN
    // rewrite via nested-loop would be quadratic at scale)
    assert(planOf("q22_idle_customers").contains("LeftAnti"),
      "q22 lost its anti-join shape")
    // q7: both nation roles + the nation-filtered supplier map ride
    // broadcasts; the spine stays an equi-join (no cartesian — global
    // gate covers that)
    assert("BroadcastHashJoin".r.findAllIn(planOf("q7_volume")).size >= 3,
      "q7's dimension roles must ride broadcasts")
    // q20: the part family, the part-level demand table, and the
    // qualifying-supplier set all broadcast (only the two fact aggregates
    // and the final distinct shuffle), and the demand join must stay
    // LEFT OUTER — an inner join silently drops pairs whose part had no
    // season shipments, which are exactly the excess-stock extreme
    val q20 = planOf("q20_excess_parts")
    assert("BroadcastHashJoin".r.findAllIn(q20).size >= 4,
      "q20's dimension/aggregate maps must ride broadcasts")
    assert(q20.contains("LeftOuter"),
      "q20's demand join lost its outer shape — zero-demand pairs dropped")
  }

  test("TPC-H wave 2 plans: semi/outer shapes, broadcast maps, pruned scans") {
    // q4: the windowed EXISTS must plan as a SEMI join — an inner join +
    // distinct would fan out per late line (3000-line hot orders)
    assert(planOf("q4_priority").contains("LeftSemi"),
      "q4's EXISTS lost its semi-join shape")
    // q13: the zero bucket only exists if the LEFT OUTER survives
    // optimization (a pushed filter on the right side must not demote it)
    assert(planOf("q13_custdist").contains("LeftOuter"),
      "q13 lost its outer join — zero-order customers are being dropped")
    // q5: the suppkey→nationkey map and the 25-row name table broadcast
    assert("BroadcastHashJoin".r.findAllIn(planOf("q5_local_volume")).size >= 2,
      "q5's dimension maps must ride broadcasts")
    // q18: the customer-join side reads orders exactly four columns wide
    assert(planOf("q18_big_orders").contains(
      "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
        "o_totalprice:double,o_orderdate:timestamp"),
      "q18's orders scan reads more than the four joined columns")
    // q21: the dual distinct is rewritten as dedup-to-pairs + plain
    // counts — the plan must stay Expand-free (Spark's native dual
    // countDistinct would triple the rows through a 3× Expand) and both
    // aggregates must ride the one orderkey repartition (prefix
    // partitioning satisfies both groupings — no further exchange
    // between the pair dedup and the per-order profile)
    val q21 = planOf("q21_late_solo")
    assert(!q21.contains("Expand"),
      "q21 regressed to the Expand-based dual count-distinct")
    assert(!q21.matches(
      "(?s).*Exchange hashpartitioning\\(l_orderkey[^,]*, l_suppkey.*"),
      "q21's pair dedup added its own exchange — prefix reuse lost")
  }

  test("TPC-H wave 3 plans: pushed scan predicates, broadcast chains, anti") {
    // q6 pushes FOUR scan predicates and the default 100-char metadata
    // render truncates the PushedFilters list mid-entry — raise the limit
    // for this gate so the assertions see the full list
    val mk = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(mk)
    spark.conf.set(mk, "2000")
    try {
    // q6: all three predicates (discount band, quantity cap; the derived
    // date bound is runtime) must reach the lineitem scan
    val q6 = planOf("q6_forecast")
    assert(q6.contains("GreaterThanOrEqual(l_discount,0.02)") &&
      q6.contains("LessThanOrEqual(l_discount,0.06)"),
      "q6's discount band no longer reaches the scan")
    assert(q6.contains("LessThan(l_quantity,24.0)"),
      "q6's quantity cap no longer reaches the scan")
    // q10: the returnflag filter is scan-side and the top-20 is a heap,
    // never a global sort
    val q10 = planOf("q10_returns")
    assert(q10.contains("EqualTo(l_returnflag,R)"),
      "q10's returnflag filter no longer reaches the scan")
    assert(q10.contains("TakeOrderedAndProject"),
      "q10's top-20 regressed to a global sort")
    // q8: market chain (region→nation→customer) + supplier map broadcast
    assert("BroadcastHashJoin".r.findAllIn(planOf("q8_market_share")).size >= 4,
      "q8's dimension chains must ride broadcasts")
    // q9: the supplier→nation map broadcasts; part reads two columns
    val q9 = planOf("q9_profit")
    assert("BroadcastHashJoin".r.findAllIn(q9).size >= 2,
      "q9's supplier→nation map must ride broadcasts")
    assert(q9.contains(
      "ReadSchema: struct<p_partkey:bigint,p_retailprice:double>"),
      "q9's part scan reads more than the join key + retail price")
    // q12: the orders side reads exactly (o_orderkey, o_orderpriority)
    assert(planOf("q12_priority_mix").contains(
      "ReadSchema: struct<o_orderkey:bigint,o_orderpriority:string>"),
      "q12's orders scan reads more than the key + priority")
    // q16: the complaints exclusion must stay a LEFT ANTI join
    assert(planOf("q16_supplier_cnt").contains("LeftAnti"),
      "q16 lost its anti-join exclusion shape")
    // q11: the supplier→nation map broadcasts and the offer filters
    // (positive quantity, non-null price) reach the lineitem scan
    val q11 = planOf("q11_stock_value")
    assert("BroadcastHashJoin".r.findAllIn(q11).size >= 2,
      "q11's dimension maps must ride broadcasts")
    assert(q11.contains("GreaterThan(l_quantity,0.0)") &&
      q11.contains("IsNotNull(l_extendedprice)"),
      "q11's offer filters no longer reach the scan")
    } finally spark.conf.set(mk, saved)
  }

  test("round-9 plans: scan-side web ingest, codegen'd canonicalization, bounded WARC shuffle") {
    def scans(name: String) =
      "FileScan parquet".r.findAllIn(planOf(name)).length
    // the whole URL family is scan-side: one corpus scan each, and the
    // canonicalization runs as the native expression INSIDE WholeStageCodegen
    // (a UDF here would serialize every URL out of the Tungsten row)
    for (q <- Seq("url_normalize", "url_dedup", "url_overlap", "host_rollup")) {
      assert(scans(q) == 1, s"$q must scan the corpus exactly once")
      val p = planOf(q)
      assert(p.toLowerCase.contains("urlcanonicalize"),
        s"$q lost the native UrlCanonicalize expression (a UDF would " +
          "break the codegen span — the expression generates a static call)")
    }
    // html extraction is a pure per-row pipeline over one scan: the only
    // exchange is the final presentation sort
    for (q <- Seq("html_text", "boilerplate_rate", "robots_gate")) {
      assert(scans(q) == 1, s"$q must scan the corpus exactly once")
      val p = planOf(q)
      assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*text#.*"),
        s"$q shuffles raw document text")
    }
    // sitemap groups on the ~20-value host label; charset and the link
    // family stay scan-side single-scan
    for (q <- Seq("sitemap_parse", "charset_sniff", "link_graph",
        "sitemap_discovery")) {
      assert(scans(q) == 1, s"$q must scan the corpus exactly once")
    }
    // the funnel composes TWO legs since round 10: sitemap discovery
    // (doc_id + source only — the scan must stay pruned to those two
    // columns) and the WARC fetch leg (which needs text). Two scans, and
    // the discovery one must never drag text along.
    locally {
      val p = planOf("crawl_funnel")
      assert(scans("crawl_funnel") == 2,
        "crawl_funnel must scan exactly twice (discovery + fetch legs)")
      assert(p.matches("(?s).*ReadSchema: struct<doc_id:bigint,source:string>.*"),
        "crawl_funnel's discovery leg lost its column pruning — it must " +
          "read only doc_id + source, never text")
    }
    // the WARC pair carries the ONE text-moving shuffle (container building
    // needs record co-location) and it must be keyed on the bounded bucket,
    // never on text
    for (q <- Seq("warc_records", "warc_extract")) {
      assert(scans(q) == 1, s"$q must scan the corpus exactly once")
      val p = planOf(q)
      // Catalyst collapses the bucket alias into _groupingexpression
      assert(p.matches("(?s).*Exchange hashpartitioning\\((bucket|_groupingexpression)#.*"),
        s"$q lost its bounded bucket shuffle")
      assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*text#.*"),
        s"$q shuffles on the text column instead of the bucket")
    }
  }

  test("round-10 plans: normalization family is scan-side native-expression codegen") {
    def scans(name: String) =
      "FileScan parquet".r.findAllIn(planOf(name)).length
    // NFC + mojibake ride the scan as native expressions (a UDF would
    // serialize every document out of the Tungsten row); the per-doc forms
    // never exchange text — their only exchange is the presentation sort,
    // and the rate rolls up on the bounded source key
    for (q <- Seq("text_normalize", "mojibake_repair", "mojibake_rate")) {
      assert(scans(q) == 1, s"$q must scan the corpus exactly once")
      val p = planOf(q)
      assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*text#.*"),
        s"$q shuffles raw document text")
    }
    assert(planOf("text_normalize").toLowerCase.contains("nfcnormalize"),
      "text_normalize lost the native NfcNormalize expression")
    val mr = planOf("mojibake_repair").toLowerCase
    assert(mr.contains("mojibakegarble") && mr.contains("mojibakerepair"),
      "mojibake_repair lost its native garble/repair expressions")
    // head metadata extraction: one scan, per-row mapPartitions, no raw-text
    // exchange (same contract as html_text)
    assert(scans("html_meta") == 1, "html_meta must scan the corpus exactly once")
    assert(!planOf("html_meta").matches("(?s).*Exchange hashpartitioning[^\\n]*text#.*"),
      "html_meta shuffles raw document text")
    // the chat family: render → strict JSON parse → validate never leaves
    // the task — one scan, no text exchange, lint rolls up on source
    for (q <- Seq("chat_stats", "chat_lint", "prompt_dedup")) {
      assert(scans(q) == 1, s"$q must scan the corpus exactly once")
      assert(!planOf(q).matches("(?s).*Exchange hashpartitioning[^\\n]*text#.*"),
        s"$q shuffles raw document text")
    }
    // chat_pack rides Curation.cumsumByLang — the SAME branch profile as
    // pack_sequences (the machinery reads its base once per cumsum
    // branch); pinning the two equal keeps a future branch explosion in
    // either from hiding behind the other
    assert(scans("chat_pack") == scans("pack_sequences"),
      "chat_pack must match pack_sequences' scan profile (shared cumsum)")
    assert(!planOf("chat_pack").matches("(?s).*Exchange hashpartitioning[^\\n]*(text|toks)#.*"),
      "chat_pack shuffles raw token arrays")
    // the frontier pair: budget rolls up on the host label (one scan);
    // priority joins the doc spine to the BOUNDED in-degree aggregate —
    // the aggregate side must ride a broadcast (never a sort-merge: the
    // target space is ~900 values at any corpus size) and the spine scan
    // must stay pruned to doc_id alone
    for (q <- Seq("crawl_budget", "recrawl_delta")) {
      assert(scans(q) == 1, s"$q must scan the corpus exactly once")
    }
    // the flagship composition: WARC walk + the n_pages count scan (pruned
    // to doc_id). Its dedup exchange is keyed on the canonical URI and
    // carries only the ~50-byte per-record feature struct — neither text
    // nor the extracted content may ever key an exchange.
    locally {
      val p = planOf("web_pipeline")
      assert(scans("web_pipeline") == 2,
        "web_pipeline must scan exactly twice (WARC leg + n_pages count)")
      assert(p.matches("(?s).*Exchange hashpartitioning\\((uri|bucket|_groupingexpression)#.*"),
        "web_pipeline lost its uri-keyed dedup / bucket shuffle shape")
      assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|ct)#.*"),
        "web_pipeline keys an exchange on document text")
    }
    locally {
      val p = planOf("crawl_priority")
      assert(scans("crawl_priority") == 2,
        "crawl_priority must scan exactly twice (edge leg + doc spine)")
      assert(p.contains("BroadcastHashJoin"),
        "crawl_priority's in-degree join lost its broadcast")
      assert(p.matches("(?s).*ReadSchema: struct<doc_id:bigint>.*"),
        "crawl_priority's doc spine lost its pruning to doc_id alone")
      assert(p.contains("TakeOrderedAndProject"),
        "crawl_priority's frontier head must be a top-k, not a full sort")
    }
  }

  test("round-11 plans: video checkpoint, chat minhash parity, eval broadcast") {
    // the clip-code frame is referenced three times (band explosion + both
    // join-backs) — it must read the eager localCheckpoint, never re-decode
    // the corpus (the bitext_margin discipline)
    val p = planOf("video_neardup")
    assert("FileScan parquet".r.findAllIn(p).isEmpty,
      "video_neardup re-decodes the corpus from parquet")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "video_neardup does not read the checkpointed clip-code frame")
    assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*text#.*"),
      "video_neardup keys an exchange on document text")
    // the chat-stage fuzzy dedup + decontamination: prompt_minhash rides
    // the SAME minhash machinery as minhash_pairs, so its scan count must
    // match exactly (the self-join / verify-join branches share their
    // exchanges at runtime — the adjudicated minhash_pairs posture);
    // chat_decontaminate scans twice (eval slice + chat leg) and its eval
    // gram set must BROADCAST — a sort-merge join against the tiny eval
    // side would shuffle the full chat gram explosion
    def scans11(name: String) =
      "FileScan parquet".r.findAllIn(planOf(name)).length
    assert(scans11("prompt_minhash") == scans11("minhash_pairs"),
      "prompt_minhash diverged from the shared minhash_pairs plan shape")
    locally {
      val p = planOf("chat_decontaminate")
      assert(scans11("chat_decontaminate") == 2,
        "chat_decontaminate must scan exactly twice (eval + chat legs)")
      assert(p.contains("BroadcastHashJoin"),
        "chat_decontaminate's eval gram set lost its broadcast")
    }
    // the DPO stage: render → strict parse → validate never leaves the
    // task — one scan, lint rolls up on source, no text exchange (the
    // chat_stats contract). fim_transform is pure scan-side column
    // arithmetic under the same contract.
    for (q <- Seq("dpo_stats", "dpo_lint", "fim_transform", "table_extract",
        "jsonld_extract")) {
      assert(scans11(q) == 1, s"$q must scan the corpus exactly once")
      assert(!planOf(q).matches("(?s).*Exchange hashpartitioning[^\\n]*(text|toks)#.*"),
        s"$q shuffles raw document text")
    }
  }

  test("round-12 plans: semdedup_trained keys every pair join on the trained cell") {
    val p = planOf("semdedup_trained")
    // cross-cell pairs are the SemDeDup blowup: the band join must be an
    // EQUI join carrying c_id (plus the rank), never a theta/cartesian
    // that would post-filter a per-cell cross product
    assert(!p.contains("CartesianProduct"),
      "semdedup_trained plans a cartesian — the band join lost its equi key")
    assert(p.matches(
      "(?s).*(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\\n]*c_id#.*"),
      "semdedup_trained's band join is not keyed on the trained cell id")
    // only id-keyed exchanges: the candidate frame carries (c_id, rank,
    // vec_id) and vectors join back BY ID — no exchange may key on the
    // embedding array itself
    assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*embedding#.*"),
      "semdedup_trained keys an exchange on the embedding array")
    // jpeg_phash: the fingerprint is computed INSIDE the scan-side decode
    // task (phash_neardup's contract) — no pixel payload or text may key
    // an exchange; only the 8-byte code rides the banded join
    val jp = planOf("jpeg_phash")
    assert(!jp.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|payload)#.*"),
      "jpeg_phash shuffles payload bytes")
  }

  test("round-13 plans: semantic_keep_list broadcasts the eval slice on the cell key") {
    val p = planOf("semantic_keep_list")
    // cross-cell pairs structurally impossible: the eval x train pairing
    // is a BROADCAST equi-join carrying c_id — never a cartesian or a
    // shuffled join (the eval slice is bounded by EvalMaxDocId, so a
    // shuffle on its account is pure waste)
    assert(!p.contains("CartesianProduct"),
      "semantic_keep_list plans a cartesian — the cell join lost its equi key")
    assert(p.matches("(?s).*BroadcastHashJoin[^\\n]*c_id#.*"),
      "semantic_keep_list eval join is not a broadcast on the trained cell id")
    // the verdict agg's exchange keys on vec_id — never the embedding
    assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*embedding#.*"),
      "semantic_keep_list keys an exchange on the embedding array")
    // png_phash / gif_phash: the fingerprint is computed INSIDE the
    // scan-side decode task — no pixel payload or text may key an exchange
    for (name <- Seq("png_phash", "gif_phash")) {
      val pp = planOf(name)
      assert(!pp.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|payload)#.*"),
        s"$name shuffles payload bytes")
    }
  }
}
