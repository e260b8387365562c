package graft

import org.apache.spark.sql.functions._

/** AQE interplay gates (round-6 verdict item 6).
  *
  * PlanSpec asserts the INITIAL physical plans (what toString shows before
  * execution drives AdaptiveSparkPlan to a final plan). At cluster scale
  * AQE re-plans at runtime — coalescing partitions, switching join
  * strategies, splitting skewed partitions — so the scale disciplines must
  * also hold on the FINAL adaptive plans, which is what these tests
  * execute-then-assert. Documented deltas vs the initial-plan gates: AQE
  * may upgrade a shuffled join to broadcast (fine — gates assert required
  * properties, never "exactly this join"), and exchanges may reuse, so
  * scan/exchange COUNTS are not re-asserted here.
  */
class AqePlanSpec extends SparkSuite {

  private def finalPlan(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, sf).queryExecution
    // execute THIS QueryExecution's plan: count() would wrap the dataset
    // in a new aggregate QueryExecution and leave this one un-finalized
    qe.toRdd.count()
    qe.executedPlan.toString
  }

  test("AQE is on in this session — the gates below see adaptive finals") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "Spark 4 defaults AQE on; the suite must not have disabled it")
    assert(finalPlan("groupby_count").contains("isFinalPlan=true"),
      "executing the query must finalize the adaptive plan")
  }

  test("broadcast gates hold on final adaptive plans") {
    for (name <- Seq("region_rollup", "decontaminate", "zscore_outliers",
        "revenue_by_nation", "dsir_weights"))
      assert(finalPlan(name).contains("BroadcastHashJoin"),
        s"$name lost its broadcast in the FINAL adaptive plan")
  }

  test("no cartesian products appear in final adaptive plans") {
    for (name <- Seq("gap_fill", "pq_topk", "mad_outliers", "fuzzy_join",
        "kmeans_refine", "salted_join"))
      assert(!finalPlan(name).contains("CartesianProduct"),
        s"$name gained a CartesianProduct after adaptive re-planning")
  }

  test("top-k, pushdown, and partial-agg gates survive adaptive re-planning") {
    assert(finalPlan("latest_events").contains("TakeOrderedAndProject"))
    val fe = finalPlan("filter_eq")
    assert(fe.contains("PushedFilters: [") &&
      !fe.matches("(?s).*PushedFilters: \\[\\].*"),
      "filter_eq scan pushdown must be unaffected by AQE")
    assert("HashAggregate".r.findAllIn(finalPlan("groupby_count")).size >= 2,
      "groupby_count lost map-side partial aggregation under AQE")
    // round-7 additions: the variant decode stays below the partial agg
    // (no raw JSON on the exchange) and k_anonymity keeps its two-phase
    // distinct expansion through adaptive re-planning
    val vs = finalPlan("variant_stats")
    assert("HashAggregate".r.findAllIn(vs).size >= 2,
      "variant_stats lost map-side partial aggregation under AQE")
    assert(!vs.matches("(?s).*Exchange hashpartitioning\\([^)]*props.*"),
      "variant_stats shuffles raw JSON under AQE")
    assert("HashAggregate".r.findAllIn(finalPlan("k_anonymity")).size >= 2,
      "k_anonymity lost its distinct-aggregate expansion under AQE")
  }

  test("AQE skew-join splits the hot partition and agrees with saltedEquiJoin") {
    import spark.implicits._
    // Skewed fixture: one key carries 60k of ~100k rows. With broadcast
    // disabled (the 100 TB big-big case) the join sort-merges and the hot
    // key lands one oversized partition — exactly what AQE's skew split
    // and our salting both exist to fix. Assert (a) AQE actually marks
    // the join skew=true under forced settings, (b) plain-AQE, salted,
    // and groupBy-count results all agree — the two mitigations are
    // interchangeable on semantics, which is what lets a pipeline choose
    // per join at deploy time (SURVEY: salting covers the cases AQE
    // cannot — broadcast-ineligible hot keys in left-preserving joins).
    val left = spark.range(100000).select(
      when(col("id") < 60000, lit("hot")).otherwise(concat(lit("k"), col("id") % 200))
        .as("key"),
      col("id").as("payload"))
    val right = (Seq("hot") ++ (0L until 200L).map("k" + _))
      .toDF("key").withColumn("tag", length(col("key")))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plain = left.join(right, Seq("key"))
      val qe = plain.queryExecution
      val n = qe.toRdd.count() // finalize THIS plan (see finalPlan above)
      assert(n == 100000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${plan.take(2000)}")
      // salting: same join, planner-independent mitigation, same result
      val salted = operators.Salting.saltedEquiJoin(
        left, right, "key", saltBy = col("payload"), factor = 8)
      assert(salted.count() == n)
      val a = plain.groupBy("key").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val b = salted.groupBy("key").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(a == b, "salted and AQE-skew joins diverge per key")
      assert(a("hot") == 60000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("wave-4/5 gates hold on final adaptive plans") {
    // bq_topk: the rerank must stay shuffle-free through adaptive
    // re-planning (AQE may only upgrade joins toward broadcast here)
    val bq = finalPlan("bq_topk")
    assert(bq.contains("TopKPerKey"),
      "bq_topk lost its heap top-k in the final adaptive plan")
    assert(!bq.contains("SortMergeJoin"),
      "bq_topk's rerank gained a corpus shuffle under AQE")
    // dup_spans: partial agg on the dup-gram decision survives
    val ds = finalPlan("dup_spans")
    assert("HashAggregate".r.findAllIn(ds).size >= 2,
      "dup_spans lost map-side partial aggregation under AQE")
    for (name <- Seq("bigram_pmi", "asof_nearest", "chunk_lang_mix"))
      assert(!finalPlan(name).contains("CartesianProduct"),
        s"$name gained a CartesianProduct after adaptive re-planning")
  }

  test("wave-8 gates hold on final adaptive plans") {
    // hard_negatives: the per-anchor argmax stays a heap exec and the
    // candidate chain never degenerates to a cartesian under re-planning
    val hn = finalPlan("hard_negatives")
    assert(hn.contains("TopKPerKey"),
      "hard_negatives lost its heap top-k in the final adaptive plan")
    assert(!hn.contains("CartesianProduct"))
    // bot_gaps / psi_drift / token_entropy / rare_token_rate: map-side
    // partials survive adaptive re-planning
    for (name <- Seq("bot_gaps", "psi_drift", "token_entropy",
        "rare_token_rate", "autocorr"))
      assert("HashAggregate".r.findAllIn(finalPlan(name)).size >= 2,
        s"$name lost map-side partial aggregation under AQE")
    for (name <- Seq("minhash_est_error", "ann_probe_curve", "autocorr"))
      assert(!finalPlan(name).contains("CartesianProduct"),
        s"$name gained a CartesianProduct after adaptive re-planning")
  }

  test("wave-9 gates hold on final adaptive plans") {
    // mmr_rerank: the pool re-fetch stays broadcast and the shortlist
    // stays a heap exec through adaptive re-planning
    val mmr = finalPlan("mmr_rerank")
    assert(mmr.contains("TopKPerKey"),
      "mmr_rerank lost its heap shortlist in the final adaptive plan")
    assert(!mmr.contains("SortMergeJoin") && !mmr.contains("CartesianProduct"),
      "mmr_rerank's pool re-fetch gained a corpus shuffle under AQE")
    // funnel / novelty rollups: map-side partials survive re-planning
    for (name <- Seq("filter_funnel", "shingle_novelty"))
      assert("HashAggregate".r.findAllIn(finalPlan(name)).size >= 2,
        s"$name lost map-side partial aggregation under AQE")
    // min_cost_supplier: the dim chain and part re-attach stay broadcast
    // (no corpus-sized shuffle join) and the argmin stays a heap exec
    val mcs = finalPlan("min_cost_supplier")
    assert(mcs.contains("TopKPerKey"),
      "min_cost_supplier lost its heap argmin in the final adaptive plan")
    assert(!mcs.contains("SortMergeJoin") && !mcs.contains("CartesianProduct"),
      "min_cost_supplier's dim joins gained a shuffle under AQE")
    // bitext_margin / kcenter_sample: actionful builders — their returned
    // plans must stay cartesian-free through adaptive re-planning
    for (name <- Seq("bitext_margin", "kcenter_sample"))
      assert(!finalPlan(name).contains("CartesianProduct"),
        s"$name gained a CartesianProduct after adaptive re-planning")
  }

  test("TPC-H wave gates hold on final adaptive plans") {
    // the semi/anti/outer shapes are semantic — AQE may switch their
    // physical strategy (broadcast vs shuffled) but never the join type
    assert(finalPlan("q4_priority").contains("LeftSemi"),
      "q4's EXISTS semi join degraded in the final adaptive plan")
    assert(finalPlan("q13_custdist").contains("LeftOuter"),
      "q13's outer join degraded in the final adaptive plan")
    assert(finalPlan("q22_idle_customers").contains("LeftAnti"),
      "q22's anti join degraded in the final adaptive plan")
    for (name <- Seq("q7_volume", "q5_local_volume", "q14_promo",
        "q15_top_supplier", "q19_disjunct", "q17_small_qty",
        "q18_big_orders", "q21_late_solo", "q6_forecast", "q8_market_share",
        "q9_profit", "q12_priority_mix", "q11_stock_value",
        "q20_excess_parts",
        // round-8 joins: the banded fingerprint self-joins and the fused
        // ranker's spine joins must not degrade to cartesians when AQE
        // re-plans their small-side broadcasts
        "phash_neardup", "audio_neardup", "rrf_fusion"))
      assert(!finalPlan(name).contains("CartesianProduct"),
        s"$name gained a CartesianProduct after adaptive re-planning")
    assert(finalPlan("q16_supplier_cnt").contains("LeftAnti"),
      "q16's anti-join exclusion degraded in the final adaptive plan")
    assert(finalPlan("q20_excess_parts").contains("LeftOuter"),
      "q20's demand outer join degraded in the final adaptive plan")
    assert(finalPlan("q10_returns").contains("TakeOrderedAndProject"),
      "q10's heap top-20 degraded in the final adaptive plan")
  }

  test("round-10/11 gates hold on final adaptive plans") {
    // crawl_priority: the in-degree join must stay broadcast (the target
    // space is ~900 values at any corpus size) and the frontier head a
    // heap top-k through adaptive re-planning
    val cp = finalPlan("crawl_priority")
    assert(cp.contains("BroadcastHashJoin"),
      "crawl_priority's in-degree join lost its broadcast in the final plan")
    assert(cp.contains("TakeOrderedAndProject"),
      "crawl_priority's frontier head degraded to a full sort under AQE")
    // web_pipeline: the dedup exchange stays keyed on the canonical uri /
    // warc bucket — never on text or the extracted content
    val wp = finalPlan("web_pipeline")
    assert(wp.matches(
      "(?s).*Exchange hashpartitioning\\((uri|bucket|_groupingexpression)#.*"),
      "web_pipeline lost its uri/bucket-keyed exchange in the final plan")
    assert(!wp.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|ct)#.*"),
      "web_pipeline keys an exchange on document text under AQE")
    // chat_pack: the bucketed cumsum's offsets stay broadcast and raw
    // token arrays never key an exchange through re-planning
    val cpk = finalPlan("chat_pack")
    assert(cpk.contains("BroadcastHashJoin"),
      "chat_pack's cumsum offsets join lost its broadcast in the final plan")
    assert(!cpk.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|toks)#.*"),
      "chat_pack shuffles raw token arrays under AQE")
    // round-11 chat stage: eval-gram broadcast survives; the banded
    // minhash and DPO plans stay cartesian-free; video_neardup's vote
    // joins must not degrade
    assert(finalPlan("chat_decontaminate").contains("BroadcastHashJoin"),
      "chat_decontaminate's eval gram set lost its broadcast in the final plan")
    for (name <- Seq("prompt_minhash", "dpo_stats", "dpo_lint",
        "video_neardup", "sitemap_parse", "sitemap_discovery", "recrawl_delta"))
      assert(!finalPlan(name).contains("CartesianProduct"),
        s"$name gained a CartesianProduct after adaptive re-planning")
  }

  test("round-12 gates hold on final adaptive plans") {
    // semdedup_trained: the band join stays keyed on the trained cell id
    // through re-planning (cross-cell pairs structurally impossible), no
    // exchange keys on the embedding array, no cartesian
    val sd = finalPlan("semdedup_trained")
    assert(sd.matches("(?s).*Exchange hashpartitioning\\(c_id#.*") ||
      sd.matches("(?s).*Exchange hashpartitioning\\([^\\n]*c_id#.*"),
      "semdedup_trained's band join lost its cell-keyed exchange")
    assert(!sd.matches("(?s).*Exchange hashpartitioning[^\\n]*embedding#.*"),
      "semdedup_trained keys an exchange on the embedding array under AQE")
    assert(!sd.contains("CartesianProduct"),
      "semdedup_trained gained a cartesian after adaptive re-planning")
    // decontaminate_spans: the eval gram digests must stay BROADCAST — a
    // sort-merge fallback would shuffle the full train gram explosion
    assert(finalPlan("decontaminate_spans").contains("BroadcastHashJoin"),
      "decontaminate_spans' eval gram set lost its broadcast in the final plan")
    // export_manifest: every exchange keys on the shard (lkey/shard_id) or
    // pack-frame columns — raw token arrays never ride a shuffle
    val em = finalPlan("export_manifest")
    assert(!em.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|toks)#.*"),
      "export_manifest shuffles raw token arrays under AQE")
    // corpus_export_manifest (the pretraining lane): same contract — the
    // doc-level exchange carries ids and counts, never text/token arrays.
    // The cumsum build's broadcast joins (bounds scalar + tiny offsets)
    // are expected; a SHUFFLED join would mean the null-safe two-level
    // groupBy regressed to an equi-join on the nullable shard key
    val cem = finalPlan("corpus_export_manifest")
    assert(!cem.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|toks)#.*"),
      "corpus_export_manifest shuffles raw token arrays under AQE")
    assert(!cem.contains("SortMergeJoin") && !cem.contains("ShuffledHashJoin"),
      "corpus_export_manifest regressed from the null-safe groupBy to a shuffled join")
    // semantic_keep_list: the bounded eval slice must stay BROADCAST
    // on the cell key under adaptive re-planning, and no exchange may
    // pick up the embedding array
    val sdc = finalPlan("semantic_keep_list")
    assert(sdc.contains("BroadcastHashJoin") && !sdc.contains("CartesianProduct"),
      "semantic_keep_list eval cell join lost its broadcast under AQE")
    assert(!sdc.matches("(?s).*Exchange hashpartitioning[^\\n]*embedding#.*"),
      "semantic_keep_list keys an exchange on the embedding array under AQE")
    // the new scan-side fingerprint queries stay cartesian-free and never
    // key an exchange on payload bytes or text
    for (name <- Seq("jpeg_phash", "png_phash", "gif_phash", "gif_decode",
        "pdf_extract", "strip_eval_spans", "leak_mass_by_source")) {
      val p = finalPlan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name gained a CartesianProduct after adaptive re-planning")
      assert(!p.matches("(?s).*Exchange hashpartitioning[^\\n]*(text|payload)#.*"),
        s"$name keys an exchange on document payloads under AQE")
    }
  }
}
