package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, Tables}

/** Corpus-curation operators: the selection / packing / hygiene passes a
  * training-data pipeline runs between raw ingestion and tokenization.
  * The reference has none of these (its values are IoT doubles); they
  * extend the engine per the north star, alongside the dedup / similarity
  * / text-analysis families.
  *
  * Scale discipline shared by all four:
  *  - benchmark (eval-set) data is the SMALL side and rides a broadcast;
  *    the corpus is touched in one scan with partial aggregation;
  *  - sampling decisions are pure per-row arithmetic on an engine-neutral
  *    content hash — no RNG state, no driver coordination, reproducible
  *    across engines (which is also what makes them oracle-checkable);
  *  - running totals never sort a data-sized frame in one task: the
  *    per-language cumsums ride [[tokenCumsum]]'s two-phase bucket +
  *    broadcast-offset build, because language is a low-cardinality
  *    stratum and a plain per-language window would serialize each
  *    language through a single partition at 100 TB.
  */
object Curation {

  /** Docs below this id act as the held-out eval benchmark (stand-in for
    * a real benchmark suite); present at every scale factor. Shared with
    * TextAnalysis.winnow_decontaminate so BOTH decontamination operators
    * always agree on which documents are eval vs train. */
  private[graft] val EvalMaxDocId = 25

  /** Per-source (n_docs, n_tokens, weight ∝ sqrt(tokens), normalized via
    * exact integer half-up) — shared by domain_mix_weights and the
    * mixture_sample apply step. */
  private def mixWeights(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val stats = Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
      // integral-valued double → decimal cast is exact in both engines
      .withColumn("num",
        expr("CAST(round(sqrt(n_tokens) * 1000000) AS DECIMAL(38,0))"))
    val tot = stats.agg(sum(col("num")).as("tot"))
    stats.crossJoin(broadcast(tot))
      .withColumn("weight",
        expr("CAST((2 * num * 1000000 + tot) div (2 * tot) AS DOUBLE) / 1000000.0"))
      .select("source", "n_docs", "n_tokens", "weight")
  }

  /** SQL CTE chain ending in relation `w2(source, n_docs, n_tokens,
    * weight)` mirroring [[mixWeights]]. */
  private val sqlMixWeights = """
        s AS (SELECT source, count(*) AS n_docs,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1),
        w AS (SELECT *, CAST(round(sqrt(n_tokens) * 1000000) AS HUGEINT) AS num FROM s),
        t AS (SELECT sum(num) AS tot FROM w),
        w2 AS (SELECT source, n_docs, n_tokens,
                      CAST((2 * num * 1000000 + tot) // (2 * tot) AS DOUBLE) / 1000000.0
                        AS weight
               FROM w, t)"""

  /** A train doc is flagged when ≥10% of its trigrams appear in the eval
    * set — the standard n-gram-overlap decontamination rule. */
  private[operators] val ContaminationThreshold = 0.1

  /** Token budget per training shard. */
  private val ShardTokenBudget = 2000

  /** epoch_schedule: max repeats of any one source (the repeated-data
    * degradation knee — beyond ~4 epochs, repeated tokens stop helping). */
  private val MaxEpochs = 4

  /** Doc-id range buckets for the two-phase cumsum below. */
  private val CumsumBuckets = 32

  /** `(doc_id, lang, n_tokens, cum)` — the per-language running token
    * total ordered by doc_id, built WITHOUT a per-language window sort.
    * `lang` has a handful of values, so `Window.partitionBy("lang")`
    * would funnel each language's entire corpus through one task at
    * 100 TB. Instead, the two-phase bucket + broadcast-offset pattern
    * proven in global_row_number (PipelineOps.scala): bin rows by a
    * data-derived doc_id range bucket (pure integer arithmetic against
    * broadcast global bounds, so every plan branch agrees), cumsum
    * WITHIN each (lang, bucket) — #langs × [[CumsumBuckets]] parallel
    * window partitions — then add each bucket's per-language prefix
    * offset from a #langs×#buckets-row frame whose own cumsum is
    * trivially cheap and which broadcasts back onto the data. Buckets
    * bin doc_id monotonically, so bucket-local cumsum + offset equals
    * the per-language global cumsum the (unchanged) oracles compute
    * with a single window. */
  private def tokenCumsum(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // lang rides twice: verbatim for the output, [[langKey]]-mapped as the
    // partition/join key — the offsets join is an equi-join, and a NULL
    // lang would drop its rows where the oracle's window PARTITION BY
    // keeps them as one group (hostile-corpus sweep finding)
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), langKey.as("lkey"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
    cumsumByLang(base)
      .select("doc_id", "lang", "n_tokens", "cum")
  }

  /** The packed per-doc frame corpus_export_manifest and the shard writer
    * consume — ChatData.packedChats' pretraining twin: every document
    * with its token count, provenance, and [[ShardTokenBudget]]-packed
    * shard assignment `(doc_id, lang, lkey, source, n_tokens, cum,
    * shard_id)`. Same cumsum build as [[tokenCumsum]] (pack_sequences),
    * so the sequences, the manifest, and the written shards can never
    * disagree about what landed where. A NULL-text doc carries NULL
    * n_tokens/cum/shard_id — consumers must group (never equi-join) on
    * shard_id. */
  private[graft] def packedDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), langKey.as("lkey"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
    cumsumByLang(base)
      .withColumn("shard_id", expr(s"(cum - n_tokens) DIV $ShardTokenBudget"))
  }

  /** The bucketed per-language running-token-sum, generalized over any
    * (doc_id, lang, lkey, n_tokens, …) frame — extra columns ride through
    * untouched. Shared by [[tokenCumsum]] (pack_sequences/shard_packing)
    * and ChatData's chat_pack, so the scale-safe cumsum shape exists
    * exactly once. */
  /** Collision-free cumsum partition key for a nullable lang. The oracles'
    * window `PARTITION BY lang` keeps NULL as its OWN partition, distinct
    * from the empty string — but the offsets join below is an equi-join
    * and needs a non-null key. coalesce(lang, '') (the pre-round-11 key)
    * merged NULL-lang and ''-lang rows into one cumsum partition, shifting
    * shard boundaries on any corpus carrying both. NULL maps to "\u0000"
    * and every non-null value is "L"-prefixed ('' → "L"), so no two lang
    * values can ever share a key. */
  private[graft] def langKey: Column =
    when(col("lang").isNull, lit("\u0000"))
      .otherwise(concat(lit("L"), col("lang")))

  private[graft] def cumsumByLang(
      base: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bounds = base.agg(min("doc_id").as("dmin"), max("doc_id").as("dmax"))
    val bucketed = base.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        PipelineOps.rangeBucket("doc_id", "dmin", "dmax", CumsumBuckets))
      .drop("dmin", "dmax")
    val wLocal = Window.partitionBy("lkey", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy("lkey", "bkt")
      .agg(sum("n_tokens").as("btok"))
      .withColumn("off", coalesce(
        sum("btok").over(Window.partitionBy("lkey").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("lkey", "bkt", "off")
    bucketed
      .withColumn("lcum", sum("n_tokens").over(wLocal))
      .join(broadcast(offsets), Seq("lkey", "bkt"))
      .withColumn("cum", col("off") + col("lcum"))
      .drop("off", "lcum", "bkt")
  }

  /** Engine-neutral content hash (same polynomial fold as
    * doc_fingerprint): per-token code from first/last char + length,
    * folded mod 1e9+7. Deterministic, positive, uniform enough for
    * percent-bucket sampling. */
  // text coalesced to '' FIRST: on a null-text row Spark's aggregate(NULL)
  // is NULL while DuckDB's list_prepend(0, NULL) is [0] — the hash would
  // be NULL vs 0 and every bucket filter downstream would disagree
  // (full-hostile-corpus sweep finding). With '', both engines hash the
  // single empty token to 0.
  private def contentHash = expr(
    """aggregate(
         transform(split(coalesce(text, ''), ' '),
                   t -> CAST(ascii(substring(t, 1, 1)) * 131
                             + ascii(substring(t, -1, 1))
                             + length(t) AS BIGINT)),
         CAST(0 AS BIGINT), (acc, x) -> (acc * 1000003 + x) % 1000000007)""")

  private val sqlContentHash = """
      list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(coalesce(text, ''), ' '),
            t -> CAST(ascii(substring(t, 1, 1)) * 131
                      + ascii(substring(t, -1, 1))
                      + length(t) AS BIGINT))),
        (acc, x) -> (acc * 1000003 + x) % 1000000007)"""

  /** Per-chunk CDC spans — (doc_id, chunk_id, toks, starts, bend) from
    * one kernel pass; the shared front half of cdc_chunks and cdc_dedup,
    * so the two queries cannot disagree on boundaries. */
  private def cdcChunkSpans(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // coalesce(text, ''): a null-text doc must chunk like the empty doc
    // (one empty-token chunk) in BOTH engines — Spark's null-propagating
    // kernel dropped it while the oracle emitted a null-bend chunk
    // (hostile-corpus sweep finding)
    Tables.documents(s, dir)
      .withColumn("toks", split(coalesce(col("text"), lit("")), " "))
      .withColumn("bounds",
        graft.functions.VectorExpressions.cdcBounds(
          coalesce(col("text"), lit("")), CdcWindow, CdcDivisor))
      .withColumn("starts", expr("concat(array(0), slice(bounds, 1, size(bounds) - 1))"))
      .select(col("doc_id"), col("toks"), col("starts"),
        posexplode(col("bounds")).as(Seq("chunk_id", "bend")))

  /** Shared DuckDB CTE chain ending in relation `x(doc_id, toks, starts,
    * j, bend)` — ONE copy of the token-code/rolling-hash formula for both
    * CDC oracles. */
  private def sqlCdcCtes: String = s"""
        t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') toks
              FROM documents),
        c AS (SELECT doc_id, toks, len(toks) n,
                list_transform(toks, t -> CAST(ascii(substring(t, 1, 1)) * 131
                                               + ascii(substring(t, -1, 1))
                                               + length(t) AS BIGINT)) codes
              FROM t),
        b AS (SELECT doc_id, toks,
                list_append(
                  CASE WHEN n > $CdcWindow THEN
                    list_filter(range($CdcWindow, n),
                      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                             list_slice(codes, i - $CdcWindow + 1, i)),
                             (acc, x) -> (acc * 1000003 + x) % 1000000007)
                           % $CdcDivisor = 0)
                  ELSE [] END,
                  n) bounds
              FROM c),
        s AS (SELECT doc_id, toks, bounds,
                list_prepend(0, list_slice(bounds, 1, len(bounds) - 1)) starts
              FROM b),
        x AS (SELECT doc_id, toks, starts,
                generate_subscripts(bounds, 1) AS j, unnest(bounds) AS bend
              FROM s)"""

  /** Shared DuckDB trigram CTE (same shape as the Dedup oracles). */
  private val sqlShingles = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
        sh AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 3 THEN
                   list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END grams
               FROM t)"""

  /** Per-train-doc contamination against the eval trigram set —
    * (doc_id, n_grams, contaminated_grams, contamination, flagged).
    * The eval filter pushes below the shingle projection to the scan, so
    * that branch shingles only the (tiny) eval slice; the train side
    * shingles ONCE — gram count rides each exploded row (explode_outer
    * keeps gram-less docs), the broadcast left join marks eval hits, and
    * a single agg yields both n_grams and the hit count (the separate
    * sizes-frame formulation re-shingled the whole train corpus a second
    * time — the pitfall exactJaccardPairs documents). Shared by the
    * decontaminate query and the end-to-end cleaning pass. */
  private def contaminationFlags(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val sh = Dedup.shingled(Tables.documents(s, dir))
    val evalGrams = sh.filter(col("doc_id") < EvalMaxDocId)
      .select(explode(col("grams")).as("gram")).distinct()
    val trainEx = sh.filter(col("doc_id") >= EvalMaxDocId)
      .select(col("doc_id"), size(col("grams")).cast(LongType).as("n"),
        explode_outer(col("grams")).as("gram"))
    trainEx
      .join(broadcast(evalGrams.withColumn("_hit", lit(1))), Seq("gram"), "left")
      // grams arrays are distinct per doc, so count(_hit) == distinct hits
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_grams"),
        count(col("_hit")).as("contaminated_grams"))
      .withColumn("contamination", when(col("n_grams") > 0,
        round(col("contaminated_grams").cast(DoubleType) / col("n_grams"), 4))
        .otherwise(0.0))
      .withColumn("flagged", col("contamination") >= ContaminationThreshold)
  }

  /** Leaked eval spans per TRAIN doc — every [[Dedup.DupSpanK]]-token
    * gram of a train doc that appears verbatim in the eval slice marks
    * its start; marked starts merge into maximal spans
    * ([[Dedup.mergeSpans]]). Eval grams broadcast as xxhash64 longs
    * (8 bytes each — the gramStarts digest). Shared
    * by decontaminate_spans (report), strip_eval_spans (apply) and
    * leak_mass_by_source (rollup). */
  private def evalLeakSpans(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir)
    val evalG = Dedup.gramStarts(
        docs.filter(col("doc_id") < EvalMaxDocId), Dedup.DupSpanK)
      .select("g").distinct()
    val marked = Dedup.gramStarts(
        docs.filter(col("doc_id") >= EvalMaxDocId), Dedup.DupSpanK)
      .join(broadcast(evalG), "g")
      .select("doc_id", "start")
    Dedup.mergeSpans(marked, Dedup.DupSpanK)
  }

  /** Oracle chain mirroring [[evalLeakSpans]]: the shared gram scan, the
    * eval-membership mark, the shared run-merge tail — ends in `d` and
    * `spans`, exactly like Dedup's sqlDupSpans but with eval membership
    * in place of corpus multiplicity. */
  private def sqlEvalSpanCtes: String = s"""
        ${Dedup.sqlGramScan},
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < $EvalMaxDocId),
        m AS (SELECT doc_id, start FROM g JOIN ev USING (gram)
              WHERE doc_id >= $EvalMaxDocId),
        ${Dedup.sqlSpanTail}"""

  /** DuckDB CTE chain mirroring [[contaminationFlags]] (appended after
    * [[sqlShingles]]): ev/tg/hits plus a final `fl` relation with the
    * per-train-doc flag. */
  private def sqlContaminationCtes: String = s"""
        ev AS (SELECT DISTINCT unnest(grams) gram FROM sh WHERE doc_id < $EvalMaxDocId),
        tg AS (SELECT doc_id, unnest(grams) gram FROM sh WHERE doc_id >= $EvalMaxDocId),
        hits AS (SELECT tg.doc_id, count(*) c FROM tg JOIN ev USING (gram) GROUP BY 1),
        fl AS (SELECT s.doc_id,
                      CAST(len(s.grams) AS BIGINT) AS n_grams,
                      CAST(coalesce(h.c, 0) AS BIGINT) AS contaminated_grams,
                      CASE WHEN len(s.grams) > 0
                           THEN round(CAST(coalesce(h.c, 0) AS DOUBLE) / len(s.grams), 4)
                           ELSE 0.0 END AS contamination,
                      CASE WHEN len(s.grams) > 0
                           THEN round(CAST(coalesce(h.c, 0) AS DOUBLE) / len(s.grams), 4)
                                >= $ContaminationThreshold
                           ELSE false END AS flagged
               FROM sh s LEFT JOIN hits h USING (doc_id)
               WHERE s.doc_id >= $EvalMaxDocId)"""

  def queries: Seq[GraftQuery] = Seq(

    // ---- benchmark decontamination: eval-set n-gram overlap --------------
    // The eval set's distinct trigrams are tiny next to the corpus, so
    // they broadcast; the corpus side is one shingle scan + a partial
    // count agg keyed by doc. No shuffle ever carries document text —
    // only (doc_id, gram) pairs that actually hit the eval set.
    GraftQuery(
      "decontaminate",
      (s, dir) => contaminationFlags(s, dir)
        .select("doc_id", "n_grams", "contaminated_grams", "contamination", "flagged")
        .orderBy("doc_id"),
      Some(s"""
        $sqlShingles,
        $sqlContaminationCtes
        SELECT doc_id, n_grams, contaminated_grams, contamination, flagged
        FROM fl
        ORDER BY doc_id""")),

    // ---- exact eval-overlap SPANS: where the benchmark leaked ------------
    // decontaminate SCORES trigram overlap per doc; dup_spans finds
    // duplicated runs WITHIN the corpus. This is their composition — the
    // train-test-overlap removal shape of Lee et al. 2022 ("Deduplicating
    // Training Data Makes Language Models Better", public): every
    // DupSpanK-token gram of a TRAIN doc that appears VERBATIM anywhere in
    // the eval slice marks its start, and marked starts merge into the
    // maximal leaked spans — the exact text to excise, not just a doc
    // score. Scale: the eval gram set is tiny next to the corpus and
    // BROADCASTS as xxhash64 longs (chat_decontaminate's posture); the train
    // side is one gram scan whose hits alone reach the per-doc run-merge
    // window (Dedup.mergeSpans — per-doc frames). No shuffle ever carries
    // text: grams ride as digests, spans as integers.
    GraftQuery(
      "decontaminate_spans",
      (s, dir) => evalLeakSpans(s, dir)
        .orderBy("doc_id", "span_start"),
      Some(s"""
        WITH $sqlEvalSpanCtes
        SELECT doc_id, span_start, span_end, span_tokens, n_grams
        FROM spans
        ORDER BY doc_id, span_start""")),

    // ---- apply the excision: the decontaminated corpus -------------------
    // The materialization step (strip_dup_spans' twin on the eval-overlap
    // marks): every train-doc token covered by a leaked span is dropped
    // and the survivors are rejoined — the corpus that actually ships to
    // training after benchmark decontamination. Span lists per doc are
    // small (merged spans, not grams): one doc-keyed join plus a per-row
    // index filter, no token-level shuffle.
    GraftQuery(
      "strip_eval_spans",
      (s, dir) => {
        val spanLists = evalLeakSpans(s, dir)
          .groupBy("doc_id")
          .agg(collect_list(struct(col("span_start"), col("span_end")))
            .as("spans"))
        Tables.documents(s, dir)
          .filter(col("doc_id") >= EvalMaxDocId)
          .select(col("doc_id"),
            split(coalesce(col("text"), lit("")), " ").as("toks"))
          .join(spanLists, Seq("doc_id"), "left")
          .withColumn("spans", coalesce(col("spans"),
            array().cast("array<struct<span_start:int,span_end:int>>")))
          .withColumn("kept", expr(
            """filter(toks, (t, i) ->
                 NOT exists(spans, sp ->
                   i >= sp.span_start AND i <= sp.span_end))"""))
          .select(col("doc_id"),
            size(col("toks")).as("n_tokens"),
            (size(col("toks")) - size(col("kept"))).as("n_removed"),
            concat_ws(" ", col("kept")).as("clean_text"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $sqlEvalSpanCtes,
        cov AS (SELECT DISTINCT doc_id,
                       unnest(range(span_start, span_end + 1)) AS pos
                FROM spans),
        tk AS (SELECT doc_id,
                      unnest(range(0, len(toks))) AS pos,
                      unnest(toks) AS tok
               FROM d WHERE doc_id >= $EvalMaxDocId),
        kept AS (SELECT t.doc_id, t.pos, t.tok
                 FROM tk t LEFT JOIN cov c
                   ON t.doc_id = c.doc_id AND t.pos = c.pos
                 WHERE c.pos IS NULL),
        agg AS (SELECT doc_id, count(*) AS n_kept,
                       array_to_string(list(tok ORDER BY pos), ' ') AS clean
                FROM kept GROUP BY 1)
        SELECT d.doc_id,
               CAST(len(d.toks) AS INT) AS n_tokens,
               CAST(len(d.toks) - coalesce(a.n_kept, 0) AS INT) AS n_removed,
               coalesce(a.clean, '') AS clean_text
        FROM d LEFT JOIN agg a USING (doc_id)
        WHERE d.doc_id >= $EvalMaxDocId
        ORDER BY d.doc_id""")),

    // ---- leak-mass rollup: which sources ship benchmark text -------------
    // The monitoring face (dup_span_rate_by_source's twin): per source,
    // how many train docs leak eval text and the leaked token mass as an
    // exact floor-ppm of the source's token mass — the alert a
    // decontamination pipeline pages on when a crawl source starts
    // mirroring a benchmark site. Sits on [[evalLeakSpans]]; the extra
    // cost is one per-doc agg and a |sources|-row rollup.
    GraftQuery(
      "leak_mass_by_source",
      (s, dir) => {
        val perDoc = evalLeakSpans(s, dir).groupBy("doc_id")
          .agg(sum("span_tokens").as("leak_toks"))
        Tables.documents(s, dir)
          .filter(col("doc_id") >= EvalMaxDocId)
          .select(col("doc_id"), col("source"),
            size(split(coalesce(col("text"), lit("")), " "))
              .cast(LongType).as("n_toks"))
          .join(perDoc, Seq("doc_id"), "left")
          .withColumn("leak_toks", coalesce(col("leak_toks"), lit(0L)))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("leak_toks") > 0, 1L).otherwise(0L)).as("docs_affected"),
            sum("n_toks").as("n_tokens"),
            sum("leak_toks").as("leaked_tokens"))
          .withColumn("leak_ppm", expr(
            "CAST(CAST(leaked_tokens AS DECIMAL(38,0)) * 1000000 DIV n_tokens AS BIGINT)"))
          .orderBy("source")
      },
      Some(s"""
        WITH $sqlEvalSpanCtes,
        pd AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS leak_toks
               FROM spans GROUP BY 1),
        dd AS (SELECT doc_id, source,
                      CAST(len(string_split(coalesce(text, ''), ' '))
                        AS BIGINT) AS n_toks
               FROM documents WHERE doc_id >= $EvalMaxDocId),
        j AS (SELECT dd.source, dd.n_toks,
                     coalesce(pd.leak_toks, 0) AS leak_toks
              FROM dd LEFT JOIN pd USING (doc_id))
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN leak_toks > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_affected,
               CAST(sum(n_toks) AS BIGINT) AS n_tokens,
               CAST(sum(leak_toks) AS BIGINT) AS leaked_tokens,
               CAST(CAST(sum(leak_toks) AS HUGEINT) * 1000000 // sum(n_toks)
                 AS BIGINT) AS leak_ppm
        FROM j GROUP BY 1
        ORDER BY source""")),

    // ---- end-to-end cleaning pass: the pipeline the operators exist for --
    // Quality gate (corpus_filter's thresholds) → exact-dedup survivors
    // (min doc_id per content digest) → decontamination flag → per-language
    // surviving corpus stats. One registered query proving the operator
    // families COMPOSE into the actual trillion-token cleaning flow: the
    // gate fuses into the scan, the survivor set and contamination flags
    // are narrow (doc_id-keyed) frames that join back without ever
    // shuffling text, and the final agg is map-side partial.
    GraftQuery(
      "pipeline_e2e",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val nTok = size(toks)
        val stopRatio = size(filter(toks,
          t => t.isin(TextAnalysis.stopwords: _*))).cast(DoubleType) / nTok
        val avgTokLen = (length(col("text")) - (nTok - lit(1)))
          .cast(DoubleType) / nTok
        val quality = Tables.documents(s, dir)
          .filter(nTok.between(5, 5000) &&
            stopRatio <= 0.5 && avgTokLen.between(2.0, 20.0))
        val survivors = Tables.documents(s, dir)
          .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("_h"))
          .agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val flags = contaminationFlags(s, dir).select("doc_id", "flagged")
        quality
          .filter(col("doc_id") >= EvalMaxDocId)
          .join(survivors, Seq("doc_id"), "left_semi")
          .join(flags, Seq("doc_id"), "left")
          .filter(!coalesce(col("flagged"), lit(false)))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast(LongType)).as("total_tokens"))
          .orderBy("lang")
      },
      Some {
        val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
        s"""
        $sqlShingles,
        $sqlContaminationCtes,
        q AS (
          SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
          FROM documents
          WHERE len(string_split(text, ' ')) BETWEEN 5 AND 5000
            AND CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN ($stops))) AS DOUBLE)
                  / len(string_split(text, ' ')) <= 0.5
            AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                  / len(string_split(text, ' ')) BETWEEN 2.0 AND 20.0),
        k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        SELECT q.lang AS lang, count(*) AS n_docs,
               CAST(sum(q.n_tok) AS BIGINT) AS total_tokens
        FROM q
        JOIN k USING (doc_id)
        LEFT JOIN fl USING (doc_id)
        WHERE q.doc_id >= $EvalMaxDocId
          AND NOT coalesce(fl.flagged, false)
        GROUP BY q.lang
        ORDER BY lang"""
      }),

    // ---- stratified sampling by content hash -----------------------------
    // Per-language keep rates applied via a percent bucket of the content
    // hash: scan-side arithmetic, embarrassingly parallel, reproducible
    // run to run and engine to engine (unlike rand()-based sampleBy,
    // which cannot be oracle-checked and resamples per run). Downsamples
    // the over-represented language (en) against the rest — the standard
    // corpus-rebalancing shape.
    GraftQuery(
      "stratified_sample",
      (s, dir) => {
        val bucket = pmod(contentHash, lit(100L))
        val rate = when(col("lang") === "en", 20).otherwise(60)
        Tables.documents(s, dir)
          .withColumn("bucket", bucket)
          .filter(col("bucket") < rate)
          .select(col("doc_id"), col("lang"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (SELECT doc_id, lang, $sqlContentHash % 100 AS bucket
                   FROM documents)
        SELECT doc_id, lang, bucket
        FROM b
        WHERE bucket < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
        ORDER BY doc_id""")),

    // ---- shard packing: token-budget assignment via running totals -------
    // Assigns each doc to a training shard so shards hold ~budget tokens,
    // via a cumulative token sum per language ordered by doc_id. `lang`
    // is a HANDFUL of values, so a plain per-language window would sort
    // each language's entire document set in ONE task at 100 TB — the
    // running total therefore comes from [[tokenCumsum]]'s two-phase
    // bucket + broadcast-offset build (cumsum within (lang, doc_id-range
    // bucket), tiny per-bucket offsets broadcast back), while the oracle
    // keeps the single-window formulation the two phases must equal.
    GraftQuery(
      "shard_packing",
      (s, dir) => tokenCumsum(s, dir)
        .withColumnRenamed("cum", "cum_tokens")
        // shard = how many full budgets precede this doc's first token
        .withColumn("shard_id",
          expr(s"(cum_tokens - n_tokens) DIV $ShardTokenBudget"))
        .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id, lang, n_tokens,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
               (CAST(sum(n_tokens) OVER w AS BIGINT) - n_tokens)
                 // $ShardTokenBudget AS shard_id
        FROM (SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents)
        WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY doc_id""")),

    // ---- exact mode per key with deterministic tiebreak ------------------
    // Most-frequent event_type per user through the TopKPerKey two-phase
    // heap (partial per-partition heaps → k·keys-row shuffle), not a
    // window sort — mode is the degenerate k=1 case of the repo's own
    // top-k operator. Ties break on the lexicographically first type in
    // both engines.
    GraftQuery(
      "mode_per_group",
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        graft.plans.TopK.perKey(counts, Seq("user_id"),
            Seq(("n", "desc"), ("event_type", "asc")), 1)
          .select(col("user_id"), col("event_type").as("mode_event_type"),
            col("n").as("n_events"))
          .orderBy("user_id")
      },
      Some("""
        WITH c AS (SELECT user_id, event_type, count(*) n
                   FROM events GROUP BY 1, 2)
        SELECT user_id, event_type AS mode_event_type, n AS n_events
        FROM (SELECT user_id, event_type, n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type) rn
              FROM c)
        WHERE rn = 1
        ORDER BY user_id""")),

    // ---- overlapping token-window chunking (context-window packing) ------
    // The pass between curation and tokenization: cut each document into
    // fixed-width token windows with overlap (stride < width) so no
    // boundary context is lost — the same shape RAG indexers and
    // sequence-packing tokenizers consume. Chunk count is
    // ceil(max(n - w, 0) / stride) + 1, so every token position is covered
    // and a short doc yields exactly one chunk.
    //
    // Scale: pure per-row arithmetic (sequence → transform → posexplode);
    // no shuffle at all until the presentation sort — the whole operator
    // pipelines inside one scan stage and parallelizes with the input.
    // Amplification is bounded by width/stride (≈1.33×) by construction.
    GraftQuery(
      "chunk_documents",
      (s, dir) => Tables.documents(s, dir)
        // tokenize into a COLUMN first: split() inside the transform
        // lambda would re-tokenize the whole document per chunk index
        // (interpreted HOF, no subexpression elimination) — quadratic in
        // document length
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), expr(
          s"""transform(
                sequence(0, CAST(ceil(greatest(size(toks) - $ChunkTokens, 0) / $ChunkStride.0) AS INT)),
                i -> array_join(slice(toks, i * $ChunkStride + 1, $ChunkTokens), ' '))""")
          .as("chunks"))
        .select(col("doc_id"), posexplode(col("chunks")).as(Seq("chunk_id", "chunk_text")))
        .withColumn("n_tokens", size(split(col("chunk_text"), " ")).cast(LongType))
        .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
        .orderBy("doc_id", "chunk_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks FROM documents),
        ch AS (SELECT doc_id,
                 list_transform(
                   range(0, CAST(ceil(greatest(len(toks) - $ChunkTokens, 0) / $ChunkStride.0) AS INT) + 1),
                   i -> array_to_string(list_slice(toks, i * $ChunkStride + 1, i * $ChunkStride + $ChunkTokens), ' ')) chunks
               FROM t)
        SELECT doc_id,
               generate_subscripts(chunks, 1) - 1 AS chunk_id,
               CAST(len(string_split(unnest(chunks), ' ')) AS BIGINT) AS n_tokens,
               unnest(chunks) AS chunk_text
        FROM ch
        ORDER BY doc_id, chunk_id""")),

    // ---- TextTiling: lexical-cohesion topic boundaries --------------------
    // The SEMANTIC chunker next to the fixed-width (chunk_documents) and
    // content-defined (cdc_chunks) ones — Hearst's TextTiling (1997,
    // public): evaluate the lexical cohesion across every candidate gap
    // (here every [[TileBlock]] tokens) as the Jaccard similarity of the
    // distinct-token sets in the [[TileWindow]]-token spans on either
    // side, then call a gap a topic boundary when it is a deep enough
    // VALLEY — both neighbors more cohesive by a combined
    // [[TileDepthPpm]] ppm. RAG indexers split here instead of
    // mid-topic. Integer-exact end to end: similarities are
    // floor(10⁶·|∩|/|∪|), depth is neighbor differences clamped at 0,
    // so the oracle replays every gap bit-for-bit.
    //
    // Scale: the similarity is pure per-row HOF arithmetic (token array
    // bound once — the chunk_documents lesson — then one explode); the
    // depth pass is a lag/lead window partitioned by doc_id, which
    // distributes over millions of documents (per-doc gap counts are
    // corpus-bounded; this is NOT the few-series changepoints regime).
    GraftQuery(
      "text_tiling",
      (s, dir) => {
        val w = Window.partitionBy("doc_id").orderBy("gap_idx")
        Tables.documents(s, dir)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          // drop empty tokens from doubled spaces (mirrored) and bind the
          // array once — a split() inside the transform would re-tokenize
          // per gap
          .withColumn("toks",
            expr("filter(split(coalesce(text, ''), ' '), t -> t != '')"))
          .withColumn("n", size(col("toks")))
          .select(col("doc_id"), col("toks"), col("n"),
            explode(expr(
              s"IF(n > $TileBlock, sequence(1, CAST((n - 1) DIV $TileBlock AS INT)), array())"))
              .as("gap_idx"))
          .withColumn("p", col("gap_idx") * TileBlock)
          .withColumn("lw", expr(
            s"array_distinct(slice(toks, greatest(1, p - $TileWindow + 1), " +
              s"p - greatest(1, p - $TileWindow + 1) + 1))"))
          .withColumn("rw", expr(
            s"array_distinct(slice(toks, p + 1, least($TileWindow, n - p)))"))
          .withColumn("sim_ppm", expr(
            """CAST(CAST(size(array_intersect(lw, rw)) AS BIGINT) * 1000000
               DIV size(array_union(lw, rw)) AS BIGINT)"""))
          .withColumn("prev", lag("sim_ppm", 1).over(w))
          .withColumn("next", lead("sim_ppm", 1).over(w))
          .withColumn("depth_ppm",
            expr("coalesce(greatest(0L, prev - sim_ppm), 0L)") +
              expr("coalesce(greatest(0L, next - sim_ppm), 0L)"))
          // a boundary must be a strict VALLEY (both neighbors more
          // cohesive), not a shoulder where only one side falls — the
          // planted-seam fixture flags the shoulder rule
          .withColumn("is_boundary",
            col("prev").isNotNull && col("next").isNotNull &&
              col("prev") > col("sim_ppm") && col("next") > col("sim_ppm") &&
              col("depth_ppm") > TileDepthPpm)
          .select(col("doc_id"), col("gap_idx").cast(LongType).as("gap_idx"),
            col("p").cast(LongType).as("token_pos"),
            col("sim_ppm"), col("depth_ppm"), col("is_boundary"))
          .orderBy("doc_id", "gap_idx")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, toks, len(toks) AS n,
                 unnest(CASE WHEN len(toks) > $TileBlock
                        THEN range(1, (len(toks) - 1) // $TileBlock + 1)
                        ELSE [] END) AS gap_idx
          FROM t),
        sim AS (
          SELECT doc_id, gap_idx, gap_idx * $TileBlock AS p,
                 CAST(CAST(len(list_intersect(
                        list_distinct(list_slice(toks,
                          greatest(1, gap_idx * $TileBlock - $TileWindow + 1),
                          gap_idx * $TileBlock)),
                        list_distinct(list_slice(toks,
                          gap_idx * $TileBlock + 1,
                          least(n, gap_idx * $TileBlock + $TileWindow)))))
                      AS BIGINT) * 1000000
                   // len(list_distinct(list_concat(
                        list_distinct(list_slice(toks,
                          greatest(1, gap_idx * $TileBlock - $TileWindow + 1),
                          gap_idx * $TileBlock)),
                        list_distinct(list_slice(toks,
                          gap_idx * $TileBlock + 1,
                          least(n, gap_idx * $TileBlock + $TileWindow))))))
                   AS BIGINT) AS sim_ppm
          FROM g),
        d AS (
          SELECT doc_id, gap_idx, p, sim_ppm,
                 lag(sim_ppm) OVER (PARTITION BY doc_id ORDER BY gap_idx) AS prev,
                 lead(sim_ppm) OVER (PARTITION BY doc_id ORDER BY gap_idx) AS next
          FROM sim)
        SELECT doc_id, CAST(gap_idx AS BIGINT) AS gap_idx,
               CAST(p AS BIGINT) AS token_pos, sim_ppm,
               CAST(coalesce(greatest(0, prev - sim_ppm), 0)
                  + coalesce(greatest(0, next - sim_ppm), 0) AS BIGINT)
                 AS depth_ppm,
               (prev IS NOT NULL AND next IS NOT NULL AND
                prev > sim_ppm AND next > sim_ppm AND
                coalesce(greatest(0, prev - sim_ppm), 0)
                  + coalesce(greatest(0, next - sim_ppm), 0) > $TileDepthPpm)
                 AS is_boundary
        FROM d
        ORDER BY doc_id, gap_idx""")),

    // ---- per-source document cap (domain cap) ----------------------------
    // The anti-monoculture rule of web-scale curation: no single
    // source/domain may contribute more than N documents, survivors chosen
    // by deterministic hash order (not scan order — reproducible across
    // runs and engines, and unbiased w.r.t. position in the crawl). The
    // same content hash that drives stratified_sample orders candidates;
    // doc_id breaks hash ties totally.
    //
    // Scale: TopKPerKey bounds the shuffle at k rows per (partition,
    // source) — a row_number window would shuffle and SORT every document
    // of every hot domain just to throw away all but N. The rank window
    // after it runs over ≤ N rows per source, where it is free.
    GraftQuery(
      "source_cap",
      (s, dir) => {
        val ordered = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), contentHash.as("h"))
        val kept = graft.plans.TopK.perKey(ordered, Seq("source"),
          Seq(("h", "asc"), ("doc_id", "asc")), SourceCap)
        val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
        kept.withColumn("keep_rank", row_number().over(w))
          .select("source", "keep_rank", "doc_id", "h")
          .orderBy("source", "keep_rank")
      },
      Some(s"""
        WITH h AS (
          SELECT doc_id, source, $sqlContentHash AS h FROM documents),
        ranked AS (
          SELECT source, doc_id, h,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY h, doc_id) AS keep_rank
          FROM h)
        SELECT source, keep_rank, doc_id, h
        FROM ranked
        WHERE keep_rank <= $SourceCap
        ORDER BY source, keep_rank""")),

    // ---- content-defined chunking (rolling-hash boundaries) --------------
    // The storage-dedup classic (rsync/LBFS): a chunk boundary falls after
    // token i whenever the hash of the last CdcWindow tokens ≡ 0 mod
    // CdcDivisor, so boundaries are CONTENT-anchored — insert a sentence
    // into a document and only the chunks around the edit change, where
    // fixed-width chunking (chunk_documents) shifts every downstream
    // chunk. That stability is what makes chunk-level dedup across
    // document revisions work. Expected chunk length = CdcDivisor tokens;
    // a final boundary is forced at the end so every token lands in
    // exactly one chunk.
    //
    // Scale: per-row arithmetic only (token codes → windowed hash →
    // boundary filter → chunk spans), zero shuffle before the
    // presentation sort; the same engine-neutral polynomial hash as
    // doc_fingerprint keeps the whole operator oracle-checkable. The
    // boundary scan is a codegen'd kernel ([[VectorKernels.cdcBounds]]) —
    // the filter/aggregate higher-order formulation is CodegenFallback
    // and re-evaluates the codes child per lambda iteration (measured
    // 12 s vs 0.3 s for the corpus at sf0.1).
    GraftQuery(
      "cdc_chunks",
      (s, dir) => cdcChunkSpans(s, dir)
        .select(col("doc_id"), col("chunk_id"),
          expr("element_at(starts, chunk_id + 1)").cast(LongType).as("start_tok"),
          (col("bend") - expr("element_at(starts, chunk_id + 1)")).cast(LongType).as("n_tokens"),
          expr("""array_join(slice(toks, element_at(starts, chunk_id + 1) + 1,
                                   bend - element_at(starts, chunk_id + 1)), ' ')""")
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_id"),
      Some(s"""
        WITH $sqlCdcCtes
        SELECT doc_id, j - 1 AS chunk_id,
               CAST(starts[j] AS BIGINT) AS start_tok,
               CAST(bend - starts[j] AS BIGINT) AS n_tokens,
               array_to_string(list_slice(toks, starts[j] + 1, bend), ' ') AS chunk_text
        FROM x
        ORDER BY doc_id, chunk_id""")),

    // ---- chunk-level dedup over content-defined chunks -------------------
    // WHY cdc exists: because boundaries are content-anchored, a passage
    // shared between two documents (or two revisions of one) produces the
    // SAME chunks regardless of where it sits, so exact chunk dedup finds
    // shared passages that fixed-width blocks straddle differently per
    // document. Same duplicated-instance profile as block_dedup — and the
    // same scale shape: chunk text collapses to a 16-byte digest before
    // the ONE windowed-min exchange marks canonical instances.
    GraftQuery(
      "cdc_dedup",
      (s, dir) => {
        val w = Window.partitionBy("ch")
        cdcChunkSpans(s, dir)
          .select(col("doc_id"),
            (col("doc_id") * 1000000L + col("chunk_id")).as("pos"),
            md5(to_binary(expr(
              """array_join(slice(toks, element_at(starts, chunk_id + 1) + 1,
                                  bend - element_at(starts, chunk_id + 1)), ' ')"""),
              lit("utf-8"))).as("ch"))
          .withColumn("first_pos", min(col("pos")).over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("pos") =!= col("first_pos"), 1L).otherwise(0L)).as("dup_chunks"))
          .withColumn("dup_ratio",
            round(col("dup_chunks").cast(DoubleType) / col("n_chunks"), 4))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $sqlCdcCtes,
        inst AS (SELECT doc_id,
                   doc_id * 1000000 + (j - 1) AS pos,
                   array_to_string(list_slice(toks, starts[j] + 1, bend), ' ') AS ch
                 FROM x),
        canon AS (SELECT ch, min(pos) first_pos FROM inst GROUP BY ch)
        SELECT i.doc_id,
               count(*) AS n_chunks,
               CAST(sum(CASE WHEN i.pos != c2.first_pos THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
               round(CAST(sum(CASE WHEN i.pos != c2.first_pos THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 4) AS dup_ratio
        FROM inst i JOIN canon c2 USING (ch)
        GROUP BY i.doc_id
        ORDER BY i.doc_id""")),

    // ---- data-mixing weights: per-source sampling proportional to size^α --
    // The mixture-allocation step of corpus assembly: each source's
    // sampling weight ∝ n_tokens^α (α=½ here — the square-root temper
    // that keeps big crawls from drowning small high-quality sources).
    // One scan + per-source partial agg; the normalizer is a one-row
    // broadcast, so nothing reshuffles. Determinism: sqrt is IEEE
    // exactly-rounded in both engines, the rounded numerator becomes an
    // exact integer, and the normalization is the same integer half-up
    // division davg uses — bit-identical weights by construction (a raw
    // double sum over sources would be combine-order-dependent).
    GraftQuery(
      "domain_mix_weights",
      (s, dir) => mixWeights(s, dir).orderBy("source"),
      Some(s"""
        WITH $sqlMixWeights
        SELECT source, n_docs, n_tokens, weight
        FROM w2
        ORDER BY source""")),

    // ---- epoch scheduling: token budget → per-source repeat factors ------
    // The step between mixture weights and the dataloader: given a total
    // token budget (one full corpus pass here) split by the same √-temper
    // as domain_mix_weights, how many EPOCHS of each source does the
    // schedule imply, and where does the repeat cap (4 epochs — the
    // repeated-data degradation knee) bind? Unlike domain_mix_weights,
    // every number stays an exact integer: the target allocation is
    // budget·num DIV tot on DECIMAL/HUGEINT (no float weight in the
    // path), epochs are exact milli-epochs, so the schedule hash-checks.
    // Scale: one corpus scan into a |sources|-row frame; the budget/
    // normalizer is a one-row broadcast.
    GraftQuery(
      "epoch_schedule",
      (s, dir) => {
        val stats = Tables.documents(s, dir)
          .groupBy("source")
          .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
          .withColumn("num",
            expr("CAST(round(sqrt(n_tokens) * 1000000) AS DECIMAL(38,0))"))
        val tot = stats.agg(sum(col("num")).as("tot"),
          sum(col("n_tokens")).as("budget"))
        stats.crossJoin(broadcast(tot))
          .withColumn("target_tokens",
            expr("CAST(CAST(budget AS DECIMAL(38,0)) * num DIV tot AS BIGINT)"))
          .withColumn("effective_tokens",
            least(col("target_tokens"), expr(s"$MaxEpochs * n_tokens")))
          .withColumn("epochs_milli",
            expr("CAST(effective_tokens * 1000 DIV n_tokens AS BIGINT)"))
          .withColumn("capped",
            col("target_tokens") > expr(s"$MaxEpochs * n_tokens"))
          .select("source", "n_tokens", "target_tokens", "effective_tokens",
            "epochs_milli", "capped")
          .orderBy("source")
      },
      Some(s"""
        WITH s AS (SELECT source,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                   FROM documents GROUP BY 1),
        w AS (SELECT *, CAST(round(sqrt(n_tokens) * 1000000) AS HUGEINT) AS num
              FROM s),
        t AS (SELECT sum(num) AS tot, sum(n_tokens) AS budget FROM w),
        x AS (SELECT source, n_tokens,
                     CAST(budget * num // tot AS BIGINT) AS target_tokens
              FROM w, t)
        SELECT source, n_tokens, target_tokens,
               least(target_tokens, $MaxEpochs * n_tokens) AS effective_tokens,
               CAST(least(target_tokens, $MaxEpochs * n_tokens) * 1000
                    // n_tokens AS BIGINT) AS epochs_milli,
               target_tokens > $MaxEpochs * n_tokens AS capped
        FROM x
        ORDER BY source""")),

    // ---- Gini concentration of the corpus over sources -------------------
    // The one-number diversity alarm behind domain_mix_weights: how
    // concentrated is the token mass across sources (0 = uniform,
    // →1 = one crawl dominates). Exact: Gini's discrete form
    // Σ(2i−n−1)·x_(i) / (n·Σx) over ascending-sorted sources is pure
    // integer arithmetic (the sum is invariant under tie order, and the
    // tiebreak pins row_number anyway), emitted as floor-ppm. The window
    // runs over the |sources| frame — never the corpus.
    GraftQuery(
      "gini_concentration",
      (s, dir) => {
        val stats = Tables.documents(s, dir)
          .groupBy("source")
          .agg(sum(size(split(coalesce(col("text"), lit("")), " "))
            .cast(LongType)).as("n_tokens"))
        // lit(1) partitions: same single-partition execution over the
        // per-source aggregate (≤ |sources| rows), minus WindowExec's WARN
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1)).orderBy("n_tokens", "source")
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        stats
          .withColumn("i", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("tot", sum("n_tokens").over(wAll))
          .agg(max("n").as("n_sources"), max("tot").as("total_tokens"),
            sum(expr("CAST(2 * i - n - 1 AS DECIMAL(38,0)) * n_tokens"))
              .as("gnum"))
          .select(col("n_sources"), col("total_tokens"),
            expr("""CAST(gnum * 1000000
                      DIV (CAST(n_sources AS DECIMAL(38,0)) * total_tokens)
                      AS BIGINT)""").as("gini_ppm"))
      },
      Some("""
        WITH s AS (SELECT source,
                     CAST(sum(len(string_split(coalesce(text, ''), ' ')))
                       AS BIGINT) AS n_tokens
                   FROM documents GROUP BY 1),
        r AS (SELECT n_tokens,
                     row_number() OVER (ORDER BY n_tokens, source) AS i,
                     count(*) OVER () AS n,
                     sum(n_tokens) OVER () AS tot
              FROM s)
        SELECT CAST(max(n) AS BIGINT) AS n_sources,
               CAST(max(tot) AS BIGINT) AS total_tokens,
               CAST(sum((2 * i - n - 1) * n_tokens) * 1000000
                    // (max(n) * max(tot)) AS BIGINT) AS gini_ppm
        FROM r""")),

    // ---- mixture order: the deterministic interleaved dataloader sequence -
    // The artifact between mixture weights and training: ONE global
    // document order in which every prefix holds each source in
    // proportion to its √-tempered weight (weighted fair queueing —
    // doc r of source s goes at integer virtual time r·10¹²/num_s, all
    // docs sort by vt). Exact integer arithmetic end to end, so the
    // entire training order hash-checks.
    //
    // Scale (the point — this composes the repo's two hardest rank
    // patterns): the per-source rank and the global position are BOTH
    // two-phase bucket + broadcast-offset ranks (no per-source window
    // funnel, no single-task global sort); buckets bin monotonically in
    // the respective sort key, so bucket-local row_number + tiny offset
    // frames equal the single-window ranks the oracle computes.
    GraftQuery(
      "mixture_order",
      (s, dir) => {
        val base = Tables.documents(s, dir).select(col("doc_id"), col("source"))
        val ranked = PipelineOps.twoPhaseRank(base,
          Seq("source"), "doc_id", Seq.empty, "src_rank", CumsumBuckets)
        // virtual time from the √-tempered per-source doc weights
        val wts = base.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .withColumn("num",
            expr("CAST(round(sqrt(n_docs) * 1000000) AS DECIMAL(38,0))"))
          .select("source", "num")
        val vted = ranked.join(broadcast(wts), "source")
          .withColumn("vt", expr(
            "CAST(CAST(src_rank AS DECIMAL(38,0)) * 1000000000000 DIV num AS BIGINT)"))
          .select("doc_id", "source", "src_rank", "vt")
        PipelineOps.twoPhaseRank(vted,
            Seq.empty, "vt", Seq("source", "doc_id"), "global_pos", CumsumBuckets)
          .select("global_pos", "doc_id", "source", "src_rank", "vt")
          .orderBy("global_pos")
      },
      Some("""
        WITH b AS (SELECT doc_id, source FROM documents),
        r AS (SELECT doc_id, source,
                row_number() OVER (PARTITION BY source ORDER BY doc_id)
                  AS src_rank
              FROM b),
        w AS (SELECT source,
                CAST(round(sqrt(count(*)) * 1000000) AS HUGEINT) AS num
              FROM b GROUP BY 1),
        v AS (SELECT r.doc_id, r.source, CAST(r.src_rank AS BIGINT) AS src_rank,
                CAST(CAST(r.src_rank AS HUGEINT) * 1000000000000 // w.num
                  AS BIGINT) AS vt
              FROM r JOIN w USING (source))
        SELECT row_number() OVER (ORDER BY vt, source, doc_id) AS global_pos,
               doc_id, source, src_rank, vt
        FROM v
        ORDER BY global_pos""")),

    // ---- mixture materialization: apply the weights as keep rates --------
    // The step after allocation: turn each source's weight into a keep
    // rate toward a target corpus size (rate = weight·target/n_docs,
    // capped at keep-all) and apply it through the deterministic
    // content-hash percent bucket. The weights frame is ≤|sources| rows
    // and broadcasts onto the one corpus scan; every arithmetic input is
    // engine-identical (exact weights, integer counts), so the keep
    // decision — bucket < 100·rate — is bit-identical cross-engine.
    GraftQuery(
      "mixture_sample",
      (s, dir) => {
        val rates = mixWeights(s, dir)
          .withColumn("rate",
            least(lit(1.0), col("weight") * MixTargetDocs / col("n_docs")))
          .select("source", "rate")
        // fanOutNarrow (r14): the interpreted contentHash fold ran on the
        // single-file scan's one task (1.19 s quiet baseline); per-row
        // hash + filter are order-insensitive. No-op on parallel layouts.
        Tables.fanOutNarrow(Tables.documents(s, dir)
            .select("doc_id", "source", "text"))
          .withColumn("bucket", pmod(contentHash, lit(100L)))
          .join(broadcast(rates), "source")
          .filter(col("bucket") < col("rate") * 100)
          .select(col("doc_id"), col("source"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $sqlMixWeights,
        r AS (SELECT source, least(1.0, weight * $MixTargetDocs / n_docs) AS rate
              FROM w2),
        d AS (SELECT doc_id, source, $sqlContentHash % 100 AS bucket
              FROM documents)
        SELECT d.doc_id, d.source, d.bucket
        FROM d JOIN r USING (source)
        WHERE d.bucket < r.rate * 100
        ORDER BY d.doc_id""")),

    // ---- sequence packing: the materialized shard manifest ---------------
    // shard_packing assigns shard ids; this emits what the tokenizer
    // actually consumes — per shard, the member docs IN ORDER with each
    // doc's token offset inside the packed sequence (offset = its cumsum
    // start minus the shard's start). The running total is the same
    // two-phase [[tokenCumsum]] build shard_packing uses (no per-language
    // single-task sort), one extra window over the (lang, shard) key that
    // the final groupBy reuses as its shuffle key — a shard holds at most
    // budget tokens, so that partition and the per-shard collect are both
    // bounded by the token budget regardless of corpus size.
    GraftQuery(
      "pack_sequences",
      (s, dir) => {
        val d = tokenCumsum(s, dir)
          .withColumn("shard_id", expr(s"(cum - n_tokens) DIV $ShardTokenBudget"))
          .withColumn("shard_start",
            min(col("cum") - col("n_tokens"))
              .over(Window.partitionBy("lang", "shard_id")))
        d.groupBy("lang", "shard_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            array_sort(collect_list(struct(col("doc_id"),
              (col("cum") - col("n_tokens") - col("shard_start")).as("off"))))
              .as("ps"))
          .select(col("lang"), col("shard_id"), col("n_docs"), col("total_tokens"),
            concat_ws(",", expr("transform(ps, x -> CAST(x.doc_id AS STRING))"))
              .as("doc_ids"),
            concat_ws(",", expr("transform(ps, x -> CAST(x.off AS STRING))"))
              .as("offsets"))
          .orderBy("lang", "shard_id")
      },
      Some(s"""
        WITH d AS (SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) n_tokens,
                     CAST(sum(len(string_split(text, ' '))) OVER w AS BIGINT) cum
                   FROM documents
                   WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        s AS (SELECT *, (cum - n_tokens) // $ShardTokenBudget AS shard_id FROM d),
        m AS (SELECT *, min(cum - n_tokens)
                          OVER (PARTITION BY lang, shard_id) AS shard_start
              FROM s)
        SELECT lang, shard_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids,
               -- coalesce to '': both engines SKIP null offsets (null-text
               -- docs), but an all-null group is '' in Spark's concat_ws
               -- and NULL in string_agg (hostile-corpus sweep finding)
               coalesce(string_agg(cum - n_tokens - shard_start, ','
                 ORDER BY doc_id), '') AS offsets
        FROM m
        GROUP BY 1, 2
        ORDER BY lang, shard_id""")),

    // ---- corpus export manifest: the pretraining lane's last mile --------
    // Round-13 verdict item 3 — the twin of ChatData's export_manifest on
    // the RAW-corpus lane: pack_sequences assigns shard ids and
    // Sinks.packedShards writes them one file per shard; this is the
    // receipt a training loader trusts instead of re-scanning the lake.
    // One row per (lang, shard): doc/token counts, the source mix
    // (`src:count` in source order — provenance), and an order-sensitive
    // md5 over the shard's doc ids (a dropped, duplicated, or re-sharded
    // doc changes it). LayoutSpec pins that the WRITTEN layout matches it
    // file for file, token for token.
    //
    // Scale: ONE doc-level exchange (the (lkey, shard_id, source)
    // partial agg — per-group state bounded by the shard's own id list,
    // itself bounded by the token budget) + one tiny rollup. No join at
    // all: a NULL-text doc has NULL n_tokens ⇒ NULL shard_id, and BOTH
    // engines keep NULL group keys where an equi-join would DROP them
    // (the lkey lesson, applied by never joining) — so the two-level
    // groupBy is the null-safe shape, not just the cheap one.
    GraftQuery(
      "corpus_export_manifest",
      (s, dir) => {
        val perSrc = packedDocs(s, dir)
          .groupBy(col("lkey"), col("shard_id"),
            coalesce(col("source"), lit("")).as("src"))
          .agg(max("lang").as("lang"),
            count(lit(1)).as("cnt"),
            sum("n_tokens").as("toks"),
            collect_list("doc_id").as("ids"))
        perSrc.groupBy("lkey", "shard_id")
          .agg(max("lang").as("lang"),
            sum("cnt").as("n_docs"),
            sum("toks").as("total_tokens"),
            concat_ws(",", expr(
              """transform(array_sort(collect_list(struct(src, cnt))),
                   p -> concat(p.src, ':', CAST(p.cnt AS STRING)))"""))
              .as("source_mix"),
            md5(to_binary(concat_ws(",", expr(
              """transform(array_sort(flatten(collect_list(ids))),
                   x -> CAST(x AS STRING))""")), lit("utf-8"))).as("digest"))
          .orderBy("lkey", "shard_id")
          .select("lang", "shard_id", "n_docs", "total_tokens",
            "source_mix", "digest")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang,
                 CASE WHEN lang IS NULL THEN chr(1) ELSE 'L' || lang END AS lk,
                 coalesce(source, '') AS src,
                 CAST(len(string_split(text, ' ')) AS BIGINT) n_tokens,
                 CAST(sum(len(string_split(text, ' '))) OVER w AS BIGINT) cum
          FROM documents
          WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        p AS (SELECT *, (cum - n_tokens) // $ShardTokenBudget AS shard_id
              FROM d),
        m AS (SELECT lk, shard_id, src, max(lang) AS lang,
                     CAST(count(*) AS BIGINT) AS cnt,
                     CAST(sum(n_tokens) AS BIGINT) AS toks,
                     list(doc_id) AS ids
              FROM p GROUP BY 1, 2, 3)
        SELECT max(lang) AS lang, shard_id,
               CAST(sum(cnt) AS BIGINT) AS n_docs,
               CAST(sum(toks) AS BIGINT) AS total_tokens,
               string_agg(src || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY src)
                 AS source_mix,
               md5(array_to_string(list_sort(flatten(list(ids))), ','))
                 AS digest
        FROM m
        GROUP BY lk, shard_id
        ORDER BY lk, shard_id NULLS FIRST""")),

    // ---- quality-weighted sampling (the soft filter) ---------------------
    // Hard quality gates (corpus_filter) throw borderline documents away;
    // modern pipelines instead DOWNSAMPLE by quality tier so marginal
    // text survives at reduced rate. Tier = stopword-ratio band (the
    // corpus's discriminative signal); keep-rate 90/50/10 per tier applied
    // through the same content-hash percent bucket stratified_sample uses
    // — scan-side arithmetic, no RNG state, reproducible across engines
    // and runs. The tier comparison divides two identical integers in
    // both engines, so banding is bit-identical.
    GraftQuery(
      "quality_sample",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val sr = size(filter(toks, t => t.isin(TextAnalysis.stopwords: _*)))
          .cast(DoubleType) / size(toks)
        val tier = when(sr <= 0.12, "high").when(sr <= 0.2, "med").otherwise("low")
        val rate = when(col("tier") === "high", 90)
          .when(col("tier") === "med", 50).otherwise(10)
        Tables.documents(s, dir)
          .withColumn("tier", tier)
          .withColumn("bucket", pmod(contentHash, lit(100L)))
          .filter(col("bucket") < rate)
          .select(col("doc_id"), col("tier"), col("bucket"))
          .orderBy("doc_id")
      },
      Some {
        val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
        s"""
        WITH q AS (
          SELECT doc_id,
                 CASE WHEN len(list_filter(string_split(text, ' '),
                                t -> t IN ($stops))) * 1.0
                        / len(string_split(text, ' ')) <= 0.12 THEN 'high'
                      WHEN len(list_filter(string_split(text, ' '),
                                t -> t IN ($stops))) * 1.0
                        / len(string_split(text, ' ')) <= 0.2 THEN 'med'
                      ELSE 'low' END AS tier,
                 $sqlContentHash % 100 AS bucket
          FROM documents)
        SELECT doc_id, tier, bucket
        FROM q
        WHERE bucket < CASE tier WHEN 'high' THEN 90 WHEN 'med' THEN 50 ELSE 10 END
        ORDER BY doc_id"""
      }),

    // ---- fill-in-the-middle transform (PSM) -------------------------------
    // The FIM data prep code models train on (Bavarian et al. 2022,
    // "Efficient Training of Language Models to Fill in the Middle"):
    // half the corpus (doc parity — the ~50% FIM rate the paper lands on)
    // is split prefix/middle/suffix at two deterministic id-keyed cuts
    // and reordered into the PSM layout `<PRE> prefix <SUF> suffix <MID>
    // middle`; the rest passes through autoregressive. Cuts guarantee a
    // nonempty prefix and suffix; the middle MAY be empty (real FIM keeps
    // empty middles — the model must learn to emit nothing). Deterministic
    // id-keyed cuts rather than RNG so the same document always splits the
    // same way and the reordered stream hash-checks cross-engine.
    //
    // Scale: one scan, pure per-row column arithmetic (pmod cuts, array
    // slices, one md5) — zero shuffle before the presentation sort; only
    // the 32-hex digest and the token accounting ever leave the row.
    GraftQuery(
      "fim_transform",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("toks"))
        .withColumn("n", size(col("toks")).cast(LongType))
        .withColumn("fim", col("doc_id") % 2 === 0 && col("n") >= 3)
        .withColumn("a", when(col("fim"),
          lit(1L) + pmod(col("doc_id") * 13, col("n") - 2)).otherwise(lit(0L)))
        .withColumn("b", when(col("fim"),
          col("a") + pmod(col("doc_id") * 29, col("n") - col("a")))
          .otherwise(lit(0L)))
        .select(col("doc_id"),
          when(col("fim"), lit("psm")).otherwise(lit("ar")).as("mode"),
          when(col("fim"), col("a")).otherwise(col("n")).as("n_prefix"),
          when(col("fim"), col("b") - col("a")).otherwise(lit(0L)).as("n_middle"),
          when(col("fim"), col("n") - col("b")).otherwise(lit(0L)).as("n_suffix"),
          when(col("fim"), md5(concat(
              lit("<PRE> "),
              array_join(slice(col("toks"), lit(1), col("a").cast("int")), " "),
              lit(" <SUF> "),
              array_join(slice(col("toks"), (col("b") + 1).cast("int"),
                (col("n") - col("b")).cast("int")), " "),
              lit(" <MID>"),
              when(col("b") > col("a"), concat(lit(" "),
                array_join(slice(col("toks"), (col("a") + 1).cast("int"),
                  (col("b") - col("a")).cast("int")), " ")))
                .otherwise(lit(""))).cast("binary")))
            .otherwise(md5(array_join(col("toks"), " ").cast("binary")))
            .as("digest"))
        .orderBy("doc_id"),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks,
                 len(string_split(coalesce(text, ''), ' ')) AS n
          FROM documents),
        s AS (
          SELECT doc_id, toks, n,
                 CASE WHEN doc_id % 2 = 0 AND n >= 3 THEN 1 ELSE 0 END AS fim
          FROM t),
        u AS (
          SELECT doc_id, toks, n, fim,
                 CASE WHEN fim = 1
                      THEN 1 + ((doc_id * 13) % (n - 2) + (n - 2)) % (n - 2)
                      ELSE 0 END AS a
          FROM s),
        v AS (
          SELECT doc_id, toks, n, fim, a,
                 CASE WHEN fim = 1
                      THEN a + ((doc_id * 29) % (n - a) + (n - a)) % (n - a)
                      ELSE 0 END AS b
          FROM u)
        SELECT doc_id,
               CASE WHEN fim = 1 THEN 'psm' ELSE 'ar' END AS mode,
               CAST(CASE WHEN fim = 1 THEN a ELSE n END AS BIGINT) AS n_prefix,
               CAST(CASE WHEN fim = 1 THEN b - a ELSE 0 END AS BIGINT) AS n_middle,
               CAST(CASE WHEN fim = 1 THEN n - b ELSE 0 END AS BIGINT) AS n_suffix,
               CASE WHEN fim = 1
                    THEN md5('<PRE> ' || array_to_string(list_slice(toks, 1, a), ' ')
                      || ' <SUF> ' || array_to_string(list_slice(toks, b + 1, n), ' ')
                      || ' <MID>' || CASE WHEN b > a
                           THEN ' ' || array_to_string(list_slice(toks, a + 1, b), ' ')
                           ELSE '' END)
                    ELSE md5(array_to_string(toks, ' ')) END AS digest
        FROM v ORDER BY doc_id""")),

    // ---- T5-style span-corruption accounting -----------------------------
    // Denoising-objective data prep: how much of each document a
    // deterministic span-corruption pass masks (a span starts at ~14% of
    // tokens keyed by content hash, runs 1-3 tokens, greedy no-overlap
    // left to right — see VectorKernels.spanCorruption). Content-keyed
    // rather than RNG-keyed so the same document always corrupts the
    // same way: reproducible batches, and the whole account hash-checks.
    //
    // Scale: one scan, the greedy fold is ONE codegen'd kernel pass per
    // row (the cdc_chunks lesson — a HOF formulation re-hashes per
    // lambda), zero shuffle before the presentation sort. The oracle
    // replays the fold as a list_reduce with the three counters PACKED
    // into one BIGINT (rem + 4·(masked + 8192·spans)) because DuckDB's
    // reduce accumulator must match the element type — sound while
    // documents stay under 8192 tokens (corpus max ≈ 10²; a longer-doc
    // corpus widens the fields).
    GraftQuery(
      "span_corruption",
      (s, dir) => {
        import graft.functions.{VectorExpressions => V}
        // coalesce(text, ''): the null-propagating kernel emitted NULL
        // counts where the oracle's list_prepend(0, NULL) produced 0s —
        // align both on the empty-doc semantics (1 empty token)
        Tables.documents(s, dir)
          .withColumn("_sc", V.spanCorruption(coalesce(col("text"), lit(""))))
          .select(col("doc_id"),
            col("_sc").getItem(0).as("n_tokens"),
            col("_sc").getItem(1).as("n_masked"),
            col("_sc").getItem(2).as("n_spans"))
          .withColumn("masked_ratio",
            round(col("n_masked").cast(DoubleType) / col("n_tokens"), 4))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') toks
                   FROM documents),
        h AS (SELECT doc_id, len(toks) AS n_tok,
                list_transform(toks, tk ->
                  list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, length(tk) + 1),
                      i -> CAST(unicode(substring(tk, i, 1)) AS BIGINT))),
                    (a, c) -> (a * 131 + c) % ${graft.functions.VectorKernels.MinHashP})) AS hs
              FROM t),
        f AS (SELECT doc_id, n_tok,
                -- branch-FREE fold: a CASE inside a list_reduce lambda
                -- miscomputes in DuckDB 1.0 when many varying-length lists
                -- share a vector chunk (full-corpus run returned 33/11 for
                -- a row that computes 27/9 isolated, in the packed python
                -- replica, and in the greedy kernel — hostile-corpus
                -- sweep finding); boolean-to-int arithmetic sidesteps it
                list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                  (acc, hv) -> acc
                    + CAST(acc % 4 > 0 AS BIGINT) * 3
                    + CAST(acc % 4 = 0 AS BIGINT) * CAST(hv % 7 = 0 AS BIGINT)
                      * ((hv // 7) % 3 + 4 + 32768)) AS acc
              FROM h)
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CAST((acc // 4) % 8192 AS BIGINT) AS n_masked,
               CAST(acc // 32768 AS BIGINT) AS n_spans,
               round(CAST((acc // 4) % 8192 AS DOUBLE) / n_tok, 4) AS masked_ratio
        FROM f
        ORDER BY doc_id""")),

    // ---- k-anonymity audit over quasi-identifiers ------------------------
    // The privacy release gate a data pipeline runs before publishing
    // derived event data: a quasi-identifier cell (event_type × value
    // decade here) containing fewer than K distinct users re-identifies
    // its members by intersection with outside knowledge. Reports every
    // cell with its distinct-user count and the at-risk verdict — the
    // downstream policy (suppress / generalize the cell) consumes the
    // flags. Complements pii_redact: that scrubs direct identifiers,
    // this measures indirect identifiability.
    //
    // Scale: one scan, one exchange on the cell key; count(DISTINCT user)
    // plans as Spark's two-phase distinct-aggregate expansion (partial
    // de-dup map-side). floor(value/10) is IEEE-exact in both engines.
    GraftQuery(
      "k_anonymity",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"),
          floor(col("value") / 10).cast(LongType).as("value_decade"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("at_risk", col("n_users") < KAnonThreshold)
        .orderBy("event_type", "value_decade"),
      Some(s"""
        SELECT event_type,
               CAST(floor(value / 10) AS BIGINT) AS value_decade,
               count(*) AS n_rows,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT user_id) < $KAnonThreshold AS at_risk
        FROM events
        GROUP BY event_type, CAST(floor(value / 10) AS BIGINT)
        ORDER BY event_type, value_decade"""))
  )

  /** k_anonymity: minimum distinct users per quasi-identifier cell. */
  private val KAnonThreshold = 5

  /** text_tiling gap spacing: a candidate topic boundary every this many
    * tokens (the sentence-gap stand-in on an unpunctuated corpus). */
  private val TileBlock = 10

  /** text_tiling cohesion span on each side of a gap, in tokens. */
  private val TileWindow = 30

  /** text_tiling boundary threshold: combined valley depth in ppm of
    * Jaccard similarity (0.2 — deep enough that adjacent same-topic
    * jitter doesn't split, shallow enough that the planted topic shifts
    * in the synthetic corpus register). */
  private val TileDepthPpm = 200000L

  /** chunk_documents window: 32-token chunks at stride 24 (25% overlap). */
  private val ChunkTokens = 32
  private val ChunkStride = 24

  /** source_cap: max docs kept per source. */
  private val SourceCap = 20

  /** mixture_sample: target corpus size the weights are scaled toward. */
  private val MixTargetDocs = 200

  /** cdc_chunks: rolling-hash window (tokens) and boundary divisor —
    * expected chunk length = CdcDivisor tokens (8 here against the short
    * synthetic docs; storage CDC uses ~2 KB with byte windows). */
  private val CdcWindow = 4
  private val CdcDivisor = 8
}
