package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.{LshPlanes, VectorExpressions => V}

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths, per the standard ANN playbook:
  *  - brute-force cosine top-k: broadcast the (small) query set, compute
  *    dot products scan-side — fully distributed, no shuffle until the
  *    per-query top-k. The correctness baseline.
  *  - LSH-bucketed (random hyperplanes): only bucket-mates are scored; at
  *    100 TB this turns O(n·q·d) into O(n·tables + candidates·d) at a
  *    recall cost (measured in OperatorSpec).
  *
  * The kernels are custom codegen'd Catalyst expressions
  * ([[graft.functions.VectorExpressions]]) — the higher-order-function
  * formulation is CodegenFallback and measured ~10 s/query at sf0.1; the
  * expressions produce identical IEEE doubles (same left-to-right fold as
  * DuckDB's `list_reduce`, so the SQL oracles still match bit-for-bit).
  */
object Similarity {

  /** Upper bound of the similarity universe's L2 norm. Everything in the
    * suite that touches a vector quantizes through exact decimal/integer
    * arithmetic (DECIMAL(18,8) coordinate sums, micro-unit squared
    * distances) so the two engines hash-match bit-for-bit; that
    * discipline needs bounded coordinates — with norms < 1e4 a squared
    * distance tops out at (2·1e4)² = 4e8, far inside every cast. Any
    * real embedding has O(1) norm; a vector beyond this bound is a
    * corrupt feature dump, excluded like the zero vector. */
  private[graft] val MaxVecNorm = 1e4

  /** Declared embedding dimensionality — part of the universe contract.
    * A wrong-width vector silently truncates in the Spark kernels
    * (min-length loops) while DuckDB's fold reads the missing slots as
    * NULL — the engines would disagree on every score it touches, and a
    * >64-dim vector would trip sign_pack's fail-loudly width check.
    * The gate (`size(embedding) = EmbDims`, `len(embedding) = 64` in the
    * oracles) keeps mixed-width corpora deterministic: off-width vectors
    * are out of the universe in both engines. */
  private[graft] val EmbDims = 64

  /** The oracle mirror of the universe gate (NaN > 0 is true but
    * NaN < bound is false in BOTH engines, so NaN/Inf/overflowing/
    * null-element vectors — the kernels fold a null element to NaN —
    * leave the universe identically). */
  private[operators] val SqlNormGate =
    "len(embedding) = 64 AND norm > 0 AND norm < 10000.0"

  /** embeddings + L2 norm (raw float vector — no cast materialization). */
  /** The SIMILARITY universe: embeddings + L2 norm, zero-norm and
    * non-finite/over-bound vectors excluded. A zero vector has no
    * direction — its cosine is 0/0 — and under Spark 4's default ANSI
    * mode ONE such row (a dead crawl page, an all-zero feature dump)
    * aborts every similarity query in the suite mid-corpus
    * (adversarial-embeddings sweep finding); a NaN/Inf/1e38 vector
    * poisons every distance it touches and overflows the exact-decimal
    * oracle arithmetic ([[MaxVecNorm]]). Exclusion at the source is the
    * standard ANN-index rule (FAISS normalizes or rejects), and every
    * oracle's `e` CTE mirrors the [[SqlNormGate]] so the universes stay
    * hash-identical on any corpus. embedding_norms deliberately does NOT
    * use this frame — the norms REPORT must show the degenerate vectors
    * a pipeline needs to find. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("norm", V.l2norm(col("embedding")))
      .filter(size(col("embedding")) === EmbDims &&
        col("norm") > 0 && col("norm") < MaxVecNorm)

  /** Candidate near-dup pairs from capped LSH probe cells — the frame
    * embedding_neardup confirms with exact cosine, exposed so the
    * scale-gate spec (CandidateBoundSpec) can count it at every sf.
    *
    * Symmetric multiprobe: every vector emits, per table, its base cell
    * plus all hamming≤1 flips (17 cells); two vectors share a cell iff
    * their table signatures are within hamming 2. The per-(table, cell)
    * cap is a windowed count over exactly the self-join key, so the window
    * shuffle IS the join shuffle (one exchange, reused by both sides), the
    * frame is narrow (id + cell, embeddings never ride it), and candidate
    * volume is bounded by tables·probes·maxBucket·n/2 — linear in n
    * regardless of corpus degeneracy. */
  def neardupCandidates(spark: SparkSession, dir: String): DataFrame = {
    // cells come from the SAME norm>0 universe the oracles hash (vecs()):
    // a zero-norm vector must not occupy probe cells — it has no cosine to
    // confirm, and its presence would skew the per-(tbl, cell) cap counts
    // away from the oracle's filtered CTE on exactly the corpora
    // (adversarial embeddings) where it appears.
    val cells = vecs(spark, dir)
      .select(col("vec_id"),
        posexplode(LshPlanes.bucketsCol(col("embedding"))).as(Seq("tbl", "bucket")))
      .withColumn("m", explode(typedlit(LshPlanes.probeMasks(1))))
      .select(col("vec_id"), col("tbl"),
        col("bucket").bitwiseXOR(col("m")).as("cell"))
    val capped = cells
      .withColumn("csz", count(lit(1)).over(Window.partitionBy("tbl", "cell")))
      .filter(col("csz") <= LshPlanes.maxBucket)
      .select("vec_id", "tbl", "cell")
    capped.as("x")
      .join(capped.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.cell") === col("y.cell") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
  }

  /** Per-query top-k of a scored frame (`qid`, `vec_id`, `cos`) via the
    * two-phase heap operator ([[graft.plans.TopK]]): map-side k-heaps, a
    * shuffle of at most k rows per (partition, qid), reduce-side merge.
    * The row_number window this replaces shuffles EVERY scored row into
    * per-qid partitions and fully sorts them — at 100 TB that's sorting
    * the corpus per query. `rank` is then assigned over the ≤ k·q
    * survivors, where the window is free. Tiebreak (rounded cos desc,
    * vec_id asc) is identical in both phases and in the SQL oracles. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopK.perKey(
      scored.withColumn("cosr", round(col("cos"), 6)),
      Seq("qid"), Seq(("cosr", "desc"), ("vec_id", "asc")), k)
    val w = Window.partitionBy("qid").orderBy(col("cosr").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("qid", "rank")
  }

  /** DuckDB oracle for ann_lsh_topk, generated from the SAME deterministic
    * plane bank the Spark plan embeds ([[LshPlanes.planes]]) — 256 rows of
    * (table, plane, ±1-weight vector) as a VALUES relation, plus the same
    * hamming≤2 probe-mask list. Both engines compute each plane dot as the
    * identical left-to-right IEEE double fold, so bucket signs, probed
    * cells, candidate sets, and cosines agree exactly, making the whole
    * approximate search hash-checkable. */
  private def lshOracleSql: String = {
    val rows = LshPlanes.sqlValuesRows
    val msb = LshPlanes.planesPerTable - 1
    s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        planes AS (SELECT * FROM (VALUES
          $rows) AS p(tbl, plane, w)),
        dots AS (
          SELECT e.vec_id, p.tbl, p.plane,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(p.w) + 1), i -> e.v[i] * p.w[i])),
                   (a, x) -> a + x) AS dot
          FROM e CROSS JOIN planes p),
        sigs AS (
          SELECT vec_id, tbl,
                 sum(CASE WHEN dot >= 0 THEN 1 << ($msb - plane) ELSE 0 END) AS bucket
          FROM dots GROUP BY vec_id, tbl),
        qprobe AS (
          SELECT vec_id, tbl, xor(bucket, m.m) AS cell
          FROM sigs CROSS JOIN (SELECT unnest(${LshPlanes.sqlProbeMasks(2)}) AS m) m
          WHERE vec_id < 5),
        cand AS (
          SELECT DISTINCT bq.vec_id AS qid, be.vec_id AS vec_id
          FROM sigs be JOIN qprobe bq
            ON be.tbl = bq.tbl AND be.bucket = bq.cell
           AND be.vec_id != bq.vec_id),
        scored AS (
          SELECT c.qid, c.vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(ev.v) + 1), i -> ev.v[i] * eq.v[i])),
                   (a, x) -> a + x) / (ev.norm * eq.norm) AS cos
          FROM cand c
          JOIN e ev ON c.vec_id = ev.vec_id
          JOIN e eq ON c.qid = eq.vec_id),
        ranked AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, round(cos, 4) AS cosine
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank"""
  }

  def queries: Seq[GraftQuery] = Seq(

    // ---- Matryoshka truncation recall curve (round 9) ---------------------
    // The embedding-budget readout: recall@10 of brute-force cosine over
    // the FIRST d dimensions (d ∈ 8/16/32/64) against the full-dimension
    // ground truth — the question an MRL-style index build asks before
    // committing a truncated dimension to a 100 TB vector store. One
    // broadcast-query candidate frame serves all four dims (the dim rides
    // an exploded column, not one join per d); prefixes with zero norm
    // drop from that dim's ranking in BOTH engines; cosines rank on the
    // 6-decimal rounding with vec_id ties, and recall is an exact integer
    // ppm — the whole curve hash-checks. Scale: the exact scorer is the
    // diagnostic over a sampled query set (ann_ivf_topk is the scale
    // path); candidates stay |queries|·n·4.
    GraftQuery(
      "mrl_recall",
      (s, dir) => {
        val e = vecs(s, dir)
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
          .withColumn("dim", explode(typedlit(Seq(8, 16, 32, 64))))
          .withColumn("qs", slice(col("qemb"), lit(1), col("dim")))
          .withColumn("vs", slice(col("embedding"), lit(1), col("dim")))
          .withColumn("qn", V.l2norm(col("qs")))
          .withColumn("vn", V.l2norm(col("vs")))
          .filter(col("qn") > 0 && col("vn") > 0)
          .withColumn("cosr", round(V.dot(col("qs"), col("vs")) / (col("qn") * col("vn")), 6))
        val top = graft.plans.TopK.perKey(scored,
          Seq("dim", "qid"), Seq(("cosr", "desc"), ("vec_id", "asc")), 10)
          .select("dim", "qid", "vec_id")
        // ground-truth membership as WINDOWS over the tiny top-k output
        // (≤ 10·|dims|·|queries| rows) instead of the former
        // truth-filter + left-join + scalar-agg trio, each of which
        // re-derived the whole scored→TopK subtree (3 passes over the
        // candidate scoring — pure plans have no cache, guide §7.2):
        // a (qid, vec_id) pair is a hit at every dim iff its group has a
        // full-dim row, and nq is the distinct-qid count of the full-dim
        // slice — one partitioned window + one single-partition window
        // over rows that number in the hundreds at any corpus scale
        // (bounded by k·dims·queries, never by n). A dim whose top-10
        // shares nothing with the truth still reports recall 0 (hit=0
        // rows survive the groupBy).
        top
          .withColumn("hit", max(when(col("dim") === EmbDims, 1L)
            .otherwise(0L)).over(Window.partitionBy("qid", "vec_id")))
          .withColumn("nq", size(collect_set(
            when(col("dim") === EmbDims, col("qid")))
            .over(Window.partitionBy(lit(1)))).cast("long"))
          .groupBy(col("dim")).agg(sum(col("hit")).as("hits"),
            max(col("nq")).as("n"))
          .select(col("dim"),
            expr("CAST(hits * 1000000 DIV (10 * n) AS BIGINT)").as("recall_ppm"))
          .orderBy("dim")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v
          FROM embeddings
          WHERE len(embedding) = $EmbDims
            AND sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                  (a, b) -> a + b)) > 0
            AND sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                  (a, b) -> a + b)) < $MaxVecNorm),
        dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
        sc AS (
          SELECT dims.dim, q.vec_id AS qid, e.vec_id,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, dims.dim + 1), i -> q.v[i] * q.v[i])),
                   (a, b) -> a + b)) AS qn,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, dims.dim + 1), i -> e.v[i] * e.v[i])),
                   (a, b) -> a + b)) AS vn,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, dims.dim + 1), i -> q.v[i] * e.v[i])),
                   (a, b) -> a + b) AS dot
          FROM e q CROSS JOIN e CROSS JOIN dims
          WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id),
        r AS (
          SELECT dim, qid, vec_id,
                 row_number() OVER (PARTITION BY dim, qid
                   ORDER BY round(dot / (qn * vn), 6) DESC, vec_id) AS rn
          FROM sc WHERE qn > 0 AND vn > 0),
        t AS (SELECT dim, qid, vec_id FROM r WHERE rn <= 10),
        g AS (SELECT qid, vec_id, 1 AS hit FROM t WHERE dim = $EmbDims),
        h AS (SELECT t.dim,
                     CAST(coalesce(sum(coalesce(g.hit, 0)), 0) AS BIGINT) AS hits
              FROM t LEFT JOIN g USING (qid, vec_id) GROUP BY t.dim),
        nq AS (SELECT count(DISTINCT qid) AS n FROM t WHERE dim = $EmbDims)
        SELECT dim, CAST(hits * 1000000 // (10 * n) AS BIGINT) AS recall_ppm
        FROM h CROSS JOIN nq ORDER BY dim""")),

    // ---- L2 norms (exercises the fold in both engines) -------------------
    GraftQuery(
      "embedding_norms",
      // NOT vecs(): the norms report must include zero-norm vectors —
      // it is the query that FINDS them for the vecs() exclusion
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          round(V.l2norm(col("embedding")), 4).as("l2_norm"))
        .orderBy("vec_id"),
      Some("""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings)
        SELECT vec_id, label,
               round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(v, x -> x * x)), (acc, x) -> acc + x)), 4) AS l2_norm
        FROM e
        ORDER BY vec_id""")),

    // ---- brute-force cosine top-k per query vector -----------------------
    GraftQuery(
      "cosine_topk",
      (s, dir) => {
        val e = vecs(s, dir)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
        rankTopK(scored, 10)
      },
      Some("""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        scored AS (
          SELECT qid, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
                   (acc, x) -> acc + x) / (norm * qnorm) AS cos
          FROM e CROSS JOIN q
          WHERE vec_id != qid),
        ranked AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, round(cos, 4) AS cosine
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank""")),

    // ---- binary-quantized top-k: 1-bit codes, Hamming shortlist, rerank --
    // The memory-bound scale path cosine_topk's full-precision scan
    // can't take: each vector collapses to its 64 coordinate SIGN BITS in
    // ONE packed long ([[V.signPack]], codegen'd — 32× smaller than the
    // float vector), the corpus scan computes Hamming distance as
    // `bit_count(code ^ qcode)` (two codegen'd built-ins — the whole
    // shortlist pass never touches a float), and only the
    // [[BqShortlist]]-deep shortlist fetches real embeddings for the
    // exact cosine rerank. At 100 TB the code column is 8 bytes/vector —
    // RAM-resident where the embeddings are not — and the rerank reads
    // O(q·shortlist) vectors instead of O(n·q) floats. The shortlist is
    // broadcast back onto the embeddings scan, so the rerank adds no
    // shuffle either. Both the 1-bit code rule (strictly-positive sign)
    // and the shortlist cap are mirrored into the oracle, making the
    // whole approximate pipeline hash-checkable; recall vs the exact
    // top-k is pinned in OperatorSpec.
    GraftQuery(
      "bq_topk",
      (s, dir) => {
        val e = vecs(s, dir).withColumn("code", V.signPack(col("embedding")))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"), col("code").as("qcode"))
        val ham = e.select(col("vec_id"), col("code"))
          .crossJoin(broadcast(q.select("qid", "qcode")))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("hamming",
            bit_count(col("code").bitwiseXOR(col("qcode"))))
        val shortlist = graft.plans.TopK.perKey(ham, Seq("qid"),
          Seq(("hamming", "asc"), ("vec_id", "asc")), BqShortlist)
        val scored = e.select(col("vec_id"), col("embedding"), col("norm"))
          .join(broadcast(shortlist.select("qid", "vec_id")), "vec_id")
          .join(broadcast(q.select("qid", "qemb", "qnorm")), "qid")
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
        rankTopK(scored, 10)
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        h AS (
          SELECT qid, vec_id,
                 len(list_filter(range(1, len(v) + 1),
                     i -> (v[i] > 0) != (qv[i] > 0))) AS ham
          FROM e CROSS JOIN q WHERE vec_id != qid),
        sl AS (
          SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY ham, vec_id) AS rn
            FROM h) WHERE rn <= $BqShortlist),
        scored AS (
          SELECT sl.qid, sl.vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(e.v) + 1), i -> e.v[i] * q.qv[i])),
                   (acc, x) -> acc + x) / (e.norm * q.qnorm) AS cos
          FROM sl JOIN e ON sl.vec_id = e.vec_id JOIN q ON sl.qid = q.qid),
        ranked AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, round(cos, 4) AS cosine
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank""")),

    // ---- semantic decontamination: eval-vs-corpus embedding overlap ------
    // The embedding-space face of decontaminate/winnow_decontaminate: an
    // eval benchmark leaking into the training corpus is rarely verbatim
    // (n-gram passes catch those) — paraphrases and translations surface
    // only as HIGH COSINE between the eval item and some training item.
    // Eval set = the 64 newest vectors (max vec_id − 63, the delta_dedup
    // bound discipline — data-derived, deterministic at every sf); each
    // reports its nearest training vector and whether it crosses the 0.95
    // contamination threshold (decided on the 6-decimal rounding both
    // engines share, so the boundary cannot flip between them).
    //
    // Scale: eval benchmarks are small by nature — the eval side
    // BROADCASTS and the corpus never shuffles: one scan computing 64
    // codegen'd dots per row, partial max_by per eval id map-side. At
    // 100 TB you'd bolt the IVF/LSH probe stack (ann_* queries) in front
    // to skip most of the scan; the brute-force form here is the exact
    // answer the capped eval size keeps affordable at any corpus width.
    GraftQuery(
      "semantic_decontaminate",
      (s, dir) => {
        val e = vecs(s, dir)
        val bound = e.agg((max(col("vec_id")) - 63).as("t"))
        val keyed = e.crossJoin(broadcast(bound))
        val eval = keyed.filter(col("vec_id") >= col("t"))
          .select(col("vec_id").as("eval_id"),
            col("embedding").as("qemb"), col("norm").as("qnorm"))
        val scored = keyed.filter(col("vec_id") < col("t"))
          .crossJoin(broadcast(eval))
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
        scored.groupBy("eval_id")
          .agg(max_by(
            struct(col("vec_id").as("m"), col("cos").as("c")),
            // argmax on (rounded cosine, then SMALLER vec_id wins ties)
            struct(round(col("cos"), 6).as("r"), (-col("vec_id")).as("nv"))).as("b"))
          .select(col("eval_id"), col("b.m").as("best_match"),
            round(col("b.c"), 4).as("cosine"),
            (round(col("b.c"), 6) >= 0.95).as("contaminated"))
          .orderBy("eval_id")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        b AS (SELECT max(vec_id) - 63 AS t FROM e),
        q AS (SELECT vec_id eval_id, v qv, norm qnorm FROM e, b WHERE vec_id >= t),
        c AS (SELECT vec_id, v, norm FROM e, b WHERE vec_id < t),
        scored AS (
          SELECT eval_id, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
                   (acc, x) -> acc + x) / (norm * qnorm) AS cos
          FROM c CROSS JOIN q),
        ranked AS (
          SELECT eval_id, vec_id, cos,
                 row_number() OVER (PARTITION BY eval_id
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rk
          FROM scored)
        SELECT eval_id, vec_id AS best_match, round(cos, 4) AS cosine,
               round(cos, 6) >= 0.95 AS contaminated
        FROM ranked
        WHERE rk = 1
        ORDER BY eval_id""")),

    // ---- LSH-bucketed ANN (random-hyperplane signs, multi-table) ---------
    // Plane matrix is a deterministic literal (LshPlanes, 16 planes/table ⇒
    // 2^16 cells); signatures are codegen'd dot products. The corpus side
    // emits its base cell per table and NEVER shuffles — it joins in place
    // against the broadcast query probes, which expand each query signature
    // to every cell within hamming≤2 (137 masks × 16 tables). Each query
    // therefore touches ~Σ|probed cells| ≈ 3-5% of the corpus instead of
    // the 1/32 per table the 5-plane bank probed, and a hot cell's blast
    // radius is bounded by the map-side top-k heaps that consume the
    // candidates — no cap needed on this read-only path. Fully
    // oracle-checked (lshOracleSql mirrors the plane bank and mask list);
    // recall asserted in OperatorSpec at the design point (planted
    // near-dups) and as a floor on the uniform testdata.
    GraftQuery(
      "ann_lsh_topk",
      (s, dir) => {
        val e = vecs(s, dir)
          .select(col("vec_id"), col("embedding"), col("norm"),
            posexplode(LshPlanes.bucketsCol(col("embedding"))).as(Seq("table", "bucket")))
        val q = e.filter(col("vec_id") < 5)
          .withColumn("m", explode(typedlit(LshPlanes.probeMasks(2))))
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"), col("table").as("qtable"),
            col("bucket").bitwiseXOR(col("m")).as("qcell"))
        val cand = e.join(broadcast(q),
            col("table") === col("qtable") && col("bucket") === col("qcell") &&
            col("vec_id") =!= col("qid"))
          .select("qid", "qemb", "qnorm", "vec_id", "embedding", "norm")
          .dropDuplicates("qid", "vec_id")
        val scored = cand.withColumn("cos",
          V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
        rankTopK(scored, 10)
      },
      Some(lshOracleSql)),

    // ---- probe-radius recall curve (the ANN tuning readout) --------------
    // The similarity-stack analog of dedup_threshold_curve: recall@10 and
    // candidate volume at probe radius 0/1/2, read BEFORE committing a
    // multiprobe setting to a 100 TB index build — radius buys recall
    // with candidate volume, and this is the exchange rate on YOUR data.
    // One candidate join serves every radius: each probe mask carries its
    // Hamming weight, each (query, candidate) pair keeps the MINIMUM mask
    // weight that finds it, and the curve is a cumulative rollup over
    // that ≤3-value key — never one join per radius. Ground truth is the
    // exact brute-force top-10 (broadcast query side, codegen'd dots),
    // recall is integer ppm, so the whole diagnostic hash-checks.
    GraftQuery(
      "ann_probe_curve",
      (s, dir) => {
        val e = vecs(s, dir)
        val buckets = e.select(col("vec_id"),
          posexplode(LshPlanes.bucketsCol(col("embedding"))).as(Seq("table", "bucket")))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"))
        val qprobe = buckets.filter(col("vec_id") < 5)
          .withColumn("m", explode(typedlit(LshPlanes.probeMasks(2))))
          .select(col("vec_id").as("qid"), col("table").as("qtable"),
            col("bucket").bitwiseXOR(col("m")).as("qcell"),
            expr("bit_count(m)").as("w"))
        val minw = buckets.join(broadcast(qprobe),
            col("table") === col("qtable") && col("bucket") === col("qcell") &&
            col("vec_id") =!= col("qid"))
          .groupBy("qid", "vec_id").agg(min("w").as("minw"))
        val scoredAll = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
          .select(col("qid"), col("vec_id"), round(col("cos"), 6).as("cosr"))
        val truth = graft.plans.TopK.perKey(scoredAll, Seq("qid"),
          Seq(("cosr", "desc"), ("vec_id", "asc")), 10)
          .select(col("qid"), col("vec_id"), lit(1L).as("_t"))
        val nt = truth.agg(count(lit(1)).as("nt"))
        val perw = minw.join(truth, Seq("qid", "vec_id"), "left")
          .groupBy("minw")
          .agg(count(lit(1)).as("c"), sum(coalesce(col("_t"), lit(0L))).as("h"))
        s.range(3).toDF("radius")
          .join(broadcast(perw), col("minw") <= col("radius"), "left")
          .groupBy("radius")
          .agg(coalesce(sum("c"), lit(0L)).as("n_candidates"),
            coalesce(sum("h"), lit(0L)).as("n_hits"))
          .crossJoin(broadcast(nt))
          .select(col("radius"), col("n_candidates"), col("n_hits"),
            expr("CAST(n_hits * 1000000 DIV nt AS BIGINT)").as("recall_ppm"))
          .orderBy("radius")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        planes AS (SELECT * FROM (VALUES
          ${LshPlanes.sqlValuesRows}) AS p(tbl, plane, w)),
        dots AS (
          SELECT e.vec_id, p.tbl, p.plane,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(p.w) + 1), i -> e.v[i] * p.w[i])),
                   (a, x) -> a + x) AS dot
          FROM e CROSS JOIN planes p),
        sigs AS (
          SELECT vec_id, tbl,
                 sum(CASE WHEN dot >= 0 THEN 1 << (${LshPlanes.planesPerTable - 1} - plane) ELSE 0 END) AS bucket
          FROM dots GROUP BY vec_id, tbl),
        qprobe AS (
          SELECT vec_id AS qid, tbl, xor(bucket, m.m) AS cell,
                 bit_count(m.m) AS w
          FROM sigs CROSS JOIN (SELECT unnest(${LshPlanes.sqlProbeMasks(2)}) AS m) m
          WHERE vec_id < 5),
        minw AS (
          SELECT bq.qid, be.vec_id, min(bq.w) AS minw
          FROM sigs be JOIN qprobe bq
            ON be.tbl = bq.tbl AND be.bucket = bq.cell AND be.vec_id != bq.qid
          GROUP BY 1, 2),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        scored AS (
          SELECT q.qid, e.vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(e.v) + 1), i -> e.v[i] * q.qv[i])),
                   (a, x) -> a + x) / (e.norm * q.qnorm) AS cos
          FROM e CROSS JOIN q
          WHERE e.vec_id != q.qid),
        truth AS (
          SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY round(cos, 6) DESC, vec_id) AS rk
            FROM scored)
          WHERE rk <= 10),
        nt AS (SELECT count(*) AS n FROM truth),
        perw AS (
          SELECT m.minw, count(*) AS c,
                 sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS h
          FROM minw m LEFT JOIN truth t
            ON m.qid = t.qid AND m.vec_id = t.vec_id
          GROUP BY 1),
        curve AS (
          SELECT r.radius, coalesce(sum(c), 0) AS n_candidates,
                 coalesce(sum(h), 0) AS n_hits
          FROM range(3) r(radius) LEFT JOIN perw ON perw.minw <= r.radius
          GROUP BY 1)
        SELECT radius, CAST(n_candidates AS BIGINT) AS n_candidates,
               CAST(n_hits AS BIGINT) AS n_hits,
               CAST(n_hits * 1000000 // n AS BIGINT) AS recall_ppm
        FROM curve, nt
        ORDER BY radius""")),

    // ---- IVF-style ANN: coarse quantizer = per-label centroids -----------
    // The inverted-file pattern: partition vectors by nearest coarse
    // centroid (here the label's mean vector — the testdata's built-in
    // clustering), probe only the nProbe closest cells per query. At
    // 100 TB the cell assignment is a partition key: each query touches
    // nProbe/nCells of the data. Fully deterministic (centroids are exact
    // decimal means, dots are left folds), so the ENTIRE approximate
    // search — cell assignment, probing, ranking — is oracle-checked;
    // recall vs cosine_topk additionally asserted in OperatorSpec.
    GraftQuery(
      "ann_ivf_topk",
      (s, dir) => {
        val e = vecs(s, dir)
        // exact decimal centroid per label, rebuilt as array<double> —
        // built from the GATED universe: a corrupt (NaN/1e38) vector in a
        // cell's mean poisons the whole cell's centroid
        val cents = e
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("label", "dim")
          .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(18, 8)))
            .cast(org.apache.spark.sql.types.DoubleType) / count(lit(1))).as("m"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
          .select(col("label").as("c_label"),
            expr("transform(dm, p -> p.m)").as("centroid"))
        // nProbe=4 nearest cells per query vector
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"))
        val qCells = q.crossJoin(broadcast(cents))
          .withColumn("cdist", V.dot(col("qemb"), col("centroid")) /
            (col("qnorm") * greatest(V.l2norm(col("centroid")), lit(1e-12))))
          .withColumn("crank", row_number().over(
            Window.partitionBy("qid").orderBy(round(col("cdist"), 6).desc, col("c_label"))))
          .filter(col("crank") <= 4)
          .select(col("qid"), col("qemb"), col("qnorm"), col("c_label"))
        // probe only vectors in the chosen cells
        val scored = e.join(broadcast(qCells),
            col("label") === col("c_label") && col("vec_id") =!= col("qid"))
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
        rankTopK(scored, 10)
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        cents AS (
          SELECT label AS c_label, list(m ORDER BY dim) AS centroid
          FROM (SELECT label, dim,
                       CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS m
                FROM (SELECT label, unnest(v) x,
                             generate_subscripts(v, 1) dim
                      FROM e)
                GROUP BY label, dim)
          GROUP BY label),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        qcells AS (
          SELECT qid, qv, qnorm, c_label FROM (
            SELECT q.qid, q.qv, q.qnorm, c.c_label,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     round(
                       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(range(1, len(q.qv) + 1),
                           i -> q.qv[i] * c.centroid[i])), (acc, x) -> acc + x)
                       / (q.qnorm * greatest(
                           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                             list_transform(c.centroid, x -> x * x)),
                             (acc, x) -> acc + x)), 1e-12)),
                       6) DESC, c.c_label) AS crank
            FROM q CROSS JOIN cents c)
          WHERE crank <= 4),
        scored AS (
          SELECT qc.qid, e.vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(e.v) + 1),
                     i -> e.v[i] * qc.qv[i])), (acc, x) -> acc + x)
                 / (e.norm * qc.qnorm) AS cos
          FROM e JOIN qcells qc ON e.label = qc.c_label AND e.vec_id != qc.qid),
        ranked AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, round(cos, 4) AS cosine
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank""")),

    // ---- kNN classification: majority label of the cosine top-k ----------
    // The end-use the similarity stack exists for: label a query vector by
    // the majority label among its k nearest neighbors. Composes the
    // brute-force scorer (broadcast query side, scan-side codegen'd dot)
    // with TopKPerKey — the per-query vote table is ≤ k rows per query, so
    // the vote/argmax stages cost nothing at any corpus scale. Tiebreak on
    // (votes desc, label asc) in both engines.
    GraftQuery(
      "knn_classify",
      (s, dir) => {
        val e = vecs(s, dir)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"), col("label").as("true_label"))
        val scored = e.crossJoin(broadcast(q.drop("true_label")))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
          .withColumn("cosr", round(col("cos"), 6))
        val top = graft.plans.TopK.perKey(
          scored.select("qid", "vec_id", "label", "cosr"),
          Seq("qid"), Seq(("cosr", "desc"), ("vec_id", "asc")), 10)
        val votes = top.groupBy("qid", "label")
          .agg(count(lit(1)).as("votes"))
        graft.plans.TopK.perKey(votes, Seq("qid"),
            Seq(("votes", "desc"), ("label", "asc")), 1)
          .join(broadcast(q.select("qid", "true_label")), "qid")
          .select(col("qid"), col("label").as("pred_label"), col("votes"),
            col("true_label"))
          .orderBy("qid")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        q AS (SELECT vec_id qid, v qv, norm qnorm, label qlabel
              FROM e WHERE vec_id < 5),
        scored AS (
          SELECT qid, vec_id, label,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
                   (acc, x) -> acc + x) / (norm * qnorm) AS cos
          FROM e CROSS JOIN q
          WHERE vec_id != qid),
        ranked AS (
          SELECT qid, label,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored),
        votes AS (SELECT qid, label, count(*) votes
                  FROM ranked WHERE rank <= 10 GROUP BY 1, 2),
        best AS (SELECT qid, label, votes,
                        row_number() OVER (PARTITION BY qid
                                           ORDER BY votes DESC, label) rn
                 FROM votes)
        SELECT b.qid AS qid, b.label AS pred_label,
               CAST(b.votes AS BIGINT) AS votes, q.qlabel AS true_label
        FROM best b JOIN q ON b.qid = q.qid
        WHERE rn = 1
        ORDER BY qid""")),

    // ---- embedding-cosine near-dup pairs (LSH-bucketed, not all-pairs) ---
    // The dedup-by-embedding shape for a training-data pipeline: candidate
    // pairs come ONLY from shared capped LSH probe cells (see
    // neardupCandidates — 2^16 cells/table, hamming≤1 symmetric multiprobe,
    // maxBucket hot-cell cap), then exact cosine confirms. At the near-dup
    // design point (τ ≥ 0.9) the probe recall is ~100% across 16 tables
    // (planted-duplicate test in OperatorSpec); on this uniform synthetic
    // data (max pairwise cos ≈ 0.6, threshold lowered to 0.42 so the
    // result is non-degenerate) recall is ~45% — uniform data at low τ is
    // the no-free-lunch regime for any sublinear ANN, and the wide-bucket
    // operating point is the one that survives 10^9 rows. Fully
    // oracle-checked: same plane bank, same probe masks, same cap, same
    // IEEE cosine fold in DuckDB.
    GraftQuery(
      "embedding_neardup",
      (s, dir) => {
        val e = vecs(s, dir)
        neardupCandidates(s, dir)
          .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
            col("norm").as("na")), "vec_a")
          .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
            col("norm").as("nb")), "vec_b")
          .withColumn("cos", V.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
          .filter(col("cos") >= 0.42)
          .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        planes AS (SELECT * FROM (VALUES
          ${LshPlanes.sqlValuesRows}) AS p(tbl, plane, w)),
        dots AS (
          SELECT e.vec_id, p.tbl, p.plane,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(p.w) + 1), i -> e.v[i] * p.w[i])),
                   (a, x) -> a + x) AS dot
          FROM e CROSS JOIN planes p),
        sigs AS (
          SELECT vec_id, tbl,
                 sum(CASE WHEN dot >= 0 THEN 1 << (${LshPlanes.planesPerTable - 1} - plane) ELSE 0 END) AS bucket
          FROM dots GROUP BY vec_id, tbl),
        cells AS (
          SELECT vec_id, tbl, xor(bucket, m.m) AS cell
          FROM sigs CROSS JOIN (SELECT unnest(${LshPlanes.sqlProbeMasks(1)}) AS m) m),
        capped AS (
          SELECT vec_id, tbl, cell FROM (
            SELECT vec_id, tbl, cell,
                   count(*) OVER (PARTITION BY tbl, cell) AS csz
            FROM cells)
          WHERE csz <= ${LshPlanes.maxBucket}),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM capped a JOIN capped b
            ON a.tbl = b.tbl AND a.cell = b.cell AND a.vec_id < b.vec_id),
        scored AS (
          SELECT c.vec_a, c.vec_b,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(ea.v) + 1), i -> ea.v[i] * eb.v[i])),
                   (a, x) -> a + x) / (ea.norm * eb.norm) AS cos
          FROM cand c
          JOIN e ea ON c.vec_a = ea.vec_id
          JOIN e eb ON c.vec_b = eb.vec_id)
        SELECT vec_a, vec_b, round(cos, 4) AS cosine
        FROM scored
        WHERE cos >= 0.42
        ORDER BY vec_a, vec_b""")),

    // ---- hard-negative mining (contrastive curation) ---------------------
    // The training-pair miner for embedding/retrieval models: for each
    // anchor, the HARDEST negative = the highest-cosine neighbor carrying a
    // DIFFERENT label — close enough to confuse the model, labeled apart.
    // Mining against the full corpus is O(n²); the production shape probes
    // only the LSH candidate cells (the exact frame [[neardupCandidates]]
    // already bounds to O(n·tables·probes·cap)), so the miner inherits the
    // near-dup stack's scale guarantees and its oracle-mirrored bank.
    // Candidates symmetrize (each pair is a candidate for both anchors),
    // per-anchor argmax rides TopKPerKey k=1 (map-side heaps — no full
    // per-anchor sort), tiebreak (rounded cos desc, vec_id asc) identical
    // in both engines. Anchors with no different-label candidate in any
    // shared cell emit nothing — both engines agree by construction.
    GraftQuery(
      "hard_negatives",
      (s, dir) => {
        val e = vecs(s, dir)
        val cand = neardupCandidates(s, dir)
        // symmetrize by exploding both directions out of ONE pass — a
        // unionAll of two selects would re-derive the whole LSH candidate
        // chain twice (plans have no cache; the dup_pagerank lesson)
        val sym = cand.select(explode(array(
            struct(col("vec_a").as("qid"), col("vec_b").as("vid")),
            struct(col("vec_b").as("qid"), col("vec_a").as("vid")))).as("p"))
          .select(col("p.qid").as("qid"), col("p.vid").as("vid"))
        val scored = sym
          .join(e.select(col("vec_id").as("qid"), col("label").as("qlabel"),
            col("embedding").as("qe"), col("norm").as("qn")), "qid")
          .join(e.select(col("vec_id").as("vid"), col("label").as("nlabel"),
            col("embedding").as("ne"), col("norm").as("nn")), "vid")
          .filter(col("qlabel") =!= col("nlabel"))
          .withColumn("cos", V.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
          .select(col("qid"), col("qlabel"), col("vid"), col("nlabel"),
            round(col("cos"), 6).as("cosr"), col("cos"))
        graft.plans.TopK.perKey(
          scored, Seq("qid"), Seq(("cosr", "desc"), ("vid", "asc")), 1)
          .select(col("qid").as("vec_id"), col("qlabel").as("label"),
            col("vid").as("neg_id"), col("nlabel").as("neg_label"),
            round(col("cos"), 4).as("cosine"))
          .orderBy("vec_id")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        planes AS (SELECT * FROM (VALUES
          ${LshPlanes.sqlValuesRows}) AS p(tbl, plane, w)),
        dots AS (
          SELECT e.vec_id, p.tbl, p.plane,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(p.w) + 1), i -> e.v[i] * p.w[i])),
                   (a, x) -> a + x) AS dot
          FROM e CROSS JOIN planes p),
        sigs AS (
          SELECT vec_id, tbl,
                 sum(CASE WHEN dot >= 0 THEN 1 << (${LshPlanes.planesPerTable - 1} - plane) ELSE 0 END) AS bucket
          FROM dots GROUP BY vec_id, tbl),
        cells AS (
          SELECT vec_id, tbl, xor(bucket, m.m) AS cell
          FROM sigs CROSS JOIN (SELECT unnest(${LshPlanes.sqlProbeMasks(1)}) AS m) m),
        capped AS (
          SELECT vec_id, tbl, cell FROM (
            SELECT vec_id, tbl, cell,
                   count(*) OVER (PARTITION BY tbl, cell) AS csz
            FROM cells)
          WHERE csz <= ${LshPlanes.maxBucket}),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM capped a JOIN capped b
            ON a.tbl = b.tbl AND a.cell = b.cell AND a.vec_id < b.vec_id),
        sym AS (
          SELECT vec_a AS qid, vec_b AS vid FROM cand
          UNION ALL
          SELECT vec_b AS qid, vec_a AS vid FROM cand),
        scored AS (
          SELECT s.qid, eq.label AS qlabel, s.vid, ev.label AS nlabel,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(eq.v) + 1), i -> eq.v[i] * ev.v[i])),
                   (a, x) -> a + x) / (eq.norm * ev.norm) AS cos
          FROM sym s
          JOIN e eq ON s.qid = eq.vec_id
          JOIN e ev ON s.vid = ev.vec_id
          WHERE eq.label != ev.label),
        ranked AS (
          SELECT qid, qlabel, vid, nlabel, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vid) AS rnk
          FROM scored)
        SELECT qid AS vec_id, qlabel AS label, vid AS neg_id,
               nlabel AS neg_label, round(cos, 4) AS cosine
        FROM ranked
        WHERE rnk = 1
        ORDER BY vec_id""")),

    // ---- per-label centroids (long format: label × dimension) ------------
    // Universe-gated like every centroid in the suite: one corrupt
    // (NaN/Inf/1e38) vector otherwise poisons its label's mean — and
    // overflows the exact DECIMAL(18,8) sum the hash-check relies on.
    GraftQuery(
      "label_centroids",
      (s, dir) => vecs(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .filter(col("dim") < 8)
        .groupBy("label", "dim")
        .agg(round(
          sum(col("x").cast(org.apache.spark.sql.types.DecimalType(18, 8)))
            .cast(org.apache.spark.sql.types.DoubleType) / count(lit(1)),
          6).as("mean"))
        .orderBy("label", "dim"),
      Some("""
        WITH e AS (
          SELECT label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0)
        SELECT label, dim - 1 AS dim,
               round(CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS mean
        FROM (SELECT label, unnest(v) x,
                     generate_subscripts(v, 1) dim
              FROM e)
        WHERE dim - 1 < 8
        GROUP BY label, dim
        ORDER BY label, dim""")),

    // ---- prototypicality ranking (D4-style diversity curation) -----------
    // After SemDeDup removes near-duplicates, the D4 recipe ranks each
    // cluster's members by distance to their cluster centroid and drops
    // the most PROTOTYPICAL ones (cluster-center redundancy) while
    // keeping the diverse tail. Clusters here are the label cells the
    // SemDeDup/IVF stack already uses; distance is exact: each squared
    // per-dim deviation is quantized to an integer pico-unit, so the
    // per-vector distance is an order-independent BIGINT sum and the
    // per-cell decile assignment is pure integer arithmetic.
    //
    // Scale: the centroid frame is |labels|×dims rows (broadcast); the
    // deviation join is scan-side; the per-cell rank is the two-phase
    // bucket + broadcast-offset rank (cells are few relative to corpus —
    // a per-cell window would funnel each cell through one task).
    GraftQuery(
      "prototypicality",
      (s, dir) => {
        // fully integer after the first quantization: coordinates to
        // exact micro-units, centroid as the half-up INTEGER micro-mean
        // (the davg discipline), distance as an exact integer sum of
        // squared micro deviations. The earlier double formulation
        // (round((x−mean)²·1e12)) diverged on the adversarial corpus —
        // Spark's BigDecimal-exact round and DuckDB's multiply-based
        // round produce different doubles on some inputs; no float
        // survives past x6 here, so nothing is left to diverge.
        // universe-gated (vecs): a 1e38 coordinate would overflow the
        // BIGINT micro-quantization outright, and a NaN/Inf one aborts
        // the ANSI cast mid-corpus
        val dims = vecs(s, dir)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          // CAST to DOUBLE before the multiply: float·int stays FLOAT
          // under both engines' promotion rules, and the float product
          // rounds differently engine-to-engine (adversarial sweep)
          .withColumn("x6",
            expr("CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"))
        val cent = dims.groupBy("label", "dim")
          .agg(sum("x6").as("s6"), count(lit(1)).as("n"))
          .withColumn("m6", expr(
            """CASE WHEN s6 >= 0 THEN (2 * s6 + n) DIV (2 * n)
                    ELSE -((2 * (-s6) + n) DIV (2 * n)) END"""))
          .select("label", "dim", "m6")
        val dist = dims.join(broadcast(cent), Seq("label", "dim"))
          .groupBy("vec_id", "label")
          .agg(sum(expr(
            "CAST(x6 - m6 AS DECIMAL(38,0)) * (x6 - m6)")).as("dd"))
          .withColumn("dist_q", expr("CAST(dd AS BIGINT)")).drop("dd")
        // n_cell rides the rank's own bounds broadcast (twoPhaseRank
        // countCol): the former sizes branch re-derived the whole
        // explode→join→agg chain a second time just to count rows per
        // label (pure plans have no cache; guide §7.2 duplicated
        // subtrees).
        PipelineOps.twoPhaseRank(dist,
            Seq("label"), "dist_q", Seq("vec_id"), "cell_rank",
            countCol = Some("n_cell"))
          .withColumn("decile",
            expr("CAST((10 * (cell_rank - 1)) DIV n_cell AS INT)"))
          .withColumn("drop_prototypical", col("decile") === 0)
          .select("vec_id", "label", "dist_q", "cell_rank", "decile",
            "drop_prototypical")
          .orderBy("vec_id")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        dims AS (
          SELECT vec_id, label, generate_subscripts(v, 1) AS dim,
                 CAST(round(unnest(v) * 1000000) AS BIGINT) AS x6
          FROM e),
        c AS (
          SELECT label, dim,
                 CASE WHEN sum(x6) >= 0
                      THEN (2 * sum(x6) + count(*)) // (2 * count(*))
                      ELSE -((2 * (-sum(x6)) + count(*)) // (2 * count(*)))
                 END AS m6
          FROM dims GROUP BY 1, 2),
        d AS (
          SELECT dims.vec_id, dims.label,
                 CAST(sum(CAST(dims.x6 - c.m6 AS HUGEINT)
                          * (dims.x6 - c.m6)) AS BIGINT) AS dist_q
          FROM dims JOIN c ON dims.label = c.label AND dims.dim = c.dim
          GROUP BY 1, 2),
        r AS (
          SELECT vec_id, label, dist_q,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY dist_q, vec_id) AS rnk,
                 count(*) OVER (PARTITION BY label) AS n
          FROM d)
        SELECT vec_id, label, dist_q, CAST(rnk AS BIGINT) AS cell_rank,
               CAST((10 * (rnk - 1)) // n AS INT) AS decile,
               (10 * (rnk - 1)) // n = 0 AS drop_prototypical
        FROM r
        ORDER BY vec_id""")),

    // ---- semantic dedup (SemDeDup): within-cell cosine, keep min-id ------
    // The embedding-space analog of dedup_keep_list: vectors land in a
    // coarse-quantizer cell, pairwise cosine runs ONLY within a cell, and
    // a vector is dropped in favor of its lowest-id cell-mate above the
    // threshold. Cells here are the testdata's label clustering (same
    // stand-in ann_ivf_topk uses); at 100 TB the cell key is a k-means
    // assignment with k ∝ n, which is exactly what bounds within-cell
    // pair volume — SemDeDup's quadratic term is quadratic only in CELL
    // size, which the clustering granularity pins. The explicit CellCap
    // backstops that promise structurally (an over-full cell is skipped,
    // signalling "re-cluster finer", never silently going quadratic), and
    // is mirrored into the oracle like every other cap in the engine.
    // τ = 0.30 sits at the synthetic corpus' within-cell 99th percentile
    // so the verdict is non-degenerate at every sf (production τ ≈ 0.95+).
    GraftQuery(
      "semantic_dedup",
      (s, dir) => {
        val reps = semanticPairs(s, dir)
          .filter(col("cos") >= SemDedupTau)
          .groupBy(col("vec_id"))
          .agg(min(col("mate_id")).as("rep_id"))
        // an over-cap cell is SKIPPED, not deduped — surface that as a
        // column so "kept because unique" and "kept because the cell was
        // too hot to compare" are distinguishable (the skipped set is
        // what a finer re-clustering pass consumes)
        Tables.embeddings(s, dir)
          .withColumn("cell_capped",
            count(lit(1)).over(Window.partitionBy("label")) > SemCellCap)
          .select("vec_id", "cell_capped")
          .join(reps, Seq("vec_id"), "left")
          .select(col("vec_id"), col("rep_id").isNull.as("kept"), col("rep_id"),
            col("cell_capped"))
          .orderBy("vec_id")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        c AS (
          SELECT vec_id, label, v, norm FROM (
            SELECT e.*, count(*) OVER (PARTITION BY label) csz FROM e)
          WHERE csz <= $SemCellCap),
        reps AS (
          SELECT a.vec_id AS vec_id, min(b.vec_id) AS rep_id
          FROM c a JOIN c b ON a.label = b.label AND b.vec_id < a.vec_id
          WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
                  (acc, x) -> acc + x) / (a.norm * b.norm) >= $SemDedupTau
          GROUP BY a.vec_id)
        SELECT s.vec_id, r.rep_id IS NULL AS kept, r.rep_id,
               s.csz > $SemCellCap AS cell_capped
        -- the report covers EVERY vector (zero-norm ones can't be
        -- semantically deduped — no direction — so they report kept),
        -- and its cell sizes count all rows, mirroring the Spark side's
        -- Tables.embeddings report frame; only the PAIRING universe
        -- above (c) rides the norm-filtered e
        FROM (SELECT vec_id, count(*) OVER (PARTITION BY label) csz
              FROM embeddings) s
        LEFT JOIN reps r ON s.vec_id = r.vec_id
        ORDER BY s.vec_id""")),

    // ---- truncated-dimension retrieval (Matryoshka-style) ----------------
    // The cheap-first-pass regime for nested (MRL-trained) embeddings:
    // rank by cosine over only the FIRST MrlDims dimensions — at 100 TB
    // this reads a quarter of the vector bytes and does a quarter of the
    // multiply-adds per candidate, and the standard deployment re-ranks
    // its top candidates with the full vector afterwards (cosine_topk is
    // exactly that second stage, so the two queries compose). Slices are
    // array_slice/list_slice in both engines over the same float→double
    // values; ranking reuses the TopKPerKey heap path. Recall vs the
    // full-dimension ranking is measured in OperatorSpec — on these
    // synthetic uniform vectors the first 16 dims carry no privileged
    // information (the untrained-MRL floor), which is exactly why the
    // re-rank stage exists.
    GraftQuery(
      "mrl_topk",
      (s, dir) => {
        // width gate BEFORE slicing (the universe contract): a 32-dim
        // hostile vector still yields a full 16-dim slice with a finite
        // truncated norm, so without the size() gate it would enter this
        // universe while the oracle's len(embedding) = 64 excludes it —
        // the one slice-first query the fc616ee gate pass missed
        // (caught by the full-registry adv_emb sweep)
        val e = Tables.embeddings(s, dir)
          .filter(size(col("embedding")) === EmbDims)
          .withColumn("tv", expr(s"slice(embedding, 1, $MrlDims)"))
          .select(col("vec_id"), col("tv"), V.l2norm(col("tv")).as("tnorm"))
          .filter(col("tnorm") > 0 && col("tnorm") < MaxVecNorm)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("tv").as("qv"), col("tnorm").as("qnorm"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos", V.dot(col("tv"), col("qv")) / (col("tnorm") * col("qnorm")))
        rankTopK(scored, 10)
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id,
                 list_slice(CAST(embedding AS DOUBLE[]), 1, $MrlDims) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(list_slice(CAST(embedding AS DOUBLE[]), 1, $MrlDims),
                     x -> x * x)), (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        f AS (SELECT * FROM e WHERE norm > 0 AND norm < 10000.0),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM f WHERE vec_id < 5),
        scored AS (
          SELECT qid, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
                   (acc, x) -> acc + x) / (norm * qnorm) AS cos
          FROM f CROSS JOIN q
          WHERE vec_id != qid),
        ranked AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, round(cos, 4) AS cosine
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank""")),

    // ---- product-quantization ANN (ADC scan over PQ codes) ---------------
    // The memory-bound ANN regime: each vector is stored as M=8 one-byte
    // codes (its nearest codeword per 8-dim subspace), and queries rank by
    // Asymmetric Distance Computation — Σ_m dtable[m][code_m], where the
    // per-query dtable holds exact query↔codeword subspace distances. At
    // 100 TB the corpus never touches its floats after encoding: the scan
    // reads 8 bytes/vector instead of 256, the dtable (M·K doubles per
    // query) broadcasts, and the ADC sum is a partial-aggregated join on
    // (m, code). Codebook = the subspace slices of the first K=16 vectors
    // (deterministic sample in lieu of k-means — structure over training
    // quality, same stance as the LSH plane bank). Determinism: subspace
    // distances are the identical fixed-order IEEE fold in both engines
    // (SubSqDist kernel vs DOUBLE[] slices), argmin ties break on codeword
    // id, and the ADC sum rounds each term to 6 decimals into an exact
    // DECIMAL sum — combine-order-independent, so the whole approximate
    // search is hash-checked end to end.
    GraftQuery(
      "pq_topk",
      (s, dir) => {
        val dist = pqDistances(s, dir)
        val codes = dist.groupBy("vec_id", "m")
          .agg(min(struct(col("d"), col("cw"))).as("best"))
          .select(col("vec_id"), col("m"), col("best.cw").as("code"))
        val dt = dist.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("m").as("qm"),
            col("cw").as("qcw"), col("d").as("dq"))
        val scored = codes
          .join(broadcast(dt), col("m") === col("qm") && col("code") === col("qcw"))
          .filter(col("vec_id") =!= col("qid"))
          .groupBy("qid", "vec_id")
          .agg(sum(expr("CAST(round(dq, 6) AS DECIMAL(18,6))")).as("adist"))
        val top = graft.plans.TopK.perKey(scored, Seq("qid"),
          Seq(("adist", "asc"), ("vec_id", "asc")), 10)
        val w = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
        top.withColumn("rank", row_number().over(w))
          .select(col("qid"), col("rank"), col("vec_id"),
            col("adist").cast(org.apache.spark.sql.types.DoubleType).as("adist"))
          .orderBy("qid", "rank")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
                   WHERE len(embedding) = 64),
        cb AS (SELECT CAST(vec_id AS INT) cw, v cv FROM e WHERE vec_id < $PqCodebook),
        ms AS (SELECT unnest(range(0, $PqSubspaces)) m),
        dist AS (
          SELECT e.vec_id, ms.m, cb.cw,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, ${PqSubDim + 1}),
                     i -> (e.v[ms.m * $PqSubDim + i] - cb.cv[ms.m * $PqSubDim + i])
                        * (e.v[ms.m * $PqSubDim + i] - cb.cv[ms.m * $PqSubDim + i]))),
                   (acc, x) -> acc + x) AS d
          FROM e CROSS JOIN ms CROSS JOIN cb),
        codes AS (
          SELECT vec_id, m, cw AS code FROM (
            SELECT vec_id, m, cw,
                   row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cw) rn
            FROM dist)
          WHERE rn = 1),
        dt AS (SELECT vec_id qid, m, cw, d dq FROM dist WHERE vec_id < 5),
        scored AS (
          SELECT dt.qid, c.vec_id,
                 sum(CAST(round(dt.dq, 6) AS DECIMAL(18,6))) AS adist
          FROM codes c JOIN dt ON c.m = dt.m AND c.code = dt.cw
          WHERE c.vec_id != dt.qid
          GROUP BY 1, 2),
        ranked AS (
          SELECT qid, vec_id, adist,
                 row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, CAST(adist AS DOUBLE) AS adist
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank""")),

    // ---- IVF-PQ: coarse cells + ADC codes, the production ANN shape ------
    // The composition every large-scale vector index ships: the coarse
    // quantizer (ann_ivf's per-label centroids) restricts each query to
    // nProbe cells, and within the probed cells ranking is pq_topk's
    // asymmetric distance over 8-byte codes — so a query touches
    // nProbe/nCells of the corpus AND never reads a float from it. Join
    // order matters at scale: codes filter against the broadcast probed
    // (qid, cell) pairs FIRST, then the broadcast distance tables — the
    // ADC expansion only ever happens on probed-cell rows. Same exact-
    // decimal ADC sums, so the full composition is hash-checked.
    GraftQuery(
      "ivfpq_topk",
      (s, dir) => {
        val e = vecs(s, dir)
        // gated centroids — the ann_ivf_topk rationale
        val cents = e
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("label", "dim")
          .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(18, 8)))
            .cast(org.apache.spark.sql.types.DoubleType) / count(lit(1))).as("m"))
          .groupBy("label")
          .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
          .select(col("label").as("c_label"),
            expr("transform(dm, p -> p.m)").as("centroid"))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"))
        val probes = q.crossJoin(broadcast(cents))
          .withColumn("cdist", V.dot(col("qemb"), col("centroid")) /
            (col("qnorm") * greatest(V.l2norm(col("centroid")), lit(1e-12))))
          .withColumn("crank", row_number().over(
            Window.partitionBy("qid").orderBy(round(col("cdist"), 6).desc, col("c_label"))))
          .filter(col("crank") <= 4)
          .select(col("qid"), col("c_label"))
        val dist = pqDistances(s, dir)
        val codes = dist.groupBy("vec_id", "label", "m")
          .agg(min(struct(col("d"), col("cw"))).as("best"))
          .select(col("vec_id"), col("label"), col("m"), col("best.cw").as("code"))
        val dt = dist.filter(col("vec_id") < 5)
          .select(col("vec_id").as("dt_qid"), col("m").as("qm"),
            col("cw").as("qcw"), col("d").as("dq"))
        val scored = codes
          .join(broadcast(probes), col("label") === col("c_label"))
          .filter(col("vec_id") =!= col("qid"))
          .join(broadcast(dt),
            col("qid") === col("dt_qid") &&
              col("m") === col("qm") && col("code") === col("qcw"))
          .groupBy("qid", "vec_id")
          .agg(sum(expr("CAST(round(dq, 6) AS DECIMAL(18,6))")).as("adist"))
        val top = graft.plans.TopK.perKey(scored, Seq("qid"),
          Seq(("adist", "asc"), ("vec_id", "asc")), 10)
        val w = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
        top.withColumn("rank", row_number().over(w))
          .select(col("qid"), col("rank"), col("vec_id"),
            col("adist").cast(org.apache.spark.sql.types.DoubleType).as("adist"))
          .orderBy("qid", "rank")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        cents AS (
          SELECT label AS c_label, list(m ORDER BY dim) AS centroid
          FROM (SELECT label, dim,
                       CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS m
                FROM (SELECT label, unnest(v) x,
                             generate_subscripts(v, 1) dim
                      FROM e)
                GROUP BY label, dim)
          GROUP BY label),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        probes AS (
          SELECT qid, c_label FROM (
            SELECT q.qid, c.c_label,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(range(1, len(q.qv) + 1),
                         i -> q.qv[i] * c.centroid[i])), (a, x) -> a + x)
                       / (q.qnorm * greatest(
                           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                             list_transform(c.centroid, x -> x * x)),
                             (a, x) -> a + x)), 1e-12)), 6) DESC,
                     c.c_label) crank
            FROM q CROSS JOIN cents c)
          WHERE crank <= 4),
        -- the PQ stack is L2/ADC: zero-norm vectors are legitimate points
        -- there, so codebook + candidates come from the UNFILTERED
        -- universe (mirrors pqDistances over Tables.embeddings); only the
        -- cosine probe side above rides the norm-filtered e
        eu AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
               FROM embeddings WHERE len(embedding) = 64),
        cb AS (SELECT CAST(vec_id AS INT) cw, v cv FROM eu WHERE vec_id < $PqCodebook),
        ms AS (SELECT unnest(range(0, $PqSubspaces)) m),
        dist AS (
          SELECT eu.vec_id, eu.label, ms.m, cb.cw,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, ${PqSubDim + 1}),
                     i -> (eu.v[ms.m * $PqSubDim + i] - cb.cv[ms.m * $PqSubDim + i])
                        * (eu.v[ms.m * $PqSubDim + i] - cb.cv[ms.m * $PqSubDim + i]))),
                   (acc, x) -> acc + x) AS d
          FROM eu CROSS JOIN ms CROSS JOIN cb),
        codes AS (
          SELECT vec_id, label, m, cw AS code FROM (
            SELECT vec_id, label, m, cw,
                   row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cw) rn
            FROM dist)
          WHERE rn = 1),
        dt AS (SELECT vec_id qid, m, cw, d dq FROM dist WHERE vec_id < 5),
        scored AS (
          SELECT dt.qid, c.vec_id,
                 sum(CAST(round(dt.dq, 6) AS DECIMAL(18,6))) AS adist
          FROM codes c
          JOIN probes p ON c.label = p.c_label
          JOIN dt ON dt.qid = p.qid AND c.m = dt.m AND c.code = dt.cw
          WHERE c.vec_id != dt.qid
          GROUP BY 1, 2),
        ranked AS (
          SELECT qid, vec_id, adist,
                 row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, CAST(adist AS DOUBLE) AS adist
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank""")),

    // ---- k-means Lloyd refinement: the IVF centroid-training step --------
    // ann_ivf/ivfpq use the label means as their coarse quantizer; this is
    // the operator that TRAINS such a quantizer: one Lloyd iteration from
    // deterministic seeds (vec_id < KmSeeds). Assignment scores against k
    // broadcast seed vectors (map-side nested loop) and takes the argmin
    // as a PACKED-SCALAR min: round6(d²)·10⁶·k + c_id in one BIGINT, so
    // the aggregate buffer is a mutable long and the whole argmin stays
    // in HashAggregate — min(struct(...)) or a row_number window would
    // each force sorts (struct agg buffers aren't hash-mutable;
    // lexicographic (d², c_id) order equals numeric order of the packed
    // key since c_id < k). The vector rides as a grouping key (unique
    // per vec_id anyway; complex group keys hash fine). All k candidate
    // rows of a vector are co-located by the broadcast join, so the
    // partial min finishes each group map-side and the argmin exchange
    // carries ONE row per vector;
    // the mean update is a second groupBy(cluster, dim) exchange whose
    // partials absorb the d-way explode. The full algorithm loops this
    // plan with re-broadcast centroids per round (exactly the
    // dedup_clusters convergence-loop pattern); one step is the
    // oracle-checkable unit. Every seed keeps ≥1 member (itself, at
    // d²=0), so the output is always k·d rows. Exact-decimal means and a
    // round-6 argmin keep the whole step bit-identical to DuckDB.
    GraftQuery(
      "kmeans_refine",
      (s, dir) => {
        // universe-gated: a NaN/1e38 member makes its cluster's mean NaN /
        // overflows the exact-decimal sum (hostile-embeddings sweep)
        val e = vecs(s, dir).select(col("vec_id"), col("embedding"))
        val seeds = e.filter(col("vec_id") < KmSeeds)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val assigned = e.crossJoin(broadcast(seeds))
          .withColumn("d2",
            V.subSqDist(col("embedding"), col("c_vec"), lit(0), KmDims))
          .withColumn("pk", expr(
            s"CAST(round(round(d2, 6) * 1e6) AS BIGINT) * $KmSeeds + c_id"))
          .groupBy("vec_id", "embedding")
          .agg(min(col("pk")).as("mn"))
          .select(expr(s"mn % $KmSeeds").as("c_id"), col("embedding"))
        assigned
          .select(col("c_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("c_id", "dim")
          .agg(count(lit(1)).as("n"),
            (sum(col("x").cast(org.apache.spark.sql.types.DecimalType(18, 8)))
              .cast(org.apache.spark.sql.types.DoubleType) / count(lit(1))).as("mr"))
          .select(col("c_id").as("cluster"), col("dim"), col("n"),
            round(col("mr"), 6).as("m"))
          .orderBy("cluster", "dim")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        s AS (SELECT vec_id AS c_id, v AS sv FROM e WHERE vec_id < $KmSeeds),
        d AS (
          SELECT e.vec_id, s.c_id, e.v,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, ${KmDims + 1}),
                     i -> (e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i]))),
                   (acc, x) -> acc + x) AS d2
          FROM e CROSS JOIN s),
        a AS (
          SELECT c_id, v FROM (
            SELECT c_id, v, row_number() OVER (PARTITION BY vec_id
                     ORDER BY round(d2, 6), c_id) AS rn
            FROM d)
          WHERE rn = 1),
        x AS (SELECT c_id, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x
              FROM a)
        SELECT c_id AS cluster, dim, count(*) AS n,
               round(CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE) / count(*),
                     6) AS m
        FROM x GROUP BY 1, 2 ORDER BY cluster, dim""")),

    // ---- PCA power iteration: top principal direction in one pass --------
    // The distributed building block of spectral embedding analysis:
    // v₁ ∝ Σᵢ xᵢ·(xᵢ·v₀) = (XᵀX)v₀, one power-iteration step from the
    // deterministic uniform start v₀ = 1/√d. One corpus scan computes
    // per-row projections scan-side; the d-dimensional accumulation is a
    // single groupBy(dim) exchange with map-side partials (n·d rows
    // reduced to partitions·d). Normalization is a GLOBAL window over the
    // aggregated frame — safe precisely because that frame is always d=64
    // rows whatever n is, and it keeps the whole step to ONE corpus scan
    // (a broadcast-scalar crossJoin duplicated the scan: Catalyst built
    // the u subtree once per branch with no exchange reuse). Iterating
    // re-broadcasts v₁ as the next v₀ (uncentered variant; centering
    // subtracts the davg-style exact mean first). Cross-row double sums
    // are routed through round-8 DECIMAL(28,8) so the fold is
    // order-independent and bit-identical to DuckDB.
    GraftQuery(
      "pca_power_iter",
      (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(28, 8)
        val dbl = org.apache.spark.sql.types.DoubleType
        // universe-gated: one 1e38 vector overflows the DECIMAL(28,8)
        // projection sums; a NaN one zeroes pc1 outright
        val e = vecs(s, dir)
          .select(col("vec_id"), col("embedding"))
          .withColumn("sv",
            expr("aggregate(embedding, 0D, (acc, x) -> acc + x)") * lit(0.125))
        val u = e
          .select(col("sv"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("dim")
          .agg(sum(round(col("x") * col("sv"), 8).cast(dec)).cast(dbl).as("u"))
        u.withColumn("nrm", sqrt(
            sum(round(col("u") * col("u"), 8).cast(dec))
              // lit(1) partition: same single-partition execution over the
              // 64-row dim frame, minus WindowExec's per-run WARN noise
              .over(Window.partitionBy(lit(1))).cast(dbl)))
          .select(col("dim"), round(col("u") / col("nrm"), 6).as("pc1"))
          .orderBy("dim")
      },
      Some("""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        ws AS (
          SELECT v, list_reduce(list_prepend(CAST(0 AS DOUBLE), v),
                   (acc, x) -> acc + x) * 0.125 AS sv
          FROM e),
        ux AS (SELECT generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x, sv
               FROM ws),
        u AS (
          SELECT dim,
                 CAST(sum(CAST(round(x * sv, 8) AS DECIMAL(28,8))) AS DOUBLE) AS u
          FROM ux GROUP BY dim)
        SELECT dim,
               round(u / sqrt(CAST(sum(CAST(round(u * u, 8) AS DECIMAL(28,8)))
                                   OVER () AS DOUBLE)), 6) AS pc1
        FROM u ORDER BY dim""")),

    // ---- trained IVF: the train → index → query composition --------------
    // kmeans_refine is one Lloyd step; ann_ivf_topk quantizes off label
    // means. This is the production pipeline that JOINS them: train the
    // coarse quantizer by looping Lloyd steps with DRIVER-HELD centroids
    // (k·d doubles collected and re-broadcast per round — the
    // dedup_clusters convergence-loop pattern, and exactly how real IVF
    // trainers hold their k·d-sized state; the corpus-sized frames never
    // leave the cluster), then build the inverted file by assigning every
    // vector to its trained cell, then probe the [[AnnTrainedProbe]]
    // closest cells per query. Deterministic end to end: seeds are
    // vec_id < k, assignment argmin is the packed-scalar round-6 key,
    // means are exact-decimal rounded to 6 — so the oracle replays the
    // SAME iterations as unrolled CTEs and the whole trained index is
    // hash-checked, not just spot-recalled. Early exit on an exact
    // centroid fixpoint is oracle-safe: further Lloyd steps at a
    // fixpoint are identities, so the unrolled SQL converges to the
    // same bank. Recall vs the exact scan is pinned in OperatorSpec.
    GraftQuery(
      "ann_trained_topk",
      (s, dir) => {
        import s.implicits._
        // cached for the TRAINING actions only (seed collect + one
        // collect per Lloyd round would otherwise each re-scan the
        // parquet + recompute the double cast — the dedup_clusters
        // cache-then-unpersist discipline); released in the finally so
        // the returned plan owns no cache entries
        val e = vecs(s, dir)
          .withColumn("vd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .cache()
        val cents = try trainLloydBank(dir, e) finally e.unpersist(blocking = false)
        val bank = cents.toDF("c_id", "cv")
        // index: assign every corpus vector to its trained cell
        val asg = argminCell(
            e.select(col("vec_id"), col("embedding"), col("norm"), col("vd")), bank)
          .groupBy(col("vec_id"), col("embedding"), col("norm"))
          .agg(min("pk").as("mn"))
          .withColumn("c_id", expr(s"CAST(mn % $KmSeeds AS INT)"))
        // query: probe the nProbe closest trained cells
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"))
        val qCells = q.crossJoin(broadcast(bank))
          .withColumn("cdist", V.dot(col("qemb"), col("cv")) /
            (col("qnorm") * greatest(V.l2norm(col("cv")), lit(1e-12))))
          .withColumn("crank", row_number().over(
            Window.partitionBy("qid").orderBy(round(col("cdist"), 6).desc, col("c_id"))))
          .filter(col("crank") <= AnnTrainedProbe)
          .select(col("qid"), col("qemb"), col("qnorm"), col("c_id").as("qc_id"))
        val scored = asg.join(broadcast(qCells),
            col("c_id") === col("qc_id") && col("vec_id") =!= col("qid"))
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
        rankTopK(scored, 10)
      },
      Some {
        s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        $sqlLloydBankCtes,
        asg AS (
          SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqlD2("e.v", "c.cv")}, c.c_id) rn
            FROM e CROSS JOIN c$KmIters c)
          WHERE rn = 1),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        qcells AS (
          SELECT qid, qv, qnorm, c_id FROM (
            SELECT q.qid, q.qv, q.qnorm, c.c_id,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     round(
                       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(range(1, ${KmDims + 1}),
                           i -> q.qv[i] * c.cv[i])), (acc, x) -> acc + x)
                       / (q.qnorm * greatest(
                           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                             list_transform(c.cv, x -> x * x)),
                             (acc, x) -> acc + x)), 1e-12)),
                       6) DESC, c.c_id) AS crank
            FROM q CROSS JOIN c$KmIters c)
          WHERE crank <= $AnnTrainedProbe),
        scored AS (
          SELECT qc.qid, e.vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(e.v) + 1),
                     i -> e.v[i] * qc.qv[i])), (acc, x) -> acc + x)
                 / (e.norm * qc.qnorm) AS cos
          FROM asg
          JOIN qcells qc USING (c_id)
          JOIN e ON e.vec_id = asg.vec_id
          WHERE e.vec_id != qc.qid),
        ranked AS (
          SELECT qid, vec_id, cos,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        SELECT qid, rank, vec_id, round(cos, 4) AS cosine
        FROM ranked
        WHERE rank <= 10
        ORDER BY qid, rank"""
      }),

    // ---- TRAINED semantic dedup: the full SemDeDup composition -----------
    // semantic_dedup (above) proves the within-cell prune on the testdata's
    // label clustering — a stand-in cell key. This is the composition a
    // real corpus runs (Abbas et al. 2023, SemDeDup — public): cluster the
    // embedding space with the TRAINED k-means bank ([[trainLloydBank]],
    // the exact machinery ann_trained_topk indexes with — no labels
    // needed), then prune redundancy WITHIN each trained cell — a member
    // is dropped when its cosine to an already-ranked cell-mate clears
    // [[SemTau]], keeping the min-rank survivor of every redundancy clique
    // (the dedup_keep_list min-survivor discipline, transplanted from
    // doc_id order to centroid-distance order: SemDeDup's own keep rule).
    // The survivor LIST is the output — vec_id, cell, rank, keep, and
    // dup_of (the earliest-ranked member that shadows it) — the frame a
    // curation pipeline semi-joins the corpus against.
    //
    // Scale: cross-cell pairs are structurally impossible (every join keys
    // on c_id — plan-gated in PlanSpec), and within a cell each member
    // compares against at most [[SemBand]] EARLIER-ranked mates via an
    // exploded (c_id, rank) EQUI-join — candidate volume ≤ SemBand·n
    // (CandidateBoundSpec), where SemDeDup's full within-cluster matrix is
    // O(cell²) and melts on the first hot cell. The rank window is a
    // sort-based streaming window (external sort, no in-memory buffer);
    // the band join carries only (c_id, rank, vec_id) — vectors join back
    // by id afterwards (embedding_neardup's discipline), so no vector data
    // rides the candidate exchange. Deterministic end to end: the trained
    // bank, the packed-scalar round-6 argmin, micro-unit distances, and
    // round-6 cosines are all replayed by the oracle as unrolled CTEs —
    // the whole curation decision is hash-checked, not spot-checked.
    GraftQuery(
      "semdedup_trained",
      (s, dir) => {
        val rk = semdedupRanked(s, dir)
        val ev = vecs(s, dir)
        val hits = semdedupCandidates(rk)
          .join(ev.select(col("vec_id"), col("embedding").as("xe"),
            col("norm").as("xn")), "vec_id")
          .join(ev.select(col("vec_id").as("pid"), col("embedding").as("pe"),
            col("norm").as("pn")), "pid")
          .withColumn("c6",
            round(V.dot(col("xe"), col("pe")) / (col("xn") * col("pn")), 6))
          .filter(col("c6") >= SemTau)
          .groupBy("vec_id")
          .agg(min_by(col("pid"), col("prank")).as("dup_of"))
        rk.join(hits, Seq("vec_id"), "left")
          .select(col("vec_id"), col("c_id").as("cell"), col("rank"),
            col("dup_of").isNull.as("keep"), col("dup_of"))
          .orderBy("cell", "rank")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        $sqlLloydBankCtes,
        asg AS (
          SELECT vec_id, c_id, d2m FROM (
            SELECT e.vec_id, c.c_id,
                   CAST(round(${sqlD2("e.v", "c.cv")} * 1e6) AS BIGINT) AS d2m,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqlD2("e.v", "c.cv")}, c.c_id) rn
            FROM e CROSS JOIN c$KmIters c)
          WHERE rn = 1),
        rk AS (
          SELECT vec_id, c_id,
                 CAST(row_number() OVER (PARTITION BY c_id
                   ORDER BY d2m, vec_id) AS INT) AS rank
          FROM asg),
        pt AS (
          SELECT x.vec_id, y.vec_id AS pid, y.rank AS prank
          FROM rk x JOIN rk y
            ON x.c_id = y.c_id
           AND y.rank BETWEEN x.rank - $SemBand AND x.rank - 1),
        sc AS (
          SELECT pt.vec_id, pt.pid, pt.prank,
                 round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(a.v) + 1),
                     i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
                   / (a.norm * b.norm), 6) AS c6
          FROM pt
          JOIN e a ON pt.vec_id = a.vec_id
          JOIN e b ON pt.pid = b.vec_id),
        h AS (
          SELECT vec_id, min_by(pid, prank) AS dup_of
          FROM sc WHERE c6 >= $SemTau GROUP BY vec_id)
        SELECT rk.vec_id, rk.c_id AS cell, rk.rank,
               h.dup_of IS NULL AS keep, h.dup_of
        FROM rk LEFT JOIN h USING (vec_id)
        ORDER BY cell, rank""")),

    // ---- SEMANTIC eval decontamination: paraphrase leakage ---------------
    // Round-13 verdict item 4 — the third rung of eval hygiene. Exact
    // spans (decontaminate_spans), trigram overlap (decontaminate), and
    // chat MinHash (chat_decontaminate) all miss an eval item PARAPHRASED
    // in train; embeddings are exactly the representation that catches
    // it. The semdedup_trained machinery composed against the eval slice:
    // the trained Lloyd bank cells the embedding space, and a TRAIN
    // vector (vec_id ≥ EvalMaxDocId — Curation's held-out stand-in) is
    // flagged when its round-6 cosine to an eval member of ITS OWN
    // trained cell clears [[SemTau]]. Output per train vector: cell,
    // keep/strip verdict, the strongest leaking eval item (max cosine,
    // ties → min eval id — decoded from one packed hash-mutable min, the
    // argminCell discipline) and the match strength in exact micro-units
    // (integers cross engines; a round-4 double would ride each engine's
    // tie-rounding).
    //
    // Scale: the eval slice is BOUNDED (≤ EvalMaxDocId) and broadcasts
    // with its vectors; the train side joins it on c_id — cross-cell
    // pairs structurally impossible (plan-gated), candidates ≤ |eval|·n
    // with no candidate shuffle at all (the broadcast replaces
    // semdedup_trained's band explosion because one side is tiny).
    // Fuzzy ⊇ exact by construction: an exact copy of an eval vector
    // lands in the same cell with cosine 1 (OperatorSpec pins this on a
    // planted paraphrase fixture).
    GraftQuery(
      "semantic_keep_list",
      (s, dir) => semanticLeakVerdicts(s, dir)
        .select(col("vec_id"), col("cell"), col("keep"),
          col("leak_of"), col("sim_micros"))
        .orderBy("cell", "vec_id"),
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        $sqlLloydBankCtes,
        asg AS (
          SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqlD2("e.v", "c.cv")}, c.c_id) rn
            FROM e CROSS JOIN c$KmIters c)
          WHERE rn = 1),
        tr AS (SELECT vec_id, c_id FROM asg
               WHERE vec_id >= ${Curation.EvalMaxDocId}),
        ev AS (SELECT vec_id AS eval_id, c_id FROM asg
               WHERE vec_id < ${Curation.EvalMaxDocId}),
        sc AS (
          SELECT tr.vec_id, ev.eval_id,
                 round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(a.v) + 1),
                     i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
                   / (a.norm * b.norm), 6) AS c6
          FROM tr
          JOIN ev USING (c_id)
          JOIN e a ON tr.vec_id = a.vec_id
          JOIN e b ON ev.eval_id = b.vec_id),
        h AS (
          SELECT vec_id,
                 min((1000000 - CAST(round(c6 * 1e6) AS BIGINT))
                     * $SemPackN + eval_id) AS pk
          FROM sc WHERE c6 >= $SemTau GROUP BY vec_id)
        SELECT tr.vec_id, tr.c_id AS cell, h.pk IS NULL AS keep,
               h.pk % $SemPackN AS leak_of,
               1000000 - h.pk // $SemPackN AS sim_micros
        FROM tr LEFT JOIN h USING (vec_id)
        ORDER BY cell, vec_id""")),

    // ---- semantic leak-mass rollup: which sources paraphrase the eval ----
    // leak_mass_by_source's semantic twin — per source, how many train
    // docs carry an embedding that semantically clears τ to an eval
    // member, as an exact floor-ppm of the source's embedded docs: the
    // alert that pages when a crawl source starts REWORDING a benchmark
    // rather than mirroring it verbatim. The verdict frame is skinny
    // (ids + flags), so the doc join carries ~16 bytes a row; the rollup
    // is |sources| rows.
    GraftQuery(
      "semantic_leak_by_source",
      (s, dir) => {
        val verdicts = semanticLeakVerdicts(s, dir)
          .select(col("vec_id"), (!col("keep")).as("leaked"))
        Tables.documents(s, dir)
          .filter(col("doc_id") >= Curation.EvalMaxDocId)
          .select(col("doc_id"), col("source"))
          .join(verdicts, col("doc_id") === col("vec_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("leaked"), 1L).otherwise(0L)).as("docs_leaked"))
          .withColumn("leak_ppm", expr(
            "CAST(CAST(docs_leaked AS DECIMAL(38,0)) * 1000000 DIV n_docs AS BIGINT)"))
          .orderBy("source")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        $sqlLloydBankCtes,
        asg AS (
          SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqlD2("e.v", "c.cv")}, c.c_id) rn
            FROM e CROSS JOIN c$KmIters c)
          WHERE rn = 1),
        tr AS (SELECT vec_id, c_id FROM asg
               WHERE vec_id >= ${Curation.EvalMaxDocId}),
        ev AS (SELECT vec_id AS eval_id, c_id FROM asg
               WHERE vec_id < ${Curation.EvalMaxDocId}),
        lk AS (
          SELECT DISTINCT tr.vec_id
          FROM tr
          JOIN ev USING (c_id)
          JOIN e a ON tr.vec_id = a.vec_id
          JOIN e b ON ev.eval_id = b.vec_id
          WHERE round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(range(1, len(a.v) + 1),
                    i -> a.v[i] * b.v[i])), (acc, x) -> acc + x)
                  / (a.norm * b.norm), 6) >= $SemTau)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN lk.vec_id IS NULL THEN 0 ELSE 1 END)
                 AS BIGINT) AS docs_leaked,
               CAST(CAST(sum(CASE WHEN lk.vec_id IS NULL THEN 0 ELSE 1 END)
                 AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS leak_ppm
        FROM documents d
        JOIN tr ON d.doc_id = tr.vec_id
        LEFT JOIN lk ON d.doc_id = lk.vec_id
        WHERE d.doc_id >= ${Curation.EvalMaxDocId}
        GROUP BY d.source
        ORDER BY d.source""")),

    // ---- MMR diversity rerank: relevance minus redundancy ---------------
    // Maximal Marginal Relevance (Carbonell & Goldstein 1998, public —
    // the standard RAG/retrieval diversity rerank): greedily re-rank the
    // exact top-[[MmrPool]] shortlist so each pick maximizes
    // `rel(c) − max_{s∈picked} sim(c, s)` (λ = 0.5 up to a positive
    // scale, which argmax ignores). cosine_topk's raw ranking returns
    // near-clones of the best hit; MMR is the pass that spends the k
    // result slots on COVERAGE — the same reason semantic_dedup exists on
    // the corpus side, applied at query time.
    //
    // Scale: the greedy is inherently sequential (pick k depends on picks
    // 1..k−1), but only WITHIN a query — so it runs executor-side via
    // flatMapGroups over ≤[[MmrPool]]-row groups (O(k·pool) dots each),
    // NOT as a driver loop: a million queries = a million independent
    // bounded groups, shuffling ≤ q·pool tiny rows. The shortlist itself
    // comes from the TopKPerKey heap operator, and the embedding
    // re-fetch broadcasts the ≤ q·pool id set onto the scan — the corpus
    // is never shuffled. Exactness: the in-group dot replicates
    // [[graft.functions.VectorKernels.dotFF]]'s float→double widening
    // left-to-right fold (identical to the oracle's list_reduce over
    // DOUBLE[]), score updates are pure double max/subtract, and the
    // argmax tie-break is first-in-vec_id-order in both engines (strict
    // `>` scan here, list_position-of-max there) — so the whole greedy
    // trajectory is hash-checkable. The oracle replays it as a
    // recursive CTE threading (maxsim[], chosen[]) list state with a
    // precomputed per-candidate sim-list matrix.
    GraftQuery(
      "mmr_rerank",
      (s, dir) => {
        import s.implicits._
        val e = vecs(s, dir)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
            col("norm").as("qnorm"))
        val scored = e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("cos",
            V.dot(col("embedding"), col("qemb")) / (col("norm") * col("qnorm")))
        val pool = graft.plans.TopK.perKey(
          scored.withColumn("cosr", round(col("cos"), 6)),
          Seq("qid"), Seq(("cosr", "desc"), ("vec_id", "asc")), MmrPool)
          .select(col("qid"), col("vec_id"), col("cos"))
        val cands = e.select(col("vec_id"), col("embedding"), col("norm"))
          .join(broadcast(pool), "vec_id")
          .select(col("qid"), col("vec_id"), col("cos"),
            col("embedding"), col("norm"))
          .as[(Long, Long, Double, Array[Float], Double)]
        cands.groupByKey(_._1)
          .flatMapGroups { (qid, it) =>
            val cs = it.toArray.sortBy(_._2) // vec_id asc = oracle list order
            val n = cs.length
            val maxsim = Array.fill(n)(0.0) // sim to the empty set is 0
            val chosen = Array.fill(n)(false)
            val out = Array.newBuilder[(Long, Int, Long, Double, Double)]
            var k = 1
            val rounds = math.min(MmrK, n)
            while (k <= rounds) {
              var bi = -1
              var bs = 0.0
              var i = 0
              while (i < n) {
                if (!chosen(i)) {
                  val sc = cs(i)._3 - maxsim(i)
                  // strict > keeps the FIRST (lowest vec_id) on exact ties,
                  // mirroring the oracle's list_position-of-max
                  if (bi < 0 || sc > bs) { bi = i; bs = sc }
                }
                i += 1
              }
              chosen(bi) = true
              out += ((qid, k, cs(bi)._2, cs(bi)._3, bs))
              val pe = cs(bi)._4
              val pn = cs(bi)._5
              i = 0
              while (i < n) {
                if (!chosen(i)) {
                  val ce = cs(i)._4
                  var acc = 0.0
                  var j = 0
                  val m = math.min(ce.length, pe.length)
                  // VectorKernels.dotFF's exact fold: float→double widening
                  // multiply, left-to-right double adds
                  while (j < m) { acc += ce(j).toDouble * pe(j).toDouble; j += 1 }
                  val sim = acc / (cs(i)._5 * pn)
                  if (sim > maxsim(i)) maxsim(i) = sim
                }
                i += 1
              }
              k += 1
            }
            out.result().iterator
          }
          .toDF("qid", "mmr_rank", "vec_id", "relevance", "mmr_score")
          .select(col("qid"), col("mmr_rank"), col("vec_id"),
            round(col("relevance"), 4).as("relevance"),
            round(col("mmr_score"), 4).as("mmr_score"))
          .orderBy("qid", "mmr_rank")
      },
      Some {
        // unchosen candidates' current MMR score as a list (NULL = chosen,
        // so list_aggregate('max') and list_position skip them)
        val scoreList =
          """list_transform(range(1, len(s.ids) + 1),
               i -> CASE WHEN s.chosen[i] THEN NULL
                         ELSE s.rels[i] - s.maxsims[i] END)"""
        s"""
        WITH RECURSIVE e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        q AS (SELECT vec_id qid, v qv, norm qnorm FROM e WHERE vec_id < 5),
        scored AS (
          SELECT qid, vec_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(v) + 1), i -> v[i] * qv[i])),
                   (a, x) -> a + x) / (norm * qnorm) AS cos
          FROM e CROSS JOIN q
          WHERE vec_id != qid),
        pool AS (
          SELECT qid, vec_id, cos FROM (
            SELECT qid, vec_id, cos,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY round(cos, 6) DESC, vec_id) AS rnk
            FROM scored)
          WHERE rnk <= $MmrPool),
        arr AS (
          SELECT qid, list(vec_id ORDER BY vec_id) AS ids,
                 list(cos ORDER BY vec_id) AS rels
          FROM pool GROUP BY 1),
        pairsim AS (
          SELECT pa.qid, pa.vec_id AS a,
                 list(
                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(range(1, len(ea.v) + 1),
                       i -> ea.v[i] * eb.v[i])),
                     (x, y) -> x + y) / (ea.norm * eb.norm)
                   ORDER BY pb.vec_id) AS simlist
          FROM pool pa
          JOIN e ea ON pa.vec_id = ea.vec_id
          JOIN pool pb ON pb.qid = pa.qid
          JOIN e eb ON pb.vec_id = eb.vec_id
          GROUP BY 1, 2),
        sel AS (
          SELECT qid, CAST(0 AS INTEGER) AS k, ids, rels,
                 list_transform(ids, x -> CAST(0 AS DOUBLE)) AS maxsims,
                 list_transform(ids, x -> false) AS chosen,
                 CAST(NULL AS BIGINT) AS pick,
                 CAST(NULL AS DOUBLE) AS pick_rel,
                 CAST(NULL AS DOUBLE) AS pick_score
          FROM arr
          UNION ALL
          SELECT s2.qid, s2.k + 1, s2.ids, s2.rels,
                 list_transform(range(1, len(s2.ids) + 1),
                   i -> greatest(s2.maxsims[i], ps.simlist[i])) AS maxsims,
                 list_transform(range(1, len(s2.ids) + 1),
                   i -> s2.chosen[i] OR s2.ids[i] = ps.a) AS chosen,
                 ps.a AS pick,
                 s2.rels[list_position(s2.ids, ps.a)] AS pick_rel,
                 s2.best AS pick_score
          FROM (
            SELECT s.*,
                   list_aggregate($scoreList, 'max') AS best,
                   s.ids[list_position($scoreList,
                     list_aggregate($scoreList, 'max'))] AS pick0
            FROM sel s
            WHERE s.k < $MmrK) s2
          JOIN pairsim ps ON ps.qid = s2.qid AND ps.a = s2.pick0)
        SELECT qid, k AS mmr_rank, pick AS vec_id,
               round(pick_rel, 4) AS relevance, round(pick_score, 4) AS mmr_score
        FROM sel
        WHERE k >= 1
        ORDER BY qid, mmr_rank"""
      }),

    // ---- k-center coreset: farthest-point traversal ----------------------
    // Greedy k-center (González 1985, public — the 2-approximation every
    // coreset/data-pruning paper starts from): seed at the lowest vec_id,
    // then K−1 times pick the vector FARTHEST from everything picked so
    // far. Where mmr_rerank diversifies a per-query shortlist, this
    // selects a global REPRESENTATIVE SUBSET of the corpus — the
    // batch-selection primitive behind diversity-driven data pruning and
    // active-learning seed sets. Output is the pick trajectory with each
    // round's selection radius (the corpus coverage radius BEFORE that
    // pick) — the decreasing curve an operator reads to choose K.
    //
    // Scale: the greedy is K driver round-trips over a cached
    // (id, vec, mind) frame — O(n·K) distance work TOTAL via the
    // incremental running min (recomputing against all picks per round
    // would be O(n·K²)), each pick a 1-row TakeOrdered collect; the
    // kmeans_refine / ann_trained_topk discipline, registered in
    // actionfulQueries. L2 over the UNFILTERED universe (zero vectors
    // are legitimate L2 points — the ivfpq posture, not the cosine
    // family's norm>0 gate). Picked rows leave the frame, so duplicates
    // of picks (mind 0) can never be re-picked and a corpus smaller
    // than K stops early, identically in both engines. Exactness: the
    // distance is subSqDist's float→double widened left-to-right fold,
    // the running min is the same least() chain the unrolled oracle
    // CTEs apply, and the argmax tie-break is (mind DESC, vec_id). Every
    // per-round m-CTE is MATERIALIZED — each is referenced twice, and
    // DuckDB would otherwise inline (= re-evaluate) the whole upstream
    // chain per reference (the bpeSqlChain lesson).
    GraftQuery(
      "kcenter_sample",
      (s, dir) => {
        import s.implicits._
        // universe-gated: greedy farthest-point would otherwise pick the
        // corrupt max-magnitude vector first every time, and a NaN
        // distance ranks incomparably between the engines
        val e = vecs(s, dir).select(col("vec_id"), col("embedding"))
        val seed = e.orderBy("vec_id").limit(1).head()
        val seedId = seed.getLong(0)
        val picks = scala.collection.mutable.ArrayBuffer(
          (1, seedId, Option.empty[Double]))
        var cur = e.filter(col("vec_id") =!= seedId)
          .withColumn("mind", V.subSqDist(col("embedding"),
            typedlit(seed.getSeq[Float](1).toArray), lit(0), KcDims))
          .cache()
        var prev: org.apache.spark.sql.DataFrame = null
        try {
          var k = 2
          var exhausted = false
          while (k <= KcK && !exhausted) {
            // this collect materializes cur from the PREVIOUS round's
            // cache, after which that cache is dead — released here (no
            // extra materialization job) so peak block-manager footprint
            // stays two rounds, not K
            val top = cur.orderBy(col("mind").desc, col("vec_id")).limit(1)
              .collect()
            if (prev != null) { prev.unpersist(blocking = false); prev = null }
            if (top.isEmpty) exhausted = true
            else {
              val pick = top.head
              picks += ((k, pick.getLong(0), Some(pick.getDouble(2))))
              if (k < KcK) {
                val next = cur.filter(col("vec_id") =!= pick.getLong(0))
                  .withColumn("mind", least(col("mind"),
                    V.subSqDist(col("embedding"),
                      typedlit(pick.getSeq[Float](1).toArray), lit(0), KcDims)))
                  .cache()
                prev = cur
                cur = next
              }
            }
            k += 1
          }
        } finally {
          cur.unpersist(blocking = false)
          if (prev != null) prev.unpersist(blocking = false)
        }
        picks.toSeq.toDF("round", "vec_id", "mind")
          .select(col("round"), col("vec_id"),
            round(sqrt(col("mind")), 4).as("radius"))
          .orderBy("round")
      },
      Some {
        def d2(a: String, b: String) =
          s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(range(1, len($a) + 1),
                  i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
                (x, y) -> x + y)"""
        val rounds = (2 to KcK).map { k =>
          val prev = s"m${k - 1}"
          val tail =
            if (k < KcK)
              s""",
        m$k AS MATERIALIZED (
          SELECT m.vec_id, m.v, least(m.mind, ${d2("m.v", "p.v")}) AS mind
          FROM $prev m, p$k p
          WHERE m.vec_id != p.vec_id)"""
            else ""
          s"""
        p$k AS (SELECT vec_id, v, mind FROM $prev
                ORDER BY mind DESC, vec_id LIMIT 1)$tail"""
        }.mkString(",")
        val unions = (2 to KcK).map(k =>
          s"SELECT $k AS round, vec_id, round(sqrt(mind), 4) AS radius FROM p$k")
          .mkString("\n        UNION ALL ")
        s"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        p1 AS (SELECT vec_id, v FROM e
               WHERE vec_id = (SELECT min(vec_id) FROM e)),
        m1 AS MATERIALIZED (
          SELECT e.vec_id, e.v, ${d2("e.v", "p.v")} AS mind
          FROM e, p1 p
          WHERE e.vec_id != p.vec_id),$rounds
        SELECT 1 AS round, vec_id, CAST(NULL AS DOUBLE) AS radius FROM p1
        UNION ALL $unions
        ORDER BY round"""
      }),

    // ---- ratio-margin bitext mining (cross-label pair selection) ---------
    // The margin criterion of Artetxe & Schwenk 2019 (public — the
    // CCMatrix/LASER mining rule): raw cross-label cosine over-selects
    // pairs in DENSE neighborhoods (a hub vector is everyone's nearest
    // neighbor), so each pair's cosine is normalized by the mean of both
    // endpoints' k-NN cosines — margin = 2·cos(x,y) / (mean_k(x) +
    // mean_k(y)). hard_negatives picks the highest raw cross-label
    // cosine; this ranks by the margin, the difference between "similar"
    // and "anomalously similar for its neighborhood". Labels stand in
    // for the two languages of a bitext run, as in hard_negatives.
    //
    // Exactness: every per-pair cosine is quantized to INTEGER micro
    // units BEFORE the neighborhood sums (a double Σ over an unordered
    // aggregate would be association-order-dependent — the one float
    // trap the corr_stats/DECIMAL discipline exists for), and the margin
    // is one integer cross-multiplied floor division:
    // margin_ppm = 2·cntA·cntB·cosµ·1e6 DIV (sumA·cntB + sumB·cntA),
    // gated to cosµ > 0 AND denom > 0 in both engines (negative-cosine
    // neighborhoods have no meaningful margin). Scale: candidates are
    // neardupCandidates' capped O(n·tables·probes·cap) frame; the scored
    // chain is derived ONCE and eagerly localCheckpointed (the
    // dup_pagerank lesson — the margin readout references it three
    // times: pairs + both endpoint neighborhoods; pure plans re-derive
    // the whole LSH chain per reference) ⇒ actionfulQueries. Both
    // rankings run through the TopKPerKey heap exec.
    GraftQuery(
      "bitext_margin",
      (s, dir) => {
        val e = vecs(s, dir)
        val cand = neardupCandidates(s, dir)
        val sym = cand.select(explode(array(
            struct(col("vec_a").as("qid"), col("vec_b").as("vid")),
            struct(col("vec_b").as("qid"), col("vec_a").as("vid")))).as("p"))
          .select(col("p.qid").as("qid"), col("p.vid").as("vid"))
        val scored = sym
          .join(e.select(col("vec_id").as("qid"), col("label").as("qlabel"),
            col("embedding").as("qe"), col("norm").as("qn")), "qid")
          .join(e.select(col("vec_id").as("vid"), col("label").as("nlabel"),
            col("embedding").as("ne"), col("norm").as("nn")), "vid")
          .filter(col("qlabel") =!= col("nlabel"))
          .withColumn("cos", V.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
          .select(col("qid"), col("qlabel"), col("vid"), col("nlabel"),
            round(col("cos"), 6).as("cosr"), col("cos"),
            expr("CAST(round(cos * 1000000) AS BIGINT)").as("cosu"))
          .localCheckpoint(true)
        // nbhd feeds BOTH endpoint joins below; as a pure plan each join
        // re-ran the whole TopK heap pass + aggregation over the
        // checkpointed pairs (two identical TopKPerKey chains in the r13
        // before-plan). One more eager checkpoint of the tiny per-qid
        // aggregate (2 longs/row) halves the post-checkpoint work — the
        // same materialize-what-fans-out discipline as `scored` itself.
        val nbhd = graft.plans.TopK.perKey(
            scored, Seq("qid"), Seq(("cosr", "desc"), ("vid", "asc")), BtK)
          .groupBy("qid")
          .agg(count(lit(1)).as("cnt"), sum("cosu").as("sumu"))
          .localCheckpoint(true)
        val margined = scored
          .join(nbhd.select(col("qid"), col("cnt").as("cnt_a"),
            col("sumu").as("sum_a")), "qid")
          .join(nbhd.select(col("qid").as("vid"), col("cnt").as("cnt_b"),
            col("sumu").as("sum_b")), "vid")
          .filter(col("cosu") > 0 &&
            col("sum_a") * col("cnt_b") + col("sum_b") * col("cnt_a") > 0)
          .withColumn("margin_ppm", expr(
            """CAST(2 * cnt_a * cnt_b * cosu * 1000000
                    DIV (sum_a * cnt_b + sum_b * cnt_a) AS BIGINT)"""))
        graft.plans.TopK.perKey(
          margined, Seq("qid"), Seq(("margin_ppm", "desc"), ("vid", "asc")), 1)
          .select(col("qid").as("vec_id"), col("qlabel").as("label"),
            col("vid").as("mate_id"), col("nlabel").as("mate_label"),
            round(col("cos"), 4).as("cosine"), col("margin_ppm"))
          .orderBy("vec_id")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                   (acc, x) -> acc + x)) norm
          FROM embeddings
          WHERE len(embedding) = 64 AND norm > 0 AND norm < 10000.0),
        planes AS (SELECT * FROM (VALUES
          ${LshPlanes.sqlValuesRows}) AS p(tbl, plane, w)),
        dots AS (
          SELECT e.vec_id, p.tbl, p.plane,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(p.w) + 1), i -> e.v[i] * p.w[i])),
                   (a, x) -> a + x) AS dot
          FROM e CROSS JOIN planes p),
        sigs AS (
          SELECT vec_id, tbl,
                 sum(CASE WHEN dot >= 0
                     THEN 1 << (${LshPlanes.planesPerTable - 1} - plane)
                     ELSE 0 END) AS bucket
          FROM dots GROUP BY vec_id, tbl),
        cells AS (
          SELECT vec_id, tbl, xor(bucket, m.m) AS cell
          FROM sigs CROSS JOIN (SELECT unnest(${LshPlanes.sqlProbeMasks(1)}) AS m) m),
        capped AS (
          SELECT vec_id, tbl, cell FROM (
            SELECT vec_id, tbl, cell,
                   count(*) OVER (PARTITION BY tbl, cell) AS csz
            FROM cells)
          WHERE csz <= ${LshPlanes.maxBucket}),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM capped a JOIN capped b
            ON a.tbl = b.tbl AND a.cell = b.cell AND a.vec_id < b.vec_id),
        sym AS (
          SELECT vec_a AS qid, vec_b AS vid FROM cand
          UNION ALL
          SELECT vec_b AS qid, vec_a AS vid FROM cand),
        scored AS MATERIALIZED (
          SELECT s.qid, eq.label AS qlabel, s.vid, ev.label AS nlabel,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(range(1, len(eq.v) + 1), i -> eq.v[i] * ev.v[i])),
                   (a, x) -> a + x) / (eq.norm * ev.norm) AS cos
          FROM sym s
          JOIN e eq ON s.qid = eq.vec_id
          JOIN e ev ON s.vid = ev.vec_id
          WHERE eq.label != ev.label),
        q AS MATERIALIZED (
          SELECT qid, qlabel, vid, nlabel, cos,
                 CAST(round(cos * 1000000) AS BIGINT) AS cosu
          FROM scored),
        nbhd AS MATERIALIZED (
          SELECT qid, count(*) AS cnt, sum(cosu) AS sumu FROM (
            SELECT qid, cosu,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY round(cos, 6) DESC, vid) AS rn
            FROM q)
          WHERE rn <= $BtK
          GROUP BY qid),
        margined AS (
          SELECT q.qid, q.qlabel, q.vid, q.nlabel, q.cos,
                 CAST(2 * a.cnt * b.cnt * q.cosu * 1000000
                      // (a.sumu * b.cnt + b.sumu * a.cnt) AS BIGINT)
                   AS margin_ppm
          FROM q
          JOIN nbhd a ON q.qid = a.qid
          JOIN nbhd b ON q.vid = b.qid
          WHERE q.cosu > 0 AND a.sumu * b.cnt + b.sumu * a.cnt > 0),
        best AS (
          SELECT qid, qlabel, vid, nlabel, cos, margin_ppm,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY margin_ppm DESC, vid) AS rn
          FROM margined)
        SELECT qid AS vec_id, qlabel AS label, vid AS mate_id,
               nlabel AS mate_label, round(cos, 4) AS cosine, margin_ppm
        FROM best
        WHERE rn = 1
        ORDER BY vec_id"""))
  )

  /** semantic_dedup's within-cell candidate pairs with their exact cosine,
    * BEFORE the threshold — exposed so the scale-gate spec
    * (CandidateBoundSpec) can count the frame at every sf. Each row is
    * (vec_id, mate_id, cos) with mate_id < vec_id and both in the same
    * ≤-CellCap cell: pair volume is ≤ (CellCap−1)/2 per vector by
    * construction. */
  private[graft] def semanticPairs(s: SparkSession, dir: String): DataFrame = {
    val capped = vecs(s, dir)
      .withColumn("csz", count(lit(1)).over(Window.partitionBy("label")))
      .filter(col("csz") <= SemCellCap)
      .select(col("vec_id"), col("label"), col("embedding"), col("norm"))
    capped.as("a")
      .join(capped.as("b"),
        col("a.label") === col("b.label") && col("b.vec_id") < col("a.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("mate_id"),
        (V.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.norm") * col("b.norm"))).as("cos"))
  }

  /** semantic_dedup operating point: cosine threshold (synthetic-corpus
    * p99; production uses ~0.95) and the structural cell-size cap. */
  private val SemDedupTau = 0.30
  private[graft] val SemCellCap = 512

  /** bq_topk: Hamming-shortlist depth per query ahead of the exact
    * rerank — 5× the final k, the standard over-fetch for 1-bit codes. */
  private val BqShortlist = 50

  /** mmr_rerank: exact-cosine shortlist fed to the greedy (5× the final
    * slots — diversity needs headroom beyond the raw top-k) and the
    * number of diversified result slots. */
  private val MmrPool = 50
  private val MmrK = 10

  /** kcenter_sample: coreset size (the unrolled-oracle round count —
    * raising it appends CTE pairs) and the full vector width the L2
    * kernel covers. */
  private val KcK = 16
  private val KcDims = 64

  /** bitext_margin: k-NN depth of the per-endpoint neighborhood mean
    * that normalizes the pair cosine (the ratio-margin denominator). */
  private val BtK = 4

  /** pq_topk geometry: 64 dims = 8 subspaces × 8 dims, 16 codewords per
    * subspace drawn from the first 16 vectors. */
  private val PqSubspaces = 8
  private val PqSubDim = 8
  private val PqCodebook = 16

  /** All (vector, subspace, codeword) squared distances — the shared
    * front half of pq_topk and ivfpq_topk: codes are its per-(vec, m)
    * argmins, per-query distance tables are its vec_id < 5 slice.
    * Deliberately UNGATED (unlike the cosine universe): PQ/ADC is pure
    * L2, where a zero-norm vector is a legitimate point. Malformed/
    * non-finite vectors stay consistent without a gate because no
    * corpus-side distance ever crosses a decimal/int cast: their NaN
    * (Spark kernels) / NULL (DuckDB folds) subspace distances tie every
    * codeword, and both engines' argmin tiebreak (NaN and NULL both
    * order last; cw ascending) lands on codeword 0 identically. The ONE
    * structural requirement is the declared width: PQ codes are defined
    * over a fixed subspace geometry, and a wrong-width vector truncates
    * in the Spark kernels while DuckDB folds its missing slots to NULL —
    * hence the dims-only gate. */
  private def pqDistances(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .filter(size(col("embedding")) === EmbDims)
    val cb = e.filter(col("vec_id") < PqCodebook)
      .select(col("vec_id").cast(org.apache.spark.sql.types.IntegerType).as("cw"),
        col("embedding").as("cv"))
    e.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("m", explode(typedlit((0 until PqSubspaces).toList)))
      .crossJoin(broadcast(cb))
      .withColumn("d", V.subSqDist(col("embedding"), col("cv"),
        col("m") * PqSubDim, PqSubDim))
  }

  /** mrl_topk: leading dimensions used by the truncated first pass. */
  private val MrlDims = 16

  /** kmeans_refine geometry: k deterministic seeds (vec_id < KmSeeds) over
    * the full vector width. k scales with the target cell count of the IVF
    * index being trained, not with n. */
  private val KmSeeds = 8
  private val KmDims = 64

  /** ann_trained_topk: Lloyd refinement rounds (mirrored as unrolled
    * oracle CTEs — raising this means adding a CTE pair) and probed
    * trained cells per query. */
  private val KmIters = 2
  private val AnnTrainedProbe = 3

  /** semantic_dedup: how many EARLIER-ranked cell-mates each member is
    * compared against. The cap is what makes the within-cell prune linear
    * — SemDeDup's full within-cluster pairwise matrix is O(cell²), which a
    * hot cell turns into the all-pairs blowup the near-dup stack exists to
    * avoid. Candidate volume is provably ≤ SemBand·n (CandidateBoundSpec). */
  private[graft] val SemBand = 8

  /** semantic_dedup redundancy threshold on round-6 cosine. The SemDeDup
    * operating point is ε ≈ 0.05-0.1 below 1.0 on real (clustered)
    * corpora; this synthetic corpus is near-uniform (max pairwise cos
    * ≈ 0.6 — see embedding_neardup), so the same threshold the LSH
    * near-dup query uses keeps the output non-degenerate at every sf. */
  private[graft] val SemTau = 0.42

  /** semantic_decontaminate's packed-scalar multiplier: the (max-cosine,
    * min-eval-id) argmax rides one hash-mutable `min` as
    * `(1e6 − c6µ)·SemPackN + eval_id`, so SemPackN must exceed every
    * eval id (< [[Curation.EvalMaxDocId]] = 25). */
  private[graft] val SemPackN = 32

  /** Packed-scalar argmin assignment of `frame` (must carry `vd`, the
    * double-cast vector) against a broadcast centroid bank `(c_id, cv)`:
    * round-6 squared distance in micro-units and the cell id packed into
    * ONE BIGINT so the argmin is a hash-mutable `min` (see kmeans_refine's
    * header for why min(struct)/row_number would force sorts). Downstream:
    * `pk % KmSeeds` = cell, `pk DIV KmSeeds` = round-6 d² micro-units. */
  private def argminCell(frame: DataFrame, cents: DataFrame): DataFrame = frame
    .crossJoin(broadcast(cents))
    .withColumn("d2", V.subSqDist(col("vd"), col("cv"), lit(0), KmDims))
    .withColumn("pk", expr(
      s"CAST(round(round(d2, 6) * 1e6) AS BIGINT) * $KmSeeds + c_id"))

  /** Memoized [[trainLloydBankUncached]]: ann_trained_topk and
    * semdedup_trained train IDENTICAL banks on the same corpus, and every
    * bench repetition re-enters the builder — the trained k·d state is
    * tiny and deterministic, so retraining per consumer re-runs KmIters
    * full-corpus assignment jobs for an identical result. Keyed on the
    * embeddings-file fingerprint, the bpeTrain/qcCache discipline (the
    * harness regenerates testdata in place between rounds). */
  private def trainLloydBank(dir: String, e: DataFrame): Seq[(Int, Seq[Double])] =
    lloydCache.compute((e.sparkSession, dir), (_, prev) => {
      val fp = embFingerprint(dir)
      if (prev != null && prev._1 == fp) prev
      else (fp, trainLloydBankUncached(e))
    })._2

  private val lloydCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, Seq[(Int, Seq[Double])])]

  private def embFingerprint(dir: String): String =
    Tables.sourceFingerprint(dir, "embeddings")

  /** Lloyd training loop over a CACHED universe frame `e` (columns
    * `vec_id`, `vd`): [[KmIters]] rounds from the deterministic
    * vec_id < KmSeeds seeds, centroids DRIVER-HELD (k·d doubles collected
    * and re-broadcast per round — the dedup_clusters convergence-loop
    * pattern, and exactly how real IVF trainers hold their k·d state; the
    * corpus-sized frames never leave the cluster). Deterministic end to
    * end (packed-scalar round-6 argmin, exact-decimal round-6 means), so
    * oracles replay the SAME iterations as unrolled CTEs
    * ([[sqlLloydBankCtes]]). Early exit on an exact centroid fixpoint is
    * oracle-safe: further Lloyd steps at a fixpoint are identities.
    * Shared by ann_trained_topk (index + probe) and semdedup_trained
    * (within-cell prune). Caller owns e's cache lifecycle. */
  private def trainLloydBankUncached(e: DataFrame): Seq[(Int, Seq[Double])] = {
    val s = e.sparkSession
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(18, 8)
    val dbl = org.apache.spark.sql.types.DoubleType
    var cents: Seq[(Int, Seq[Double])] = e.filter(col("vec_id") < KmSeeds)
      .select(col("vec_id").cast("int"), col("vd")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    var it = 0
    var converged = false
    while (it < KmIters && !converged) {
      val next = argminCell(e.select(col("vec_id"), col("vd")),
          broadcast(cents.toDF("c_id", "cv")))
        .groupBy("vec_id", "vd").agg(min("pk").as("mn"))
        .select(expr(s"CAST(mn % $KmSeeds AS INT)").as("c_id"), col("vd"))
        .select(col("c_id"), posexplode(col("vd")).as(Seq("dim", "x")))
        .groupBy("c_id", "dim")
        .agg(round(sum(col("x").cast(dec)).cast(dbl) / count(lit(1)), 6).as("m"))
        .groupBy("c_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("c_id"), expr("transform(dm, p -> p.m)").as("cv"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
      converged = next == cents
      cents = next
      it += 1
    }
    cents
  }

  /** semdedup_trained's ranked cell membership: every universe vector's
    * TRAINED cell and its centroid-distance rank within it —
    * `(vec_id, c_id, rank)`. ACTIONFUL (the Lloyd training collects run
    * here); the cache covers the training actions only and is released
    * before the returned plan, which owns no cache entries. The rank
    * rides [[PipelineOps.twoPhaseRank]] — k is a CLUSTERING granularity
    * (small by design), so a plain per-cell window would serialize each
    * n/k-row cell through ONE task; the bucketed two-phase build keeps
    * rank parallelism at k·buckets whatever n is (identical ranks: same
    * (d2m, vec_id) order, broadcast per-bucket offsets). */
  private[graft] def semdedupRanked(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
      .withColumn("vd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .cache()
    val cents = try trainLloydBank(dir, e) finally e.unpersist(blocking = false)
    val bank = cents.toDF("c_id", "cv")
    val asg = argminCell(e.select(col("vec_id"), col("vd")), bank)
      .groupBy("vec_id").agg(min("pk").as("mn"))
      .select(col("vec_id"),
        expr(s"CAST(mn % $KmSeeds AS INT)").as("c_id"),
        expr(s"mn DIV $KmSeeds").as("d2m"))
    PipelineOps.twoPhaseRank(asg, Seq("c_id"), "d2m", Seq("vec_id"), "rank")
      .select(col("vec_id"), col("c_id"), col("rank").cast("int").as("rank"))
      // every consumer fans this frame out (semdedup_trained: member +
      // partner sides; semanticLeakVerdicts: eval slice + train slice +
      // the final verdict join), and each pure-plan reference re-ran the
      // full argmin assignment + two-phase rank over the corpus (guide
      // §7.2 duplicated subtrees). The frame is 3 ints per vector and
      // every consumer is already actionful (Lloyd training collects),
      // so one more eager materialization is the established discipline
      // (scored/nbhd in bitext_margin, clips in video_neardup).
      .localCheckpoint(true)
  }

  /** semdedup_trained's capped candidate pairs over a ranked frame:
    * each member against its ≤ [[SemBand]] EARLIER-ranked cell-mates,
    * via an exploded (c_id, rank) EQUI-join — candidate volume ≤
    * SemBand·n by construction (CandidateBoundSpec counts it at every
    * scale), and cross-cell pairs are structurally impossible (c_id is
    * in the join key). Returns `(vec_id, pid, prank)` — ids only; the
    * vectors join back by id so none ride the candidate exchange. */
  private[graft] def semdedupCandidates(rk: DataFrame): DataFrame = {
    // sequence() REVERSES when start > stop — the rank-1 member must
    // emit an EMPTY band, not [1, 0]
    val partners = rk.withColumn("prank", explode(expr(
        s"""CASE WHEN rank > 1
             THEN sequence(greatest(1, rank - $SemBand), rank - 1)
             ELSE CAST(array() AS ARRAY<INT>) END""")))
      .select(col("c_id"), col("vec_id"), col("prank"))
    partners.join(rk.select(col("c_id"), col("rank").as("prank"),
        col("vec_id").as("pid")), Seq("c_id", "prank"))
      .select("vec_id", "pid", "prank")
  }

  /** semantic_decontaminate's per-train-vector verdict frame:
    * `(vec_id, cell, keep, leak_of, sim_micros)` for every train
    * (vec_id ≥ EvalMaxDocId) universe vector. The bounded eval slice
    * broadcasts WITH its vectors; the train side joins it on c_id only,
    * so cross-cell pairs are structurally impossible and there is no
    * candidate shuffle at all. The (max-cosine, min-eval-id) winner rides
    * one packed hash-mutable `min` ([[SemPackN]]); sim stays in exact
    * micro-units so no engine's double-tie rounding ever enters the
    * artifact. ACTIONFUL (the Lloyd training collects run in
    * [[semdedupRanked]]). Shared by semantic_decontaminate and the
    * per-source rollup so the two can never disagree on a verdict. */
  private[graft] def semanticLeakVerdicts(s: SparkSession, dir: String): DataFrame = {
    val rk = semdedupRanked(s, dir)
    val ev = vecs(s, dir).select(col("vec_id"), col("embedding"), col("norm"))
    val evalSide = rk.filter(col("vec_id") < Curation.EvalMaxDocId)
      .join(ev, "vec_id")
      .select(col("c_id"), col("vec_id").as("eval_id"),
        col("embedding").as("ee"), col("norm").as("en"))
    val train = rk.filter(col("vec_id") >= Curation.EvalMaxDocId)
    val hits = train.join(ev, "vec_id")
      .join(broadcast(evalSide), Seq("c_id"))
      .withColumn("c6",
        round(V.dot(col("embedding"), col("ee")) / (col("norm") * col("en")), 6))
      .filter(col("c6") >= SemTau)
      .groupBy("vec_id")
      .agg(min(expr(s"(1000000 - CAST(round(c6 * 1e6) AS BIGINT)) " +
        s"* $SemPackN + eval_id")).as("pk"))
    train.join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id").as("cell"),
        col("pk").isNull.as("keep"),
        expr(s"pk % $SemPackN").as("leak_of"),
        expr(s"1000000 - pk DIV $SemPackN").as("sim_micros"))
  }

  /** Round-6 squared distance between two DOUBLE[] SQL expressions —
    * the oracle mirror of [[argminCell]]'s d2. */
  private def sqlD2(v: String, cv: String): String =
    s"""round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, ${KmDims + 1}),
             i -> ($v[i] - $cv[i]) * ($v[i] - $cv[i]))),
           (acc, x) -> acc + x), 6)"""

  /** Unrolled-Lloyd oracle CTE chain mirroring [[trainLloydBank]]:
    * `c0` (seeds) through `c{KmIters}` — the trained bank relation is
    * `c$KmIters(c_id, cv)`. Expects an `e(vec_id, v, norm)` CTE upstream. */
  private def sqlLloydBankCtes: String = {
    val lloyd = (prev: String, a: String, c: String) => s"""
        $a AS (
          SELECT vec_id, v, c_id FROM (
            SELECT e.vec_id, e.v, c.c_id,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY ${sqlD2("e.v", "c.cv")}, c.c_id) rn
            FROM e CROSS JOIN $prev c)
          WHERE rn = 1),
        $c AS (
          SELECT c_id, list(m ORDER BY dim) cv FROM (
            SELECT c_id, dim,
                   round(CAST(sum(CAST(x AS DECIMAL(18,8))) AS DOUBLE)
                         / count(*), 6) m
            FROM (SELECT c_id, generate_subscripts(v, 1) dim, unnest(v) x
                  FROM $a)
            GROUP BY 1, 2)
          GROUP BY c_id)"""
    (s"c0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $KmSeeds)," +:
      (1 to KmIters).map(i => lloyd(s"c${i - 1}", s"a$i", s"c$i") + ","))
      .mkString("\n").dropRight(1)
  }
}
