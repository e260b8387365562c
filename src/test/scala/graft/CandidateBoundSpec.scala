package graft

import org.apache.spark.sql.functions._

/** Scale-growth gate for the capped candidate generators.
  *
  * Quadratic candidate volume is invisible behind a green oracle at any
  * single scale — the round-4 verdict's n²/32 LSH self-join stayed hidden
  * for three rounds exactly this way. This spec counts the candidate
  * frames at ALL THREE testdata scales and asserts the linear bound the
  * hot-bucket caps make provable:
  *
  *  - simhash: each doc emits 10 band rows (4 single-chunk + 6 chunk-pair),
  *    a row pairs with ≤ MaxChunkBucket−1 bucket-mates
  *    ⇒ candidates ≤ 10·(cap−1)/2·n.
  *  - embedding LSH: each vector emits 16 tables × 17 probe cells, a cell
  *    row pairs with ≤ maxBucket−1 mates ⇒ candidates ≤ 272·(cap−1)/2·n.
  *
  * The bounds hold at ANY n by construction; asserting them at three
  * scales (plus a much tighter empirical ceiling, and that the cap
  * actually engages at sf0.1 so the capped path is oracle-exercised, not
  * dormant) is the regression gate: removing a cap, widening it, or
  * re-keying a band to something hotter trips this suite before it trips
  * a 100 TB cluster.
  *
  * On the real-structure growth: the documents corpus plants near-dup
  * pairs at a density that itself grows ~n² (true hamming≤6 pairs:
  * 328 at 500 docs → 29 922 at 5 000), so a growth-EXPONENT assertion on
  * raw candidates would reject even a perfect detector. The bound, not
  * the exponent, is the scale invariant; the empirical ceilings below are
  * set ~3× above today's measurements so genuine regressions (not corpus
  * density) trip them.
  */
class CandidateBoundSpec extends SparkSuite {

  private val dirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("simhash candidates stay under the linear cap bound at all three scales") {
    val capBoundPerDoc = 10.0 * (operators.Dedup.MaxChunkBucket - 1) / 2
    for (dir <- dirs) {
      val n = Tables.documents(spark, dir).count()
      val cands = operators.Dedup.simhashCandidates(spark, dir).count()
      assert(cands <= capBoundPerDoc * n,
        s"$dir: $cands candidates exceed the provable bound ${capBoundPerDoc * n}")
      // empirical ceiling ~3× today's measured volume (≤ 9 cand/doc at
      // 500 docs, ≤ 50 at 5000 — the corpus' planted-dup density rises
      // with n, so the per-doc ceiling does too)
      val perDoc = cands.toDouble / n
      val ceiling = if (n <= 1000) 30.0 else 150.0
      assert(perDoc <= ceiling,
        s"$dir: $perDoc candidates/doc — candidate generation got hotter")
    }
  }

  test("simhash bucket cap engages at sf0.1 (capped path is live, not dormant)") {
    import graft.functions.{VectorExpressions => V}
    val dir = dirs.last
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"), V.simhash64(split(col("text"), " ")).as("fp"))
    val hot = (0 until 4).map { c =>
      fp.select(expr(s"CAST(shiftright(fp, ${c * 16}) & 65535 AS BIGINT)").as("v"))
        .groupBy("v").count()
        .filter(col("count") > operators.Dedup.MaxChunkBucket)
        .count()
    }.sum
    assert(hot > 0,
      "no single-chunk bucket exceeds MaxChunkBucket at sf0.1 — the capped " +
        "branch of the oracle-mirrored join is never exercised; lower the cap " +
        "or plant a hotter corpus")
  }

  test("phash candidates stay under the linear cap bound at all three scales") {
    // same banding machinery as simhash (Dedup.hammingCandidates) applied
    // to the image dHash fingerprints: 10 bands/doc, buckets capped at
    // MaxChunkBucket ⇒ candidates ≤ 10·(cap−1)/2·n by construction
    val capBoundPerDoc = 10.0 * (operators.Dedup.MaxChunkBucket - 1) / 2
    for (dir <- dirs) {
      val n = Tables.documents(spark, dir).count()
      val cands = operators.Multimodal.phashCandidates(spark, dir).count()
      assert(cands <= capBoundPerDoc * n,
        s"$dir: $cands candidates exceed the provable bound ${capBoundPerDoc * n}")
      // empirical ceiling ~3× today's measurements: byte-stream images of
      // same-vocabulary text hash closer together than simhash text
      // signatures do, so the per-doc volume is higher but still capped
      // linear (measured ≈6/doc at 500 docs, ≈15/doc at 5000 and 50 000)
      val perDoc = cands.toDouble / n
      val ceiling = if (n <= 1000) 30.0 else 60.0
      assert(perDoc <= ceiling,
        s"$dir: $perDoc candidates/doc — phash candidate generation got hotter")
    }
  }

  test("jpeg_phash candidates stay under the linear cap bound at all three scales") {
    // the JPEG block-mean fingerprints ride the same capped banded join
    val capBoundPerDoc = 10.0 * (operators.Dedup.MaxChunkBucket - 1) / 2
    for (dir <- dirs) {
      val n = Tables.documents(spark, dir).count()
      val cands = operators.Multimodal.jpegPhashCandidates(spark, dir).count()
      assert(cands <= capBoundPerDoc * n,
        s"$dir: $cands candidates exceed the provable bound ${capBoundPerDoc * n}")
    }
  }

  test("png_phash candidates stay under the linear cap bound at all three scales") {
    // the PNG fingerprints ride the same capped banded join
    val capBoundPerDoc = 10.0 * (operators.Dedup.MaxChunkBucket - 1) / 2
    for (dir <- dirs) {
      val n = Tables.documents(spark, dir).count()
      val cands = operators.Multimodal.pngPhashCandidates(spark, dir).count()
      assert(cands <= capBoundPerDoc * n,
        s"$dir: $cands candidates exceed the provable bound ${capBoundPerDoc * n}")
    }
  }

  test("gif_phash candidates stay under the linear cap bound at all three scales") {
    // the GIF (LZW) fingerprints ride the same capped banded join
    val capBoundPerDoc = 10.0 * (operators.Dedup.MaxChunkBucket - 1) / 2
    for (dir <- dirs) {
      val n = Tables.documents(spark, dir).count()
      val cands = operators.Multimodal.gifPhashCandidates(spark, dir).count()
      assert(cands <= capBoundPerDoc * n,
        s"$dir: $cands candidates exceed the provable bound ${capBoundPerDoc * n}")
    }
  }

  test("ehash (audio) candidates stay under the linear cap bound at all three scales") {
    val capBoundPerDoc = 10.0 * (operators.Dedup.MaxChunkBucket - 1) / 2
    for (dir <- dirs) {
      val n = Tables.documents(spark, dir).count()
      val cands = operators.Multimodal.ehashCandidates(spark, dir).count()
      assert(cands <= capBoundPerDoc * n,
        s"$dir: $cands candidates exceed the provable bound ${capBoundPerDoc * n}")
      val perDoc = cands.toDouble / n
      val ceiling = if (n <= 1000) 30.0 else 60.0
      assert(perDoc <= ceiling,
        s"$dir: $perDoc candidates/doc — ehash candidate generation got hotter")
    }
  }

  test("video frame candidates stay under the linear cap bound at all three scales") {
    // the frame-aligned face of the same banding machinery: each FRAME
    // emits 10 band rows with the frame index folded into the key, buckets
    // capped at MaxChunkBucket ⇒ clip-pair candidates ≤ 10·(cap−1)/2·F
    // where F is the total frame count (distinct-ing to clip pairs only
    // shrinks it)
    val capBoundPerFrame = 10.0 * (operators.Dedup.MaxChunkBucket - 1) / 2
    for (dir <- dirs) {
      import org.apache.spark.sql.SparkSession
      val s: SparkSession = spark
      import s.implicits._
      val clips = operators.Multimodal.asMedia(spark, dir)
        .mapPartitions(operators.Multimodal.videoClipRows).toDF("doc_id", "fps")
        .localCheckpoint(true)
      val frames = clips.agg(sum(size(col("fps")))).head().getLong(0)
      val cands = operators.Multimodal.videoCandidates(clips).count()
      assert(cands <= capBoundPerFrame * frames,
        s"$dir: $cands candidates exceed the provable bound " +
          s"${capBoundPerFrame * frames}")
      // empirical ceiling ~3× today's measurements (≈3.5 clip-pairs per
      // frame at 500 docs, ≈30 at 5000 — the corpus's planted-dup density
      // rises ~n², the same shape the header documents for simhash)
      val perFrame = cands.toDouble / frames
      val ceiling = if (frames <= 10000) 12.0 else 90.0
      assert(perFrame <= ceiling,
        s"$dir: $perFrame candidates/frame — video candidate generation got hotter")
    }
  }

  test("embedding LSH candidates stay under the linear cap bound at all three scales") {
    import graft.functions.LshPlanes
    val capBoundPerVec =
      LshPlanes.tables.toDouble * LshPlanes.probeMasks(1).size *
        (LshPlanes.maxBucket - 1) / 2
    for (dir <- dirs) {
      val n = Tables.embeddings(spark, dir).count()
      val cands = operators.Similarity.neardupCandidates(spark, dir).count()
      assert(cands <= capBoundPerVec * n,
        s"$dir: $cands candidates exceed the provable bound ${capBoundPerVec * n}")
      // empirical ceiling: measured ~12 cand/vec at 500 and ~47 at 2000
      // (uniform data ⇒ the n²·probes/2^16 noise term still dominates at
      // these n; the cap turns it linear beyond cap·2^16 rows) — 3× slack
      val perVec = cands.toDouble / n
      val ceiling = if (n <= 1000) 40.0 else 150.0
      assert(perVec <= ceiling,
        s"$dir: $perVec candidates/vec — candidate generation got hotter")
    }
  }

  test("semantic_dedup within-cell pairs stay under the cell-cap bound at all three scales") {
    // pairs ≤ (CellCap−1)/2 per vector by construction (over-cap cells are
    // skipped entirely); the testdata's label cells are far smaller, so
    // also pin the tighter empirical per-vector ceiling — a cell-key
    // regression (e.g. collapsing labels) trips this before the cap bound
    val capBoundPerVec = (operators.Similarity.SemCellCap - 1) / 2.0
    for (dir <- dirs) {
      val n = Tables.embeddings(spark, dir).count()
      val pairs = operators.Similarity.semanticPairs(spark, dir).count()
      assert(pairs <= capBoundPerVec * n,
        s"$dir: $pairs pairs exceed the cap bound ${capBoundPerVec * n}")
      // measured: ~25 pairs/vec at 500 vectors (10 labels), ~100 at 2000
      // (cells grow with sf while label count stays fixed — the testdata
      // stand-in for "re-cluster finer as the corpus grows")
      val perVec = pairs.toDouble / n
      val ceiling = if (n <= 1000) 80.0 else 300.0
      assert(perVec <= ceiling,
        s"$dir: $perVec pairs/vec — cell granularity regressed")
    }
  }

  test("semdedup_trained band candidates stay under SemBand·n at all three scales") {
    // the trained-cell prune compares each member against at most SemBand
    // EARLIER-ranked cell-mates — the structural cap that keeps the
    // SemDeDup composition linear where the paper's full within-cluster
    // matrix is O(cell²). Both the aggregate bound AND the per-member
    // bound are asserted on data: a band-window regression (say, the
    // explode losing its upper clamp) trips here before it melts a run.
    for (dir <- dirs) {
      val rk = operators.Similarity.semdedupRanked(spark, dir)
      val n = rk.count()
      val cands = operators.Similarity.semdedupCandidates(rk)
      val total = cands.count()
      assert(total <= operators.Similarity.SemBand.toLong * n,
        s"$dir: $total band candidates exceed the SemBand bound " +
          s"${operators.Similarity.SemBand.toLong * n}")
      val maxPer = cands.groupBy("vec_id").count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxPer <= operators.Similarity.SemBand,
        s"$dir: a member carries $maxPer band partners > SemBand")
    }
  }

  test("heavy_hitters regime holds: exact top-10 clears the Misra-Gries retention bound") {
    // heavy_hitters is exact against its plain top-10 oracle ONLY when
    // every true top-10 token clears the n/(k+1) retention bound (k=64):
    // below it, a sketch pass may drop a true hitter and the registered
    // query would silently diverge from its oracle on a future, flatter
    // corpus. Assert the regime at every scale so a testdata change fails
    // HERE, loudly, instead of as an inscrutable oracle hash mismatch.
    for (dir <- dirs) {
      val toks = Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
      val n = toks.count()
      val top10 = toks.groupBy("tok").count()
        .orderBy(col("count").desc, col("tok")).limit(10).collect()
      val weakest = top10.map(_.getLong(1)).min
      val bound = n / 65.0 // n/(k+1), k = 64 sketch counters
      assert(weakest > bound,
        s"$dir: weakest top-10 count $weakest ≤ retention bound $bound — " +
          "heavy_hitters' exactness regime no longer holds on this corpus")
    }
  }
}
