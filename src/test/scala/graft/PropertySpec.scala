package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3) — raw ScalaCheck generators
  * with fixed seeds (the scalatest/scalacheck bridge artifact is not in the
  * offline cache, so sampling is driven manually; determinism is a feature
  * here anyway). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val tsGen: Gen[Long] =
    Gen.choose(1704067200000L, 1706745600000L) // Jan 2024, ms

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("dup_spans semantics on hand-built fixtures: cross-doc only, runs merge") {
    // The definitional edges the sf-corpus brute-force cross-check can't
    // guarantee to exercise: (1) a gram repeated WITHIN one doc but
    // nowhere else must NOT mark (dup = >=2 DISTINCT docs); (2) two docs
    // sharing one 8-token run yield exactly one span each with exact
    // boundaries; (3) overlapping marked grams merge into ONE maximal
    // span; (4) sub-8-token docs and empty docs yield nothing.
    val run = (1 to 8).map(i => s"w$i").mkString(" ")   // the shared run
    val docs = Seq(
      // doc 1: the same 8-gram twice, only here -> no span
      (1L, s"$run $run", "en", "s", 0L),
      // docs 2 and 3 share `run`, with distinct non-shared tails/heads
      (2L, s"$run t1 t2 t3 t4 t5 t6 t7 t8", "en", "s", 0L),
      (3L, s"h1 h2 h3 h4 h5 h6 h7 h8 $run", "en", "s", 0L),
      // docs 4 and 5 share a 10-token run -> 3 marked gram starts each,
      // overlapping -> ONE merged span of 10 tokens
      (4L, s"$run w9 w10 u1 u2 u3 u4 u5 u6 u7 u8", "en", "s", 0L),
      (5L, s"$run w9 w10 v1 v2 v3 v4 v5 v6 v7 v8", "en", "s", 0L),
      (6L, "short doc", "en", "s", 0L),
      (7L, "", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft_spanfix").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Dedup.dupSpans(spark, dir)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getAs[Long]("n_grams")))
    // doc 1: only its two `w1..w8` starts (0 and 8) mark — the gram is
    // cross-doc via docs 2-5 — and its wrap-around rotations (w2..w8 w1,
    // …) occur in no other doc, so they must NOT mark even though each
    // also appears "twice-ish" inside doc 1's repeated text. Starts
    // {0, 8} are exactly k apart -> one merged span [0, 15].
    val expect = Set(
      (1L, 0, 15, 2L),
      (2L, 0, 7, 1L),
      (3L, 8, 15, 1L),
      (4L, 0, 9, 3L),   // starts 0,1,2 of the 10-token shared run
      (5L, 0, 9, 3L))
    assert(got.toSet == expect, s"got: ${got.mkString(", ")}")
  }

  test("every row falls in exactly one tumbling window; counts are partition-complete") {
    for (s <- 1 to 10) {
      val rows = sample(Gen.listOfN(50, Gen.zip(tsGen, Gen.choose(0.0, 100.0))), s)
      val df = rows.toDF("ms", "value")
        .select(timestamp_millis($"ms").as("ts"), $"value", lit("t").as("event_type"))
      val agg = operators.WindowAgg.tumbling(df, "ts", Seq("event_type"), "value")
        .agg(sum("reading_count")).collect().head.getLong(0)
      assert(agg == rows.length, s"seed $s: window partition lost/duplicated rows")
    }
  }

  test("windowed min <= avg <= max for random batches") {
    for (s <- 1 to 10) {
      val rows = sample(Gen.listOfN(30, Gen.zip(tsGen, Gen.choose(-1000.0, 1000.0))), s)
      val df = rows.toDF("ms", "value")
        .select(timestamp_millis($"ms").as("ts"), $"value", lit("t").as("event_type"))
      // avg_value is rounded to 4 decimals by design → tolerance 1e-4
      val bad = operators.WindowAgg.tumbling(df, "ts", Seq("event_type"), "value")
        .filter($"min_value" > $"avg_value" + 1e-4 || $"avg_value" > $"max_value" + 1e-4)
        .count()
      assert(bad == 0, s"seed $s: agg ordering invariant violated")
    }
  }

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    for (s <- 1 to 10) {
      val rows = sample(Gen.listOfN(40, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 3))), s)
      val df = rows.toDF("a", "b")
      val once = df.dropDuplicates("a", "b")
      assert(once.dropDuplicates("a", "b").count() == once.count(), s"seed $s")
    }
  }

  test("stats invariants: corr in [-1,1], histogram partitions the rows, unpivot doubles them") {
    val sfDir = sf
    val corr = SparkEntry.queries("corr_stats")(spark, sfDir).collect()
    assert(corr.nonEmpty && corr.forall { r =>
      val c = r.getAs[Double]("corr_discount_tax"); c >= -1.0 && c <= 1.0
    })
    val hist = SparkEntry.queries("value_histogram")(spark, sfDir)
    val total = hist.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    val wideGroups = Tables.lineitem(spark, sfDir)
      .select("l_returnflag").distinct().count()
    assert(SparkEntry.queries("unpivot_lineitem")(spark, sfDir).count() == wideGroups * 2)
  }

  test("rolling-hash fingerprint is order-sensitive (permuted tokens differ)") {
    // drive the REGISTERED query against a temp sf-dir so the assertion
    // covers the actual operator, not a copy of its expression
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    Seq((1L, "alpha beta gamma delta", "en", "s", 22L),
        (2L, "delta gamma beta alpha", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = SparkEntry.queries("doc_fingerprint")(spark, dir)
      .orderBy("doc_id").collect().map(_.getAs[Long]("fingerprint"))
    // same multiset of tokens, different order → different fingerprints
    assert(fps.length == 2 && fps(0) != fps(1))
  }

  test("timeWeightedAvg equals the naive per-user integration on random series") {
    for (s <- 1 to 10) {
      val rows = sample(Gen.listOfN(60, Gen.zip(
        Gen.choose(1L, 4L),                      // user
        Gen.choose(0L, 1000L),                   // seconds offset
        Gen.choose(0.0, 100.0))), 3000 + s)
        .zipWithIndex
        .map { case ((u, sec, v), i) =>
          (u, i.toLong, math.rint(v * 100) / 100, sec * 1000000L) }
      val df = rows.toDF("user_id", "event_id", "value", "us")
      val got = operators.TimeSeries.timeWeightedAvg(df).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("twa")).toMap
      // naive reference: sort by (us, event_id), integrate value·Δt / span
      val expected = rows.groupBy(_._1).collect {
        case (u, xs) if xs.map(_._4).distinct.size > 1 =>
          val sorted = xs.sortBy(x => (x._4, x._2))
          val span = (sorted.last._4 - sorted.head._4).toDouble
          val area = sorted.sliding(2).collect {
            case Seq(a, b) => a._3 * (b._4 - a._4)
          }.sum
          u -> area / span
      }
      assert(got.keySet == expected.keySet, s"seed $s: user sets differ")
      expected.foreach { case (u, e) =>
        assert(math.abs(got(u) - e) < 1e-4, s"seed $s user $u: ${got(u)} vs $e")
      }
    }
  }

  test("repetitionMetrics matches naive token accounting on random texts") {
    val tokGen = Gen.oneOf("a", "b", "c", "dd", "e")
    for (s <- 1 to 10) {
      val docs = sample(Gen.listOfN(8, Gen.choose(1, 30).flatMap(n =>
        Gen.listOfN(n, tokGen))), 4000 + s)
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      val got = operators.TextAnalysis.repetitionMetrics(df).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_tokens"), r.getAs[Double]("dup_token_frac"),
            r.getAs[Double]("top_bigram_frac"))).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = toks.length
        val dup = 1.0 - toks.distinct.length.toDouble / n
        // .toList per window: Array windows compare by reference in groupBy
        val mc = if (n < 2) 0
          else toks.sliding(2).map(_.toList).toSeq.groupBy(identity).values.map(_.size).max
        val top = math.min(2L * mc, n).toDouble / n
        val (gn, gd, gt) = got(id)
        assert(gn == n && math.abs(gd - dup) < 1e-5 && math.abs(gt - top) < 1e-5,
          s"seed $s doc $id: got ${got(id)}, expected ($n, $dup, $top)")
      }
    }
  }

  test("FreqSketchAgg retains every item above n/(k+1) with bounded undercount, under any merge split") {
    // Misra–Gries guarantees: (1) every item with true count > n/(k+1)
    // survives; (2) surviving counters undercount by ≤ n/(k+1). Fuzz on
    // Zipf-ish data with vocabulary ≫ k so eviction actually happens,
    // split into random partitions and merged (the Catalyst partial-agg
    // path), which per the mergeable-summaries result keeps both bounds.
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 15) {
      val k = 8 + trial % 16
      val vocab = 200 + trial * 17
      // zipf-ish: token i drawn with weight ~ 1/(i+1)
      val weights = (0 until vocab).map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      def draw(): String = {
        val x = rnd.nextDouble() * total
        s"t${cum.indexWhere(x <= _)}"
      }
      val n = 3000 + trial * 100
      val items = Vector.fill(n)(draw())
      val truth = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val agg = functions.FreqSketchAgg(k)
      // random number of partitions, random assignment → fold each, merge all
      val parts = items.groupBy(_ => rnd.nextInt(1 + trial % 7)).values.toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
      assert(merged.entries.size <= k, s"trial $trial buffer overflow")
      val bound = n.toDouble / (k + 1)
      val kept = merged.entries.map(_._1).toSet
      truth.foreach { case (t, c) =>
        if (c > bound) assert(kept(t), s"trial $trial lost $t (count $c > bound $bound)")
      }
      merged.entries.foreach { case (t, est) =>
        val c = truth(t)
        assert(est <= c, s"trial $trial overcount for $t: $est > $c")
        assert(c - est <= bound, s"trial $trial undercount ${c - est} > $bound for $t")
      }
    }
  }

  test("TopKIdsAgg equals naive sorted top-k under random NaN/duplicate inputs and any merge split") {
    // the buffer had two real bugs (NaN comparisons, duplicate entries at
    // a full buffer) — fuzz it against the obvious specification: sort by
    // (value desc under Double.compare total order, id asc), take k
    val valGen = Gen.frequency(
      (8, Gen.choose(-100.0, 100.0).map(v => math.rint(v * 10) / 10)), // coarse → collisions
      (1, Gen.const(Double.NaN)),
      (1, Gen.oneOf(0.0, -0.0, 1.0)))
    for (s <- 1 to 30) {
      val k = 1 + (s % 5)
      val rows = sample(Gen.listOfN(40, Gen.zip(valGen, Gen.choose(0L, 19L))), 1000 + s)
      val agg = functions.TopKIdsAgg(k)
      val expected = rows
        .sortWith { (a, b) =>
          val c = java.lang.Double.compare(a._1, b._1)
          c > 0 || (c == 0 && a._2 < b._2)
        }
        .take(k).map(_._2).mkString(",")
      // single-buffer reduce
      val reduced = rows.foldLeft(agg.zero)((b, r) =>
        agg.reduce(b, functions.TopKAgg.In(r._1, r._2)))
      assert(reduced.entries.size <= k)
      assert(agg.finish(reduced) == expected, s"seed $s reduce-only")
      // arbitrary split + merge must agree (partial-aggregation contract)
      val cut = sample(Gen.choose(0, rows.length), 2000 + s)
      val (l, r) = rows.splitAt(cut)
      def buf(xs: List[(Double, Long)]) =
        xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, functions.TopKAgg.In(x._1, x._2)))
      val merged = agg.merge(buf(l), buf(r))
      assert(merged.entries.size <= k)
      assert(agg.finish(merged) == expected, s"seed $s split=$cut merge")
    }
  }

  test("cdcBounds kernel equals the SQL filter/aggregate formulation on adversarial texts") {
    // the kernel replaced the HOF formulation for speed — this pins the
    // semantics to the SQL (and therefore oracle) arithmetic, including
    // the cases a clean corpus never exercises: empty tokens from double
    // or trailing spaces (ascii('') = 0), single-char tokens, docs at or
    // below the window size
    val tokGen = Gen.frequency(
      (8, Gen.oneOf("key", "agg", "row", "x", "table", "part")), (1, Gen.const("")))
    for (s <- 1 to 10) {
      val texts = sample(Gen.listOfN(12, Gen.choose(1, 12).flatMap(n =>
        Gen.listOfN(n, tokGen))), 7000 + s)
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      val df = texts.toDF("id", "text")
      val kernel = df.select(col("id"),
        graft.functions.VectorExpressions.cdcBounds(col("text"), 4, 8).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val sqlWay = df.select(col("id"), expr(
        """concat(
             CASE WHEN size(split(text, ' ')) > 4 THEN
               filter(sequence(4, size(split(text, ' ')) - 1),
                 i -> aggregate(
                        transform(slice(split(text, ' '), i - 3, 4),
                          t -> CAST(ascii(substring(t, 1, 1)) * 131
                                    + ascii(substring(t, -1, 1))
                                    + length(t) AS BIGINT)),
                        CAST(0 AS BIGINT),
                        (acc, x) -> (acc * 1000003 + x) % 1000000007) % 8 = 0)
             ELSE CAST(array() AS ARRAY<INT>) END,
             array(size(split(text, ' '))))""").as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      texts.foreach { case (id, text) =>
        assert(kernel(id) == sqlWay(id),
          s"seed $s text '$text': kernel ${kernel(id)} != sql ${sqlWay(id)}")
      }
    }
  }

  test("bigramBuckets kernel equals the SQL transform formulation on adversarial texts") {
    // same pinning discipline as the cdcBounds fuzz: the kernel replaced
    // the chained-transform HOF for speed, and every oracle mirrors the
    // HOF arithmetic — so kernel == HOF on empty tokens (ascii('') = 0),
    // single-char tokens, sub-2-token docs (empty array), and multi-space
    // runs must hold exactly
    val tokGen = Gen.frequency(
      (8, Gen.oneOf("key", "agg", "row", "x", "table", "part")), (1, Gen.const("")))
    for (s <- 1 to 10) {
      val texts = sample(Gen.listOfN(12, Gen.choose(1, 12).flatMap(n =>
        Gen.listOfN(n, tokGen))), 7300 + s)
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      val df = texts.toDF("id", "text")
      val kernel = df.select(col("id"),
        graft.functions.VectorExpressions.bigramBuckets(col("text"), 256).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val sqlWay = df.select(col("id"), expr(
        """CASE WHEN size(split(text, ' ')) >= 2 THEN
             transform(sequence(1, size(split(text, ' ')) - 1),
               i -> (element_at(transform(split(text, ' '),
                       t -> CAST(ascii(substring(t, 1, 1)) * 131
                                 + ascii(substring(t, -1, 1))
                                 + length(t) AS BIGINT)), i) * 1000003
                     + element_at(transform(split(text, ' '),
                         t -> CAST(ascii(substring(t, 1, 1)) * 131
                                   + ascii(substring(t, -1, 1))
                                   + length(t) AS BIGINT)), i + 1)) % 256)
           ELSE CAST(array() AS ARRAY<BIGINT>) END""").as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      texts.foreach { case (id, text) =>
        assert(kernel(id) == sqlWay(id),
          s"seed $s text '$text': kernel ${kernel(id)} != sql ${sqlWay(id)}")
      }
    }
    // NULL text: the raw expression null-propagates, but the shared
    // withBigramBuckets basis must restore the HOF's empty-array
    // semantics — the streaming scorer's margin aggregate needs [] so a
    // null-text record scores margin=0/keep=false, never NULL
    val withNull = graft.operators.TextAnalysis.withBigramBuckets(
      Seq((1L, Some("a b")), (2L, None))
        .toDF("id", "text").select(col("id"), col("text")),
      "text", 256, "f")
      .select("id", "f")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(withNull(2L) == Seq.empty,
      s"null text must yield an empty bucket array, got ${withNull(2L)}")
    assert(withNull(1L).nonEmpty)
  }

  test("bpe double-pass replace equals greedy token-level merging on chained/run texts") {
    // bpe_merges rewrites ' l r ' occurrences with TWO sequential literal
    // replace passes; its exactness argument is that for l ≠ r this equals
    // "fuse every adjacent (l, r) token pair" — including chains
    // ("a b a b a b", where one pass skips alternate matches because its
    // scan consumes the shared boundary space) and runs of equal tokens
    // (never candidates). Fuzz that claim against a direct greedy merge
    // over the token list, on a tiny alphabet that maximizes chains.
    def greedy(toks: List[String], l: String, r: String): List[String] = toks match {
      case a :: b :: rest if a == l && b == r =>
        (a + "\u0001" + b) :: greedy(rest, l, r)
      case a :: rest => a :: greedy(rest, l, r)
      case Nil => Nil
    }
    val tokGen = Gen.oneOf("a", "b", "c")
    for (s <- 1 to 8) {
      val docs = sample(Gen.listOfN(24, Gen.choose(0, 10).flatMap(n =>
        Gen.listOfN(n, tokGen))), 9100 + s)
        .zipWithIndex.map { case (toks, i) => (i.toLong, toks) }
      val df = docs.map { case (i, toks) => (i, " " + toks.mkString(" ") + " ") }
        .toDF("id", "s")
      for (l <- Seq("a", "b", "c"); r <- Seq("a", "b", "c") if l != r) {
        val pat = lit(s" $l $r ")
        val rep = lit(s" $l\u0001$r ")
        val engine = df
          .select(col("id"), replace(replace(col("s"), pat, rep), pat, rep).as("s"))
          .collect().map(row => row.getLong(0) -> row.getString(1).trim).toMap
        docs.foreach { case (id, toks) =>
          val want = greedy(toks, l, r).mkString(" ")
          assert(engine(id) == want,
            s"seed $s pair ($l,$r) toks $toks: engine '${engine(id)}' != greedy '$want'")
        }
      }
    }
  }

  test("BMP encode→decode recovers exact channel sums for arbitrary payloads") {
    // the codec pair must agree with DIRECT byte arithmetic (the DuckDB
    // oracle's formulation) on any payload: empty, sub-row, exact-row
    // multiples, and both row orders — covering the padding/row-order
    // seams a fixture can only spot-check
    val byteGen = Gen.choose(0, 255).map(_.toByte)
    for (s <- 1 to 30) {
      val n = sample(Gen.oneOf(0, 1, 17, 18, 19, 36, 54, 200, 1000), s)
      val bytes = sample(Gen.listOfN(n, byteGen), s + 1000).toArray
      for (topDown <- Seq(false, true)) {
        val (w, h, sb, sg, sr) =
          operators.Multimodal.decodeBmp(
            operators.Multimodal.encodeBmp(bytes, topDown))
        assert(w == operators.Multimodal.BmpWidth)
        assert(h == math.max(1, (n + 17) / 18), s"seed $s n=$n height $h")
        def chan(off: Int) =
          bytes.indices.collect { case i if i % 3 == off => bytes(i) & 0xffL }.sum
        assert((sb, sg, sr) == (chan(0), chan(1), chan(2)),
          s"seed $s n=$n topDown=$topDown: ($sb,$sg,$sr)")
      }
    }
  }

  test("PNG encode→decode recovers exact channel sums for arbitrary payloads") {
    // the COMPRESSED codec must agree with direct byte arithmetic (the
    // DuckDB oracle's formulation) on any payload: the whole
    // deflate → chunk → CRC → inflate → unfilter pipeline is an identity
    // on the pixel stream or the query is wrong
    val byteGen = Gen.choose(0, 255).map(_.toByte)
    for (s <- 1 to 30) {
      val n = sample(Gen.oneOf(0, 1, 14, 15, 16, 30, 45, 200, 1000), s)
      val bytes = sample(Gen.listOfN(n, byteGen), s + 3000).toArray
      val (w, h, sr, sg, sb) =
        operators.Multimodal.decodePng(operators.Multimodal.encodePng(bytes))
      assert(w == operators.Multimodal.PngWidth)
      assert(h == math.max(1, (n + 14) / 15), s"seed $s n=$n height $h")
      def chan(off: Int) =
        bytes.indices.collect { case i if i % 3 == off => bytes(i) & 0xffL }.sum
      assert((sr, sg, sb) == (chan(0), chan(1), chan(2)),
        s"seed $s n=$n: ($sr,$sg,$sb)")
    }
  }

  test("WAV encode→decode recovers exact s16 stats for arbitrary payloads") {
    val byteGen = Gen.choose(0, 255).map(_.toByte)
    for (s <- 1 to 30) {
      val n = sample(Gen.oneOf(0, 1, 2, 3, 17, 64, 999), s)
      val bytes = sample(Gen.listOfN(n, byteGen), s + 2000).toArray
      val (cnt, sum, peak) =
        operators.Multimodal.decodeWav(operators.Multimodal.encodeWav(bytes))
      val samples = bytes.grouped(2).map { pair =>
        val lo = pair(0) & 0xff
        val hi = if (pair.length > 1) pair(1) & 0xff else 0
        ((lo | (hi << 8)).toShort: Int)
      }.toSeq
      assert(cnt == (n + 1) / 2, s"seed $s n=$n cnt=$cnt")
      assert(sum == samples.map(v => math.abs(v).toLong).sum,
        s"seed $s n=$n sum=$sum")
      assert(peak == (if (samples.isEmpty) 0 else samples.map(math.abs).max),
        s"seed $s n=$n peak=$peak")
    }
  }

  test("Y4M encode→decode recovers exact plane sums for arbitrary payloads") {
    // the video container must agree with direct 48-byte framing
    // arithmetic (the DuckDB oracle's formulation) on any payload —
    // including the zero-padded last frame and the min-1-frame empty case
    val byteGen = Gen.choose(0, 255).map(_.toByte)
    for (s <- 1 to 30) {
      val n = sample(Gen.oneOf(0, 1, 31, 32, 33, 47, 48, 49, 96, 1000), s)
      val bytes = sample(Gen.listOfN(n, byteGen), s + 4000).toArray
      val (w, h, fs) =
        operators.Multimodal.decodeY4m(operators.Multimodal.encodeY4m(bytes))
      assert(w == operators.Multimodal.Y4mWidth &&
        h == operators.Multimodal.Y4mHeight)
      assert(fs.length == math.max(1, (n + 47) / 48), s"seed $s n=$n")
      def plane(f: Int, lo: Int, hi: Int) =
        (lo until hi).map(j => f * 48 + j)
          .collect { case k if k < n => bytes(k) & 0xffL }.sum
      fs.zipWithIndex.foreach { case ((ls, cs), f) =>
        assert(ls == plane(f, 0, 32), s"seed $s n=$n frame $f luma")
        assert(cs == plane(f, 32, 48), s"seed $s n=$n frame $f chroma")
      }
    }
  }

  test("chat JSON escape → strict parse round-trips arbitrary unicode strings") {
    // the codec pair must be a true inverse on ANY string — astral
    // codepoints (escaped as surrogate PAIRS since round 11's unpaired-
    // half rejection), raw control chars, quotes/backslashes, and the
    // empty string
    import operators.ChatData
    val cpGen = Gen.frequency(
      6 -> Gen.choose(0x20, 0x7e),          // printable ASCII
      2 -> Gen.choose(0x00, 0x1f),          // control chars (escaped)
      2 -> Gen.oneOf('"'.toInt, '\\'.toInt, '/'.toInt),
      2 -> Gen.choose(0xa0, 0x2fff),        // BMP unicode
      2 -> Gen.choose(0x10000, 0x10fff))    // astral (surrogate pairs)
    for (s <- 1 to 40) {
      val n = sample(Gen.choose(0, 60), s)
      val cps = sample(Gen.listOfN(n, cpGen), s + 9000)
      val str = cps.foldLeft(new java.lang.StringBuilder) {
        (b, cp) => b.appendCodePoint(cp)
      }.toString
      ChatData.parseJson("\"" + ChatData.escapeJson(str) + "\"") match {
        case ChatData.JStr(got) => assert(got == str, s"seed $s")
        case other => fail(s"seed $s: parsed $other")
      }
    }
  }

  test("frameHash64 invariants: gain-shift invariance, constant frames hash 0") {
    import operators.Multimodal
    val lumaGen = Gen.listOfN(32, Gen.choose(0, 200))
    for (s <- 1 to 30) {
      val luma = sample(lumaGen, s).toArray
      val fp = Multimodal.frameHash64(luma)
      // a uniform brightness shift moves no order comparison
      assert(fp == Multimodal.frameHash64(luma.map(_ + sample(Gen.choose(1, 55), s))))
      // bit 63 is structurally unused
      assert((fp >>> 63) == 0L, s"seed $s")
    }
    // a constant frame has no neighbor or mean inequality anywhere
    assert(Multimodal.frameHash64(Array.fill(32)(7)) == 0L)
    assert(Multimodal.frameHash64(Array.empty[Int]) == 0L)
  }

  test("polyHash/polyHash2 inline UTF-8 decode matches the JDK codepoint fold") {
    // the kernels decode codepoints straight off UTF-8 bytes (hot path);
    // pin them against the unambiguous String.codePointAt reference over
    // ASCII, Latin-1, CJK, and surrogate-pair (emoji) content
    import org.apache.spark.unsafe.types.UTF8String
    def ref(s: String, mul: Long, seed: Long, p: Long): Long = {
      var acc = seed; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * mul + cp) % p
        i += Character.charCount(cp)
      }
      acc
    }
    val pool = "aZ9 éü€的了😀🎉ÿ߿￿😀"
    val cps = pool.codePoints().toArray
    for (seed <- 1 to 200) {
      val rnd = new scala.util.Random(seed)
      val sb = new java.lang.StringBuilder()
      (0 until rnd.nextInt(12)).foreach(_ =>
        sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      val s = sb.toString
      val u = UTF8String.fromString(s)
      assert(graft.functions.VectorKernels.polyHash(u) ==
        ref(s, 131, 0, graft.functions.VectorKernels.MinHashP), s"polyHash '$s'")
      assert(graft.functions.VectorKernels.polyHash2(u) ==
        ref(s, 137, 7, 998244353L), s"polyHash2 '$s'")
    }
  }

  test("audio_features frame math replays against direct sample arithmetic") {
    val byteGen = Gen.choose(0, 255).map(_.toByte)
    val W = operators.Multimodal.AudioFrame
    for (s <- 1 to 30) {
      // sizes straddling the 256-sample frame edge (512/514 bytes) matter
      val n = sample(Gen.oneOf(0, 1, 2, 511, 512, 513, 514, 2000), s)
      val bytes = sample(Gen.listOfN(n, byteGen), s + 4000).toArray
      val rec = operators.Multimodal.MediaRecord(1L, "audio", bytes)
      val f = operators.Multimodal.audioFeatures(Iterator(rec)).next()
      val samples = bytes.grouped(2).map { pair =>
        val lo = pair(0) & 0xff
        val hi = if (pair.length > 1) pair(1) & 0xff else 0
        ((lo | (hi << 8)).toShort: Int)
      }.toArray
      assert(f.n_samples == samples.length)
      assert(f.energy == samples.map(v => v.toLong * v).sum, s"seed $s energy")
      assert(f.zero_crossings == samples.indices.drop(1)
        .count(i => samples(i - 1).toLong * samples(i) < 0), s"seed $s zc")
      val fes = samples.grouped(W).map(_.map(v => v.toLong * v).sum).toSeq
      if (fes.isEmpty) assert(f.loud_frame == -1 && f.loud_energy == 0L)
      else {
        assert(f.loud_energy == fes.max, s"seed $s loud energy")
        assert(f.loud_frame == fes.indexOf(fes.max), s"seed $s loud frame")
      }
    }
  }

  // --------------------------------------------- round-10 kernel invariants

  /** Valid-unicode string generator: BMP letters/punct/controls plus
    * astral codepoints, surrogate-pair correct by construction. */
  private val uniGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.choose(0x20, 0x7E),
    2 -> Gen.choose(0xA0, 0x2FF),
    1 -> Gen.choose(0x4E00, 0x4FFF),
    1 -> Gen.oneOf(0x09, 0x0A, 0x0D, 0x1F600, 0x10000, 0xFFFD)))
    .map(_.flatMap(Character.toChars(_)).mkString)

  test("textnorm invariants: nfc idempotent, garble/repair inverse, length laws") {
    import graft.functions.TextNormKernels._
    for (s <- 0L until 200L) {
      val t = sample(uniGen, s)
      assert(nfc(nfc(t)) == nfc(t), s"seed $s: nfc not idempotent")
      val g = garble(t)
      assert(repair(g) == t, s"seed $s: repair(garble) != id")
      // garble length = UTF-8 byte count; pure-ASCII garbles to itself
      assert(g.length == t.getBytes("UTF-8").length, s"seed $s: garble length")
      if (t.forall(_ < 0x80)) assert(g == t, s"seed $s: ascii garble not id")
      // repair never fabricates: output is the input or a strict decode of it
      val r = repair(t)
      assert((r eq t) || new String(
        r.getBytes("UTF-8"), "UTF-8") == r, s"seed $s: repair fabricated")
    }
  }

  test("json codec invariants: escape/parse round-trip, nested value round-trip") {
    import graft.operators.ChatData._
    for (s <- 0L until 200L) {
      val t = sample(uniGen, s)
      assert(parseJson("\"" + escapeJson(t) + "\"") == JStr(t),
        s"seed $s: string round-trip")
      // a transcript built from the string round-trips through the
      // renderer's exact message shape
      val chat = s"""{"messages":[{"role":"user","content":"${escapeJson(t)}"}]}"""
      parseJson(chat) match {
        case JObj(Vector(("messages", JArr(Vector(JObj(kv)))))) =>
          assert(kv == Vector("role" -> JStr("user"), "content" -> JStr(t)),
            s"seed $s: message shape")
        case other => fail(s"seed $s: unexpected $other")
      }
    }
  }

  test("head metadata invariants: render→parse round-trips arbitrary description text") {
    import graft.operators.WebIngest
    for (s <- 0L until 100L) {
      val t = sample(uniGen, s)
      // strip the one char class the renderer never emits raw into a page
      // body anyway (paraChunks separates on single spaces, so any string
      // is legal content) — no stripping needed: the escape must carry ALL
      val m = WebIngest.parseHead(WebIngest.renderHtmlMeta(3L, "srcp", "en", t))
      assert(m.metas("description")
        == t.split(" ", -1).take(WebIngest.DescTokens).mkString(" "),
        s"seed $s: description round-trip")
      assert(m.htmlLang == "en" && m.title == "Doc 3 (srcp)")
    }
  }
}
