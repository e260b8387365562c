package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the custom Catalyst expressions
  * ([[VectorExpressions]]). Static methods so generated code can call them
  * directly (`graft.functions.VectorKernels.dotFF(a, b)`) — no virtual
  * dispatch, no per-row allocation, no boxing.
  *
  * Arithmetic is float→double widening multiply + left-to-right double
  * adds: bit-identical to the higher-order-function formulation
  * (`CAST(x AS DOUBLE)` then fold) these kernels replace, and to DuckDB's
  * `list_reduce` fold — so swapping them in changes nothing the oracle can
  * see.
  *
  * NULL-element contract: a vector with a NULL element is malformed, and
  * the dot/distance kernels return NaN for it. ArrayData.getFloat/getDouble
  * silently read a null slot as 0.0, so without the isNullAt probe Spark
  * would fold null→0 while DuckDB's list arithmetic folds null→NULL — a
  * partially-null vector would pass Spark's `norm > 0` universe gate but
  * fail DuckDB's (hostile-embeddings sweep finding). NaN fails every
  * two-sided `norm > 0 AND norm < MaxVecNorm` gate in BOTH engines
  * (NULL compares to neither bound; NaN sorts above the upper one), so
  * malformed vectors leave the similarity universe identically.
  */
object VectorKernels {

  /** dot of two float arrays (double accumulation). */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
    }
    acc
  }

  /** dot of a float array with a double array (e.g. LSH plane literals). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1
    }
    acc
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      acc += a.getDouble(i) * b.getDouble(i); i += 1
    }
    acc
  }

  def l2F(a: ArrayData): Double = math.sqrt(dotFF(a, a))
  def l2D(a: ArrayData): Double = math.sqrt(dotDD(a, a))

  /** Binary (sign) quantization: bit i of the result is set iff
    * `a[i] > 0`. 32× smaller than the float vector; Hamming distance
    * over the packed code (`bit_count(a ^ b)` — both built-in, codegen'd)
    * approximates angular distance, the RaBitQ/binary-embedding
    * shortlist trick. Strict `> 0` so the bit is a pure function of the
    * IEEE sign+zero classification — float→double widening can't move a
    * value across the threshold, which keeps the DuckDB mirror
    * (`v[i] > 0` over DOUBLE[]) exact.
    *
    * Vectors wider than 64 dims FAIL LOUDLY: one long holds 64 sign
    * bits, and silently truncating would rank shortlists on half the
    * vector (recall collapse) while the all-dims oracle quietly
    * diverged — if embeddings ever widen, this kernel must grow a
    * multi-word code (array<long> + summed bit_counts), not a cap. */
  private def signPackLen(n: Int): Int = {
    require(n <= 64,
      s"sign_pack packs at most 64 dims into one long; got $n — " +
        "widen the code to array<long> before widening the embeddings")
    n
  }

  def signPackF(a: ArrayData): Long = {
    val n = signPackLen(a.numElements())
    var code = 0L
    var i = 0
    while (i < n) { if (a.getFloat(i) > 0f) code |= (1L << i); i += 1 }
    code
  }

  def signPackD(a: ArrayData): Long = {
    val n = signPackLen(a.numElements())
    var code = 0L
    var i = 0
    while (i < n) { if (a.getDouble(i) > 0d) code |= (1L << i); i += 1 }
    code
  }

  /** Squared L2 distance over one aligned slice of two vectors (the PQ
    * subspace kernel): Σ_{i<len} (a[off+i] − b[off+i])², each operand
    * widened to double BEFORE the subtract — identical to DuckDB folding
    * over `CAST(embedding AS DOUBLE[])` slices, so ADC tables match
    * bit-for-bit. Out-of-range slices contribute 0 (min guard). */
  def subSqFF(a: ArrayData, b: ArrayData, off: Int, len: Int): Double = {
    val n = math.min(math.min(a.numElements(), b.numElements()), off + len)
    var acc = 0.0
    var i = math.max(off, 0)
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  def subSqDD(a: ArrayData, b: ArrayData, off: Int, len: Int): Double = {
    val n = math.min(math.min(a.numElements(), b.numElements()), off + len)
    var acc = 0.0
    var i = math.max(off, 0)
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Distinct word n-gram shingles of a whitespace-tokenized text, one
    * pass. Replaces the `transform(sequence(...))` higher-order-function
    * formulation, which is interpreted AND re-evaluates the `split` child
    * per lambda iteration after projection collapse (measured seconds/doc
    * at sf0.1). First-occurrence order — stable, though nothing downstream
    * depends on element order (set semantics). */
  def wordShingles(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    // limit -1 keeps trailing empty tokens — the semantics of BOTH Spark
    // SQL split() and DuckDB string_split(), which every dedup oracle uses.
    // Scala's split(Char) drops them, so "x y z " would shingle differently
    // here than in the oracles (and than simhash_pairs, which tokenizes via
    // SQL split) — a cross-engine hash mismatch lying in wait for the first
    // trailing-space document.
    val toks = text.toString.split(" ", -1)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** MinHash constants: 16 linear permutations (a·h + b) mod P of one base
    * polynomial hash. Fixed literals, mirrored verbatim into the DuckDB
    * oracle SQL so signatures are engine-identical. */
  val MinHashP = 1000000007L
  val minHashA: Array[Long] = Array.tabulate(16)(k => (2654435761L * (k + 1)) % MinHashP | 1L)
  val minHashB: Array[Long] = Array.tabulate(16)(k => (40503L * (k + 7) * (k + 7)) % MinHashP)

  /** Content-defined chunk boundaries over a whitespace-tokenized text:
    * position i (1-based token count) is a boundary when the polynomial
    * fold of the last `w` token codes ≡ 0 mod `d`; the final position n
    * is always appended so chunks tile the document. One pass, O(n·w) —
    * replaces the filter/aggregate higher-order formulation, which is
    * interpreted AND re-evaluates the token-codes child per lambda
    * iteration (measured 12 s for the whole corpus at sf0.1 vs sub-second
    * here). Token code = first-char codepoint · 131 + last-char codepoint
    * + length, the same arithmetic the DuckDB oracle and doc_fingerprint
    * compute — on CODEPOINTS, not UTF-16 units: ascii()/length() in both
    * engines are codepoint-based, and a charAt/String.length fold
    * diverges on the first surrogate-pair token (emoji) the corpus
    * carries (hostile-corpus sweep finding). */
  def cdcBounds(text: UTF8String, w: Int, d: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val codes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks(i)
      codes(i) =
        if (t.isEmpty) 0L
        else t.codePointAt(0).toLong * 131 +
          t.codePointBefore(t.length).toLong +
          t.codePointCount(0, t.length).toLong
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = w
    while (i < n) {
      var acc = 0L
      var j = i - w
      while (j < i) { acc = (acc * 1000003 + codes(j)) % 1000000007L; j += 1 }
      if (acc % d == 0) out += i
      i += 1
    }
    out += n
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Winnowing fingerprint (the MOSS scheme): hash every ORDERED word
    * k-gram with [[polyHash]], slide a w-window over the hash sequence,
    * select each window's minimum, return the sorted distinct selections.
    * The guarantee that makes it the copy-detection fingerprint: any two
    * documents sharing ≥ w+k-1 consecutive tokens share at least one
    * selected hash. Below k tokens the fingerprint is empty; below w
    * grams the single window is the whole sequence. One pass, O(n·w). */
  def winnowFingerprint(text: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - k + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val gh = new Array[Long](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      gh(i) = polyHash(UTF8String.fromString(sb.toString))
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m < w) {
      var mn = gh(0); i = 1
      while (i < m) { if (gh(i) < mn) mn = gh(i); i += 1 }
      sel.add(mn)
    } else {
      i = 0
      while (i <= m - w) {
        var mn = gh(i)
        var j = i + 1
        while (j < i + w) { if (gh(j) < mn) mn = gh(j); j += 1 }
        sel.add(mn)
        i += 1
      }
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Byte-polynomial hash of a token (ASCII-safe: byte value == codepoint,
    * matching the oracle's unicode(substring) per-char fold). */
  /** T5-style span-corruption accounting in ONE greedy left-to-right
    * pass over the whitespace tokens: a span STARTS at any unmasked
    * token whose content hash ([[polyHash]], the engine-neutral char
    * polynomial) is ≡ 0 (mod 7, ≈14% of tokens); span length is
    * 1 + (h/7) % 3 (1-3 tokens, mean 2 → ≈28% tokens masked). No new
    * span starts inside a span. Content-keyed and position-free, so the
    * same document always corrupts identically — reproducible denoising
    * batches — and the DuckDB oracle can replay the exact fold. Returns
    * [n_tokens, n_masked, n_spans]. */
  def spanCorruption(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    var rem = 0L; var masked = 0L; var spans = 0L
    var i = 0
    while (i < toks.length) {
      if (rem > 0) { masked += 1; rem -= 1 }
      else {
        val h = polyHash(UTF8String.fromString(toks(i)))
        if (h % 7 == 0) { masked += 1; spans += 1; rem = (h / 7) % 3 }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](toks.length.toLong, masked, spans))
  }

  /** Char-polynomial fold over Unicode CODEPOINTS — the oracles compute
    * `unicode(substring(g, i, 1))` per character, which is the codepoint,
    * not the UTF-8 byte: a byte fold agrees on ASCII but diverges on the
    * first accented char or emoji (hostile-corpus sweep finding — doc
    * with 'café … 😀' fingerprinted differently per engine). Codepoints
    * decode straight off the UTF-8 bytes (no String round-trip: this
    * fold runs per token/gram in every dedup pass, and a toString here
    * measured ~20% on the simhash/winnow queries). */
  def polyHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = b0
      var len = 1
      if (b0 >= 0xF0) {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        len = 4
      } else if (b0 >= 0xE0) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)
        len = 3
      } else if (b0 >= 0xC0) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
        len = 2
      }
      acc = (acc * 131 + cp) % MinHashP
      i += len
    }
    acc
  }

  /** Full 16-element MinHash signature of a gram array in ONE pass — no
    * explode, no per-permutation scan, no shuffle: the signature is a
    * scan-side expression, which is what makes MinHash O(n) at 100 TB. */
  def minhashSig(grams: ArrayData): ArrayData = {
    val n = grams.numElements()
    val sig = Array.fill(16)(Long.MaxValue)
    var g = 0
    while (g < n) {
      val s = grams.getUTF8String(g)
      if (s != null) {
        val h = polyHash(s)
        var k = 0
        while (k < 16) {
          val v = (minHashA(k) * h + minHashB(k)) % MinHashP
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sig.map(v => java.lang.Long.valueOf(v)): Array[Any])
  }

  /** The sign-LSH plane bank as a flat (tables·planesPerTable) × dims
    * matrix, materialized once at class-init from [[LshPlanes.planes]].
    * Fusing all 256 plane dots into one kernel keeps the bank OUT of the
    * plan tree: as per-plane array literals the analyzed plan was ~190 KB
    * and Catalyst spent more time transforming it than the executors spent
    * running it. Arithmetic per plane is the identical left-to-right
    * float→double widening fold as [[dotFD]], so the SQL oracles (which
    * re-derive the bank from [[LshPlanes.sqlValuesRows]]) still agree
    * bit-for-bit. */
  private lazy val lshPlanesFlat: Array[Array[Double]] =
    LshPlanes.planes.flatten.map(_.toArray).toArray

  private def lshBuckets(v: ArrayData, isFloat: Boolean): ArrayData = {
    val tables = LshPlanes.tables
    val planes = LshPlanes.planesPerTable
    val n = math.min(v.numElements(), LshPlanes.dims)
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val w = lshPlanesFlat(t * planes + p)
        var acc = 0.0
        var i = 0
        if (isFloat) while (i < n) { acc += v.getFloat(i).toDouble * w(i); i += 1 }
        else while (i < n) { acc += v.getDouble(i) * w(i); i += 1 }
        bucket = bucket * 2 + (if (acc >= 0.0) 1 else 0)
        p += 1
      }
      out(t) = java.lang.Integer.valueOf(bucket)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All [[LshPlanes.tables]] bucket signatures of a vector in one pass —
    * element t is table t's bucket, plane 0 the most significant bit. */
  def lshBucketsF(v: ArrayData): ArrayData = lshBuckets(v, isFloat = true)
  def lshBucketsD(v: ArrayData): ArrayData = lshBuckets(v, isFloat = false)

  /** Second polynomial basis for the upper SimHash half (different
    * multiplier + modulus, both ~2^30 so bits 0..31 are well-populated). */
  val SimHashP2 = 998244353L

  /** Codepoint fold like [[polyHash]] (same inline UTF-8 decode) — the
    * oracle's unicode() per-char formula; a byte fold diverges on the
    * first non-ASCII char. */
  def polyHash2(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 7L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = b0
      var len = 1
      if (b0 >= 0xF0) {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        len = 4
      } else if (b0 >= 0xE0) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)
        len = 3
      } else if (b0 >= 0xC0) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
        len = 2
      }
      acc = (acc * 137 + cp) % SimHashP2
      i += len
    }
    acc
  }

  /** 64-bit SimHash over an array of string tokens, ±1 per-bit votes, sign
    * pack. Bit basis is the engine-neutral polynomial pair ([[polyHash]]
    * low 32 bits, [[polyHash2]] high 32 bits) so the DuckDB oracle can
    * reproduce fingerprints exactly. One pass, no intermediate arrays. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s != null) {
        val h1 = polyHash(s)
        val h2 = polyHash2(s)
        var j = 0
        while (j < 32) {
          if (((h1 >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          if (((h2 >>> j) & 1L) == 1L) votes(32 + j) += 1 else votes(32 + j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Per-term frequencies of a whitespace-tokenized text, one tokenize
    * pass: returns `[tf(terms(0)), …, tf(terms(k-1)), n_tokens]` (token
    * count rides along so BM25's length normalization needs no second
    * split). Replaces the `size(filter(toks, x = t))` per-term
    * formulation — a CodegenFallback higher-order lambda that re-walks
    * the token array once PER TERM (the cdcBounds story again: measured
    * 4.2 s for bm25_topk at sf0.1 vs sub-second kernelized). Same `split`
    * limit -1 trailing-empty-token semantics as the oracles'
    * string_split. */
  def termTfs(text: UTF8String, terms: Array[String]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val k = terms.length
    val counts = new Array[Long](k)
    var i = 0
    while (i < toks.length) {
      var j = 0
      while (j < k) {
        if (terms(j).equals(toks(i))) counts(j) += 1
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](k + 1)
    i = 0
    while (i < k) { out(i) = counts(i); i += 1 }
    out(k) = toks.length.toLong
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Hashed-bigram bucket codes of a whitespace-tokenized text — the
    * shared feature basis of quality_classifier, dsir_weights and the
    * streaming quality scorer. One bucket per adjacent token pair:
    *   code(t) = ascii(first char)·131 + ascii(last char) + length(t)
    *   bucket(i) = (code(i)·1000003 + code(i+1)) mod b
    * Exactly the `transform(split(…))` higher-order formulation this
    * replaces (and the oracles' SQL mirror): same split limit -1
    * trailing-empty semantics, ascii('') = 0, codepoint-counted length.
    * The HOF version is interpreted AND, after projection collapse, gets
    * inlined ~6× into explode's size() pushdown filter — measured ~30 s
    * per corpus pass at sf0.1 vs sub-second kernelized (the cdcBounds /
    * termTfs story again). Sub-2-token docs return an empty array
    * (explode then drops the row, like the HOF's empty branch). */
  def bigramBuckets(text: UTF8String, b: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val codes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks(i)
      if (t.isEmpty) codes(i) = 0L
      else {
        val first = t.codePointAt(0)
        val last = t.codePointBefore(t.length)
        codes(i) = first.toLong * 131L + last.toLong +
          t.codePointCount(0, t.length).toLong
      }
      i += 1
    }
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = (codes(i) * 1000003L + codes(i + 1)) % b
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
