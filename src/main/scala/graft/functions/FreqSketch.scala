package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * heavy-hitters primitive for the two-pass pattern `heavy_hitters`
  * registers: pass 1 runs this sketch (one tiny bounded buffer per map
  * task, mergeable, so Catalyst gives it partial aggregation for free)
  * to produce a CANDIDATE set; pass 2 exact-counts only the candidates.
  * At 100 TB that turns "count every distinct token then sort" into
  * "ship ≤k counters per task, then one broadcast-filtered recount".
  *
  * Guarantee (Misra–Gries, and Agarwal et al.'s mergeability result):
  * after summarizing n items with capacity k, every item whose true
  * count exceeds n/(k+1) is retained, and retained counters undercount
  * by at most n/(k+1). The registered query's exactness therefore needs
  * its true top-m to clear n/(k+1) — the realistic heavy-hitter regime
  * (guarded per scale factor by CandidateBoundSpec, and trivially true
  * when the vocabulary fits in k, as on the testdata). PropertySpec
  * fuzzes BOTH properties on Zipf data with vocabulary ≫ k under random
  * partition splits.
  *
  * The buffer is a mutable insertion-ordered hash map mutated in place
  * (Kryo-encoded at partial-aggregation boundaries only), so the
  * per-row reduce is an amortized O(1) hash update with no per-token
  * buffer copy — the immutable-Vector formulation this replaces did an
  * O(k) `indexWhere` plus a full Vector rebuild on EVERY input token,
  * per-row allocation at odds with the kernel discipline everywhere
  * else. The rare full-buffer decrement walk is O(k) and amortizes to
  * O(1) per input (each walk removes at least one counter unit per
  * surviving entry, paid for by the k inserts that filled it).
  */
case class FreqSketchAgg(k: Int)
  extends Aggregator[String, FreqSketch.Buf, Seq[String]] {
  import FreqSketch.Buf

  override def zero: Buf = new Buf(new java.util.LinkedHashMap[String, java.lang.Long])

  override def reduce(b: Buf, tok: String): Buf = {
    val m = b.m
    val cur = m.get(tok)
    if (cur != null) m.put(tok, cur + 1L)
    else if (m.size < k) m.put(tok, 1L)
    else {
      // full and absent: the classic decrement-all step — drops every
      // counter by one, evicting zeros; this is what bounds undercount
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val m = a.m
    val bit = b.m.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      val cur = m.get(e.getKey)
      m.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (m.size > k) {
      // subtract the (k+1)-th largest count from everything and keep the
      // positive residue — the mergeable-summaries reduction, error adds
      val counts = new Array[Long](m.size)
      var i = 0
      val vit = m.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k)
      val eit = m.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  /** Candidate keys, sorted for a deterministic value (the exact recount
    * makes candidate ORDER irrelevant to results, but a stable array
    * keeps runs reproducible). An array, NOT a joined string: a
    * delimiter-joined transport would shred any token containing the
    * delimiter and silently drop it from the recount. */
  override def finish(b: Buf): Seq[String] = {
    import scala.jdk.CollectionConverters._
    b.m.keySet().asScala.toSeq.sorted
  }

  // kryo, not Encoders.product: the buffer is a mutable Java map so the
  // hot path never rebuilds an immutable Seq; it only crosses the wire
  // at partial-output boundaries, ≤k entries each time
  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object FreqSketch {
  /** ≤k (item, lower-bound count) counters, insertion-ordered, mutated
    * in place by the aggregator. */
  final class Buf(val m: java.util.LinkedHashMap[String, java.lang.Long])
    extends Serializable {
    /** Immutable view for tests/inspection. */
    def entries: Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      m.entrySet().asScala.map(e => (e.getKey, e.getValue.longValue())).toSeq
    }
  }

  /** Column function: `candidates(k)(tokenCol)` → sorted candidate-key
    * array. */
  def candidates(k: Int): Column => Column = {
    val fn = udaf(FreqSketchAgg(k), Encoders.STRING)
    tok => fn(tok)
  }
}
