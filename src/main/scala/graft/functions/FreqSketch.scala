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
  * (and trivially true when the vocabulary fits in k, as on the
  * testdata). PropertySpec fuzzes BOTH properties on Zipf data with
  * vocabulary ≫ k under random partition splits.
  */
case class FreqSketchAgg(k: Int)
  extends Aggregator[String, FreqSketch.Buf, Seq[String]] {
  import FreqSketch.Buf

  override def zero: Buf = Buf(Vector.empty)

  override def reduce(b: Buf, tok: String): Buf = {
    val e = b.entries
    val i = e.indexWhere(_._1 == tok)
    if (i >= 0) Buf(e.updated(i, (tok, e(i)._2 + 1)))
    else if (e.size < k) Buf(e :+ (tok, 1L))
    // full and absent: the classic decrement-all step — drops every
    // counter by one, evicting zeros; this is what bounds undercount
    else Buf(e.map { case (t, c) => (t, c - 1) }.filter(_._2 > 0))
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    (a.entries ++ b.entries).foreach { case (t, c) =>
      m(t) = m.getOrElse(t, 0L) + c
    }
    if (m.size <= k) Buf(m.toVector)
    else {
      // subtract the (k+1)-th largest count from everything and keep the
      // positive residue — the mergeable-summaries reduction, error adds
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      Buf(m.toVector.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0))
    }
  }

  /** Candidate keys, sorted for a deterministic value (the exact recount
    * makes candidate ORDER irrelevant to results, but a stable array
    * keeps runs reproducible). An array, NOT a joined string: a
    * delimiter-joined transport would shred any token containing the
    * delimiter and silently drop it from the recount. */
  override def finish(b: Buf): Seq[String] =
    b.entries.map(_._1).sorted

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object FreqSketch {
  /** ≤k (item, lower-bound count) counters. */
  final case class Buf(entries: Seq[(String, Long)])

  /** Column function: `candidates(k)(tokenCol)` → sorted candidate-key
    * array. */
  def candidates(k: Int): Column => Column = {
    val fn = udaf(FreqSketchAgg(k), Encoders.STRING)
    tok => fn(tok)
  }
}
