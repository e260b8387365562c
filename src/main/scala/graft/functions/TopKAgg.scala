package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (`Aggregator[IN, BUF, OUT]`): ids of the top-k
  * rows per group by (value desc, id asc), as a comma-joined string.
  *
  * This is the aggregate-function face of the top-k capability
  * ([[graft.plans.TopKPerKey]] is the whole-operator face): because it's an
  * Aggregator, Catalyst gives it partial aggregation for free — each
  * map task reduces its rows into a ≤k-element buffer, the shuffle carries
  * one small buffer per (task, group), and merge combines buffers — the
  * same two-phase shape as the physical operator, usable anywhere an
  * aggregate expression fits (batch groupBy, streaming update-mode agg).
  *
  * The buffer is kept SORTED (value desc, id asc) and bounded at k, so
  * reduce is an insertion into ≤k elements and merge is a bounded merge —
  * no per-row allocation beyond the buffer itself. Deterministic by
  * construction (total tiebreak on id), hence oracle-checkable.
  */
case class TopKIdsAgg(k: Int)
  extends Aggregator[TopKAgg.In, TopKAgg.Buf, String] {
  import TopKAgg.{Buf, In}

  override def zero: Buf = Buf(Vector.empty)

  // total order via Double.compare: a plain `>` is false both ways for NaN,
  // which let a NaN entry bypass the reject branch and grow the buffer past
  // k (and broke the sorted invariant). Under compare, NaN ranks above every
  // real value — defined, deterministic, and the buffer stays bounded.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  // full-buffer reject unless e is STRICTLY better than the current last:
  // `better(last, e)` missed the equal-entry case (false both ways), which
  // also appended past k on duplicate (value, id) inputs
  private def insert(buf: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val i = buf.indexWhere(x => better(e, x))
      val at = if (i < 0) buf.size else i
      (buf.take(at) :+ e) ++ buf.drop(at).take(k - at - 1)
    }
  }

  override def reduce(buf: Buf, in: In): Buf =
    Buf(insert(buf.entries, (in.value, in.id)))

  override def merge(a: Buf, b: Buf): Buf =
    Buf(b.entries.foldLeft(a.entries)(insert))

  override def finish(buf: Buf): String = buf.entries.map(_._2).mkString(",")

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object TopKAgg {
  /** Input row shape: the ranking value and the unique tiebreak id. */
  final case class In(value: Double, id: Long)
  /** Sorted, ≤k-element aggregation buffer. */
  final case class Buf(entries: Seq[(Double, Long)])

  /** Column function: `topkIds(k)(valueCol, idCol)`. */
  def topkIds(k: Int): (Column, Column) => Column = {
    val fn = udaf(TopKIdsAgg(k), Encoders.product[In])
    (value, id) => fn(value, id)
  }
}
