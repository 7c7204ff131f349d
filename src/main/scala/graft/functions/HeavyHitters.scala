package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a typed
  * [[Aggregator]] — the fourth sketch family next to HLL (x01), GK
  * quantiles (x03) and bloom (x02): "which items dominate this
  * column" in ONE mergeable pass with k counters of state.
  *
  * Why this matters at 100 TB: the exact answer is a full groupBy —
  * a shuffle of every distinct item. The sketch's partial aggregation
  * reduces each map partition to ≤ k (item, count, err) triples
  * before the exchange, so the shuffle carries kilobytes per
  * partition no matter how many distinct items the data holds (the
  * same map-side-combine economics as [[GroupedTopK]]).
  *
  * Guarantees (single summary): every item with true frequency
  * > n/k is in the summary, and for each reported entry
  * `count - err ≤ true ≤ count`. The merge below (union; absent side
  * contributes its possible-undercount minimum, per Agarwal et al.
  * 2012 "Mergeable Summaries"; truncate back to k by count)
  * preserves both bounds. Merge ORDER can still perturb borderline
  * tail entries — inherent to every bounded-size sketch, which is
  * why x04 registers rows-only (like x01/x03) and the spec asserts
  * the order-free invariants instead of exact content.
  */
object HeavyHitters {

  /** One counter: `count` is the estimate (upper bound), `err` the
    * maximum overcount absorbed from evictions/merges. */
  final case class HHEntry(item: Long, count: Long, err: Long)

  final case class SpaceSaving(k: Int)
      extends Aggregator[Long, Seq[HHEntry], Seq[HHEntry]] {

    override def zero: Seq[HHEntry] = Vector.empty

    override def reduce(buf: Seq[HHEntry], item: Long): Seq[HHEntry] = {
      val i = buf.indexWhere(_.item == item)
      if (i >= 0) buf.updated(i, buf(i).copy(count = buf(i).count + 1))
      else if (buf.length < k) buf :+ HHEntry(item, 1L, 0L)
      else {
        // evict a minimum-count entry (ties: the largest item id —
        // deterministic for any buffer order); the newcomer inherits
        // the evicted count as its possible overcount
        val m = buf.minBy(e => (e.count, -e.item))
        buf.filterNot(_ == m) :+ HHEntry(item, m.count + 1, m.count)
      }
    }

    override def merge(a: Seq[HHEntry], b: Seq[HHEntry]): Seq[HHEntry] = {
      // an item absent from a FULL summary may still have occurred up
      // to that summary's minimum count times — add that minimum as
      // both estimate and error; a non-full summary truly saw nothing
      val mA = if (a.length == k) a.map(_.count).min else 0L
      val mB = if (b.length == k) b.map(_.count).min else 0L
      val am = a.map(e => e.item -> e).toMap
      val bm = b.map(e => e.item -> e).toMap
      val union = (a.map(_.item) ++ b.map(_.item)).distinct
      union.map { it =>
        (am.get(it), bm.get(it)) match {
          case (Some(x), Some(y)) => HHEntry(it, x.count + y.count, x.err + y.err)
          case (Some(x), None)    => HHEntry(it, x.count + mB, x.err + mB)
          case (None, Some(y))    => HHEntry(it, mA + y.count, mA + y.err)
          case (None, None)       => throw new IllegalStateException("unreachable")
        }
      }.sortBy(e => (-e.count, e.item)).take(k)
    }

    override def finish(buf: Seq[HHEntry]): Seq[HHEntry] =
      buf.sortBy(e => (-e.count, e.item))

    override def bufferEncoder: Encoder[Seq[HHEntry]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[HHEntry]] = ExpressionEncoder()
  }
}
