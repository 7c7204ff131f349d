package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch as a typed mergeable
  * [[Aggregator]]: keep the k smallest DISTINCT 60-bit hashes seen;
  * the k-th smallest order statistic estimates distinct count as
  * (k−1)·2⁶⁰/h₍ₖ₎ (Bar-Yossef et al. 2002). O(k) state at every
  * stage — map-side partials bound each partition's contribution to
  * k longs, exactly the SpaceSaving/GroupedTopK discipline.
  *
  * Unlike HLL (x01) or SpaceSaving (x04), KMV over a FIXED hash is a
  * deterministic function of the input set — so x05 is an
  * oracle-checked sketch: DuckDB computes the identical k-th
  * smallest md5-derived hash and the identical estimate, and the
  * gate hash-compares them like any exact query. */
object KMinValues {

  final case class KMV(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty

    // keep the buffer sorted, distinct, and bounded at k — O(k)/row
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.length == k && h >= buf.last) buf
      else if (buf.contains(h)) buf
      else ((buf :+ h).sorted).take(k)

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(buf: Seq[Long]): Seq[Long] = buf

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
