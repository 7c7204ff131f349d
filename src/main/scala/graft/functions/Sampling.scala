package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k-by-hash uniform sample as a typed mergeable
  * [[Aggregator]]: keep the k rows whose fixed 60-bit key hash is
  * smallest, carrying each row's measure value alongside the hash.
  *
  * Under a fixed hash this is a deterministic uniform-without-
  * replacement sample of the group (the KMV/x05 argument applied to
  * whole rows instead of a distinct set): the k smallest hashes are k
  * uniform order statistics, so ANY statistic of the carried values —
  * here quantiles — is a classical sample estimate with the usual
  * √(q(1−q)/k) rank error, and, unlike reservoir sampling, the result
  * is independent of encounter order and MERGEABLE (bottom-k of a
  * union = bottom-k of the bottom-k's). O(k) state at every stage:
  * map-side partials bound each partition's contribution at k pairs,
  * the same discipline as [[KMinValues]]/[[GroupedTopK]].
  *
  * Determinism makes the sketch oracle-checkable exactly (the x05
  * trick): DuckDB selects the identical k rows by the identical md5
  * hash and reads the identical values. */
object Sampling {

  /** One sampled row: its selection hash plus the carried value. */
  final case class HV(h: Long, v: Double)

  /** Total order on (hash, value) — hashes are distinct w.h.p., the
    * value tie-break only pins the pathological collision case. */
  val ord: Ordering[HV] = Ordering.by((r: HV) => (r.h, r.v))

  final case class BottomK(k: Int) extends Aggregator[HV, Seq[HV], Seq[HV]] {
    override def zero: Seq[HV] = Vector.empty

    // keep the buffer sorted and bounded at k — O(k) per row
    override def reduce(buf: Seq[HV], in: HV): Seq[HV] =
      if (buf.length == k && ord.gteq(in, buf.last)) buf
      else ((buf :+ in).sorted(ord)).take(k)

    override def merge(a: Seq[HV], b: Seq[HV]): Seq[HV] =
      (a ++ b).sorted(ord).take(k)

    override def finish(buf: Seq[HV]): Seq[HV] = buf

    override def bufferEncoder: Encoder[Seq[HV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HV]]()
    override def outputEncoder: Encoder[Seq[HV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HV]]()
  }
}
