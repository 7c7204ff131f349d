package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Grouped top-k as a typed [[Aggregator]] (SURVEY.md §2.6/§4: the
  * custom-aggregate slot — "an `Aggregator[Row, PriorityQueue,
  * Array[Row]]` for grouped top-k").
  *
  * Why not a window: `row_number().over(partitionBy(g).orderBy(v))`
  * ranks ALL rows — the shuffle carries the entire table and the sort
  * is O(n log n) per group. This aggregator keeps only k records per
  * group at every stage, so the map side already reduces each
  * partition to ≤ k rows per group (partial aggregation = Spark's
  * map-side combine), the shuffle carries ≤ k·groups·partitions rows,
  * and merge is O(k). At 100 TB with k=3 that is the difference
  * between shuffling the fact table and shuffling kilobytes.
  *
  * Ordering is total (price desc, then orderkey/linenumber asc), so
  * the result is deterministic and oracle-checkable against the
  * window formulation on any engine.
  */
object GroupedTopK {

  /** One ranked record: a value plus tie-break keys. */
  final case class Rec(price: Double, orderkey: Long, linenumber: Int)

  /** Total order: price DESC, orderkey ASC, linenumber ASC. */
  val ord: Ordering[Rec] = Ordering.by((r: Rec) => (-r.price, r.orderkey, r.linenumber))

  final case class TopK(k: Int) extends Aggregator[Rec, Seq[Rec], Seq[Rec]] {
    override def zero: Seq[Rec] = Vector.empty

    // insert keeping the buffer sorted and bounded at k — O(k) per row
    override def reduce(buf: Seq[Rec], in: Rec): Seq[Rec] =
      if (buf.length == k && ord.gteq(in, buf.last)) buf
      else ((buf :+ in).sorted(ord)).take(k)

    override def merge(a: Seq[Rec], b: Seq[Rec]): Seq[Rec] =
      (a ++ b).sorted(ord).take(k)

    override def finish(buf: Seq[Rec]): Seq[Rec] = buf.sorted(ord)

    override def bufferEncoder: Encoder[Seq[Rec]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Rec]]()
    override def outputEncoder: Encoder[Seq[Rec]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Rec]]()
  }

  /** Scored-document variant (score_ppm DESC, doc_id ASC) — the t38
    * retrieval shape: top-k docs per query term with the fixed-point
    * integer score and its inputs carried through. The map side bounds
    * every partition's contribution at k docs per term, so a stop-term
    * (df ≈ corpus size) costs ≤ k·partitions shuffled rows instead of
    * a corpus-sized single window partition. */
  final case class ScoredDoc(score_ppm: Long, doc_id: Long, tf: Long, dl: Long)

  val sOrd: Ordering[ScoredDoc] =
    Ordering.by((r: ScoredDoc) => (-r.score_ppm, r.doc_id))

  final case class TopDocs(k: Int)
      extends Aggregator[ScoredDoc, Seq[ScoredDoc], Seq[ScoredDoc]] {
    override def zero: Seq[ScoredDoc] = Vector.empty
    override def reduce(buf: Seq[ScoredDoc], in: ScoredDoc): Seq[ScoredDoc] =
      if (buf.length == k && sOrd.gteq(in, buf.last)) buf
      else ((buf :+ in).sorted(sOrd)).take(k)
    override def merge(a: Seq[ScoredDoc], b: Seq[ScoredDoc]): Seq[ScoredDoc] =
      (a ++ b).sorted(sOrd).take(k)
    override def finish(buf: Seq[ScoredDoc]): Seq[ScoredDoc] = buf.sorted(sOrd)
    override def bufferEncoder: Encoder[Seq[ScoredDoc]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredDoc]]()
    override def outputEncoder: Encoder[Seq[ScoredDoc]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredDoc]]()
  }

  /** Minimal scored-id variant (score DESC, id ASC) — the conjunctive
    * retrieval shape (t45): only the integer score and the id ride
    * the bounded buffer, so a stopword-heavy query whose candidate
    * set is corpus-sized still shuffles ≤ k·partitions rows per
    * query instead of one corpus-sized window partition. */
  final case class ScoredId(score: Long, id: Long)

  val siOrd: Ordering[ScoredId] = Ordering.by((r: ScoredId) => (-r.score, r.id))

  final case class TopIds(k: Int)
      extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    override def zero: Seq[ScoredId] = Vector.empty
    override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
      if (buf.length == k && siOrd.gteq(in, buf.last)) buf
      else ((buf :+ in).sorted(siOrd)).take(k)
    override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
      (a ++ b).sorted(siOrd).take(k)
    override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf.sorted(siOrd)
    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Weighted-term variant (weight DESC, term ASC) — the TF-IDF
    * top-terms shape: keep the k heaviest terms per document with a
    * total, engine-portable tie-break. */
  final case class WTerm(weight: Double, term: String)

  val wOrd: Ordering[WTerm] = Ordering.by((r: WTerm) => (-r.weight, r.term))

  final case class TopTerms(k: Int) extends Aggregator[WTerm, Seq[WTerm], Seq[WTerm]] {
    override def zero: Seq[WTerm] = Vector.empty
    override def reduce(buf: Seq[WTerm], in: WTerm): Seq[WTerm] =
      if (buf.length == k && wOrd.gteq(in, buf.last)) buf
      else ((buf :+ in).sorted(wOrd)).take(k)
    override def merge(a: Seq[WTerm], b: Seq[WTerm]): Seq[WTerm] =
      (a ++ b).sorted(wOrd).take(k)
    override def finish(buf: Seq[WTerm]): Seq[WTerm] = buf.sorted(wOrd)
    override def bufferEncoder: Encoder[Seq[WTerm]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WTerm]]()
    override def outputEncoder: Encoder[Seq[WTerm]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WTerm]]()
  }
}
