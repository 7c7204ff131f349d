package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.NativeKernels.word_shingles
import graft.operators.Dedup

/** Streaming cross-corpus near-duplicate detection — the live face of
  * batch d11: each arriving document (the crawl) is checked for n-gram
  * Jaccard overlap against a FROZEN reference corpus (the training
  * set) the moment it lands. This is the admission gate an ingest
  * pipeline runs before a document may join the corpus: "is this new
  * text already (nearly) in what we trained on?"
  *
  * Shape: the reference side is a STATIC DataFrame of per-shingle
  * rows (ref_id, reference set size) — built once from the frozen
  * corpus, reused every micro-batch (a production deployment
  * materializes it; it is the inverted shingle index of the
  * reference). The arriving batch explodes its shingles and
  * stream-static INNER JOINs the index — stateless, append-safe, no
  * watermark needed. The per-pair intersection count is then a
  * per-batch aggregation: all shingle matches of one arriving doc
  * land in the SAME micro-batch (documents arrive whole), so the
  * group is complete by construction and `flatMapGroupsWithState`
  * emits the finished pair immediately WITHOUT storing state — the
  * streaming-legal form of a batch-local groupBy (a real streaming
  * aggregation would demand a watermark this data doesn't carry).
  *
  * Parity: emitted pairs are exactly batch d11's rows for the same
  * candidate set (the spec asserts set equality). Re-delivered
  * documents re-emit their pairs (at-least-once, the DedupStream
  * contract) — the downstream admission decision is idempotent. */
object CrossCorpusStream {

  final case class ShingleHit(cand_id: Long, ref_id: Long,
      nc: Long, nr: Long)
  final case class CrossPair(cand_id: Long, ref_id: Long, jaccard: Double)

  /** Per-shingle inverted index of the frozen reference corpus:
    * (shingle, ref_id, reference shingle-set size). */
  def referenceIndex(reference: DataFrame): DataFrame = {
    val s = reference.sparkSession
    import s.implicits._
    reference
      .select($"doc_id".as("ref_id"), word_shingles($"text", Dedup.N).as("arr"))
      .select($"ref_id", size($"arr").cast("long").as("nr"),
        explode($"arr").as("s"))
  }

  def againstReference(stream: DataFrame, refIndex: DataFrame,
      threshold: Double = 0.5): Dataset[CrossPair] = {
    val s = stream.sparkSession
    import s.implicits._
    val arriving = stream
      .select($"doc_id".as("cand_id"), word_shingles($"text", Dedup.N).as("arr"))
      .select($"cand_id", size($"arr").cast("long").as("nc"),
        explode($"arr").as("s"))
    arriving.join(refIndex, Seq("s"))
      .select($"cand_id", $"ref_id", $"nc", $"nr").as[ShingleHit]
      .groupByKey(h => (h.cand_id, h.ref_id))
      .flatMapGroupsWithState[Boolean, CrossPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, rows, _) =>
        // group complete within the batch; state deliberately unused
        val hits = rows.toSeq
        val inter = hits.size.toLong
        val h = hits.head
        // HALF_UP on BigDecimal.valueOf — bit-identical to Spark's
        // round(col, 4), so streamed jaccards equal batch d11's
        val j = java.math.BigDecimal.valueOf(
          inter.toDouble / (h.nc + h.nr - inter))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        if (j >= threshold) Iterator.single(CrossPair(h.cand_id, h.ref_id, j))
        else Iterator.empty
      }
  }
}
