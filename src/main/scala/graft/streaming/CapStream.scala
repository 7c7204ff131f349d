package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the batch t42 per-source cap
  * ([[graft.operators.Relational14.t42]]): the bottom-k-by-hash
  * sample maintained LIVE as documents arrive — a complete-mode
  * streaming aggregation whose state per source is the O(k) mergeable
  * [[graft.functions.Sampling.BottomK]] buffer (the
  * bottomKQuantilesStream discipline: the sketch is a deterministic
  * function of the input SET, so after any replay, under any
  * micro-batch split, the kept set equals batch t42's EXACTLY —
  * spec-asserted).
  *
  * This is the admission face of the per-domain cap: a crawl ingests
  * continuously, and "which k docs represent this domain so far" must
  * be queryable at any moment without re-scanning; ingest-stability
  * (a kept doc is only ever displaced by a new doc hashing below the
  * current k-th) is the BottomK ordering by construction. */
object CapStream {

  /** (source, kept[(h, doc_id)], n_total) per source, complete mode.
    * Shares the batch query's hash salt and buffer, so the exploded
    * kept set is bit-identical to t42's after full replay. */
  def sourceCapStream(docs: DataFrame, cap: Int): DataFrame = {
    val bk = udaf(graft.functions.Sampling.BottomK(cap))
    docs.select(col("source"), col("doc_id"),
        graft.functions.TextOps.hash64(
          concat(lit("cap:"), col("doc_id").cast("string"))).as("h"))
      .groupBy(col("source"))
      .agg(bk(col("h"), col("doc_id").cast("double")).as("kept"),
        count(lit(1)).as("n_total"))
  }
}
