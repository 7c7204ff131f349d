package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps.{hash64, normText}
import graft.operators.TextAnalysis

/** Streaming corpus curation — the live front half of
  * [[graft.operators.CorpusPipeline]]: score quality, gate, and
  * exact-dedup each arriving document against everything seen so far.
  * A crawler feed never hands you the corpus at once; this face admits
  * a document the moment it arrives or never.
  *
  * Semantics: quality is the t02 expression (bit-identical to batch —
  * shared code); dedup state is one fingerprint per distinct text
  * seen, FIRST arrival wins. Replayed in ingest order (ids ascending,
  * the replay convention), first-arrival = min doc_id = exactly batch
  * d01's keeper set, which the spec asserts. `dropDuplicates` keeps
  * fingerprint state forever — the always-correct choice when "seen
  * before" must mean EVER; a deployment that can tolerate
  * re-admittance after a horizon uses `dropDuplicatesWithinWatermark`
  * on an ingest-time column (the
  * [[EventStreams.dedupStream]] choreography) to bound state. */
object CorpusStream {

  def curateStream(docs: DataFrame, minQuality: Double = 0.5): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityExpr(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("fp", hash64(normText(col("text"))))
      .dropDuplicates("fp")
      .select(col("doc_id"), col("quality"), col("fp"))
}
