package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.NativeKernels.word_tokens
import graft.functions.TextOps.hash64

/** Streaming DSIR bucket-table maintenance — the live face of the t43
  * importance-weight family: as documents arrive, keep the per-bucket
  * (raw count, target count) table current. The table IS the model
  * (Xie et al. 2023 reduce importance resampling to two hashed-n-gram
  * count vectors); scoring any document against it is a stateless
  * 256-row broadcast join, so the thing worth streaming is the count
  * state, exactly as [[IndexStream]] streams (df, cf) rather than
  * BM25 scores.
  *
  * Shape: per-document bucket counts are computed STATELESSLY per row
  * — the token array maps to bucket ids in-row and
  * [[IndexStream.termTfPairs]]'s run-length kernel (generic over the
  * element type) collapses them to (bucket, m) pairs without an
  * aggregate — so ONE complete-mode groupBy(bucket) suffices (chained
  * streaming aggregations are unplannable, the IndexStream argument).
  * Both counters are SUMS: any arrival order and any micro-batch
  * split produce the identical table, and the parity spec composes
  * the streamed table with batch per-doc counts to reproduce t43's
  * registered output bit-for-bit.
  *
  * At 100 TB: state is ≤ [[graft.operators.Relational16]].DSIR_B
  * (256) rows FOREVER — each micro-batch shuffles only its own
  * (bucket, m) pairs, and the frozen table scores new corpora
  * without touching old data (t43's serving stance, kept current). */
object DsirStream {

  private val B = 256L // = Relational16.DSIR_B (shared literal)

  /** The live per-bucket (r = raw count, tc = target-slice count)
    * table over a documents stream (needs `text` and `lang`).
    * Complete output mode: each trigger emits the full table. */
  def bucketStream(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"lang", explode(IndexStream.termTfPairs(
        transform(word_tokens($"text"), t => pmod(hash64(t), lit(B)))))
        .as("p"))
      .groupBy($"p.term".as("b"))
      .agg(sum($"p.tf").as("r"),
        sum(when($"lang" === "en", $"p.tf").otherwise(0L)).as("tc"))
  }

  /** Batch equivalent over a static frame — the same frame-builder
    * (the IndexStream convention: the two faces cannot drift). */
  def bucketBatch(docs: DataFrame): DataFrame = bucketStream(docs)
}
