package graft

import org.apache.spark.sql.functions._
import graft.streaming.{DedupStream, DsirStream, EventStreams}

/** Streaming DSIR bucket table vs its batch contract: after replaying
  * the corpus in micro-batches the (b, r, tc) table must equal the
  * batch aggregate exactly (counters are sums), and composing the
  * STREAMED table with batch per-doc counts must reproduce the
  * registered t43 output bit-for-bit — the table is the model. */
class StreamDsirSpec extends SparkSpec {

  test("streamed bucket table equals batch; composition reproduces t43") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    StreamTestIO.writeChunk(docs.filter($"doc_id" % 2 === 0),
      dir.resolve("even.parquet"), base)
    StreamTestIO.writeChunk(docs.filter($"doc_id" % 2 === 1),
      dir.resolve("odd.parquet"), base + 1000)
    val q = EventStreams.runToMemory(
      DsirStream.bucketStream(
        DedupStream.documentStream(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1"))),
      "dsir_buckets", mode = "complete")
    try {
      val streamed = spark.table("dsir_buckets").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = DsirStream.bucketBatch(docs).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch,
        s"stream/batch bucket tables diverge: ${streamed.size}/${batch.size}")
      assert(streamed.nonEmpty && streamed.size <= 256)
      // compose the STREAMED table into t43's scoring tail: weights
      // must equal the registered query exactly
      val bTab = spark.table("dsir_buckets")
      val totals = bTab.agg(sum($"r").as("rr"), sum($"tc").as("tt"))
      val ratio = bTab.crossJoin(totals).select($"b",
        (log($"tc" + 1) - log($"tt" + 256)
          - log($"r" + 1) + log($"rr" + 256)).as("lr"))
      val db = docs
        .select($"doc_id",
          explode(graft.functions.NativeKernels.word_tokens($"text"))
            .as("tok"))
        .select($"doc_id",
          pmod(graft.functions.TextOps.hash64($"tok"), lit(256L)).as("b"))
        .groupBy($"doc_id", $"b").agg(count(lit(1)).as("m"))
      val got = db.join(broadcast(ratio), Seq("b"))
        .groupBy($"doc_id")
        .agg(sum($"m").cast("long").as("n_tok"),
          round(sum($"m" * $"lr"), 4).as("dsir_w"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val want = operators.Relational16.t43(spark, sf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == want,
        s"stream-composed weights diverge from t43: ${got.size}/${want.size}")
    } finally q.stop()
  }
}
