package graft

import org.apache.spark.sql.functions._
import graft.streaming.{DedupStream, EventStreams, IndexStream}

/** Streaming inverted-index statistics vs their batch contract: the
  * (term, df, cf) table after replaying the corpus in micro-batches
  * must equal the batch aggregate exactly (counters are sums — any
  * split, any order), and the stateless per-row tf kernel must agree
  * with the independent explode+groupBy derivation per (doc, term). */
class StreamIndexSpec extends SparkSpec {

  test("streamed (term, df, cf) table equals the batch index after replay") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-tfindex")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    StreamTestIO.writeChunk(docs.filter($"doc_id" % 2 === 0),
      dir.resolve("even.parquet"), base)
    StreamTestIO.writeChunk(docs.filter($"doc_id" % 2 === 1),
      dir.resolve("odd.parquet"), base + 1000)
    val q = EventStreams.runToMemory(
      IndexStream.tfIndexStream(
        DedupStream.documentStream(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1"))),
      "tf_index", mode = "complete")
    try {
      val streamed = spark.table("tf_index").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = IndexStream.tfIndexBatch(docs).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch,
        s"stream/batch index diverge: sizes ${streamed.size}/${batch.size}")
      assert(streamed.nonEmpty)
      // df can never exceed the corpus size; cf never below df
      val n = docs.count()
      assert(streamed.values.forall { case (df, cf) => df <= n && cf >= df })
    } finally q.stop()
  }

  test("per-row tf kernel agrees with the explode+groupBy derivation") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val viaKernel = docs
      .select($"doc_id", explode(IndexStream.termTfPairs(
        graft.functions.NativeKernels.word_tokens($"text"))).as("p"))
      .select($"doc_id", $"p.term".as("term"), $"p.tf".as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaAgg = docs
      .select($"doc_id", explode(
        graft.functions.NativeKernels.word_tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaKernel == viaAgg,
      s"tf derivations disagree: sizes ${viaKernel.size}/${viaAgg.size}")
  }

  test("zero-token documents yield an empty pair array, not a descending sequence") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, ""), (2L, "   \t\n "), (3L, "one one two"))
      .toDF("doc_id", "text")
      .select($"doc_id", IndexStream.termTfPairs(
        graft.functions.NativeKernels.word_tokens($"text")).as("ps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).size).toMap
    assert(rows(1L) == 0 && rows(2L) == 0 && rows(3L) == 2)
  }
}
