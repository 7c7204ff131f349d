package graft

import graft.streaming.{DedupStream, EventStreams}
import org.apache.spark.sql.DataFrame

/** Shared file-stream staging: write a DataFrame as ONE parquet file
  * with a chosen modification time (the file source schedules batches
  * by mtime, so tests control micro-batch order deterministically). */
object StreamTestIO {
  def writeChunk(df: DataFrame, dest: java.nio.file.Path, mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
    java.nio.file.Files.move(java.nio.file.Paths.get(part), dest)
    dest.toFile.setLastModified(mtime)
  }
}

/** Streaming MinHash near-dup vs batch d03: stream the documents table
  * in two halves split by doc_id parity — planted near-dup pairs get
  * consecutive ids, so most true pairs STRADDLE the micro-batches and
  * the cross-batch state path is what's exercised. The distinct
  * emitted pair set must equal batch d03 exactly (the operator's
  * at-least-once contract allows duplicate emissions; distinctness is
  * the consumer's idempotent-apply side). */
class StreamDedupNearDupSpec extends SparkSpec {
  test("streaming near-dup pairs equal batch d03 across micro-batches") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    StreamTestIO.writeChunk(docs.filter($"doc_id" % 2 === 0),
      dir.resolve("even.parquet"), base)
    StreamTestIO.writeChunk(docs.filter($"doc_id" % 2 === 1),
      dir.resolve("odd.parquet"), base + 1000)
    val q = EventStreams.runToMemory(
      DedupStream.nearDupPairs(
        DedupStream.documentStream(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1"))).toDF(),
      "neardup_stream", mode = "append")
    try {
      val streamed = spark.table("neardup_stream")
        .dropDuplicates("a_id", "b_id")
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.Dedup.d03(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream vs batch: only-stream=${streamed.diff(batch).take(3)} " +
          s"only-batch=${batch.diff(streamed).take(3)} " +
          s"sizes ${streamed.size}/${batch.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("re-delivered documents are a state and emission no-op") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents")
    // reference run: each half delivered once
    def run(chunks: Seq[(DataFrame, Long)], table: String): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft-redeliver")
      dir.toFile.deleteOnExit()
      chunks.zipWithIndex.foreach { case ((df, mtime), i) =>
        StreamTestIO.writeChunk(df, dir.resolve(s"c$i.parquet"), mtime)
      }
      val q = EventStreams.runToMemory(
        DedupStream.nearDupPairs(
          DedupStream.documentStream(spark, dir.toString,
            Map("maxFilesPerTrigger" -> "1"))).toDF(),
        table, mode = "append")
      try spark.table(table).count() finally q.stop()
    }
    val base = System.currentTimeMillis() - 60000
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    val once = run(Seq(even -> base, odd -> (base + 1000)), "redeliver_once")
    // replayed run: the even half arrives AGAIN between the two — a
    // source replay. Stored-copy doubling would re-emit every matching
    // pair in the replayed buckets; the guard makes it emit nothing.
    val replayed = run(Seq(even -> base, even -> (base + 500),
      odd -> (base + 1000)), "redeliver_twice")
    assert(replayed == once,
      s"re-delivery changed emission count: $once -> $replayed")
  }
}

/** Streaming cross-corpus near-dup (the d11 admission gate live):
  * odd docs arrive as a stream in two micro-batches and are checked
  * against the frozen even-doc reference index; the emitted pair set
  * must equal batch d11 exactly. */
class StreamCrossCorpusSpec extends SparkSpec {
  test("streamed cross-corpus pairs equal batch d11") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-crosscorpus")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    val odd = docs.filter($"doc_id" % 2 === 1)
    StreamTestIO.writeChunk(odd.filter($"doc_id" < 250),
      dir.resolve("c0.parquet"), base)
    StreamTestIO.writeChunk(odd.filter($"doc_id" >= 250),
      dir.resolve("c1.parquet"), base + 1000)
    val refIdx = graft.streaming.CrossCorpusStream.referenceIndex(
      docs.filter($"doc_id" % 2 === 0))
    val q = EventStreams.runToMemory(
      graft.streaming.CrossCorpusStream.againstReference(
        DedupStream.documentStream(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1")),
        refIdx).toDF(),
      "crosscorpus_stream", mode = "append")
    try {
      val streamed = spark.table("crosscorpus_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.operators.Relational7.d11(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch,
        s"stream vs batch d11: only-stream=${streamed.diff(batch).take(3)} " +
          s"only-batch=${batch.diff(streamed).take(3)} sizes ${streamed.size}/${batch.size}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}

/** Streaming curation (quality gate + exact dedup vs all docs seen)
  * against its batch contract: with ids replayed in ascending order,
  * the admitted set is exactly "quality-passing AND the minimum doc_id
  * of its fingerprint group among quality-passers". */
class StreamCurationSpec extends SparkSpec {
  test("streaming curation admits exactly the batch keeper set") {
    val s = spark
    import s.implicits._
    import graft.functions.TextOps.{hash64, normText}
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-curate-stream")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    // three id-ordered chunks — duplicates land in different batches
    StreamTestIO.writeChunk(docs.filter($"doc_id" < 150),
      dir.resolve("c0.parquet"), base)
    StreamTestIO.writeChunk(docs.filter($"doc_id" >= 150 && $"doc_id" < 300),
      dir.resolve("c1.parquet"), base + 1000)
    StreamTestIO.writeChunk(docs.filter($"doc_id" >= 300),
      dir.resolve("c2.parquet"), base + 2000)
    val q = EventStreams.runToMemory(
      graft.streaming.CorpusStream.curateStream(
        DedupStream.documentStream(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1"))),
      "curate_stream", mode = "append")
    try {
      val streamed = spark.table("curate_stream")
        .select($"doc_id").as[Long].collect().toSet
      val batch = docs
        .withColumn("quality", graft.operators.TextAnalysis.qualityExpr($"text"))
        .filter($"quality" >= 0.5)
        .withColumn("fp", hash64(normText($"text")))
        .groupBy($"fp").agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch,
        s"admitted sets diverge: only-stream=${streamed.diff(batch).take(3)} " +
          s"only-batch=${batch.diff(streamed).take(3)}")
      assert(streamed.nonEmpty && streamed.size < docs.count())
    } finally q.stop()
  }

  test("intra-batch winner is min doc_id regardless of partitioning") {
    val s = spark
    import s.implicits._
    import graft.functions.TextOps.{hash64, normText}
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft-curate-onebatch")
    dir.toFile.deleteOnExit()
    // the WHOLE corpus in one micro-batch, shuffled across many input
    // partitions: every duplicate group collides inside a single batch,
    // so the winner is decided by the per-group minBy, not by which
    // partition the state op happens to see first
    StreamTestIO.writeChunk(docs.orderBy(org.apache.spark.sql.functions
      .hash($"doc_id")), dir.resolve("all.parquet"),
      System.currentTimeMillis() - 60000)
    val q = EventStreams.runToMemory(
      graft.streaming.CorpusStream.curateStream(
        DedupStream.documentStream(spark, dir.toString)
          .repartition(16)),
      "curate_onebatch", mode = "append")
    try {
      val streamed = spark.table("curate_onebatch")
        .select($"doc_id").as[Long].collect().toSet
      val batch = docs
        .withColumn("quality", graft.operators.TextAnalysis.qualityExpr($"text"))
        .filter($"quality" >= 0.5)
        .withColumn("fp", hash64(normText($"text")))
        .groupBy($"fp").agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed == batch,
        s"one-batch admitted set diverges: only-stream=${streamed.diff(batch).take(3)} " +
          s"only-batch=${batch.diff(streamed).take(3)}")
    } finally q.stop()
  }
}
