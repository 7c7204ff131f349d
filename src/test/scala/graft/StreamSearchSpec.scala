package graft

import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, SearchStream}
import graft.operators.Relational23

/** Streaming keyword serving vs batch t45: term-set queries arrive
  * across micro-batches WITH deliberate re-deliveries, the replay
  * guard admits each q_id once, and the trigger-side serve through
  * the shared conjunctive body reproduces batch t45 row for row. */
class StreamSearchSpec extends SparkSpec {

  import spark.implicits._

  test("streaming conjunctive serve equals batch t45") {
    val queries = Relational23.t45QueryArrays(spark, sf)
    val nq = queries.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-searchstream")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    // every query delivered TWICE across the chunks (source replay)
    (0 to 2).foreach { i =>
      val chunk = queries.filter(pmod($"q_id", lit(3)) === i)
        .unionAll(queries.filter(pmod($"q_id", lit(3)) === (i + 2) % 3))
      StreamTestIO.writeChunk(chunk, dir.resolve(s"c$i.parquet"),
        base + i * 1000)
    }
    val q = EventStreams.runToMemory(
      SearchStream.admittedOnce(
        SearchStream.queryStream(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1"))).toDF(),
      "search_stream", mode = "append")
    try {
      val admitted = spark.table("search_stream")
      val ids = admitted.select($"q_id").collect().map(_.getLong(0))
      assert(ids.length == nq && ids.distinct.length == ids.length,
        s"replay guard must admit each of the $nq queries exactly once, " +
          s"got ${ids.length} (${ids.distinct.length} distinct)")
      val served = SearchStream.serveRefresh(spark, sf, admitted)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val batch = Relational23.t45(spark, sf)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(served == batch, "streamed serve diverges from batch t45")
    } finally q.stop()
  }

  test("streaming phrase serve equals batch t46") {
    val queries = graft.operators.Relational25.t46QueryArrays(spark, sf)
    val nq = queries.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-phrasestream")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    // every phrase delivered TWICE across the chunks (source replay) —
    // the SAME admit-once guard as the conjunctive face; only the
    // serving body differs (phraseServe, shared with batch t46)
    (0 to 2).foreach { i =>
      val chunk = queries.filter(pmod($"q_id", lit(3)) === i)
        .unionAll(queries.filter(pmod($"q_id", lit(3)) === (i + 2) % 3))
      StreamTestIO.writeChunk(chunk, dir.resolve(s"c$i.parquet"),
        base + i * 1000)
    }
    val q = EventStreams.runToMemory(
      SearchStream.admittedOnce(
        SearchStream.queryStream(spark, dir.toString,
          Map("maxFilesPerTrigger" -> "1"))).toDF(),
      "phrase_stream", mode = "append")
    try {
      val admitted = spark.table("phrase_stream")
      val ids = admitted.select($"q_id").collect().map(_.getLong(0))
      assert(ids.length == nq && ids.distinct.length == ids.length,
        s"replay guard must admit each of the $nq phrases exactly once, " +
          s"got ${ids.length} (${ids.distinct.length} distinct)")
      val served = SearchStream.phraseRefresh(spark, sf, admitted)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val batch = graft.operators.Relational25.t46(spark, sf)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(served == batch, "streamed phrase serve diverges from batch t46")
    } finally q.stop()
  }
}
