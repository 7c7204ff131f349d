package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational22
import graft.streaming.{EventStreams, IvmStream, SignedJoinRow}

/** Live retractable view maintenance (q81's streaming face): replay
  * the FULL signed history — original join rows and retraction
  * deltas deliberately interleaved across micro-batches — and assert
  * the maintained view equals batch q81 EXACTLY, on the aggregation
  * face and the explicit-state face; plus the retraction-specific
  * state behavior (a cancelled group frees its state and emits a
  * tombstone). */
class StreamIvmSpec extends SparkSpec {

  import spark.implicits._

  private val schema = org.apache.spark.sql.Encoders
    .product[SignedJoinRow].schema

  private def chunkedDir(name: String, df: DataFrame, n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$name")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    // deterministic multiset partition that interleaves groups and
    // signs across chunks (retractions may arrive BEFORE the rows
    // they cancel — the fold must not care)
    val h = pmod(hash($"o_orderpriority", $"o_year", $"cents", $"m"),
      lit(n))
    (0 until n).foreach { i =>
      StreamTestIO.writeChunk(df.filter(h === i),
        dir.resolve(s"c$i.parquet"), base + i * 1000)
    }
    dir.toString
  }

  private def historyStream(dir: String) =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)

  private def batchRows(): Seq[(String, Long, Long, Long)] =
    Relational22.q81(spark, sf)
      .select($"o_orderpriority", $"o_year", $"revenue_cents", $"n_items")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted

  test("streamed signed fold equals batch q81 (aggregation face)") {
    val hist = Relational22.signedHistory(spark, sf)
    val dir = chunkedDir("ivm-agg", hist, 3)
    val q = EventStreams.runToMemory(
      IvmStream.viewAgg(historyStream(dir)), "ivm_agg",
      mode = "complete")
    try {
      val got = spark.table("ivm_agg").filter($"n_items" > 0)
        .select($"o_orderpriority", $"o_year", $"revenue_cents",
          $"n_items")
        .as[(String, Long, Long, Long)].collect().toSeq.sorted
      assert(got == batchRows(), "aggregation face diverges from q81")
    } finally q.stop()
  }

  test("streamed signed fold equals batch q81 (fmgws face)") {
    val hist = Relational22.signedHistory(spark, sf)
    val dir = chunkedDir("ivm-fmgws", hist, 3)
    val q = EventStreams.runToMemory(
      IvmStream.view(historyStream(dir).as[SignedJoinRow]).toDF(),
      "ivm_fmgws")
    try {
      val got = spark.table("ivm_fmgws").collect()
        .groupBy(r => (r.getAs[String]("o_orderpriority"),
          r.getAs[Long]("o_year")))
        .view.mapValues(_.maxBy(_.getAs[Long]("upd"))).values
        .filter(_.getAs[Boolean]("live"))
        .map(r => (r.getAs[String]("o_orderpriority"),
          r.getAs[Long]("o_year"), r.getAs[Long]("revenue_cents"),
          r.getAs[Long]("n_items")))
        .toSeq.sorted
      assert(got == batchRows(), "state face diverges from q81")
    } finally q.stop()
  }

  test("a cancelled group frees its state and tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivm-cancel")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    def chunk(i: Int, rows: Seq[SignedJoinRow]): Unit =
      StreamTestIO.writeChunk(rows.toDS().toDF(),
        dir.resolve(s"c$i.parquet"), base + i * 1000)
    // batch 0: two inserts; batch 1: exact retractions (group cancels);
    // batch 2: revival — must restart from EMPTY state (upd resets),
    // not from a lingering zero row
    chunk(0, Seq(SignedJoinRow("P", 2000L, 100L, 1L),
      SignedJoinRow("P", 2000L, 50L, 1L)))
    chunk(1, Seq(SignedJoinRow("P", 2000L, 100L, -1L),
      SignedJoinRow("P", 2000L, 50L, -1L)))
    chunk(2, Seq(SignedJoinRow("P", 2000L, 7L, 1L)))
    val q = EventStreams.runToMemory(
      IvmStream.view(historyStream(dir.toString).as[SignedJoinRow]).toDF(),
      "ivm_cancel")
    try {
      val rows = spark.table("ivm_cancel").collect()
        .map(r => (r.getAs[Long]("upd"), r.getAs[Long]("revenue_cents"),
          r.getAs[Long]("n_items"), r.getAs[Boolean]("live")))
        .toSeq.sorted
      // upd 0: live (150, 2); upd 1: tombstone (0, 0, live=false);
      // then the revival starts over at upd 0 — proof the state was
      // REMOVED, not zeroed in place
      assert(rows == Seq((0L, 7L, 1L, true), (0L, 150L, 2L, true),
        (1L, 0L, 0L, false)))
    } finally q.stop()
  }
}
