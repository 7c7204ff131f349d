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

  test("streamed multiset fold equals batch q82 (minmax tws face)") {
    val hist = Relational22.signedHistory(spark, sf)
    val dir = chunkedDir("ivm-minmax", hist, 3)
    // the chunk hash interleaves signs, so retractions (including the
    // both-side-delete cross term's +1 restores) arrive before and
    // after the rows they cancel — the multiset fold must not care
    StreamTestIO.withRocksDB(spark) {
      val q = EventStreams.runToMemory(
        IvmStream.minmaxTws(historyStream(dir).as[SignedJoinRow]).toDF(),
        "ivm_minmax")
      try {
        val last = spark.table("ivm_minmax").collect()
          .groupBy(r => (r.getAs[String]("o_orderpriority"),
            r.getAs[Long]("o_year")))
          .view.mapValues(_.maxBy(_.getAs[Long]("upd"))).values
          .filter(_.getAs[Boolean]("live")).toSeq
        val got = last
          .map(r => (r.getAs[String]("o_orderpriority"),
            r.getAs[Long]("o_year"), r.getAs[Long]("min_cents"),
            r.getAs[Long]("max_cents"), r.getAs[Long]("n_items")))
          .sorted
        val batch = Relational22.q82(spark, sf)
          .select($"o_orderpriority", $"o_year", $"min_cents",
            $"max_cents", $"n_items")
          .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
        assert(got == batch, "minmax tws face diverges from batch q82")
        // the SAME state also serves q83's exact distinct count —
        // one multiset, three statistics
        val gotD = last
          .map(r => (r.getAs[String]("o_orderpriority"),
            r.getAs[Long]("o_year"), r.getAs[Long]("n_distinct"),
            r.getAs[Long]("n_items")))
          .sorted
        val batchD = Relational22.q83(spark, sf)
          .select($"o_orderpriority", $"o_year", $"n_distinct",
            $"n_items")
          .as[(String, Long, Long, Long)].collect().toSeq.sorted
        assert(gotD == batchD, "distinct face diverges from batch q83")
      } finally q.stop()
    }
  }

  test("extrema face: a retraction exposes the runner-up; zero entries free") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivm-mm")
    dir.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    def chunk(i: Int, rows: Seq[SignedJoinRow]): Unit =
      StreamTestIO.writeChunk(rows.toDS().toDF(),
        dir.resolve(s"c$i.parquet"), base + i * 1000)
    // batch 0: a retraction ARRIVES BEFORE its row (m = -1 for 100);
    // batch 1: values 100 (annihilates), 50, 70 — min must be 50;
    // batch 2: retract the minimum 50 — the runner-up 70 surfaces,
    // exactly what q81's single-row state can never do
    chunk(0, Seq(SignedJoinRow("P", 2000L, 100L, -1L)))
    chunk(1, Seq(SignedJoinRow("P", 2000L, 100L, 1L),
      SignedJoinRow("P", 2000L, 50L, 1L),
      SignedJoinRow("P", 2000L, 70L, 1L)))
    chunk(2, Seq(SignedJoinRow("P", 2000L, 50L, -1L)))
    StreamTestIO.withRocksDB(spark) {
      val q = EventStreams.runToMemory(
        IvmStream.minmaxTws(historyStream(dir.toString)
          .as[SignedJoinRow]).toDF(),
        "ivm_mm_runner")
      try {
        val rows = spark.table("ivm_mm_runner").collect()
          .map(r => (r.getAs[Long]("upd"), r.getAs[Long]("min_cents"),
            r.getAs[Long]("max_cents"), r.getAs[Long]("n_items"),
            r.getAs[Boolean]("live")))
          .toSeq.sortBy(_._1)
        // upd 0: only the early retraction — negative entry held,
        // nothing live; upd 1: 100 annihilated, {50, 70} live;
        // upd 2: min retracted, runner-up 70 IS the new extremum
        assert(rows == Seq((0L, 0L, 0L, 0L, false),
          (1L, 50L, 70L, 2L, true), (2L, 70L, 70L, 1L, true)))
      } finally q.stop()
    }
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
