package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable
import graft.streaming.SnapshotIngest

/** Streaming ingest into the snapshot table vs its batch contract:
  * after replaying the orders table in micro-batches the latest
  * version's content equals the table (one commit per batch,
  * appends + merges both exercised), and a REPLAYED batch id commits
  * nothing — the exactly-once manifest-token guarantee. */
class StreamSnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def om(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM")

  test("streamed ingest content equals batch; one commit per batch") {
    val s = spark
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("om", om($"o_orderdate"))
    val table = java.nio.file.Files.createTempDirectory("graft-ingest")
    table.toFile.deleteOnExit()
    // initial commit: the earliest months (the frozen history)
    val init = orders.filter($"om" < "1996-01")
    SnapshotTable.init(spark, init, table.toString, "om", "o_orderkey")
    // the stream: the remaining years arrive as two chunks — chunk 2
    // RE-DELIVERS an overlapping month slice so a batch both appends
    // new partitions and merges an existing one
    val src = java.nio.file.Files.createTempDirectory("graft-ingest-src")
    src.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    StreamTestIO.writeChunk(orders.filter($"om" >= "1996-01" && $"om" < "1998-01"),
      src.resolve("c1.parquet"), base)
    StreamTestIO.writeChunk(
      orders.filter($"om" >= "1997-06"), // overlaps 1997-06..12 → merge
      src.resolve("c2.parquet"), base + 1000)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ck")
    ckpt.toFile.deleteOnExit()
    val stream = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = SnapshotIngest.start(stream, table.toString, "om",
      "o_orderkey", "o_orderkey", ckpt.toString)
    q.awaitTermination()
    val v = SnapshotTable.currentVersion(table.toString)
    assert(v == 3, s"init + 2 batch commits expected, got $v")
    assert(SnapshotTable.batchIdOf(table.toString, 2).contains(0L))
    assert(SnapshotTable.batchIdOf(table.toString, 3).contains(1L))
    // content: latest version == the full table (overlap merged, not
    // duplicated)
    val got = SnapshotTable.readVersion(spark, table.toString, v)
    assert(got.count() == orders.count())
    assert(got.agg(sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long"))).collect()(0) ==
      orders.agg(sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long"))).collect()(0))

    // exactly-once: re-delivering an ALREADY-COMMITTED batch id is a
    // manifest no-op (the crash-and-retry path of foreachBatch)
    val replay = SnapshotTable.ingestCommit(spark, table.toString,
      orders.filter($"om" >= "1997-06"), "om", "o_orderkey",
      "o_orderkey", batchId = 1L)
    assert(replay == v, "replayed batch must not advance the version")
    assert(SnapshotTable.currentVersion(table.toString) == v)
    // and a NEW batch id still commits
    val next = SnapshotTable.ingestCommit(spark, table.toString,
      orders.filter($"om" === "1999-01"), "om", "o_orderkey",
      "o_orderkey", batchId = 2L)
    assert(next == v + 1)
  }

  test("streamed CDC-apply: changelog batches merge exactly-once") {
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("om", om($"o_orderdate"))
      .filter($"om" < "1995-07")
    val table = java.nio.file.Files.createTempDirectory("graft-cdcapply")
    table.toFile.deleteOnExit()
    SnapshotTable.init(spark, orders, table.toString, "om", "o_orderkey")
    // two changelog batches: month 02 (delete %3==0, update %3==1),
    // then month 04 (update %2==0, insert shifted clones of %5==0)
    def feb = orders.filter($"om" === "1995-02")
    def apr = orders.filter($"om" === "1995-04")
    val c1 = feb.filter(pmod($"o_orderkey", lit(3)) === 0)
        .withColumn("op", lit("D"))
      .unionByName(feb.filter(pmod($"o_orderkey", lit(3)) === 1)
        .withColumn("o_totalprice", $"o_totalprice" + 50.0)
        .withColumn("op", lit("U")))
    val c2 = apr.filter(pmod($"o_orderkey", lit(2)) === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 20.0)
        .withColumn("op", lit("U"))
      .unionByName(apr.filter(pmod($"o_orderkey", lit(5)) === 0)
        .withColumn("o_orderkey", $"o_orderkey" + 800000L)
        .withColumn("op", lit("U")))
    val src = java.nio.file.Files.createTempDirectory("graft-cdc-src")
    src.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    StreamTestIO.writeChunk(c1, src.resolve("c1.parquet"), base)
    StreamTestIO.writeChunk(c2, src.resolve("c2.parquet"), base + 1000)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ck")
    ckpt.toFile.deleteOnExit()
    val stream = spark.readStream.schema(
        org.apache.spark.sql.types.StructType(c1.schema))
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = graft.streaming.SnapshotIngest.startMerge(stream,
      table.toString, "op", "om", "o_orderkey", "o_orderkey",
      ckpt.toString)
    q.awaitTermination()
    val v = SnapshotTable.currentVersion(table.toString)
    assert(v == 3, s"init + 2 merge commits expected, got $v")
    // reference: the same feeds applied as batch merges to a twin
    val twin = java.nio.file.Files.createTempDirectory("graft-cdc-twin")
    twin.toFile.deleteOnExit()
    SnapshotTable.init(spark, orders, twin.toString, "om", "o_orderkey")
    SnapshotTable.mergeCommit(spark, twin.toString, c1, "op", "om",
      "o_orderkey", "o_orderkey")
    SnapshotTable.mergeCommit(spark, twin.toString, c2, "op", "om",
      "o_orderkey", "o_orderkey")
    def img(path: String) = SnapshotTable.readVersion(spark, path, 3)
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[String]("om"),
        math.round(r.getAs[Double]("o_totalprice") * 100))).toSet
    assert(img(table.toString) == img(twin.toString))
    // replayed batch id → manifest no-op
    val replay = SnapshotTable.mergeCommit(spark, table.toString, c2,
      "op", "om", "o_orderkey", "o_orderkey", batchId = Some(1L))
    assert(replay == v)
    assert(SnapshotTable.currentVersion(table.toString) == v)
  }
}
