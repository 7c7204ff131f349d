package graft

import org.apache.spark.sql.functions._
import graft.sources.{SnapshotTable, TableMaintenance}
import graft.streaming.SnapshotIngest

/** The OPTIMIZE policy loop: a fragmented, over-versioned,
  * mask-burdened table must CONVERGE under one maintenance pass —
  * content preserved, every partition at one file, masks retired,
  * history bounded — and a second pass must plan nothing
  * (idempotence). The q79 gate hash-checks the converged audit; these
  * tests pin the loop mechanics and its streaming composition. */
class TableMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private def om(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM")

  private def filesPerPartition(path: String): Map[String, Int] = {
    val cur = SnapshotTable.currentVersion(path)
    SnapshotTable.manifest(path, cur)
      .groupBy(_.rel.split("/").head).view.mapValues(_.size).toMap
  }

  test("maintenance converges a fragmented, masked, over-versioned table") {
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("om", om($"o_orderdate"))
      .filter($"om" < "1996-01")
    val table = java.nio.file.Files.createTempDirectory("graft-maint-spec")
    table.toFile.deleteOnExit()
    // fragmented init (8-way round robin → up to 8 files per month),
    // then a MOR mask, then a second upsert for history depth
    SnapshotTable.init(spark, orders.repartition(8), table.toString,
      "om", "o_orderkey")
    assert(filesPerPartition(table.toString).values.max > 1,
      "fixture must start fragmented")
    SnapshotTable.commitDeletes(spark, table.toString,
      orders.filter(pmod($"o_custkey", lit(10)) === 0)
        .select($"o_orderkey"), "o_orderkey")
    val expect = SnapshotTable
      .readVersionMor(spark, table.toString, 2, "o_orderkey")
      .agg(count(lit(1)), sum(round($"o_totalprice" * 100).cast("long")))
      .collect()(0)
    val report = TableMaintenance.runOnce(spark, table.toString,
      "om", "o_orderkey", "o_orderkey")
    assert(report.map(_.action) == Seq("compact", "retire_masks", "vacuum"),
      s"got $report")
    // converged: 1 file/partition, no masks, exactly 1 live version
    assert(filesPerPartition(table.toString).values.forall(_ == 1))
    val cur = SnapshotTable.currentVersion(table.toString)
    assert(SnapshotTable.deleteManifest(table.toString, cur)
      .count(_.rows > 0) == 0)
    assert(SnapshotTable.liveVersions(table.toString) == Seq(cur))
    // content preserved bit-for-bit through rewrite + vacuum
    val got = SnapshotTable.readVersion(spark, table.toString, cur)
      .agg(count(lit(1)), sum(round($"o_totalprice" * 100).cast("long")))
      .collect()(0)
    assert(got == expect, "maintenance must not change visible content")
    // idempotent: the converged table plans zero actions
    assert(TableMaintenance.runOnce(spark, table.toString,
      "om", "o_orderkey", "o_orderkey").isEmpty)
    val (frag, masks, keepFrom) =
      TableMaintenance.plan(table.toString, TableMaintenance.Policy())
    assert(frag.isEmpty && masks == 0 && keepFrom == 0)
  }

  test("policy knobs: a tolerant policy leaves tolerable debt alone") {
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("om", om($"o_orderdate"))
      .filter($"om" < "1995-04")
    val table = java.nio.file.Files.createTempDirectory("graft-maint-knob")
    table.toFile.deleteOnExit()
    SnapshotTable.init(spark, orders.repartition(2), table.toString,
      "om", "o_orderkey")
    val maxBefore = filesPerPartition(table.toString).values.max
    assert(maxBefore <= 2)
    // 8 files tolerated, keep all history → nothing to do
    val report = TableMaintenance.runOnce(spark, table.toString,
      "om", "o_orderkey", "o_orderkey",
      TableMaintenance.Policy(maxFilesPerPartition = 8, keepVersions = 10))
    assert(report.isEmpty, s"tolerant policy must plan nothing: $report")
    assert(SnapshotTable.currentVersion(table.toString) == 1)
  }

  test("maintained streaming ingest stays converged batch over batch") {
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("om", om($"o_orderdate"))
    val init = orders.filter($"om" < "1995-07")
    val table = java.nio.file.Files.createTempDirectory("graft-maint-stream")
    table.toFile.deleteOnExit()
    SnapshotTable.init(spark, init.repartition(4), table.toString,
      "om", "o_orderkey")
    // three arrival chunks, each round-robined 4 ways so every batch
    // RE-FRAGMENTS its months — the debt the in-loop maintenance pays
    val src = java.nio.file.Files.createTempDirectory("graft-maint-src")
    src.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    val chunks = Seq("1995-07" -> "1996-01", "1996-01" -> "1996-07",
      "1996-07" -> "1997-01")
    chunks.zipWithIndex.foreach { case ((lo, hi), i) =>
      StreamTestIO.writeChunk(
        orders.filter($"om" >= lo && $"om" < hi).repartition(4),
        src.resolve(s"c$i.parquet"), base + i * 1000)
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-maint-ck")
    ckpt.toFile.deleteOnExit()
    val stream = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = SnapshotIngest.startMaintained(stream, table.toString, "om",
      "o_orderkey", "o_orderkey", ckpt.toString,
      TableMaintenance.Policy(maxFilesPerPartition = 1, keepVersions = 2))
    q.awaitTermination()
    // converged after every batch: final layout is 1 file/partition
    // and history is bounded by the policy
    assert(filesPerPartition(table.toString).values.forall(_ == 1))
    assert(SnapshotTable.liveVersions(table.toString).size <= 2)
    // content: everything that arrived is there exactly once
    val want = orders.filter($"om" < "1997-01")
    val cur = SnapshotTable.currentVersion(table.toString)
    val got = SnapshotTable.readVersion(spark, table.toString, cur)
    assert(got.count() == want.count())
    assert(got.agg(sum($"o_orderkey")).head.getLong(0) ==
      want.agg(sum($"o_orderkey")).head.getLong(0))
  }

  test("maintained stream + independent merge writer: both land via OCC") {
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("om", om($"o_orderdate"))
    val init = orders.filter($"om" < "1995-07")
    val table = java.nio.file.Files.createTempDirectory("graft-occ-stream")
    table.toFile.deleteOnExit()
    SnapshotTable.init(spark, init.repartition(4), table.toString,
      "om", "o_orderkey")
    val src = java.nio.file.Files.createTempDirectory("graft-occ-src")
    src.toFile.deleteOnExit()
    val base = System.currentTimeMillis() - 60000
    val chunks = Seq("1995-07" -> "1996-01", "1996-01" -> "1996-07",
      "1996-07" -> "1997-01")
    chunks.zipWithIndex.foreach { case ((lo, hi), i) =>
      StreamTestIO.writeChunk(
        orders.filter($"om" >= lo && $"om" < hi).repartition(4),
        src.resolve(s"c$i.parquet"), base + i * 1000)
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-occ-ck")
    ckpt.toFile.deleteOnExit()
    // the INDEPENDENT writer: merge commits re-pricing frozen months
    // (disjoint from the stream's arrivals) while the maintained
    // ingest loop runs — each side's commits race the other's and
    // serialize through the OCC rebase
    @volatile var err: Option[Throwable] = None
    val merger = new Thread(() => {
      try {
        for (m <- Seq("1995-01", "1995-02", "1995-03")) {
          val changes = SnapshotTable
            .readVersion(spark, table.toString, 1)
            .filter($"om" === m)
            .withColumn("o_totalprice", $"o_totalprice" + 7.0)
            .withColumn("op", lit("U"))
          SnapshotTable.mergeCommit(spark, table.toString, changes,
            "op", "om", "o_orderkey", "o_orderkey"): Unit
        }
      } catch { case t: Throwable => err = Some(t) }
    })
    val stream = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = graft.streaming.SnapshotIngest.startMaintained(
      stream, table.toString, "om", "o_orderkey", "o_orderkey",
      ckpt.toString,
      TableMaintenance.Policy(maxFilesPerPartition = 1, keepVersions = 10))
    merger.start()
    q.awaitTermination()
    merger.join(300000)
    err.foreach(throw _)
    // the merge writer may land AFTER the stream's last in-loop pass,
    // leaving its months fragmented — the next scheduled pass (what a
    // deployment's cron provides) converges the residue
    TableMaintenance.runOnce(spark, table.toString,
      "om", "o_orderkey", "o_orderkey",
      TableMaintenance.Policy(maxFilesPerPartition = 1, keepVersions = 10))
    // every commit landed: linear history, every live manifest parses
    val cur = SnapshotTable.currentVersion(table.toString)
    SnapshotTable.liveVersions(table.toString)
      .foreach(v => SnapshotTable.manifest(table.toString, v))
    val fin = SnapshotTable.readVersion(spark, table.toString, cur)
    // stream content all arrived exactly once
    val want = orders.filter($"om" < "1997-01")
    assert(fin.count() == want.count())
    // the merge writer's re-prices all survived the racing
    // compactions (content-preserving by construction)
    for (m <- Seq("1995-01", "1995-02", "1995-03")) {
      val wantC = orders.filter($"om" === m)
        .agg(sum(round(($"o_totalprice" + 7.0) * 100).cast("long")))
        .head.getLong(0)
      val gotC = fin.filter($"om" === m)
        .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
      assert(gotC == wantC, s"merge of $m lost racing the maintained stream")
    }
    // and the maintained layout converged after the final batch
    assert(filesPerPartition(table.toString).values.forall(_ == 1))
  }

  test("property: any policy converges in one pass and then plans nothing") {
    val orders = Tables.load(spark, sf, "orders")
      .withColumn("om", om($"o_orderdate"))
      .filter($"om" < "1995-04")
    val rnd = new scala.util.Random(13) // deterministic
    for (trial <- 1 to 4) {
      val policy = TableMaintenance.Policy(
        maxFilesPerPartition = 1 + rnd.nextInt(3),
        keepVersions = 1 + rnd.nextInt(3))
      val table = java.nio.file.Files
        .createTempDirectory(s"graft-maint-prop$trial")
      table.toFile.deleteOnExit()
      SnapshotTable.init(spark, orders.repartition(1 + rnd.nextInt(6)),
        table.toString, "om", "o_orderkey")
      if (rnd.nextBoolean())
        SnapshotTable.commitDeletes(spark, table.toString,
          orders.filter(pmod($"o_custkey", lit(10)) === 0)
            .select($"o_orderkey"), "o_orderkey")
      val v = SnapshotTable.currentVersion(table.toString)
      val expect = SnapshotTable
        .readVersionMor(spark, table.toString, v, "o_orderkey")
        .agg(count(lit(1)),
          sum(round($"o_totalprice" * 100).cast("long"))).collect()(0)
      TableMaintenance.runOnce(spark, table.toString,
        "om", "o_orderkey", "o_orderkey", policy)
      // converged within the policy's bounds
      val cur = SnapshotTable.currentVersion(table.toString)
      assert(filesPerPartition(table.toString).values
        .forall(_ <= policy.maxFilesPerPartition))
      assert(SnapshotTable.liveVersions(table.toString).size
        <= policy.keepVersions)
      // content preserved through whatever the policy did
      val got = SnapshotTable.readVersionMor(spark, table.toString, cur,
        "o_orderkey")
        .agg(count(lit(1)),
          sum(round($"o_totalprice" * 100).cast("long"))).collect()(0)
      assert(got == expect, s"policy $policy changed visible content")
      // idempotent: a second pass plans zero actions
      val again = TableMaintenance.runOnce(spark, table.toString,
        "om", "o_orderkey", "o_orderkey", policy)
      assert(again.isEmpty, s"policy $policy not converged: $again")
    }
  }
}
