package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Tranche-20: write-audit-publish branches and partition-spec
  * evolution on the snapshot table. The gate hash-checks q75/q76;
  * these tests pin the lifecycle invariants the hash can't see —
  * branch invisibility, drop cleanliness (no orphans), stale-publish
  * refusal, carried-over manifests, and the evolved pruning rates. */
class SnapshotWapSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String = {
    val out = java.nio.file.Files.createTempDirectory("graft-wap-spec")
    out.toFile.deleteOnExit()
    val base = Tables.load(spark, sf, "orders")
      .withColumn("om", date_format($"o_orderdate", "yyyy-MM"))
      .filter($"om" < "1995-07")
      .repartition(2)
    SnapshotTable.init(spark, base, out.toString, "om", "o_orderkey")
    out.toString
  }

  private def filesOnDisk(path: String): Set[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val root = new File(s"$path/files")
    walk(root).map(_.getAbsolutePath
      .stripPrefix(root.getAbsolutePath + "/")).toSet
  }

  private def reachable(path: String): Set[String] =
    (1 to SnapshotTable.currentVersion(path)).flatMap { v =>
      SnapshotTable.manifest(path, v).map(_.rel) ++
        SnapshotTable.deleteManifest(path, v).map(_.rel)
    }.toSet

  test("wap: a staged branch is invisible to main and reads its delta") {
    val path = freshTable()
    val v1Rows = SnapshotTable.readVersion(spark, path, 1).count()
    val delta = SnapshotTable.readVersion(spark, path, 1)
      .filter($"om" === "1995-02")
      .withColumn("o_totalprice", $"o_totalprice" + 100.0)
    SnapshotTable.stageBranch(spark, path, "b1", delta,
      "om", "o_orderkey", "o_orderkey")
    // main untouched: still v1, same rows, no re-priced values
    assert(SnapshotTable.currentVersion(path) == 1)
    val mainRead = SnapshotTable.readVersion(spark, path, 1)
    assert(mainRead.count() == v1Rows)
    val branchRead = SnapshotTable.readBranch(spark, path, "b1",
      "o_orderkey")
    assert(branchRead.count() == v1Rows) // upsert replaces, not appends
    val feb = branchRead.filter($"om" === "1995-02")
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    val febMain = mainRead.filter($"om" === "1995-02")
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    val febN = mainRead.filter($"om" === "1995-02").count()
    assert(feb == febMain + 100L * 100 * febN)
    SnapshotTable.dropBranch(spark, path, "b1")
  }

  test("wap: drop leaves no orphan files and main reads unchanged") {
    val path = freshTable()
    val before = SnapshotTable.readVersion(spark, path, 1)
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    val delta = SnapshotTable.readVersion(spark, path, 1)
      .filter($"om" === "1995-03")
      .withColumn("o_totalprice", -$"o_totalprice")
    SnapshotTable.stageBranch(spark, path, "bad", delta,
      "om", "o_orderkey", "o_orderkey")
    assert(filesOnDisk(path).size > reachable(path).size,
      "staging must have written branch files")
    SnapshotTable.dropBranch(spark, path, "bad")
    assert(filesOnDisk(path) == reachable(path),
      "drop must delete exactly the branch-only files")
    val after = SnapshotTable.readVersion(spark, path, 1)
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    assert(after == before)
  }

  test("wap: publish is atomic rename; a stale branch is refused") {
    val path = freshTable()
    val delta = SnapshotTable.readVersion(spark, path, 1)
      .filter($"om" === "1995-04")
      .withColumn("o_totalprice", $"o_totalprice" + 1.0)
    SnapshotTable.stageBranch(spark, path, "ok", delta,
      "om", "o_orderkey", "o_orderkey")
    // a second branch staged against the same v1
    SnapshotTable.stageBranch(spark, path, "late", delta,
      "om", "o_orderkey", "o_orderkey")
    val v2 = SnapshotTable.publishBranch(spark, path, "ok")
    assert(v2 == 2 && SnapshotTable.currentVersion(path) == 2)
    // published read == what the branch read showed
    val pub = SnapshotTable.readVersion(spark, path, 2)
      .agg(count(lit(1)), sum(round($"o_totalprice" * 100).cast("long")))
      .head
    assert(pub.getLong(0) > 0)
    // the sibling staged at v1 is now stale — must refuse
    intercept[IllegalArgumentException] {
      SnapshotTable.publishBranch(spark, path, "late")
    }
    SnapshotTable.dropBranch(spark, path, "late")
    assert(filesOnDisk(path) == reachable(path))
  }

  test("q75 fixture: the full WAP cycle leaves a clean, audited table") {
    val path = operators.Relational20.wapOrdersPath(spark, sf)
    // the rejected branch is gone without trace
    assert(filesOnDisk(path) == reachable(path))
    // q78's merge fixture may have extended the shared table past v2
    // (the snapV4 convention) — the WAP cycle itself ends at v2
    assert(SnapshotTable.currentVersion(path) >= 2)
    // nothing negated leaked from the dropped branch
    assert(SnapshotTable.readVersion(spark, path, 2)
      .filter($"o_totalprice" <= 0).count() == 0)
    // v1 time travel still shows the un-repriced month
    val m = operators.Relational20.WAP_MONTH
    val v1 = SnapshotTable.readVersion(spark, path, 1)
      .filter($"om" === m)
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    val v2 = SnapshotTable.readVersion(spark, path, 2)
      .filter($"om" === m)
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    assert(v2 > v1)
  }

  test("compaction on an evolved table is spec-scoped") {
    val path = freshTable() // om-spec, repartition(2) → fragmented months
    val delta = Tables.load(spark, sf, "orders")
      .withColumn("om", date_format($"o_orderdate", "yyyy-MM"))
      .filter($"om" === "1995-07")
      .withColumn("od", date_format($"o_orderdate", "yyyy-MM-dd"))
      .drop("om")
      .repartition($"od")
    SnapshotTable.evolveAppend(spark, path, delta, "od", "o_orderkey")
    val before = SnapshotTable.readVersionEvolved(spark, path, 2)
      .agg(count(lit(1)),
        sum(round($"o_totalprice" * 100).cast("long"))).head
    val v3 = SnapshotTable.compactCommit(spark, path, "om",
      "o_orderkey", "o_orderkey")
    assert(v3 == 3)
    val m3 = SnapshotTable.manifest(path, 3)
    // od files carried over byte-identically; om months collapsed
    val odBefore = SnapshotTable.manifest(path, 2)
      .filter(e => SnapshotTable.specOf(e) == "od").toSet
    assert(m3.filter(e => SnapshotTable.specOf(e) == "od").toSet == odBefore)
    val omByPart = m3.filter(e => SnapshotTable.specOf(e) == "om")
      .groupBy(_.rel.split("/").head)
    assert(omByPart.values.forall(_.size == 1),
      "every om month must collapse to one file")
    val after = SnapshotTable.readVersionEvolved(spark, path, 3)
      .agg(count(lit(1)),
        sum(round($"o_totalprice" * 100).cast("long"))).head
    assert(after == before)
  }

  test("merge: deletes, updates, and inserts land in one atomic commit") {
    val path = freshTable()
    val month = SnapshotTable.readVersion(spark, path, 1)
      .filter($"om" === "1995-05")
    val feed = month.filter(pmod($"o_orderkey", lit(3)) === 0)
        .withColumn("op", lit("D"))
      .unionByName(month.filter(pmod($"o_orderkey", lit(3)) === 1)
        .withColumn("o_totalprice", $"o_totalprice" + 50.0)
        .withColumn("op", lit("U")))
      .unionByName(month.filter(pmod($"o_orderkey", lit(3)) === 2)
        .withColumn("o_orderkey", $"o_orderkey" + 900000L)
        .withColumn("op", lit("U")))
    val v2 = SnapshotTable.mergeCommit(spark, path, feed, "op", "om",
      "o_orderkey", "o_orderkey")
    assert(v2 == 2)
    val before = SnapshotTable.readVersion(spark, path, 1)
      .filter($"om" === "1995-05").collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        r.getAs[Double]("o_totalprice")).toMap
    val after = SnapshotTable.readVersion(spark, path, 2)
      .filter($"om" === "1995-05").collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        r.getAs[Double]("o_totalprice")).toMap
    val expected = before.collect {
      case (k, p) if k % 3 == 1 => k -> (p + 50.0)
      case (k, p) if k % 3 == 2 => k -> p
    } ++ before.collect { case (k, p) if k % 3 == 2 =>
      (k + 900000L) -> p }
    assert(after == expected)
    // untouched months carry over BY REFERENCE — byte-identical entries
    val m1 = SnapshotTable.manifest(path, 1)
      .filterNot(_.rel.startsWith("om=1995-05")).toSet
    val m2 = SnapshotTable.manifest(path, 2)
      .filterNot(_.rel.startsWith("om=1995-05")).toSet
    assert(m1 == m2)
  }

  test("q77: history is pure metadata and matches a manifest replay") {
    val df = operators.Relational20.q77(spark, sf)
    // zero data files opened: the frame is a local manifest walk
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"), "history must not scan data")
    val path = operators.Relational17.snapV4(spark, sf)
    val want = (1 to SnapshotTable.currentVersion(path)).map { v =>
      (v.toLong,
        SnapshotTable.manifest(path, v).map(_.rows).sum,
        SnapshotTable.deleteManifest(path, v).map(_.rows).sum,
        SnapshotTable.versionSchema(path, v)
          .map(_.split(",").length.toLong).getOrElse(0L))
    }
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.size == 6)
    // the lifecycle signature: masks live at v3-v4, folded by v5;
    // the evolved column lands at v6
    assert(got.map(_._3).count(_ > 0) == 2)
    assert(got.map(_._4) == Seq(7L, 7L, 7L, 7L, 7L, 8L))
  }

  test("evolution: carried-over manifest, reconciled read, finer pruning") {
    val path = operators.Relational20.evolvedOrdersPath(spark, sf)
    val m1 = SnapshotTable.manifest(path, 1)
    val m2 = SnapshotTable.manifest(path, 2)
    // every v1 file carries over BY REFERENCE, stats included
    assert(m1.toSet.subsetOf(m2.toSet))
    val specs = m2.map(SnapshotTable.specOf).distinct.sorted
    assert(specs == Seq("od", "om"))
    // reconciled read: om xor od per row, counts add up
    val df = SnapshotTable.readVersionEvolved(spark, path, 2)
    assert(df.filter($"om".isNull === $"od".isNull).count() == 0)
    val v1n = SnapshotTable.readVersion(spark, path, 1).count()
    assert(df.count() > v1n)
    // a point-day predicate in the NEW spec reads exactly one file;
    // the same predicate grain in 1995 still pays the month file
    val evoDay = java.time.LocalDate
      .parse(s"${operators.Relational20.EVO_MONTH}-15").toEpochDay
    val (newDf, newRead, total) = SnapshotTable.readVersionEvolvedPruned(
      spark, path, 2, "o_dayl", evoDay, evoDay)
    assert(newRead == 1, s"day-spec point read must hit 1 file, got $newRead")
    assert(total == m2.size)
    assert(newDf.count() ==
      df.filter($"o_dayl" === evoDay).count())
    val oldDay = java.time.LocalDate.parse("1995-05-15").toEpochDay
    val (oldDf, oldRead, _) = SnapshotTable.readVersionEvolvedPruned(
      spark, path, 2, "o_dayl", oldDay, oldDay)
    assert(oldRead >= 1 && oldRead <= m1.size)
    assert(oldDf.count() == df.filter($"o_dayl" === oldDay).count())
  }

  test("vacuum: a staged branch's files are reachability roots") {
    val path = freshTable()
    // v2: a real commit so expireVersions(keepFrom = 2) has history
    // to drop (v1's rewritten partition files become orphans)
    val d2 = SnapshotTable.readVersion(spark, path, 1)
      .filter($"om" === "1995-01")
      .withColumn("o_totalprice", $"o_totalprice" + 1.0)
    assert(SnapshotTable.upsertPartition(spark, path, d2,
      "om", "o_orderkey", "o_orderkey") == 2)
    // stage a WAP branch against v2 — its files exist in the shared
    // tree but NO numbered manifest names them yet
    val delta = SnapshotTable.readVersion(spark, path, 2)
      .filter($"om" === "1995-03")
      .withColumn("o_totalprice", $"o_totalprice" + 100.0)
    SnapshotTable.stageBranch(spark, path, "vac", delta,
      "om", "o_orderkey", "o_orderkey")
    val branchSum = SnapshotTable.readBranch(spark, path, "vac",
      "o_orderkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    val (deleted, _) = SnapshotTable.expireVersions(spark, path, 2)
    assert(deleted > 0, "v1's orphaned rewrite files must be reclaimed")
    // the branch is untouched: still readable, and PUBLISH (a pure
    // manifest rename) lands a version whose every file exists
    val after = SnapshotTable.readBranch(spark, path, "vac", "o_orderkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    assert(after == branchSum, "vacuum must not reclaim staged-branch files")
    val v3 = SnapshotTable.publishBranch(spark, path, "vac")
    assert(v3 == 3)
    val pub = SnapshotTable.readVersion(spark, path, 3)
      .agg(sum(round($"o_totalprice" * 100).cast("long"))).head.getLong(0)
    assert(pub == branchSum)
  }

  test("merge: a delete-only feed that empties its partition still commits") {
    val path = freshTable()
    val v1 = SnapshotTable.readVersion(spark, path, 1)
    val n1 = v1.count()
    val jan = v1.filter($"om" === "1995-01")
    val nJan = jan.count()
    assert(nJan > 0)
    // every January key deleted, nothing inserted: the merged frame
    // for the touched partition is EMPTY — the commit must land with
    // only carried-over entries, not crash on schema inference
    val changes = jan.withColumn("op", lit("D"))
    val v2 = SnapshotTable.mergeCommit(spark, path, changes,
      "op", "om", "o_orderkey", "o_orderkey")
    assert(v2 == 2)
    val r2 = SnapshotTable.readVersion(spark, path, 2)
    assert(r2.filter($"om" === "1995-01").count() == 0)
    assert(r2.count() == n1 - nJan)
    // time travel below the merge still sees the full table
    assert(SnapshotTable.readVersion(spark, path, 1).count() == n1)
  }
}
