package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Tranche-17: merge-on-read equality deletes (q64) and snapshot CDC
  * (q65). The DuckDB gate checks row content; these tests check what
  * content can't see — which files a commit wrote or shared, the
  * sequence-number rule, carry-over suppression, and the CDC walk's
  * scan economics. */
class Relational17Spec extends SparkSpec {

  import spark.implicits._

  private def fixture = operators.Relational17.snapV4(spark, sf)

  // ---- q64: merge-on-read delete -----------------------------------

  test("q64: the delete commit shares every data file with v2 by reference") {
    val path = fixture
    assert(SnapshotTable.manifest(path, 3) == SnapshotTable.manifest(path, 2),
      "v3 must not rewrite, add, or drop any data file")
    assert(SnapshotTable.deleteManifest(path, 2).isEmpty)
    assert(SnapshotTable.deleteManifest(path, 3).size == 1,
      "one key-sized delete file")
  }

  test("q64: MOR read subtracts exactly the cohort; v2 stays intact") {
    val path = fixture
    val orders = Tables.load(spark, sf, "orders")
    val total = orders.count()
    val cohort = orders
      .filter(pmod($"o_custkey", lit(10)) === operators.Relational17.COHORT)
      .count()
    assert(cohort > 0, "fixture needs a non-empty cohort")
    assert(SnapshotTable.readVersionMor(spark, path, 3, "o_orderkey")
      .count() == total - cohort)
    // time travel is immune to the later delete
    assert(SnapshotTable.readVersion(spark, path, 2).count() == total)
  }

  test("sequence rule: a re-inserted key is not masked by an older delete") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toString
    val base = (1L to 10L).toDF("k")
      .withColumn("p", lit("a")).withColumn("v", lit(1L))
    SnapshotTable.init(spark, base, dir, "p", "k")
    SnapshotTable.commitDeletes(spark, dir, Seq(3L).toDF("k"), "k")
    assert(SnapshotTable.readVersionMor(spark, dir, 2, "k")
      .filter($"k" === 3).count() == 0, "v2 must hide the deleted key")
    val reinsert = Seq((3L, "a", 2L)).toDF("k", "p", "v")
    val v3 = SnapshotTable.upsertPartition(spark, dir, reinsert, "p", "k", "k")
    val row = SnapshotTable.readVersionMor(spark, dir, v3, "k")
      .filter($"k" === 3).select($"v").collect()
    assert(row.map(_.getLong(0)).toSeq == Seq(2L),
      "the re-inserted key must be visible with its NEW value")
    // the rewrite folded the mask into the data: the new files hold
    // no masked row, so the delete file no longer changes anything
    assert(SnapshotTable.readVersion(spark, dir, v3).count() ==
      SnapshotTable.readVersionMor(spark, dir, v3, "k").count())
  }

  // ---- q65: snapshot CDC -------------------------------------------

  test("q65: change-type totals match the raw-data truth") {
    val path = fixture
    val orders = Tables.load(spark, sf, "orders")
    val m4 = orders.filter(
      date_format($"o_orderdate", "yyyy-MM") === operators.Relational17.M4)
    val nCohort = orders
      .filter(pmod($"o_custkey", lit(10)) === operators.Relational17.COHORT)
      .count()
    val nUpd = m4.filter(pmod($"o_custkey", lit(10)) =!=
        operators.Relational17.COHORT)
      .filter(pmod($"o_orderkey", lit(5)) === 0).count()
    val nIns = m4.filter(pmod($"o_custkey", lit(10)) =!=
        operators.Relational17.COHORT)
      .filter(pmod($"o_orderkey", lit(5)) === 1).count()
    val got = SnapshotTable.changesBetween(spark, path, 2, 4, "o_orderkey")
      .groupBy($"change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("delete" -> nCohort, "update" -> nUpd,
      "insert" -> nIns))
  }

  test("q65: carry-over rows are suppressed (no self-identical update)") {
    val path = fixture
    val changes = SnapshotTable.changesBetween(spark, path, 2, 4, "o_orderkey")
    assert(changes.filter($"change_type" === "update" &&
      $"pre" === $"post").count() == 0)
    // every update genuinely re-priced by +5
    val badUpd = changes.filter($"change_type" === "update")
      .filter(round(($"post.o_totalprice" - $"pre.o_totalprice") * 100)
        =!= 500)
      .count()
    assert(badUpd == 0)
  }

  test("q65: a delete-only diff reads no data-side pre/post files") {
    val path = fixture
    // v2 -> v3 is purely a mask commit: data manifests identical
    val (df, hit, shared) =
      SnapshotTable.changesBetweenCounted(spark, path, 2, 3, "o_orderkey")
    assert(shared == SnapshotTable.manifest(path, 2).size)
    assert(hit <= shared)
    val types = df.groupBy($"change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCohort = Tables.load(spark, sf, "orders")
      .filter(pmod($"o_custkey", lit(10)) === operators.Relational17.COHORT)
      .count()
    assert(types == Map("delete" -> nCohort))
  }

  test("q67: compaction collapses files, folds masks, keeps history") {
    val path = fixture
    val m4 = SnapshotTable.manifest(path, 4)
    val m5 = SnapshotTable.manifest(path, 5)
    val parts = m5.map(_.rel.split("/").head).distinct
    // one file per partition after compaction (was up to 8)
    assert(m5.size == parts.size, s"${m5.size} files for ${parts.size} parts")
    assert(m4.size > 4 * m5.size,
      s"fragmented ${m4.size} should collapse past 4x vs ${m5.size}")
    // the cohort mask's lifecycle ended: folded into data, dropped
    assert(SnapshotTable.deleteManifest(path, 5).isEmpty)
    // content invariance: v5 plain read == v4 merge-on-read
    val v5 = SnapshotTable.readVersion(spark, path, 5)
    val v4 = SnapshotTable.readVersionMor(spark, path, 4, "o_orderkey")
    assert(v5.count() == v4.count())
    assert(v5.agg(sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long"))).collect()(0) ==
      v4.agg(sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long"))).collect()(0))
    // time travel is untouched: v3 still hides the cohort
    val cohort = Tables.load(spark, sf, "orders")
      .filter(pmod($"o_custkey", lit(10)) === operators.Relational17.COHORT)
      .count()
    assert(SnapshotTable.readVersionMor(spark, path, 3, "o_orderkey")
      .count() == Tables.load(spark, sf, "orders").count() - cohort)
  }

  test("q67: every compacted file is internally sorted by the stats column") {
    val path = fixture
    SnapshotTable.manifest(path, 5).filter(_.rel.contains("c5-")).foreach {
      e =>
        val keys = spark.read
          .parquet(s"$path/files/${e.rel}")
          .select($"o_orderkey").collect().map(_.getLong(0))
        assert(keys.sameElements(keys.sorted), s"unsorted ${e.rel}")
    }
  }

  test("q68: schema evolution — new column at v6, phantom-free at v5") {
    val path = fixture
    assert(SnapshotTable.versionSchema(path, 6).exists(_.contains("o_channel")))
    assert(SnapshotTable.versionSchema(path, 5).forall(!_.contains("o_channel")))
    // the old version never sees the phantom column
    assert(!SnapshotTable.readVersion(spark, path, 5)
      .columns.contains("o_channel"))
    val v6 = SnapshotTable.readVersion(spark, path, 6)
    assert(v6.columns.contains("o_channel"))
    // null-fill is exactly the files that predate the column
    val m6n = v6.filter($"om" === operators.Relational17.M6).count()
    assert(m6n > 0, "fixture month must be populated")
    assert(v6.filter($"o_channel".isNull).count() == v6.count() - m6n)
    assert(v6.filter($"om" === operators.Relational17.M6 &&
      $"o_channel".isNull).count() == 0)
    // evolution cost one partition rewrite: every non-M6 file shared
    val m5 = SnapshotTable.manifest(path, 5)
      .filterNot(_.rel.startsWith(s"om=${operators.Relational17.M6}"))
    val m6f = SnapshotTable.manifest(path, 6)
      .filterNot(_.rel.startsWith(s"om=${operators.Relational17.M6}"))
    assert(m5 == m6f, "non-M6 files must carry over by reference")
  }

  test("q70: the registered format face equals the library read") {
    val path = fixture
    val viaFormat = spark.read.format("graft-snapshot")
      .option("path", path).option("version", "5")
      .option("statsCol", "o_orderkey").load()
    val viaLib = SnapshotTable.readVersion(spark, path, 5)
    assert(viaFormat.columns.toSeq == viaLib.columns.toSeq)
    assert(viaFormat.count() == viaLib.count())
    // range filter through the format: same rows as the library's
    // stats-pruned read (stats only prune; the row filter decides)
    val lo = operators.Relational17.Q70_LO
    val hi = operators.Relational17.Q70_HI
    val fmtRange = viaFormat
      .filter($"o_orderkey" >= lo && $"o_orderkey" <= hi)
    val (libRange, hit5, total5) = SnapshotTable.readVersionPruned(
      spark, path, 5, "o_orderkey", lo, hi)
    assert(fmtRange.count() == libRange.count() && libRange.count() > 0)
    // the layout trade, both sides: v5's one-sorted-file-per-month
    // compaction gives full-keyspace per-file ranges (no range
    // pruning left), while v2's 8-way key-sliced ingest layout skips
    // most files — same predicate, same API
    assert(hit5 == total5)
    // the q63 range is narrow at every SF (this spec runs at
    // sf0.001 where the keyspace is small)
    val (l2, h2) = (operators.Relational16.Q63_LO,
      operators.Relational16.Q63_HI)
    val fmt2 = spark.read.format("graft-snapshot")
      .option("path", path).option("version", "2")
      .option("statsCol", "o_orderkey").load()
      .filter($"o_orderkey" >= l2 && $"o_orderkey" <= h2)
    val (lib2, hit2, total2) = SnapshotTable.readVersionPruned(
      spark, path, 2, "o_orderkey", l2, h2)
    assert(fmt2.count() == lib2.count())
    assert(hit2 < total2 / 2,
      s"v2's sliced layout must prune: hit=$hit2 total=$total2")
    // default version = latest (v6, which has the evolved schema)
    val latest = spark.read.format("graft-snapshot")
      .option("path", path).load()
    assert(latest.columns.contains("o_channel"))
  }

  test("q71: vacuum expires v1, sweeps orphans, keeps v2 byte-identical") {
    val (path, deleted, kept) =
      operators.Relational17.vacuumedOrders(spark, sf)
    // v1's manifest is gone; v2 is the only survivor
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/manifests/v1.txt")))
    assert(SnapshotTable.currentVersion(path) == 2)
    // reachability: every surviving manifest entry exists on disk,
    // and the kept count is exactly the manifest size
    val m2 = SnapshotTable.manifest(path, 2)
    m2.foreach(e => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/files/${e.rel}")), e.rel))
    assert(kept == m2.size)
    // the sweep actually removed v1's rewritten-partition originals
    assert(deleted > 0)
    // and files shared forward by reference SURVIVED (v2 keeps every
    // untouched partition's v1 files)
    assert(m2.exists(_.rel.contains("/c1-")),
      "shared v1 files must survive the sweep")
    // read-back: full row count of the restricted table
    import org.apache.spark.sql.functions.date_format
    val want = Tables.load(spark, sf, "orders")
      .filter(date_format($"o_orderdate", "yyyy-MM") < "1997-01").count()
    assert(SnapshotTable.readVersion(spark, path, 2).count() == want)
  }

  test("q66: bloom prunes the point lookup; no false negatives") {
    val path = fixture
    // every data file carries a bloom (init and upserts all passed
    // the bloom column)
    assert(SnapshotTable.manifest(path, 2).forall(_.bloom.nonEmpty))
    val probe = Tables.load(spark, sf, "orders")
      .agg(min($"o_custkey")).collect()(0).getLong(0)
    val (df, hit, total) = SnapshotTable.readVersionBloomPruned(
      spark, path, 2, "o_custkey", probe)
    assert(total > 20, s"fixture should be many-filed, got $total")
    assert(hit < total / 4,
      s"bloom should skip most files: hit=$hit total=$total")
    // no false negative: the pruned read returns exactly the rows a
    // full scan filters to
    val want = SnapshotTable.readVersion(spark, path, 2)
      .filter($"o_custkey" === probe).count()
    assert(want > 0 && df.count() == want)
  }

  test("q66: measured bloom false-positive rate at ~1k keys/file") {
    // geometry claim check: BLOOM_BITS=8192, K=3, n=1000 distinct
    // keys per file => theoretical fp = (1 - e^(-3*1000/8192))^3
    // ~ 2.9%; measure it on a synthetic table and bound at 2x theory
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    val base = (0L until 8000L).toDF("k")
      .withColumn("p", ($"k" / 1000).cast("long").cast("string"))
      .repartition(1)
    SnapshotTable.init(spark, base, dir, "p", "k", Some("k"))
    val entries = SnapshotTable.manifest(dir, 1)
    assert(entries.size == 8 && entries.forall(_.rows == 1000))
    val probes = (0 until 2000).map(i => 10000000L + i * 7L)
    val hits = probes.map(k =>
      entries.count(e => SnapshotTable.bloomMightContain(e.bloom, k))).sum
    val fp = hits.toDouble / (probes.size * entries.size)
    assert(fp < 0.06, f"fp rate $fp%.4f exceeds 2x the 2.9%% theory")
    assert(fp > 0.0, "a zero rate would mean the probe never tests bits")
  }

  test("q66: a key absent from the table prunes to (almost) nothing") {
    val path = fixture
    // no order has a negative custkey; hex-probe positions are still
    // well-defined, so only false positives can survive
    val (_, hit, total) = SnapshotTable.readVersionBloomPruned(
      spark, path, 2, "o_custkey", -987654321L)
    assert(hit <= total / 10,
      s"absent key should prune nearly everything: hit=$hit total=$total")
  }

  test("CDC mask walk prunes shared files by the delete keys' range stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    // 8 partitions of 10 keys each -> 8 data files with disjoint
    // [min, max] key ranges in the manifest
    val base = (0L until 80L).toDF("k")
      .withColumn("p", ($"k" / 10).cast("long").cast("string"))
      .withColumn("v", $"k" * 2)
    SnapshotTable.init(spark, base, dir, "p", "k")
    // narrow delete: keys 22..24 live in one partition's range
    SnapshotTable.commitDeletes(spark, dir, (22L to 24L).toDF("k"), "k")
    val (df, hit, shared) =
      SnapshotTable.changesBetweenCounted(spark, dir, 1, 2, "k")
    assert(shared >= 8, s"expected >=8 shared files, got $shared")
    assert(hit < shared && hit >= 1,
      s"stats should prune the walk: hit=$hit shared=$shared")
    assert(df.count() == 3 &&
      df.filter($"change_type" === "delete").count() == 3)
  }
}
