package graft

import org.apache.spark.sql.functions._

/** Tranche-16 operators: q61 compaction, q62 snapshot time travel,
  * x09 HLL sketch shards, t43 DSIR weights. The DuckDB gate checks
  * content at sf0.01; these tests check the parts content can't see
  * — which bytes moved (q61/q62), the sketch algebra (x09) — plus an
  * in-process brute-force oracle for t43. */
class Relational16Spec extends SparkSpec {

  import spark.implicits._

  // ---- q61: compaction ---------------------------------------------

  test("q61: compaction collapses the fragmented file count") {
    val (_, before, after) = operators.Relational16.compactedOrders(spark, sf)
    assert(before >= 200, s"fixture should be fragmented, got $before files")
    assert(after.toDouble < before.toDouble / 4,
      s"compaction should collapse files: $before -> $after")
  }

  test("q61: every compacted file is internally sorted by o_orderkey") {
    val (path, _, _) = operators.Relational16.compactedOrders(spark, sf)
    val files = graft.sources.FileFormats.listPartFiles(new java.io.File(path))
    assert(files.nonEmpty)
    files.foreach { f =>
      val keys = spark.read.parquet(f.toString)
        .select("o_orderkey").collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"unsorted file $f")
    }
  }

  test("q61: compacted content is the original table") {
    val (path, _, _) = operators.Relational16.compactedOrders(spark, sf)
    val got = spark.read.parquet(path)
      .agg(count(lit(1)), sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long")))
      .collect()(0)
    val want = Tables.load(spark, sf, "orders")
      .agg(count(lit(1)), sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long")))
      .collect()(0)
    assert(got == want)
  }

  // ---- q62: snapshot time travel -----------------------------------

  test("q62: v2 shares every untouched partition's files with v1 by reference") {
    val path = operators.Relational16.snapshotOrdersPath(spark, sf)
    val v1 = sources.SnapshotTable.manifest(path, 1).toSet
    val v2 = sources.SnapshotTable.manifest(path, 2).toSet
    val touched = s"om=${operators.Relational16.Q62_MONTH}"
    // every v1 file outside the touched partition carries over
    // verbatim — stats and all
    assert(v1.filterNot(_.rel.startsWith(touched)) ==
      v2.filterNot(_.rel.startsWith(touched)))
    // the touched partition was fully replaced with commit-2 files
    assert(v2.filter(_.rel.startsWith(touched))
      .forall(_.rel.split("/").last.startsWith("c2-")))
    assert((v1 & v2).nonEmpty && v1 != v2)
  }

  test("q62: v1 files all still exist on disk after the v2 commit") {
    val path = operators.Relational16.snapshotOrdersPath(spark, sf)
    sources.SnapshotTable.manifest(path, 1).foreach { e =>
      assert(new java.io.File(s"$path/files/${e.rel}").isFile,
        s"missing ${e.rel}")
    }
  }

  test("q62: manifest stats are honest per-file min/max/rowcounts") {
    val path = operators.Relational16.snapshotOrdersPath(spark, sf)
    val entries = sources.SnapshotTable.manifest(path, 2)
    assert(entries.size >= 100, "range×month layout should fan out files")
    // spot-check a sample against the actual file contents
    entries.take(20).foreach { e =>
      val r = spark.read.parquet(s"$path/files/${e.rel}")
        .agg(min($"o_orderkey"), max($"o_orderkey"), count(lit(1)))
        .collect()(0)
      assert(r.getLong(0) == e.min && r.getLong(1) == e.max &&
        r.getLong(2) == e.rows, s"stats lie for ${e.rel}")
    }
  }

  // ---- q63: manifest-stats pruning ---------------------------------

  test("q63: stats pruning skips most files and loses no rows") {
    val path = operators.Relational16.snapshotOrdersPath(spark, sf)
    val (lo, hi) = (operators.Relational16.Q63_LO, operators.Relational16.Q63_HI)
    val (pruned, live, total) = sources.SnapshotTable.readVersionPruned(
      spark, path, 2, "o_orderkey", lo, hi)
    assert(live < total / 2, s"should skip most files: $live of $total read")
    val want = sources.SnapshotTable.readVersion(spark, path, 2)
      .filter($"o_orderkey".between(lo, hi))
      .agg(count(lit(1)), sum($"o_orderkey")).collect()(0)
    val got = pruned.agg(count(lit(1)), sum($"o_orderkey")).collect()(0)
    assert(got == want)
    assert(got.getLong(0) > 0, "range must be non-vacuous")
  }

  test("q62: time-travel read of v1 equals the pre-upsert table") {
    val path = operators.Relational16.snapshotOrdersPath(spark, sf)
    val got = sources.SnapshotTable.readVersion(spark, path, 1)
      .agg(count(lit(1)), sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long")))
      .collect()(0)
    val want = Tables.load(spark, sf, "orders")
      .agg(count(lit(1)), sum($"o_orderkey"),
        sum(round($"o_totalprice" * 100).cast("long")))
      .collect()(0)
    assert(got == want)
  }

  test("q62: v2 replaces rows (same cardinality, higher total)") {
    val path = operators.Relational16.snapshotOrdersPath(spark, sf)
    def tot(v: Int) = sources.SnapshotTable.readVersion(spark, path, v)
      .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("s"))
      .collect()(0)
    val (a, b) = (tot(1), tot(2))
    assert(a.getLong(0) == b.getLong(0), "upsert must not change row count")
    assert(b.getDouble(1) > a.getDouble(1), "re-price must raise the total")
  }

  // ---- x09: HLL sketch shards --------------------------------------

  test("x09: every quarter's flag is in-bound and the union matches a direct sketch") {
    val rows = operators.Relational16.x09(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) == 1L), "5% error contract broken")
    // mergeability: union-of-month-shards ~= sketching the quarter directly
    // (not bit-identical: a direct sketch keeps its HIP estimator, a
    // union must fall back to the composite estimator)
    val o = Tables.load(spark, sf, "orders").select(
      concat(year($"o_orderdate"), lit("-Q"), quarter($"o_orderdate")).as("qtr"),
      $"o_custkey")
    val direct = o.groupBy($"qtr")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = o.groupBy($"qtr")
      .agg(countDistinct($"o_custkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (q, ex) =>
      assert(math.abs(direct(q) - ex) / ex <= 0.05, s"direct sketch off at $q")
    }
  }

  // ---- t43: DSIR weights -------------------------------------------

  private def jvmHash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def toks(s: String): Array[String] = {
    val t = s.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    if (t.length == 1 && t(0).isEmpty) Array.empty else t
  }

  test("t43: weights equal the brute-force DSIR computation") {
    val B = 256
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, lang, text) =>
      val m = toks(text).map(t => jvmHash64(t) % B)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      (id, lang, m)
    }
    val raw = new Array[Long](B); val tgt = new Array[Long](B)
    perDoc.foreach { case (_, lang, m) =>
      m.foreach { case (b, c) =>
        raw(b.toInt) += c; if (lang == "en") tgt(b.toInt) += c
      }
    }
    val rr = raw.sum; val tt = tgt.sum
    val lr = Array.tabulate(B)(b =>
      math.log(tgt(b) + 1.0) - math.log(tt + B.toDouble) -
        math.log(raw(b) + 1.0) + math.log(rr + B.toDouble))
    val want = perDoc.map { case (id, _, m) =>
      id -> (m.values.sum, m.map { case (b, c) => c * lr(b.toInt) }.sum)
    }.toMap
    val got = operators.Relational16.t43(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (nTok, w) = want(r.getLong(0))
      assert(r.getLong(1) == nTok)
      assert(math.abs(r.getDouble(2) - w) < 2e-4, s"doc ${r.getLong(0)}")
    }
  }

  test("t43: target-domain docs score higher on average") {
    val byLang = operators.Relational16.t43(spark, sf)
      .join(Tables.load(spark, sf, "documents").select("doc_id", "lang"), "doc_id")
      .groupBy($"lang" === "en").agg(avg($"dsir_w").as("w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} must exceed non-en ${byLang(false)}")
  }
}
