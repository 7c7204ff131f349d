package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational9}

/** Semantic properties of the ninth tranche. */
class Relational9Spec extends SparkSpec {

  test("t29 leaked pairs straddle the split and are a subset of d02's pairs") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.01" // sf0.001 has too few near-dup pairs
    val leaks = Relational9.t29(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(leaks.nonEmpty, "sf0.01 plants cross-split near-dups")
    val d02 = Dedup.d02(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    def fold(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 10
    }
    leaks.foreach { case (test, train, j) =>
      assert(fold(test) >= 9, s"test doc $test must be in the test fold")
      assert(fold(train) < 9, s"train doc $train must be in a train fold")
      assert(d02.contains((math.min(test, train), math.max(test, train), j)),
        s"leak ($test,$train) must be a d02 near-dup pair")
    }
  }

  test("t30 cluster-aware split provably eliminates the leaks t29 finds") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.01"
    // the naive per-doc split leaks (t29 is non-empty)...
    assert(Relational9.t29(s, dir).count() > 0)
    // ...the cluster-aware split cannot: every d02 pair shares a fold
    val folds = Relational9.clusterAwareSplit(s, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.d02(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(folds(a) == folds(b),
        s"near-dup pair ($a,$b) must share a fold: ${folds(a)} vs ${folds(b)}")
    }
    // and the split is still roughly 90/10 over documents
    val nTest = folds.values.count(_ >= 9)
    assert(nTest > 0 && nTest < folds.size / 2)
  }

  test("e08 gap stats: mass equals n-1 per type, percentiles ordered") {
    val s = spark
    import s.implicits._
    val rows = Relational9.e08(s, sf).collect()
    assert(rows.nonEmpty)
    val counts = Tables.load(s, sf, "events").groupBy($"event_type")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == counts(r.getString(0)) - 1,
        "every consecutive pair contributes one gap")
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4),
        s"p50 <= p95 <= max: $r")
    }
  }

  test("q53 robust stats: MAD non-negative, outliers a strict minority") {
    val s = spark
    import s.implicits._
    val rows = Relational9.q53(s, sf).collect()
    assert(rows.nonEmpty)
    val counts = Tables.load(s, sf, "events").groupBy($"event_type")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0, "MAD >= 0")
      // by construction at most half the values exceed the median
      // absolute deviation, and the 3*1.4826 scaling cuts far deeper
      assert(r.getLong(3) < counts(r.getString(0)) / 2,
        s"robust outliers must be a minority: $r")
    }
  }

  test("t29m over materialized pairs equals inline t29 row-for-row") {
    val s = spark
    val inline = Relational9.t29(s, sf).collect().toSeq
    val mat = Relational9.t29m(s, sf).collect().toSeq
    assert(inline == mat,
      s"materialized audit diverged: ${inline.size} vs ${mat.size} rows")
    assert(inline.nonEmpty, "audit should find at least one leak at sf0.001")
  }
}
