package graft

import graft.functions.GroupedTopK
import graft.functions.GroupedTopK.Rec
import graft.operators.Relational4

/** Fourth operator tranche: the typed top-k Aggregator's algebraic
  * properties, cube/grouping-id structure, gap-fill density, bloom
  * pruning equivalence, and dup-cluster invariants. */
class Relational4Spec extends SparkSpec {

  test("TopK aggregator: bounded, ordered, merge-associative") {
    val agg = GroupedTopK.TopK(3)
    val recs = Seq(
      Rec(5.0, 10, 1), Rec(9.0, 3, 2), Rec(9.0, 3, 1), Rec(1.0, 7, 1),
      Rec(9.0, 2, 9), Rec(7.5, 1, 1), Rec(5.0, 9, 4))
    val full = recs.foldLeft(agg.zero)(agg.reduce)
    assert(full == Seq(Rec(9.0, 2, 9), Rec(9.0, 3, 1), Rec(9.0, 3, 2)),
      "top-3 with price desc, orderkey/linenumber tie-break")
    // merge of any split == reduce of the whole
    for (cut <- 0 to recs.length) {
      val (l, r) = recs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == full, s"split at $cut diverged")
    }
    assert(full.length <= 3)
  }

  test("q33 cube emits all four grouping-id levels consistently") {
    val s = spark
    import s.implicits._
    val out = Relational4.q33(s, sf).cache()
    try {
      val gids = out.select($"gid").distinct().as[Long].collect().sorted
      assert(gids.sameElements(Array(0L, 1L, 2L, 3L)))
      // grand total (gid 3) equals the sum of any single level
      val grand = out.filter($"gid" === 3).select($"n").as[Long].head()
      val lvl0 = out.filter($"gid" === 0).select($"n").as[Long].collect().sum
      assert(grand == lvl0)
      // ALL labels appear exactly where the gid says the column is rolled up
      assert(out.filter($"gid" === 3 && ($"priority" =!= "ALL" || $"mon" =!= 0)).isEmpty)
      assert(out.filter($"gid" === 0 && ($"priority" === "ALL" || $"mon" === 0)).isEmpty)
    } finally out.unpersist()
  }

  test("q34 grouped top-k matches the window formulation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    val expected = Tables.load(s, sf, "lineitem")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"l_returnflag", $"rank", round($"l_extendedprice", 2).as("price"),
        $"l_orderkey".as("orderkey"), $"l_linenumber".cast("long").as("linenumber"))
    val got = Relational4.q34(s, sf)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("e02 gap fill produces a dense minute x type grid") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val out = Relational4.e02(s, sf).cache()
    try {
      val minutes = out.select($"minute").distinct().count()
      val types = out.select($"event_type").distinct().count()
      assert(out.count() == minutes * types, "grid must be dense")
      assert(out.filter($"n" === 0).count() > 0, "sf0.001 must have gaps")
      val total = out.agg(sum($"n")).head().getLong(0)
      assert(total == Tables.load(s, sf, "events").count())
    } finally out.unpersist()
  }

  test("x02 bloom pruning returns exactly the semi-join result") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val high = Tables.load(s, sf, "orders").filter($"o_totalprice" > 400000.0)
    val expected = Tables.load(s, sf, "lineitem")
      .join(high, $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey".as("o_orderkey"), $"l_partkey",
        round($"l_extendedprice", 2).as("price"))
    val got = Relational4.x02(s, sf)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("d07 cluster-apply survivors are a subset of d05 pairwise survivors") {
    val s = spark
    import s.implicits._
    // every pairwise-dropped doc (a b_id with a smaller partner) is a
    // non-min cluster member, so cluster-aware dropping is a superset:
    // d07 additionally removes transitive chain members d05 orphans
    val d05 = operators.Relational2.d05(s, sf).select($"doc_id")
    val d07 = Relational4.d07(s, sf).select($"doc_id")
    assert(d07.except(d05).isEmpty, "d07 must not keep what d05 drops")
  }

  test("d06 clusters: labels are cluster minima and cover every paired doc") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val pairs = operators.Dedup.d02(s, sf).select($"a_id", $"b_id").cache()
    try {
      val out = Relational4.d06(s, sf).cache()
      val paired = pairs.select($"a_id".as("doc_id"))
        .union(pairs.select($"b_id".as("doc_id"))).distinct()
      assert(out.count() == paired.count(), "one row per paired doc")
      // cluster_id is the min doc_id of its cluster
      val bad = out.groupBy($"cluster_id").agg(min($"doc_id").as("mn"))
        .filter($"cluster_id" =!= $"mn")
      assert(bad.isEmpty)
      // both endpoints of every pair share a cluster
      val l = out.select($"doc_id".as("a_id"), $"cluster_id".as("ca"))
      val r = out.select($"doc_id".as("b_id"), $"cluster_id".as("cb"))
      val split = pairs.join(l, "a_id").join(r, "b_id").filter($"ca" =!= $"cb")
      assert(split.isEmpty, "edge endpoints must share a cluster")
      out.unpersist()
    } finally pairs.unpersist()
  }

  test("d09 large-star/small-star CC equals d06 label propagation") {
    val s = spark
    import s.implicits._
    val a = Relational4.d06(s, sf).collect().toSeq
    val b = Relational4.d09(s, sf).collect().toSeq
    assert(a == b, "the two CC algorithms must produce identical cluster tables")
  }

  test("d09 converges on a long chain (diameter >> star rounds)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // path graph 0-1-2-...-63: one component, diameter 63 — the shape
    // where label propagation needs O(diameter) rounds; star rounds
    // must still converge (doubly-exponential contraction) and label
    // every node with the minimum, 0
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = Relational4.d09(s, sf, Some(chain))
    assert(out.filter($"cluster_id" =!= 0L || $"cluster_size" =!= 64L).isEmpty)
    assert(out.count() == 64)
  }
}
