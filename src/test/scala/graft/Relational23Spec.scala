package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational23, Similarity}

/** t45's conjunctive contract and s24's relaxation invariants, proven
  * on data (the oracle proves cross-engine equality; these prove the
  * SEMANTICS are the advertised ones). */
class Relational23Spec extends SparkSpec {

  import spark.implicits._

  test("t45: every hit contains every query term") {
    val hits = Relational23.t45(spark, sf)
    val docTokens = Tables.load(spark, sf, "documents")
      .select($"doc_id", functions.NativeKernels.word_tokens($"text")
        .as("tk"))
    val qterms = Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 5)
      .select($"doc_id".as("q_id"),
        explode(functions.NativeKernels.word_tokens($"text")).as("term"))
      .distinct()
      .groupBy($"q_id")
      .agg(slice(array_sort(collect_set($"term")), 1, 3).as("qterms"))
    val violating = hits.join(qterms, Seq("q_id"))
      .join(docTokens, Seq("doc_id"))
      .filter(size(array_except($"qterms", $"tk")) > 0)
    assert(hits.count() > 0 && violating.isEmpty)
  }

  test("t45: ranks are contiguous from 1 with descending scores") {
    val rows = Relational23.t45(spark, sf)
      .select($"q_id", $"rank", $"score_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)))
    }
  }

  test("s24: seeds at zero, distances bounded by hops on the grid") {
    val d = Relational23.s24(spark, sf)
      .select($"vec_id", $"dist_w").as[(Long, Long)].collect().toMap
    assert(d.nonEmpty)
    d.foreach { case (id, w) =>
      if (id % Relational23.SSSP_SEED_MOD == 0) assert(w == 0L)
      else assert(w > 0L &&
        w <= Relational23.SSSP_ROUNDS * 20000L)
    }
  }

  test("s24: weighted distance refines, never contradicts, s19-style hops") {
    // every weighted-reachable node must also be hop-reachable in the
    // same round budget over the same edges, seeds permitting — run
    // hop-BFS over the weighted edge frame with the s24 seed rule
    val edges = Similarity.weightedKnnEdges(spark, sf).localCheckpoint()
    var reached = edges.select($"src".as("id")).distinct()
      .filter(pmod($"id", lit(Relational23.SSSP_SEED_MOD)) === 0)
      .select($"id")
    for (_ <- 1 to Relational23.SSSP_ROUNDS)
      reached = reached.unionByName(
        edges.join(reached, $"src" === $"id").select($"dst".as("id")))
        .distinct()
    val hopSet = reached.as[Long].collect().toSet
    val wSet = Relational23.s24(spark, sf).select($"vec_id")
      .as[Long].collect().toSet
    assert(wSet == hopSet,
      "min-plus must settle exactly the 3-round-reachable set")
  }

  test("s24m equals s24 (materialized asset is content-identical)") {
    val a = Relational23.s24(spark, sf).as[(Long, Long)].collect().toSeq
    val b = Relational23.s24m(spark, sf).as[(Long, Long)].collect().toSeq
    assert(a == b)
  }
}
