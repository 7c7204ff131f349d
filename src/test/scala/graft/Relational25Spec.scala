package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational25, Similarity}

/** t46's phrase semantics and s26's filtered-search contract —
  * including the MEASURED post-filter recall loss that justifies the
  * pre-filter plan. */
class Relational25Spec extends SparkSpec {

  import spark.implicits._

  test("t46: every reported occurrence is a real consecutive match") {
    val hits = Relational25.t46(spark, sf)
    assert(hits.count() > 0)
    // independent recompute via string containment on the normalized
    // token stream (a DIFFERENT mechanism than the positional sweep):
    // occurrences of the space-joined phrase inside the space-joined
    // doc, counted non-overlapping-free via positions — for trigram
    // phrases with distinct-enough shapes, split-count is a safe
    // lower-bound cross-check; we assert exact equality on n_occ > 0
    // membership and self-match presence instead of count equality
    // (split-counting undercounts overlapping matches).
    val d = Tables.load(spark, sf, "documents")
      .select($"doc_id", concat_ws(" ",
        functions.NativeKernels.word_tokens($"text")).as("joined"))
    val ph = Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 5)
      .select($"doc_id".as("q_id"), concat_ws(" ",
        slice(functions.NativeKernels.word_tokens($"text"), 1, 3))
        .as("phrase"))
      .filter(length($"phrase") > 0)
    val contains = d.crossJoin(broadcast(ph))
      .filter(($"joined" === $"phrase") ||
        $"joined".startsWith(concat($"phrase", lit(" "))) ||
        $"joined".endsWith(concat(lit(" "), $"phrase")) ||
        $"joined".contains(concat(lit(" "), $"phrase", lit(" "))))
      .select($"q_id", $"doc_id")
    val reported = hits.select($"q_id", $"doc_id")
    assert(reported.exceptAll(contains).isEmpty,
      "t46 reported a doc the containment check rejects")
    assert(contains.exceptAll(reported).isEmpty,
      "t46 missed a doc the containment check finds")
    // every query phrase matches its own source doc
    val selfMisses = ph.select($"q_id").exceptAll(
      reported.filter($"q_id" === $"doc_id").select($"q_id"))
    assert(selfMisses.isEmpty)
  }

  test("s26: every neighbor satisfies the metadata predicate, full k") {
    val hits = Similarity.s26(spark, sf)
    val allowed = Tables.load(spark, sf, "documents")
      .filter($"lang" === "fr").select($"doc_id".as("neighbor_id"))
    assert(hits.join(allowed, Seq("neighbor_id"), "left_anti").isEmpty,
      "a filtered result fails the predicate")
    // selective-but-common predicate: every query fills its top-5
    val perQ = hits.groupBy($"q_id").count().as[(Long, Long)]
      .collect().toMap
    assert(perQ.size == 5 && perQ.values.forall(_ == 5L))
  }

  test("s26: post-filtering the unfiltered top-k measurably loses recall") {
    val post = Similarity.s26PostFilterHits(spark, sf)
      .as[(Long, Long)].collect().toMap
    val totalPost = (0L until 5L).map(post.getOrElse(_, 0L)).sum
    assert(totalPost < 25,
      s"post-filter kept $totalPost/25 — the pre-filter plan would be " +
        "unjustified if the global top-k already satisfied the predicate")
  }
}
