package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational12, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Twelfth tranche: BM25 retrieval, PMI collocations, per-source score
  * quantile normalization, and the s11 knn graph. The DuckDB oracle
  * pins cross-engine equality; these specs pin the SEMANTICS — the
  * properties a retrieval/calibration consumer actually relies on. */
class Relational12Spec extends SparkSpec {

  test("t38: scores bounded by the saturation ceiling, ranks contiguous per term") {
    val s = spark
    import s.implicits._
    val rows = Relational12.t38(spark, sf).collect()
    assert(rows.nonEmpty)
    // tf-part < (k1+1) = 2.2 exactly; ppm scale
    assert(rows.forall(r => r.getAs[Long]("score_ppm") > 0L &&
      r.getAs[Long]("score_ppm") < 2200000L))
    val byTerm = rows.groupBy(_.getAs[String]("term"))
    byTerm.foreach { case (term, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.size), s"ranks not contiguous for $term")
      assert(ranks.size <= 5)
      // rank order agrees with score order (desc, doc_id tiebreak)
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          val (sh, sl) = (hi.getAs[Long]("score_ppm"), lo.getAs[Long]("score_ppm"))
          assert(sh > sl || (sh == sl &&
            hi.getAs[Long]("doc_id") < lo.getAs[Long]("doc_id")),
            s"rank inversion for $term")
        case _ =>
      }
    }
  }

  test("t38: longer documents score below shorter ones at equal tf (length normalization)") {
    val s = spark
    import s.implicits._
    val rows = Relational12.t38(spark, sf)
      .select($"term", $"tf", $"dl", $"score_ppm").collect()
    for (Seq(a, b) <- rows.toSeq.combinations(2)
         if a.getAs[Long]("tf") == b.getAs[Long]("tf") &&
            a.getAs[Long]("dl") < b.getAs[Long]("dl")) {
      assert(a.getAs[Long]("score_ppm") >= b.getAs[Long]("score_ppm"),
        s"equal tf but longer doc scored higher: $a vs $b")
    }
  }

  test("t39: collocations respect support floor; integer key matches counts") {
    val rows = Relational12.t39(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_.getAs[Long]("n_ab") >= 5L))
    // the emitted fixed-point key must be the floor-div of its own
    // integer count columns (ADVICE r10: integers are the gate; the
    // consumer derives pmi from them)
    rows.foreach { r =>
      val nAb = r.getAs[Long]("n_ab")
      val nA = r.getAs[Long]("n_a"); val nB = r.getAs[Long]("n_b")
      assert(r.getAs[Long]("r_ppt") == nAb * 1000000000000L / (nA * nB),
        s"r_ppt is not the floor-div fixed point on row $r")
    }
    val keys = rows.map(_.getAs[Long]("r_ppt")).toSeq
    assert(keys == keys.sorted.reverse, "output not in descending-key order")
    // consumer-side pmi derivation: pmi = ln(n_ab·T²/(B·n_a·n_b)) on
    // the exact integer columns, checked with a tolerance (never a
    // rounded-double hash gate) and plausibility-bounded
    val r0 = rows.head
    val tTok = r0.getAs[Long]("t_tok"); val bTok = r0.getAs[Long]("b_tok")
    val pmi0 = math.log(r0.getAs[Long]("n_ab").toDouble * tTok * tTok /
      (bTok.toDouble * r0.getAs[Long]("n_a") * r0.getAs[Long]("n_b")))
    assert(pmi0 > 0.0 && pmi0 <= math.log(tTok.toDouble) + 1.0,
      s"implausible top PMI $pmi0 for T=$tTok")
    // the quantized-key derivation agrees with the exact-count one to
    // quantization error: pmi ≈ ln(r_ppt·T²/(B·10¹²))
    val pmiQ = math.log(r0.getAs[Long]("r_ppt").toDouble * tTok * tTok /
      (bTok.toDouble * 1e12))
    assert(math.abs(pmiQ - pmi0) < 0.01,
      s"fixed-point pmi derivation drifted: $pmiQ vs $pmi0")
  }

  test("t40: percentiles are exact ppm ranks, uniform per source") {
    val s = spark
    import s.implicits._
    val rows = Relational12.t40(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents").count()
    assert(rows.length == docs, "one calibrated row per document")
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val ps = rs.map(_.getAs[Long]("pct_ppm")).sorted.toSeq
      assert(ps.head == 0L && ps.last == 1000000L,
        s"$src percentile range must span [0, 1e6]")
      // percentile order must agree with (score, doc_id) order
      val byScore = rs.sortBy(r =>
        (r.getAs[Long]("score_ppm"), r.getAs[Long]("doc_id")))
      assert(byScore.map(_.getAs[Long]("pct_ppm")).toSeq == ps,
        s"$src percentile does not follow score order")
      // "top 30% of each source" selects ~30% of each source
      val kept = ps.count(_ >= 700000L)
      assert(math.abs(kept.toDouble / ps.size - 0.3) < 0.05,
        s"$src: percentile cut not calibrated ($kept/${ps.size})")
    }
  }

  test("s12: pagerank conserves mass and floors at the teleport term") {
    val s = spark
    import s.implicits._
    val pr = Similarity.s12(spark, sf).collect()
    assert(pr.nonEmpty)
    val n = pr.length
    val total = pr.map(_.getAs[Double]("pr")).sum
    // no dangling nodes → Σr stays exactly 1 per iteration (up to the
    // final per-row round(6), so tolerance n·5e-7)
    assert(math.abs(total - 1.0) <= n * 5e-7 + 1e-9,
      s"pagerank mass not conserved: $total over $n nodes")
    val teleport = 0.15 / n
    assert(pr.forall(_.getAs[Double]("pr") >= teleport - 5e-7),
      "every rank must be at least the teleport term")
    // nodes that are nobody's neighbor hold ~the teleport floor;
    // somebody must sit meaningfully above it for the signal to exist
    assert(pr.map(_.getAs[Double]("pr")).max > 2 * teleport,
      "a dense region should accumulate rank above the floor")
  }

  test("t41: textrank emits a bounded, teleport-floored keyword list") {
    val s = spark
    import s.implicits._
    val kw = Relational12.t41(spark, sf).collect()
    assert(kw.nonEmpty && kw.length <= 20)
    val scores = kw.map(_.getAs[Double]("rank_score"))
    assert(scores.toSeq == scores.sorted.reverse.toSeq, "not rank-ordered")
    // every rank is at least the teleport floor for SOME node count n:
    // scores are positive and bounded by 1
    assert(scores.forall(x => x > 0.0 && x <= 1.0))
    // NOTE: on this synthetic corpus the frequent-bigram graph is
    // near-regular, so ranks sit near-uniform (1/n each) — the gate
    // certifies the machinery; a natural corpus separates keywords.
    // The words themselves must come from the corpus vocabulary.
    val vocab = Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.NativeKernels.word_tokens($"text")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(kw.forall(r => vocab.contains(r.getAs[String]("word"))))
  }

  test("q55: small-quantity revenue respects the per-part threshold semantics") {
    val s = spark
    import s.implicits._
    val out = Relational12.q55(spark, sf).collect()
    assert(out.nonEmpty)
    // every qualifying row sits strictly below ITS part's 0.2·avg —
    // recompute one part's threshold independently and cross-check the
    // global count
    val li = Tables.load(spark, sf, "lineitem")
    val manual = li.groupBy($"l_partkey")
      .agg((avg($"l_quantity") * 0.2).as("thr"))
      .join(li, Seq("l_partkey"))
      .filter($"l_quantity" < $"thr").count()
    assert(out.map(_.getAs[Long]("n_small")).sum == manual,
      "per-brand counts must total the global small-quantity row count")
  }

  test("s12m equals s12 row-for-row (materialized edges change cost, not results)") {
    val a = Similarity.s12(spark, sf).collect().map(_.toSeq).toSeq
    val b = Similarity.s12m(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, "materialized pagerank diverged from the fresh-build form")
  }

  test("s11: a symmetric-candidate top-k graph with s01's determinism contract") {
    val s = spark
    import s.implicits._
    val g = Similarity.s11(spark, sf).collect()
    assert(g.nonEmpty)
    val byVec = g.groupBy(_.getLong(0))
    byVec.foreach { case (v, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.size) &&
          ranks.size <= Similarity.KNN_K,
        s"vec $v ranks malformed: $ranks")
      // r15 diversity order: rank is (dominated ASC, cosine-rank ASC),
      // so cos_sim is NOT monotone in rank — but rank 1 is always the
      // single best candidate (nothing outranks it, so it can't be
      // dominated), hence its cos bounds every emitted edge
      val ordered = rs.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("cos_sim")).toSeq
      assert(ordered.head == ordered.max,
        s"vec $v rank-1 edge is not the best emitted cosine")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != v), "no self-edges")
    }
    // graph edges come from the SAME candidate structure as s03: every
    // s03 pair (cos ≥ 0.4 candidates) whose endpoints each have spare
    // top-k room must appear in at least one direction
    val s03Pairs = Similarity.s03(spark, sf)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = g.map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val covered = s03Pairs.count { case (a, b) =>
      edges.contains((a, b)) || edges.contains((b, a)) }
    assert(covered > 0, "high-cosine candidate pairs must surface in the graph")
  }

  test("s16: community assignment is total, merging, deterministic, and " +
      "sizes are consistent") {
    val s = spark
    import s.implicits._
    val rows = Similarity.s16(spark, sf).collect()
    val nodes = Similarity.s11(spark, sf)
      .select($"vec_id").distinct().count()
    // every graph node gets exactly one community
    assert(rows.length.toLong == nodes)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    // community_size is the actual member count of that community
    val byComm = rows.groupBy(_.getAs[Long]("community"))
    rows.foreach { r =>
      assert(r.getAs[Long]("community_size") ==
        byComm(r.getAs[Long]("community")).length.toLong)
    }
    // three voting rounds on a knn graph must merge SOMETHING
    assert(byComm.size < rows.length,
      "label propagation produced only singleton communities")
    // deterministic: the fixed-round total-tie-break form reproduces
    val again = Similarity.s16(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("s16m equals s16 row-for-row (materialized edges change cost, not results)") {
    val a = Similarity.s16(spark, sf).collect().toSeq
    val b = Similarity.s16m(spark, sf).collect().toSeq
    assert(a == b, "materialized label propagation diverged from the fresh-build form")
  }
}
