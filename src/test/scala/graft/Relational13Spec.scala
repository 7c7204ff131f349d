package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational13
import org.scalatest.funsuite.AnyFunSuite

/** Thirteenth tranche: incremental rollup maintenance, bottom-k sample
  * quantiles, PQ/ADC two-stage ANN. The DuckDB oracle pins
  * cross-engine equality; these specs pin the SEMANTICS — the merge
  * algebra, the sample-vs-exact error envelope, and the measured
  * ADC recall a consumer relies on. */
class Relational13Spec extends SparkSpec {

  test("q57: state ⊕ delta merge is bit-identical to the full recompute") {
    val s = spark
    import s.implicits._
    val merged = Relational13.q57(spark, sf)
    val li = Tables.load(spark, sf, "lineitem").select($"l_suppkey",
      round($"l_quantity").cast("long").as("qty"),
      round($"l_extendedprice" * 100).cast("long").as("cents"))
    val direct = li.groupBy($"l_suppkey").agg(
      count(lit(1)).as("n"), sum($"qty").as("sum_qty"),
      sum($"cents").as("sum_cents"),
      min($"cents").as("min_cents"), max($"cents").as("max_cents"))
    assert(merged.count() > 0)
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty,
      "incremental merge differs from full recompute")
  }

  test("x08: sample size, monotone quantiles, and the rank-error envelope") {
    val s = spark
    import s.implicits._
    val rows = Relational13.x08(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sf, "events")
      .groupBy($"event_type").agg(collect_list($"value").as("vs"))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getSeq[Double](r.fieldIndex("vs"))).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val nTotal = r.getAs[Long]("n_total")
      assert(r.getAs[Long]("n_sample") == math.min(128L, nTotal))
      val (p50, p90, p99) = (r.getAs[Double]("p50_est"),
        r.getAs[Double]("p90_est"), r.getAs[Double]("p99_est"))
      assert(p50 <= p90 && p90 <= p99, s"non-monotone estimates for $et")
      // rank error: the estimated quantile's true rank stays within the
      // √(q(1−q)/k) envelope (k=128 → σ ≈ 4.4pp at p50); 4σ bars
      val vs = ev(et)
      def trueRank(v: Double): Double = vs.count(_ <= v).toDouble / vs.size
      assert(math.abs(trueRank(p50) - 0.5) < 0.18, s"p50 rank error for $et")
      assert(math.abs(trueRank(p90) - 0.9) < 0.12, s"p90 rank error for $et")
      assert(math.abs(trueRank(p99) - 0.99) < 0.05, s"p99 rank error for $et")
      // exact riders really are the order statistics
      assert(math.abs(trueRank(r.getAs[Double]("p50_exact")) - 0.5) <
        1.5 / vs.size + 0.005)
    }
  }

  test("s13: contiguous ranks, exact-distance ordering, measured recall") {
    val s = spark
    import s.implicits._
    val rows = Relational13.s13(spark, sf).collect()
    assert(rows.length == 30) // 3 queries × top-10
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
      // final order is by EXACT distance (the rerank contract)
      val ds = sorted.map(_.getAs[Long]("exact_d2_micro"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        s"exact-distance inversion for query $q")
      // every candidate came from the ADC pool
      assert(rs.forall(_.getAs[Long]("adc_rank") <= 50))
    }
    // recall@10 vs the exact brute-force top-10 (offline ground truth,
    // 500 × 3 distance pairs at sf0.001 — dev-time diagnostic scale).
    // Seed codebooks on this near-isotropic corpus measured 0.5-0.7
    // per query; pinned floor 0.4 per query keeps the bar honest.
    val e = Tables.load(spark, sf, "embeddings").select($"vec_id", $"embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    val recalls = byQ.map { case (q, rs) =>
      val qe = e(q)
      val exactTop = e.keys.filter(_ != q).toSeq
        .map { id =>
          val v = e(id)
          var d = 0.0
          var i = 0
          while (i < qe.length) {
            val t = qe(i).toDouble - v(i).toDouble; d += t * t; i += 1
          }
          (d, id)
        }.sorted.take(10).map(_._2).toSet
      val got = rs.map(_.getAs[Long]("neighbor_id")).toSet
      q -> got.intersect(exactTop).size / 10.0
    }
    recalls.foreach { case (q, r) =>
      assert(r >= 0.4, s"recall@10 for query $q = $r below measured floor")
    }
    assert(recalls.values.sum / recalls.size >= 0.5,
      s"mean recall ${recalls.values.sum / recalls.size} below measured floor")
  }

  test("s14: probe discipline, exact-distance ordering, measured recall") {
    val s = spark
    import s.implicits._
    val rows = Relational13.s14(spark, sf).collect()
    assert(rows.length == 30) // 3 queries × top-10
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
      val ds = sorted.map(_.getAs[Long]("exact_d2_micro"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        s"exact-distance inversion for query $q")
      // the probe cut really cut: results come from ≤ IVF_PROBE cells
      assert(rs.map(_.getAs[Int]("cell")).distinct.size <= 8,
        s"more cells than probed for query $q")
    }
    // recall@10 vs brute force — r16: trained 32-cell coarse
    // quantizer + trained PQ codebook + 50-pool at an 8/32 = 25%
    // probe share (was 0.3-0.4/query on the 4/10 label-mean router;
    // now 0.6667 mean at sf0.01 AND sf0.1 — the r15 verdict-#2 bar).
    // The isotropic-corpus caveat still applies to the ceiling: the
    // full-scan trained-PQ pool itself measures 0.6667 (SCALING.md),
    // so the probe cut now costs almost nothing.
    val e = Tables.load(spark, sf, "embeddings").select($"vec_id", $"embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    val recalls = byQ.map { case (q, rs) =>
      val qe = e(q)
      val exactTop = e.keys.filter(_ != q).toSeq
        .map { id =>
          val v = e(id)
          var d = 0.0
          var i = 0
          while (i < qe.length) {
            val t = qe(i).toDouble - v(i).toDouble; d += t * t; i += 1
          }
          (d, id)
        }.sorted.take(10).map(_._2).toSet
      q -> rs.map(_.getAs[Long]("neighbor_id")).toSet.intersect(exactTop).size / 10.0
    }
    recalls.foreach { case (q, r) =>
      assert(r >= 0.5, s"recall@10 for query $q = $r below measured floor")
    }
    assert(recalls.values.sum / recalls.size >= 0.6,
      s"mean recall ${recalls.values.sum / recalls.size} below measured floor")
  }

  test("e11: contiguous ranks, non-increasing counts, all windows served") {
    val s = spark
    import s.implicits._
    val rows = Relational13.e11(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDay = rows.groupBy(_.getAs[java.sql.Timestamp]("day"))
    // every day in the data is served
    val nDays = Tables.load(spark, sf, "events")
      .select(date_trunc("day", $"ts")).distinct().count()
    assert(byDay.size == nDays)
    byDay.foreach { case (day, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to rs.length),
        s"ranks not contiguous for $day")
      assert(rs.length <= 3)
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        s"count inversion for $day")
      assert(ns.forall(_ > 0))
    }
  }

  test("s13: plan stays broadcast — no cartesian product, no shuffled join") {
    val plan = Relational13.s13(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "unexpected nested-loop join")
  }

  test("s13t: integer-Lloyd training reduces quantization SSE and does " +
      "not hurt pool recall vs the seed codebook") {
    val s2 = spark
    import s2.implicits._
    val e = Tables.load(spark, sf, "embeddings").select($"vec_id", $"embedding")
    val sub = graft.operators.Relational13.pqSubQ(e).localCheckpoint()
    val cb0 = sub.filter($"vec_id" < 8)
      .select($"m", $"vec_id".cast("int").as("code"), $"sq".as("cq"))
    val cbT = graft.operators.Relational13.pqTrainCodebook(sub)
    def sse(cb: org.apache.spark.sql.DataFrame): Double =
      sub.join(broadcast(cb), Seq("m"))
        .select($"vec_id", $"m",
          graft.operators.Relational13.isqdL($"sq", $"cq").as("d"))
        .groupBy($"vec_id", $"m").agg(min($"d").as("d"))
        .agg(sum($"d".cast("double"))).collect()(0).getDouble(0)
    val (s0, sT) = (sse(cb0), sse(cbT))
    assert(sT <= s0, s"training must not increase quantization SSE: $s0 -> $sT")
    assert(sT < s0, s"two Lloyd rounds should strictly reduce SSE here: $s0 -> $sT")
    // recall@10 of the trained variant is at least the seed variant's
    // (measured 0.6667 vs 0.6333 at sf0.001, tie 0.6333 at sf0.01 --
    // the honest near-isotropic-corpus lift; RecallReport publishes it)
    val embs = graft.operators.Similarity.embVectors(spark, sf)
    def exactTop10(q: Long): Set[Long] = {
      val qe = embs(q)
      embs.keysIterator.filter(_ != q).map { id =>
        val v = embs(id)
        var d = 0.0; var i = 0
        while (i < qe.length) { val t = qe(i).toDouble - v(i).toDouble; d += t * t; i += 1 }
        (d, id)
      }.toSeq.sorted.take(10).map(_._2).toSet
    }
    def recall10(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = got.map { case (q, ids) => ids.intersect(exactTop10(q)).size / 10.0 }
      rs.sum / rs.size
    }
    val seed = recall10(graft.operators.Relational13.s13(spark, sf))
    val trained = recall10(graft.operators.Relational13.s13t(spark, sf))
    assert(trained >= seed,
      s"trained codebooks must not lose recall: seed=$seed trained=$trained")
    graft.functions.CheckpointOps.freeLocalCheckpoint(sub)
  }

  private def keyRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("q_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("s26d: the fr predicate takes the IN-CELL branch and equals s26i") {
    val d = Relational13.s26d(spark, sf).collect()
    assert(d.nonEmpty)
    assert(d.forall(_.getAs[String]("path") == "incell"),
      "fr (~16% selectivity) must dispatch in-cell")
    assert(d.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      keyRows(Relational13.s26i(spark, sf)),
      "dispatched in-cell rows differ from the standalone s26i body")
  }

  test("s26dr: the rare predicate takes the PREFILTER branch and equals " +
      "the exact pre-filter scan") {
    val r = Relational13.s26dr(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[String]("path") == "prefilter"),
      "short-German (<5% selectivity) must dispatch prefilter")
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet ==
      keyRows(graft.operators.Similarity.s26For(spark, sf,
        graft.operators.Similarity.RARE_PRED)),
      "dispatched prefilter rows differ from the standalone s26 body")
  }

  test("filtered ANN under an EMPTY qualifying set: empty top-k, not an " +
      "error; adaptiveProbe's zero-guard stays the internal contract") {
    val s2 = spark
    import s2.implicits._
    val none = col("lang") === "zz" // no such language at any SF
    assert(Relational13.s26iOver(
      Relational13.materializedIvfIndex(spark, sf), spark, sf, none)
      .count() == 0L, "empty qualifying set must serve an empty top-k")
    assert(Relational13.s26dFor(spark, sf, none).count() == 0L,
      "the dispatcher must serve an empty top-k on an empty subset")
    intercept[IllegalArgumentException] {
      Relational13.adaptiveProbe(32L, 100L, 0L)
    }
  }

  test("s14m/s26im: frozen-index serving is bit-identical to the " +
      "fresh-build faces") {
    assert(keyRows(Relational13.s14m(spark, sf)) ==
      keyRows(Relational13.s14(spark, sf)),
      "materialized s14m differs from fresh s14")
    assert(keyRows(Relational13.s26im(spark, sf)) ==
      keyRows(Relational13.s26i(spark, sf)),
      "materialized s26im differs from fresh s26i")
  }
}
