package graft

import graft.operators.{Dedup, Relational3, Skew}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("x01 approx distinct is within 5% of exact (and the query says so)") {
    val s = spark
    import s.implicits._
    // the raw estimate, recomputed here since x01's hashed output
    // carries only the in-bound flag
    Tables.load(s, sf, "lineitem").groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx"),
        countDistinct($"l_orderkey").as("exact")).collect().foreach { r =>
        val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
        assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
      }
    val rows = Relational3.x01(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("approx_ok") == 1L))
  }

  test("x03 approx quantiles land inside their rank-error bounds") {
    val rows = Relational3.x03(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_ok") == 1L && r.getAs[Long]("p90_ok") == 1L,
        s"GK estimate broke its 5e-4 rank bound: $r")
      assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p90_exact"))
    }
  }

  test("maxBucket skew cap only removes pairs, never invents them") {
    import graft.operators.Dedup
    val full = Dedup.d02(spark, sf).select("a_id", "b_id")
    val capped = Dedup.d02(spark, sf, maxBucket = Some(3)).select("a_id", "b_id")
    assert(capped.except(full).isEmpty,
      "capped candidate pairs must be a subset of uncapped")
    val fullLsh = Dedup.d03(spark, sf).select("a_id", "b_id")
    val cappedLsh = Dedup.d03(spark, sf, maxBucket = Some(3)).select("a_id", "b_id")
    assert(cappedLsh.except(fullLsh).isEmpty)
  }

  test("recall report: the numbers SCALING.md publishes are what the code measures") {
    // Deterministic given the sf0.01 data — every divergence from the
    // published table is a real behavior change, not noise. Keep in
    // lockstep with SCALING.md "Recall report" (regenerate both with
    // `runMain graft.operators.RecallReport`).
    val m = graft.operators.RecallReport.compute(spark, "/root/testdata/sf0.01")
    val published = Map(
      "d02_recall_cap16" -> 1.0, "d02_recall_cap64" -> 1.0,
      "d03_recall_cap16" -> 1.0, "d03_recall_cap64" -> 1.0,
      "d11_recall_cap16" -> 1.0, "d11_recall_cap64" -> 1.0,
      "d12_recall_cap16" -> 1.0, "d12_recall_cap64" -> 1.0,
      "m05_recall_cap16" -> 1.0, "m05_recall_cap64" -> 1.0,
      "m06_recall_cap16" -> 1.0, "m06_recall_cap64" -> 1.0,
      "q51_answered_fraction" -> 0.048, "q51_match_rate" -> 1.0,
      "q51_answered" -> 12.0,
      "s03_recall_cos0.40" -> 0.6780, "s03_truth_cos0.40" -> 59.0,
      "s03_recall_cos0.45" -> 0.7857, "s03_truth_cos0.45" -> 14.0,
      "s03_recall_cos0.50" -> 1.0, "s03_truth_cos0.50" -> 1.0,
      "s03_candidate_fraction" -> 0.2371,
      "s13_recall_at10" -> 0.6333, "s13t_recall_at10" -> 0.6333,
      // s14 (r16): trained 32-cell coarse quantizer (integer Lloyd,
      // seeded from the first 32 vectors) + the s13t trained PQ
      // codebook + 50-pool, probing 8/32 = 25% — up from 0.5 at the
      // old 4/10 label-mean router, and 0.6667 at sf0.1's harder
      // corpus (was 0.3333, the r15 verdict-#2 gap)
      "s14_recall_at10" -> 0.6667,
      // filtered IVF (r15, r16 adaptive nProbe): the probe cut
      // widens with predicate selectivity (min(nCells,
      // ceil(IVF_PROBE/sel)) — all 32 cells at this corpus' ~16%),
      // so in-cell recall ≈ the trained-PQ ceiling instead of the
      // thin-cell 0.6/0.4667 of the static cut
      "s26i_recall_at10" -> 0.9667, "s26i_answered" -> 30.0,
      // graph-walk serving quality at sf0.01 (r16): symmetrized
      // serving edges (kNN digraph -> undirected NSW view), seed
      // expansion through in-edges, corpus-adaptive walk depth
      // (walkHops) and the ef=64 beam operating point — see the
      // BEAM_B comment for the measured miss anatomy that sized it
      "s20_hit_at1" -> 0.9, "s20_found_in_top5" -> 1.0,
      "s20b_hit_at1" -> 1.0, "s20b_rank1_in_top5" -> 1.0,
      "s20b_nn_in_beam" -> 1.0,
      // the 2-layer hierarchy (s20h) stays the best face at BOTH SFs
      // (sf0.1: 0.9875 vs flat-beam 0.9125, from r15's 0.7125)
      "s20h_hit_at1" -> 1.0, "s20h_rank1_in_top5" -> 1.0,
      "s20h_nn_in_beam" -> 1.0)
    assert(m == published,
      s"recall drifted from the published table:\n measured=$m\n published=$published")
  }

  test("s05 int8-quantized top-k recalls the exact top-k") {
    import graft.operators.Similarity
    val exact = Similarity.s01(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val quant = Similarity.s05(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"8-bit quantization should barely move top-5: $recall")
  }

  test("w04 sort-based sessionization equals w03 session windows") {
    import graft.operators.EventWindows
    val a = EventWindows.w03(spark, sf)
    val b = EventWindows.w04(spark, sf)
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "state-store and sort formulations must agree")
  }

  test("salted join returns exactly the unsalted join's rows") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey")).collect()
      .map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(li, o, "l_orderkey", factor = 7)
      .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted two-phase sum equals direct sum") {
    val li = Tables.load(spark, sf, "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity", 16)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(direct.keySet == salted.keySet)
    direct.keySet.foreach { k =>
      assert(math.abs(direct(k)._1 - salted(k)._1) < 1e-6)
      assert(direct(k)._2 == salted(k)._2)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      Tables.load(spark, sf, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$wh/li_b")
        .saveAsTable("li_bucketed")
      Tables.load(spark, sf, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$wh/o_b")
        .saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("adversarial stop-shingle skew: capped bucket build stays exact on planted pairs") {
    val s = spark
    import s.implicits._
    // 20k docs, EVERY one sharing a 12-token stop prefix -> 10
    // shingles with df = 20,000. Uncapped, each hot bucket would
    // pair-expand to 2e8 candidates (x10 buckets = 2e9) — the
    // 100 TB failure mode. 400 planted twin pairs share a unique
    // 40-token body, so their candidates ride df=2 buckets that
    // survive any cap.
    val V = 20000
    val P = 400
    val body = (0 until 40).map(k =>
      concat(lit(s" w${k}x"), $"body_id".cast("string")))
    val docsDf = s.range(V).select($"id".as("doc_id"))
      .withColumn("body_id",
        when($"doc_id" >= V - P, $"doc_id" - (V - P)).otherwise($"doc_id"))
      .withColumn("text", concat(
        lit("the quick brown fox jumps over the lazy dog again and again") +:
          body :+
          when($"doc_id" >= V - P, lit(" tail variant token"))
            .otherwise(lit(" tail normal token")): _*))
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("skew").as("source"),
        octet_length($"text").cast("long").as("n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("skew-corpus")
    docsDf.write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    val got = Dedup.d02(s, tmp.toString, maxBucket = Some(64)).collect()
    val planted = (0 until P).map(i => (i.toLong, (V - P + i).toLong)).toSet
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall 1.0 under the cap, zero false candidates, and the
    // SURVIVING-shingle jaccard understates the true 51/55 = 0.9273
    // by exactly the dropped hot-shingle mass: 41/65 = 0.6308 —
    // the measured skew-cap cost SCALING.md publishes
    assert(gotPairs == planted,
      s"capped d02 must find exactly the planted pairs: " +
        s"${gotPairs.size} found, ${(planted -- gotPairs).size} missed, " +
        s"${(gotPairs -- planted).size} spurious")
    got.foreach(r => assert(r.getDouble(2) == 0.6308,
      s"capped jaccard must be the predicted 41/65: $r"))
  }

  test("m05 adversarial uniform-hash corpus: bucket sizes are data-sized, " +
      "not structural, and the cap keeps planted recall") {
    val s = spark
    import s.implicits._
    import graft.operators.Multimodal
    // 8192 base docs with uniform 60-bit hashes (xxhash64 — the
    // WORST case for banding: no cluster structure to exploit) plus
    // 200 planted twins at hamming exactly 13 (mask 0x1111111111111:
    // 13 set bits, 3/3/3/3/1 across the five 12-bit bands — the
    // clean-≤2-bit band is band 4 at distance 1). The r11 design
    // (4-bit keys) put n/16 = 512+ docs in EVERY bucket here by
    // construction; the 12-bit multi-probe keys should land near the
    // uniform expectation 13n/4096 ≈ 26.
    val N = 8192
    val P = 200
    val mask60 = (1L << 60) - 1
    val h = s.range(N + P).select($"id".as("doc_id"),
      expr(s"""CASE WHEN id < $N THEN xxhash64(id) & ${mask60}L
        ELSE (xxhash64(id - $N) & ${mask60}L) ^ ${0x1111111111111L}L
        END""").as("ahash"))
    val sizes = Multimodal.aHashProbeBuckets(h)
      .select(size($"members").as("n")).collect().map(_.getInt(0))
    val maxB = sizes.max
    val meanB = sizes.sum.toDouble / sizes.length
    assert(maxB < (N + P) / 16,
      s"max bucket $maxB must beat the old 4-bit structural floor " +
        s"${(N + P) / 16}")
    assert(maxB <= 128 && meanB <= 40,
      s"uniform-hash buckets should track 13n/4096 ≈ 26: " +
        s"max=$maxB mean=$meanB")
    // capped run: every planted twin must survive (their clean-band
    // buckets are expectation-sized, nothing near the cap)
    val planted = (0 until P).map(i => (i.toLong, (N + i).toLong)).toSet
    val got = Multimodal.aHashCandidatePairs(h, maxBucket = Some(128))
      .select($"a_id", $"b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = planted -- got
    assert(missed.isEmpty,
      s"cap 128 lost ${missed.size}/${planted.size} planted twins")
    // containment: the cap only removes pairs, never invents them
    val uncapped = Multimodal.aHashCandidatePairs(h, None)
      .select($"a_id", $"b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(uncapped))
  }

  test("t38 stop-term: bounded top-k equals the window form when df = corpus size") {
    val s = spark
    import s.implicits._
    // 20k docs, EVERY one containing the query term "the" (df = V —
    // the stop-term case whose rank-window partition would be
    // corpus-sized). Varying lengths and tfs so the top-5 is
    // non-trivial; doc_id < 3 are the query docs per t38's contract.
    val V = 20000
    val filler = (0 until 10).map(k =>
      concat(lit(s" f${k}u"), ($"doc_id" % 97).cast("string")))
    val theReps = concat_ws(" ",
      array_repeat(lit("the"), ($"doc_id" % 7 + 1).cast("int")))
    val docsDf = s.range(V).select($"id".as("doc_id"))
      .withColumn("text", concat(theReps +: filler: _*))
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("skew").as("source"),
        octet_length($"text").cast("long").as("n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("t38-skew")
    docsDf.write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    val got = graft.operators.Relational12.t38(s, tmp.toString)
      .collect().map(r => (r.getString(0), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_ppm"))).toMap
    assert(got.nonEmpty)
    // independent window-form recomputation of the same contract
    import graft.functions.NativeKernels.word_tokens
    import org.apache.spark.sql.expressions.Window
    val tf = docsDf.select($"doc_id", explode(word_tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val tot = dl.agg(sum($"dl").as("tl"), count(lit(1)).as("n_docs"))
    val qterms = docsDf.filter($"doc_id" < 3)
      .select(explode(word_tokens($"text")).as("term")).distinct()
    val w = Window.partitionBy($"term").orderBy($"score_ppm".desc, $"doc_id")
    val want = tf.join(qterms, Seq("term")).join(dl, Seq("doc_id"))
      .crossJoin(tot)
      .select($"term", $"doc_id", $"tf", $"dl",
        expr("(22 * tf * tl * 1000000) div (10 * tf * tl + 3 * tl + 9 * dl * n_docs)")
          .as("score_ppm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .collect().map(r => (r.getString(0), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_ppm"))).toMap
    assert(got == want,
      s"aggregator top-k diverged from window form: sizes ${got.size}/${want.size}")
    // the stop-term really was at full df and still ranked
    assert(got.contains(("the", 1L)))
  }

  test("AQE splits the skewed partitions of a vocab-style shuffled join") {
    val s = spark
    import s.implicits._
    // the t18/t24 shape: (doc, token) fact joined to a unique-keyed
    // vocab where one token is a stop-word — 70% of the fact rows
    // carry one key. Thresholds scaled to test size; the claim being
    // pinned is that Spark's skew-split actually engages on this
    // shape, so SCALING.md's "AQE skew split applies" is measured,
    // not asserted.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "67108864b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      val fact = s.range(400000).select(
        when($"id" % 10 < 7, 0L).otherwise($"id" % 4001).as("token_id"),
        ($"id" % 97).as("cnt"))
      val vocab = s.range(4001).select($"id".as("token_id"),
        ($"id" * 7).as("df"))
      // global (grouping-free) aggregate after the join: partial agg
      // has no distribution requirement, so AQE is free to split the
      // skewed join partitions (a groupBy on the join key would pin
      // the partitioning and veto the split — the documented
      // trade-off when the shuffle is reused downstream)
      val joined = fact.join(vocab, "token_id")
        .agg(sum($"cnt" + $"df").as("mass"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE skew split did not engage:\n${plan.take(3000)}")
    } finally restore.foreach { case (k, v) =>
      if (v.isEmpty) spark.conf.unset(k) else spark.conf.set(k, v)
    }
  }
}
