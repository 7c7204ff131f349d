package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational8

/** Semantic properties of the eighth tranche (the DuckDB hash oracle
  * covers value equality; these assert the claims the operators make
  * about themselves). */
class Relational8Spec extends SparkSpec {

  test("e06 funnel stages are monotone and latencies positive") {
    val rows = Relational8.e06(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.get(2))).toMap
    val n1 = rows("1_view")._1
    val n2 = rows("2_click")._1
    val n3 = rows("3_purchase")._1
    assert(n1 >= n2 && n2 >= n3, s"funnel must narrow: $n1 >= $n2 >= $n3")
    assert(n3 > 0, "sf data should have full-funnel users")
    // stage-to-stage latency is strictly-after by construction
    Seq("2_click", "3_purchase").foreach { st =>
      assert(rows(st)._2.asInstanceOf[Double] > 0, s"$st latency must be > 0")
    }
  }

  test("e07 retention: offset-0 row equals cohort size, counts never exceed it") {
    val s = spark
    import s.implicits._
    val ret = Relational8.e07(s, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohorts = Tables.load(s, sf, "events")
      .groupBy($"user_id").agg(date_trunc("day", min($"ts")).as("c"))
      .groupBy($"c").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(cohorts.nonEmpty)
    cohorts.foreach { case (day, size) =>
      assert(ret((day, 0L)) == size,
        s"cohort $day: every member is active on its own day 0")
    }
    ret.foreach { case ((day, off), n) =>
      assert(n <= cohorts(day), s"cohort $day offset $off: $n exceeds cohort")
    }
  }

  test("t23 mixture: q sums to ~1 and boost falls as source share rises") {
    val rows = Relational8.t23(spark, sf).collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4))) // p, q, boost
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "q must normalize")
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-4, "p must normalize")
    // alpha = 0.5 upsamples small sources: boost ~ p^-0.5 is
    // monotone decreasing in p
    val byP = rows.sortBy(_._1)
    byP.sliding(2).foreach { case Array((p1, _, b1), (p2, _, b2)) =>
      if (p1 < p2) assert(b1 >= b2, s"boost must fall with share: $p1/$b1 vs $p2/$b2")
    }
  }

  test("t24 novelty is a valid per-doc fraction over incoming docs only") {
    val rows = Relational8.t24(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 2 == 1, "only incoming (odd) docs are scored")
      val (n, novel, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel >= 0 && novel <= n)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("t25 lexical diversity: hapax <= types <= tokens, ratios in (0,1]") {
    val rows = Relational8.t25(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, types, hapax) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hapax <= types && types <= tok)
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1.0)
    }
  }

  test("d13 reported chunks are genuinely cross-document") {
    val s = spark
    import s.implicits._
    val rows = Relational8.d13(s, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "sf0.01 has planted duplicate chunks")
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, "n_docs > 1 by the HAVING clause")
      assert(r.getLong(2) >= r.getLong(1), "occurrences >= documents")
    }
  }

  test("q52 deciles partition the corpus with contiguous length ranges") {
    val s = spark
    import s.implicits._
    val rows = Relational8.q52(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val total = Tables.load(s, sf, "documents").count()
    assert(rows.map(_._2).sum == total, "deciles cover every document")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "ntile balance")
    rows.sliding(2).foreach { case Array((_, _, _, hi), (_, _, lo, _)) =>
      assert(hi <= lo, "decile length ranges must be ordered")
    }
  }

  test("x05 KMV estimate lands near exact and is exact below k") {
    val rows = Relational8.x05(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nH, est, exact) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      if (nH < 64) assert(est == nH.toDouble,
        s"below k the sketch IS the distinct set: $est vs $nH")
      // KMV with k=64 has relative std error ~1/sqrt(k-2) ~ 0.127;
      // 4 sigma covers any fixed dataset we ship
      assert(math.abs(est - exact) <= math.max(4 * 0.127 * exact, 1.0),
        s"estimate $est too far from exact $exact")
    }
  }

  test("x07 KMV set-op estimates stay inside the sketch error envelope") {
    val rows = Relational8.x07(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the query emits exact integers (ADVICE r10: no rounded-double
      // gates); the consumer-side estimate derivation lives here
      val nU = r.getAs[Long]("n_u")
      val shared = r.getAs[Long]("shared")
      val jPpm = r.getAs[Long]("j_ppm")
      val kthU = r.getAs[Long]("kth_u")
      val exact = r.getAs[Long]("exact_intersect")
      val j = shared.toDouble / nU
      assert(jPpm == shared * 1000000L / nU, "j_ppm is the floor-div fixed point")
      assert(j >= 0.0 && j <= 1.0, s"Jaccard estimate out of range: $j")
      val uest = if (nU < 64) nU.toDouble else 63.0 * 1152921504606846976.0 / kthU
      val est = j * uest
      assert(est >= 0.0)
      // |A∩B| = J·|A∪B| compounds the two KMV errors; 4σ at
      // σ≈1/sqrt(k-2)≈0.127 per factor bounds any fixed dataset,
      // plus slack for tiny exact counts
      assert(math.abs(est - exact) <= math.max(4 * 2 * 0.127 * exact, 8.0),
        s"intersection estimate $est too far from exact $exact")
    }
  }

  test("t26 effective tokens never exceed raw tokens, retention in (0,1]") {
    val rows = Relational8.t26(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, eff, ret) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(eff > 0 && eff <= n + 0.01, s"weights are <= 1: $eff vs $n")
      assert(ret > 0 && ret <= 1.0001)
    }
    // corpus-wide: effective mass strictly below raw iff near-dups exist
    val drop = rows.map(r => r.getLong(1) - r.getDouble(2)).sum
    assert(drop >= 0)
  }

  test("t27 zipf fit: slope negative, reconstructs the top-rank frequency scale") {
    val rows = Relational8.t27(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, slope, icept) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 1)
      // ranks are ordered by frequency desc, so the regression line
      // must fall; the intercept is ln(freq) at rank 1, which is
      // positive whenever the top token occurs more than once
      assert(slope < 0, s"rank-frequency slope must be negative: $slope")
      assert(icept > 0, s"ln-scale intercept must be positive: $icept")
    }
  }

  test("t28 bigram NLL: non-negative, bigram mass equals per-doc n_tok - 1") {
    val s = spark
    import s.implicits._
    val rows = Relational8.t28(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) >= 0, s"ctx-normalized NLL is >= 0: ${r.getDouble(2)}")
    }
    val mass = rows.map(_.getLong(1)).sum
    val expected = Tables.load(s, sf, "documents")
      .select(greatest(size(graft.functions.NativeKernels.word_tokens($"text"))
        .cast("long") - 1, lit(0L)).as("m"))
      .agg(sum($"m")).head().getLong(0)
    assert(mass == expected, s"bigram mass $mass != $expected")
  }

  test("a03 forward as-of: attributed view is the earliest at-or-after the purchase") {
    val s = spark
    import s.implicits._
    val got = graft.operators.AsOfJoin.a03(s, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    // brute-force truth on the collected event set
    val ev = Tables.load(s, sf, "events")
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("em"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = ev.filter(_._3 == "view").groupBy(_._2)
    ev.filter(_._3 == "purchase").foreach { case (pid, uid, _, pem) =>
      val next = views.getOrElse(uid, Array.empty[(Long, Long, String, Long)])
        .filter(_._4 >= pem).sortBy(_._4).headOption
      val expected = next.map(v => (v._1, (v._4 - pem) / 1000000L))
      assert(got(pid) == expected, s"purchase $pid: ${got(pid)} vs $expected")
    }
  }

  test("s08 update+reassign does not increase total inertia (Lloyd step)") {
    val s = spark
    import s.implicits._
    // inertia under the seed assignment (s08's phase 0), recomputed
    // here against the same seeds
    val e = Tables.load(s, sf, "embeddings").select($"vec_id", $"embedding")
    val seeds = e.filter($"vec_id" < 8)
      .select($"vec_id".as("cluster"), $"embedding".as("cvec"))
    val sq = aggregate(zip_with($"embedding", $"cvec",
      (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, d) => acc + d)
    val before = e.crossJoin(broadcast(seeds))
      .select($"vec_id", sq.as("dist"))
      .groupBy($"vec_id").agg(min($"dist").as("d"))
      .agg(sum($"d")).head().getDouble(0)
    val after = Relational8.s08(s, sf).agg(sum($"dist")).head().getDouble(0)
    // quantized means can miss the true mean by <=5e-5 per dim, so
    // allow a hair above the exact-arithmetic bound
    assert(after <= before * 1.001,
      s"Lloyd step must not increase inertia: $before -> $after")
  }

  test("asOf tieBreak: duplicate-(key, time) left rows pick deterministically") {
    val s = spark
    import s.implicits._
    // two views at the SAME (user, ts): backward must pick max v_id,
    // forward min v_id — regardless of input order (ADVICE r7)
    val views = Seq((1L, 100L, 7L), (1L, 100L, 3L), (1L, 100L, 5L))
      .toDF("user_id", "v_ts", "v_id").repartition(3)
    val purchases = Seq((10L, 1L, 150L), (11L, 1L, 50L))
      .toDF("event_id", "user_id", "ts")
    val back = graft.operators.AsOfJoin.asOf(views, purchases,
        key = "user_id", leftTime = "v_ts", rightTime = "ts",
        carry = Seq("v_id"), tieBreak = Seq("v_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(back == Map(10L -> 7L, 11L -> -1L), s"backward: $back")
    val fwd = graft.operators.AsOfJoin.asOf(views, purchases,
        key = "user_id", leftTime = "v_ts", rightTime = "ts",
        carry = Seq("v_id"), forward = true, tieBreak = Seq("v_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(fwd == Map(10L -> -1L, 11L -> 3L), s"forward: $fwd")
  }

  test("events generator emits unique (user_id, event_type, ts) — DuckDB ASOF oracle cannot flap") {
    val s = spark
    import s.implicits._
    // The a01/a02/a03 DuckDB oracles use native ASOF JOIN, which is
    // tie-arbitrary; the Spark side now tie-breaks on v_id. The two
    // agree unconditionally only because view timestamps are unique
    // per user — pin that property of the test generator here.
    val dups = Tables.load(s, sf, "events")
      .groupBy($"user_id", $"event_type", $"ts").count()
      .filter($"count" > 1).count()
    assert(dups == 0L, s"$dups duplicate (user_id, event_type, ts) rows")
  }
}
