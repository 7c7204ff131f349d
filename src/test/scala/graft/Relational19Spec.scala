package graft

import org.apache.spark.sql.functions._

/** Tranche-19: q72 profiling, q73 audit, e15 pattern match, q74 join
  * IVM, s19 k-hop. The gate hash-checks all five against DuckDB;
  * these tests replay the semantics brute-force in process and pin
  * the structural claims (one-scan profiling, the delta algebra
  * against an in-engine recompute, BFS min-hop correctness). */
class Relational19Spec extends SparkSpec {

  import spark.implicits._

  test("q72: brute-force profile replay on collected orders") {
    val rows = Tables.load(spark, sf, "orders").select(
        $"o_orderkey", $"o_custkey", $"o_orderstatus",
        round($"o_totalprice" * 100).cast("long").as("o_totalprice_c"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate_d"),
        $"o_orderpriority")
      .collect()
    def prof[T](vals: Seq[T])(implicit ord: Ordering[T]) =
      (vals.count(_ == null).toLong,
        vals.filter(_ != null).distinct.size.toLong,
        vals.filter(_ != null).min.toString,
        vals.filter(_ != null).max.toString)
    val want = Map(
      "o_orderkey" -> prof(rows.map(_.getLong(0))),
      "o_custkey" -> prof(rows.map(_.getLong(1))),
      "o_orderstatus" -> prof(rows.map(_.getString(2))),
      "o_totalprice_c" -> prof(rows.map(_.getLong(3))),
      "o_orderdate_d" -> prof(rows.map(_.getString(4))),
      "o_orderpriority" -> prof(rows.map(_.getString(5))))
    val got = operators.Relational19.q72(spark, sf).collect().map { r =>
      assert(r.getLong(1) == rows.length.toLong) // n_rows on every row
      r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
    }.toMap
    assert(got == want)
  }

  test("q73: brute-force constraint replay") {
    val li = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_tax", $"l_discount")
      .collect()
    val o = Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice")
      .collect()
    val custKeys = Tables.load(spark, sf, "customer")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val orderKeys = o.map(_.getLong(0)).toSet
    val nl = li.length.toLong
    val no = o.length.toLong
    val want = Map(
      "lineitem_quantity_le_45" ->
        ((nl, li.count(_.getDouble(1) > 45).toLong)),
      "lineitem_tax_le_005" -> ((nl, li.count(_.getDouble(2) > 0.05).toLong)),
      "lineitem_discount_le_008" ->
        ((nl, li.count(_.getDouble(3) > 0.08).toLong)),
      "orders_status_in_F_O" ->
        ((no, o.count(r => !Set("F", "O")(r.getString(2))).toLong)),
      "orders_totalprice_not_null" -> ((no, o.count(_.isNullAt(3)).toLong)),
      "orders_orderkey_unique" -> ((no, no - orderKeys.size)),
      "lineitem_orderkey_fk_orders" ->
        ((nl, li.count(r => !orderKeys(r.getLong(0))).toLong)),
      "orders_custkey_fk_customer" ->
        ((no, o.count(r => !custKeys(r.getLong(1))).toLong)))
    val got = operators.Relational19.q73(spark, sf).collect().map { r =>
      assert(r.getBoolean(3) == (r.getLong(2) == 0L))
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))
    }.toMap
    assert(got == want)
    // the deliberately-tight rules must actually fire on this data —
    // a zero there means the counting path went untested
    assert(want("lineitem_quantity_le_45")._2 > 0)
    assert(want("orders_status_in_F_O")._2 > 0)
    assert(want("lineitem_orderkey_fk_orders")._2 == 0)
  }

  test("e15: java-regex brute force over per-(user, day) sequences") {
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", date_format($"ts", "yyyy-MM-dd").as("day"),
        unix_micros($"ts").as("tsus"), $"event_id", $"event_type")
      .collect()
    val code = Map("click" -> "c", "view" -> "v", "signup" -> "s",
      "purchase" -> "p").withDefaultValue("e")
    val seqs = ev.groupBy(r => (r.getLong(0), r.getString(1))).map {
      case (_, rs) =>
        rs.sortBy(r => (r.getLong(2), r.getLong(3)))
          .map(r => code(r.getString(4))).mkString
    }.toSeq
    val want = operators.Relational19.E15_PATTERNS.map {
      case (re, name) =>
        val p = java.util.regex.Pattern.compile(re)
        val counts = seqs.map(s => {
          val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
        })
        name -> ((counts.count(_ > 0).toLong, counts.sum))
    }.toMap
    val got = operators.Relational19.e15(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.values.exists(_._2 > 0), "at least one rule must fire")
  }

  test("e15: hot-group stress — one (user, day) with 20k events stays exact") {
    // adversarial grain: a single group holding a day-long burst. The
    // group state is one 20k-char string (the documented day-grain
    // bound); counting must match a direct java-regex pass.
    val n = 20000
    val types = Array("click", "view", "purchase", "error", "signup")
    val dir = java.nio.file.Files.createTempDirectory("graft-e15-hot")
    dir.toFile.deleteOnExit()
    val rows = (0 until n).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        // whole-milli fractions only: the brute-force sort key is
        // getTime*1000, which drops sub-milli precision
        s"2024-01-01 00:${"%02d".format((i / 600) % 60)}:${"%02d".format((i / 10) % 60)}.${"%06d".format((i % 1000) * 1000)}"),
        7L, types(i % types.length), 1.0, "{}")
    }
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Relational19.e15(spark, dir.toString).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute force: rebuild the one group's string in (ts, event_id) order
    val code = Map("click" -> "c", "view" -> "v", "signup" -> "s",
      "purchase" -> "p").withDefaultValue("e")
    val seq = rows.sortBy(r => (r._2.getTime * 1000, r._1))
      .map(r => code(r._4)).mkString
    val want = operators.Relational19.E15_PATTERNS.map { case (re, name) =>
      val c = streaming.PatternStream.countMatches(re, seq)
      name -> ((if (c > 0) 1L else 0L, c))
    }.toMap
    assert(got == want)
    assert(got.values.map(_._2).sum > 0)
  }

  test("q74: incremental result equals an in-engine full recompute") {
    val cents = round($"l_extendedprice" * (lit(1) - $"l_discount") *
      lit(100)).cast("long")
    val recompute = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "lineitem"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority", year($"o_orderdate").cast("long")
        .as("o_year"))
      .agg(sum(cents).as("revenue_cents"), count(lit(1)).as("n_items"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val got = operators.Relational19.q74(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == recompute)
    // both sides of the cutoff must contribute, or the delta legs
    // went unexercised
    assert(recompute.keys.exists(_._2 < 2000) &&
      recompute.keys.exists(_._2 >= 2000))
  }

  test("e16: brute-force RFM replay on collected purchases") {
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", unix_micros($"ts").as("tsus"), $"event_type",
        $"value").collect()
    val mx = ev.map(_.getLong(1)).max
    val rfm = ev.filter(_.getString(2) == "purchase")
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        (u, mx - rs.map(_.getLong(1)).max, rs.length.toLong,
          rs.map(r => math.round(r.getDouble(3) * 100)).sum)
      }.toSeq
    def ntile5[T](xs: Seq[(Long, T)])(implicit ord: Ordering[T])
        : Map[Long, Long] = {
      val sorted = xs.sortBy { case (u, v) => (v, u) }
      val n = sorted.size
      sorted.zipWithIndex.map { case ((u, _), i) =>
        // SQL ntile: first (n mod 5) buckets get the extra row
        val base = n / 5; val extra = n % 5
        val bucket =
          if (i < (base + 1) * extra) i / (base + 1)
          else extra + (i - (base + 1) * extra) / base
        u -> (bucket + 1L)
      }.toMap
    }
    val r = ntile5(rfm.map(x => x._1 -> x._2))
    val f = ntile5(rfm.map(x => x._1 -> (-x._3)))
    val m = ntile5(rfm.map(x => x._1 -> (-x._4)))
    val want = rfm.groupBy(x => r(x._1) * 100 + f(x._1) * 10 + m(x._1))
      .map { case (seg, xs) =>
        seg -> ((xs.size.toLong, xs.map(_._4).sum)) }
    val got = operators.Relational19.e16(spark, sf).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(got == want)
    // conservation: every purchasing user lands in exactly one segment
    assert(got.values.map(_._1).sum == rfm.size.toLong)
  }

  test("s19: brute-force BFS over the collected knn edge set") {
    val edges = operators.Similarity.s11(spark, sf)
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = edges.map(_._1).distinct
    var hops = nodes.filter(_ % 50 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val next = hops.toSeq.flatMap { case (id, h) =>
        adj.getOrElse(id, Array.empty[Long]).map(_ -> (h + 1))
      }
      hops = (hops.toSeq ++ next).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    val got = operators.Relational19.s19(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hops)
    assert(got.values.forall(h => h >= 0 && h <= 3))
    assert(got.filter(_._2 == 0L).keys.forall(_ % 50 == 0))
    // expansion actually happened: someone is strictly downstream
    assert(got.values.exists(_ > 0))
  }

  test("s20: brute-force greedy-walk replay; measured hit rate vs exact") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // serving adjacency is the UNDIRECTED view (r16): edges ∪ reverse
    val dirEdges = operators.Similarity.s11(spark, sf)
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (dirEdges ++ dirEdges.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    // the FIXED-size hash-sampled entry set (r13 verdict: the old
    // `≡ 7 mod 125` rule made entry count corpus-proportional): the
    // 16 ids first in (hash64("20:" + id), id) order — replayed here
    // with the same md5-derived 60-bit hash, independent of the engine
    def entH(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val entries = vecs.keys.toSeq
      .sortBy(id => (entH(s"20:$id"), id)).take(16)
    assert(entries.size == 16,
      "entry set must be the constant-size sample, never corpus-sized")
    val queries = vecs.keys.filter(_ % 25 == 0).toSeq.sorted
    val want = queries.map { q =>
      val walks = entries.filter(_ != q).map { entry =>
        var node = entry
        var cur = cos(vecs(q), vecs(entry))
        var moves = 0L
        for (_ <- 1 to operators.Similarity.walkHops(vecs.size)) {
          val cands = adj.getOrElse(node, Array.empty[Long])
            .filter(_ != q).map(d => (cos(vecs(q), vecs(d)), d))
          if (cands.nonEmpty) {
            val (bc, bn) = cands.maxBy { case (c, d) => (c, -d) }
            if (bc > cur) { node = bn; cur = bc; moves += 1 }
          }
        }
        (cur, node, moves)
      }
      // winning walk: (cos DESC, node ASC, moves DESC)
      val (_, node, moves) =
        walks.maxBy { case (c, n, m) => (c, -n, m) }
      (q, node, moves)
    }
    val got = operators.Similarity.s20m(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want, "greedy walk diverges from the replay")
    // the walk genuinely navigates: most queries move off the entry
    assert(got.count(_._3 > 0) >= got.length * 3 / 4)
    // MEASURED quality: beam-1 greedy over the k=8 diversity graph vs
    // the exact (self-excluded) nearest neighbor — a real recall
    // floor, not a vacuous one; the honest number for the base case
    // the docstring prescribes widening via beam-k
    val exactRank = queries.map { q =>
      q -> vecs.collect { case (id, v) if id != q => (cos(vecs(q), v), id) }
        .toSeq.sortBy { case (c, d) => (-c, d) }.map(_._2).zipWithIndex
        .toMap
    }.toMap
    val hit1 = got.count { case (q, f, _) => exactRank(q)(f) == 0 }
    val hit5 = got.count { case (q, f, _) => exactRank(q)(f) < 5 }
    val meanRank = got.map { case (q, f, _) => exactRank(q)(f) }.sum
      .toDouble / got.length
    info(f"s20 hit@1 $hit1/${got.length}, found-in-exact-top5 " +
      f"$hit5/${got.length}, mean exact-rank of found $meanRank%.1f")
    // measured floors for THIS graph (k=8 diversity-pruned + KNN_KEEP
    // reserved slots, UNDIRECTED serving view, adaptive hops — r16
    // measured hit@1 16/20, top-5 20/20 at sf0.001): floors pinned
    // below the measurement but far above the k=3 era's (0.3), so a
    // future change that silently degrades the graph fails here
    assert(hit5.toDouble / got.length >= 0.9,
      f"greedy top-5 quality collapsed: $hit5/${got.length}")
    assert(hit1.toDouble / got.length >= 0.7,
      f"greedy hit@1 collapsed: $hit1/${got.length}")
    assert(meanRank < vecs.size / 10.0,
      f"found nodes are no better than random: mean rank $meanRank%.1f")
  }

  test("s20b: brute-force beam replay; hit rate beats greedy's") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val dirEdges = operators.Similarity.s11(spark, sf)
      .select($"vec_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (dirEdges ++ dirEdges.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    def entH(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val entries = vecs.keys.toSeq
      .sortBy(id => (entH(s"20:$id"), id)).take(16)
    val queries = vecs.keys.filter(_ % 25 == 0).toSeq.sorted
    // the frontier replay: hop 0 = all entries scored; each hop pools
    // frontier ∪ out-neighbor expansions, dedupes by node, keeps the
    // top-BEAM_B by (cos DESC, node)
    val want = queries.flatMap { q =>
      var beam = entries.filter(_ != q)
        .map(e => (cos(vecs(q), vecs(e)), e))
        .sortBy { case (c, n) => (-c, n) }
      for (_ <- 1 to operators.Similarity.walkHops(vecs.size)) {
        val cands = beam.flatMap { case (_, node) =>
          adj.getOrElse(node, Array.empty[Long]).filter(_ != q)
            .map(d => (cos(vecs(q), vecs(d)), d))
        }
        beam = (beam ++ cands).groupBy(_._2)
          .map { case (n, vs) => (vs.map(_._1).max, n) }.toSeq
          .sortBy { case (c, n) => (-c, n) }
          .take(operators.Similarity.walkEf(vecs.size))
      }
      beam.zipWithIndex.map { case ((_, n), i) => (q, (i + 1).toLong, n) }
    }
    val got = operators.Similarity.s20b(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want, "beam search diverges from the replay")
    // MEASURED quality, same exact-NN yardstick as the s20 test — the
    // pooled frontier must beat independent greedy walks (the whole
    // point of the widening)
    val exactTop = queries.map { q =>
      q -> vecs.collect { case (id, v) if id != q => (cos(vecs(q), v), id) }
        .toSeq.sortBy { case (c, d) => (-c, d) }.map(_._2)
    }.toMap
    val greedyFound = operators.Similarity.s20m(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gHit1 = queries.count(q => exactTop(q).head == greedyFound(q))
    val gHit5 = queries.count(q =>
      exactTop(q).take(5).contains(greedyFound(q)))
    val beamTop = got.groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    val bHit1 = queries.count(q => exactTop(q).head == beamTop(q).head)
    val bHit5 = queries.count(q =>
      exactTop(q).take(5).contains(beamTop(q).head))
    // recall@5: the exact NN appears ANYWHERE in the returned beam —
    // the top-k answer greedy structurally cannot give
    val recall5 = queries.count(q => beamTop(q).contains(exactTop(q).head))
    info(f"s20b hit@1 $bHit1/${queries.size} (greedy $gHit1), " +
      f"rank1-in-exact-top5 $bHit5/${queries.size} (greedy $gHit5), " +
      f"NN-in-beam $recall5/${queries.size}")
    assert(bHit1 >= gHit1 && bHit5 >= gHit5,
      s"beam must not be worse than greedy: beam ($bHit1,$bHit5) vs greedy ($gHit1,$gHit5)")
    assert(bHit1 + bHit5 + recall5 > gHit1 + gHit5,
      "beam must strictly improve on greedy somewhere")
  }

  test("s20h: hierarchical 2-layer replay; quality vs the flat beam") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def entH(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    // layer-1 membership is the seeded hash draw (HNSW level rule)
    val subIds = vecs.keys.filter(id => entH(s"21:$id") % 16 == 0).toSeq.sorted
    assert(subIds.size >= 16,
      s"layer-1 sample too small to exercise the walk: ${subIds.size}")
    // both layers' adjacency from the engine's shared knn machinery
    // (s11 carries its own oracle; the WALK replay below is what this
    // test derives independently — the s20/s20b convention)
    def adjOf(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Long]] = {
      val dirE = df.select($"vec_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      (dirE ++ dirE.map(_.swap)) // the undirected serving view (r16)
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    }
    val adj0 = adjOf(operators.Similarity.s11(spark, sf))
    val e = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    val subDf = e.filter($"vec_id".isin(subIds: _*))
    val adj1 = adjOf(operators.Similarity.knnFromCandidates(subDf,
      operators.Similarity.candidatePairs(subDf).select($"a_id", $"b_id")))
    val entries = subIds.sortBy(id => (entH(s"20:$id"), id)).take(16)
    val queries = vecs.keys.filter(_ % 25 == 0).toSeq.sorted
    def beamLoop(q: Long, adj: Map[Long, Array[Long]], n: Int,
        beam0: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      var beam = beam0
      for (_ <- 1 to operators.Similarity.walkHops(n.toLong)) {
        val cands = beam.flatMap { case (_, node) =>
          adj.getOrElse(node, Array.empty[Long]).filter(_ != q)
            .map(d => (cos(vecs(q), vecs(d)), d))
        }
        beam = (beam ++ cands).groupBy(_._2)
          .map { case (n, vs) => (vs.map(_._1).max, n) }.toSeq
          .sortBy { case (c, n) => (-c, n) }
          .take(operators.Similarity.walkEf(n.toLong))
      }
      beam
    }
    val want = queries.flatMap { q =>
      // layer-1 BEAM from the subset's entry set (ef>1 per layer);
      // each layer's depth/width derive from ITS OWN frame size
      val coarse = beamLoop(q, adj1, subIds.size, entries.filter(_ != q)
        .map(e0 => (cos(vecs(q), vecs(e0)), e0))
        .sortBy { case (c, n) => (-c, n) })
      // descend: seeds = coarse beam nodes plus their UNDIRECTED L0
      // neighbors (r16: in-neighbors of coarse winners are exactly
      // the nodes a directed expansion structurally misses)
      val seedNodes = coarse.map(_._2)
        .flatMap(n => n +: adj0.getOrElse(n, Array.empty[Long]).toSeq)
        .distinct.filter(_ != q)
      val beam = beamLoop(q, adj0, vecs.size,
        seedNodes.map(n => (cos(vecs(q), vecs(n)), n))
          .sortBy { case (c, n) => (-c, n) })
      beam.zipWithIndex.map { case ((_, n), i) => (q, (i + 1).toLong, n) }
    }
    val got = operators.Similarity.s20h(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want, "hierarchical search diverges from the replay")
    // MEASURED: the hierarchy's point is starting the base walk in
    // the query's neighborhood — compare rank-1 quality to flat beam
    val exactTop = queries.map { q =>
      q -> vecs.collect { case (id, v) if id != q => (cos(vecs(q), v), id) }
        .toSeq.sortBy { case (c, d) => (-c, d) }.map(_._2)
    }.toMap
    val hierTop = got.groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    val beamTop = operators.Similarity.s20b(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    def score(top: Map[Long, Seq[Long]]): (Int, Int, Int) = (
      queries.count(q => top(q).head == exactTop(q).head),
      queries.count(q => exactTop(q).take(5).contains(top(q).head)),
      queries.count(q => top(q).contains(exactTop(q).head)))
    val (h1, h5, hN) = score(hierTop)
    val (f1, f5, fN) = score(beamTop)
    info(f"s20h hit@1 $h1/${queries.size} (flat beam $f1), " +
      f"rank1-in-top5 $h5 (flat $f5), NN-in-beam $hN (flat $fN)")
    // the hierarchy must not be WORSE than the flat beam on this
    // corpus (its win grows with corpus size — Recall report rows)
    assert(h1 + h5 + hN >= f1 + f5 + fN,
      s"hierarchy lost to flat beam: ($h1,$h5,$hN) vs ($f1,$f5,$fN)")
  }
}
