package graft

import org.apache.spark.sql.functions._

/** Tranche-18: t44 ranking metrics, s18 triangle counting. The gate
  * hash-checks both against DuckDB; these tests replay the math
  * brute-force in process and pin the structural claims (orientation
  * out-degree bound, metric ranges, perfect-ordering fixed point). */
class Relational18Spec extends SparkSpec {

  import spark.implicits._

  test("t44: brute-force metric replay matches the registered query") {
    val ranked = operators.Relational12.t38(spark, sf)
      .select($"term", $"doc_id", $"rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def h(term: String, doc: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$term#$doc".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 4
    }
    val w = operators.Relational18.NDCG_W
    val want = ranked.groupBy(_._1).map { case (term, rows) =>
      val rs = rows.sortBy(_._3)
      val rels = rs.map { case (_, d, _) => h(term, d) }
      val gains = rels.map(r => (1L << r.toInt) - 1L)
      val nRel = rels.count(_ > 0).toLong
      val rr = rs.zip(rels).collectFirst {
        case ((_, _, rank), r) if r > 0 => 1000000L / rank
      }.getOrElse(0L)
      val dcg = gains.zip(w).map { case (g, ww) => g * ww }.sum
      val idcg = gains.sorted.reverse.zip(w).map { case (g, ww) => g * ww }.sum
      val ndcg = if (idcg > 0) dcg * 1000000L / idcg else 0L
      term -> ((nRel, rr, dcg, idcg, ndcg))
    }
    val got = operators.Relational18.t44(spark, sf).collect().map(r =>
      r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got == want)
    assert(got.values.forall { case (n, rr, _, _, nd) =>
      n <= 5 && rr <= 1000000L && nd <= 1000000L })
  }

  test("t44: a ranking already ordered by gain scores ndcg = 1e6") {
    val rows = operators.Relational18.t44(spark, sf)
      .filter($"idcg" > 0).collect()
    assert(rows.nonEmpty)
    // the metric's fixed point: dcg == idcg  <=>  ndcg_ppm == 1e6
    rows.foreach { r =>
      assert((r.getLong(3) == r.getLong(4)) == (r.getLong(5) == 1000000L))
    }
  }

  test("s18: brute-force triangle count on the collected graph") {
    val und = {
      val n1 = greatest(size($"tk") - 1, lit(0))
      Tables.load(spark, sf, "documents")
        .select(functions.NativeKernels.word_tokens($"text").as("tk"))
        .select(explode_outer(zip_with(
          slice($"tk", lit(1), n1), slice($"tk", lit(2), n1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .filter($"p".isNotNull)
        .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(count(lit(1)).as("n"))
        .filter($"n" >= 5 && $"a" =!= $"b")
        .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
        .distinct().collect().map(r => (r.getString(0), r.getString(1)))
        .toSet
    }
    val adj = und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    var tri = 0L
    for ((u, v) <- und) tri += (adj(u) & adj(v)).size
    tri /= 3 // each triangle counted once per edge
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val got = operators.Relational18.s18(spark, sf).collect()(0)
    assert(got.getLong(0) == nodes.size.toLong, "n_nodes")
    assert(got.getLong(1) == und.size.toLong, "n_edges")
    assert(got.getLong(2) == wedges, "n_wedges")
    assert(got.getLong(3) == tri, s"n_tri: got ${got.getLong(3)}, want $tri")
    val expectGcc = if (wedges > 0) 3 * tri * 1000000L / wedges else 0L
    assert(got.getLong(4) == expectGcc, "gcc_ppm")
  }

  test("x10: shard-merge equals the direct bottom-k sketch per type") {
    val s = spark
    import s.implicits._
    val ev = Tables.load(spark, sf, "events").select(
      $"event_type",
      functions.TextOps.hash64(
        concat(lit("x10:"), $"event_id".cast("string"))).as("h"),
      $"value")
    // direct path: one bottom-k over each type's full row set
    val direct = ev.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.map(r => (r._2, r._3)).sorted.take(128).map(_._2)
          .sorted.toSeq
      }
    val got = operators.Relational18.x10(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got.keySet == direct.keySet)
    got.foreach { case (t, (nDays, nSample, p50, p90, p99)) =>
      val vals = direct(t)
      assert(nSample == vals.length.toLong, s"$t sample size")
      def sx(q: Double) = vals(((vals.length - 1) * q).toInt)
      assert((p50, p90, p99) == (sx(0.5), sx(0.9), sx(0.99)),
        s"$t quantiles diverge from the direct sketch")
      assert(nDays >= 1 && nDays <= 366)
    }
    // the sharded path's claim: >1 shard per type was actually merged
    val nDaysTotal = got.values.map(_._1).max
    assert(nDaysTotal > 1, "fixture must exercise a real merge")
  }

  test("e14: brute-force attribution replay matches the registered query") {
    val s = spark
    import s.implicits._
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("tsus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val look = 120L * 60 * 1000000
    val touches = Set("click", "view", "signup")
    val byUser = ev.groupBy(_._1)
    case class Acc(nLast: Long = 0, cents: Long = 0, nFirst: Long = 0)
    var acc = Map.empty[String, Acc].withDefaultValue(Acc())
    var accF = Map.empty[String, Long].withDefaultValue(0L)
    for ((_, rows) <- byUser; (_, _, tp, v, ts) <- rows
         if tp == "purchase") {
      val win = rows.filter(r => touches(r._3) &&
        r._5 >= ts - look && r._5 <= ts - 1)
        .map(r => (r._5, r._2, r._3)) // (ts, id, ch) — struct order
      val lastCh = if (win.isEmpty) "none" else win.max._3
      val firstCh = if (win.isEmpty) "none" else win.min._3
      val cents = math.round(v * 100)
      val a = acc(lastCh)
      acc = acc.updated(lastCh,
        a.copy(nLast = a.nLast + 1, cents = a.cents + cents))
      accF = accF.updated(firstCh, accF(firstCh) + 1)
    }
    val want = (acc.keySet ++ accF.keySet).map { ch =>
      ch -> ((acc(ch).nLast, acc(ch).cents, accF(ch)))
    }.toMap
    val got = operators.Relational18.e14(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"attribution diverges: ${got.size}/${want.size}")
    // conservation: every purchase earns exactly one credit per model
    val nPurch = ev.count(_._3 == "purchase").toLong
    assert(got.values.map(_._1).sum == nPurch)
    assert(got.values.map(_._3).sum == nPurch)
  }

  test("s18: degree-ordered orientation bounds every out-degree by sqrt(2m)") {
    // the skew claim: orient low->high (degree, id) and even the
    // biggest hub's out-degree is <= sqrt(2m), because each of its
    // out-neighbours has degree >= its own
    val n1 = greatest(size($"tk") - 1, lit(0))
    val und = Tables.load(spark, sf, "documents")
      .select(functions.NativeKernels.word_tokens($"text").as("tk"))
      .select(explode_outer(zip_with(
        slice($"tk", lit(1), n1), slice($"tk", lit(2), n1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .filter($"p".isNotNull)
      .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(count(lit(1)).as("n"))
      .filter($"n" >= 5 && $"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val deg = (und.map(_._1) ++ und.map(_._2)).groupBy(identity)
      .map { case (k, vs) => k -> vs.length }
    def key(w: String) = (deg(w), w)
    implicit val ord: Ordering[(Int, String)] =
      Ordering.Tuple2(Ordering.Int, Ordering.String)
    val outDeg = und.map { case (u, v) =>
      if (ord.lt(key(u), key(v))) u else v
    }.groupBy(identity).map(_._2.length)
    val m = und.length
    assert(m > 0)
    assert(outDeg.max <= math.sqrt(2.0 * m).ceil.toInt,
      s"max out-degree ${outDeg.max} exceeds sqrt(2m)=${math.sqrt(2.0 * m)}")
  }
}
