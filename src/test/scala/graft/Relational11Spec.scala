package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational11

/** Eleventh tranche: gaps-and-islands streaks (e09), sweep-line
  * concurrency (e10), per-source KL (t36), content-defined chunking
  * (t37), Z-order layout (q54), k-means silhouette (s10).
  *
  * Each query's exact values are oracle-checked by the external gate
  * (DuckDB hash-compare at sf0.01); here we pin the properties the
  * oracle can't state — brute-force equivalence computed a different
  * way, the CDC shift-stability guarantee, Z-order's two-dimension
  * locality vs a single-column sort, and the physical-plan shapes. */
class Relational11Spec extends SparkSpec {

  /** Final physical plan only — AdaptiveSparkPlan.toString appends the
    * "== Initial Plan ==" section, which would double-count exchanges. */
  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** The engine-portable hash64 (md5 → 15 hex chars → long), in plain
    * Scala, for brute-force re-derivations. */
  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // ---- e09 ----------------------------------------------------------

  test("e09: longest streak matches a brute-force fold over collected days") {
    val epoch = java.time.LocalDate.parse("2024-01-01")
    val days = Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .collect()
      .map(r => (r.getLong(0), java.time.temporal.ChronoUnit.DAYS.between(
        epoch, r.getDate(1).toLocalDate)))
      .groupBy(_._1).map { case (u, rows) =>
        val ds = rows.map(_._2).distinct.sorted
        val streaks = ds.foldLeft(List.empty[Long]) {
          case (len :: rest, d) if ds.contains(d - 1) => (len + 1) :: rest
          case (acc, _) => 1L :: acc
        }
        u -> ((ds.size.toLong, streaks.max))
      }.toMap
    val got = Relational11.e09(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == days.keySet)
    days.foreach { case (u, (nd, best)) =>
      assert(got(u) == ((nd, best)), s"user $u: got ${got(u)}, want ($nd,$best)")
    }
    // non-vacuous: at sf0.001 the 30-day window gives real streaks
    assert(days.values.exists(_._2 >= 2), "fixture should contain a streak")
  }

  test("e09: plan aggregates without a window — one hash exchange") {
    val plan = planOf(Relational11.e09(spark, sf))
    assert(!plan.contains("Window"), s"no window expected:\n${plan.take(1500)}")
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly one hash exchange, got $hashEx")
  }

  // ---- e10 ----------------------------------------------------------

  test("e10: max concurrency matches a brute-force sweep") {
    val hold = 5L * 60 * 1000000 // 5 min in micros
    val evs = Tables.load(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = evs.groupBy(_._1).map { case (ty, rows) =>
      val pts = rows.flatMap(r => Seq((r._2, 1), (r._2 + hold, -1)))
        .sortBy(p => (p._1, p._2))
      val (maxC, _) = pts.foldLeft((0, 0)) { case ((m, c), (_, d)) =>
        val c2 = c + d; (math.max(m, c2), c2)
      }
      (ty, maxC.toLong)
    }
    val got = Relational11.e10(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
    assert(want.values.max > 1, "fixture should produce real overlap")
  }

  test("e10: window and final aggregate share one hash exchange") {
    val plan = planOf(Relational11.e10(spark, sf))
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1,
      s"groupBy(event_type) must reuse the window's partitioning, got $hashEx:\n${plan.take(2000)}")
  }

  // ---- t36 ----------------------------------------------------------

  test("t36: KL is non-negative for every source (Gibbs) and non-vacuous") {
    val rows = Relational11.t36(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kl = r.getDouble(2)
      assert(kl >= -1e-9, s"KL(${r.getString(0)}) = $kl < 0")
    }
    assert(rows.exists(_.getDouble(2) > 0.0),
      "at least one source should diverge from the corpus blend")
  }

  test("t36: vocabulary and totals derive from one aggregate (ReusedExchange)") {
    val plan = planOf(Relational11.t36(spark, sf))
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"the (source, token) aggregate must be computed once:\n${plan.take(2000)}")
  }

  // ---- t37 ----------------------------------------------------------

  test("t37: chunks tile the token stream exactly, ids contiguous") {
    val toks = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(graft.functions.NativeKernels.word_tokens(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val chunks = Relational11.t37(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    chunks.foreach { case (doc, cs) =>
      val ids = cs.map(_._2).sorted
      assert(ids.sameElements(0L until ids.length), s"doc $doc ids not contiguous")
      assert(cs.map(_._3).sum == toks(doc).toLong,
        s"doc $doc: chunk tokens ${cs.map(_._3).sum} != ${toks(doc)}")
    }
    val covered = chunks.keySet
    toks.filter(_._2 > 0).keySet.foreach(d =>
      assert(covered(d), s"doc $d with tokens has no chunks"))
  }

  test("t37: CDC chunks survive a prefix edit; fixed tiling does not") {
    import spark.implicits._
    // vocabulary engineered to contain exactly two boundary tokens
    // (h64 % 16 == 0), so chunks are several and deterministic
    val cands = (0 until 2000).map(i => s"w$i")
    val vocab = (cands.filter(w => h64(w) % 16 != 0).take(10) ++
      cands.filter(w => h64(w) % 16 == 0).take(2)).toIndexedSeq
    assert(vocab.length == 12)
    // deterministic 200-token document
    val base = (0 until 200).map(i => vocab((i * 7 + 3) % vocab.length))
    val shifted = Seq("zulu", "yankee") ++ base // 2-token prefix edit
    val docs = Seq((1L, base.mkString(" ")), (2L, shifted.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Relational11.t37Chunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val a = out.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val b = out.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSet
    assert(a.length > 3, s"fixture should chunk into several pieces: ${a.length}")
    // every chunk of the original after its first boundary reappears
    a.drop(1).foreach(h => assert(b(h), "CDC must preserve post-boundary chunks"))
    // contrast: fixed tiling (width 16) shifts EVERY chunk under the
    // same 2-token prefix (2 is not a multiple of the tile width)
    def tiles(ts: Seq[String]) = ts.grouped(16).map(_.mkString(" ")).toSeq
    val tA = tiles(base).drop(1).toSet
    val tB = tiles(shifted).toSet
    assert(tA.intersect(tB).isEmpty,
      "fixed tiling should share no interior tiles after a prefix edit")
  }

  test("t37: per-doc plan is scan → arrays → explode, no join/exchange before the sort") {
    val plan = planOf(Relational11.t37(spark, sf))
    assert(!plan.contains("Join"), s"no join expected:\n${plan.take(1500)}")
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 0, s"no hash exchange expected, got $hashEx")
  }

  // ---- q54 ----------------------------------------------------------

  test("q54: z-buckets bound BOTH dimensions; a one-column sort does not") {
    val rows = Relational11.q54(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cs, ds2) = (r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      // bucket = top 16 bits of the 32-bit Morton key → the low 8 bits
      // of each dimension are free within a bucket, nothing more
      assert(cs <= 255, s"bucket ${r.getLong(0)}: custkey span $cs > 255")
      assert(ds2 <= 255, s"bucket ${r.getLong(0)}: day span $ds2 > 255")
    }
    // contrast: bucket the same rows by custkey alone (same bucket
    // count) — the day dimension stays unbounded in most buckets
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")).as("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val nb = rows.length
    val spans = o.sortBy(_._1).grouped(math.max(1, o.length / nb)).map { g =>
      g.map(_._2).max - g.map(_._2).min
    }.toSeq
    assert(spans.exists(_ > 255),
      s"custkey-sorted buckets should leave the day span unbounded: ${spans.take(10)}")
  }

  // ---- s10 ----------------------------------------------------------

  test("s10: silhouette bounded in [-1,1], members cover the corpus") {
    val rows = graft.operators.Similarity.s10(spark, sf).collect()
    assert(rows.length == 8, "one row per cluster")
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == n, "every vector assigned once")
    rows.foreach { r =>
      val sil = r.getDouble(2)
      assert(sil >= -1.0 && sil <= 1.0, s"cluster ${r.getLong(0)}: $sil")
    }
  }

  test("s10: corpus is scanned once — broadcast centroids, vec_id window only") {
    val plan = planOf(graft.operators.Similarity.s10(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "centroids must broadcast")
    // the only hash exchanges are the window's vec_id partition and
    // the K-row cluster aggregate
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(l => l.contains("vec_id") || l.contains("cluster")),
      s"unexpected exchange:\n${hashEx.mkString("\n")}")
  }
}
