package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Tranche-15 operators: d17 exact-substring spans, q60 dynamic
  * partition pruning, e13 interval-join attribution. Each checked
  * against an in-process brute-force oracle at sf0.001 (the DuckDB
  * gate re-checks at sf0.01); q60 additionally asserts the DPP
  * mechanism itself — the runtime partition filter and the pruned
  * file count — not just the (layout-invariant) result. */
class Relational15Spec extends SparkSpec {

  private val W = 8

  /** Brute-force d17: tokenize every doc, count 8-gram occurrences
    * globally, mark duplicated start positions, merge [p, p+8) spans. */
  private def bruteSpans(): Seq[(Long, Long, Long, Long)] = {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(s: String): Array[String] = {
      val t = s.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
      if (t.length == 1 && t(0).isEmpty) Array.empty else t
    }
    val grams = docs.flatMap { case (id, text) =>
      val tk = toks(text)
      (0 to tk.length - W).map(i => (id, i.toLong, tk.slice(i, i + W).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.length).toMap
    grams.filter(g => counts(g._3) > 1).groupBy(_._1).toSeq.flatMap {
      case (id, hs) =>
        val pos = hs.map(_._2).sorted
        val spans = pos.foldLeft(Vector.empty[(Long, Long)]) {
          case (acc, p) =>
            if (acc.nonEmpty && p <= acc.last._2) {
              acc.init :+ (acc.last._1, math.max(acc.last._2, p + W))
            } else acc :+ (p, p + W)
        }
        spans.map { case (a, b) => (id, a, b, b - a) }
    }.sortBy(r => (r._1, r._2))
  }

  test("d17: spans equal the brute-force exact-substring oracle") {
    val got = operators.Relational15.d17(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = bruteSpans()
    assert(got.nonEmpty, "d17 must be non-vacuous at sf0.001")
    assert(got == want)
  }

  test("d17: spans are maximal — disjoint, non-adjacent, each >= W tokens") {
    val rows = operators.Relational15.d17(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, sp) =>
      val s = sp.sortBy(_._2)
      s.foreach { case (_, a, b) => assert(b - a >= W) }
      s.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1, "merged spans must be separated by a gap")
        case _ =>
      }
    }
  }

  test("q60: result matches the unpartitioned join; plan carries a dynamic partition filter") {
    val s = spark
    import s.implicits._
    val df = operators.Relational15.q60(spark, sf)
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    val want = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables.load(spark, sf, "nation"), $"c_nationkey" === $"n_nationkey")
      .filter($"n_name".isin("NATION_3", "NATION_7", "NATION_19"))
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("tp"),
        min($"o_orderkey").as("mn"), max($"o_orderkey").as("mx"))
      .orderBy($"n_name").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(got.sameElements(want))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"q60's fact scan must be dynamically pruned:\n${plan.take(2000)}")
  }

  test("q60: only the matching partition directories are read") {
    val df = operators.Relational15.q60(spark, sf)
    df.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val scans = nodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .filter(_.toString.contains("orders_by_nation"))
    assert(scans.nonEmpty, "fact scan not found in executed plan")
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    // 25 nation partitions on disk, 3 selected; one file per partition
    assert(filesRead <= 3,
      s"DPP must reduce the scan to the 3 matching partitions, read $filesRead files")
  }

  test("d18: span cut equals recomputing each doc minus its d17 spans") {
    val spans = operators.Relational15.d17(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSeq).toMap
    def toks(s: String): Array[String] = {
      val t = s.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
      if (t.length == 1 && t(0).isEmpty) Array.empty else t
    }
    val want = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val (id, tk) = (r.getLong(0), toks(r.getString(1)))
        val sp = spans.getOrElse(id, Seq.empty)
        val kept = tk.zipWithIndex.collect {
          case (tok, i) if !sp.exists(s => i >= s._1 && i < s._2) => tok
        }
        (id, kept.mkString(" "), kept.length.toLong,
          (tk.length - kept.length).toLong)
      }.sortBy(_._1).toSeq
    val got = operators.Relational15.d18(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.exists(_._4 > 0), "some doc must lose tokens at sf0.001")
    assert(got == want)
  }

  test("d19: incremental spans are bit-identical to full recompute on the new batch") {
    val s = spark
    import s.implicits._
    val fold = pmod(graft.functions.TextOps.hash64(
      concat(lit("inc:"), $"doc_id".cast("string"))), lit(10L)) === 0L
    val want = operators.Relational15.d17(spark, sf)
      .filter(fold)
      .orderBy($"doc_id", $"span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = operators.Relational15.d19(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty, "the new batch must carry spans at sf0.001")
    assert(got == want)
  }

  test("d19: gram-count state is a chainable monoid (state + batch = full corpus)") {
    val s = spark
    import s.implicits._
    // old-state counts ⊕ new-batch counts must equal the full-corpus
    // gram counts — the associativity that makes increments chainable
    val g = Tables.load(spark, sf, "documents")
      .select($"doc_id",
        explode(graft.functions.NativeKernels.gram_hash_seq($"text", 8)).as("gh"))
    val fold = pmod(graft.functions.TextOps.hash64(
      concat(lit("inc:"), $"doc_id".cast("string"))), lit(10L)) === 0L
    val merged = operators.Relational15.materializedGramCounts(spark, sf)
      .withColumnRenamed("m_old", "m")
      .union(g.filter(fold).groupBy($"gh").agg(count(lit(1)).as("m")))
      .groupBy($"gh").agg(sum($"m").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = g.groupBy($"gh").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == full)
  }

  test("d17m/d18m: materialized forms equal the fresh builds row for row") {
    assert(operators.Relational15.d17m(spark, sf).collect().toSeq ==
      operators.Relational15.d17(spark, sf).collect().toSeq)
    assert(operators.Relational15.d18m(spark, sf).collect().toSeq ==
      operators.Relational15.d18(spark, sf).collect().toSeq)
  }

  test("e13: conversions equal the brute-force NFA replay") {
    val s = spark
    import s.implicits._
    val ev = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type",
        expr("unix_micros(ts)").as("tsm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val lb = operators.Relational15.E13_LOOKBACK_MIN * 60L * 1000000L
    // replay each user's sequence through the click (NOT error)* purchase NFA
    val want = ev.groupBy(_._2).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._1))
      var lastClick = Option.empty[Long]
      var lastError = Option.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { case (eid, _, tpe, ts) =>
        if (tpe == "purchase" && lastClick.exists(c =>
            ts - c <= lb && lastError.forall(_ < c)))
          out += ((uid, eid, ts - lastClick.get))
        if (tpe == "click") lastClick = Some(ts)
        if (tpe == "error") lastError = Some(ts)
      }
      out
    }.sortBy(_._2)
    val got = operators.Relational15.e13(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "e13 must be non-vacuous at sf0.001")
    assert(got == want)
  }

  test("e13: one data-sized exchange (the user window), no joins, pruned scan") {
    val plan = operators.Relational15.e13(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("Join"), plan.take(1500))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"unused event columns must be pruned: $readSchema")
  }
}
