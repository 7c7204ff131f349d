package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational14
import org.scalatest.funsuite.AnyFunSuite

/** Fourteenth tranche: Markov transitions, the bucketed co-located
  * join, and hybrid RRF retrieval. The DuckDB oracle pins cross-engine
  * equality; these specs pin what the oracle can't see — the PLAN the
  * bucketed layout buys (the whole point of q58), the transition-count
  * algebra, and the RRF arithmetic. */
class Relational14Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("q58: the bucketed join plans with ZERO shuffle exchanges " +
      "(the layout's whole payoff); the unbucketed control shuffles") {
    val (oTbl, lTbl) = Relational14.bucketedTablePair(spark, sf)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // force the SMJ path on both variants
      val o = spark.table(oTbl)
      val l = spark.table(lTbl)
      val bucketed = planOf(
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select(o("o_orderkey"), l("l_quantity")))
      assert(bucketed.contains("SortMergeJoin"), bucketed.take(1500))
      assert(!bucketed.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${bucketed.take(2000)}")

      val po = Tables.load(spark, sf, "orders")
      val pl = Tables.load(spark, sf, "lineitem")
      val control = planOf(
        po.join(pl, po("o_orderkey") === pl("l_orderkey"))
          .select(po("o_orderkey"), pl("l_quantity")))
      assert(control.contains("Exchange"),
        "control (unbucketed) join should shuffle — otherwise the " +
          "bucketed assertion proves nothing")
    } finally spark.conf.set(key, old)
  }

  test("q58: aggregation on the bucket key is also exchange-free " +
      "(the layout pays off beyond the join)") {
    val (oTbl, _) = Relational14.bucketedTablePair(spark, sf)
    val s = spark
    import s.implicits._
    val agg = spark.table(oTbl)
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("t"))
    val plan = planOf(agg)
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must not shuffle:\n${plan.take(1500)}")
    // the unbucketed control DOES shuffle for the same aggregation
    val control = planOf(Tables.load(spark, sf, "orders")
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n"), sum($"o_totalprice").as("t")))
    assert(control.contains("Exchange"))
  }

  test("q58: the ingest is genuinely multi-task — several files per " +
      "bucket, each file internally sorted on the bucket key") {
    val (oTbl, _) = Relational14.bucketedTablePair(spark, sf)
    // bucket id is encoded in the file name: part-<task>-<uuid>_<bucket>
    val bucketOf = "_(\\d{5})\\.".r
    val files = spark.table(oTbl).inputFiles
    val byBucket = files.groupBy(f =>
      bucketOf.findFirstMatchIn(f).map(_.group(1)).getOrElse(
        fail(s"bucketed file without a bucket suffix: $f")))
    assert(byBucket.size == Relational14.Q58_BUCKETS)
    // ≥ 2 write tasks contributed to at least one bucket (at this SF
    // every task holds rows of every bucket, so in practice all 8)
    assert(byBucket.values.count(_.length >= 2) == Relational14.Q58_BUCKETS,
      s"expected one file per (task, bucket): " +
        s"${byBucket.view.mapValues(_.length).toMap}")
    assert(files.length ==
      Relational14.Q58_BUCKETS * Relational14.Q58_INGEST_TASKS)
    // sortBy holds PER FILE (the property a later compaction or a
    // merge-reader can rely on); the cross-file bucket order is
    // correctly absent — the join test below shows Spark planning a
    // bucket-local Sort but no Exchange
    files.foreach { f =>
      val keys = spark.read.parquet(f).select("o_orderkey")
        .collect().map(_.getLong(0))
      assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
        s"file $f is not sorted on o_orderkey")
    }
  }

  test("q58: with multiple files per bucket the join plans a bucket-" +
      "local Sort (read-side order is declared absent) and still no Exchange") {
    val (oTbl, lTbl) = Relational14.bucketedTablePair(spark, sf)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val o = spark.table(oTbl)
      val l = spark.table(lTbl)
      val plan = planOf(
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select(o("o_orderkey"), l("l_quantity")))
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"))
      assert(plan.contains("Sort "),
        s"multi-file buckets cannot declare a read ordering, so the " +
          s"SMJ must sort bucket-locally:\n${plan.take(1500)}")
    } finally spark.conf.set(key, old)
  }

  test("q58: result is layout-invariant (bucketed ≡ plain-parquet join)") {
    val s = spark
    import s.implicits._
    val viaBuckets = Relational14.q58(spark, sf)
    val po = Tables.load(spark, sf, "orders")
    val pl = Tables.load(spark, sf, "lineitem")
    val plain = po.join(pl, po("o_orderkey") === pl("l_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round($"l_quantity").cast("long")).as("sum_qty"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("sum_cents"))
    assert(viaBuckets.count() > 0)
    assert(viaBuckets.except(plain).isEmpty && plain.except(viaBuckets).isEmpty)
  }

  test("e12: transition counts cover every non-first event, and each " +
      "row's p_ppm is the exact floor division of its row total") {
    val s = spark
    import s.implicits._
    val rows = Relational14.e12(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, sf, "events")
    val totalEvents = ev.count()
    val nUsers = ev.select($"user_id").distinct().count()
    // each user's k events yield exactly k−1 transitions
    assert(rows.map(_.getAs[Long]("n")).sum == totalEvents - nUsers)
    // per-source probabilities: recompute tot per from_type and check
    // p_ppm = floor(1e6 * n / tot); the floor sum lands in (1e6 - rowcount, 1e6]
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, g) =>
      val tot = g.map(_.getAs[Long]("n")).sum
      g.foreach { r =>
        assert(r.getAs[Long]("p_ppm") == r.getAs[Long]("n") * 1000000L / tot)
      }
      val pSum = g.map(_.getAs[Long]("p_ppm")).sum
      assert(pSum <= 1000000L && pSum > 1000000L - g.size)
    }
  }

  test("s15: exactly TOPK fused rows per exemplar, RRF arithmetic " +
      "exact, and both legs contribute to the fused ranking") {
    val rows = Relational14.s15(spark, sf).collect()
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.size == Relational14.RRF_NQ)
    perQ.foreach { case (_, g) =>
      assert(g.length == Relational14.RRF_TOPK)
      assert(g.map(_.getAs[Long]("fused_rank")).sorted.toSeq ==
        (1L to Relational14.RRF_TOPK.toLong))
    }
    rows.foreach { r =>
      val lex = r.getAs[Long]("lex_rank")
      val den = r.getAs[Long]("dense_rank")
      assert(lex >= 0 && lex <= Relational14.RRF_LEG_K)
      assert(den >= 0 && den <= Relational14.RRF_LEG_K)
      assert(lex > 0 || den > 0, "a fused row must come from some leg")
      val expected =
        (if (lex > 0) 1000000000L / (Relational14.RRF_C + lex) else 0L) +
        (if (den > 0) 1000000000L / (Relational14.RRF_C + den) else 0L)
      assert(r.getAs[Long]("rrf") == expected)
    }
    // the fusion is only meaningful if both legs surface somewhere
    assert(rows.exists(_.getAs[Long]("lex_rank") > 0), "lexical leg empty")
    assert(rows.exists(_.getAs[Long]("dense_rank") > 0), "dense leg empty")
  }
  test("t42: the cap binds per source, the sample is the bottom-k of the " +
      "hash order, and the partial aggregate bounds map-side state") {
    val rows = Relational14.t42(spark, sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, g) =>
      assert(g.length <= Relational14.CAP_PER_SOURCE, s"cap violated for $src")
      assert(g.map(_.getAs[Long]("keep_rank")).sorted.toSeq ==
        (1L to g.length.toLong), s"ranks not contiguous for $src")
      // kept docs are exactly the k smallest hashes (sorted ascending)
      val hs = g.sortBy(_.getAs[Long]("keep_rank")).map(_.getAs[Long]("h")).toSeq
      assert(hs == hs.sorted, s"kept hashes not in bottom-k order for $src")
      assert(g.map(_.getAs[Long]("n_total")).distinct.length == 1)
    }
    // deterministic under re-evaluation
    val again = Relational14.t42(spark, sf).collect().map(_.toSeq).toSeq
    assert(again == rows.map(_.toSeq).toSeq)
    // the BottomK aggregate partial-aggregates (<= k rows per source
    // cross the shuffle), and no per-source rank window exists
    val plan = Relational14.t42(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("partial_bottomk"), "BottomK must combine map-side")
    assert(!plan.contains("Window"), "the cap must not plan a rank window")
  }
}
