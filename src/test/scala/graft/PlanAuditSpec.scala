package graft

import graft.operators.{Relational, Relational4}

/** Physical-plan audits (the "is this the plan you'd want at 100 TB"
  * checks, asserted so they can't silently regress):
  *  - filters reach the parquet scan (PushedFilters) and the scan reads
  *    only referenced columns (ReadSchema pruning);
  *  - small dimension joins are broadcast, not shuffled;
  *  - aggregations are partial (map-side combine) before the shuffle;
  *  - the typed top-k aggregator partial-aggregates too (its whole
  *    point: ≤ k rows per group cross the wire).
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicates push down and the scan prunes columns") {
    val plan = planOf(Relational.q02(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("IsNotNull(l_shipdate)") || plan.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate range must reach the scan")
    // scan must not read the full 11-column lineitem schema
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_tax"),
      s"unreferenced columns must be pruned: $readSchema")
  }

  test("q04: dimension joins broadcast, no shuffle of the dims") {
    val plan = planOf(Relational.q04(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!plan.contains("CartesianProduct"), "no cartesian products")
  }

  test("q01: aggregation is partial before the shuffle") {
    val plan = planOf(Relational.q01(spark, sf))
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, plan:\n${plan.take(1500)}")
    assert(plan.contains("partial_"), "map-side combine must run")
  }

  test("d04: banded simhash plan has no all-pairs join") {
    val plan = planOf(graft.operators.Dedup.d04(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded simhash must not plan an all-pairs join:\n${plan.take(2000)}")
  }

  test("s03: bucketed near-dup plan has no all-pairs join") {
    val plan = planOf(graft.operators.Similarity.s03(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed candidates must not plan an all-pairs join:\n${plan.take(2000)}")
  }

  test("d08: semantic clustering plan has no all-pairs join") {
    val plan = planOf(graft.operators.Similarity.d08(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"semantic clusters build on bucketed candidates:\n${plan.take(2000)}")
  }

  test("s11: knn graph builds on bucketed candidates, no all-pairs join") {
    val plan = planOf(graft.operators.Similarity.s11(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"knn graph must not plan an all-pairs join:\n${plan.take(2000)}")
  }

  test("t38: bm25 derives dl/TL/N from the tf aggregate — one corpus tokenize for stats") {
    val plan = planOf(graft.operators.Relational12.t38(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"),
      s"only the 1-row totals frame may cross-product (as broadcast):\n${finalPlan.take(1500)}")
    // the query-term and totals sides must broadcast, never shuffle the
    // tf table by term for a sort-merge join
    assert(!finalPlan.contains("SortMergeJoin"),
      s"small sides must broadcast:\n${finalPlan.take(1500)}")
    // the top-k cut is the bounded-buffer aggregator, not a rank
    // window — a stop-term would otherwise sort a corpus-sized
    // partition on one reducer
    assert(!finalPlan.contains("Window"),
      s"per-term top-k must partial-aggregate, not window:\n${finalPlan.take(1500)}")
    assert(finalPlan.contains("ObjectHashAggregate"),
      s"typed TopDocs aggregator must plan as ObjectHashAggregate:\n${finalPlan.take(1500)}")
  }

  test("q55: decorrelated subquery plans as hash joins, part broadcast, no per-row subquery") {
    val plan = planOf(graft.operators.Relational12.q55(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("BroadcastNestedLoopJoin") &&
      !finalPlan.contains("CartesianProduct"),
      s"correlated-subquery shape must decorrelate:\n${finalPlan.take(1500)}")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"the part dimension must broadcast:\n${finalPlan.take(1500)}")
  }

  test("t14: mixture rates join back without shuffling the corpus twice") {
    val plan = planOf(graft.operators.Curation.t14(spark, sf))
    // the per-source counts and their min must come back as broadcast
    // sides — a sort-merge join here would shuffle the corpus by source
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"count tables should broadcast onto the corpus scan:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the rate join:\n${plan.take(2000)}")
  }

  test("t13: sharded packing window is partitioned, t12's is global") {
    val sharded = planOf(graft.operators.Relational5.t13(spark, sf))
    assert(sharded.contains("hashpartitioning(shard"),
      s"sharded packing must sort per shard, not globally:\n${sharded.take(2000)}")
    val global = planOf(graft.operators.Relational5.t12(spark, sf))
    assert(global.contains("SinglePartition"),
      "the global form is the single-stream (one-partition-sort) baseline")
  }

  test("x02: bloom prune keeps scan pruning and stays off the typed path") {
    val plan = planOf(Relational4.x02(spark, sf))
    // the key-range half of the runtime filter must reach the scan
    assert(plan.contains("PushedFilters: [") &&
      (plan.contains("GreaterThanOrEqual(l_orderkey") || plan.contains("IsNotNull(l_orderkey)")),
      s"key range must push to the lineitem scan:\n${plan.take(2000)}")
    // the scan must prune to the 3 referenced columns, not all 11
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("l_quantity") && !readSchemas.contains("l_shipdate"),
      s"unreferenced lineitem columns must be pruned: $readSchemas")
    // no per-row deserialization: the bloom probe is a codegen'd
    // predicate, not a typed lambda filter
    assert(!plan.contains("DeserializeToObject") && !plan.contains("createexternalrow"),
      "bloom probe must not force row deserialization")
    assert(plan.contains("might_contain"), "bloom probe must be in the plan")
  }

  test("t06: tf-idf scans documents once (df and N derive from tf)") {
    val plan = planOf(graft.operators.Relational2.t06(spark, sf))
    // count inside the AQE-final plan only — the "== Initial Plan ==" echo
    // shows the pre-reuse shape with one scan per branch by construction
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = finalPlan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents"))
    assert(scans == 1, s"expected one documents scan, got $scans:\n${finalPlan.take(2500)}")
    assert(finalPlan.linesIterator.count(_.contains("ReusedExchange")) == 2,
      "df and N branches must both reuse tf's (doc_id, term) exchange")
  }

  test("t15: duplicated-n-gram stats scan documents once, no join") {
    val plan = planOf(graft.operators.Relational6.t15(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = finalPlan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents"))
    assert(scans == 1, s"expected one documents scan, got $scans:\n${finalPlan.take(2500)}")
    assert(!finalPlan.contains("Join"),
      s"total and dup counts must come from one aggregate, not a join:\n${finalPlan.take(2500)}")
  }

  test("q49: binned range join plans as a hash equi-join, not a nested loop") {
    val plan = planOf(graft.operators.Relational6.q49(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"no-equi-key interval join must bin, not nested-loop:\n${plan.take(2500)}")
  }

  test("q34: typed top-k aggregator partial-aggregates") {
    val plan = planOf(Relational4.q34(spark, sf))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.contains("partial_"),
      "the aggregator's map side must reduce groups to k rows before the shuffle")
  }

  test("t17: chunking tokenizes once and only shuffles for the final sort") {
    val plan = planOf(graft.operators.Relational7.t17(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.linesIterator.count(_.contains("tokens(")) == 1,
      s"the tokens kernel must run once per row (a size(tk)>0 filter " +
        s"pushed below the projection doubles it):\n${finalPlan.take(2500)}")
    assert(finalPlan.linesIterator.count(_.contains("Exchange")) == 1,
      s"tiling must be shuffle-free; the one exchange is the gate's " +
        s"ORDER BY:\n${finalPlan.take(2500)}")
  }

  test("t18: unigram NLL scans documents once (vocab and total derive in-plan)") {
    val plan = planOf(graft.operators.Relational7.t18(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = finalPlan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents"))
    assert(scans == 1, s"expected one documents scan, got $scans:\n${finalPlan.take(2500)}")
    assert(finalPlan.contains("ReusedExchange"),
      "vocabulary must derive from the (doc, token) aggregate's exchange")
  }

  test("t19: BPE pair stats end in TakeOrderedAndProject, no global sort") {
    val plan = planOf(graft.operators.Relational7.t19(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-K cut must not plan a global sort:\n${plan.take(2000)}")
  }

  test("q51: fuzzy best-match verifies candidates only, no all-pairs join") {
    val plan = planOf(graft.operators.Relational7.q51(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"levenshtein must run on proposed pairs only:\n${plan.take(2500)}")
  }

  test("t22: OOV rate scans documents once (vocab derives from the dt aggregate)") {
    val plan = planOf(graft.operators.Relational7.t22(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = finalPlan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents"))
    assert(scans == 1, s"expected one documents scan, got $scans:\n${finalPlan.take(2500)}")
    assert(finalPlan.contains("ReusedExchange"),
      "the vocabulary must reuse the (doc, token) aggregate's exchange")
    assert(finalPlan.contains("BroadcastHashJoin"),
      "top-K vocabulary membership must broadcast")
  }

  test("d11: cross-corpus near-dup has no self-join and no all-pairs join") {
    val plan = planOf(graft.operators.Relational7.d11(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Join"),
      s"pairs must come from in-bucket expansion, not a shingle self-join:\n${finalPlan.take(2500)}")
    assert(finalPlan.toLowerCase.contains("pairexpand"),
      "the native pair generator must drive candidate generation")
  }

  test("s08: argmin partial-aggregates, centroids broadcast, no window over n·K rows") {
    val plan = planOf(graft.operators.Relational8.s08(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Window"),
      "argmin must be min(struct(...)), an aggregate, not a window")
    assert(finalPlan.contains("partial_min"),
      "the K distances per vector must collapse map-side")
    assert(finalPlan.contains("BroadcastExchange") ||
      finalPlan.contains("BroadcastNestedLoopJoin"),
      "K-row centroid frames must broadcast to the corpus")
    val shuffles = finalPlan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.forall(l => l.contains("cluster") || l.contains("vec_id")),
      s"only aggregate exchanges allowed:\n${shuffles.mkString("\n")}")
  }

  test("t24: novelty joins shingle-keyed, partial-aggregates before the shuffle") {
    val plan = planOf(graft.operators.Relational8.t24(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"),
      "novelty must not plan an all-pairs comparison")
    assert(finalPlan.contains("partial_"),
      "reference distinct + per-doc counts must combine map-side")
  }

  test("t28: bigram NLL tokenizes once, vocab derives from the (doc,a,b) aggregate") {
    val plan = planOf(graft.operators.Relational8.t28(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = finalPlan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents"))
    assert(scans == 1, s"expected one documents scan, got $scans")
    assert(finalPlan.contains("ReusedExchange"),
      "bigram vocabulary must reuse the (doc, a, b) aggregate's exchange")
  }

  test("e06: funnel reuses one user_id partitioning across all stages") {
    val plan = planOf(graft.operators.Relational8.e06(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct"), "no cartesian stages")
    // every hash exchange in the funnel body is on user_id — the join
    // and the aggregate use the same key, so AQE/EnsureRequirements
    // never inserts a second partitioning of the events
    val shuffles = finalPlan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.forall(_.contains("user_id")),
      s"funnel shuffles must be user_id-keyed:\n${shuffles.mkString("\n")}")
  }

  test("q52s: sharded deciles never sort the row set (q52's ntile does)") {
    val r8 = graft.operators.Relational8
    val sharded = planOf(r8.q52s(spark, sf))
    assert(!sharded.contains("ntile"),
      s"sharded path must not use the global ntile:\n${sharded.take(2000)}")
    // the only window/sort input is the (n_tok, cnt) frequency frame:
    // every single-partition exchange sits above a HashAggregate, so
    // what crosses into the sort is one row per DISTINCT length
    val finalPlan = sharded.split("== Initial Plan ==").head
    val rowWindows = finalPlan.linesIterator
      .filter(_.contains("Window")).toSeq
    assert(rowWindows.forall(_.contains("n_tok")),
      s"window must run over the aggregated frequency frame:\n$rowWindows")
    assert(finalPlan.contains("HashAggregate"),
      "row-level groupBy(n_tok) must partial-aggregate before any sort")
    // and the baseline q52 IS the global-sort form (gate-mandated)
    assert(planOf(r8.q52(spark, sf)).contains("ntile"))
  }

  test("q52s equals q52 row-for-row (sharded rank arithmetic is exact)") {
    val r8 = graft.operators.Relational8
    val a = r8.q52(spark, sf).collect().toSeq
    val b = r8.q52s(spark, sf).collect().toSeq
    assert(a == b, s"decile reports diverged:\n$a\n$b")
  }

  test("t31/t32/s09 are single-scan map-only plans (no join, no aggregation shuffle)") {
    val plans = Seq(
      "t31" -> planOf(graft.operators.Relational10.t31(spark, sf)),
      "t32" -> planOf(graft.operators.Relational10.t32(spark, sf)),
      "s09" -> planOf(graft.operators.Similarity.s09(spark, sf)))
    plans.foreach { case (name, p) =>
      val finalPlan = p.split("== Initial Plan ==").head
      assert(!finalPlan.contains("Join"),
        s"$name must not join:\n${finalPlan.take(1500)}")
      // per-row higher-order functions, no groupBy: the only exchange
      // is the deterministic output sort's range partitioning
      assert(!finalPlan.contains("Exchange hashpartitioning"),
        s"$name must not shuffle by hash:\n${finalPlan.take(1500)}")
      assert(!finalPlan.contains("HashAggregate"),
        s"$name must not aggregate rows:\n${finalPlan.take(1500)}")
    }
  }

  test("kernel-occurrence sweep: no query plan re-runs tokenize/md5/shingle chains") {
    // The t37 bug class: predicate pushdown (or a collapsed projection)
    // substitutes an expensive kernel chain into multiple plan sites,
    // re-running tokenize + md5 per row many times over. Sweep every
    // registered query's physical plan and bound the occurrence counts.
    // d09/d14 are exempt: their iterative fixpoint executes eagerly and
    // the returned frame's lineage legitimately repeats the pair-build.
    val exempt = Set("d09_cc_largestar", "d14_incremental_clusters")
    // intended multi-branch kernel use, not rewrite-duplicated chains:
    //   x06 — CMS depth D=3 hash rows on both counter and query side
    //   s25 — 3 DISTINCT membership tests (arrival rule on vec_id,
    //         tombstone rule on vec_id and on dst) × the partial+final
    //         aggregate pair = 6; each hash runs once per row per rule
    val allowTok = Map.empty[String, Int].withDefaultValue(4)
    val allowMd5 = Map("x06_countmin" -> 6, "s25_index_policy" -> 6)
      .withDefaultValue(4)
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !exempt(name) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val nMd5 = "md5\\(".r.findAllIn(plan).size
        val nTok = "tokens\\(".r.findAllIn(plan).size
        val nShin = "shingle".r.findAllIn(plan).size
        (name, nMd5, nTok, nShin)
    }.filter { case (name, m, t, sh) =>
      m > allowMd5(name) || t > allowTok(name) || sh > 6 }
    assert(bad.isEmpty,
      s"plans with repeated kernel chains (name, md5, tokens, shingles): $bad")
  }

  test("e12: one data-sized exchange (the user window), pruned scan, no joins of the corpus") {
    val plan = planOf(graft.operators.Relational14.e12(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // the events scan must not read the unused wide columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("value"),
      s"unused event columns must be pruned: $readSchema")
  }

  test("s15: lexical leg joins shingle-keyed with the exemplars broadcast; " +
      "legs cut by the bounded top-k aggregate, no cartesian product") {
    val plan = planOf(graft.operators.Relational14.s15(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"hybrid RRF must not plan a cartesian product:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      "the exemplar shingle side must broadcast into the equi-join")
    assert(plan.contains("ObjectHashAggregate"),
      "leg top-k must ride the bounded TopDocs buffer, not a corpus-sized window")
  }

  test("partition pruning: a source-partitioned layout scans only the matching directory") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-partprune")
    dir.toFile.deleteOnExit()
    Tables.load(spark, sf, "documents")
      .write.mode("overwrite").partitionBy("source").parquet(dir.toString)
    val sources = Tables.load(spark, sf, "documents")
      .select($"source").distinct().collect().map(_.getString(0)).sorted
    assert(sources.length > 1, "need multiple partitions to prove pruning")
    val one = sources.head
    val q = spark.read.parquet(dir.toString).filter($"source" === one)
    val plan = q.queryExecution.executedPlan.toString
    // the partition predicate must reach PartitionFilters (pruned at
    // listing time), NOT survive as a data filter
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("source")),
      s"source predicate must prune partitions:\n${plan.take(1500)}")
    // and the pruned scan reads strictly fewer files than the full scan
    def filesOf(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().map {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
        case _ => 0L
      }.sum
    val prunedFiles = filesOf(q)
    val allFiles = filesOf(spark.read.parquet(dir.toString))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned scan must touch fewer files: $prunedFiles vs $allFiles")
    // row-level truth unchanged
    assert(q.count() ==
      Tables.load(spark, sf, "documents").filter($"source" === one).count())
  }

  test("q57: both partial frames and the merge partial-aggregate before their shuffles") {
    val p = planOf(graft.operators.Relational13.q57(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("partial_"),
      "rollup partials must map-side combine before the key shuffle")
    assert(!finalPlan.contains("CartesianProduct"))
  }

  test("x08: the estimate path is one bounded-buffer aggregate, no window") {
    import graft.Tables
    val ev = Tables.load(spark, sf, "events")
    val p = planOf(graft.operators.Relational13.bottomKEstimates(ev))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("ObjectHashAggregate") ||
      finalPlan.contains("SortAggregate"))
    assert(finalPlan.contains("partial_"),
      "the BottomK map side must bound partitions at k pairs before the shuffle")
    assert(!finalPlan.contains("Window"),
      "the estimate face must not sort full partitions")
  }

  test("e11: the trending cut is a window-keyed aggregate, not a rank window") {
    val p = planOf(graft.operators.Relational13.e11(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("ObjectHashAggregate") ||
      finalPlan.contains("SortAggregate"))
    assert(finalPlan.contains("partial_"),
      "the TopDocs map side must bound partitions at k pairs per window")
    assert(!finalPlan.contains("Window("),
      "a viral window must never materialize a full ranking")
  }

  test("t33 aggregates tokens before the vocab join and windows per source") {
    val p = planOf(graft.operators.Relational10.t33(spark, sf))
    val finalPlan = p.split("== Initial Plan ==").head
    // the tercile window must partition by source, never a global sort
    val windows = finalPlan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("source")),
      s"tercile window must partition by source:\n$windows")
    assert(finalPlan.contains("HashAggregate"),
      "token explode must partial-aggregate before the vocab join")
  }

  test("engine-wide: no registered query plans a single-partition window") {
    // A Window with an empty partitionSpec forces the whole input
    // through ONE task — the e16 scale-killer the r12 verdict graded.
    // Every registered query's physical plan is swept; the only
    // windows allowed are the documented exceptions below, each
    // bounded by construction or covered by a registered sharded twin
    // (the t13/q52s convention).
    val whitelist = Map(
      "q52_token_deciles" -> ("global ntile BY DESIGN (exact decile " +
        "semantics); the registered scale twin q52s shards it"),
      "q52s_token_deciles_sharded" -> ("cumulative sum over the n_tok " +
        "HISTOGRAM (distinct per-doc token counts, ≤ max doc length) — " +
        "metadata-sized by construction, never data-sized"),
      "t12_seq_packing" -> ("global running token sum BY DESIGN (exact " +
        "greedy packing); the registered scale twin t13 shards it"),
      "x04e_heavy_hitters_exact" -> ("row_number over the event-TYPE " +
        "aggregate (≤ distinct event types) — enum-sized by construction"))
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hits =
          try PlanAudit.globalWindows(fn(spark, sf))
          catch { case e: Throwable => Seq(s"BUILD FAILED: $e") }
        if (hits.nonEmpty && !whitelist.contains(name))
          Some(s"$name: ${hits.mkString(" | ")}")
        else None
    }
    assert(offenders.isEmpty,
      s"unwhitelisted single-partition windows:\n${offenders.mkString("\n")}")
    // the whitelist must not rot: its entries still plan the window
    // they document (drop the entry when the query is fixed)
    whitelist.keys.foreach { name =>
      assert(PlanAudit.globalWindows(
        SparkEntry.queries(name)(spark, sf)).nonEmpty,
        s"$name is whitelisted but plans no global window — remove it")
    }
  }
}
