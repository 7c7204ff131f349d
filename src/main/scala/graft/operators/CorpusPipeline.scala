package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NativeKernels.word_tokens
import graft.sources.FileFormats

/** The capstone composition: a full corpus-curation run wiring the
  * individual operators into the pipeline a training-data team
  * actually executes, ending in a size-targeted parquet layout ready
  * for a pre-training data loader.
  *
  *   ingest → contamination drop (t08) → quality filter (t09)
  *   → exact dedup (d01) → near-dup dedup (d02→d06 labels, the
  *   materialized pipeline state) → PII scrub (t07)
  *   → sharded sequence packing (t13's window) → sized parquet write
  *
  * Composition model — and why it scales: each DETECTION stage
  * produces a verdict frame (doc ids to drop, or keep, or labels);
  * the corpus itself is reassembled ONCE at the end by semi/anti
  * joins against those verdicts. Verdict frames are orders of
  * magnitude smaller than the corpus (ids only), so at 100 TB they
  * broadcast or hash-join cheaply, and the full-width text rows flow
  * through exactly one scrub+pack+write pass. The near-dup stage
  * reuses [[Relational4.materializedLabels]] — detection and
  * clustering run once per (session, dir), exactly as a production
  * pipeline materializes them between stages.
  *
  * Per-stage counts in the returned stats frame are driver actions on
  * id-set frames (not full-corpus passes); a production run gets the
  * same numbers from the row counts of the stage outputs it
  * materializes anyway. */
object CorpusPipeline {

  private val PACK_BUDGET = 512L

  /** Cross-corpus decontamination verdict: incoming documents (odd
    * ids, the d11 convention) whose text near-duplicates the frozen
    * reference corpus at the d11 Jaccard threshold — t08 catches
    * exact n-gram overlap with the benchmark set, this catches the
    * paraphrase-grade duplication an eval-leak audit actually hunts.
    * Reads [[Relational7.materializedCrossPairs]], so the detection
    * cost is paid once per (session, dir) like every other pipeline
    * verdict; the verdict itself is an id set. */
  def crossContaminated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Relational7.materializedCrossPairs(s, dir)
      .select($"cand_id".as("doc_id")).distinct()
  }

  /** Run the full curation into `outDir`; returns the stats frame
    * (stage, rows_kept) in pipeline order. With `crossCorpus = true`
    * a near-dup decontamination stage (verdict:
    * [[crossContaminated]]) runs after the exact-overlap drop. With
    * `gopher = true` the t31 rule battery gates after the t09 quality
    * score (the published filter order: cheap heuristics, then rules,
    * then model); `classifierMinPpm` additionally gates on the t32
    * fixed-point classifier score — both verdicts are id sets like
    * every other stage. `classifierTopFrac` is the CALIBRATED form of
    * that gate: keep the top fraction of EACH SOURCE by t40's exact
    * per-source percentile instead of one raw score cut — a raw
    * threshold keeps different fractions of different sources (their
    * score distributions differ), which silently reweights the
    * mixture t14/t23 then measure. A percentile needs the per-source
    * rank, so unlike the per-row ppm gate this one is a verdict join
    * (the honest cost of calibration; the t40 frame is computed once
    * and its keep set is an id set like every other verdict). With
    * `spanCut = true` the d18 exact-substring cut (Lee et al. 2021
    * boilerplate removal) rewrites the survivors' text against the
    * materialized corpus-wide span table before the scrub — the one
    * stage that EDITS text rather than dropping rows (docs the cut
    * empties are dropped). */
  def curate(s: SparkSession, dir: String, outDir: String,
      shards: Long = 8L, maxRecordsPerFile: Long = 1000L,
      crossCorpus: Boolean = false, gopher: Boolean = false,
      classifierMinPpm: Option[Long] = None,
      classifierTopFrac: Option[Double] = None,
      sourceCap: Option[Int] = None,
      spanCut: Boolean = false): DataFrame = {
    import s.implicits._

    val docs = Tables.load(s, dir, "documents")

    // --- verdict frames (id sets; each states which docs survive) ---
    val contaminated = Curation.t08(s, dir).select($"doc_id")
    val qualityKeep = Curation.t09(s, dir).select($"doc_id")
    val exactKeep = Dedup.d01(s, dir).select($"keep_id".as("doc_id"))
    val nearDupDrop = Relational4.materializedLabels(s, dir)
      .filter($"id" =!= $"comp").select($"id".as("doc_id"))

    // --- one corpus assembly pass over the verdicts ---
    val s1a = docs.join(contaminated, Seq("doc_id"), "left_anti")
    val s1 = if (crossCorpus)
      s1a.join(crossContaminated(s, dir), Seq("doc_id"), "left_anti")
    else s1a
    // the new gates are PER-ROW predicates on rows already in hand
    // (shared Column expressions, proven ≡ t31/t32 in Relational10Spec)
    // — not verdict joins, which would re-scan and re-tokenize the
    // whole corpus for a frame these stages don't need
    val s2a = s1.join(qualityKeep, Seq("doc_id"), "left_semi")
    val s2b = if (gopher)
      s2a.filter(Relational10.gopherPass($"text") === 1L)
    else s2a
    val s2c = classifierMinPpm.fold(s2b)(minPpm =>
      s2b.filter(Relational10.classifierScorePpm($"text") >= minPpm))
    val s2 = classifierTopFrac.fold(s2c) { frac =>
      val cut = math.round((1.0 - frac) * 1000000).toLong
      val calibratedKeep = Relational12.t40(s, dir)
        .filter($"pct_ppm" >= cut).select($"doc_id")
      s2c.join(calibratedKeep, Seq("doc_id"), "left_semi")
    }
    val s3 = s2.join(exactKeep, Seq("doc_id"), "left_semi")
    val s4a = s3.join(nearDupDrop, Seq("doc_id"), "left_anti")
    // per-source cap (t42's bottom-k-by-hash) applied to the
    // SURVIVORS, so dropped docs never consume cap slots — the
    // per-domain bound a crawl pipeline applies last, after cleaning;
    // deterministic function of the surviving id set (retry-stable)
    val s4 = sourceCap.fold(s4a) { cap =>
      val bk = org.apache.spark.sql.functions.udaf(
        graft.functions.Sampling.BottomK(cap))
      val capKeep = s4a.select($"source", $"doc_id",
          graft.functions.TextOps.hash64(
            concat(lit("cap:"), $"doc_id".cast("string"))).as("h"))
        .groupBy($"source").agg(bk($"h", $"doc_id".cast("double")).as("kept"))
        .select(explode($"kept").as("r"))
        .select($"r.v".cast("long").as("doc_id"))
      s4a.join(capKeep, Seq("doc_id"), "left_semi")
    }

    // exact-substring span cut (d18's Lee-et-al boilerplate removal)
    // applied to the SURVIVORS against the materialized corpus-wide
    // span table — text is replaced by the cut token stream and docs
    // left empty by the cut are dropped (nothing left to train on)
    val s4c = if (spanCut)
      Relational15.applySpanCut(s, dir,
        s4.select($"doc_id", $"text", $"lang", $"source"))
    else s4

    // PII scrub applied to SURVIVORS only — the same chained-regex
    // expression t07 registers, as a per-row projection on the
    // filtered corpus (no join, no wasted regex over dropped docs)
    val clean = s4c.select($"doc_id", $"lang", $"source",
      Curation.scrubExpr($"text").as("clean_text"))

    // sharded packing (t13's running-sum window over the survivors)
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
    val packed = clean
      .withColumn("n_tokens", size(word_tokens($"clean_text")).cast("long"))
      .withColumn("shard", $"doc_id" % shards)
      .withColumn("cum_before", coalesce(
        sum($"n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select($"doc_id", $"lang", $"source", $"clean_text", $"n_tokens",
        $"shard", floor($"cum_before" / PACK_BUDGET).as("chunk_id"),
        ($"cum_before" % PACK_BUDGET).as("chunk_offset"))

    FileFormats.writeSizedParquet(packed, outDir, maxRecordsPerFile,
      sortCols = Seq("shard", "chunk_id", "chunk_offset"))

    val stats = Seq(
      ("00_ingest", docs.count()),
      ("01_decontaminated", s1a.count())) ++
      (if (crossCorpus) Seq(("01b_cross_decontam", s1.count())) else Nil) ++
      Seq(("02_quality", s2a.count())) ++
      (if (gopher) Seq(("02b_gopher_rules", s2b.count())) else Nil) ++
      (if (classifierMinPpm.isDefined)
        Seq(("02c_classifier", s2c.count())) else Nil) ++
      (if (classifierTopFrac.isDefined)
        Seq(("02d_calibrated", s2.count())) else Nil) ++
      Seq(
        ("03_exact_dedup", s3.count()),
        ("04_near_dedup", s4a.count())) ++
      (if (sourceCap.isDefined)
        Seq(("04b_source_cap", s4.count())) else Nil) ++
      (if (spanCut)
        Seq(("04c_span_cut", s4c.count())) else Nil) ++
      Seq(
        ("05_packed_written", s.read.parquet(outDir).count()))
    stats.toDF("stage", "rows_kept")
  }

  /** The soft-dedup variant of [[curate]]: instead of hard-dropping
    * near-dup non-representatives (stage 04), every exact-dedup
    * survivor keeps its d10 weight (1/cluster_size) and the corpus is
    * downsampled by t20's hash-deterministic acceptance — each
    * duplicate cluster contributes ~unit expected mass, but WHICH
    * member survives is the md5 draw, not always the minimum id
    * (preserving some intra-cluster diversity across training runs
    * keyed by different salts). Same verdict-frame composition: the
    * weight table is label-sized, the acceptance is a per-row
    * predicate, and the corpus is still assembled in one pass. */
  def curateWeighted(s: SparkSession, dir: String, outDir: String,
      shards: Long = 8L, maxRecordsPerFile: Long = 1000L): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")

    val contaminated = Curation.t08(s, dir).select($"doc_id")
    val qualityKeep = Curation.t09(s, dir).select($"doc_id")
    val exactKeep = Dedup.d01(s, dir).select($"keep_id".as("doc_id"))
    // weighted-sample keep set: Relational7.t20's acceptance verdict
    val sampleKeep = Relational7.t20(s, dir).select($"doc_id")

    val s1 = docs.join(contaminated, Seq("doc_id"), "left_anti")
    val s2 = s1.join(qualityKeep, Seq("doc_id"), "left_semi")
    val s3 = s2.join(exactKeep, Seq("doc_id"), "left_semi")
    val s4 = s3.join(sampleKeep, Seq("doc_id"), "left_semi")

    val clean = s4.select($"doc_id", $"lang", $"source",
      Curation.scrubExpr($"text").as("clean_text"))
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
    val packed = clean
      .withColumn("n_tokens", size(word_tokens($"clean_text")).cast("long"))
      .withColumn("shard", $"doc_id" % shards)
      .withColumn("cum_before", coalesce(
        sum($"n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select($"doc_id", $"lang", $"source", $"clean_text", $"n_tokens",
        $"shard", floor($"cum_before" / PACK_BUDGET).as("chunk_id"),
        ($"cum_before" % PACK_BUDGET).as("chunk_offset"))

    FileFormats.writeSizedParquet(packed, outDir, maxRecordsPerFile,
      sortCols = Seq("shard", "chunk_id", "chunk_offset"))

    val stats = Seq(
      ("00_ingest", docs.count()),
      ("01_decontaminated", s1.count()),
      ("02_quality", s2.count()),
      ("03_exact_dedup", s3.count()),
      ("04_weighted_sample", s4.count()),
      ("05_packed_written", s.read.parquet(outDir).count()))
    stats.toDF("stage", "rows_kept")
  }
}
