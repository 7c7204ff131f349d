package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import Model._
import Sinks._

/** Driver (SURVEY.md §3.3): one-shot and cron modes with per-pipeline
  * error isolation (T5 — the reference wraps the bulletin pipeline in
  * try/except and lets IOC errors propagate,
  * `src/Datalake2Anomali.py:442-449`; we isolate both but preserve the
  * exit policy). Each cycle is a fresh idempotent batch — the
  * reference re-pulls everything and relies on sink upsert (T1), and
  * so do we. A Structured-Streaming variant of the cadence lives in
  * `graft.streaming` (Trigger.ProcessingTime ≙ `schedule.every(h)`).
  */
object Runner {

  /** Source boundary: everything the pipelines read. Local/file
    * implementations in tests; HTTP implementations would construct
    * their DataFrames via the same contract. */
  trait Sources {
    def iocRows(spark: SparkSession): DataFrame          // S1 (decoded)
    def queryConfig(spark: SparkSession): DataFrame      // S6
    def advisories(spark: SparkSession): Dataset[Advisory] // S2
    def tipReportState(spark: SparkSession): DataFrame   // S3/S4
    def htmlFetcher: Bulletins.HtmlFetcher               // S5
  }

  /** Per-pipeline outcome plus (accepted, failed) sink-write counts —
    * a failed write is surfaced here and in the sink logs, never
    * silently dropped (ADVICE r1). */
  final case class RunReport(
      iocOk: Boolean, bulletinsOk: Boolean,
      iocError: Option[String] = None, bulletinError: Option[String] = None,
      iocWrites: (Long, Long) = (0L, 0L),
      bulletinWrites: (Long, Long) = (0L, 0L))

  /** One batch cycle (both pipelines). */
  def runOnce(spark: SparkSession, src: Sources, cfg: PipelineConfig,
      intelSink: IntelSink, tipSink: TipReportSink,
      nowUtc: java.time.Instant = java.time.Instant.now()): RunReport = {
    // pin timestamp parsing/formatting to UTC: cursor comparison and
    // modified_ts rendering are wrong in any other session time zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val ioc =
      try {
        val objs = IocTransform.run(
          src.iocRows(spark), src.queryConfig(spark), cfg)
        Right(writeIntel(objs, intelSink, IocTransform.metaJson(cfg, nowUtc),
          cfg.maxPayloadBytes))
      } catch { case e: Exception => Left(e.toString) }
    val bul =
      try {
        val state = src.tipReportState(spark)
        val cur = Bulletins.cursor(cfg, state, nowUtc)
        import org.apache.spark.sql.functions._
        // F4 BEFORE S5: filter on the cursor first so the per-row html
        // fetch only runs for advisories that survive it (the reference
        // narrows with updated_after before fetching html, :409-430)
        val fresh = src.advisories(spark).filter(
          to_timestamp(col("timestamp_updated")) >
            lit(java.sql.Timestamp.from(cur)))
        val enriched = Bulletins.enrich(fresh, src.htmlFetcher)
        Right(Bulletins.write(enriched.toDF(), state, tipSink))
      } catch { case e: Exception => Left(e.toString) }
    RunReport(ioc.isRight, bul.isRight, ioc.left.toOption, bul.left.toOption,
      ioc.getOrElse((0L, 0L)), bul.getOrElse((0L, 0L)))
  }

  /** T1 cron mode: run immediately, then every uploadFrequencyHours.
    * `cycles` bounds the loop for tests; pass -1 for forever. */
  def runCron(spark: SparkSession, src: Sources, cfg: PipelineConfig,
      intelSink: IntelSink, tipSink: TipReportSink, cycles: Int = -1,
      sleep: Long => Unit = Thread.sleep): Seq[RunReport] = {
    val out = Seq.newBuilder[RunReport]
    var i = 0
    while (cycles < 0 || i < cycles) {
      out += runOnce(spark, src, cfg, intelSink, tipSink)
      i += 1
      if (cycles < 0 || i < cycles) sleep(cfg.uploadFrequencyHours * 3600L * 1000L)
    }
    out.result()
  }
}
