package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.pipeline.{Bulletins, Sinks}

/** Streaming form of the bulletin pipeline (T1 continuous mode): a
  * file-source stream of advisory records, MERGE'd into the tipreport
  * sink per micro-batch via `foreachBatch` — the streaming idiom for
  * upsert sinks (the sink state join must re-run per batch, which
  * `foreachBatch` makes explicit). The reference's cron loop
  * (`src/core.py:41-48`) is the `Trigger.ProcessingTime` cadence;
  * `AvailableNow` is its one-shot mode, and the checkpoint directory
  * replaces its query-the-sink cursor (T2).
  */
object PipelineStream {

  val advisorySchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("title", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("timestamp_created", StringType),
    StructField("timestamp_updated", StringType),
    StructField("html", StringType)))

  /** Stream advisories from a directory of JSON files. */
  def advisoryStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(advisorySchema).json(dir)

  /** Run the MERGE per micro-batch. `sinkState` is re-read from the
    * provider each batch (upsert targets move under the stream). */
  def mergeStream(advisories: DataFrame, sinkState: () => DataFrame,
      sink: Sinks.TipReportSink, checkpointDir: String): StreamingQuery =
    advisories.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (ok, bad) = Bulletins.write(batch, sinkState(), sink)
        if (bad > 0)
          System.err.println(s"[graft.stream] batch writes: $ok ok, $bad failed")
      }
      .start()
}
