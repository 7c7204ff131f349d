package graft.pipeline

import org.apache.spark.sql.DataFrame
import Model._

/** Sink boundary (SURVEY.md §7.1: the connector boundary is a trait so
  * the pipeline core is testable without the network — the reference
  * couples straight to `requests`, which is why it ships zero tests).
  *
  * K1 semantics (`uploadPayload`, `src/Datalake2Anomali.py:104-138`):
  * one PATCH with `{meta, objects}`; on "Data exceeds maximum allowed
  * size" + >1 object, binary-split and retry each half. Our writer is
  * proactive instead of reactive: greedy size-bounded chunking up
  * front (so the happy path is one request per chunk, not a retry
  * cascade), with the reference's recursive halving kept as the
  * fallback for a sink whose limit is smaller than advertised. The
  * multiset of uploaded objects is preserved in all paths (the
  * property the reference's recursion maintains — SURVEY §5.3).
  *
  * Scale: upload runs per partition via `foreachPartition`, so
  * parallelism = partition count and no payload ever transits the
  * driver. Repartition the object rows to size the request fan-out.
  */
object Sinks {

  sealed trait UploadResult
  case object Accepted extends UploadResult
  case object TooLarge extends UploadResult
  final case class Failed(code: Int, body: String) extends UploadResult

  /** Intelligence-payload sink (K1). Implementations must be
    * serializable: they're constructed on the driver and used inside
    * executor tasks. */
  trait IntelSink extends Serializable {
    def upload(payloadJson: String): UploadResult
  }

  /** TipReport sink (K2/K3 + the S3 existence probe source). */
  trait TipReportSink extends Serializable {
    def post(tipReportJson: String): UploadResult
    def patch(tipId: Long, patchJson: String): UploadResult
  }

  /** Greedy size-bounded chunking: pack object JSONs into the fewest
    * payloads whose serialized size stays ≤ maxBytes (single oversized
    * objects get their own chunk — the sink decides their fate).
    * Sizes are UTF-8 bytes (what goes on the wire), not UTF-16 code
    * units — non-ASCII atom values would otherwise overshoot the
    * bound by up to 3x. */
  def chunk(objects: Seq[String], maxBytes: Long, overheadBytes: Long)
      : Seq[Seq[String]] = {
    val out = Seq.newBuilder[Seq[String]]
    var cur = Seq.newBuilder[String]
    var curBytes = overheadBytes
    var curN = 0
    objects.foreach { o =>
      val add = utf8Len(o) + 1L
      if (curN > 0 && curBytes + add > maxBytes) {
        out += cur.result(); cur = Seq.newBuilder[String]
        curBytes = overheadBytes; curN = 0
      }
      cur += o; curBytes += add; curN += 1
    }
    if (curN > 0) out += cur.result()
    out.result()
  }

  def utf8Len(s: String): Long =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong

  def payloadJson(metaJson: String, objects: Seq[String]): String =
    s"""{"meta":$metaJson,"objects":[${objects.mkString(",")}]}"""

  /** Upload one chunk with the reference's recursive-halving fallback
    * (`src/Datalake2Anomali.py:120-132`): TooLarge + >1 object →
    * split in half, retry both; TooLarge single object → Failed
    * (surfaced, not dropped silently). Returns per-request results. */
  def uploadWithSplit(sink: IntelSink, metaJson: String,
      objects: Seq[String]): Seq[UploadResult] =
    sink.upload(payloadJson(metaJson, objects)) match {
      case TooLarge if objects.length > 1 =>
        val (l, r) = objects.splitAt(objects.length / 2)
        uploadWithSplit(sink, metaJson, l) ++ uploadWithSplit(sink, metaJson, r)
      case other => Seq(other)
    }

  /** K1 writer: per partition, greedy-chunk then upload (with split
    * fallback). `objJson` must have a single string column. Returns
    * (accepted, failed) request counts — failures are counted via
    * accumulators and logged per partition, never silently dropped
    * (the reference logs and drops, `src/Datalake2Anomali.py:134-137`;
    * we additionally surface the counts to the caller). */
  def writeIntel(objJson: DataFrame, sink: IntelSink, metaJson: String,
      maxBytes: Long): (Long, Long) = {
    val sc = objJson.sparkSession.sparkContext
    val accepted = sc.longAccumulator("intel_accepted")
    val failed = sc.longAccumulator("intel_failed")
    val overhead = utf8Len(metaJson) + 32L
    objJson.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val objs = rows.map(_.getString(0)).toSeq
      if (objs.nonEmpty)
        chunk(objs, maxBytes, overhead).foreach { c =>
          uploadWithSplit(sink, metaJson, c).foreach {
            case Accepted => accepted.add(1)
            case other =>
              failed.add(1)
              System.err.println(s"[graft.sink] upload failed: $other")
          }
        }
    }
    (accepted.value, failed.value)
  }
}
