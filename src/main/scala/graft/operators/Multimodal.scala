package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column support (SURVEY.md §7.2): media as opaque BINARY
  * columns + typed metadata struct, with decode / feature-extract /
  * frame-sample as partition-wise batch transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB — but everything Spark-side is
  * real and tested: the binary column, the metadata StructType, the
  * `mapPartitions` batching shape (the Scala analog of `mapInPandas`:
  * one buffered iterator per partition, amortizing per-batch codec
  * init), partitioning, and the downstream feature schema.
  *
  * At 100 TB: media bytes stay columnar in parquet (never strings),
  * decode runs once per partition-batch with codec reuse, features are
  * small fixed-width columns so downstream shuffles never carry blobs
  * (`select` drops the binary column before any wide transform).
  */
object Multimodal {

  /** Decoded-media feature row (the "decode" output schema). */
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, frame0_hash: String)

  /** Media table: documents' text bytes standing in for blobs. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents").select(
      $"doc_id",
      $"text".cast("binary").as("content"),
      struct(
        octet_length($"text").cast("long").as("n_bytes"),
        when($"source".isin("src0", "src1", "src2"), "image/png")
          .when($"source".isin("src3", "src4"), "audio/wav")
          .otherwise("video/mp4").as("mime")).as("meta"))
  }

  /** STUB decode kernel — where libjpeg/ffmpeg would run. Deterministic
    * fake: dimensions derived from byte length, frame hash from the
    * first 256 bytes. Signature and batching are the real contract. */
  private def decodeBatch(rows: Iterator[(Long, Array[Byte], Long, String)])
      : Iterator[MediaFeatures] = {
    // per-partition "codec init" happens once, here (real codecs are
    // expensive to construct — this is why decode is mapPartitions, not
    // a per-row UDF)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map { case (id, bytes, nBytes, mime) =>
      val w = 16 + (nBytes % 625).toInt      // ??? real: decode header
      val h = 16 + (nBytes % 465).toInt      // ??? real: decode header
      val frames = if (mime.startsWith("video")) 1 + (nBytes / 256).toInt else 1
      val frame0 = bytes.take(256)
      md.reset()
      val hash = md.digest(frame0).map(b => f"$b%02x").mkString
      MediaFeatures(id, mime, nBytes, w, h, frames, hash)
    }
  }

  /** Decode → features, partition-wise. Blob column is dropped in the
    * output so downstream ops never shuffle bytes. */
  def decodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir)
      .select($"doc_id", $"content", $"meta.n_bytes", $"meta.mime")
      .as[(Long, Array[Byte], Long, String)]
    media.mapPartitions(decodeBatch).toDF()
  }

  /** Frame sampling: every video becomes up to 3 (doc_id, frame_idx,
    * frame_hash) rows — 256-byte "frames" hashed by the stub codec. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter($"meta.mime" === "video/mp4")
      .select($"doc_id", $"meta.n_bytes".as("n_bytes"),
        explode(sequence(lit(0),
          least(floor($"meta.n_bytes" / 256).cast("int"), lit(2)))).as("frame_idx"))
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Oracle-checkable slice of the pipeline: metadata + stub features
    * expressed as pure column ops (same arithmetic as decodeBatch). */
  def m01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).select(
      $"doc_id",
      $"meta.mime".as("mime"),
      $"meta.n_bytes".as("n_bytes"),
      (lit(16) + ($"meta.n_bytes" % 625)).cast("long").as("width"),
      (lit(16) + ($"meta.n_bytes" % 465)).cast("long").as("height"))
      .orderBy($"doc_id")
  }

  /** Frame-sample plan as an oracle query (video rows only). */
  def m02(s: SparkSession, dir: String): DataFrame = frameSample(s, dir)

  /** Exact blob dedup by content hash — the media face of d01: md5
    * over the BINARY column (no text normalization; bytes are bytes),
    * keep the lowest doc_id per digest. At 100 TB the hash is computed
    * where the blob lives and only the 16-byte digest shuffles. */
  def m03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select($"doc_id", md5($"content").as("digest"))
      .groupBy($"digest")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies")
      .orderBy($"keep_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_meta" -> (m01 _),
    "m02_frame_sample" -> (m02 _),
    "m03_blob_dedup" -> (m03 _),
  )

  val oracles: Map[String, String] = Map(
    "m01_media_meta" ->
      """SELECT doc_id,
        | CASE WHEN source IN ('src0','src1','src2') THEN 'image/png'
        |      WHEN source IN ('src3','src4') THEN 'audio/wav'
        |      ELSE 'video/mp4' END AS mime,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(16 + octet_length(encode(text)) % 625 AS BIGINT) AS width,
        | CAST(16 + octet_length(encode(text)) % 465 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_frame_sample" ->
      """SELECT doc_id, CAST(u AS BIGINT) AS frame_idx
        |FROM (SELECT doc_id,
        |   unnest(range(0, least(CAST(floor(octet_length(encode(text)) / 256) AS BIGINT), 2) + 1)) AS u
        |  FROM documents
        |  WHERE source NOT IN ('src0','src1','src2','src3','src4'))
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "m03_blob_dedup" ->
      // DuckDB's md5 takes VARCHAR (hashing its UTF-8 bytes), which is
      // byte-identical to Spark's md5 over the UTF-8-cast binary column
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM (SELECT doc_id, md5(text) AS digest FROM documents)
        |GROUP BY digest ORDER BY keep_id""".stripMargin,
  )
}
