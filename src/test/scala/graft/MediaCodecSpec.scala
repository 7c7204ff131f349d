package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.functions.MediaCodec
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The media codec must be a REAL header parser, not arithmetic that
  * happens to agree with the writers: PNG and JPEG parsing are
  * cross-checked against `javax.imageio` on fully-valid files the
  * JDK encoder produced, and the writers round-trip through the
  * parser including payload location. */
class MediaCodecSpec extends AnyFunSuite {

  private val payload = (0 until 1000).map(i => (i % 251).toByte).toArray

  test("PNG writer round-trips through the IHDR parser") {
    val d = MediaCodec.decode(MediaCodec.writePng(123, 77, payload))
    assert((d.kind, d.width, d.height, d.frames) == (("png", 123, 77, 1)))
    val blob = MediaCodec.writePng(123, 77, payload)
    assert(blob.slice(d.payloadOff, d.payloadOff + d.payloadLen)
      .sameElements(payload))
  }

  test("WAV writer round-trips through the fmt parser") {
    val d = MediaCodec.decode(MediaCodec.writeWav(16000, 2, payload))
    assert((d.kind, d.width, d.height, d.frames) == (("wav", 16000, 2, 1)))
    val blob = MediaCodec.writeWav(16000, 2, payload)
    assert(blob.slice(d.payloadOff, d.payloadOff + d.payloadLen)
      .sameElements(payload))
  }

  test("MP4 writer round-trips through the box-tree parser") {
    val d = MediaCodec.decode(MediaCodec.writeMp4(640, 360, 42, payload))
    assert((d.kind, d.width, d.height, d.frames) == (("mp4", 640, 360, 42)))
    val blob = MediaCodec.writeMp4(640, 360, 42, payload)
    assert(blob.slice(d.payloadOff, d.payloadOff + d.payloadLen)
      .sameElements(payload))
  }

  test("PNG parser agrees with javax.imageio on a real encoder's file") {
    val img = new BufferedImage(31, 17, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 31; y <- 0 until 17) img.setRGB(x, y, x * 31 + y)
    val baos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", baos))
    val bytes = baos.toByteArray
    val d = MediaCodec.decode(bytes)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert((d.kind, d.width, d.height) == (("png", back.getWidth, back.getHeight)))
    assert((d.width, d.height) == ((31, 17)))
  }

  test("JPEG parser agrees with javax.imageio on a real encoder's file") {
    val img = new BufferedImage(40, 25, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40; y <- 0 until 25) img.setRGB(x, y, (x * y) << 8)
    val baos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    val d = MediaCodec.decode(bytes)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert((d.kind, d.width, d.height) == (("jpeg", back.getWidth, back.getHeight)))
    assert((d.width, d.height) == ((40, 25)))
  }

  test("unrecognized containers are rejected loudly") {
    intercept[IllegalArgumentException] {
      MediaCodec.decode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decode(Array.empty[Byte])
    }
  }

  test("truncated recognized containers throw IllegalArgumentException, never index errors") {
    // the decode() contract: a reject-routing caller catches
    // IllegalArgumentException; an index error would crash the task
    val full = Seq(
      MediaCodec.writePng(123, 77, payload),
      MediaCodec.writeWav(16000, 2, payload),
      MediaCodec.writeMp4(123, 77, 5, payload))
    for (blob <- full; cut <- Seq(9, 13, 17, 21, 30, blob.length / 2, blob.length - 3)) {
      val t = blob.take(cut)
      // either the documented reject (IllegalArgumentException), or —
      // when only trailer bytes are cut — a decode whose payload is
      // still fully in-bounds; anything else (index errors) fails
      try {
        val d = MediaCodec.decode(t)
        assert(d.payloadOff + d.payloadLen <= t.length,
          s"decode accepted a container whose payload is cut off ($cut/${blob.length})")
      } catch {
        case _: IllegalArgumentException => ()
      }
    }
    // a truncated JPEG (SOF segment cut off) is loud too
    val jpegCut = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 0x08, 0x00).map(_.toByte)
    intercept[IllegalArgumentException] { MediaCodec.decode(jpegCut) }
  }

  test("JPEG fill bytes and standalone TEM markers are spec-legal and tolerated") {
    // SOI, two 0xFF fill bytes + TEM, SOF0 (h=7, w=9, 1 component),
    // SOS (minimal), entropy byte, EOI
    val bytes = Array[Int](
      0xff, 0xd8,                   // SOI
      0xff, 0xff, 0xff, 0x01,       // fill, fill, TEM
      0xff, 0xc0, 0x00, 0x0b,       // SOF0, len 11
      0x08, 0x00, 0x07, 0x00, 0x09, // precision 8, h=7, w=9
      0x01, 0x01, 0x11, 0x00,       // 1 component
      0xff, 0xda, 0x00, 0x02,       // SOS, len 2 (no body)
      0x55,                         // entropy data
      0xff, 0xd9                    // EOI
    ).map(_.toByte)
    val d = MediaCodec.decode(bytes)
    assert((d.kind, d.width, d.height) == (("jpeg", 9, 7)))
  }

  test("MP4 version-1 tkhd/mvhd parse at the widened 64-bit offsets") {
    def be32(v: Int): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8) ++ typ.getBytes("US-ASCII") ++ body
    // v1 mvhd: ver 1 + flags, ctime/mtime 8 each, timescale 4,
    // duration 8 (low word = 42), rest zero-padded
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill(16)(0.toByte) ++ be32(1) ++ be32(0) ++ be32(42) ++
      Array.fill(80)(0.toByte))
    // v1 tkhd: ver 1 + flags, ctime/mtime 8 each, trackid 4,
    // reserved 4, duration 8 → w/h at body offsets 88/92 (16.16)
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill(84)(0.toByte) ++ be32(640 << 16) ++ be32(480 << 16))
    val blob = box("ftyp", "isom0000".getBytes("US-ASCII")) ++
      box("moov", box("trak", tkhd) ++ mvhd) ++
      box("mdat", payload)
    val d = MediaCodec.decode(blob)
    assert((d.kind, d.width, d.height, d.frames) == (("mp4", 640, 480, 42)))
    assert(blob.slice(d.payloadOff, d.payloadOff + d.payloadLen)
      .sameElements(payload))
  }
}

/** Spark-side: the decode pipeline reads header facts out of blob
  * bytes, and metadata queries never build blobs at all. */
class MultimodalSpec extends SparkSpec {

  test("decodeFeatures parses header dims that match the encode arithmetic") {
    val s = spark
    import s.implicits._
    val feats = Multimodal.decodeFeatures(s, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.load(s, sf, "documents")
      .select($"doc_id", octet_length($"text").cast("long").as("n"),
        $"source").collect()
    assert(docs.nonEmpty && feats.size == docs.length)
    docs.foreach { r =>
      val (id, n, src) = (r.getLong(0), r.getLong(1), r.getString(2))
      val f = feats(id)
      val (w, h, fr) =
        (f.getAs[Int]("width"), f.getAs[Int]("height"), f.getAs[Int]("n_frames"))
      if (Set("src3", "src4")(src))
        assert((w, h, fr) == ((8000 + (n % 3) * 4000, 1 + n % 2, 1)), s"wav $id")
      else if (Set("src0", "src1", "src2")(src))
        assert((w, h, fr) == ((16 + n % 625, 16 + n % 465, 1)), s"png $id")
      else
        assert((w, h, fr) == ((16 + n % 625, 16 + n % 465, 1 + n / 256)), s"mp4 $id")
      assert(f.getAs[String]("frame0_hash").length == 32)
    }
  }

  test("frame0_hash is the md5 of the first 256 PAYLOAD bytes") {
    val s = spark
    import s.implicits._
    val feats = Multimodal.decodeFeatures(s, sf)
      .select($"doc_id", $"frame0_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    Tables.load(s, sf, "documents").select($"doc_id", $"text")
      .collect().take(50).foreach { r =>
        val payload = r.getString(1).getBytes("UTF-8")
        md.reset()
        val expect = md.digest(payload.take(256)).map(b => f"$b%02x").mkString
        assert(feats(r.getLong(0)) == expect, s"doc ${r.getLong(0)}")
      }
  }

  test("m02 frame sampling is metadata-only: no mapPartitions in the plan") {
    val plan = Multimodal.m02(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"),
      s"frame sampling must not touch blob bytes:\n$plan")
  }
  test("aHash survives container re-encoding: the same payload hashes " +
      "identically out of PNG, WAV, and MP4 wrappers") {
    import graft.functions.MediaCodec
    val payload = ("the quick brown fox jumps over the lazy dog " * 8)
      .getBytes("UTF-8")
    val containers = Seq(
      MediaCodec.writePng(64, 48, payload),
      MediaCodec.writeWav(8000, 1, payload),
      MediaCodec.writeMp4(64, 48, 2, payload))
    val hashes = containers.map { bytes =>
      val d = MediaCodec.decode(bytes)
      Multimodal.aHash(bytes, d.payloadOff, d.payloadLen)
    }
    assert(hashes.distinct.length == 1,
      s"re-encoded payload must hash identically: $hashes")
    assert(hashes.head != 0L)
    // md5 of the CONTAINERS differs — exactly the gap m04 closes vs m03
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = containers.map(b => md.digest(b).toSeq)
    assert(digests.distinct.length == 3)
    // a small payload edit moves the hash only slightly (perceptual):
    val edited = payload.clone(); edited(10) = 'X'.toByte
    val pe = MediaCodec.writePng(64, 48, edited)
    val de = MediaCodec.decode(pe)
    val he = Multimodal.aHash(pe, de.payloadOff, de.payloadLen)
    assert(java.lang.Long.bitCount(hashes.head ^ he) <= 13,
      "a one-byte edit must stay within the near-dup radius")
  }

  test("m06: banded frame near-dup equals the all-pairs truth over frame hashes") {
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    // brute force: per-video sampled frame slices of the raw text
    // bytes (the payload), hashed with the same kernel, all pairs
    val vids = graft.Tables.load(spark, sf, "documents")
      .filter("source NOT IN ('src0','src1','src2','src3','src4')")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val frames = vids.flatMap { case (id, b) =>
      val nFrames = math.min(b.length / 256, 2) + 1
      (0 until nFrames).map { f =>
        val len = math.min(256, b.length - f * 256)
        (id, Multimodal.aHash(b, f * 256, len))
      }
    }
    val want = (for {
      i <- frames.indices; j <- frames.indices
      if frames(i)._1 < frames(j)._1
      h = java.lang.Long.bitCount(frames(i)._2 ^ frames(j)._2)
      if h <= 13
    } yield (frames(i)._1, frames(j)._1, h))
      .groupBy(p => (p._1, p._2)).toSeq
      .map { case ((a, b), ps) =>
        (a, b, ps.length.toLong, ps.map(_._3).min.toLong) }
      .sortBy(p => (p._1, p._2))
    val got = Multimodal.m06(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty, "m06 must be non-vacuous at sf0.001")
    assert(got == want)
  }
}
