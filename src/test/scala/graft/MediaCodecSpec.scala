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
}
