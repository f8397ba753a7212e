package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import SparkSpec.spark.implicits._

class MultimodalSpec extends SparkSpec {

  private val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")

  /** A real in-memory PNG of the given geometry (JDK encoder). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("envelope carries binary payload + typed metadata") {
    val env = Multimodal.envelope(docs)
    val schema = env.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val (mime, n) = env.selectExpr("meta.mime", "meta.n_bytes")
      .as[(String, Long)].head()
    assert(mime === "text/plain" && n === 11L)
  }

  test("decodeImages reads a real PNG's true geometry via javax.imageio") {
    implicit val s = spark
    val png = pngBytes(7, 5)
    val env = Seq((10L, png)).toDF("doc_id", "content")
      .select($"doc_id", $"content",
        struct(lit("image/png").as("mime"),
          length($"content").cast("long").as("n_bytes")).as("meta"))
    val d = Multimodal.decodeImages(env).head()
    assert(d.status === "decoded")
    assert(d.width === 7 && d.height === 5)
    assert(d.n_bytes === png.length.toLong)
  }

  test("corrupt or non-image bytes quarantine as rows, never fail the task") {
    implicit val s = spark
    // row 1: PNG magic followed by garbage (a truncated/corrupt file);
    // row 2: plain text bytes (no reader claims them)
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 42, 42, 42)
    val env = Seq((20L, corrupt), (21L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "content")
      .select($"doc_id", $"content",
        struct(lit("application/octet-stream").as("mime"),
          length($"content").cast("long").as("n_bytes")).as("meta"))
    val rows = Multimodal.decodeImages(env).collect().map(d => d.doc_id -> d).toMap
    assert(rows.size === 2)
    rows.values.foreach { d =>
      assert(d.status === "undecodable" && d.width === 0 && d.height === 0)
    }
  }

  test("decodeImages decodes real images and quarantines text in one mixed batch") {
    implicit val s = spark
    val env = Multimodal.envelope(docs)
      .unionByName(Seq((30L, pngBytes(3, 9))).toDF("doc_id", "content")
        .select($"doc_id", $"content",
          struct(lit("image/png").as("mime"),
            length($"content").cast("long").as("n_bytes")).as("meta")))
    val byId = Multimodal.decodeImages(env).collect().map(d => d.doc_id -> d).toMap
    assert(byId(30L).status === "decoded" && byId(30L).width === 3 && byId(30L).height === 9)
    assert(byId(1L).status === "undecodable" && byId(2L).status === "undecodable")
  }

  test("decodeStub derives deterministic geometry from payload size (video stand-in)") {
    implicit val s = spark
    val frames = Multimodal.decodeStub(Multimodal.envelope(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(frames(1L).n_bytes === 11L)
    assert(frames(1L).width === 12 && frames(1L).height === 12 && frames(1L).n_frames === 12)
    assert(frames(2L).width === 2 && frames(2L).n_frames === 2)
  }

  /** A real in-memory WAV: `frames` frames of silent 16-bit mono PCM
    * at the given rate (JDK encoder). */
  private def wavBytes(sampleRate: Float, frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio reads a real WAV's declared format via javax.sound.sampled") {
    implicit val s = spark
    val wav = wavBytes(sampleRate = 8000f, frames = 1600)
    val env = Seq((40L, wav, "audio/wav"), (1L, "not audio at all".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).cast("long").as("n_bytes")).as("meta"))
    val byId = Multimodal.decodeAudio(env).collect().map(d => d.doc_id -> d).toMap
    assert(byId(40L).status === "decoded")
    assert(byId(40L).sample_rate === 8000.0 && byId(40L).channels === 1)
    assert(byId(40L).frames === 1600L)
    assert(byId(40L).encoding === "PCM_SIGNED")
    // non-audio bytes quarantine as a row, never a task failure
    assert(byId(1L).status === "undecodable" && byId(1L).channels === 0)
  }

  test("mediaSummary joins real decode output with content hashes") {
    implicit val s = spark
    val row = Multimodal.mediaSummary(docs).where($"doc_id" === 1L)
      .select("content_md5", "n_bytes", "status", "width", "height")
      .as[(String, Long, String, Int, Int)].head()
    // md5("hello world")
    assert(row._1 === "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(row._2 === 11L)
    assert(row._3 === "undecodable" && row._4 === 0 && row._5 === 0)
  }
}
