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

  // ---- hand-built container bytes for the video header parser ----------

  /** ISO-BMFF box: 4-byte BE size + fourcc + payload. */
  private def mp4Box(name: String, payload: Array[Byte]*): Array[Byte] = {
    val content = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + content.length)
    bb.putInt(8 + content.length).put(name.getBytes("ISO-8859-1")).put(content)
    bb.array
  }
  private def be(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(i).array
  private def zeros(n: Int) = new Array[Byte](n)

  /** Minimal-but-valid MP4: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr vide,
    * minf(stbl(stsd avc1, stts))))). timescale 600, duration 1200 (2 s),
    * 320x240, 48 declared samples. */
  private def mp4Bytes(): Array[Byte] = {
    val mvhd = mp4Box("mvhd", zeros(4) /*v0+flags*/, zeros(8) /*ctime,mtime*/,
      be(600) /*timescale*/, be(1200) /*duration*/, zeros(80))
    val tkhd = mp4Box("tkhd", zeros(4), zeros(20) /*ctime..duration*/,
      zeros(8 + 2 + 2 + 2 + 2 + 36) /*reserved..matrix*/,
      be(320 << 16), be(240 << 16))
    val hdlr = mp4Box("hdlr", zeros(4), zeros(4), "vide".getBytes("ISO-8859-1"), zeros(12))
    val avc1 = mp4Box("avc1", zeros(16)) // entry body truncated: only the fourcc is read
    val stsd = mp4Box("stsd", zeros(4), be(1), avc1)
    val stts = mp4Box("stts", zeros(4), be(2), be(40), be(25), be(8), be(25)) // 40+8 samples
    val stbl = mp4Box("stbl", stsd, stts)
    val minf = mp4Box("minf", stbl)
    val mdia = mp4Box("mdia", hdlr, minf)
    val trak = mp4Box("trak", tkhd, mdia)
    val ftyp = mp4Box("ftyp", "isom".getBytes("ISO-8859-1"), be(512))
    ftyp ++ mp4Box("moov", mvhd, trak)
  }

  /** RIFF chunk: fourcc + LE size + payload (even-sized here). */
  private def riffChunk(id: String, payload: Array[Byte]*): Array[Byte] = {
    val content = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + content.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("ISO-8859-1")).putInt(content.length).put(content)
    bb.array
  }
  private def le(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
    .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array

  /** Minimal AVI: RIFF(AVI  LIST(hdrl avih LIST(strl strh vids/XVID))).
    * 40000 us/frame x 100 frames = 4 s, 640x480. */
  private def aviBytes(): Array[Byte] = {
    val avih = riffChunk("avih", le(40000), le(0), le(0), le(0),
      le(100) /*totalFrames*/, le(0), le(1) /*streams*/, le(0),
      le(640), le(480), zeros(16))
    val strh = riffChunk("strh", "vids".getBytes("ISO-8859-1"),
      "XVID".getBytes("ISO-8859-1"), zeros(48))
    val strl = riffChunk("LIST", "strl".getBytes("ISO-8859-1"), strh)
    val hdrl = riffChunk("LIST", "hdrl".getBytes("ISO-8859-1"), avih, strl)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl
    "RIFF".getBytes("ISO-8859-1") ++ le(body.length) ++ body
  }

  test("decodeVideo parses real MP4 and AVI headers; text and truncated bytes quarantine") {
    implicit val s = spark
    val mp4 = mp4Bytes()
    val avi = aviBytes()
    val env = Seq(
      (50L, mp4, "video/mp4"),
      (51L, avi, "video/x-msvideo"),
      (52L, mp4.take(40), "video/mp4"), // truncated mid-moov
      (1L, "definitely not a movie".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "content", "mime")
      .select(col("doc_id"), col("content"),
        struct(col("mime"), length(col("content")).cast("long").as("n_bytes")).as("meta"))
    val byId = Multimodal.decodeVideo(env).collect().map(d => d.doc_id -> d).toMap
    assert(byId(50L).status === "decoded" && byId(50L).container === "mp4")
    assert(byId(50L).width === 320 && byId(50L).height === 240)
    assert(byId(50L).duration_s === 2.0 && byId(50L).n_frames === 48L)
    assert(byId(50L).codec === "avc1")
    assert(byId(51L).status === "decoded" && byId(51L).container === "avi")
    assert(byId(51L).width === 640 && byId(51L).height === 480)
    assert(byId(51L).duration_s === 4.0 && byId(51L).n_frames === 100L)
    assert(byId(51L).codec === "XVID")
    // malformed/foreign bytes: one quarantine row each, no task failure
    assert(byId(52L).status === "undecodable")
    assert(byId(1L).status === "undecodable" && byId(1L).width === 0)
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

  /** Envelope rows from raw (doc_id, bytes) pairs. */
  private def imgEnv(rows: (Long, Array[Byte])*) =
    rows.toDF("doc_id", "content")
      .select($"doc_id", $"content",
        struct(lit("image/png").as("mime"),
          length($"content").cast("long").as("n_bytes")).as("meta"))

  /** A patterned PNG with an optional rectangular patch painted over —
    * the "slightly edited copy" of a perceptual-dup test. */
  private def patternPng(w: Int, h: Int, patch: Option[(Int, Int, Int, Int, Int)] = None): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach { y =>
      val v = if ((x / 8 + y / 8) % 2 == 0) 0xf0f0f0 else 0x101010 // checkerboard
      img.setRGB(x, y, v)
    })
    patch.foreach { case (px, py, pw, ph, rgb) =>
      (px until (px + pw)).foreach(x => (py until (py + ph)).foreach(y => img.setRGB(x, y, rgb)))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imagePhash: identical pixels hash identically across re-encodes; edits move few bits; text quarantines") {
    implicit val s = spark
    val base = patternPng(64, 64)
    // same pixels, re-encoded independently (fresh PNG bytes)
    val copy = patternPng(64, 64)
    // pixels must be identical (the byte encodings may legitimately differ);
    // the hash-equality assertion below is what pins the perceptual claim
    locally {
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
      val ci = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(copy))
      assert((0 until 64).forall(x => (0 until 64).forall(y => bi.getRGB(x, y) == ci.getRGB(x, y))))
    }
    // small edit: one 6x6 patch repainted
    val edited = patternPng(64, 64, Some((30, 30, 6, 6, 0x808080)))
    // genuinely different image: inverted checkerboard phase + gradient
    val other = {
      val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 64).foreach(x => (0 until 64).foreach(y => img.setRGB(x, y, (x * 4 << 16) | (y * 4 << 8))))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ph = Multimodal.imagePhash(imgEnv(
        1L -> base, 2L -> copy, 3L -> edited, 4L -> other,
        9L -> "not an image".getBytes("UTF-8")))
      .collect().map(p => p.doc_id -> p).toMap
    // identical pixels -> identical hashes, regardless of byte encoding
    assert(ph(1L).status === "decoded")
    assert(ph(1L).ahash === ph(2L).ahash && ph(1L).dhash === ph(2L).dhash)
    // a small patch moves at most a few dHash bits; a different image moves many
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(ph(1L).dhash, ph(3L).dhash) <= 3,
      s"edit moved ${ham(ph(1L).dhash, ph(3L).dhash)} bits")
    assert(ham(ph(1L).dhash, ph(4L).dhash) > 10,
      s"different image only ${ham(ph(1L).dhash, ph(4L).dhash)} bits away")
    // text payloads quarantine with zero hashes (and never pair below)
    assert(ph(9L).status === "undecodable" && ph(9L).ahash === 0L && ph(9L).dhash === 0L)
  }

  test("imageDupPairs == brute-force hamming over decoded hashes; quarantined rows never pair") {
    implicit val s = spark
    val imgs: Seq[(Long, Array[Byte])] = Seq(
      1L -> patternPng(64, 64),
      2L -> patternPng(64, 64), // exact perceptual dup of 1
      3L -> patternPng(64, 64, Some((30, 30, 6, 6, 0x808080))), // near dup
      4L -> patternPng(48, 48), // same pattern at another size: phash is scale-invariant by design
      9L -> "not an image".getBytes("UTF-8"))
    val phashes = Multimodal.imagePhash(imgEnv(imgs: _*)).toDF()
    val got = Multimodal.imageDupPairs(phashes, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // brute-force reference over the decoded rows
    val hs = phashes.filter($"status" === "decoded")
      .select("doc_id", "dhash").as[(Long, Long)].collect()
    val expected = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === expected)
    // the dup structure we engineered is actually present
    assert(got.contains((1L, 2L, 0)))
    assert(got.exists(p => p._1 == 1L && p._2 == 3L))
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L))
    // SQL surface: graft_hamming_pairs over the stored-signature shape
    graft.plans.GraftExtensions.install(spark)
    phashes.filter($"status" === "decoded")
      .selectExpr("doc_id", "dhash AS sig").createOrReplaceTempView("phash_sigs")
    val viaSql = spark.sql("SELECT * FROM graft_hamming_pairs('phash_sigs', 64, 3)")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaSql === got)
    assert(spark.sql("SELECT * FROM graft_hamming_pairs('phash_sigs')")
      .as[(Long, Long, Int)].collect().toSet === got) // default arity = (64, 3)
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
