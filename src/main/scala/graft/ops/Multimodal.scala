package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads travel as opaque `binary` columns next to a typed metadata
  * struct, and per-item decode/feature work runs partition-parallel over
  * the binary bytes.
  *
  * Image and audio decode are REAL: [[decodeImages]] reads
  * PNG/JPEG/GIF/BMP geometry with `javax.imageio`, [[decodeAudio]]
  * reads WAV/AIFF/AU container metadata with `javax.sound.sampled`
  * (both ship with the JDK — no external dependency), inside the
  * mapPartitions batch contract. Bytes that no
  * installed reader accepts (text payloads, corrupt files, truncated
  * streams) become QUARANTINE rows (`status = 'undecodable'`), never
  * task failures — at 100 TB a single bad file must not kill a stage.
  * [[decodeStub]] remains only for media the JDK has no codec for
  * (video frame sampling): a clearly-marked deterministic fake whose
  * envelope/batch plumbing is identical, so swapping in a real codec
  * changes one function body.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); feature hashes are codegen'd column exprs; nothing ever
  * collects media bytes to the driver.
  */
object Multimodal {

  /** The multimodal envelope: payload + typed metadata. */
  final case class MediaItem(doc_id: Long, content: Array[Byte], mime: String)

  /** Real decode result: geometry when an ImageIO reader accepted the
    * bytes, a quarantine row (`status = "undecodable"`, zero geometry)
    * when none did. */
  final case class DecodedImage(doc_id: Long, n_bytes: Long, status: String, width: Int, height: Int)

  /** Fake-decoded media descriptor (see [[decodeStub]]). */
  final case class MediaFrames(doc_id: Long, n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** Wrap a documents table into the envelope: the utf-8 bytes of
    * `text` stand in for real media bytes (fixtures carry no images);
    * schema and downstream plumbing are what a binary media column
    * would use unchanged.
    */
  def envelope(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("text/plain").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")
      ).as("meta"))

  /** REAL image decode over the envelope, `javax.imageio`: one
    * iterator per partition, bytes never leave the executor, no
    * shuffle. Every input row yields exactly one output row —
    * undecodable payloads (no registered reader, corrupt or truncated
    * bytes) are quarantined as `status = 'undecodable'` with zero
    * geometry instead of failing the task, so a poisoned file in a
    * 100 TB corpus costs one row, not a stage retry loop. The
    * in-memory `ByteArrayInputStream` + `setUseCache(false)` keep
    * ImageIO off executor-local disk (its default scratch cache).
    */
  def decodeImages(env: DataFrame)(implicit spark: SparkSession): Dataset[DecodedImage] = {
    import spark.implicits._
    env.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaItem]
      .mapPartitions { items =>
        javax.imageio.ImageIO.setUseCache(false)
        items.map { it =>
          val n = it.content.length.toLong
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(it.content))
            if (img == null) DecodedImage(it.doc_id, n, "undecodable", 0, 0)
            else DecodedImage(it.doc_id, n, "decoded", img.getWidth, img.getHeight)
          } catch {
            case scala.util.control.NonFatal(_) =>
              DecodedImage(it.doc_id, n, "undecodable", 0, 0)
          }
        }
      }
  }

  /** Real decode result for audio payloads: container-level metadata
    * when a registered reader accepted the bytes, a quarantine row
    * otherwise. `frames` is the frame count the container declares
    * (-1 in the header maps to -1 here — streams of unknown length
    * are a real shape, not an error). */
  final case class DecodedAudio(doc_id: Long, n_bytes: Long, status: String,
      encoding: String, sample_rate: Double, channels: Int, frames: Long)

  /** REAL audio decode over the envelope, `javax.sound.sampled`
    * (ships with the JDK: WAV/AIFF/AU readers): encoding, sample
    * rate, channel count, and declared frame length per payload. Same
    * contract as [[decodeImages]] — one output row per input row,
    * bytes never leave the executor, undecodable payloads quarantine
    * (`status = 'undecodable'`) instead of failing the task. Header
    * parsing only: the PCM body is not decompressed, so cost per item
    * is O(header), not O(bytes). With this, [[decodeStub]] stands in
    * for video alone.
    */
  def decodeAudio(env: DataFrame)(implicit spark: SparkSession): Dataset[DecodedAudio] = {
    import spark.implicits._
    env.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          val n = it.content.length.toLong
          try {
            val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(it.content))
            val f = aff.getFormat
            DecodedAudio(it.doc_id, n, "decoded", f.getEncoding.toString,
              f.getSampleRate.toDouble, f.getChannels, aff.getFrameLength.toLong)
          } catch {
            case scala.util.control.NonFatal(_) =>
              DecodedAudio(it.doc_id, n, "undecodable", "", 0.0, 0, 0L)
          }
        }
      }
  }

  /** STUB decoder — deterministic fake standing in ONLY for media the
    * JDK ships no codec for (video frame sampling; images go through
    * the real [[decodeImages]]). Geometry is a pure function of the
    * payload size so any engine can reproduce it:
    *   width = 1 + n_bytes % 640, height = 1 + n_bytes % 480,
    *   n_frames = 1 + n_bytes % 16.
    * The mapPartitions shape (iterator-in/iterator-out per partition,
    * bytes never leaving the executor) is the real decode contract.
    */
  def decodeStub(env: DataFrame)(implicit spark: SparkSession): Dataset[MediaFrames] = {
    import spark.implicits._
    env.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          val n = it.content.length.toLong
          MediaFrames(it.doc_id, n,
            width = 1 + (n % 640).toInt,
            height = 1 + (n % 480).toInt,
            n_frames = 1 + (n % 16).toInt)
        }
      }
  }

  /** Perceptual-hash row: 64-bit aHash (mean-threshold over an 8×8
    * block-average luminance grid) and dHash (horizontal gradient over
    * a 9×8 grid) when an ImageIO reader accepted the bytes; a
    * quarantine row (zero hashes/geometry) otherwise. */
  final case class ImagePhash(doc_id: Long, n_bytes: Long, status: String,
      width: Int, height: Int, ahash: Long, dhash: Long)

  /** REAL image perceptual hashing — the multimodal face of near-dup
    * detection: re-encoded, resized, or slightly-edited copies of an
    * image keep (near-)identical perceptual hashes while their raw
    * bytes (and so [[features]]' `content_md5`) differ completely.
    * Decode is [[decodeImages]]' `javax.imageio` path under the same
    * quarantine contract; the downscale is a MANUAL block-average over
    * `getRGB` (no `Graphics2D.drawImage`, whose interpolation is
    * platform/hint dependent — block means over integer pixel grids
    * are bit-deterministic everywhere). Luminance is integer BT.601
    * (299r + 587g + 114b, no floats), aHash bit = cell > mean (ties
    * low), dHash bit = right neighbor > left, both packed row-major
    * MSB-first.
    *
    * Scale shape: mapPartitions over the envelope, bytes never leave
    * the executor, no shuffle; downstream grouping/pairing touches only
    * (doc_id, 2×long). Pair via [[imageDupPairs]].
    */
  def imagePhash(env: DataFrame)(implicit spark: SparkSession): Dataset[ImagePhash] = {
    import spark.implicits._
    env.select(col("doc_id"), col("content"), col("meta.mime").as("mime"))
      .as[MediaItem]
      .mapPartitions { items =>
        javax.imageio.ImageIO.setUseCache(false)
        items.map { it =>
          val n = it.content.length.toLong
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(it.content))
            if (img == null) ImagePhash(it.doc_id, n, "undecodable", 0, 0, 0L, 0L)
            else {
              // block-average luminance grid, rows x cols, integer math
              def grid(rows: Int, cols: Int): Array[Array[Long]] = {
                val (w, h) = (img.getWidth, img.getHeight)
                Array.tabulate(rows, cols) { (r, c) =>
                  val x0 = c * w / cols; val x1 = math.max(x0 + 1, (c + 1) * w / cols)
                  val y0 = r * h / rows; val y1 = math.max(y0 + 1, (r + 1) * h / rows)
                  var sum = 0L; var cnt = 0L
                  var y = y0
                  while (y < h && y < y1) {
                    var x = x0
                    while (x < w && x < x1) {
                      val rgb = img.getRGB(x, y)
                      sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                        114L * (rgb & 0xff)
                      cnt += 1; x += 1
                    }
                    y += 1
                  }
                  if (cnt == 0) 0L else sum / cnt
                }
              }
              val a = grid(8, 8)
              val mean = a.flatten.sum / 64
              var ahash = 0L
              var i = 0
              while (i < 64) {
                if (a(i / 8)(i % 8) > mean) ahash |= (1L << (63 - i)); i += 1
              }
              val d = grid(8, 9)
              var dhash = 0L
              i = 0
              while (i < 64) {
                val r = i / 8; val c = i % 8
                if (d(r)(c + 1) > d(r)(c)) dhash |= (1L << (63 - i)); i += 1
              }
              ImagePhash(it.doc_id, n, "decoded", img.getWidth, img.getHeight, ahash, dhash)
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              ImagePhash(it.doc_id, n, "undecodable", 0, 0, 0L, 0L)
          }
        }
      }
  }

  /** Image near-dup pairs: Hamming-near dHashes via the SAME
    * segment-blocked machinery text SimHash uses
    * ([[Dedup.hammingPairs]] — perfect recall at ≤ maxHamming by
    * pigeonhole, bucket join, no all-pairs). Quarantined rows never
    * pair (their zero hash carries no signal — the [[Dedup.simhash]]
    * empty-doc rule). Emits `(doc_a, doc_b, hamming)`.
    */
  def imageDupPairs(
      phashes: DataFrame,
      maxHamming: Int = 3,
      mat: graft.core.Materialize.Strategy = graft.core.Materialize.LocalCheckpoint): DataFrame =
    Dedup.hammingPairs(
      phashes.filter(col("status") === "decoded")
        .select(col("doc_id"), col("dhash").as("sig")),
      bits = 64, maxHamming = maxHamming, mat = mat)

  /** Column-layer content features over the envelope: md5 of the raw
    * bytes (dedup key for media), byte length. Pure codegen'd exprs. */
  def features(env: DataFrame): DataFrame =
    env.select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("content")).as("content_md5"))

  /** The full pipeline as one query: envelope → REAL decode →
    * features, joined on doc_id (both sides partition-local over the
    * same scan). Text payloads surface as quarantine rows — the
    * failure path is part of the contract and of the oracle. */
  def mediaSummary(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val env = envelope(docs)
    decodeImages(env).toDF()
      .join(features(env).drop("n_bytes"), "doc_id")
      .select("doc_id", "mime", "n_bytes", "status", "width", "height", "content_md5")
  }
}
