package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads travel as opaque `binary` columns next to a typed metadata
  * struct, and per-item decode/feature work runs partition-parallel over
  * the binary bytes.
  *
  * The image/audio codec libraries are not present in this container,
  * so [[decodeStub]] is a clearly-marked DETERMINISTIC FAKE — it derives
  * "frame" geometry from the byte length alone. Everything around it is
  * real and load-bearing: the envelope schema, the Dataset encoder
  * round-trip, the mapPartitions batch shape (one iterator per
  * partition — the Scala twin of a pandas-batch UDF), and the
  * column-layer feature hashes. Swapping the fake for a real decoder
  * changes only the body of one function.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); feature hashes are codegen'd column exprs; nothing ever
  * collects media bytes to the driver.
  */
object Multimodal {

  /** The multimodal envelope: payload + typed metadata. */
  final case class MediaItem(doc_id: Long, content: Array[Byte], mime: String)

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

  /** STUB decoder — deterministic fake in place of a real image/video
    * codec (libs absent in this environment). Geometry is a pure
    * function of the payload size so any engine can reproduce it:
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

  /** Column-layer content features over the envelope: md5 of the raw
    * bytes (dedup key for media), byte length. Pure codegen'd exprs. */
  def features(env: DataFrame): DataFrame =
    env.select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("content")).as("content_md5"))

  /** The full stub pipeline as one query: envelope → decode →
    * features, joined on doc_id (both sides partition-local over the
    * same scan). */
  def mediaSummary(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val env = envelope(docs)
    decodeStub(env).toDF()
      .join(features(env).drop("n_bytes"), "doc_id")
      .select("doc_id", "mime", "n_bytes", "width", "height", "n_frames", "content_md5")
  }
}
