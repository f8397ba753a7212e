package graft

import graft.ops.Multimodal
import SparkSpec.spark.implicits._

class MultimodalSpec extends SparkSpec {

  private val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")

  test("envelope carries binary payload + typed metadata") {
    val env = Multimodal.envelope(docs)
    val schema = env.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val (mime, n) = env.selectExpr("meta.mime", "meta.n_bytes")
      .as[(String, Long)].head()
    assert(mime === "text/plain" && n === 11L)
  }

  test("decodeStub derives deterministic geometry from payload size") {
    implicit val s = spark
    val frames = Multimodal.decodeStub(Multimodal.envelope(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(frames(1L).n_bytes === 11L)
    assert(frames(1L).width === 12 && frames(1L).height === 12 && frames(1L).n_frames === 12)
    assert(frames(2L).width === 2 && frames(2L).n_frames === 2)
  }

  test("mediaSummary joins decode output with content hashes") {
    implicit val s = spark
    val row = Multimodal.mediaSummary(docs).where($"doc_id" === 1L)
      .select("content_md5", "n_bytes").as[(String, Long)].head()
    // md5("hello world")
    assert(row._1 === "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(row._2 === 11L)
  }
}
