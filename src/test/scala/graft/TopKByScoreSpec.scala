package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKByScore
import graft.index.InvertedIndex
import SparkSpec.spark.implicits._

class TopKByScoreSpec extends SparkSpec {

  test("bounded-heap top-k equals the window formulation on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      (s"w${rnd.nextInt(50)}", i.toLong, (rnd.nextInt(10) + 1).toLong)
    }
    val idx = rows.toDF("word", "doc_id", "cnt")
    val viaWindow = InvertedIndex.topK(idx, 3)
      .select("word", "doc_id", "cnt", "rank").as[(String, Long, Long, Int)].collect().toSet
    val viaAgg = InvertedIndex.topKAggregated(idx, 3)
      .select("word", "doc_id", "cnt", "rank").as[(String, Long, Long, Int)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("heap evicts by (score asc, id desc): ties keep the LOWEST ids") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L), ("g", 4L, 9L))
      .toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(TopKByScore.topK(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top")).as("e")).select("e.score", "e.id")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((9L, 4L), (5L, 1L))) // best first; tie -> lowest id
  }

  test("groups smaller than k emit all rows; nulls are skipped") {
    val df = Seq(("g", Some(1L), Some(3L)), ("g", Some(2L), None), ("h", Some(9L), Some(1L)))
      .toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(TopKByScore.topK(col("score"), col("id"), 5).as("top"))
      .select(col("g"), size(col("top")).as("n")).as[(String, Int)].collect().toMap
    assert(got === Map("g" -> 1, "h" -> 1))
  }
}
