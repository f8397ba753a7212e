package graft

import graft.ops.Sampling
import SparkSpec.spark.implicits._

class SamplingSpec extends SparkSpec {

  private val df = (1L to 1000L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")

  test("trainValTest covers every row, roughly at requested fractions, deterministically") {
    val counts = Sampling.trainValTest(df, "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700 && counts("train") < 900) // 80% +- noise
    assert(counts.keySet === Set("train", "val", "test"))
    // stable across invocations
    val again = Sampling.trainValTest(df, "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("invalid split percentages are rejected") {
    intercept[IllegalArgumentException](Sampling.trainValTest(df, "id", 95, 10))
  }

  test("stratified keeps at most N per stratum, rank dense from 1") {
    val got = Sampling.stratified(df, "lang", "id", 7)
      .select("lang", "sample_rank").as[(String, Int)].collect()
    val byLang = got.groupBy(_._1)
    assert(byLang.keySet === Set("lang0", "lang1", "lang2"))
    byLang.values.foreach { rows =>
      assert(rows.length === 7)
      assert(rows.map(_._2).sorted.toSeq === (1 to 7))
    }
  }
}
