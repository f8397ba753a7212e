package graft

import org.apache.spark.sql.functions.col

import graft.core.TextNorm
import SparkSpec.spark.implicits._

/** Python-golden parity gate (SURVEY §7.5.2): the checked-in
  * `textnorm_golden.jsonl` was produced by running the reference's
  * exact normalizer lines (`mapper/main.py:56-60`) under CPython over a
  * Unicode edge-case corpus (`tools/gen_norm_golden.py`). TextNorm must
  * reproduce every tokenization — NBSP and exotic whitespace, combining
  * marks, case-mapping oddities (İ, ß), CJK, C0 separator controls. */
class TextNormGoldenSpec extends SparkSpec {

  test("tokens match the reference Python normalizer on the golden corpus") {
    val stream = getClass.getResourceAsStream("/textnorm_golden.jsonl")
    assert(stream != null, "golden corpus missing from test resources")
    val lines = scala.io.Source.fromInputStream(stream, "UTF-8").getLines().toSeq
    val golden = spark.read
      .schema("text STRING, tokens ARRAY<STRING>")
      .json(lines.toDS())
    val rows = golden
      .select(col("text"), col("tokens"),
        TextNorm.tokens(col("text")).as("got"))
      .collect()
    assert(rows.length === lines.length)
    rows.foreach { r =>
      val text = r.getString(0)
      val expected = r.getSeq[String](1)
      val got = r.getSeq[String](2)
      assert(got === expected,
        s"divergence for ${text.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"python=$expected spark=$got")
    }
  }
}
