package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Skew
import SparkSpec.spark.implicits._

/** Pins the two scale idioms that small-SF correctness can't see:
  * salted joins spread hot keys, bucketed tables join exchange-free. */
class ScaleIdiomsSpec extends SparkSpec {

  test("saltedJoin equals the plain join on skewed data") {
    // hot key: 5000 of 5100 fact rows share key 1
    val fact = ((1 to 5000).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "row_id")
    val dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "label")
    val plain = fact.join(dim, "k").select("k", "row_id", "label")
      .as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8, saltSource = col("row_id"))
      .select("k", "row_id", "label").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
    // and the fact side really is spread: >1 distinct salt for the hot key
    val salts = fact.withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
      .filter($"k" === 1L).select(countDistinct("_salt")).as[Long].head()
    assert(salts > 1)
  }

  test("bucketed tables sort-merge join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_lines_b")
    val orders = (1L to 1000L).map(k => (k, s"o$k")).toDF("k", "o")
    val lines = (1L to 3000L).map(i => (i % 1000 + 1, i)).toDF("k", "l")
    orders.write.bucketBy(8, "k").sortBy("k").saveAsTable("g_orders_b")
    lines.write.bucketBy(8, "k").sortBy("k").saveAsTable("g_lines_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("g_orders_b").join(spark.table("g_lines_b"), "k")
      assert(joined.count() === 3000)
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join should be exchange-free, got:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lines_b")
    }
  }

  test("the Generate barrier holds: gated flag ops keep ONE tokenizer in the plan") {
    // Filters over computed flag columns get alias-substituted and
    // pushed below plain projections (PushPredicateThroughNonJoin); a
    // two-step select is NO shield. rowFlags/qualityScore/languageId/
    // gopherQuality seal their expensive layers behind explode(array(…))
    // generators — this pins the executed-plan tokenizer count so a
    // refactor back to bare projections goes red, not 10x slower.
    // (Round-11 stream probe: the unsealed gate held 27 tokenizer
    // copies in one pushed predicate, 22 s instead of 4 at 50k docs.)
    val d = (1L to 20L)
      .map(i => (i, s"the document number $i is a body of text that has twelve tokens"))
      .toDF("doc_id", "text")
    def rx(df: org.apache.spark.sql.DataFrame): Int =
      "regexp_replace".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val gate = graft.ops.Curation.applyGate(d, graft.ops.Curation.QualityGate())
    assert(rx(gate) <= 3, s"gate plan re-inlined the tokenizer (${rx(gate)} copies)")
    assert(gate.count() > 0) // the fixture passes the gate at all
    // bounds = each op's SINGLE-evaluation regex inventory (tokenizer
    // counts 2: normalize is two regexp_replaces; qualityScore adds 3
    // one-shot ratio regexes, gopherQuality 5) — duplication pushes
    // well past these
    val q = graft.ops.TextAnalysis.qualityScore(d).filter(col("keep"))
    assert(rx(q) <= 5, s"qualityScore keep-filter re-inlined (${rx(q)} copies)")
    val l = graft.ops.TextAnalysis.languageId(d).filter(col("pred_lang") === "en")
    assert(rx(l) <= 3, s"languageId pred_lang-filter re-inlined (${rx(l)} copies)")
    val g = graft.ops.TextAnalysis.gopherQuality(d).filter(col("keep"))
    assert(rx(g) <= 7, s"gopherQuality keep-filter re-inlined (${rx(g)} copies)")
    val b = graft.ops.TextAnalysis.blocklistSignals(d).filter(col("keep"))
    assert(rx(b) <= 3, s"blocklistSignals keep-filter re-inlined (${rx(b)} copies)")
  }

  test("the crawl front is exchange-free end to end: extract -> line classes -> C4 rules") {
    val d = (1L to 30L).map(i => (i,
      s"<html><head><title>T</title></head><body>" +
        (1 to 6).map(j => s"<p>Sentence number $j of page $i has enough words.</p>").mkString +
        s"<ul><li><a href=/x>nav</a></li></ul></body></html>"))
      .toDF("doc_id", "text")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }.length
    }
    val chain = graft.ops.TextAnalysis.c4Clean(
      graft.ops.Html.htmlMainText(d))
    assert(exchanges(chain) === 0,
      s"crawl front must be row-local:\n${chain.queryExecution.executedPlan}")
    assert(chain.count() === 30) // and it actually keeps the articles
    assert(exchanges(graft.ops.Html.htmlLines(d)) === 0)
    assert(exchanges(graft.ops.Html.htmlSignals(d)) === 0)
    assert(exchanges(graft.ops.TextAnalysis.c4LineStats(d)) === 0)
    // the seal holds under a keep-filter: ONE line split in the plan
    val gated = graft.ops.TextAnalysis.c4LineStats(d).filter(col("keep"))
    val splits = "StringSplit".r
      .findAllIn(gated.queryExecution.executedPlan.toString).length
    assert(splits <= 4,
      s"c4 keep-filter re-inlined the line machinery ($splits splits)")
  }
}
