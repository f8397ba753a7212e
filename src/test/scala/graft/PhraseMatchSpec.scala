package graft

import graft.functions.AhoCorasick
import graft.ops.TextAnalysis
import SparkSpec.spark.implicits._

/** Aho–Corasick phrase matching: parity with a naive position-scan
  * reference (overlaps included), token-boundary semantics through
  * the ops face, distinct counting, dictionary-size independence. */
class PhraseMatchSpec extends SparkSpec {

  /** Naive reference: every position, every pattern. */
  private def refCount(text: String, pats: Seq[String]): (Long, Int) = {
    val ds = pats.filter(_.nonEmpty).distinct
    val per = ds.map(p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)))
    (per.map(_.toLong).sum, per.count(_ > 0))
  }

  test("counts every occurrence, overlapping included") {
    val ac = new AhoCorasick(Seq(" a a ", " b "))
    assert(ac.count(" a a a ") === refCount(" a a a ", Seq(" a a ", " b ")))
    assert(ac.count(" a a a ")._1 === 2L) // the self-overlap
    assert(ac.count(" b b ") === ((2L, 1)))
    assert(ac.count("") === ((0L, 0)))
  }

  test("matches the naive reference on random word salads") {
    val vocab = Vector("a", "b", "ab", "ba", "aa", "table", "fast")
    val rnd = new scala.util.Random(7)
    val pats = Seq(" a a ", " ab ba ", " table fast table ", " aa ", " zz ")
    val ac = new AhoCorasick(pats)
    (1 to 50).foreach { _ =>
      val text = " " + Seq.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ") + " "
      assert(ac.count(text) === refCount(text, pats), text)
    }
  }

  test("patterns sharing prefixes and suffixes all fire (failure links)") {
    val pats = Seq("she", "he", "hers", "his")
    val ac = new AhoCorasick(pats)
    // "shers": she (0), he (1), hers (1) -> 3 hits, 3 distinct
    assert(ac.count("shers") === ((3L, 3)))
    assert(ac.count("ushers") === ((3L, 3)))
    assert(ac.count("his hers") === refCount("his hers", pats))
  }

  test("duplicate patterns collapse; empty patterns are ignored") {
    val ac = new AhoCorasick(Seq("ab", "ab", "", "ab"))
    assert(ac.count("abab") === ((2L, 1)))
  }

  test("dictionary-size independence: 5k phrases, one pass, exact") {
    val pats = (1 to 5000).map(i => s" w$i x$i ")
    val ac = new AhoCorasick(pats)
    val text = " w17 x17 w4999 x4999 w17 x17 "
    assert(ac.count(text) === ((3L, 2)))
  }

  test("adversarial suffix chains: short pattern under a deep chain stays exact (dict links)") {
    // {"a", "a"*50} over "a"*2000 — the case where a raw failure-chain
    // walk costs O(text × depth); dict links + the all-seen early exit
    // keep it O(text + matches), and the counts must stay exact
    val deep = "a" * 50
    val ac = new AhoCorasick(Seq("a", deep))
    val text = "a" * 2000
    val (total, distinct) = ac.count(text)
    assert(total === 2000L + (2000 - 50 + 1).toLong)
    assert(distinct === 2)
    // nested dictionary suffixes all surface through the links alone
    val ac2 = new AhoCorasick(Seq("aaa", "aa", "a"))
    assert(ac2.count("aaaa") === ((2L + 3L + 4L, 3)))
    // a NON-match state whose nearest dict suffix is two hops up
    val ac3 = new AhoCorasick(Seq("b", "abc"))
    assert(ac3.count("xabcx") === ((2L, 2)))
  }

  test("graft_phrase_match and graft_jl_project are SQL-callable after extension install") {
    val spark = SparkSpec.spark
    graft.plans.GraftExtensions.install(spark)
    val pm = spark.sql(
      "SELECT graft_phrase_match(' a a a ', array(' a a ', ' b '))")
      .as[Seq[Long]].head()
    assert(pm === Seq(2L, 1L))
    val jl = spark.sql(
      "SELECT graft_jl_project(array(1d, 2d, 3d, 4d), 4, 2)")
      .as[Seq[Double]].head()
    val viaCol = Seq((1L, Seq(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
      .select(graft.ops.Similarity.jlProject(
        org.apache.spark.sql.functions.col("embedding"), 4, 2))
      .as[Seq[Double]].head()
    assert(jl === viaCol)
    // non-literal dims / patterns fail loudly at plan time
    val e = intercept[Exception](
      spark.sql("SELECT graft_phrase_match('x', array(lower(rand())))").collect())
    assert(e.getMessage.contains("foldable") || e.getMessage.contains("phrases"))
  }

  test("phraseBlocklistSignals: token-boundary exact over normalized text") {
    val docs = Seq(
      (1L, "Win a PRIZE now! win a prize"), // punctuation/case normalize away
      (2L, "nowin a prizes here"),          // boundary: must NOT match
      (3L, "a a a"),                        // overlap through the face
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.phraseBlocklistSignals(docs, Seq("win a prize", "a a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((2L, 1L, false)))
    assert(got(2L) === ((0L, 0L, true)), "substring of a token must not match")
    assert(got(3L) === ((2L, 1L, false)), "overlapping phrase occurrences count")
    assert(got(4L) === ((0L, 0L, true)))
  }
}
