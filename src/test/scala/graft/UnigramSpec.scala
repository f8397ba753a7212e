package graft

import org.apache.spark.sql.functions._

import graft.ops.Unigram
import SparkSpec.spark.implicits._

/** Unigram-LM tokenizer: plain-Scala reference parity for the trainer
  * (an INDEPENDENT implementation — exhaustive segmentation search
  * instead of the DP encoder, in-memory maps instead of DataFrames),
  * plus the encoder's decoding contract (lex-min tie-break, unknown
  * fallback, empty word) and the serving faces. */
class UnigramSpec extends SparkSpec {

  // ---- independent reference implementation ------------------------------

  private val MaxPieceLen = 4

  private def lp6(cnt: Long, total: Long): Long =
    java.math.BigDecimal.valueOf(math.log(cnt.toDouble / total.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** All segmentations of `w` under `micro` (plus single-char unknown
    * at -20e6), exhaustively; best by (score desc, joined asc). */
  private def refBestSeg(w: String, micro: Map[String, Long]): List[String] = {
    def segs(i: Int): Seq[(List[String], Long)] =
      if (i == w.length) Seq((Nil, 0L))
      else (1 to math.min(MaxPieceLen, w.length - i)).flatMap { L =>
        val p = w.substring(i, i + L)
        val sc = micro.get(p).orElse(if (L == 1) Some(Unigram.UnkLpMicro) else None)
        sc.toSeq.flatMap(s => segs(i + L).map { case (rest, rs) => (p :: rest, s + rs) })
      }
    segs(0).minBy { case (ps, sc) => (-sc, ps.mkString(" ")) }._1
  }

  private def refTrain(
      wordCnt: Map[String, Long], vocabSize: Int, rounds: Int): Map[String, (Long, Long)] = {
    val seedN = 4 * vocabSize
    // substring seed, corpus-weighted
    val subs = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    wordCnt.filter(_._1.length <= 12).foreach { case (w, c) =>
      for (i <- 0 until w.length; l <- 1 to math.min(MaxPieceLen, w.length - i))
        subs(w.substring(i, i + l)) += c
    }
    val singles = subs.filter(_._1.length == 1).toMap
    val multis = subs.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedN).toMap
    var cur: Map[String, Long] = singles ++ multis
    def score(m: Map[String, Long]): Map[String, Long] = {
      val tot = m.values.sum
      m.map { case (p, c) => p -> lp6(c, tot) }
    }
    for (_ <- 1 to rounds) {
      val micro = score(cur)
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      wordCnt.filter(_._1.length <= 12).foreach { case (w, c) =>
        refBestSeg(w, micro).foreach(p => counts(p) += c)
      }
      cur = cur.keysIterator.map { p =>
        val c = if (p.length == 1) math.max(counts(p), 1L) else counts(p)
        p -> c
      }.filter(_._2 > 0).toMap
    }
    val sing = cur.filter(_._1.length == 1)
    val kept = sing ++ cur.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - sing.size)).toMap
    val micro = score(kept)
    kept.map { case (p, c) => p -> ((c, micro(p))) }
  }

  // ---- parity -------------------------------------------------------------

  test("trainUnigram matches the plain-Scala reference (pieces, counts, 6dp log-probs)") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "wide wider widest wide"),
      (4L, "low new wide low"),
      (5L, "the the the a a"))
      .toDF("doc_id", "text")
    val wordCnt = docs.select(explode(graft.core.TextNorm.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val expected = refTrain(wordCnt, vocabSize = 20, rounds = 2)
    val got = Unigram.trainUnigram(docs, vocabSize = 20, emRounds = 2)
      .select("piece", "cnt", "lp").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).movePointRight(6).longValueExact())))
      .toMap
    assert(got === expected)
  }

  test("encoder: co-optimal segmentations break to the lex-min joined string (shorter first piece)") {
    // score("ab") == score("a") + score("b") exactly — the tie; the
    // joined strings compare "a b" < "ab" (space sorts below 'b')
    val pieces = Seq(("ab", -1000000L), ("a", -600000L), ("b", -400000L))
    val got = Seq("ab").toDF("w")
      .select(Unigram.encodeFast(col("w"), pieces).as("ps"))
      .as[Seq[String]].head()
    assert(got === Seq("a", "b"))
    // break the tie toward the multi-char piece and it wins
    val pieces2 = Seq(("ab", -999999L), ("a", -600000L), ("b", -400000L))
    val got2 = Seq("ab").toDF("w")
      .select(Unigram.encodeFast(col("w"), pieces2).as("ps"))
      .as[Seq[String]].head()
    assert(got2 === Seq("ab"))
  }

  test("encoder: unknown single chars segment at the fixed UNK score; empty word yields [\"\"]") {
    val pieces = Seq(("a", -100000L), ("aa", -150000L))
    val got = Seq("axa", "", "zzz").toDF("w")
      .select(col("w"), Unigram.encodeFast(col("w"), pieces).as("ps"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("axa") === Seq("a", "x", "a"))
    assert(got("") === Seq(""))
    assert(got("zzz") === Seq("z", "z", "z"))
  }

  test("tokenCounts / fertility: combinable serving faces; token-less docs count 0; comparison against BPE runs") {
    val docs = Seq(
      (1L, "aa ab aa", "s1"),
      (2L, "", "s1"),
      (3L, "b", "s2"))
      .toDF("doc_id", "text", "source")
    val pieces = Seq(("aa", -200000L), ("a", -700000L), ("b", -300000L))
    val counts = Unigram.tokenCounts(docs, pieces)
      .as[(String, Long)].collect().toMap
    // "aa"->1 piece, "ab"->2 ("a","b"), doc1 = 1+2+1 = 4
    assert(counts === Map("1" -> 4L, "2" -> 0L, "3" -> 1L))
    val fert = Unigram.fertility(docs, pieces)
      .select("source", "n_words", "n_unigram_tokens").as[(String, Long, Long)]
      .collect().map { case (s, a, b) => s -> ((a, b)) }.toMap
    assert(fert === Map("s1" -> ((3L, 4L)), "s2" -> ((1L, 1L))))
    // the stored-model serve face agrees with the list face
    val model = Unigram.trainUnigram(docs, vocabSize = 10, emRounds = 1)
    val viaModel = Unigram.tokenCountsFromModel(docs, model).collect().toSet
    val viaList = Unigram.tokenCounts(docs, Unigram.collectPieces(model)).collect().toSet
    assert(viaModel === viaList)
  }

  test("plan shape: the native encoder is one expression inside whole-stage codegen") {
    val pieces = Seq(("aa", -200000L), ("a", -700000L))
    val df = spark.range(8)
      .select(concat(lit("aa"), col("id").cast("string")).as("w"))
      .select(size(Unigram.encodeFast(col("w"), pieces)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_unigram_encode"))
    // the `*(n)` star marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_unigram_encode") && l.trim.startsWith("*(")))
  }
}
