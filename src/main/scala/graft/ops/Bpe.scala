package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Materialize, TextNorm}

/** Trained byte-pair-encoding tokenizer (Sennrich et al., ACL '16 —
  * "Neural Machine Translation of Rare Words with Subword Units"),
  * train/serve split like the ANN stack: [[train]] learns a bounded
  * merge table from the corpus, [[tokenCounts]]/[[encodeCol]] serve it
  * over any corpus after.
  *
  * Representation — the whole algorithm is string algebra over a
  * SPACE-WRAPPED symbolization: a word's symbol sequence is the concat
  * of `" s "` for each symbol (`"low"` → `" l  o  w "`). Symbols are
  * drawn from [[TextNorm.tokens]]' alphabet (`[a-z0-9]`), so the
  * spaces can never collide with symbol content, and applying merge
  * (a, b) → ab is exactly `replace(syms, " a  b ", " ab ")`: each
  * symbol carries its OWN leading and trailing space, so matches can
  * never share a boundary character and the engine's left-to-right
  * non-overlapping replace IS greedy leftmost BPE merging (`"aaaa"`
  * with merge (a,a) → `"aa aa"`, `"aaa"` → `"aa a"`). The same
  * `replace` semantics hold in DuckDB, which is what makes the trainer
  * and the server oracle-twinnable as pure SQL.
  *
  * Training scale shape (the 100 TB stance): the corpus is scanned
  * ONCE, for the word-frequency table — a groupBy(word) whose result
  * is vocabulary-sized, not corpus-sized. Every iteration after that
  * runs on the vocab table: one explode of adjacent symbol pairs
  * weighted by word count, one combinable groupBy(pair) aggregate, a
  * single-row argmax collected to the driver (the model lives
  * driver-side by construction, like a tokenizer file), and one
  * row-parallel replace. The state table is re-materialized per
  * iteration (strategy pluggable) so lineage stays flat — the
  * [[Dedup.clusters]] iteration discipline. Driver loop length =
  * `numMerges`, a model hyper-parameter, never a function of corpus
  * size.
  *
  * Serving: the merge table folds into a chain of `numMerges` nested
  * codegen'd `replace` calls applied row-parallel — merges ride into
  * every task as plan literals (the broadcast analogue), the corpus is
  * scanned once, and the only shuffle is the final combinable
  * groupBy(doc_id). For production-sized merge tables (30k+) chunk the
  * chain across sequential projections or drop to a broadcast-map
  * mapPartitions encoder; at oracle scale the pure-column chain is the
  * faster and simpler form.
  *
  * Determinism: ties in the pair argmax break by (count desc, left
  * asc, right asc) — exact on longs and ASCII strings in both engines.
  */
object Bpe {

  /** One learned merge: rank, the two symbols joined, their joint
    * count at selection time. */
  final case class Merge(merge_idx: Int, lhs: String, rhs: String, merged: String, pair_count: Long)

  /** Initial symbolization: every character wrapped in its own space
    * pair — `"low"` → `" l  o  w "`. */
  private def charSyms(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** Back from wrapped symbolization to the symbol array. */
  private def pieces(syms: Column): Column = split(trim(syms), "  ")

  /** Corpus word-frequency table — the single corpus-sized scan of
    * training. */
  def wordCounts(docs: DataFrame): DataFrame =
    graft.core.Parallelism.ensure(docs)
      .select(explode(TextNorm.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn up to `numMerges` merges; stops early when the best
    * remaining pair's count falls under `minFrequency` (merging
    * singleton evidence learns noise). Returns the ordered merge list
    * (driver-side — it IS the model). */
  def trainMerges(
      docs: DataFrame,
      numMerges: Int,
      minFrequency: Long = 2L,
      mat: Materialize.Strategy = Materialize.LocalCheckpoint): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    require(minFrequency >= 1, s"minFrequency=$minFrequency must be >= 1")
    var words = Materialize(
      wordCounts(docs).select(charSyms(col("word")).as("syms"), col("cnt")), mat)
    val out = scala.collection.mutable.ListBuffer.empty[Merge]
    var done = false
    while (out.size < numMerges && !done) {
      val best = words
        .select(pieces(col("syms")).as("ps"), col("cnt"))
        .where(size(col("ps")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("ps")) - 1),
          j => struct(element_at(col("ps"), j).as("a"),
            element_at(col("ps"), j + 1).as("b")))).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minFrequency) done = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(out.size + 1, a, b, a + b, c)
        val next = Materialize(
          words.select(
            replace(col("syms"), lit(s" $a  $b "), lit(s" $a$b ")).as("syms"),
            col("cnt")), mat)
        Materialize.release(words, mat)
        words = next
      }
    }
    Materialize.release(words, mat)
    out.toList
  }

  /** [[trainMerges]] as a DataFrame — the storable/servable model
    * table: `(merge_idx, lhs, rhs, merged, pair_count)`. */
  def train(
      docs: DataFrame,
      numMerges: Int,
      minFrequency: Long = 2L,
      mat: Materialize.Strategy = Materialize.LocalCheckpoint): DataFrame = {
    val spark = docs.sparkSession
    spark.createDataFrame(trainMerges(docs, numMerges, minFrequency, mat))
      .select("merge_idx", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode one word column with an ordered merge list: the wrapped
    * symbolization folded through one `replace` per merge, then split
    * back to the piece array. Pure codegen'd column algebra. */
  def encodeCol(word: Column, merges: Seq[(String, String)]): Column =
    pieces(merges.foldLeft(charSyms(word)) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    })

  /** True subword token counts per document under a trained merge
    * list: `(doc_id, n_bpe_tokens)`, token-less docs 0 — the counts
    * [[Sampling.epochPlan]]/[[Sampling.packShards]] should budget with
    * when a real tokenizer is in play. One corpus scan, the encode
    * chain row-parallel over the exploded token stream, one combinable
    * groupBy(doc_id). */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    graft.core.Parallelism.ensure(docs)
      .select(col("doc_id"), explode_outer(TextNorm.tokens(col("text"))).as("word"))
      .select(col("doc_id"),
        when(col("word").isNull, lit(0L))
          .otherwise(size(encodeCol(col("word"), merges)).cast("long")).as("n"))
      .groupBy("doc_id").agg(sum("n").cast("long").as("n_bpe_tokens"))

  /** The served tokenizer's symbol inventory over a corpus — the vocab
    * file a tokenizer ships alongside its merges: apply the merge list
    * to the word-frequency table (vocabulary-sized, ONE corpus scan
    * inside [[wordCounts]]) and count each final piece's usage.
    * Output: `(piece, n_words, total_count)` — distinct vocab words
    * containing the piece, and the corpus-weighted occurrence total.
    * `Σ total_count` equals the corpus' served token count
    * ([[tokenCounts]] summed), a cross-check the spec pins.
    */
  def vocab(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    wordCounts(docs)
      .select(col("word"), col("cnt"),
        explode(encodeCol(col("word"), merges)).as("piece"))
      .groupBy("piece")
      .agg(countDistinct("word").as("n_words"),
        sum("cnt").as("total_count"))

  /** Tokenizer fertility per source: subword pieces emitted per
    * whitespace word — the standard tokenizer-fit diagnostic (a
    * fertility near 1 means the vocab covers the domain; high
    * fertility flags a domain the merges never saw, where every word
    * shatters into characters). One tokenize scan + one combinable
    * groupBy(source); word text joins only the vocabulary-sized
    * symbolization table. Output: `(source, n_words, n_bpe_tokens,
    * fertility)`, fertility NULL for a wordless source. */
  def fertility(
      docs: DataFrame, merges: Seq[(String, String)],
      sourceCol: String = "source"): DataFrame =
    graft.core.Parallelism.ensure(docs)
      .select(col(sourceCol).as("source"),
        explode_outer(TextNorm.tokens(col("text"))).as("word"))
      .select(col("source"),
        when(col("word").isNull, lit(0L)).otherwise(lit(1L)).as("nw"),
        when(col("word").isNull, lit(0L))
          .otherwise(size(encodeCol(col("word"), merges)).cast("long")).as("np"))
      .groupBy("source")
      .agg(sum("nw").as("n_words"), sum("np").as("n_bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_bpe_tokens"),
        when(col("n_words") > 0,
          round(col("n_bpe_tokens").cast("double") / col("n_words"), 6)).as("fertility"))

  /** [[tokenCounts]] serving a stored merge TABLE (the
    * [[graft.ops.Curation.classifierScore]] train/serve convention):
    * the table is model-sized, so collecting it to build the plan is
    * the broadcast, not a driver-side data loop. */
  def tokenCountsFromModel(docs: DataFrame, merges: DataFrame): DataFrame =
    tokenCounts(docs, collectMerges(merges))

  /** Order a stored merge table back into the servable list. */
  def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges.select("merge_idx", "lhs", "rhs").collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
}
