package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.TextNorm

/** Deduplication suite for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard near-dup — each over the `documents`
  * table, each a pure Catalyst plan (no UDFs, no driver-side state).
  *
  * Determinism contract: every hash is md5 (identical hex in any
  * engine), every tie is broken by `doc_id`, so results are
  * reproducible cell-for-cell in an independent SQL engine — that is
  * what the DuckDB oracle checks.
  *
  * Scale design: all candidate generation is bucket-join shaped
  * (group/join on a hash key, one shuffle each); nothing ever compares
  * all pairs. At 100 TB the shingle/signature explosion factor is the
  * knob: k and band width below trade recall for shuffle volume.
  */
object Dedup {

  /** Exact dedup: md5 over the normalized text; the canonical document
    * of a group is its minimum doc_id. One shuffle (groupBy hash).
    * Window-free formulation: aggregate per hash then rejoin would be
    * two shuffles; a min-over-window is one.
    */
  def exact(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy("text_hash")
    docs
      .select(col("doc_id"), md5(TextNorm.normalize(col("text"))).as("text_hash"))
      .withColumn("canonical_id", min(col("doc_id")).over(byHash))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "text_hash", "canonical_id", "is_dup")
  }

  /** w-token shingles of the normalized text, as strings.
    * `slice` + `concat_ws` over the token array — stays codegen'd.
    */
  def shingleCol(textCol: Column, w: Int): Column = {
    val toks = TextNorm.tokens(textCol)
    when(size(toks) >= w,
      transform(
        sequence(lit(1), size(toks) - lit(w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))
      )
    ).otherwise(array(concat_ws(" ", toks)))  // short doc → one shingle
  }

  /** MinHash signatures: k independent hash functions simulated as
    * `min(md5(seed || ':' || shingle))` per seed — the lexicographic
    * minimum of a uniform hex hash is a valid minwise permutation
    * sample. Emits one row per (doc_id, seed).
    * Explode factor = #shingles × k; the groupBy is the only shuffle.
    */
  def minhashSignatures(docs: DataFrame, w: Int = 3, k: Int = 8): DataFrame =
    docs
      .select(col("doc_id"), explode(shingleCol(col("text"), w)).as("shingle"))
      .crossJoin(spark_range_seeds(k))
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("seed"), lit(":"), col("shingle")))).as("sig"))

  private def spark_range_seeds(k: Int): DataFrame = {
    // tiny literal dim table; broadcast-joined by Catalyst automatically
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.active
    spark.range(k).select(col("id").cast("int").as("seed"))
  }

  /** LSH banding over the minhash signatures: b bands of r = k/b rows;
    * band key = md5 of the band's concatenated signature. Docs sharing
    * any band key are near-dup candidates.
    */
  def minhashBands(docs: DataFrame, w: Int = 3, k: Int = 8, bands: Int = 2): DataFrame = {
    val r = k / bands
    minhashSignatures(docs, w, k)
      .withColumn("band", (col("seed") / lit(r)).cast("int"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws("|", sort_array(collect_list(struct(col("seed"), col("sig"))))
        .getField("sig"))).as("band_key"))
  }

  /** Candidate near-dup pairs: self-join the band table on
    * (band, band_key), keep a < b. Bucket join — one shuffle per side,
    * never all-pairs. */
  def minhashCandidatePairs(docs: DataFrame, w: Int = 3, k: Int = 8, bands: Int = 2): DataFrame = {
    val b = minhashBands(docs, w, k, bands)
    val l = b.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val r = b.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** n-gram Jaccard similarity over candidate pairs that share at least
    * one (rare) shingle. df-capped inverted-index join: shingles
    * occurring in more than `maxDf` docs are dropped from candidate
    * generation (they'd contribute quadratic pairs; a shingle that
    * common is useless evidence of duplication anyway — this is the
    * standard guard that keeps the join linear at scale).
    * Jaccard = |A∩B| / (|A|+|B|−|A∩B|) over distinct shingles; single
    * division, deterministic.
    */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, maxDf: Int = 50, minJaccard: Double = 0.2): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(shingleCol(col("text"), w)).as("shingle"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val rare = sh
      .withColumn("df", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("df") <= maxDf)
    val inter = rare.select(col("shingle"), col("doc_id").as("doc_a"))
      .join(rare.select(col("shingle"), col("doc_id").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("jaccard"))
  }

  /** SimHash (Charikar '02), `bits`-bit variant: per token-hash bit j,
    * weight_j = Σ_tokens (bit_j ? +1 : −1); signature bit j = weight_j>0.
    * Token hash bits come from the md5 hex prefix (4 bits per hex char)
    * so any engine reproduces them. Emits (doc_id, simhash) with the
    * signature as a bigint. One groupBy shuffle.
    */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val tok = docs.select(
      col("doc_id"),
      explode(TextNorm.tokens(col("text"))).as("word")
    ).select(col("doc_id"), md5(col("word")).as("h"))
    // bit j of the hash = bit (3 - j%4) of hex digit j/4
    def bitOf(j: Int): Column =
      (conv(substring(col("h"), j / 4 + 1, 1), 16, 10).cast("int")
        .bitwiseAND(lit(1 << (3 - j % 4))) > 0).cast("int")
    val weights = (0 until bits).map(j => sum(bitOf(j) * 2 - 1).as(s"w$j"))
    val agg = tok.groupBy("doc_id").agg(weights.head, weights.tail: _*)
    val sig = (0 until bits).map(j =>
      when(col(s"w$j") > 0, lit(1L << (bits - 1 - j))).otherwise(0L)
    ).reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: block on each half of the signature (a
    * pair within Hamming distance ≤ bits/2-block tolerance shares at
    * least one identical half — pigeonhole), then verify
    * `bit_count(xor) <= maxHamming`. Bucket join, no all-pairs.
    */
  def simhashPairs(docs: DataFrame, bits: Int = 16, maxHamming: Int = 3): DataFrame = {
    val half = bits / 2
    val s = simhash(docs, bits)
    val blocked = s.select(
      col("doc_id"), col("simhash"),
      explode(array(
        struct(lit(0).as("blk"), shiftrightunsigned(col("simhash"), half).as("key")),
        struct(lit(1).as("blk"), (col("simhash").bitwiseAND(lit((1L << half) - 1))).as("key"))
      )).as("b")
    ).select(col("doc_id"), col("simhash"), col("b.blk"), col("b.key"))
    val l = blocked.select(col("blk"), col("key"), col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val r = blocked.select(col("blk"), col("key"), col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    l.join(r, Seq("blk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
