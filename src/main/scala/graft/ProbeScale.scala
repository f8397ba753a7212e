package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway 10x-scale profiler (not part of the driver contract). */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // UI events carry a plan description generated PER ACTION even with
      // the UI disabled; the default "formatted" mode runs ExplainUtils'
      // operator-ID walk, which is super-linear on deep staged/cached plan
      // trees (a measured multi-minute single-thread stall per streaming
      // batch at full-stack depth). "simple" keeps the event linear.
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("PROBE_FALLBACK", "128"))
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ~sf1 corpus: 10 doc_id-shifted copies of sf0.1 (dense-duplicate
    // stress for the dedup family); regenerated on demand under /tmp
    if (!new java.io.File("/tmp/docs_sf1/_SUCCESS").exists()) {
      val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      (0 until 10).map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 100000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet("/tmp/docs_sf1")
    }
    val docs = spark.read.parquet("/tmp/docs_sf1")
    // PROBE_SECTION=docs|emb skips the other family (clean-window runs)
    val section = sys.env.getOrElse("PROBE_SECTION", "all")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE-STAGE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      System.out.flush()
    }
    if (section == "all" || section == "docs") {
    val bands = Dedup.minhashBands(docs)
    time("bands_count")(bands.count())
    time("bands_group_count")(bands.groupBy("band", "band_key")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count())
    time("bands_group_collect")(bands.groupBy("band", "band_key")
      .agg(collect_list(col("doc_id")).as("ds")).filter(size(col("ds")) >= 2).count())
    time("pairs_full")(Dedup.minhashCandidatePairs(docs).count())
    // dup-dense stress: one 5000-copy cluster (all copies share every
    // band bucket) on top of 50k distinct docs — the corpus shape the
    // bucket cap exists for. Uncapped, the cluster's bucket pairs
    // C(5000,2) ≈ 12.5M structs inside ONE task's interpreted lambda;
    // capped, they stream through the join.
    val copies = docs.filter(col("doc_id") === 1L).limit(1)
      .select(explode(sequence(lit(0L), lit(4999L))).as("i"), col("text"))
      .select((lit(10000000L) + col("i")).as("doc_id"), col("text"))
      .repartition(32)
    val dense = docs.limit(50000).select("doc_id", "text").unionByName(copies)
    time("dense_pairs_capped")(Dedup.minhashCandidatePairs(dense, bucketCap = 64).count())
    if (sys.env.contains("PROBE_UNCAPPED"))
      time("dense_pairs_uncapped")(Dedup.minhashCandidatePairs(dense, bucketCap = Int.MaxValue).count())
    // round-3 operators at ~sf1
    time("clusters")(Dedup.clusters(Dedup.minhashCandidatePairs(docs)).count())
    time("minhash_est")(Dedup.minhashEstimatedPairs(docs).count())
    time("top_ngrams")(graft.ops.TextAnalysis.topNgrams(docs, 2, 100).count())
    time("repetition")(graft.ops.TextAnalysis.repetitionSignals(docs).count())
    time("scrub")(graft.ops.TextAnalysis.scrubStats(docs).count())
    time("pack_shards")(graft.ops.Sampling.packShards(docs, 2048, 32).count())
    // round-4: end-to-end near-dup removal (post pairs-materialization
    // fix) and eval-decontamination at ~sf1
    time("dedup_keep")(Dedup.dropNearDuplicates(docs).count())
    time("decontaminate")(Dedup.decontaminate(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0)).count())
    time("chunk_dedup")(Dedup.chunkDedup(docs).count())
    time("vocab_coverage")(graft.ops.TextAnalysis.vocabCoverage(docs, 100).count())
    time("dedup_incremental")(Dedup.dropDuplicatesAgainst(
      docs.filter(col("doc_id") % 2 =!= 0),
      Dedup.minhashBands(docs.filter(col("doc_id") % 2 === 0))).count())
    }
    // round-8: the full curation composition (quality+lang fused scan →
    // near-dedup → decontaminate → mixture → split) at both scales —
    // does the chain track the data ratio, or does a stage compound?
    if (section == "all" || section == "docs" || section == "curate") {
    def curateAt(d: org.apache.spark.sql.DataFrame) = graft.ops.Curation.curate(
      d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0),
      rates = Map("src0" -> 1.0, "src1" -> 0.3, "src2" -> 0.0), defaultRate = 0.5)
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("curate_sf01")(curateAt(docs01).count())
    time("curate_sf1")(curateAt(docs).count())
    }
    // round-8: boilerplate removal at both scales — the ids-only-shuffle
    // design claim: wall-clock should track the data ratio (~10x), since
    // every exchange carries (doc_id, idx, md5) and text stays in the
    // row-parallel reassembly scan
    if (section == "boiler") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (rep <- 1 to 2) {
      time(s"boilerplate_sf01_$rep")(Dedup.boilerplateChunks(docs01).count())
      time(s"boilerplate_sf1_$rep")(Dedup.boilerplateChunks(docs).count())
    }
    // the sampling planners are scans + source-cardinality aggregates;
    // probed once to confirm they stay scan-bound at sf1
    time("mixture_temp_sf1")(graft.ops.Sampling.mixtureTemperature(
      docs, "source", "doc_id", 2.0).count())
    time("epoch_plan_sf1")(graft.ops.Sampling.epochPlan(
      docs, "source", Map("src0" -> 0.5, "src1" -> 0.5), 1000000L).count())
    }
    // round-9: substring-level dedup at both scales — the sf1 corpus is
    // 10 id-shifted copies, so ~9/10 of all anchor sites are droppable:
    // the worst case for the span path (the droppable join and the
    // per-doc windows see almost every site). strip is forced through
    // the splice (sum of spliced lengths) — a bare count() would prune
    // the fold and join-eliminate the whole span branch, timing nothing
    if (section == "spans") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def forceStrip(d: org.apache.spark.sql.DataFrame): Long =
      Dedup.stripDuplicateSpans(d)
        .agg(sum(length(col("text")))).collect().head.getLong(0)
    for (rep <- 1 to 2) {
      time(s"dup_spans_sf01_$rep")(Dedup.duplicateSpans(docs01).count())
      time(s"dup_spans_sf1_$rep")(Dedup.duplicateSpans(docs).count())
      time(s"dup_strip_sf1_$rep")(forceStrip(docs))
    }
    }
    // stage-level breakdown of the span path (variance diagnosis)
    if (section == "spansdbg") {
    for (rep <- 1 to 3) {
      val sites = graft.core.Materialize(Dedup.anchorSites(docs, 24, 8),
        graft.core.Materialize.LocalCheckpoint)
      time(s"sites_ckpt_$rep")(sites.count())
      val grams = sites.groupBy("h")
        .agg(count(lit(1)).as("n_sites"),
          min(struct(col("doc_id"), col("pos"))).as("canon"))
        .where(col("n_sites") > 1)
      time(s"grams_agg_$rep")(grams.count())
      val droppable = sites.join(grams, "h")
        .where(!(col("doc_id") === col("canon.doc_id") && col("pos") === col("canon.pos")))
        .select(col("doc_id"), col("pos"))
      time(s"droppable_$rep")(droppable.count())
      time(s"spans_full_$rep")(Dedup.duplicateSpans(docs).count())
    }
    }
    // round-8: the model-based scorers + order/quality passes at both
    // scales — all four are designed scan-bound (broadcast/model-sized
    // joins only), so wall-clock should track the data ratio
    if (section == "score") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def dom(d: org.apache.spark.sql.DataFrame) = d.withColumn("domain",
      when(col("source") === "src19", "books")
        .when(col("source").isin("src15", "src16", "src17", "src18"), "wiki")
        .otherwise("web"))
    def classify(d: org.apache.spark.sql.DataFrame) = {
      val dd = dom(d)
      graft.ops.Curation.classifierScore(dd,
        graft.ops.Curation.classifierWeights(
          dd.filter(col("domain") =!= "web"), dd.filter(col("domain") === "web")))
    }
    def lmRef(d: org.apache.spark.sql.DataFrame) = {
      val dd = dom(d)
      graft.ops.TextAnalysis.lmScoreAgainst(dd, dd.filter(col("domain") =!= "web"))
    }
    // filter on a COMPUTED column so Catalyst can't left-join-eliminate
    // the scorer under a bare count()
    for (rep <- 1 to 2) {
      time(s"classifier_sf01_$rep")(classify(docs01).where(col("keep")).count())
      time(s"classifier_sf1_$rep")(classify(docs).where(col("keep")).count())
      time(s"lm_score_ref_sf01_$rep")(lmRef(docs01).where(col("avg_logprob") < 0).count())
      time(s"lm_score_ref_sf1_$rep")(lmRef(docs).where(col("avg_logprob") < 0).count())
    }
    time("gopher_sf1")(graft.ops.TextAnalysis.gopherQuality(docs)
      .where(col("keep")).count())
    time("shuffle_order_sf1")(graft.ops.Sampling.shuffleOrder(
      docs, "doc_id", shards = 64, seed = 7L)
      .where(col("interleave_pos") % 7 === 0).count())
    }
    // A/B the flags-pass implementations at sf1 (dev diagnosis): how much
    // of the scan is the tokenizer, and do the stopword-hit variants differ?
    if (section == "flagsab") {
    import graft.ops.Stopwords
    val langs = Seq(Stopwords.en, Stopwords.de, Stopwords.es, Stopwords.fr, Stopwords.zh)
    val ts = graft.core.TextNorm.tokens(col("text")).as("ts")
    def agg6(scored: org.apache.spark.sql.DataFrame): Long =
      scored.agg(sum(col("n") + col("s0") + col("s1") + col("s2") + col("s3") + col("s4")))
        .head.getLong(0)
    def viaHof(hit: (org.apache.spark.sql.Column, Seq[String]) => org.apache.spark.sql.Column): Long =
      agg6(docs.select(ts).select(
        size(col("ts")).as("n") +: langs.zipWithIndex.map { case (ws, i) =>
          size(filter(col("ts"), t => hit(t, ws))).as(s"s$i") }: _*))
    def viaRegex(): Long = {
      val padded = concat(lit(" "), graft.core.TextNorm.normalize(col("text")), lit(" "))
      agg6(docs.select(padded.as("p")).select(
        regexp_count(col("p"), lit(" (?=[a-z0-9])")).as("n") +: langs.zipWithIndex.map {
          case (ws, i) =>
            regexp_count(col("p"), lit(" (?:" + ws.mkString("|") + ")(?= )")).as(s"s$i") }: _*))
    }
    for (rep <- 1 to 2) {
      time(s"ab_tokenize_only_$rep")(docs.select(ts).agg(sum(size(col("ts")))).head.getLong(0))
      time(s"ab_array_contains_$rep")(viaHof((t, ws) => array_contains(array(ws.map(lit): _*), t)))
      time(s"ab_isin_$rep")(viaHof((t, ws) => t.isin(ws: _*)))
      time(s"ab_regexp_count_$rep")(viaRegex())
    }
    }
    // stage-level breakdown of the composition at sf1 (dev diagnosis)
    if (section == "curatestages") {
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val evald = docs.filter(col("doc_id") % 50 === 0)
    val s1 = graft.ops.Curation.rowFlags(train, 10)
      .filter(col("q_keep") && col("pred_lang") === "en")
    time("cs_flags")(s1.count())
    val losersDf = Dedup.nearDupLosers(s1)
    time("cs_losers")(losersDf.count())
    val s2 = s1.join(losersDf, Seq("doc_id"), "left_anti")
    time("cs_s2")(s2.count())
    val contam = Dedup.contaminatedIds(s2, evald)
    time("cs_contam")(contam.count())
    val s3 = s2.join(contam, Seq("doc_id"), "left_anti")
    time("cs_s3_full")(s3.count())
    time("cs_full_curate")(graft.ops.Curation.curate(train, evald,
      rates = Map("src0" -> 1.0, "src1" -> 0.3, "src2" -> 0.0), defaultRate = 0.5).count())
    // round-9: the fused call — manifest AND funnel from one drop-set
    // computation (the pre-fusion cost of these two outputs was
    // cs_full_curate + a separate funnel ≈ 2x the chain)
    time("cs_with_funnel") {
      val r = graft.ops.Curation.curateWithFunnel(train, evald,
        rates = Map("src0" -> 1.0, "src1" -> 0.3, "src2" -> 0.0), defaultRate = 0.5)
      r.manifest.count() + r.funnel.count()
    }
    }
    // round-9: length-ratio prefilter A/B — candidate pair count and
    // wall time with the floor off vs at the banding scheme's design
    // threshold (k=8,b=2 -> ~0.84). Run each twice; read the warm rep.
    if (section == "ratioab") {
    for (rep <- 1 to 2) {
      time(s"ratio_pairs_off_$rep")(Dedup.minhashCandidatePairs(docs).count())
      time(s"ratio_pairs_084_$rep")(
        Dedup.minhashCandidatePairs(docs, sizeRatioFloor = 0.84).count())
      time(s"ratio_losers_off_$rep")(Dedup.nearDupLosers(docs).count())
      time(s"ratio_losers_084_$rep")(
        Dedup.nearDupLosers(docs, sizeRatioFloor = 0.84).count())
    }
    }
    // round-10: the new sampling/split/script ops at both scales — all
    // designed scan-bound (budgeted mixture: one tokenize scan + a
    // sources×256 broadcast table + one boundary-bucket window per
    // source; leakage-safe split: the cluster graph it composes
    // dominates; scriptSignals: pure row-parallel regexp passes)
    if (section == "r10") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val weights = Map("src0" -> 1.0, "src1" -> 2.0, "src3" -> 0.5, "src19" -> 4.0)
    for (rep <- 1 to 2) {
      time(s"budget_mix_sf01_$rep")(graft.ops.Sampling.budgetedMixture(
        docs01, "source", weights, 60000L).count())
      time(s"budget_mix_sf1_$rep")(graft.ops.Sampling.budgetedMixture(
        docs, "source", weights, 600000L).count())
      time(s"script_sf01_$rep")(graft.ops.TextAnalysis.scriptSignals(docs01)
        .where(col("dominant_script") === "latin").count())
      time(s"script_sf1_$rep")(graft.ops.TextAnalysis.scriptSignals(docs)
        .where(col("dominant_script") === "latin").count())
    }
    time("split_safe_sf1") {
      val cl = Dedup.clusters(Dedup.minhashCandidatePairs(docs))
      graft.ops.Sampling.leakageSafeSplit(docs, cl).groupBy("split").count().count()
    }
    }
    // round-11: shared-graph split safety — curate + leakage-safe split
    // + audit paying the minhash→cluster graph TWICE (the standalone
    // composition round 10 shipped) vs ONCE (the chain's exposed
    // cluster table + SplitMode.LeakageSafe)
    if (section == "graphshare") {
    import graft.ops.{Curation, Sampling}
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val evald = docs.filter(col("doc_id") % 50 === 0)
    val rates = Map("src0" -> 1.0, "src1" -> 0.3, "src2" -> 0.0)
    for (rep <- 1 to 2) {
      time(s"gs_two_graphs_$rep") {
        val r = Curation.curateWithFunnel(train, evald, rates = rates, defaultRate = 0.5)
        val cl2 = Dedup.clusters(Dedup.minhashCandidatePairs(train)) // the re-run
        val sp = Sampling.leakageSafeSplit(r.manifest.select("doc_id"), cl2)
        r.funnel.count() + Sampling.splitLeakageAudit(sp, cl2).count()
      }
      time(s"gs_shared_graph_$rep") {
        val r = Curation.curateWithFunnel(train, evald, rates = rates, defaultRate = 0.5,
          split = Curation.SplitMode.LeakageSafe)
        r.funnel.count() + Sampling.splitLeakageAudit(r.manifest, r.clusters).count()
      }
    }
    }
    // round-11: the new curation signals at both scales — all designed
    // scan-bound (blocklist: one tokenize pass + literal-array member
    // test; pii/mojibake: row-parallel regexp passes; spectrum: one
    // corpus-sized combinable groupBy then histogram-sized work)
    if (section == "r11b") {
    import graft.ops.TextAnalysis
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (rep <- 1 to 2) {
      time(s"blocklist_sf01_$rep")(TextAnalysis.blocklistSignals(docs01)
        .where(!col("keep")).count())
      time(s"blocklist_sf1_$rep")(TextAnalysis.blocklistSignals(docs)
        .where(!col("keep")).count())
      time(s"pii_sf01_$rep")(TextAnalysis.piiSignals(docs01)
        .where(col("n_ips") + col("n_ssns") + col("n_phones") > 0).count())
      time(s"pii_sf1_$rep")(TextAnalysis.piiSignals(docs)
        .where(col("n_ips") + col("n_ssns") + col("n_phones") > 0).count())
      time(s"mojibake_sf01_$rep")(TextAnalysis.mojibakeSignals(docs01)
        .where(col("is_mojibake")).count())
      time(s"mojibake_sf1_$rep")(TextAnalysis.mojibakeSignals(docs)
        .where(col("is_mojibake")).count())
      time(s"spectrum_sf01_$rep")(Dedup.duplicationSpectrum(docs01).count())
      time(s"spectrum_sf1_$rep")(Dedup.duplicationSpectrum(docs).count())
      time(s"code_detect_sf01_$rep")(TextAnalysis.codeSignals(docs01)
        .where(col("is_code")).count())
      time(s"code_detect_sf1_$rep")(TextAnalysis.codeSignals(docs)
        .where(col("is_code")).count())
      time(s"passages_sf01_$rep")(TextAnalysis.passages(docs01).count())
      time(s"passages_sf1_$rep")(TextAnalysis.passages(docs).count())
      // the 10x corpus is 10 doc_id-shifted copies: every fingerprint's
      // df multiplies by 10, so the SAME maxDf discipline that guards
      // boilerplate guards the dense corpus — pairs stay bounded
      time(s"fp_pairs_sf01_$rep")(Dedup.fingerprintPairs(docs01).count())
      time(s"fp_pairs_sf1_$rep")(Dedup.fingerprintPairs(docs).count())
    }
    }
    // round-11: BPE at production depth — (a) the driver-local trainer
    // vs the distributed per-merge loop at depth 100 (the >=10x
    // merges/sec claim), (b) local training to depth 2000, (c) serving
    // through the native min-rank encoder at depth 2000 at both scales
    // (scan-bound: wall-clock should track the data ratio)
    if (section == "bpe") {
    import graft.ops.Bpe
    val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("bpe_train_dist_d100")(Bpe.trainMergesDistributed(
      docs01, 100, 1L, graft.core.Materialize.LocalCheckpoint).size.toLong)
    time("bpe_train_local_d100")(Bpe.trainMerges(docs01, 100, 1L).size.toLong)
    // the fixture corpus' vocabulary saturates at ~90 merges, so the
    // serving-depth probe trains its merge table on a synthetic
    // 3000-word lexicon (driver-local, sub-second) — encode cost
    // depends only on the table's depth, not on where it was learned
    var deep: Seq[(String, String)] = null
    time("bpe_train_local_deep") {
      val rnd = new scala.util.Random(42)
      val lexicon = (1 to 3000).map(_ => (1 to (6 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      val wc = lexicon.zipWithIndex.map { case (w, i) => (w, 1L + (i % 5)) }.toArray
      deep = Bpe.trainMergesLocal(wc, 4000, 1L).map(m => (m.lhs, m.rhs))
      deep.size.toLong
    }
    for (rep <- 1 to 2) {
      time(s"bpe_tokens_sf01_deep_$rep")(Bpe.tokenCounts(docs01, deep).count())
      time(s"bpe_tokens_sf1_deep_$rep")(Bpe.tokenCounts(docs, deep).count())
    }
    }
    // dev diagnosis for the stream section: ONE batch file read
    // statically through the watcher's reader schema, each gate stage
    // timed separately, plus the executed plan's regexp_replace count
    // (an inlining blowup shows up as the tokenizer replicated into
    // interpreted lambdas — the round-1 CollapseProject pathology)
    if (section == "streamdbg") {
    import graft.ops.{Curation, Dedup}
    val root = "/tmp/stream_probe"
    val base0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val nb = 5000L
    (0 until 10).map { c =>
      val partner = base0.select(
        ((col("doc_id") + lit(7L * c)) % nb).as("pid"), col("text").as("ptext"))
      base0.join(partner, col("doc_id") % nb === col("pid"))
        .select((lit(c * 100000L) + col("doc_id")).as("doc_id"),
          concat(col("text"), lit(" "), col("ptext")).as("text"), col("source"))
    }.reduce(_ unionByName _)
      .coalesce(4).write.mode("overwrite").json(s"$root/dbg_batch")
    val raw = spark.read
      .schema("doc_id BIGINT, text STRING, source STRING, _corrupt STRING")
      .json(s"$root/dbg_batch")
    val parsed = raw.filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .select(col("doc_id").cast("string").as("doc_id"), col("text"), col("source"))
    def rxCount(d: org.apache.spark.sql.DataFrame): Int =
      "regexp_replace".r.findAllIn(d.queryExecution.executedPlan.toString).length
    time("dbg_parse")(parsed.count())
    val gated = Curation.applyGate(parsed, Curation.QualityGate())
    println(s"PROBE-RX gate=${rxCount(gated)}")
    // the same 50k docs through a PARQUET roundtrip — does the source
    // format change what the optimizer does to the gate?
    parsed.write.mode("overwrite").parquet(s"$root/dbg_pq")
    val gatedPq = Curation.applyGate(
      spark.read.parquet(s"$root/dbg_pq"), Curation.QualityGate())
    println(s"PROBE-RX gate_parquet=${rxCount(gatedPq)}")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/dbg_plan.txt"),
      (gated.queryExecution.optimizedPlan.toString + "\n=====EXECUTED=====\n" +
        gated.queryExecution.executedPlan.toString + "\n=====PARQUET-OPT=====\n" +
        gatedPq.queryExecution.optimizedPlan.toString).getBytes("UTF-8"))
    time("dbg_gate_parquet")(gatedPq.count())
    time("dbg_gate")(gated.count())
    if (!sys.env.contains("STREAMDBG_FULL")) { spark.stop(); sys.exit(0) }
    val weights = Curation.classifierWeights(
      base0.filter(col("source").isin("src15", "src16", "src17", "src18", "src19")),
      base0.filter(!col("source").isin("src15", "src16", "src17", "src18", "src19")))
    val scored = gated.join(
      Curation.classifierScore(gated, weights).filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    println(s"PROBE-RX classifier=${rxCount(scored)}")
    time("dbg_classifier")(scored.count())
    val evalSh = Dedup.evalShingles(base0.filter(col("doc_id") % 50 === 0))
    val uncontam = scored.join(Dedup.contaminatedIdsAgainst(scored, evalSh),
      Seq("doc_id"), "left_anti")
    println(s"PROBE-RX decontam=${rxCount(uncontam)}")
    time("dbg_decontam")(uncontam.count())
    val bd = Dedup.minhashBands(uncontam)
    println(s"PROBE-RX bands=${rxCount(bd)}")
    time("dbg_bands")(bd.count())
    time("dbg_within")(Dedup.dropNearDuplicates(uncontam).count())
    }
    // round-11: the FULL streaming curate stack at sf1 batch sizes —
    // 8 batches x 50k docs through startJsonl with every gate enabled
    // (quality + classifier + decontam + history/within dedup + mixture
    // + span strip + metrics + drift + index merge). Batch texts are
    // PAIRS of base docs with a batch/copy-specific partner shift, so
    // the feed is mostly-distinct (near-dup Jaccard across halves ~1/3,
    // under the band scheme's threshold) while every frozen artifact
    // (classifier weights, eval shingles) still fires — the shape a
    // daily crawl actually has. What to read off the timings: per-batch
    // wall time vs batch index. The gates are history-free (flat); the
    // dedup/span joins scan accumulated KEY tables (linear in history,
    // by design — keys, never text); the snapshot rewrite is the one
    // stage linear in the INDEX (the documented plain-parquet stand-in
    // for a Delta MERGE). No stage may grow super-linearly.
    // "stream12" = the same harness with the round-12 stages swapped
    // in: paragraph-history strip + periodic compaction + the ADAPTIVE
    // mixture gate in place of the fixed-rate one
    // "stream13" = stream12 + the sentence-span strip stage (the full
    // coarse->fine strip ladder: paragraph -> 3-sentence span ->
    // substring), pricing the C4 stage inside the complete stack
    // "stream14" = stream13 + the URL-identity gate on a 50%-recrawl
    // feed (even base ids share a canonical URL across batches and
    // copies): the gate should SHRINK every downstream stage
    // "stream15" = stream13 + the CHANGE-AWARE gate (recrawlDir) on a
    // recrawl feed whose even pages are STABLE content (unchanged
    // re-fetch every batch; only the %16==0 slice revs per batch):
    // the gate must drop the unchanged majority at pair-probe cost
    // while the revved slice flows through to re-extraction
    if (section == "stream" || section == "stream12" || section == "stream13" ||
        section == "stream14" || section == "stream15") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    import graft.streaming.CorpusWatcher
    import graft.ops.{Curation, Dedup, Sampling}
    val root =
      if (section == "stream15") "/tmp/stream15_probe"
      else if (section == "stream14") "/tmp/stream14_probe"
      else if (section == "stream13") "/tmp/stream13_probe"
      else if (section == "stream12") "/tmp/stream12_probe"
      else "/tmp/stream_probe"
    def rmrf(p: String): Unit = {
      val d = Paths.get(p)
      if (Files.exists(d)) {
        val w = Files.walk(d)
        try w.iterator().asScala.toVector.reverseIterator.foreach(Files.deleteIfExists(_))
        finally w.close()
      }
    }
    rmrf(root)
    val watch = s"$root/watch"; Files.createDirectories(Paths.get(watch))
    val (index, ckpt, quar, bands, spans, metrics, drift) =
      (s"$root/index", s"$root/ckpt", s"$root/quar", s"$root/bands",
        s"$root/spans", s"$root/metrics", s"$root/drift")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val nBase = 5000L
    // frozen serving artifacts, trained ONCE from the base corpus and
    // materialized (production serves stored tables, not live plans)
    val dom = base.withColumn("w",
      col("source").isin("src15", "src16", "src17", "src18", "src19"))
    Curation.classifierWeights(dom.filter(col("w")), dom.filter(!col("w")))
      .write.mode("overwrite").parquet(s"$root/weights")
    // w=8 shingles, not the oracle default 3: the feed's docs are
    // base-text pairs, and at w=3 virtually every doc shares some
    // trigram with the 100-doc eval suite (99.8% contaminated — a
    // vacuous feed); at w=8 only docs embedding a true eval run match
    val decontamW = 8
    Dedup.evalShingles(base.filter(col("doc_id") % 50 === 0), decontamW)
      .write.mode("overwrite").parquet(s"$root/eval_shingles")
    val weights = spark.read.parquet(s"$root/weights")
    val evalSh = spark.read.parquet(s"$root/eval_shingles")
    val rates = Map("src0" -> 1.0, "src1" -> 0.3, "src2" -> 0.0)
    val nBatches = 8
    // batch i = 10 partner-shifted copies of the base corpus: doc (c, j)
    // pairs base text j with base text (j + 13i + 7c) mod 5000 — all
    // (i, c) shifts are distinct (gcd(13,7)=1, ranges too small for a
    // collision), so no exact dup ever repeats across the feed
    def batchDf(i: Int) = (0 until 10).map { c =>
      val partner = base.select(
        ((col("doc_id") + lit(13L * i + 7L * c)) % nBase).as("pid"),
        col("text").as("ptext"))
      base.join(partner, col("doc_id") % nBase === col("pid"))
        .select(
          (lit(i * 1000000L + c * 100000L) + col("doc_id")).as("doc_id"),
          (if (section != "stream15") concat(col("text"), lit(" "), col("ptext"))
           else
             // stream15 text: even base ids are STABLE pages (base
             // text verbatim — same every batch and copy) except the
             // %16==0 slice which revs once per batch; odd ids keep
             // the fresh pair text
             when(col("doc_id") % 2 === 0,
               when(col("doc_id") % 16 === 0,
                 concat(col("text"), lit(" revision "), lit(i)))
                 .otherwise(col("text")))
               .otherwise(concat(col("text"), lit(" "), col("ptext"))))
            .as("text"),
          col("source"))
    }.reduce(_ unionByName _)
      .transform(df =>
        // stream14/15: even base ids re-use one canonical URL per base
        // doc across batches AND copies (a 50% re-crawl feed); odd
        // ids are genuinely fresh fetches
        if (section != "stream14" && section != "stream15") df
        else df.withColumn("url",
          when(col("doc_id") % 2 === 0,
            // host AND path key on the base id, so the same page
            // re-crawled in any batch/copy yields the same canon URL
            concat(lit("https://WWW.h"), (col("doc_id") % nBase) % 97,
              lit(".example.org/p/"), col("doc_id") % nBase,
              lit("?utm_source=feed")))
            .otherwise(concat(lit("https://h"), col("doc_id") % 97,
              lit(".example.org/u/"), col("doc_id")))))
    for (i <- 1 to nBatches) {
      val stage = s"$root/stage_$i"
      batchDf(i).coalesce(4).write.mode("overwrite").json(stage)
      val files = Files.list(Paths.get(stage))
      try files.iterator().asScala.filter(_.getFileName.toString.endsWith(".json"))
        .zipWithIndex.foreach { case (p, k) =>
          Files.move(p, Paths.get(watch, s"batch_${i}_$k.json"),
            StandardCopyOption.ATOMIC_MOVE) }
      finally files.close()
      time(f"stream_batch_$i%02d") {
        CorpusWatcher.startJsonl(spark, watch, index, ckpt, quar,
          dedupBandsDir = Some(bands), dedupWithinBatch = true,
          qualityGate = Some(Curation.QualityGate()),
          classifierGate = Some(Curation.ClassifierGate(weights)),
          decontamShingles = Some(evalSh), decontamW = decontamW,
          mixtureGate =
            if (section == "stream") Some(Sampling.MixtureGate(rates, defaultRate = 0.5))
            else None,
          adaptiveMixtureGate =
            if (section == "stream") None
            else Some(Sampling.AdaptiveMixtureGate(s"$root/mixstats", temperature = 2.0)),
          paraHistoryDir = if (section == "stream") None else Some(s"$root/paras"),
          compactEvery = if (section == "stream") None else Some(3),
          sentenceSpanHistoryDir =
            if (section == "stream13" || section == "stream14" || section == "stream15")
              Some(s"$root/sspans")
            else None,
          urlHistoryDir =
            if (section == "stream14") Some(s"$root/urls") else None,
          recrawlDir =
            if (section == "stream15") Some(s"$root/fetches") else None,
          spanHistoryDir = Some(spans),
          metricsDir = Some(metrics), driftDir = Some(drift))
          .awaitTermination()
        spark.read.parquet(s"$index/" + new String(
          Files.readAllBytes(Paths.get(index, "LATEST")), "UTF-8").trim).count()
      }
    }
    spark.read.parquet(metrics).orderBy("batch_id", "stage_idx")
      .collect().foreach(r => println(s"PROBE-FUNNEL ${r.mkString(" ")}"))
    // stage attribution for the LAST batch: replay its composition
    // step-by-step against the accumulated history (excluding the
    // batch's own partitions — the watcher's replay discipline).
    // Cumulative counts, curatestages-style: read deltas between rows.
    val lastId = nBatches - 1L
    val lastRaw = spark.read
      .schema("doc_id BIGINT, text STRING, source STRING, _corrupt STRING")
      .json(s"$watch/batch_${nBatches}_*.json")
    val parsed = lastRaw.filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .select(col("doc_id").cast("string").as("doc_id"), col("text"), col("source"))
    time("ss_parsed")(parsed.count())
    val gated = Curation.applyGate(parsed, Curation.QualityGate())
    time("ss_quality")(gated.count())
    val scored = gated.join(
      Curation.classifierScore(gated, weights).filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    time("ss_classifier")(scored.count())
    val uncontam = scored.join(Dedup.contaminatedIdsAgainst(scored, evalSh, decontamW),
      Seq("doc_id"), "left_anti")
    time("ss_decontam")(uncontam.count())
    val bandHist = spark.read.parquet(bands).filter(col("batch_id") =!= lastId)
    val afterHist = Dedup.dropDuplicatesAgainst(uncontam, bandHist)
    time("ss_dedup_history")(afterHist.count())
    val within = Dedup.dropNearDuplicates(afterHist)
    time("ss_dedup_within")(within.count())
    time("ss_bands_build")(Dedup.minhashBands(within).count())
    val mixed = Sampling.mixture(within, "source", "doc_id", rates, 0.5)
    time("ss_mixture")(mixed.count())
    val spanHist = spark.read.parquet(spans).filter(col("batch_id") =!= lastId)
    val stripped = Dedup.stripDuplicateSpansAgainst(mixed, spanHist)
      .select(col("doc_id"), col("text"))
    time("ss_span_strip")(stripped.agg(sum(length(col("text")))).head.getLong(0))
    time("ss_anchor_sites")(Dedup.anchorSites(stripped).count())
    val old = CorpusWatcher.currentIndex(spark, index)
    time("ss_drift") {
      val hist = old.select(graft.ops.TextAnalysis.bucketOf(col("word"), 1024).as("b"),
        col("cnt")).groupBy("b").agg(sum("cnt").as("c"))
      graft.ops.TextAnalysis.driftFromCounts(
        graft.ops.TextAnalysis.bucketCounts(stripped, 1024), hist, 1024, spark).count()
    }
    val delta = graft.index.InvertedIndex.build(stripped, idCol = "doc_id")
    time("ss_index_delta")(delta.count())
    time("ss_index_merge")(graft.index.InvertedIndex.upsertDocs(old, delta).count())
    }
    if (section == "all" || section == "emb") {
    // ~sf1 embeddings: 10 vec_id-shifted copies
    // _SUCCESS, not bare existence: a crashed prior run leaves a
    // partial directory that would silently skew timings and counts
    if (!new java.io.File("/tmp/emb_sf1/_SUCCESS").exists()) {
      val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      // SAME shift as the r11c builder below: both sections share the
      // /tmp cache, so divergent layouts would make probe numbers
      // depend on which section ran first (review catch)
      (0 until 10).map(i => base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet("/tmp/emb_sf1")
    }
    val emb = spark.read.parquet("/tmp/emb_sf1")
    time("quantize_int8")(graft.ops.Similarity.quantizeInt8(emb).count())
    time("cosine_dups")(graft.ops.Similarity.cosineDupPairs(emb, 0.8).count())
    time("kmeans_assign")(graft.ops.Similarity.kmeansAssignments(emb).count())
    time("pq_codes")(graft.ops.Similarity.pqCodes(emb).count())
    time("pq_topk")(graft.ops.Similarity.pqTopK(
      emb.filter(col("vec_id") % 10000 === 0), emb, 10).count())
    time("ivf_kmeans_centroids") {
      val cents = graft.ops.Similarity.kmeans(emb).select("cell_id", "cv")
      graft.ops.Similarity.ivfTopK(
        emb.filter(col("vec_id") % 10000 === 0), emb, 10, nprobe = 4,
        centroids = Some(cents)).count()
    }
    // composed IVF+PQ (train + search, raw and residual) at ~sf1 —
    // the round-5 item: does the full composition track the data ratio
    // like its tiers do?
    time("ivfpq_sf1")(graft.ops.Similarity.ivfpqTopK(
      emb.filter(col("vec_id") % 10000 === 0), emb, 10,
      nprobe = 8, coarseIterations = 2).count())
    time("ivfpq_residual_sf1")(graft.ops.Similarity.ivfpqResidualTopK(
      emb.filter(col("vec_id") % 10000 === 0), emb, 10,
      nprobe = 8, coarseIterations = 2).count())
    // the sf0.1-sized twin of pq_topk (same 2-query probe density):
    // with the FixedK(32) default the sf1/sf0.1 ratio should track the
    // data ratio (~10x), where the Modulo seed showed 12x+ and growing
    val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    time("pq_topk_sf01")(graft.ops.Similarity.pqTopK(
      emb01.filter(col("vec_id") % 1000 === 0), emb01, 10).count())
    time("kmeans_assign_sf01")(graft.ops.Similarity.kmeansAssignments(emb01).count())
    time("ivfpq_sf01")(graft.ops.Similarity.ivfpqTopK(
      emb01.filter(col("vec_id") % 1000 === 0), emb01, 10,
      nprobe = 8, coarseIterations = 2).count())
    time("ivfpq_residual_sf01")(graft.ops.Similarity.ivfpqResidualTopK(
      emb01.filter(col("vec_id") % 1000 === 0), emb01, 10,
      nprobe = 8, coarseIterations = 2).count())
    // round-8: semantic dedup — FixedK(32) blocking means avg cluster
    // size grows linearly with n, so within-cluster pair work grows
    // ~n²/k; the probe makes that visible (at a real 100 TB run you
    // grow k with the corpus to hold n/k constant, per the SemDeDup
    // paper's 50k clusters for 5B embeddings)
    time("semantic_dups_sf01")(graft.ops.Similarity.semanticDupPairs(
      emb01, threshold = 0.35).count())
    time("semantic_dups_sf1")(graft.ops.Similarity.semanticDupPairs(
      emb, threshold = 0.35).count())
    time("semantic_dups_sf1_k320")(graft.ops.Similarity.semanticDupPairs(
      emb, threshold = 0.35,
      seed = graft.ops.Similarity.CentroidSeed.FixedK(320)).count())
    }
    // round-11 second half: source overlap (one shingle scan + one
    // combinable groupBy(source); the pair join is source-count-sized),
    // context plan (one tokenize scan + one bucket-keyed window),
    // profiler (one scan, Expand for the distincts), embedding
    // outliers (one distance scan + label-keyed percentiles)
    if (section == "r11c") {
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val emb10 = {
        if (!new java.io.File("/tmp/emb_sf1/_SUCCESS").exists()) {
          val base = emb01
          (0 until 10).map(i => base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
            .reduce(_ unionByName _)
            .write.mode("overwrite").parquet("/tmp/emb_sf1")
        }
        spark.read.parquet("/tmp/emb_sf1")
      }
      for (rep <- 1 to 2) {
        time(s"source_overlap_sf01_$rep")(Dedup.sourceOverlap(docs01).count())
        time(s"source_overlap_sf1_$rep")(Dedup.sourceOverlap(docs).count())
        time(s"context_plan_sf01_$rep")(
          graft.ops.Sampling.contextPlan(docs01, 2048, 32).count())
        time(s"context_plan_sf1_$rep")(
          graft.ops.Sampling.contextPlan(docs, 2048, 32).count())
        time(s"profile_docs_sf01_$rep")(graft.ops.Relational.profile(docs01).count())
        time(s"profile_docs_sf1_$rep")(graft.ops.Relational.profile(docs).count())
        time(s"emb_outliers_sf01_$rep")(
          graft.ops.Similarity.embeddingOutliers(emb01).where(col("is_outlier")).count())
        time(s"emb_outliers_sf1_$rep")(
          graft.ops.Similarity.embeddingOutliers(emb10).where(col("is_outlier")).count())
        time(s"containment_sf01_$rep")(Dedup.containmentPairs(docs01).count())
        time(s"containment_sf1_$rep")(Dedup.containmentPairs(docs).count())
        time(s"readability_sf01_$rep")(
          graft.ops.TextAnalysis.readability(docs01).count())
        time(s"readability_sf1_$rep")(
          graft.ops.TextAnalysis.readability(docs).count())
        time(s"corpus_health_sf01_$rep")(
          graft.ops.TextAnalysis.corpusHealth(docs01).count())
        time(s"corpus_health_sf1_$rep")(
          graft.ops.TextAnalysis.corpusHealth(docs).count())
      }
    }
    // round-12 additions: trigram LM (three model-keyed joins + one
    // groupBy(doc_id)), paragraph dedup (hash-only shuffle, text
    // re-derived), span eval (sample-bounded by contract — sampleMod
    // scales with the corpus so the diagnostic stays fixed-cost),
    // shard manifest (one tokenize scan + one combinable groupBy)
    if (section == "r12") {
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      for (rep <- 1 to 2) {
        time(s"lm3_score_sf01_$rep")(graft.ops.TextAnalysis.lm3ScoreAgainst(
          docs01, docs01.filter(col("source") =!= "src0")).count())
        time(s"lm3_score_sf1_$rep")(graft.ops.TextAnalysis.lm3ScoreAgainst(
          docs, docs.filter(col("source") =!= "src0")).count())
        time(s"para_dedup_sf01_$rep")(Dedup.paragraphDedup(docs01, "\\n+").count())
        time(s"para_dedup_sf1_$rep")(Dedup.paragraphDedup(docs, "\\n+").count())
        time(s"span_eval_sf01_$rep")(Dedup.spanEval(docs01).count())
        // 10x corpus, 10x sampleMod: the sample (and so the cost)
        // should hold ~flat — that is the op's scale contract
        time(s"span_eval_sf1_$rep")(Dedup.spanEval(docs, sampleMod = 40).count())
        time(s"shard_manifest_sf01_$rep")(
          graft.ops.Sampling.shardManifest(docs01, 4096).count())
        time(s"shard_manifest_sf1_$rep")(
          graft.ops.Sampling.shardManifest(docs, 4096).count())
        time(s"write_shards_sf1_$rep")(graft.ops.Sampling.writeShards(
          docs, s"/tmp/shards_probe_$rep", 4096).count())
      }
    }

    // round-13 additions: 5-gram LM (model-sized serving must hold at
    // 10x), unicode-tokenizer minhash (same plan shape as ASCII — the
    // tok dial must not change the scale contract), byte-level BPE
    // counting, and the fused paragraph strip (the stream12 hot stage,
    // measured standalone)
    if (section == "r13") {
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val tokU = graft.core.TextNorm.tokensUnicode _
      for (rep <- 1 to 2) {
        time(s"lm5_score_sf01_$rep")(graft.ops.TextAnalysis.lm5ScoreAgainst(
          docs01, docs01.filter(col("source") =!= "src0")).count())
        time(s"lm5_score_sf1_$rep")(graft.ops.TextAnalysis.lm5ScoreAgainst(
          docs, docs.filter(col("source") =!= "src0")).count())
        time(s"minhash_uni_sf01_$rep")(
          Dedup.minhashCandidatePairs(docs01, tok = tokU).count())
        time(s"minhash_uni_sf1_$rep")(
          Dedup.minhashCandidatePairs(docs, tok = tokU).count())
        val merges = graft.ops.Bpe.trainMerges(docs01, 32, byteLevel = true)
          .map(m => (m.lhs, m.rhs))
        time(s"bpe_bytes_count_sf01_$rep")(
          graft.ops.Bpe.tokenCounts(docs01, merges, byteLevel = true).count())
        time(s"bpe_bytes_count_sf1_$rep")(
          graft.ops.Bpe.tokenCounts(docs, merges, byteLevel = true).count())
        // fused vs unfused paragraph strip+append over a history built
        // from a shifted half of the corpus (the streaming hot path)
        val hist = Dedup.paragraphHashes(docs.filter(col("doc_id") % 2 === 0), "\\n+")
          .localCheckpoint()
        time(s"para_strip_fused_sf1_$rep") {
          val (stripped, hashes) =
            Dedup.stripParagraphsWithHashes(docs, hist, "\\n+")
          stripped.count() + hashes.count()
        }
        time(s"para_strip_unfused_sf1_$rep") {
          val stripped = Dedup.stripParagraphsAgainst(docs, hist, "\\n+")
            .select(col("doc_id"), col("text")).localCheckpoint()
          Dedup.paragraphHashes(stripped, "\\n+").count() + stripped.count()
        }
        // the streaming batch-dedup chain (history filter + within-batch
        // + band append), one signature pass vs three — the r13 stream
        // rewiring, isolated from the rest of the stream's stages
        val bHist = Dedup.minhashBands(docs.filter(col("doc_id") % 2 === 0))
          .localCheckpoint()
        val inc = docs.filter(col("doc_id") % 2 =!= 0)
        time(s"dedup_chain_unshared_sf1_$rep") {
          val after = Dedup.dropDuplicatesAgainst(inc, bHist).persist()
          val survivors = Dedup.dropNearDuplicates(after).persist()
          val n = Dedup.minhashBands(survivors).count() + survivors.count()
          after.unpersist(); survivors.unpersist(); n
        }
        time(s"dedup_chain_shared_sf1_$rep") {
          val bands0 = Dedup.minhashBands(inc).persist()
          val after = Dedup.dropDuplicatesAgainstBands(inc, bands0, bHist).persist()
          val bandsAfter = bands0.join(after.select("doc_id"), Seq("doc_id"), "left_semi")
          val survivors = after.join(Dedup.nearDupLosersFromBands(bandsAfter),
            Seq("doc_id"), "left_anti").persist()
          val n = bands0.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi").count() +
            survivors.count()
          bands0.unpersist(); after.unpersist(); survivors.unpersist(); n
        }
      }
    }
    if (section == "r13c") {
      // crawl-front stages at 10x: both are row-local regex algebra, so
      // cost must track total text bytes linearly with zero shuffle.
      // count() would let pruning skip the rewrite entirely (the span
      // probe lesson) — force the text through an aggregate instead.
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def wrap(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        concat(lit("<html><head><title>T</title><style>b { color: red; }</style></head><body><p>"),
          regexp_replace(col("text"), " the ", " <b>the</b> "),
          lit(".</p><ul><li><a href=/x>nav one</a></li></ul></body></html>")).as("text"))
      for (rep <- 1 to 2) {
        time(s"html_text_sf01_$rep")(graft.ops.Html.htmlToText(wrap(docs01))
          .agg(sum(length(col("text")))).collect().length.toLong)
        time(s"html_text_sf1_$rep")(graft.ops.Html.htmlToText(wrap(docs))
          .agg(sum(length(col("text")))).collect().length.toLong)
        time(s"html_signals_sf01_$rep")(graft.ops.Html.htmlSignals(wrap(docs01))
          .agg(sum(col("n_tags")), sum(col("anchor_chars")), sum(col("n_chars_text"))).collect().length.toLong)
        time(s"html_signals_sf1_$rep")(graft.ops.Html.htmlSignals(wrap(docs))
          .agg(sum(col("n_tags")), sum(col("anchor_chars")), sum(col("n_chars_text"))).collect().length.toLong)
        time(s"c4_stats_sf01_$rep")(graft.ops.TextAnalysis.c4LineStats(docs01)
          .agg(sum(col("n_kept")), sum(col("n_sentences"))).collect().length.toLong)
        time(s"c4_stats_sf1_$rep")(graft.ops.TextAnalysis.c4LineStats(docs)
          .agg(sum(col("n_kept")), sum(col("n_sentences"))).collect().length.toLong)
        time(s"c4_clean_sf1_$rep")(graft.ops.TextAnalysis.c4Clean(docs, minSentences = 0)
          .agg(sum(length(col("text")))).collect().length.toLong)
        // the composed crawl front (extract then clean), the stream's
        // two-stage path in one plan
        time(s"html_c4_sf1_$rep")(
          graft.ops.TextAnalysis.c4Clean(graft.ops.Html.htmlToText(wrap(docs)))
            .agg(sum(length(col("text")))).collect().length.toLong)
        // line classification: the explode face (rows ~ lines) vs the
        // array-level main-text rewrite (no explode, no regroup)
        time(s"html_lines_sf1_$rep")(
          graft.ops.Html.htmlLines(wrap(docs))
            .agg(sum(col("n_words")), sum(col("anchor_chars"))).collect().length.toLong)
        time(s"html_main_sf1_$rep")(
          graft.ops.Html.htmlMainText(wrap(docs))
            .agg(sum(length(col("text")))).collect().length.toLong)
      }
    }
    if (section == "r13b") {
      // sentence-span dedup (C4 rule): 10x docs — hash-only shuffle,
      // cost should track sentence count linearly; the /tmp sf1 corpus
      // is 10 shifted copies, so cross-copy spans ALL duplicate (dense
      // worst case for the winner groupBy)
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      for (rep <- 1 to 2) {
        time(s"sentence_spans_sf01_$rep")(Dedup.sentenceSpanDedup(docs01).count())
        time(s"sentence_spans_sf1_$rep")(Dedup.sentenceSpanDedup(docs).count())
        // hybrid retrieval: corpus-side scale lives in the two arms
        // (index agg + brute cosine) — BOTH must see 10x data, so the
        // sf1 leg reads the shared /tmp/emb_sf1 cache (same builder as
        // the emb section; _SUCCESS-guarded); fusion stays a
        // ≤2·poolK-row window either way
        if (!new java.io.File("/tmp/emb_sf1/_SUCCESS").exists()) {
          (0 until 10).map(i =>
            emb01.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
            .reduce(_ unionByName _)
            .write.mode("overwrite").parquet("/tmp/emb_sf1")
        }
        val emb1 = spark.read.parquet("/tmp/emb_sf1")
        time(s"hybrid_sf01_$rep")(graft.index.InvertedIndex.hybridTopK(
          docs01, emb01, "fast hash join on a small table",
          emb01.filter(col("vec_id") === 0), k = 20, poolK = 50).count())
        time(s"hybrid_sf1_$rep")(graft.index.InvertedIndex.hybridTopK(
          docs.select(col("doc_id"), col("text")),
          emb1, "fast hash join on a small table",
          emb1.filter(col("vec_id") === 0), k = 20, poolK = 50).count())
        // interpolated KN at the KenLM deployment order: model tables
        // size every shuffle (distinct n-grams), serving is suffix
        // joins — cost should track lm5's, not explode with the
        // continuation-count derivation
        val ref01 = docs01.filter(col("source") =!= "src0")
        val ref1 = docs.filter(col("source") =!= "src0")
        time(s"kn5_score_sf01_$rep")(graft.ops.TextAnalysis.knScoreWith(
          docs01, graft.ops.TextAnalysis.knModel(ref01, 5)).count())
        time(s"kn5_score_sf1_$rep")(graft.ops.TextAnalysis.knScoreWith(
          docs, graft.ops.TextAnalysis.knModel(ref1, 5)).count())
      }
    }
    if (section == "r13d") {
      // crawl graph at 10x: canonicalization/extraction are row-local
      // (cost tracks bytes, zero shuffle); the dedup gate shuffles
      // 16-byte keys; PageRank moves the NODE-sized rank table per
      // iteration — node count is held at 5001 hosts while doc count
      // grows 10x, so rank cost must stay near-flat as edges dedup.
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def pages(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("HTTPS://WWW.h"), col("doc_id") % 5000,
          lit(".Example.org:443/d/"), col("doc_id"),
          lit("/?utm_source=probe&b=2&a=1#f")).as("url"),
        concat(lit("<a href=\"https://h"), (col("doc_id") + 7) % 5000,
          lit(".example.org/p\">n</a><a href=\"//h"), (col("doc_id") * 31) % 5000,
          lit(".example.org/q?b=2&amp;a=1\">m</a>"),
          when(col("doc_id") % 97 === 0,
            lit("<a href=\"https://sink.example.org/end\">s</a>")).otherwise(lit(""))
        ).as("text"))
      for (rep <- 1 to 2) {
        time(s"url_canon_sf01_$rep")(graft.ops.Crawl.urlCanon(pages(docs01))
          .agg(sum(length(col("canon_url")))).collect().length.toLong)
        time(s"url_canon_sf1_$rep")(graft.ops.Crawl.urlCanon(pages(docs))
          .agg(sum(length(col("canon_url")))).collect().length.toLong)
        time(s"url_dedup_sf01_$rep")(graft.ops.Crawl.urlDuplicates(pages(docs01))
          .filter(!col("keep")).count())
        time(s"url_dedup_sf1_$rep")(graft.ops.Crawl.urlDuplicates(pages(docs))
          .filter(!col("keep")).count())
        time(s"link_edges_sf01_$rep")(graft.ops.Crawl.linkHostEdges(pages(docs01)).count())
        time(s"link_edges_sf1_$rep")(graft.ops.Crawl.linkHostEdges(pages(docs)).count())
        time(s"domain_rank_sf01_$rep")(graft.ops.Crawl.domainRank(
          graft.ops.Crawl.linkHostEdges(pages(docs01)), iters = 3).count())
        time(s"domain_rank_sf1_$rep")(graft.ops.Crawl.domainRank(
          graft.ops.Crawl.linkHostEdges(pages(docs)), iters = 3).count())
        time(s"hits_sf01_$rep")(graft.ops.Crawl.hits(
          graft.ops.Crawl.linkHostEdges(pages(docs01)), iters = 3).count())
        time(s"hits_sf1_$rep")(graft.ops.Crawl.hits(
          graft.ops.Crawl.linkHostEdges(pages(docs)), iters = 3).count())
        time(s"corpus_diff_sf1_$rep")(graft.ops.Crawl.corpusDiff(
          docs, docs.filter(col("doc_id") % 7 =!= 3)).count())
      }
    }
    if (section == "r14b") {
      // the round's second wave at 10x: BFS depth, template mining +
      // guard, recrawl policy, gap fill. Graph/URL shapes ride the r14
      // hub+tail page synthesizer (one mega-hub host, 5k tail hosts).
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def pages(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://src"), col("doc_id") % 5000,
          lit(".example.org/d/"), col("doc_id")).as("url"),
        concat(
          lit("<a href=\"https://hub.example.org/p/"), col("doc_id"), lit("\">h</a>"),
          lit("<a href=\"https://tail"), col("doc_id") % 5000,
          lit(".example.org/q/"), col("doc_id"), lit("\">t</a>")).as("text"))
      def fetches(d: org.apache.spark.sql.DataFrame, urls: Int) = d.select(
        concat(lit("https://r"), col("doc_id") % urls, lit(".example.org/p")).as("url"),
        (lit(1000000L) + col("doc_id")).as("fetch_ts"),
        md5(concat(col("doc_id") % urls,
          lit("#"), (col("doc_id") / urls).cast("long") / 3)).as("content_hash"))
      def series(d: org.apache.spark.sql.DataFrame, keys: Int) = d
        .where(col("doc_id") % 3 =!= 0) // holes to fill
        .select((col("doc_id") % keys).as("key"),
          ((col("doc_id") / keys).cast("long") * 600).as("bucket"),
          col("doc_id").cast("double").as("value"))
        .groupBy("key", "bucket").agg(sum(col("value")).as("value"))
      // BFS probe wants real waves: src hosts form a +7 ring (each doc
      // links the next-stride src host), hub/tails hang off every src
      def pagesRing(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://src"), col("doc_id") % 5000,
          lit(".example.org/d/"), col("doc_id")).as("url"),
        concat(
          lit("<a href=\"https://src"), (col("doc_id") + 7) % 5000,
          lit(".example.org/d/x\">r</a>"),
          lit("<a href=\"https://hub.example.org/p/"), col("doc_id"), lit("\">h</a>"),
          lit("<a href=\"https://tail"), col("doc_id") % 5000,
          lit(".example.org/q/"), col("doc_id"), lit("\">t</a>")).as("text"))
      import spark.implicits._
      val seeds = Seq("src0.example.org").toDF("node")
      for (rep <- 1 to 2) {
        time(s"crawl_depth_sf01_$rep")(graft.ops.Crawl.crawlDepth(
          graft.ops.Crawl.linkHostEdges(pagesRing(docs01)), seeds, maxDepth = 8).count())
        time(s"crawl_depth_sf1_$rep")(graft.ops.Crawl.crawlDepth(
          graft.ops.Crawl.linkHostEdges(pagesRing(docs)), seeds, maxDepth = 8).count())
        time(s"url_templates_sf01_$rep")(
          graft.ops.Crawl.urlTemplates(pages(docs01)).count())
        time(s"url_templates_sf1_$rep")(
          graft.ops.Crawl.urlTemplates(pages(docs)).count())
        time(s"recrawl_sf01_$rep")(
          graft.ops.Crawl.recrawlPolicy(fetches(docs01, 5000)).count())
        time(s"recrawl_sf1_$rep")(
          graft.ops.Crawl.recrawlPolicy(fetches(docs, 5000)).count())
        time(s"gapfill_sf01_$rep")(
          graft.ops.Relational.gapFill(series(docs01, 5000),
            bucketCol = "bucket", valueCol = "value", step = 600L).count())
        time(s"gapfill_sf1_$rep")(
          graft.ops.Relational.gapFill(series(docs, 5000),
            bucketCol = "bucket", valueCol = "value", step = 600L).count())
      }
    }
    if (section == "r15") {
      // round-15 ops at 10x. urlRank: intra-host blocks whose size
      // scales WITH the corpus (500 hosts, each page links its
      // same-host successor and the host hub) — teleport/dangling are
      // per-host aggregates, so cost must track total node count with
      // no global-scalar bottleneck and no per-block cliff. The
      // sharded-bloom frontier must match the single-filter bloom's
      // cost shape (the sharding changes WHERE the bits live, not the
      // probe count). Unigram: training is vocabulary-bound (flat
      // across corpus scale for a fixed vocab), serving is one linear
      // codegen'd scan.
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def pages(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://h"), col("doc_id") % 500,
          lit(".example.org/d/"), col("doc_id")).as("url"),
        concat(
          lit("<a href=\"https://h"), col("doc_id") % 500,
          lit(".example.org/d/"), col("doc_id") + 500, lit("\">n</a>"),
          lit("<a href=\"https://h"), col("doc_id") % 500,
          lit(".example.org/hub\">h</a>")).as("text"))
      val ranks = spark.createDataFrame(Seq(("h1.example.org", 0.9)))
        .toDF("node", "rank")
      for (rep <- 1 to 2) {
        time(s"url_rank_sf01_$rep")(
          graft.ops.Crawl.urlRank(pages(docs01), iters = 2).count())
        time(s"url_rank_sf1_$rep")(
          graft.ops.Crawl.urlRank(pages(docs), iters = 2).count())
        time(s"frontier_bloom_sf1_$rep")(
          graft.ops.Crawl.crawlFrontierBloom(pages(docs), ranks, perHostCap = 10).count())
        time(s"frontier_shard_sf1_$rep")(
          graft.ops.Crawl.crawlFrontierBloomSharded(pages(docs), ranks,
            perHostCap = 10, shards = 8).count())
      }
      time("unigram_train_sf01")(
        graft.ops.Unigram.trainUnigram(docs01, vocabSize = 64).count())
      time("unigram_train_sf1")(
        graft.ops.Unigram.trainUnigram(docs, vocabSize = 64).count())
      val ps = graft.ops.Unigram.collectPieces(
        graft.ops.Unigram.trainUnigram(docs01, vocabSize = 64))
      time("unigram_serve_sf01")(
        graft.ops.Unigram.tokenCounts(docs01, ps).count())
      time("unigram_serve_sf1")(
        graft.ops.Unigram.tokenCounts(docs, ps).count())
    }
    if (section == "r15b") {
      // the second-session ops at 10x. WordPiece: training is
      // vocabulary-bound like the other two trainers (the word table
      // is the one corpus-sized scan; refinement runs on it), serving
      // is one linear codegen'd scan. HLL: the sketch is a combinable
      // groupBy whose shuffle carries <= groups x 512 rows no matter
      // the input size — cost must be scan-bound, and the register
      // table size must NOT grow 10x. JL: projection is O(d*r) per
      // row, one linear scan.
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      time("wordpiece_train_sf01")(
        graft.ops.WordPiece.trainMerges(docs01, 10).length.toLong)
      time("wordpiece_train_sf1")(
        graft.ops.WordPiece.trainMerges(docs, 10).length.toLong)
      val wv = graft.ops.WordPiece.collectVocab(graft.ops.WordPiece.vocab(
        docs01, graft.ops.WordPiece.trainMerges(docs01, 10)))
      time("wordpiece_serve_sf01")(
        graft.ops.WordPiece.tokenCounts(docs01, wv).count())
      time("wordpiece_serve_sf1")(
        graft.ops.WordPiece.tokenCounts(docs, wv).count())
      // HLL over a 10x synthetic event stream (doc_id as the value,
      // 16 groups): register output must stay at <= 16 x 512 rows
      val ev01 = docs01.select((col("doc_id") % 16).as("g"), col("doc_id").as("v"))
      val ev1 = docs.select((col("doc_id") % 16).as("g"), col("doc_id").as("v"))
      for (rep <- 1 to 2) {
        time(s"hll_sketch_sf01_$rep")(
          graft.ops.Hll.sketch(ev01, col("v"), Seq(col("g"))).count())
        time(s"hll_sketch_sf1_$rep")(
          graft.ops.Hll.sketch(ev1, col("v"), Seq(col("g"))).count())
      }
      time("hll_estimate_sf1")(
        graft.ops.Hll.estimate(
          graft.ops.Hll.sketch(ev1, col("v"), Seq(col("g"))), Seq("g")).count())
      // JL over a 10x embedding corpus (10 vec_id-shifted copies)
      val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val emb1 = (0 until 10).map(i =>
        emb01.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
      for (rep <- 1 to 2) {
        time(s"jl_project_sf01_$rep")(
          graft.ops.Similarity.jlProjected(emb01, 64, 16).count())
        time(s"jl_project_sf1_$rep")(
          graft.ops.Similarity.jlProjected(emb1, 64, 16).count())
      }
      time("jl_topk_sf1")(
        graft.ops.Similarity.jlTopK(
          emb1.filter(col("vec_id") % 100000 === 0), emb1, 10, 64, 16).count())
    }
    if (section == "r15c") {
      // third-wave ops at 10x. PhraseMatch: one pass per doc at ANY
      // dictionary size — 5k phrases must cost ~the same as 5.
      // TrustRank: the domainRank plan + a broadcast flag join —
      // node/iteration-bound. DDSketch: scan-bound, bucket table
      // bounded by the value RANGE. Bucketed join: the write amortizes
      // the shuffle; the join itself must beat the plain-parquet join
      // that re-shuffles both sides.
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val few = Seq("a a", "table table", "value fast merge")
      val many = few ++ (1 to 5000).map(i => s"w$i x$i never matches")
      for (rep <- 1 to 2) {
        time(s"phrase_few_sf1_$rep")(
          graft.ops.TextAnalysis.phraseBlocklistSignals(docs, few).count())
        time(s"phrase_5k_sf1_$rep")(
          graft.ops.TextAnalysis.phraseBlocklistSignals(docs, many).count())
      }
      def pages(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://h"), col("doc_id") % 500,
          lit(".example.org/d/"), col("doc_id")).as("url"),
        concat(
          lit("<a href=\"https://h"), (col("doc_id") + 1) % 500,
          lit(".example.org/hub\">n</a>")).as("text"))
      val seeds = spark.createDataFrame(Seq(Tuple1("h1.example.org"))).toDF("node")
      time("trust_rank_sf01")(
        graft.ops.Crawl.trustRank(
          graft.ops.Crawl.linkHostEdges(pages(docs01)), seeds, iters = 3).count())
      time("trust_rank_sf1")(
        graft.ops.Crawl.trustRank(
          graft.ops.Crawl.linkHostEdges(pages(docs)), seeds, iters = 3).count())
      val vals01 = docs01.select((col("doc_id") % 977).cast("double").as("v"))
      val vals1 = docs.select((col("doc_id") % 977).cast("double").as("v"))
      for (rep <- 1 to 2) {
        time(s"dd_sketch_sf01_$rep")(
          graft.ops.DdSketch.sketch(vals01, col("v"), Seq.empty).count())
        time(s"dd_sketch_sf1_$rep")(
          graft.ops.DdSketch.sketch(vals1, col("v"), Seq.empty).count())
      }
      // directive extraction at 10x AFTER the seal fix: row-parallel
      // regex + one sealed urlParts per row — must be scan-linear
      // (the unsealed first cut measured 22-73 s at sf0.1)
      def dpages(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://h"), col("doc_id") % 500,
          lit(".example.org/d/"), col("doc_id")).as("url"),
        concat(col("text"),
          lit("<meta name=\"robots\" content=\"noindex\">"),
          lit("<link rel=\"canonical\" href=\"/d/0\">")).as("text"))
      for (rep <- 1 to 2) {
        time(s"directives_sf01_$rep")(
          graft.ops.Crawl.pageDirectives(dpages(docs01)).count())
        time(s"directives_sf1_$rep")(
          graft.ops.Crawl.pageDirectives(dpages(docs)).count())
      }
      time("canonical_dedup_sf1")(
        graft.ops.Crawl.urlDuplicatesWithCanonical(dpages(docs)).count())
      // bucketed join at 10x: facts keyed by doc_id band
      val fa = docs.select((col("doc_id") % 10007).as("key"), col("doc_id").as("ida"))
      val fb = docs.select((col("doc_id") % 10007).as("key"), (col("doc_id") + 7L).as("idb"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time("bucketed_write_once")({
        graft.sources.BucketedStore.write(fa, "pr_ba", "/tmp/probe_bucketed/a", "key", 32)
        graft.sources.BucketedStore.write(fb, "pr_bb", "/tmp/probe_bucketed/b", "key", 32)
        1L
      })
      val ba = graft.sources.BucketedStore.table(spark, "pr_ba")
      val bb = graft.sources.BucketedStore.table(spark, "pr_bb")
        .withColumnRenamed("key", "key2")
      for (rep <- 1 to 3) {
        time(s"join_bucketed_$rep")(
          ba.join(bb, ba("key") === bb("key2")).count())
        time(s"join_plain_$rep")(
          fa.join(fb.withColumnRenamed("key", "key2"),
            fa("key") === col("key2")).count())
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    if (section == "r16") {
      // round-16 faces at 10x. sitemapTree: root-dominated corpora
      // (every synthetic doc a standalone urlset root) must be
      // scan-linear — the fixpoint's joins touch only the doc-sized
      // edge/self tables, never bodies. WET: the row-parallel
      // write-and-read round trip is two scans. writeShardsBucketed:
      // the co-locating write is the amortized cost, the doc_id join
      // after it must plan ZERO exchanges at any scale.
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def smaps(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://smh"), col("doc_id") % 12,
          lit(".example.org/sm/"), col("doc_id"), lit(".xml")).as("url"),
        concat(lit("<urlset><url><loc>https://h"), col("doc_id") % 12,
          lit(".example.org/d/"), col("doc_id"),
          lit("</loc></url></urlset>")).as("text"))
      for (rep <- 1 to 2) {
        time(s"sitemap_tree_sf01_$rep")(
          graft.ops.Crawl.sitemapTree(smaps(docs01)).count())
        time(s"sitemap_tree_sf1_$rep")(
          graft.ops.Crawl.sitemapTree(smaps(docs)).count())
      }
      def wetDocs(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://h"), col("doc_id") % 500,
          lit(".example.org/d/"), col("doc_id")).as("url"),
        lit("2025-06-01T00:00:00Z").as("fetched_at"), col("text"))
      time("wet_write_sf1")({
        graft.sources.Warc.writeConversions(
          wetDocs(docs).repartition(32), "/tmp/probe_wet"); 1L
      })
      time("wet_read_sf1")(
        graft.sources.Warc.readConversions(spark, "/tmp/probe_wet").count())
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time("shards_bucketed_write_sf1")({
        graft.ops.Sampling.writeShardsBucketed(
          docs.select("doc_id", "text"), "/tmp/probe_bshards", "pr_bshards",
          tokenBudget = 2048, buckets = 32, docBuckets = 32).count()
      })
      val bt = graft.sources.BucketedStore.table(spark, "pr_bshards")
      val sig = docs.select(col("doc_id"), (col("doc_id") % 97).as("sig"))
      graft.sources.BucketedStore.write(sig, "pr_bsig", "/tmp/probe_bsig", "doc_id", 32)
      val bsig = graft.sources.BucketedStore.table(spark, "pr_bsig")
      val joined = bt.join(bsig, Seq("doc_id"))
      println(s"PROBE-STAGE shards_join_exchanges = " +
        graft.sources.BucketedStore.shuffleCount(joined))
      for (rep <- 1 to 2)
        time(s"shards_bucketed_join_$rep")(joined.count())
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    if (section == "r14") {
      // frontier at 10x under MEGA-HUB skew: one host owns ~50% of all
      // candidate links (each doc contributes one distinct hub URL and
      // one tail-host URL). The old window formulation landed the hub's
      // whole candidate list in ONE task and sorted it; the bounded
      // heap forwards <= cap rows per host per map task, so cost must
      // track total link count with no skew cliff. PROBE_WINDOW=1 adds
      // the window formulation for the before/after comparison.
      val docs01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      def pages(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
        concat(lit("https://src"), col("doc_id") % 5000,
          lit(".example.org/d/"), col("doc_id")).as("url"),
        concat(
          lit("<a href=\"https://hub.example.org/p/"), col("doc_id"), lit("\">h</a>"),
          lit("<a href=\"https://tail"), col("doc_id") % 5000,
          lit(".example.org/q/"), col("doc_id"), lit("\">t</a>")).as("text"))
      val ranks = spark.createDataFrame(Seq(("hub.example.org", 0.9)))
        .toDF("node", "rank")
      val robots = spark.createDataFrame(Seq(
        ("hub.example.org", "User-agent: *\nDisallow: /p/*0\nCrawl-delay: 1\n")))
        .toDF("host", "robots_txt")
      val rules = graft.ops.Robots.robotsRules(robots)
      val delays = graft.ops.Robots.crawlDelays(robots)
      for (rep <- 1 to 2) {
        time(s"frontier_skew_sf01_$rep")(
          graft.ops.Crawl.crawlFrontier(pages(docs01), ranks, perHostCap = 10).count())
        time(s"frontier_skew_sf1_$rep")(
          graft.ops.Crawl.crawlFrontier(pages(docs), ranks, perHostCap = 10).count())
        time(s"polite_skew_sf1_$rep")(
          graft.ops.Crawl.politeFrontier(pages(docs), ranks, rules, delays,
            perHostCap = 10).count())
        if (sys.env.contains("PROBE_WINDOW")) {
          // the r13 formulation, reconstructed: candidates then a
          // per-host row_number window (single-task sort on the hub)
          def windowFrontier(p: org.apache.spark.sql.DataFrame) = {
            val links = graft.ops.Crawl.extractLinks(p).where(col("link_url").isNotNull)
            val seen = p.select(md5(graft.ops.Crawl.canonicalizeUrl(col("url"))).as("url_key"))
              .where(col("url_key").isNotNull).distinct()
            links.select(col("link_url"), col("link_host"), md5(col("link_url")).as("url_key"))
              .join(seen, Seq("url_key"), "left_anti")
              .groupBy(col("link_url"), col("link_host")).agg(count(lit(1)).as("n_refs"))
              .withColumn("pos", row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy(col("link_host"))
                  .orderBy(col("n_refs").desc, col("link_url").asc)))
              .where(col("pos") <= 10)
          }
          time(s"frontier_WINDOW_sf1_$rep")(windowFrontier(pages(docs)).count())
        }
      }
      // member-per-record .warc.gz ingest at probe scale: 8 shards of
      // gzip members built once from sf0.1 text, read via the exact
      // member walk + CRC verify + shared record parse
      val gzDir = "/tmp/warc_gz_probe"
      if (!new java.io.File(s"$gzDir/ok").exists()) {
        new java.io.File(gzDir).mkdirs()
        val rows = docs01.select(col("doc_id"), col("text")).collect()
        val shards = rows.grouped(math.max(1, rows.length / 8 + 1)).zipWithIndex
        shards.foreach { case (chunk, i) =>
          val bos = new java.io.ByteArrayOutputStream(1 << 24)
          chunk.foreach { r =>
            val body = Option(r.getString(1)).getOrElse("")
            val rec = s"WARC/1.0\r\nWARC-Type: response\r\n" +
              s"WARC-Record-ID: <urn:probe:${r.getLong(0)}>\r\n" +
              s"WARC-Target-URI: https://probe.example.org/d/${r.getLong(0)}\r\n\r\n" +
              s"HTTP/1.1 200 OK\r\n\r\n$body\r\n\r\n"
            val gz = new java.util.zip.GZIPOutputStream(bos)
            gz.write(rec.getBytes("UTF-8")); gz.finish()
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(gzDir, f"shard-$i%02d.warc.gz"), bos.toByteArray)
        }
        java.nio.file.Files.write(java.nio.file.Paths.get(gzDir, "ok"), Array[Byte]())
      }
      for (rep <- 1 to 2)
        time(s"warc_gz_read_$rep")(
          graft.sources.Warc.readResponses(spark, s"$gzDir/*.warc.gz", gz = true)
            .agg(sum(length(col("text")))).collect().length.toLong)
    }
    spark.stop()
  }
}
