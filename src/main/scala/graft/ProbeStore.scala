package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: phase timing of the search-page-store save + serve
  * path (the served-retrieval family's shared cost). */
object ProbeStore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBESTORE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val tmp = java.nio.file.Files.createTempDirectory("graft-probe-store-").toString
      val pos = graft.index.InvertedIndex.buildPositional(docs)
      t("savePositional")(graft.index.IndexStore.savePositional(
        pos, s"$tmp/store/postings", graft.index.IndexStore.HashPrefix))
      t("docLengths+write")(graft.index.InvertedIndex.docLengths(
          spark.read.parquet(s"$tmp/store/postings").select("word", "doc_id", "cnt"))
        .write.mode("overwrite").parquet(s"$tmp/store/doc_lengths"))
      t("stats+write")(docs.agg(count(lit(1)).cast("double").as("n_docs"))
        .crossJoin(spark.read.parquet(s"$tmp/store/doc_lengths")
          .agg(sum("dl").as("sum_dl"), count(lit(1)).as("n_lens")))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/store/stats"))
      t("saveDocStore")(graft.index.IndexStore.saveDocStore(docs, s"$tmp/docs"))
      t("serve bm25TopK")(graft.index.IndexStore.bm25TopK(spark, s"$tmp/store",
        "fast hash join on a small table", k = 20,
        layout = graft.index.IndexStore.HashPrefix).count())
      t("serve searchPage")(graft.index.IndexStore.searchPage(spark, s"$tmp/store",
        s"$tmp/docs", "fast hash join on a small table", k = 20, window = 8,
        layout = graft.index.IndexStore.HashPrefix).count())
      val nPost = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/store/postings"))
        .filter(p => p.toString.endsWith(".parquet")).count()
      val nDocs = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/docs"))
        .filter(p => p.toString.endsWith(".parquet")).count()
      println(s"PROBESTORE files: postings=$nPost docstore=$nDocs")
    }
    spark.stop()
  }
}
