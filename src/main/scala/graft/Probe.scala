package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.TextNorm
import graft.ops.Dedup

/** Throwaway stage-level profiler (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // UI events carry a plan description generated PER ACTION even with
      // the UI disabled; the default "formatted" mode runs ExplainUtils'
      // operator-ID walk, which is super-linear on deep staged/cached plan
      // trees (a measured multi-minute single-thread stall per streaming
      // batch at full-stack depth). "simple" keeps the event linear.
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("tokens")(docs.select(col("doc_id"), TextNorm.tokens(col("text")).as("ts")).count())
    time("tokens_explode")(docs.select(col("doc_id"), explode(TextNorm.tokens(col("text"))).as("w")).count())
    val sh = docs.select(col("doc_id"), TextNorm.tokens(col("text")).as("ts"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("ts"), 3).as("shl"))
    time("shingles")(sh.count())
    sh.select(col("doc_id"), explode(col("shl")).as("s")).explain(true)
    time("shingles_explode")(sh.select(col("doc_id"), explode(col("shl")).as("s")).count())
    time("sig_wide")(Dedup.minhashSignaturesWide(docs).count())
    time("bands")(Dedup.minhashBands(docs).count())
    time("pairs")(Dedup.minhashCandidatePairs(docs).count())
    time("jaccard")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
