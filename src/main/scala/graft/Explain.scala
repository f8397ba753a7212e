package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints `explain("formatted")` for the named queries
  * (all of them with no args) against SPARK_GRAFT_SF_DIR. Usage:
  * `sbt "runMain graft.Explain q_top_ngrams q_repetition"`.
  *
  * Caveat: the checkpoint-based dedup queries (q_minhash_pairs/_est,
  * q_dedup_clusters/_keep, q_simhash_pairs) EXECUTE their materialized
  * stages at plan-construction time and their printed plans collapse to
  * `Scan ExistingRDD` at the checkpoint boundary — audit those
  * pipelines stage-by-stage (e.g. via Dedup.minhashBands) instead. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
