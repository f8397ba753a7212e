package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePara {
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
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE-PARA $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    for (rep <- 1 to 3) {
      // stage 1: the ParaHashes scan alone
      time(s"parahash_scan_$rep")(graft.core.Parallelism.ensure(docs)
        .select(col("doc_id"),
          explode(graft.functions.ParaHashes.of(col("text"), "\\n+", false)).as("e"))
        .count())
      // full operator
      time(s"para_dedup_$rep")(graft.ops.Dedup.paragraphDedup(docs, boundary = "\\n+").count())
      // materialization strategy comparison
      time(s"para_dedup_persist_$rep")(graft.ops.Dedup.paragraphDedup(docs, boundary = "\\n+",
        mat = graft.core.Materialize.Persist).count())
    }
    spark.stop()
  }
}
