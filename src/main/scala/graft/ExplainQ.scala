package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of one SparkEntry query.
  * Usage: runMain graft.ExplainQ <queryName> [sfDir]. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
