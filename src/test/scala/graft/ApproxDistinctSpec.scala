package graft

import org.apache.spark.sql.functions._
import SparkSpec.spark.implicits._

/** approx_count_distinct has no cross-engine oracle (HLL++ internals);
  * pin its accuracy against exact counts instead. */
class ApproxDistinctSpec extends SparkSpec {
  test("approx distinct within 5% of exact on the lineitem fixture") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
