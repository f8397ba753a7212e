package graft

import org.apache.spark.sql.functions._

import graft.functions.PlanSeal
import SparkSpec.spark.implicits._

class PlanSealSpec extends SparkSpec {

  // repartition: a bare LocalRelation would be folded to a
  // LocalTableScan by ConvertToLocalRelation, leaving no plan to pin
  private val d = (1L to 50L)
    .map(i => (i, s"some body of text with number $i inside it"))
    .toDF("doc_id", "text").repartition(2)

  test("seal is a value-level no-op: sealed and unsealed results agree") {
    val sealedRows = d.select($"doc_id", PlanSeal.seal(length($"text") * 2).as("v"))
      .as[(Long, Int)].collect().toSet
    val plainRows = d.select($"doc_id", (length($"text") * 2).as("v"))
      .as[(Long, Int)].collect().toSet
    assert(sealedRows === plainRows)
    // array/struct types pass through unchanged too
    val arr = d.select(PlanSeal.seal(split($"text", " ")).as("ts"))
      .select(size($"ts")).as[Int].collect()
    assert(arr.forall(_ === 9))
  }

  test("a filter on a sealed alias stays above the projection (no substitution)") {
    val expensive = length(regexp_replace($"text", "[aeiou]", ""))
    val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => n > 10 && n < 1000 && n =!= 11
    // UNSEALED baseline: alias substitution moves the predicate below
    // the projection — here all the way into the local relation (the
    // optimized plan keeps NO Filter node at all); over a file scan the
    // same substitution is the tokenizer-duplication blowup the seal
    // exists for (pinned on the real ops in ScaleIdiomsSpec)
    val unsealed = d.select($"doc_id", expensive.as("n")).filter(pred($"n"))
    assert(!unsealed.queryExecution.optimizedPlan.toString.contains("Filter"),
      unsealed.queryExecution.optimizedPlan.toString)
    // SEALED: the Filter survives as the root, ABOVE the sealed
    // projection, referencing only the alias — and exactly one copy of
    // the expensive expression remains anywhere in the plan
    val sealedDf = d.select($"doc_id", PlanSeal.seal(expensive).as("n")).filter(pred($"n"))
    val opt = sealedDf.queryExecution.optimizedPlan.toString
    assert(opt.linesIterator.next().startsWith("Filter"), opt)
    assert("regexp_replace".r.findAllIn(opt).length === 1, opt)
    // and the values are identical
    assert(sealedDf.select("doc_id").as[Long].collect().toSet ===
      unsealed.select("doc_id").as[Long].collect().toSet)
  }

  test("seal survives whole-stage codegen (no interpreted fallback)") {
    val df = d.select(PlanSeal.seal(length($"text") + 1).as("n")).filter($"n" > 0)
    assert(df.collect().length === 50)
    // after execution AQE has finalized the plan; codegen'd operators
    // carry the *(stageId) marker in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [plan_seal"), plan)
  }
}
