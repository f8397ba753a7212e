package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** SparkSessionExtensions wiring: exposes the native expressions to the
  * SQL surface (`SELECT graft_dot(a, b)`) in addition to the Column API
  * ([[graft.functions.VectorFunctions]], which needs no registration).
  *
  * Use either
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` at session
  * build time, or [[GraftExtensions.install]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
    ext.injectPlannerStrategy(_ => AsOfJoin.AsOfStrategy)
  }
}

object GraftExtensions {
  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_dot(a, b) takes exactly two arguments")
      DotProduct(children.head, children(1))
    })

  /** Register the SQL functions + planner strategies on an
    * already-built session (idempotent). Strategies go through the
    * PUBLIC `spark.experimental.extraStrategies` hook. */
  def install(spark: SparkSession): Unit = {
    val (id, info, builder) = dotFunction
    org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, id, info, builder)
    if (!spark.experimental.extraStrategies.contains(AsOfJoin.AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoin.AsOfStrategy
    }
  }
}
