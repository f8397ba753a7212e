package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * This is the (b) rung of the custom-operator ladder: the built-in
  * formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * higher-order function, which Catalyst evaluates INTERPRETED
  * (CodegenFallback) with per-element lambda dispatch and an
  * intermediate product array — the hot inner loop of every similarity
  * / ANN operator. This expression participates in whole-stage codegen
  * and compiles to a bare `for` loop over the two unsafe array buffers:
  * no allocation, no boxing, no virtual calls.
  *
  * Numeric contract: sequential fold in index order — bit-identical to
  * the HOF formulation and to DuckDB's `list_reduce(list_transform(..))`
  * twin, so oracle hashes are unchanged. Length-mismatched inputs
  * return NULL (a corrupt embedding must surface, not produce a
  * plausible truncated score). Null ELEMENTS are read as 0.0 — the raw
  * unsafe-buffer semantics; pipelines with nullable embedding elements
  * should repair them upstream.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // null inputs OR length mismatch

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions.
  * `ExpressionUtils.column` wraps the Catalyst node directly, so these
  * work in any session — no registration required. */
object VectorFunctions {
  /** Codegen'd `Σ a(i)*b(i)` over two array<double> columns. */
  def dotp(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
