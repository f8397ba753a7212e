package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss sign random projection (Achlioptas, JCSS '03
  * — "Database-friendly random projections": the ±1 matrix preserves
  * pairwise distances with the same guarantee as Gaussian JL):
  * `array<double>[d] -> array<double>[r]` with
  * `y_j = (Σ_i x_i · s_ij) / sqrt(r)`.
  *
  * The sign matrix is DETERMINISTIC — `s_ij = +1` iff the first
  * 32 bits of `md5("jl|i|j")` are even (1-based i, j; the engine's
  * hash-seeding recipe) — so the projection is reproducible across
  * runs and engines: the DuckDB twin rebuilds the same signs from the
  * same md5 and the inner sum is the same LEFT-TO-RIGHT IEEE fold as
  * this loop (the [[DotProduct]] ordered-sum convention), making
  * projected coordinates and downstream cosines engine-exact with no
  * tolerance band.
  *
  * Cost: O(d · r) multiply-adds per row, zero allocation beyond the
  * output array; the r×d sign matrix is built once on the driver and
  * rides the plan's codegen reference array into every task (r·d
  * bytes — 1 KB at 64→16).
  */
final class JlProjector(val inDim: Int, val outDim: Int)
    extends Serializable {
  // signs(j)(i): +1/-1 as bytes, 0-based storage of the 1-based recipe
  private val signs: Array[Array[Byte]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim) { j0 =>
      Array.tabulate(inDim) { i0 =>
        val h = md.digest(s"jl|${i0 + 1}|${j0 + 1}".getBytes("UTF-8"))
        md.reset()
        val hex = h.take(4).map(b => f"${b & 0xff}%02x").mkString
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.toByte else (-1).toByte
      }
    }
  }
  private val scale: Double = math.sqrt(outDim.toDouble)

  /** Project one vector; dims beyond `inDim` are ignored, missing
    * dims contribute 0 (total-function stance for ragged inputs). */
  def project(x: ArrayData): ArrayData = {
    val n = math.min(inDim, x.numElements())
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      val s = signs(j)
      var acc = 0.0
      var i = 0
      while (i < n) { // left-to-right: the twin's list_reduce order
        acc += x.getDouble(i) * s(i)
        i += 1
      }
      out(j) = acc / scale
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression wrapping [[JlProjector]] — participates
  * in whole-stage codegen, so project→dot→rank stays one codegen'd
  * stage; per-row cost O(d·r) independent of corpus size. */
case class JlProject(child: Expression, inDim: Int, outDim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_jl_project"

  @transient private lazy val projector = new JlProjector(inDim, outDim)

  override def nullSafeEval(x: Any): Any =
    projector.project(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jlProjector", projector,
      classOf[JlProjector].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.project($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}
