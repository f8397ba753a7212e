package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native per-document SimHash (Charikar '02) over a TOKEN array —
  * the row-local form of the aggregate formulation
  * (per-token md5 digits exploded → per-bit `sum(±1)` groupBy →
  * threshold): per token occurrence, the first `bits` bits of its md5
  * (big-endian) vote +1/−1 into per-bit counters; signature bit j is
  * set iff counter j is strictly positive, packed as
  * `Σ (w_j > 0) << (bits−1−j)` — bit-identical to the Column chain
  * (the parity spec pins it), but with the exploded token stream and
  * the groupBy SHUFFLE gone from every consumer ([[graft.ops.Dedup
  * .simhash]], simhashPairs' blocking, the hamming engine's inputs).
  *
  * Token-less documents return NULL (the caller filters them — the
  * aggregate form excluded them by producing no group; a zero-token
  * signature carries no similarity signal).
  */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits % 4 == 0 && bits >= 4 && bits <= 64,
    s"bits=$bits must be a multiple of 4 in [4, 64]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counters = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < bits) {
        val bit = (d(j / 8) >> (7 - j % 8)) & 1
        counters(j) += (if (bit == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counters(j) > 0) sig |= 1L << (bits - 1 - j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
  override def prettyName: String = "simhash_sig"
}

object SimHashSig {
  def of(tokens: Column, bits: Int): Column =
    GraftSqlBridge.column(SimHashSig(GraftSqlBridge.expression(tokens), bits))
}
