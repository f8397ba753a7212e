package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al., SIGMOD '03) over a
  * TOKEN array — the row-local form of the window formulation (k-gram
  * md5s → per-doc `min() OVER (ROWS w-1 PRECEDING)` → full windows →
  * distinct): per doc, hash every k-token gram (space-joined, md5),
  * take each full w-window's minimum, return the DISTINCT minima in
  * first-window order. Value-identical to the Window chain (hex
  * lexicographic min == unsigned digest-byte min; the parity spec
  * pins it), but the per-doc hash-partition SHUFFLE and window sort
  * disappear from every consumer ([[graft.ops.TextAnalysis
  * .fingerprints]], [[graft.ops.Dedup.fingerprintPairs]] and its
  * incremental face).
  *
  * Docs with fewer than `k` tokens, or fewer than `w` grams, emit an
  * empty array (the Window chain's `pos >= w-1` full-window filter);
  * the caller's `explode` then drops them, matching the original
  * row set.
  */
case class WinnowFps(child: Expression, w: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"w=$w must be >= 1")
  require(k >= 1, s"k=$k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val g = n - k + 1
    if (g < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](g)
    var p = 0
    while (p < g) {
      md.reset()
      var t = 0
      while (t < k) {
        if (t > 0) md.update(' '.toByte)
        md.update(toks(p + t))
        t += 1
      }
      digests(p) = md.digest()
      p += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    var pos = w - 1
    while (pos < g) {
      var best = digests(pos - w + 1)
      var j = pos - w + 2
      while (j <= pos) {
        if (unsignedLess(digests(j), best)) best = digests(j)
        j += 1
      }
      seen.add(hex(best))
      pos += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(d: Array[Byte]): String = {
    val sb = new Array[Char](32)
    var j = 0
    while (j < 16) {
      sb(2 * j) = hexChars((d(j) & 0xf0) >> 4)
      sb(2 * j + 1) = hexChars(d(j) & 0x0f)
      j += 1
    }
    new String(sb)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
  override def prettyName: String = "winnow_fps"
}

object WinnowFps {
  def of(tokens: Column, w: Int, k: Int): Column =
    GraftSqlBridge.column(WinnowFps(GraftSqlBridge.expression(tokens), w, k))
}
