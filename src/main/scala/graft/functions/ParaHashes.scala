package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document paragraph hasher — the row-local form of the
  * paragraph-dedup family's occurrence scan
  * ([[graft.ops.Dedup.paragraphDedup]] and friends): from a text
  * column, one pass computes every paragraph's index and the md5 of
  * its NORMALIZED token stream.
  *
  * Value-identical to the Column formulation it replaces (the parity
  * spec pins it):
  *
  * {{{
  * posexplode(filter(transform(split(text, boundary), trim), len > 0))
  *   -> md5(concat_ws(" ", TextNorm.tokens(para)))
  * }}}
  *
  * step for step: paragraph split is Java `split(boundary, -1)` (what
  * Spark's `split` runs), trim strips SPACES only (Spark `trim`
  * semantics — a tab-only paragraph stays, hashing its empty token
  * stream, exactly like the Column chain), and the normalizer runs the
  * SAME regex patterns with the lowercase step delegated to
  * `UTF8String.toLowerCase` — the very routine Spark's `lower()`
  * calls — so no engine-vs-JVM casing edge can diverge.
  *
  * Why native: the Column chain pays a posexplode plus an interpreted
  * regex normalizer + md5 PER PARAGRAPH ROW; this computes the whole
  * per-doc array in one scan with reused buffers (the
  * [[MinHashSigs]]/[[GramAnchors]] round-12 sweep, extended to the
  * paragraph family — the round-13 streaming watch item). Consumers
  * explode the result array, which is a cheap Generate over an
  * in-memory array, not regex work.
  *
  * Output: `array<struct<para_idx: int, h: string>>`; null text →
  * null (explode then drops the row, the split-of-null contract).
  */
case class ParaHashes(child: Expression, boundary: String,
    unicode: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("para_idx", IntegerType, nullable = false),
      StructField("h", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val boundaryRe = java.util.regex.Pattern.compile(boundary)
  // ASCII mode: TextNorm.normalize's exact patterns. Unicode mode:
  // TextNorm.normalizeUnicode's — whitespace ∪ Z ∪ NEL ∪ C0 collapse,
  // \p{L}\p{N} keep-set, per-char spacing of Han/kana runs.
  @transient private lazy val wsRe = java.util.regex.Pattern.compile(
    if (unicode) "(?U)[\\s\\p{Z}\\u0085\\x1c-\\x1f]+" else "(?U)[\\s\\x1c-\\x1f]+")
  @transient private lazy val keepRe = java.util.regex.Pattern.compile(
    if (unicode) "[^\\p{L}\\p{N} ]" else "[^a-z0-9 ]")
  @transient private lazy val cjkRe = java.util.regex.Pattern.compile(
    "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}])")

  /** Spark `trim` semantics: strip 0x20 SPACES only (not \t\n). */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var idx = 0
    val paras = boundaryRe.split(text, -1)
    var i = 0
    while (i < paras.length) {
      val para = trimSpaces(paras(i))
      if (para.nonEmpty) {
        // the exact normalize() chain: collapse Unicode ws + C0
        // separators, lower via UTF8String (Spark's own lower), strip
        // the ASCII keep-set, then space-join the non-empty tokens
        val collapsed = wsRe.matcher(para).replaceAll(" ")
        val lowered = UTF8String.fromString(collapsed).toLowerCase.toString
        val kept0 = keepRe.matcher(lowered).replaceAll("")
        val kept = if (unicode) cjkRe.matcher(kept0).replaceAll(" $1 ") else kept0
        val sb = new java.lang.StringBuilder(kept.length)
        var p = 0
        var wrote = false
        while (p < kept.length) {
          // split(" ") + filter(nonEmpty) + mkString(" ") in one walk
          var q = p
          while (q < kept.length && kept.charAt(q) != ' ') q += 1
          if (q > p) {
            if (wrote) sb.append(' ')
            sb.append(kept, p, q)
            wrote = true
          }
          p = q + 1
        }
        md.reset()
        val digest = md.digest(sb.toString.getBytes("UTF-8"))
        val hx = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          hx(2 * j) = hex((digest(j) & 0xf0) >> 4).toByte
          hx(2 * j + 1) = hex(digest(j) & 0x0f).toByte
          j += 1
        }
        out += InternalRow(idx, UTF8String.fromBytes(hx))
        idx += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ParaHashes =
    copy(child = newChild)
  override def prettyName: String = "para_hashes"
}

object ParaHashes {
  /** `array<struct<para_idx, h>>` over a text column. `unicode` hashes
    * the [[graft.core.TextNorm.tokensUnicode]] stream instead of the
    * §2-parity ASCII one (multilingual corpora: under the ASCII
    * normalizer every non-Latin paragraph hashes to md5("") and
    * cross-dedups against unrelated paragraphs of any other script). */
  def of(text: Column, boundary: String, unicode: Boolean = false): Column =
    GraftSqlBridge.column(ParaHashes(GraftSqlBridge.expression(text), boundary, unicode))
}
