package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The production-depth BPE word encoder: the iterative min-rank pair
  * merger every real tokenizer ships, as a shared executor-side object.
  *
  * [[graft.ops.Bpe.encodeCol]] — the executable spec, and the oracle
  * twin's shape — folds ONE codegen'd `replace` per merge into a single
  * Column: perfect at oracle depth (≲64 merges), structurally impossible
  * at a production 30k-merge vocab (a 30k-deep expression tree blows up
  * analysis/codegen, and every word would pay 30k full-string scans).
  * This encoder is the at-scale form: per word, repeatedly find the
  * LOWEST-RANK adjacent symbol pair present and merge all its
  * occurrences leftmost-first — O(len²) hash lookups per word,
  * INDEPENDENT of vocabulary size.
  *
  * Equivalence contract (the parity spec pins it): for a merge list
  * produced by BPE TRAINING — where merge i's two symbols are drawn
  * from the alphabet plus merges < i — min-rank iteration produces
  * exactly the same pieces as [[graft.ops.Bpe.encodeCol]]'s sequential
  * rank-order replace chain. Sketch: applying merge i can only create
  * new adjacencies that involve the merged symbol `lhs+rhs`, and any
  * trained pair containing that symbol has rank > i; so no earlier-rank
  * (or same-rank) occurrence is ever created by a later merge, and
  * processing ranks in ascending order — which is what min-rank
  * selection does — visits exactly the occurrences the sequential chain
  * replaces, in the same leftmost-greedy order. Duplicate pairs in the
  * list keep their EARLIEST rank (a later duplicate is a no-op in the
  * sequential chain, because pass i already consumed every occurrence).
  *
  * Thread safety: built once, then read-only; Spark shares one instance
  * across a plan's tasks via the codegen reference array.
  */
final class BpeEncoder(merges: Seq[(String, String)], byteLevel: Boolean = false)
    extends Serializable {
  private val lhsArr: Array[String] = merges.map(_._1).toArray
  private val rhsArr: Array[String] = merges.map(_._2).toArray

  /** pair -> earliest rank. Symbols are space-free ([[graft.core.TextNorm]]
    * alphabet), so the space-joined key is unambiguous. */
  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lhsArr.length * 2)
    var i = 0
    while (i < lhsArr.length) {
      m.putIfAbsent(lhsArr(i) + " " + rhsArr(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  private val hexDigits = "0123456789ABCDEF".toCharArray

  /** Encode one word to its BPE pieces. Code-point splitting matches
    * `encodeCol`'s `regexp_replace(word, "(.)", ...)` (Java regex `.`
    * is one code point); byte-level splitting matches `byteSyms`'
    * uppercase-hex `hex(encode(word, 'UTF-8'))` pairs — the GPT-2-style
    * coverage guarantee (every symbol is one of the fixed 256 hex
    * pairs, so no character is ever out-of-alphabet). The empty word
    * yields `[""]` in both modes, matching the column chain's
    * `split(trim(""), "  ")`. */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array("")
    var syms: Array[String] = null
    var len = 0
    if (byteLevel) {
      val bytes = word.getBytes("UTF-8")
      syms = new Array[String](bytes.length)
      while (len < bytes.length) {
        val b = bytes(len) & 0xff
        syms(len) = new String(Array(hexDigits(b >> 4), hexDigits(b & 0xf)))
        len += 1
      }
    } else {
      // initial symbolization: one symbol per code point
      syms = new Array[String](word.length) // UTF-16 length >= #code points
      var ci = 0
      while (ci < word.length) {
        val cp = word.codePointAt(ci)
        syms(len) = new String(Character.toChars(cp))
        len += 1
        ci += Character.charCount(cp)
      }
    }
    while (len >= 2) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Int.MaxValue
      var j = 0
      while (j < len - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) return java.util.Arrays.copyOf(syms, len)
      // merge all its occurrences, leftmost-first non-overlapping
      val a = lhsArr(bestRank); val b = rhsArr(bestRank); val ab = a + b
      var w = 0
      var rp = 0
      while (rp < len) {
        if (rp < len - 1 && syms(rp) == a && syms(rp + 1) == b) {
          syms(w) = ab; rp += 2
        } else {
          syms(w) = syms(rp); rp += 1
        }
        w += 1
      }
      len = w
    }
    java.util.Arrays.copyOf(syms, len)
  }

  /** Catalyst-facing entry: called from both the interpreted eval and
    * the generated code. */
  def encodeArrayData(word: UTF8String): ArrayData = {
    val ps = encode(word.toString)
    val out = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) { out(i) = UTF8String.fromString(ps(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression wrapping [[BpeEncoder]]: `string ->
  * array<string>` of BPE pieces under a fixed trained merge list. The
  * merge table rides into every task as ONE plan-reference object (the
  * broadcast analogue for model-sized state), and the generated code is
  * a single virtual call — the expression participates in whole-stage
  * codegen, so the tokenize→encode→aggregate pipeline stays in one
  * codegen'd stage at any vocabulary depth.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val encoder = new BpeEncoder(merges, byteLevel)

  override def nullSafeEval(w: Any): Any =
    encoder.encodeArrayData(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.encodeArrayData($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
