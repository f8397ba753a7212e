package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM (SentencePiece-family, Kudo '18) word segmenter:
  * Viterbi decoding under a fixed piece table, as a shared
  * executor-side object — the [[BpeEncoder]] of the OTHER dominant
  * subword family.
  *
  * Scores are MICRO log-probabilities (the stored model's
  * DECIMAL(18,6) `lp` column times 1e6, an exact integer), so the DP
  * is pure Long arithmetic — order-independent, overflow-free (|lp| ≤
  * ~50e6 per piece, words are bounded), and therefore ENGINE-EXACT
  * against the DuckDB twin's exact-decimal path sums; no float ever
  * enters a comparison.
  *
  * Decoding contract (the twin pins it):
  *
  *  - segmentation maximizes the piece-score sum; among co-optimal
  *    segmentations the SPACE-JOINED piece string that sorts lowest
  *    wins (equivalently: prefer the shorter piece at the first
  *    divergence — a space sorts below every alphanumeric). The
  *    forward reconstruction realizes this greedily: at each position
  *    take the SHORTEST piece whose score plus the optimal suffix
  *    score equals the position's optimal score.
  *  - a single character with no vocabulary piece decodes as itself
  *    at the fixed UNKNOWN score (`unkLpMicro`) — the total-function
  *    stance: serving text may contain characters training never saw,
  *    and an encoder that throws loses the batch.
  *  - the empty word yields `[""]`, matching the BPE encoder's shape.
  *
  * DP positions are UTF-16-indexed but pieces are matched as full
  * substrings; for the engine's ASCII token alphabet this equals the
  * code-point semantics of both engines' `substr` (multibyte serving
  * text falls back to per-char unknowns at worst — documented ASCII
  * parity, the §2 normalizer stance).
  *
  * Thread safety: built once, then read-only; one instance rides the
  * plan's codegen reference array into every task.
  */
final class UnigramEncoder(pieces: Seq[(String, Long)], val unkLpMicro: Long)
    extends Serializable {
  private val lp: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.foreach { case (p, s) => if (p.nonEmpty) m.putIfAbsent(p, java.lang.Long.valueOf(s)) }
    m
  }
  private val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else math.max(1, pieces.map(_._1.length).max)

  private val Neg = java.lang.Long.MIN_VALUE

  /** Viterbi-segment one word into its pieces. */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array("")
    val n = word.length
    // backward DP: best(i) = optimal suffix score from position i
    val best = new Array[Long](n + 1)
    var i = n - 1
    while (i >= 0) {
      var b = Neg
      var L = 1
      val maxL = math.min(maxPieceLen, n - i)
      while (L <= maxL) {
        val s = lp.get(word.substring(i, i + L))
        val sc =
          if (s != null) s.longValue()
          else if (L == 1) unkLpMicro // unknown single char
          else Neg
        if (sc != Neg && best(i + L) != Neg) {
          val tot = sc + best(i + L)
          if (b == Neg || tot > b) b = tot
        }
        L += 1
      }
      best(i) = b // always reachable: the L=1 unknown fallback is total
      i -= 1
    }
    // forward reconstruction, shortest-optimal-piece-first (lex-min)
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var pos = 0
    while (pos < n) {
      var L = 1
      var done = false
      val maxL = math.min(maxPieceLen, n - pos)
      while (!done && L <= maxL) {
        val p = word.substring(pos, pos + L)
        val s = lp.get(p)
        val sc =
          if (s != null) s.longValue()
          else if (L == 1) unkLpMicro
          else Neg
        if (sc != Neg && best(pos + L) != Neg && sc + best(pos + L) == best(pos)) {
          out += p
          pos += L
          done = true
        } else L += 1
      }
      if (!done) { // unreachable by construction; stay total regardless
        out += word.substring(pos, pos + 1)
        pos += 1
      }
    }
    out.toArray
  }

  /** Catalyst-facing entry, shared by interpreted eval and codegen. */
  def encodeArrayData(word: UTF8String): ArrayData = {
    val ps = encode(word.toString)
    val out = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) { out(i) = UTF8String.fromString(ps(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression wrapping [[UnigramEncoder]]: `string ->
  * array<string>` of unigram-LM pieces under a fixed trained piece
  * table. The model rides into every task as ONE plan-reference
  * object and the generated code is a single virtual call — the
  * expression participates in whole-stage codegen, so
  * tokenize→segment→aggregate stays one codegen'd stage at any
  * vocabulary size; per-word cost is O(len · maxPieceLen) hash
  * lookups, independent of vocabulary size.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)],
    unkLpMicro: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_encode"

  @transient private lazy val encoder = new UnigramEncoder(pieces, unkLpMicro)

  override def nullSafeEval(w: Any): Any =
    encoder.encodeArrayData(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncoder", encoder,
      classOf[UnigramEncoder].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.encodeArrayData($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}
