package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The WordPiece word segmenter (Schuster & Nakajima, ICASSP '12; the
  * BERT tokenizer family) — greedy longest-match-first decoding under
  * a fixed vocabulary, as a shared executor-side object: the third
  * serving engine next to [[BpeEncoder]] (merge-rank) and
  * [[UnigramEncoder]] (Viterbi).
  *
  * Decoding contract (the DuckDB twin pins it):
  *
  *  - at each position take the LONGEST substring whose piece form is
  *    in the vocabulary — the piece form is the bare substring at
  *    word start and `"##" + substring` after it (the WordPiece
  *    continuation marker);
  *  - if ANY position has no match the WHOLE word decodes to the
  *    single unknown token (`unk`) — the published no-backtracking
  *    semantics: WordPiece never splices a partial segmentation;
  *  - the empty word yields `[""]`, matching the other two encoders'
  *    shape.
  *
  * Greedy longest-match needs no scores, so unlike the other two
  * engines there is no arithmetic to keep exact — determinism is set
  * membership plus substring order, identical in both engines by
  * construction.
  *
  * Per-word cost is O(len · maxPieceLen) hash probes, independent of
  * vocabulary size. Thread safety: built once, then read-only; one
  * instance rides the plan's codegen reference array into every task.
  */
final class WordPieceEncoder(vocab: Seq[String], val unk: String)
    extends Serializable {
  private val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(p => if (p.nonEmpty) s.add(p))
    s
  }
  // longest BODY a vocabulary piece can match (continuation pieces
  // spend 2 chars on the "##" marker, which never consumes input)
  private val maxBodyLen: Int =
    if (vocab.isEmpty) 1
    else math.max(1, vocab.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max)

  /** Greedy-segment one word into its pieces (or `[unk]`). */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array("")
    val n = word.length
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var pos = 0
    while (pos < n) {
      var L = math.min(maxBodyLen, n - pos)
      var hit: String = null
      while (hit == null && L >= 1) {
        val body = word.substring(pos, pos + L)
        val cand = if (pos == 0) body else "##" + body
        if (set.contains(cand)) hit = cand else L -= 1
      }
      if (hit == null) return Array(unk) // whole-word UNK, no backtracking
      out += hit
      pos += L
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

/** Native Catalyst expression wrapping [[WordPieceEncoder]]: `string ->
  * array<string>` of WordPiece pieces under a fixed vocabulary. The
  * vocabulary rides into every task as ONE plan-reference object and
  * the generated code is a single virtual call — the expression
  * participates in whole-stage codegen, so tokenize→segment→aggregate
  * stays one codegen'd stage at any vocabulary size.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String], unk: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val encoder = new WordPieceEncoder(vocab, unk)

  override def nullSafeEval(w: Any): Any =
    encoder.encodeArrayData(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceEncoder", encoder,
      classOf[WordPieceEncoder].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.encodeArrayData($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}
