package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick, CACM '75; the
  * FlashText use case — Singh '17 — at expression depth): count every
  * occurrence of every phrase in ONE left-to-right pass over the
  * text, O(text + matches), independent of how many thousand phrases
  * the dictionary holds. The relational formulations pay O(tokens)
  * per SINGLE-token term (hash join) but have no phrase form at all —
  * an n-word phrase as a token-stream join is an n-way self-join per
  * position, which is why multi-word blocklists need the automaton.
  *
  * Matching contract (the DuckDB twin pins it):
  *
  *  - patterns and text are compared as RAW STRINGS; callers wanting
  *    token-boundary phrase semantics wrap both in single spaces
  *    (`" win a prize "` against `" " + normalized + " "`), which the
  *    [[graft.ops.TextAnalysis.phraseBlocklistSignals]] face does;
  *  - ALL occurrences count, overlapping included (`" a a "` occurs
  *    twice in `" a a a "` — the twin's position scan agrees; a
  *    `replace`-based count would not);
  *  - duplicate patterns are collapsed at build time.
  *
  * Returns `[total_hits, distinct_phrases]` as a 2-long array (one
  * expression evaluation yields both aggregates; splitting them would
  * run the automaton twice).
  *
  * The automaton (goto/fail/output-count links over a char-keyed
  * map) is built ONCE on the driver and rides the plan's codegen
  * reference array into every task; per-row cost is one hash probe
  * per character plus one output-chain walk per match state.
  * Thread safety: built once, then read-only.
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  import scala.collection.mutable

  private val goto_ = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val endsHere = mutable.ArrayBuffer(0) // patterns ENDING at state
  private val fail = mutable.ArrayBuffer(0)
  private val dictCount = mutable.ArrayBuffer(0L) // endsHere + dict-suffix chain
  private val dictDistinctId = mutable.ArrayBuffer(-1) // pattern id ending here, -1 if none
  // nearest failure-ANCESTOR that is a match state (0 = none): the
  // distinct-id walk hops dictionary suffixes only, never the full
  // failure chain — without this, a short pattern suffixing a deep
  // chain (patterns {"a", "aaa…a"} over "aaa…") costs O(text × depth)
  private val dictLink = mutable.ArrayBuffer(0)
  private val nPatterns: Int = {
    val distinct = patterns.filter(_.nonEmpty).distinct
    distinct.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        s = goto_(s).getOrElseUpdate(c, {
          goto_ += mutable.HashMap.empty[Char, Int]
          endsHere += 0
          fail += 0
          dictCount += 0L
          dictDistinctId += -1
          dictLink += 0
          goto_.length - 1
        })
      }
      endsHere(s) += 1
      dictDistinctId(s) = id
    }
    // BFS failure links; dictCount(s) = #patterns ending at s or any
    // failure-suffix of s (so one add per matched position, no chain
    // walk in the hot loop for TOTALS); dictLink(s) skips straight to
    // the nearest match-state suffix (fail(s) is strictly shorter, so
    // its links are already set when s dequeues)
    val q = mutable.Queue.empty[Int]
    goto_(0).values.foreach { s => fail(s) = 0; q += s }
    while (q.nonEmpty) {
      val s = q.dequeue()
      dictCount(s) = endsHere(s) + dictCount(fail(s))
      dictLink(s) =
        if (dictDistinctId(fail(s)) >= 0) fail(s) else dictLink(fail(s))
      goto_(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !goto_(f).contains(c)) f = fail(f)
        fail(t) = if (goto_(f).contains(c) && goto_(f)(c) != t) goto_(f)(c) else 0
        q += t
      }
    }
    dictCount(0) = endsHere(0)
    distinct.length
  }

  /** One pass: (total occurrences, distinct patterns seen). */
  def count(text: String): (Long, Int) = {
    var s = 0
    var total = 0L
    val seen = new Array[Boolean](math.max(1, nPatterns))
    var nSeen = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !goto_(s).contains(c)) s = fail(s)
      s = goto_(s).getOrElse(c, 0)
      if (dictCount(s) != 0L) {
        total += dictCount(s)
        // distinct ids: hop MATCH STATES only (dictLink), and stop
        // entirely once every pattern has been seen — O(matches)
        // on adversarial dictionaries, not O(text × chain depth)
        if (nSeen < nPatterns) {
          var f = if (dictDistinctId(s) >= 0) s else dictLink(s)
          while (f != 0) {
            val id = dictDistinctId(f)
            if (!seen(id)) { seen(id) = true; nSeen += 1 }
            f = dictLink(f)
          }
        }
      }
      i += 1
    }
    (total, nSeen)
  }

  def countArrayData(text: UTF8String): ArrayData = {
    val (t, d) = count(text.toString)
    new GenericArrayData(Array[Any](t, d.toLong))
  }
}

/** Native Catalyst expression wrapping [[AhoCorasick]]:
  * `string -> array<long>[2]` = (total phrase hits, distinct phrases).
  * The automaton rides into tasks as ONE plan-reference object;
  * whole-stage-codegen friendly. */
case class PhraseMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_phrase_match"

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def nullSafeEval(t: Any): Any =
    ac.countArrayData(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahoCorasick", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.countArrayData($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseMatch =
    copy(child = newChild)
}
