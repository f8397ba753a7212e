package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization over a string column — the
  * canonical-composition pass a dedup pipeline runs BEFORE hashing:
  * "café" typed with a precomposed é (U+00E9) and with a combining
  * acute (e + U+0301) are byte-different but canonically identical, so
  * without this pass exact dedup, shingle hashing, and decontamination
  * all silently miss visually-identical text.
  *
  * Spark ships no normalization function, so this is the (b) rung of
  * the custom-operator ladder: a codegen'd unary expression over the
  * JDK's `java.text.Normalizer` (Unicode canonical composition — a
  * published standard, deterministic, no dependencies). DuckDB's
  * `nfc_normalize` is the oracle twin; both sides implement the same
  * Unicode NFC algorithm, and the normalization is idempotent
  * (NFC(NFC(x)) = NFC(x)), which the spec pins.
  *
  * Cost: `Normalizer.isNormalized` is checked first in both the
  * interpreted and generated paths — overwhelmingly-ASCII corpora take
  * the no-allocation fast path and return the input buffer unchanged.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by the interpreted and generated paths (the generated code
    * calls this directly — one static call, no reflection). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
