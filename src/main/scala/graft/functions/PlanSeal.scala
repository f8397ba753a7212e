package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that SEALS a projected expression against
  * optimizer re-inlining — the zero-cost replacement for the
  * `explode(array(…))` one-row-Generate barrier the flag ops used
  * through round 11.
  *
  * The problem it solves (the Curation.rowFlags pushdown-blowup
  * contract): `CollapseProject` substitutes a projected alias into
  * every downstream consumer, and `PushPredicateThroughNonJoin`
  * substitutes it into filters pushed below the projection — so a
  * caller filtering on a token-derived flag column re-inlines the
  * tokenizer into the pushed predicate once PER CONSUMER (the
  * round-11 stream probe measured 27 copies, 22 s instead of 4 at
  * 50k docs). Both rules gate on `Expression.deterministic`; this
  * wrapper reports `false`, so aliases built over it are never
  * substituted — the expensive child evaluates exactly once per row
  * into its alias, and downstream predicates reach it only as
  * attribute references above the projection. Exactly the Generate
  * barrier's sealing semantics, WITHOUT the Generate: no extra
  * codegen stage, no UnsafeArrayData rematerialization, no row copy
  * (the round-12 A/B at sf0.1 priced the Generate pair at +0.23 s /
  * +0.32 s per query on q_lang_id/q_quality — ~50 µs/doc, a per-row
  * cost that would scale straight into a 100 TB scan).
  *
  * The child IS deterministic — the flag is a plan-shape pin, not an
  * execution property — so retry/re-evaluation semantics are
  * unaffected, and codegen passes straight through to the child.
  * Like any non-deterministic projection, the sealed Project also
  * blocks UNRELATED predicates from pushing through it; callers
  * should filter on raw columns BEFORE a sealing op, exactly as they
  * had to with the Generate barrier.
  */
case class PlanSeal(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): PlanSeal =
    copy(child = newChild)
  override def prettyName: String = "plan_seal"
}

object PlanSeal {
  /** Seal `c` so the projection it lands in is never inlined into
    * consumers or pushed-down predicates. */
  def seal(c: Column): Column =
    GraftSqlBridge.column(PlanSeal(GraftSqlBridge.expression(c)))
}
