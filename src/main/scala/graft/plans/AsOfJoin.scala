package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native AS-OF join — the (c) rung of the custom-operator ladder: a
  * whole-operator semantics Spark lacks, implemented as
  * LogicalPlan + Strategy + physical BinaryExecNode and registered
  * through the public `spark.experimental.extraStrategies` hook.
  *
  * Semantics: for each left row, attach the LAST right row of the same
  * key with rightTime <= leftTime (ties on rightTime broken by the
  * right sort's trailing tie-break column — highest wins), or nulls.
  * Identical to the window-composed formulation in
  * `Relational.asofPurchaseToClick` — the DuckDB oracle checks both
  * against the same SQL.
  *
  * Why a physical operator when the window composition works? Plan
  * shape at scale: the window formulation unions both event streams,
  * shuffles the COMBINED stream, sorts it, and carries every right
  * column through null-padded union slots. This operator shuffles each
  * side by its own key (declared via requiredChildDistribution, so
  * Catalyst plans the exchanges — and can elide them if a side is
  * already partitioned), sorts each side independently
  * (requiredChildOrdering), and streams a two-pointer merge holding
  * exactly ONE buffered right row — no union blow-up, no combined
  * sort, bounded memory.
  *
  * v1 scope: single equi-key, LongType time columns (epoch-nanos in
  * the fixtures). Null keys/times never match (skipped on the right,
  * null-extended on the left).
  */
object AsOfJoin {

  /** Logical node. Built from ANALYZED child plans with resolved
    * attributes, so no analyzer rule is needed. */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Attribute,
      rightKey: Attribute,
      leftTime: Attribute,
      rightTime: Attribute,
      rightTieBreak: Attribute)
    extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: the one-node translation. */
  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
      case _ => Nil
    }
  }

  /** Physical sort-merge as-of join. */
  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Attribute,
      rightKey: Attribute,
      leftTime: Attribute,
      rightTime: Attribute,
      rightTieBreak: Attribute)
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // both sides hash-clustered on their key -> co-partitioned exchanges
    // planned (or elided) by EnsureRequirements
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

    // merge order: (key, time) left; (key, time, tieBreak) right so the
    // last eligible right row is the deterministic winner
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
        SortOrder(rightTieBreak, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
      val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
      val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
      val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
      val outputAttrs = output
      val rightWidth = right.output.size
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
        val joined = new JoinedRow
        val nullRight = InternalRow.fromSeq(Seq.fill(rightWidth)(null))
        // one-row lookahead on the right + one buffered best match
        var rNext: InternalRow = null
        def advanceRight(): Unit = {
          rNext = if (rIter.hasNext) rIter.next() else null
        }
        advanceRight()
        var matchKey = 0L
        var haveMatch = false
        var matchRow: InternalRow = null // copied (sort output reuses rows)
        new Iterator[InternalRow] {
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            if (l.isNullAt(lKeyIdx) || l.isNullAt(lTimeIdx)) {
              // null key/time never matches
              return outProj(joined(l, nullRight))
            }
            val lk = l.getLong(lKeyIdx)
            val lt = l.getLong(lTimeIdx)
            // drop any buffered match from an earlier key
            if (haveMatch && matchKey != lk) { haveMatch = false; matchRow = null }
            // advance the right side through every row with
            // (key < lk) or (key == lk && time <= lt)
            var advancing = true
            while (advancing && rNext != null) {
              if (rNext.isNullAt(rKeyIdx) || rNext.isNullAt(rTimeIdx)) {
                advanceRight() // unmatchable right row
              } else {
                val rk = rNext.getLong(rKeyIdx)
                if (rk < lk) {
                  advanceRight()
                } else if (rk == lk && rNext.getLong(rTimeIdx) <= lt) {
                  matchKey = lk; haveMatch = true; matchRow = rNext.copy()
                  advanceRight()
                } else {
                  advancing = false
                }
              }
            }
            if (haveMatch && matchKey == lk) outProj(joined(l, matchRow))
            else outProj(joined(l, nullRight))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Public API: as-of join two DataFrames on a single equi-key and
    * LongType time columns. Requires [[GraftExtensions.install]] (or
    * `spark.sql.extensions`) so the planner knows the node.
    *
    * Output = left.* ++ right.* (right side nullable); caller selects.
    * Right-side columns keep their names — alias upstream if they
    * collide with left names.
    */
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreakCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    // idempotent, additive: makes the operator self-contained without a
    // pre-configured session (only ADDS planning of our own node —
    // never changes the semantics of anything else in the session)
    GraftExtensions.install(spark)
    val lPlan = GraftSqlBridge.analyzedPlan(leftDf)
    val rPlan = GraftSqlBridge.analyzedPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      attr(rPlan, rightTieBreakCol)))
  }
}
