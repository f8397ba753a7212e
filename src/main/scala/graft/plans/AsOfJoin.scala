package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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
  * v2 scope (v1 was single Long key/time): any number of equi-key
  * columns of any orderable type (compared through a projected-key
  * interpreted ordering), and time columns typed `bigint`, `timestamp`
  * or `timestamp_ntz` — all three are long-backed in InternalRow
  * (epoch micros for the timestamp types), so the merge loop stays a
  * primitive long comparison. Null keys/times never match (skipped on
  * the right, null-extended on the left).
  */
object AsOfJoin {

  private val LongBacked: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)

  /** Logical node. Built from ANALYZED child plans with resolved
    * attributes, so no analyzer rule is needed. */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
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
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTime: Attribute,
      rightTime: Attribute,
      rightTieBreak: Attribute)
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // both sides hash-clustered on their keys -> co-partitioned exchanges
    // planned (or elided) by EnsureRequirements
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    // merge order: (keys..., time) left; (keys..., time, tieBreak) right
    // so the last eligible right row is the deterministic winner
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) ++
        Seq(SortOrder(rightTime, Ascending), SortOrder(rightTieBreak, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
      val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
      val lKeyAttrs = leftKeys
      val rKeyAttrs = rightKeys
      val keyTypes = leftKeys.map(_.dataType)
      val lOutput = left.output
      val rOutput = right.output
      val outputAttrs = output
      val rightWidth = right.output.size
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
        // project each side's key columns into a comparable row; the
        // interpreted natural ordering covers every orderable type
        val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOutput)
        val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOutput)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val nKeys = keyTypes.size
        def keyHasNull(keyRow: InternalRow): Boolean = {
          var i = 0
          while (i < nKeys) { if (keyRow.isNullAt(i)) return true; i += 1 }
          false
        }
        val joined = new JoinedRow
        val nullRight = InternalRow.fromSeq(Seq.fill(rightWidth)(null))
        // one-row lookahead on the right + one buffered best match
        var rNext: InternalRow = null
        var rNextKey: InternalRow = null
        def advanceRight(): Unit =
          if (rIter.hasNext) {
            rNext = rIter.next()
            rNextKey = rKeyProj(rNext)
          } else { rNext = null; rNextKey = null }
        advanceRight()
        var matchKey: InternalRow = null // copied projected key
        var matchRow: InternalRow = null // copied (sort output reuses rows)
        new Iterator[InternalRow] {
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            if (keyHasNull(lKey) || l.isNullAt(lTimeIdx)) {
              // null key/time never matches
              return outProj(joined(l, nullRight))
            }
            val lt = l.getLong(lTimeIdx)
            // drop any buffered match from an earlier key
            if (matchRow != null && keyOrd.compare(matchKey, lKey) != 0) matchRow = null
            // advance the right side through every row with
            // (key < lKey) or (key == lKey && time <= lt)
            var advancing = true
            while (advancing && rNext != null) {
              if (keyHasNull(rNextKey) || rNext.isNullAt(rTimeIdx)) {
                advanceRight() // unmatchable right row
              } else {
                val c = keyOrd.compare(rNextKey, lKey)
                if (c < 0) {
                  advanceRight()
                } else if (c == 0 && rNext.getLong(rTimeIdx) <= lt) {
                  matchKey = rNextKey.copy(); matchRow = rNext.copy()
                  advanceRight()
                } else {
                  advancing = false
                }
              }
            }
            if (matchRow != null && keyOrd.compare(matchKey, lKey) == 0) {
              outProj(joined(l, matchRow))
            } else outProj(joined(l, nullRight))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Public API: as-of join two DataFrames on one or more equi-key
    * columns and long-backed time columns (`bigint`, `timestamp`,
    * `timestamp_ntz`). Requires [[GraftExtensions.install]] (or
    * `spark.sql.extensions`) so the planner knows the node.
    *
    * Output = left.* ++ right.* (right side nullable); caller selects.
    * Right-side columns keep their names — alias upstream if they
    * collide with left names.
    */
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreakCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    // idempotent, additive: makes the operator self-contained without a
    // pre-configured session (only ADDS planning of our own node —
    // never changes the semantics of anything else in the session)
    GraftExtensions.install(spark)
    GraftSqlBridge.ofRows(spark, buildPlan(leftDf, rightDf,
      leftKeyCols, rightKeyCols, leftTimeCol, rightTimeCol, rightTieBreakCol))
  }

  /** Validate columns/types and build the logical node — shared by the
    * Column API ([[join]]) and the SQL table function
    * (`graft_asof(...)`, [[GraftExtensions]]). */
  private[plans] def buildPlan(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreakCol: String): AsOfJoinPlan = {
    require(leftKeyCols.nonEmpty && leftKeyCols.size == rightKeyCols.size,
      s"key lists must be non-empty and same-length, got $leftKeyCols vs $rightKeyCols")
    val lPlan = GraftSqlBridge.analyzedPlan(leftDf)
    val rPlan = GraftSqlBridge.analyzedPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    val lk = leftKeyCols.map(attr(lPlan, _))
    val rk = rightKeyCols.map(attr(rPlan, _))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name}: ${a.dataType.simpleString} vs " +
          s"${b.name}: ${b.dataType.simpleString}")
    }
    val lt = attr(lPlan, leftTimeCol)
    val rt = attr(rPlan, rightTimeCol)
    Seq(lt, rt).foreach { t =>
      require(LongBacked.contains(t.dataType),
        s"time column ${t.name} must be bigint/timestamp/timestamp_ntz, " +
          s"got ${t.dataType.simpleString}")
    }
    require(lt.dataType == rt.dataType,
      s"time type mismatch: ${lt.dataType.simpleString} vs ${rt.dataType.simpleString}")
    AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, attr(rPlan, rightTieBreakCol))
  }

  /** Single-key convenience overload (the v1 signature). */
  def join(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieBreakCol: String): DataFrame =
    join(leftDf, rightDf, Seq(leftKeyCol), Seq(rightKeyCol),
      leftTimeCol, rightTimeCol, rightTieBreakCol)
}
