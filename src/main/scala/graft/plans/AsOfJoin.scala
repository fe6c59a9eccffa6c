package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the canonical whole-operator-semantics case the
  * built-in operator set cannot express as a single operator (SURVEY.md
  * §4.4 path (c)): custom LogicalPlan + Strategy + SparkPlan.
  *
  * Semantics: for each left row, attach the latest right row of the same
  * key with `right.ts <= left.ts` and `left.ts - right.ts <= toleranceMs`;
  * unmatched left rows get nulls (left outer as-of).
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted by
  * (key, ts); one streaming merge pass per partition holds exactly ONE
  * candidate right row of state — O(|L| + |R|) time, O(1) memory, no
  * union/window materialization (the composable fallback,
  * [[graft.operators.Relational.asOfJoin]], sorts the unioned inputs and
  * runs a window over them).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightValues: Seq[Expression],
    rightOutAttrs: Seq[Attribute],
    toleranceMicros: Long) extends BinaryNode {

  // the fabricated asof_* attributes are CONSTRUCTOR state, materialized
  // exactly once in the builder — a def that minted fresh
  // AttributeReferences per call would hand different exprIds to each
  // downstream resolution pass (select/filter after the join would bind
  // against one set and resolve against another)
  override def output: Seq[Attribute] = left.output ++ rightOutAttrs

  // the asof_* attributes originate HERE, not in a child — without this,
  // CheckAnalysis counts them as missing input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rightOutAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightValues: Seq[Expression],
    toleranceMicros: Long,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // right side adds the ORDERABLE value columns as tertiary sort keys:
  // among right rows tied on (key, ts) the LAST consumed becomes the
  // candidate, so without a payload tie-break the winner would be
  // shuffle-order-dependent. Ascending payload ⇒ greatest payload wins —
  // the same deterministic choice the composable fallback makes
  // (Relational.asOfJoin's struct tie-break). Unorderable payloads
  // (maps) are skipped rather than crashing the sort; their ties stay
  // arrival-ordered.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)) ++
      rightValues
        .filter(v => org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(v.dataType))
        .map(v => SortOrder(v, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tol = toleranceMicros
    val nRightVals = rightValues.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), left.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), right.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val rValProj = UnsafeProjection.create(rightValues, right.output)
      val outProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(nRightVals)
      val joined = new JoinedRow

      // single-candidate state: the latest right row (key, ts, values)
      // with ts <= current left ts
      var candKey: Any = null
      var candTs: Long = Long.MinValue
      var candVals: InternalRow = null
      var nextRight: InternalRow = null
      var rightExhausted = false

      // Null semantics match Spark's built-in joins: a null key (either
      // side) or a null timestamp never matches. The sort puts nulls FIRST
      // (Ascending default), so null-key / null-ts right rows are drained
      // before any real candidate of the same key appears.
      def advanceRightTo(lk: Any, lts: Long): Unit = {
        var continue = true
        while (continue && !rightExhausted) {
          if (nextRight == null) {
            if (rIter.hasNext) nextRight = rIter.next().copy()
            else { rightExhausted = true; continue = false }
          }
          if (nextRight != null) {
            val rkRow = rKeyProj(nextRight)
            if (rkRow.isNullAt(0)) {
              nextRight = null // null-key right rows match nothing; skip
            } else {
              val rk = rkRow.get(0, rightKey.dataType)
              val cmp = keyOrdering.asInstanceOf[Ordering[Any]].compare(rk, lk)
              val rtsRow = rTsProj(nextRight)
              val rtsNull = rtsRow.isNullAt(0)
              val rts = if (rtsNull) Long.MinValue else rtsRow.getLong(0)
              if (cmp < 0 || (cmp == 0 && (rtsNull || rts <= lts))) {
                // consume: becomes the candidate if same key with a real
                // ts. copyValue: the projected key points into the
                // projection's REUSED buffer — storing it uncopied lets
                // the next projection mutate it
                if (cmp == 0 && !rtsNull) {
                  candKey = InternalRow.copyValue(rk)
                  candTs = rts
                  candVals = rValProj(nextRight).copy()
                } else if (cmp < 0) {
                  candKey = null; candVals = null // stale key drained
                } // cmp == 0 && rtsNull: skip, candidate state untouched
                nextRight = null
              } else continue = false
            }
          }
        }
      }

      lIter.map { lRow =>
        val lkRow = lKeyProj(lRow)
        val lkNull = lkRow.isNullAt(0)
        val lk = if (lkNull) null else lkRow.get(0, leftKey.dataType)
        val ltsRow = lTsProj(lRow)
        val ltsNull = ltsRow.isNullAt(0)
        val lts = if (ltsNull) Long.MinValue else ltsRow.getLong(0)
        // null-key/null-ts left rows sort first and never match — emit
        // unmatched without advancing (nothing can be a candidate for them)
        if (!lkNull && !ltsNull) advanceRightTo(lk, lts)
        val matched = !lkNull && !ltsNull && candVals != null && candKey != null &&
          keyOrdering.asInstanceOf[Ordering[Any]].compare(candKey, lk) == 0 &&
          lts - candTs <= tol
        outProj(joined(lRow, if (matched) candVals else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(
        planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTs, p.rightTs,
        p.rightValues, p.toleranceMicros, p.output) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Public entry: native as-of join between two DataFrames.
    * `tsCol` must be TimestampType on both sides (compared at µs
    * precision); right value columns surface as nullable `asof_<name>`.
    * Registers the planner strategy via `spark.experimental.extraStrategies`
    * (idempotent) — no session rebuild required.
    */
  def asOfJoin(
      leftDf: DataFrame, rightDf: DataFrame,
      keyCol: String, tsCol: String, valueCols: Seq[String],
      toleranceMs: Long = Long.MaxValue): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val lPlan = GraftPlanBridge.logicalPlan(leftDf)
    // Self-join safety: when both sides derive from the same base relation
    // (as-of joining a table against a filtered view of itself), their
    // attribute ids collide. DeduplicateRelations then re-ids the right
    // child — but for a CUSTOM BinaryNode it cannot rewrite this node's
    // key/ts/value expressions the way it does for built-in Join, leaving
    // them referencing ids the executed child no longer produces
    // ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]). Re-minting the right side's
    // output ids up front via an alias projection (Alias always assigns a
    // fresh exprId) makes the children disjoint so the rule never fires;
    // the optimizer collapses the extra Project into the scan.
    val rPlan = GraftPlanBridge.logicalPlan(
      rightDf.select(rightDf.columns.map(c => col(c).as(c)).toIndexedSeq: _*))
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))

    // compare event time as epoch micros (long) — integer, total order.
    // NOT Cast(ts, long): that truncates to SECONDS.
    def tsMicros(a: Attribute): Expression =
      org.apache.spark.sql.catalyst.expressions.UnixMicros(a)

    require(toleranceMs >= 0, s"toleranceMs must be >= 0, got $toleranceMs")
    // saturating ms → µs conversion: the default Long.MaxValue tolerance
    // multiplied by 1000 would overflow to a NEGATIVE tolerance and
    // silently unmatch every row
    val tolMicros =
      if (toleranceMs > Long.MaxValue / 1000L) Long.MaxValue
      else toleranceMs * 1000L

    val rightVals = valueCols.map(attr(rPlan, _))
    // fabricate the asof_* output attributes ONCE — see AsOfJoinPlan.output
    val rightOutAttrs = rightVals.zip(valueCols).map { case (e, n) =>
      AttributeReference(s"asof_$n", e.dataType, nullable = true)()
    }

    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, keyCol), attr(rPlan, keyCol),
      tsMicros(attr(lPlan, tsCol)), tsMicros(attr(rPlan, tsCol)),
      rightVals, rightOutAttrs, tolMicros)
    GraftPlanBridge.ofRows(spark, plan)
  }
}
