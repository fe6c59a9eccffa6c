package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
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
    rightValues: Seq[Expression], rightValueNames: Seq[String],
    toleranceMs: Long) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.zip(rightValueNames).map { case (e, n) =>
      AttributeReference(s"asof_$n", e.dataType, nullable = true)()
    }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightValues: Seq[Expression],
    toleranceMs: Long,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tol = toleranceMs
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

      def advanceRightTo(lk: Any, lts: Long): Unit = {
        var continue = true
        while (continue && !rightExhausted) {
          if (nextRight == null) {
            if (rIter.hasNext) nextRight = rIter.next().copy()
            else { rightExhausted = true; continue = false }
          }
          if (nextRight != null) {
            val rk = rKeyProj(nextRight).get(0, rightKey.dataType)
            val cmp = keyOrdering.asInstanceOf[Ordering[Any]].compare(rk, lk)
            val rts = rTsProj(nextRight).getLong(0)
            if (cmp < 0 || (cmp == 0 && rts <= lts)) {
              // consume: becomes the candidate if same key. copyValue: the
              // projected key points into the projection's REUSED buffer —
              // storing it uncopied lets the next projection mutate it
              if (cmp == 0) {
                candKey = InternalRow.copyValue(rk)
                candTs = rts
                candVals = rValProj(nextRight).copy()
              }
              else { candKey = null; candVals = null } // stale key drained
              nextRight = null
            } else continue = false
          }
        }
      }

      lIter.map { lRow =>
        val lk = lKeyProj(lRow).get(0, leftKey.dataType)
        val lts = lTsProj(lRow).getLong(0)
        advanceRightTo(lk, lts)
        val matched = candVals != null && candKey != null &&
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
        p.rightValues, p.toleranceMs, p.output) :: Nil
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
    val rPlan = GraftPlanBridge.logicalPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))

    // compare event time as epoch micros (long) — integer, total order.
    // NOT Cast(ts, long): that truncates to SECONDS.
    def tsMicros(a: Attribute): Expression =
      org.apache.spark.sql.catalyst.expressions.UnixMicros(a)

    val plan = AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, keyCol), attr(rPlan, keyCol),
      tsMicros(attr(lPlan, tsCol)), tsMicros(attr(rPlan, tsCol)),
      valueCols.map(attr(rPlan, _)), valueCols,
      toleranceMs * 1000L) // tolerance in µs to match epoch-micros ts
    GraftPlanBridge.ofRows(spark, plan)
  }
}
