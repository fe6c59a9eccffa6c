package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native binary-search bucket assignment: the count of elements of a
  * SORTED `array<double>` that are `<=` the probe value — i.e. the
  * upper-bound index, which is exactly the range-bucket id when the
  * array holds interior bucket boundaries
  * ([[graft.operators.Relational.distributionRanks]]).
  *
  * The composable form — `aggregate(bnds, 0, (acc,b) -> acc + when(v >=
  * b, 1))` — is a linear fold that materializes one `when` branch per
  * boundary in codegen: profiled at ~0.7 s per pass over 150k rows × 63
  * boundaries (tools/Q79Profile, the q79 hot spot). This expression is
  * log₂(B) comparisons in one static call, no per-element Column
  * machinery. Ties: every element equal to the probe counts (<=), which
  * matches the fold's `>=` orientation bucket-for-bucket.
  *
  * Contract: the array must be sorted ascending (percentile output is);
  * null ELEMENTS are not expected (percentile of non-null input) — if
  * present they sort per Spark's array writer and the result is
  * unspecified. Null array or null probe → null (standard binary
  * expression semantics).
  */
case class UpperBoundCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${UpperBoundCount.name} expects (array<double>, double), got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    UpperBoundCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, v) =>
      s"${ev.value} = graft.functions.UpperBoundCount.count($arr, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UpperBoundCount =
    copy(left = newLeft, right = newRight)
}

object UpperBoundCount {
  val name = "upper_bound_count"

  /** # of elements <= v in the sorted array: binary search for the first
    * index with arr(i) > v. Static so codegen emits one call (the
    * AnnotateText pattern).
    */
  def count(arr: ArrayData, v: Double): Int = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def upperBoundCount(arr: Column, v: Column): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      UpperBoundCount(org.apache.spark.sql.GraftPlanBridge.expression(arr),
        org.apache.spark.sql.GraftPlanBridge.expression(v)))
}
