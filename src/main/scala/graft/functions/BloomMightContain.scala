package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe, with whole-stage codegen — the
  * expression form of `bloom.mightContain*` used by
  * [[graft.operators.Relational.bloomPrefilteredJoin]].
  *
  * Why native instead of a scala UDF: a UDF is Catalyst-opaque — it blocks
  * expression-level null tracking and fences the surrounding codegen stage,
  * exactly at the hottest point of the prefilter (one probe per probe-side
  * row). This expression stays inside the fused stage; the filter object
  * ships once per task via the codegen references array (same mechanism
  * Spark's own `BloomFilterMightContain` runtime filter uses — that class
  * is `private[sql]`, hence this public re-implementation).
  *
  * Input must be LongType (integral keys widened by the caller — matching
  * how `DataFrameStatFunctions.bloomFilter` inserted them), StringType
  * (probed as UTF-8 bytes, identical to the sketch's `putString`), or
  * BinaryType. Null input → null out (the enclosing Filter treats that as
  * not-matching, the same outcome as the former UDF's `false`).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects bigint/string/binary, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(input.asInstanceOf[Long])
    // UTF8String.getBytes is exactly the byte sequence putString inserted
    case StringType => bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bloom.mightContainBinary(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // RAW class name (repo codegen rule: Janino rejects generics and
      // silently falls back to interpreted execution)
      val b = ctx.addReferenceObj("bloomFilter", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      child.dataType match {
        case LongType => s"${ev.value} = $b.mightContainLong($v);"
        case StringType => s"${ev.value} = $b.mightContainBinary($v.getBytes());"
        case BinaryType => s"${ev.value} = $b.mightContainBinary($v);"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-level probe over `key` against a driver-built `bloom`. No
    * registry round-trip: the filter object is part of the expression, so
    * the builder goes through the classic-Column bridge directly.
    */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      BloomMightContain(org.apache.spark.sql.GraftPlanBridge.expression(key), bloom))
}
