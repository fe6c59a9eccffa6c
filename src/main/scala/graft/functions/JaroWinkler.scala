package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity over two string columns, with
  * whole-stage codegen — the fuzzy-match scorer the engine's B11 string
  * suite lacked (q81's levenshtein is edit DISTANCE; JW is the
  * prefix-weighted similarity used for entity/name matching in curation
  * pipelines).
  *
  * Semantics are pinned to the classic definition as implemented by
  * DuckDB's `jaro_winkler_similarity` (validated on 3000 random pairs,
  * zero mismatches; cross-engine oracle in q97):
  *   - operates on UTF-8 BYTES (multi-byte code points compare per byte —
  *     same policy as DuckDB; ASCII inputs are unaffected);
  *   - either input empty → 0.0 (including both-empty);
  *   - match window = max(la, lb)/2 - 1 (floor, min 0);
  *   - transpositions = (mismatched matched-position count) / 2 with
  *     integer floor;
  *   - Winkler boost only when jaro > 0.7 (strict): +l·0.1·(1-jaro),
  *     l = common byte prefix capped at 4.
  *
  * Why native: a per-row lambda/UDF would box both strings and break
  * whole-stage codegen on the fuzzy-join hot path; this expression runs
  * one fused byte-array loop per pair (the scratch boolean arrays are
  * bounded by the string lengths).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${JaroWinkler.name} expects (string, string), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // single static-shaped helper call keeps the generated code tiny and
    // Janino-safe (repo codegen rule: no generics in generated bodies)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  val name = "jaro_winkler"

  /** Shared scalar kernel (interpreted eval AND generated code both call
    * this — bit-identical by construction). Exposed as a static method on
    * the companion so Janino resolves it without MODULE$ indirection.
    */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes; val b = ub.getBytes
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    var window = math.max(la, lb) / 2 - 1
    if (window < 0) window = 0
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(la, lb))
      while (l < cap && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Register `jaro_winkler` in the session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, build, "scala_udf")

  /** Arity-checked builder shared by [[register]] and GraftExtensions. */
  def build(exprs: Seq[Expression]): JaroWinkler = {
    require(exprs.length == 2,
      s"$name expects exactly 2 arguments, got ${exprs.length}")
    JaroWinkler(exprs(0), exprs(1))
  }

  /** Column-level entry point — requires [[register]] on the session. */
  def jaroWinkler(a: Column, b: Column): Column = call_function(name, a, b)
}
