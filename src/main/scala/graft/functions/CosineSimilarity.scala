package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>`/`array<double>` columns, with whole-stage codegen.
  *
  * The composable fallback ([[graft.operators.Similarity.cosine]], built
  * from `zip_with` + `aggregate`) allocates three intermediate arrays and a
  * lambda frame per element; this expression runs one fused scalar loop
  * over the vector buffers — the difference is ~an order of magnitude on
  * the ANN hot path (per SURVEY.md §4.4: the one deliberate custom-Catalyst
  * perf play for B18).
  *
  * Null semantics: null if either input ARRAY is null (standard binary
  * expression); vectors of different lengths score over the common prefix;
  * all-zero vectors → 0.0. A null ELEMENT inside an array reads as 0.0
  * (zero-fill) — this deliberately diverges from the composable
  * zip_with/aggregate fallback, where one null element nulls the whole
  * dot product and the score collapses to 0.0 via the zero-guard; for
  * well-formed embeddings (no null elements) the two agree bit-for-bit
  * (pinned in CosineSimilaritySpec).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float|double>, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    // include tail elements in the norms so equal-length inputs dominate
    var j = n
    while (j < x.numElements()) { val v = if (lf) x.getFloat(j).toDouble else x.getDouble(j); nx += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = if (rf) y.getFloat(j).toDouble else y.getDouble(j); ny += v * v; j += 1 }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom > 0) dot / denom else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val denom = ctx.freshName("denom")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $x.$lGet($i);
         |  double $yv = (double) $y.$rGet($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |for (int $i = $n; $i < $x.numElements(); $i++) {
         |  double $xv = (double) $x.$lGet($i); $nx += $xv * $xv;
         |}
         |for (int $i = $n; $i < $y.numElements(); $i++) {
         |  double $yv = (double) $y.$rGet($i); $ny += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($denom > 0) ? ($dot / $denom) : 0.0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val name = "cosine_sim"

  /** Register `cosine_sim` in the session's function registry (also makes
    * it available to SQL text). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, build, "scala_udf")

  /** Arity-checked builder shared by [[register]] and GraftExtensions. */
  def build(exprs: Seq[Expression]): CosineSimilarity = {
    require(exprs.length == 2,
      s"$name expects exactly 2 arguments, got ${exprs.length}")
    CosineSimilarity(exprs(0), exprs(1))
  }

  /** Column-level entry point — requires [[register]] on the session. */
  def cosineSim(a: Column, b: Column): Column = call_function(name, a, b)
}
