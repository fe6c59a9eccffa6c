package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native Catalyst expression computing ALL random-hyperplane LSH band
  * signatures of a vector in one fused loop, with whole-stage codegen.
  *
  * The composable form ([[graft.operators.Similarity.bandSignature]], built
  * from `zip_with` + `aggregate` per plane) walks the vector once per plane
  * with an intermediate array allocation each time — `bands ×
  * planesPerBand` passes per row (64 for the default 8×8). This expression
  * makes a single pass per plane over the raw vector buffer with zero
  * allocation beyond the result array; on the ANN hot path (corpus banding
  * in [[graft.operators.Similarity.lshTopK]] and
  * [[graft.operators.Dedup.embeddingNearDupPairs]]) it is the same
  * deliberate custom-Catalyst play as [[CosineSimilarity]].
  *
  * Semantics are IDENTICAL to the composable form (pinned in
  * SimilaritySpec): plane `g = band * planesPerBand + p` has components
  * `Random(0x5eed0000L + g)`-seeded ±1 over `dim` dims; the projection sums
  * `vec(i) * plane(i)` for `i < min(len, dim)` (implicit zero-padding both
  * ways); bit `p` of band signature `band` is set iff the projection
  * is ≥ 0. Null ELEMENTS inside the vector contribute 0 (same as the
  * coalesce in the composable form); a null vector → null result.
  */
case class BandSignatures(
    child: Expression, bands: Int, planesPerBand: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${BandSignatures.name} expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Plane components, row-major [bands*planesPerBand][dim] — the same
    * family as [[graft.operators.Similarity.literalPlane]] so the native
    * and composable paths bucket identically.
    */
  @transient private lazy val planes: Array[Array[Double]] =
    BandSignatures.planeMatrix(bands * planesPerBand, dim)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val fl = isFloat
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var p = 0
      while (p < planesPerBand) {
        val plane = planes(b * planesPerBand + p)
        var proj = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) {
            val x = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
            proj += x * plane(i)
          }
          i += 1
        }
        // NaN projection sets the bit — Spark's nan-safe compare treats
        // NaN >= 0 as true, and the composable form goes through it;
        // plain Java `>=` would silently bucket NaN vectors differently
        if (java.lang.Double.isNaN(proj) || proj >= 0) sig |= 1L << p
        p += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val b = ctx.freshName("b"); val p = ctx.freshName("p")
      val i = ctx.freshName("i"); val sig = ctx.freshName("sig")
      val proj = ctx.freshName("proj"); val plane = ctx.freshName("plane")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planesPerBand; $p++) {
         |    double[] $plane = $planesRef[$b * $planesPerBand + $p];
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) {
         |        $proj += ((double) $v.$get($i)) * $plane[$i];
         |      }
         |    }
         |    if (Double.isNaN($proj) || $proj >= 0) $sig |= 1L << $p;
         |  }
         |  $out[$b] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BandSignatures =
    copy(child = newChild)
}

object BandSignatures {
  val name = "band_sigs"

  /** ±1 plane matrix shared with the interpreted path (and asserted equal
    * to [[graft.operators.Similarity.literalPlane]] in SimilaritySpec).
    */
  def planeMatrix(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes) { g =>
      val rnd = new scala.util.Random(0x5eed0000L + g)
      Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    }

  /** Register `band_sigs` in the session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, build, "scala_udf")

  /** Arity/literal-checked builder (shared with GraftExtensions). */
  def build(exprs: Seq[Expression]): BandSignatures = {
    require(exprs.length == 4,
      s"$name expects (vec, bands, planesPerBand, dim), got ${exprs.length} args")
    def intOf(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$name: $what must be an INT literal, got $other")
    }
    BandSignatures(exprs(0),
      intOf(exprs(1), "bands"),
      intOf(exprs(2), "planesPerBand"),
      intOf(exprs(3), "dim"))
  }

  /** Column-level entry point — requires [[register]] on the session. */
  def bandSigs(vec: Column, bands: Int, planesPerBand: Int, dim: Int): Column =
    call_function(name, vec, lit(bands), lit(planesPerBand), lit(dim))
}
