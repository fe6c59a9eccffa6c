package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array, with whole-stage codegen.
  *
  * Semantics (bit-for-bit identical to the composable HOF fallback
  * [[graft.operators.Dedup.simhash]] for null-free token arrays,
  * pinned in SimHash64Spec): every token's `xxhash64(token)` (Spark's own
  * hash family, seed 42 — the SAME hash the explode+aggregate signature
  * path uses, so all three simhash forms agree) votes ±1 per bit position;
  * bit i of the result is set iff its vote sum is positive. Zero tokens →
  * signature 0.
  *
  * Why native: the HOF fallback folds a 64-element vote array through
  * `aggregate`/`zip_with`, allocating two arrays and a lambda frame per
  * token per row; this expression runs one fused loop with a single int[64]
  * per row. Null ELEMENTS inside the array are skipped here (the HOF form
  * would fold in Spark's hash-of-null = the bare seed — a hash of nothing;
  * tokenizers never emit null tokens, so the divergence is unobservable in
  * the pipelines, and documented like CosineSimilarity's).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${SimHash64.name} expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      // RAW types only (repo codegen rule: Janino can't compile generic
      // casts and silently drops the stage to interpreted execution)
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($arr.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val name = "simhash64"

  /** Register `simhash64` in the session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, build, "scala_udf")

  /** Arity-checked builder shared by [[register]] and GraftExtensions. */
  def build(exprs: Seq[Expression]): SimHash64 = {
    require(exprs.length == 1,
      s"$name expects exactly 1 argument, got ${exprs.length}")
    SimHash64(exprs.head)
  }

  /** Column-level entry point — requires [[register]] on the session. */
  def simhash64(tokens: Column): Column = call_function(name, tokens)
}
