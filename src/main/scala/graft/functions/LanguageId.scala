package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID over a token array: one HASH probe per token into
  * the stopword → language table, counts accumulated in a stack array,
  * argmax with the same tie-break as the composable form (larger language
  * code wins, "und" on zero hits). Whole-stage codegen.
  *
  * The composable form ([[graft.operators.TextAnalysis.languageIdFromTokens]],
  * `aggregate` over a literal map) pays a LINEAR scan of all ~50 stopword
  * entries per token (Catalyst literal maps are ArrayBasedMapData — no
  * hashing) plus a fresh 5-slot counts array allocation per token. This
  * expression probes a real hash map and allocates nothing per token —
  * the dominant cost of `TextAnalysis.annotate` at corpus scale.
  *
  * Tokens are lower-cased INSIDE the loop (UTF8String.toLowerCase), so
  * callers pass raw tokens — parity with the composable form applied to
  * pre-lowered tokens is pinned in TextAnalysisSpec.
  */
case class LanguageId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${LanguageId.name} expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](LanguageId.langs.length)
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i)) {
        val mask = LanguageId.table.get(toks.getUTF8String(i).toLowerCase)
        if (mask != null) LanguageId.credit(counts, mask.intValue())
      }
      i += 1
    }
    LanguageId.pick(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // RAW HashMap type: Janino (Spark's codegen compiler) does not
    // support generic type arguments — a parameterized cast would fail
    // compilation and silently drop the whole stage to interpreted mode
    val tableRef = ctx.addReferenceObj("langTable", LanguageId.table,
      "java.util.HashMap")
    val n = LanguageId.langs.length
    nullSafeCodeGen(ctx, ev, toks => {
      val counts = ctx.freshName("counts"); val i = ctx.freshName("i")
      val mask = ctx.freshName("mask")
      s"""
         |int[] $counts = new int[$n];
         |for (int $i = 0; $i < $toks.numElements(); $i++) {
         |  if (!$toks.isNullAt($i)) {
         |    Integer $mask = (Integer) $tableRef.get($toks.getUTF8String($i).toLowerCase());
         |    if ($mask != null) graft.functions.LanguageId.credit($counts, $mask.intValue());
         |  }
         |}
         |${ev.value} = graft.functions.LanguageId.pick($counts);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LanguageId =
    copy(child = newChild)
}

object LanguageId {
  val name = "lang_id"

  /** Language codes, sorted ascending — index space of the counts array. */
  val langs: Array[String] =
    graft.operators.TextAnalysis.stopwords.keys.toArray.sorted

  /** stopword (lower, UTF8) → language BITMASK. Bitmask, not index:
    * stopwords shared between languages ("la"/"que" in fr AND es) must
    * credit every language containing them — same fix as the composable
    * form's lookup map.
    */
  val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    graft.operators.TextAnalysis.stopwords.foreach { case (lang, ws) =>
      val bit = 1 << langs.indexOf(lang)
      ws.foreach { w =>
        val k = UTF8String.fromString(w.toLowerCase)
        val prev = m.get(k)
        m.put(k, if (prev == null) bit else prev.intValue() | bit)
      }
    }
    m
  }

  /** Bump every language whose bit is set (called from generated code). */
  def credit(counts: Array[Int], mask: Int): Unit = {
    var i = 0
    while (i < counts.length) {
      if ((mask & (1 << i)) != 0) counts(i) += 1
      i += 1
    }
  }

  /** Argmax with the composable form's tie-break: scanning langs in
    * ascending order with `>=` makes the lexicographically LARGEST code
    * win ties (array_max over struct(hits, lang) compares lang second).
    * Zero hits → "und".
    */
  def pick(counts: Array[Int]): UTF8String = {
    var best = -1; var bestIdx = -1
    var i = 0
    while (i < counts.length) {
      if (counts(i) >= best && counts(i) > 0) { best = counts(i); bestIdx = i }
      i += 1
    }
    if (bestIdx < 0) UTF8String.fromString("und")
    else UTF8String.fromString(langs(bestIdx))
  }

  /** Register `lang_id` in the session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, build, "scala_udf")

  def build(exprs: Seq[Expression]): LanguageId = {
    require(exprs.length == 1, s"$name expects exactly 1 argument, got ${exprs.length}")
    LanguageId(exprs(0))
  }

  /** Column entry point — requires [[register]] on the session. */
  def langId(tokens: Column): Column = call_function(name, tokens)
}
