package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused document annotation: ONE pass over the text's UTF-8 bytes
  * produces every [[graft.operators.TextAnalysis.annotate]] column —
  * n_tokens, n_subwords, lang_id, quality, fingerprint — as a single
  * struct.
  *
  * Why fuse: the composable form already tokenizes once (`bindOnce`),
  * but still pays per column — a `regexp_extract_all` that MATERIALIZES
  * every subword match just to count them, two more regex passes for the
  * quality ratios, an `array_distinct` allocation, and a per-token
  * `aggregate` fold per derived column. This expression walks the bytes
  * once, keeps counters on the stack, and allocates only the per-token
  * UTF8String wrappers the language probe / distinct set / hash chain
  * genuinely need. Parity with the composable form is pinned
  * bit-for-bit in TextAnalysisSpec (including the interpreted path).
  *
  * Semantics replicated exactly:
  *  - tokens: maximal runs between ASCII whitespace (Java regex `\s`),
  *    the `split`/`filter` contract;
  *  - n_subwords: count of `[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]+`
  *    matches — an alpha run of length k yields ceil(k/4) matches,
  *    digit/other runs one each (regex alternation order);
  *  - lang_id: [[LanguageId]]'s table/credit/argmax, same tie-break;
  *  - quality: the exact blend incl. Spark `round(_, 6)` = HALF_UP on
  *    BigDecimal.valueOf;
  *  - fingerprint: the chained `aggregate(toks, 0L, xxhash64(acc, t))` —
  *    per step seed 42 over the long accumulator, then the token bytes
  *    ([[XxHash64Function]] is the engine's own implementation).
  *
  * Byte-level correctness: UTF-8 continuation bytes (10xxxxxx) are never
  * ASCII, so whitespace/alpha/digit classification per byte equals the
  * per-code-point classification; code points are counted at
  * non-continuation bytes (= `length()` / numChars on valid UTF-8), and
  * non-ASCII lead bytes fall into the regex's "other" class with
  * continuations extending the same run.
  */
case class AnnotateText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AnnotateText.outputType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${AnnotateText.name} expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    AnnotateText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the whole fused pass is one static call — stays inside the
    // whole-stage-codegen'd projection, no UDF boxing
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.AnnotateText.compute($text);")

  override protected def withNewChildInternal(newChild: Expression): AnnotateText =
    copy(child = newChild)
}

object AnnotateText {
  val name = "annotate_text"

  val outputType: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("lang_id", StringType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("fingerprint", LongType, nullable = false)))

  private def isWs(b: Byte): Boolean = // Java regex \s (ASCII-only)
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** The fused pass (also called from generated code). */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var nChars = 0       // code points (= length())
    var alphaSpace = 0   // code points matching [A-Za-z ]
    var nTok = 0
    var nSub = 0
    var fp = 0L
    val counts = new Array[Int](LanguageId.langs.length)
    val distinct = new java.util.HashSet[UTF8String]()
    var tokStart = -1
    var cls = -1         // subword run class: 0 alpha, 1 digit, 2 other
    var alphaLen = 0

    def flushToken(end: Int): Unit = if (tokStart >= 0) {
      val tok = UTF8String.fromBytes(bytes, tokStart, end - tokStart)
      nTok += 1
      distinct.add(tok)
      val mask = LanguageId.table.get(tok.toLowerCase)
      if (mask != null) LanguageId.credit(counts, mask.intValue())
      // aggregate(toks, 0L, (acc, t) => xxhash64(acc, t)): each step is
      // seed 42 → acc (long) → token bytes
      fp = XxHash64Function.hash(tok, StringType,
        XxHash64Function.hash(fp, LongType, 42L))
      tokStart = -1
    }

    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xC0) == 0x80) {
        // continuation byte: same code point as its lead — not a new
        // char, never whitespace, keeps the current "other" run alive
        if (tokStart < 0) tokStart = i // defensive: valid UTF-8 never starts here
      } else {
        nChars += 1
        if (isWs(b)) {
          if (b == ' ') alphaSpace += 1 // ' ' is whitespace AND in [A-Za-z ]
          flushToken(i)
          cls = -1
        } else {
          if (tokStart < 0) tokStart = i
          if (isAlpha(b)) {
            alphaSpace += 1
            if (cls != 0) { cls = 0; alphaLen = 0 }
            if (alphaLen % 4 == 0) nSub += 1 // [A-Za-z]{1,4}: new match every 4
            alphaLen += 1
          } else if (isDigit(b)) {
            if (cls != 1) { cls = 1; nSub += 1 }
          } else {
            if (cls != 2) { cls = 2; nSub += 1 }
          }
        }
      }
      i += 1
    }
    flushToken(n)

    val nTokD = nTok.toDouble
    val nCharD = nChars.toDouble
    val distinctRatio = if (nTok > 0) distinct.size / nTokD else 0.0
    val alphaRatio = if (nChars > 0) alphaSpace / nCharD else 0.0
    val meanWordLen = if (nTok > 0) nCharD / nTokD else 0.0
    val lenScore = math.min(nTokD / 20.0, 1.0)
    val wordLenScore = if (meanWordLen >= 2.5 && meanWordLen <= 12.0) 1.0 else 0.5
    val q = lenScore * 0.3 + distinctRatio * 0.3 + alphaRatio * 0.2 + wordLenScore * 0.2
    // Spark round(double, 6): HALF_UP over BigDecimal.valueOf
    val quality = java.math.BigDecimal.valueOf(q)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, nSub, LanguageId.pick(counts), quality, fp))
  }

  /** Register `annotate_text` in the session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, build, "scala_udf")

  def build(exprs: Seq[Expression]): AnnotateText = {
    require(exprs.length == 1, s"$name expects exactly 1 argument, got ${exprs.length}")
    AnnotateText(exprs(0))
  }

  /** Column entry point — requires [[register]] on the session. */
  def annotateText(text: Column): Column = call_function(name, text)
}
