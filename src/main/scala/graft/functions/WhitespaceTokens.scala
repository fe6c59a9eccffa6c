package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: the exact semantics of
  * `filter(split(text, "\\s+"), t => length(t) > 0)` as a single
  * byte-scan over the UTF-8 payload.
  *
  * Why: Spark's `StringSplit` with a real regex goes through
  * `UTF8String.toString` (full UTF-16 decode + String alloc per row),
  * `String.split` (which `Pattern.compile`s `\s+` per row — the
  * single-char fast path doesn't apply to a regex), a `Matcher` walk,
  * and then re-encodes every token via `fromString`. Tokenization is
  * the innermost loop of every text operator here (shingles, n-gram
  * dedup, language-ID, quality, token counts), so that per-row cost is
  * the engine's hottest constant. This expression scans bytes once and
  * emits zero-copy `UTF8String.fromBytes` slices over one shared
  * buffer.
  *
  * Byte-level correctness (same argument as [[AnnotateText]], where the
  * identical tokenization is already parity-pinned): Java regex `\s` is
  * ASCII-only (`[ \t\n\x0B\f\r]`), and UTF-8 continuation/lead bytes of
  * non-ASCII code points are all ≥ 0x80, so per-byte comparison against
  * the six ASCII separators classifies exactly like per-code-point
  * regex matching. Leading/trailing/empty-token behavior matches the
  * `split`+`filter` contract (maximal non-separator runs; all-space and
  * empty inputs yield an empty array; null yields null).
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WhitespaceTokens.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call — stays inside the whole-stage-codegen'd
    // projection, no UDF boxing
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.WhitespaceTokens.split($text);")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

object WhitespaceTokens {

  /** The scan (also called from generated code). Token slices share the
    * input's byte buffer — no per-token copies.
    */
  def split(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](math.min(16, n / 4 + 1))
    var i = 0
    var start = -1
    while (i < n) {
      val b = bytes(i)
      // Java regex \s: space, tab, \n, \x0B, \f, \r — all ASCII, so a
      // byte-equality test is exact on UTF-8 (multi-byte code points
      // never contain bytes < 0x80)
      val ws = b == ' ' || (b >= '\t' && b <= '\r')
      if (ws) {
        if (start >= 0) {
          out.add(UTF8String.fromBytes(bytes, start, i - start))
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray)
  }

  /** Count-only form of [[split]]: identical token boundaries, zero
    * allocation — for `size(tokens(text))` call sites (token budgets,
    * length filters) where the tokens themselves are never consumed.
    */
  def count(text: UTF8String): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    var c = 0
    var i = 0
    var in = false
    while (i < n) {
      val b = bytes(i)
      val ws = b == ' ' || (b >= '\t' && b <= '\r')
      if (ws) in = false
      else if (!in) { c += 1; in = true }
      i += 1
    }
    c
  }
}

/** Native whitespace token COUNT: `size(ws_tokens(text))` without
  * materializing the token array (no per-token UTF8String slices, no
  * ArrayList, no GenericArrayData). Token-count columns sit on every
  * corpus row in the budget/packing operators
  * ([[graft.operators.Curation.tokenBudgetMixture]], sequence packing,
  * min-length filters), where the array form's allocations are pure
  * waste. Semantics pinned ≡ `size(tokens(text))` in
  * TextAnalysisSpec; boundary classification is byte-exact per the
  * [[WhitespaceTokens]] argument.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_count expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WhitespaceTokens.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.WhitespaceTokens.count($text);")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}
