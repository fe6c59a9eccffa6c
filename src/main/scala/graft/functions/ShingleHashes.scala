package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused token-shingle hashing: one pass from text to the 64-bit window
  * hashes, bit-for-bit equal to the composed
  * [[graft.operators.TextAnalysis.shingleHashes]] form
  *
  * {{{
  * when(size(toks) < n, when(size(toks) > 0, array(xxhash64(toks))) …)
  *   .otherwise(transform(sequence(0, size(toks) - n),
  *     i => xxhash64(slice(toks, i + 1, n))))
  * }}}
  *
  * (including the fewer-than-n-tokens whole-text fallback, so every
  * non-empty doc has ≥ 1 shingle), optionally with `array_distinct`
  * folded in (first-occurrence order — the `distinct = true` variant is
  * value-equal to `array_distinct(shingleHashes(text, n))`).
  *
  * Why fused: TokBench showed the composed window pipeline is dominated
  * by `sequence`/lambda/`slice`/boxing machinery, not hashing. Window
  * values chain the engine's own [[XxHash64Function]] over the token
  * strings exactly as Spark hashes an array<string> (seed 42, per
  * element `hash(tok, acc)`), so downstream MinHash/LSH/join keys are
  * unchanged. Parity is differentially pinned in TextAnalysisSpec.
  * Null yields null (composed yields [] through bindOnce — equivalent
  * at every call site, which explode or aggregate the array).
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"shingle n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($text, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val EmptyLongs = new GenericArrayData(Array.emptyLongArray)

  /** Also called from generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length

    var toks = new Array[UTF8String](16)
    var t = 0
    var i = 0
    var start = -1
    while (i < len) {
      val b = bytes(i)
      if (b == ' ' || (b >= '\t' && b <= '\r')) {
        if (start >= 0) {
          if (t == toks.length) toks = java.util.Arrays.copyOf(toks, t * 2)
          toks(t) = UTF8String.fromBytes(bytes, start, i - start)
          t += 1
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) {
      if (t == toks.length) toks = java.util.Arrays.copyOf(toks, t + 1)
      toks(t) = UTF8String.fromBytes(bytes, start, len - start)
      t += 1
    }

    if (t == 0) return EmptyLongs

    // xxhash64(array<string>): acc = 42, then hash(elem, acc) per element
    def windowHash(from: Int, count: Int): Long = {
      var acc = 42L
      var k = from
      val until = from + count
      while (k < until) { acc = XxHash64Function.hash(toks(k), StringType, acc); k += 1 }
      acc
    }

    if (t < n) return new GenericArrayData(Array(windowHash(0, t)))

    val nw = t - n + 1
    val out = new Array[Long](nw)
    var outN = 0
    if (!distinct) {
      while (outN < nw) { out(outN) = windowHash(outN, n); outN += 1 }
      return new GenericArrayData(out)
    }
    // fold array_distinct in: open addressing, first-occurrence order
    val cap = java.lang.Integer.highestOneBit(math.max(4, nw * 2) - 1) << 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var w = 0
    while (w < nw) {
      val h = windowHash(w, n)
      var slot = (h ^ (h >>> 32)).toInt & mask
      var fresh = true
      while (used(slot) && fresh) {
        if (table(slot) == h) fresh = false
        else slot = (slot + 1) & mask
      }
      if (fresh) {
        used(slot) = true
        table(slot) = h
        out(outN) = h
        outN += 1
      }
      w += 1
    }
    new GenericArrayData(
      if (outN == nw) out else java.util.Arrays.copyOf(out, outN))
  }
}
