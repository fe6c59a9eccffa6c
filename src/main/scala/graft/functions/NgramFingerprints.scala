package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused distinct n-gram window fingerprints: one byte-scan from text to
  * `array<bigint>`, bit-for-bit equal to the composed form
  *
  * {{{
  * array_distinct(transform(sequence(0, size(th) - n),
  *   i => xxhash64(slice(th, i + 1, n))))          // th = transform(tokens, xxhash64)
  * }}}
  *
  * but without its per-window machinery — the composed pipeline pays a
  * `sequence` array allocation, a lambda dispatch, a `slice` copy, and
  * per-element Long boxing for EVERY window, which profiling (TokBench)
  * showed dominates the n-gram construction cost (the string-vs-hash
  * choice inside the window was a wash). Here: tokenize (the
  * [[WhitespaceTokens]] byte-scan), hash each token once with the
  * engine's own [[XxHash64Function]] (seed 42 — identical values), then
  * fold each window over [[XXH64.hashLong]] exactly like Spark's array
  * hashing does, deduping through an open-addressing long set that
  * preserves first-occurrence order (the `array_distinct` contract).
  *
  * Parity with the composed form is differentially pinned in
  * TextAnalysisSpec. Fewer than n tokens yields an empty array; null
  * yields null (the composed form yields [] for null through bindOnce's
  * array-wrap — equivalent under explode, which both callers use).
  */
case class NgramFingerprints(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_fingerprints expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramFingerprints.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.NgramFingerprints.compute($text, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramFingerprints =
    copy(child = newChild)
}

object NgramFingerprints {

  private val EmptyLongs = new GenericArrayData(Array.emptyLongArray)

  /** One pass: tokens → token hashes → chained window hashes → ordered
    * distinct. Also called from generated code.
    */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length

    // token hashes, one xxhash64(token) per token (seed 42 — the
    // engine's single-argument xxhash64 of a string)
    var th = new Array[Long](16)
    var t = 0
    var i = 0
    var start = -1
    def flush(end: Int): Unit = if (start >= 0) {
      if (t == th.length) th = java.util.Arrays.copyOf(th, t * 2)
      th(t) = XxHash64Function.hash(
        UTF8String.fromBytes(bytes, start, end - start), StringType, 42L)
      t += 1
      start = -1
    }
    while (i < len) {
      val b = bytes(i)
      if (b == ' ' || (b >= '\t' && b <= '\r')) flush(i)
      else if (start < 0) start = i
      i += 1
    }
    flush(len)

    if (t < n) return EmptyLongs

    // chained window hash = Spark's array hashing of slice(th, i+1, n):
    // acc starts at the xxhash64 seed, each element folds via hashLong
    val nw = t - n + 1
    val out = new Array[Long](nw)
    var outN = 0
    // open-addressing set over the window hashes, first-occurrence order
    val cap = java.lang.Integer.highestOneBit(math.max(4, nw * 2) - 1) << 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var w = 0
    while (w < nw) {
      var acc = 42L
      var k = 0
      while (k < n) { acc = XXH64.hashLong(th(w + k), acc); k += 1 }
      var slot = (acc ^ (acc >>> 32)).toInt & mask
      var fresh = true
      while (used(slot) && fresh) {
        if (table(slot) == acc) fresh = false
        else slot = (slot + 1) & mask
      }
      if (fresh) {
        used(slot) = true
        table(slot) = acc
        out(outN) = acc
        outN += 1
      }
      w += 1
    }
    new GenericArrayData(
      if (outN == nw) out else java.util.Arrays.copyOf(out, outN))
  }
}
