package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Exact COUNT(DISTINCT <integer key>) as a MERGEABLE BITMAP aggregate
  * (Roaring64, the compressed-bitmap library Spark itself ships):
  * every partition folds its keys into one bitmap per group, partials
  * combine map-side, and the exchange carries one serialized bitmap
  * per (partition, group) instead of one row per distinct key.
  *
  * Why it exists (r13, the q11 100× floor): the generic exact paths
  * both have a per-distinct-key cost at the exchange — the built-in
  * COUNT(DISTINCT) expands every input row, and the two-phase
  * pre-aggregate form shuffles one row per (group, key). With LOW
  * group cardinality and an INTEGER key domain (the TPC-H q11 shape:
  * 6 flag/status groups over suppkeys), the bitmap collapses the
  * shuffle to |groups|·|partitions| buffers whose size depends on key
  * CLUSTERING, not count — Roaring run-length containers make dense
  * id ranges (the common surrogate-key layout) a few bytes per
  * thousand keys. At 100 TB this is the difference between an
  * 8 M-row exchange and a ~200-buffer exchange.
  *
  * Exactness: a bitmap holds key PRESENCE — cardinality is exact, and
  * merge (OR) is associative/commutative/idempotent, so partial
  * aggregation, AQE re-planning, and speculative re-execution cannot
  * change the result (unlike sketches; this is not an approximation).
  * NULL keys are skipped, matching COUNT(DISTINCT) semantics.
  */
case class BitmapDistinctCount(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap] {

  override def createAggregationBuffer(): Roaring64NavigableMap =
    new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap,
      input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => throw new IllegalArgumentException(
        s"bitmap_distinct needs an integral key, got $other")
    })
    buffer
  }

  override def merge(buffer: Roaring64NavigableMap,
      input: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(input)
    buffer
  }

  override def eval(buffer: Roaring64NavigableMap): Any =
    buffer.getLongCardinality

  override def serialize(buffer: Roaring64NavigableMap): Array[Byte] = {
    buffer.runOptimize()
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    buffer.serialize(dos)
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = {
    val m = new Roaring64NavigableMap()
    m.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    m
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  // integral key required (checked at analysis, not per row)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_distinct needs an integral key, got $other")
    }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BitmapDistinctCount =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): BitmapDistinctCount =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinct {
  /** `bitmap_distinct(key)` as an aggregate Column. */
  def apply(key: Column): Column =
    GraftPlanBridge.column(
      BitmapDistinctCount(GraftPlanBridge.expression(key))
        .toAggregateExpression())

  /** The serialized-bitmap twin: same buffer discipline as
    * [[BitmapDistinctCount]], but eval returns the run-optimized bitmap
    * BYTES instead of its cardinality — the build half of
    * [[graft.operators.Relational.bitmapAntiJoin]]. One global-group
    * aggregate over N partitions exchanges N bitmap buffers (hundreds
    * of KB for millions of clustered surrogate keys) where an exact
    * DISTINCT would exchange one row per key.
    *
    * `maxBytes` caps the build IN the aggregate (r15): the overflow
    * check runs inside update/merge/serialize, so a pathological
    * sparse key domain trips the cap on the EXECUTOR and the
    * aggregate evaluates to NULL — the driver never materializes a
    * bitmap past the cap (plus one check stride of slack), and the
    * caller falls back to the shuffle join on the NULL signal.
    */
  def build(key: Column, maxBytes: Long = Long.MaxValue): Column =
    GraftPlanBridge.column(
      BitmapBuild(GraftPlanBridge.expression(key), maxBytes)
        .toAggregateExpression())

  /** [[contains]] with the bitmap in a BROADCAST VARIABLE instead of a
    * plan Literal: the task binary stays small (the bytes ship once
    * per executor over the broadcast channel, not inside every stage's
    * serialized plan) and the deserialized bitmap is shared per
    * executor via the lazy val.
    */
  def containsBroadcast(key: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]]): Column =
    GraftPlanBridge.column(
      BitmapContainsBc(GraftPlanBridge.expression(key), bc))

  /** `bitmap_contains(key, bitmapBytes)` as a Column predicate.
    * NULL keys yield FALSE (not NULL): an equality semi/anti probe can
    * never match on NULL, so `contains(null) = false` makes both
    * `filter(contains)` (semi) and `filter(!contains)` (anti) agree
    * with EXISTS / NOT EXISTS semantics without a separate null branch.
    */
  def contains(key: Column, bitmapBytes: Array[Byte]): Column =
    GraftPlanBridge.column(
      BitmapContains(GraftPlanBridge.expression(key),
        org.apache.spark.sql.catalyst.expressions.Literal(bitmapBytes)))
}

/** Buffer for [[BitmapBuild]]: the bitmap plus a STICKY overflow flag.
  * Once any partial trips the cap the flag survives serialize /
  * deserialize / merge, the bitmap is dropped (freeing the memory
  * immediately), and the final eval reports NULL. `sinceCheck` strides
  * the size probe — `serializedSizeInBytes` walks the container index,
  * so probing every row would be O(containers) per update.
  */
final class CappedBitmap(var bm: Roaring64NavigableMap,
    var over: Boolean, var sinceCheck: Int)

/** See [[BitmapDistinct.build]]. */
case class BitmapBuild(child: Expression, maxBytes: Long = Long.MaxValue,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedBitmap] {

  private val CheckStride = 1 << 16

  override def createAggregationBuffer(): CappedBitmap =
    new CappedBitmap(new Roaring64NavigableMap(), over = false, 0)

  private def overflow(buffer: CappedBitmap): Unit = {
    buffer.over = true
    buffer.bm = new Roaring64NavigableMap() // drop the oversize build
    buffer.sinceCheck = 0
  }

  private def checkCap(buffer: CappedBitmap): Unit =
    if (!buffer.over && buffer.bm.serializedSizeInBytes() > maxBytes)
      overflow(buffer)

  override def update(buffer: CappedBitmap,
      input: InternalRow): CappedBitmap = {
    if (buffer.over) return buffer
    val v = child.eval(input)
    if (v != null) {
      buffer.bm.addLong(v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case other => throw new IllegalArgumentException(
          s"bitmap_build needs an integral key, got $other")
      })
      buffer.sinceCheck += 1
      if (buffer.sinceCheck >= CheckStride) {
        buffer.sinceCheck = 0
        checkCap(buffer)
      }
    }
    buffer
  }

  override def merge(buffer: CappedBitmap,
      input: CappedBitmap): CappedBitmap = {
    if (input.over) overflow(buffer)
    else if (!buffer.over) {
      buffer.bm.or(input.bm)
      checkCap(buffer)
    }
    buffer
  }

  override def eval(buffer: CappedBitmap): Any = {
    checkCap(buffer)
    if (buffer.over) null else bitmapBytes(buffer.bm)
  }

  private def bitmapBytes(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    bm.serialize(dos)
    dos.flush()
    bos.toByteArray
  }

  // storage format: flag byte (1 = over-cap, bitmap omitted) + bytes
  override def serialize(buffer: CappedBitmap): Array[Byte] = {
    checkCap(buffer)
    if (buffer.over) Array[Byte](1)
    else {
      val bytes = bitmapBytes(buffer.bm)
      val out = new Array[Byte](bytes.length + 1)
      out(0) = 0
      System.arraycopy(bytes, 0, out, 1, bytes.length)
      out
    }
  }

  override def deserialize(bytes: Array[Byte]): CappedBitmap =
    if (bytes.length >= 1 && bytes(0) == 1)
      new CappedBitmap(new Roaring64NavigableMap(), over = true, 0)
    else {
      val m = new Roaring64NavigableMap()
      m.deserialize(new DataInputStream(
        new ByteArrayInputStream(bytes, 1, bytes.length - 1)))
      new CappedBitmap(m, over = false, 0)
    }

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_build needs an integral key, got $other")
    }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bitmap_build"
}

/** See [[BitmapDistinct.contains]]. The bitmap rides the plan as a
  * binary Literal (hundreds of KB — task-shipped once per stage, the
  * same transport class as a broadcast variable at this size) and is
  * deserialized once per task via the lazy val, not per row.
  */
case class BitmapContains(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val bitmap: Roaring64NavigableMap = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    val m = new Roaring64NavigableMap()
    m.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    m
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) false
    else bitmap.contains(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => throw new IllegalArgumentException(
        s"bitmap_contains needs an integral key, got $other")
    })
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_contains needs (integral key, binary bitmap), got $other")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bitmap_contains"
}

/** See [[BitmapDistinct.containsBroadcast]]. The bitmap bytes ride a
  * Spark broadcast variable (torrent-distributed once per executor)
  * instead of a plan Literal, and deserialize once per task via the
  * lazy val. NULL keys yield FALSE — same EXISTS/NOT EXISTS equality
  * semantics as [[BitmapContains]].
  */
case class BitmapContainsBc(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  @transient private lazy val bitmap: Roaring64NavigableMap = {
    val m = new Roaring64NavigableMap()
    m.deserialize(new DataInputStream(new ByteArrayInputStream(bc.value)))
    m
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else bitmap.contains(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => throw new IllegalArgumentException(
        s"bitmap_contains_bc needs an integral key, got $other")
    })
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_contains_bc needs an integral key, got $other")
    }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "bitmap_contains_bc"
}
