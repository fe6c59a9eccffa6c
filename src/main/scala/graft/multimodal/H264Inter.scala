package graft.multimodal

/** Inter-prediction primitives for P-slice decoding (and the matching
  * encoder): the §8.4.1.3 motion-vector prediction over a per-4x4-block
  * grid, the §8.4.2.2 quarter-pel luma / eighth-pel chroma sample
  * interpolation, and the Table 9-4 inter coded_block_pattern mapping.
  *
  * Shared by [[H264Decode]] (P slices) and [[H264Encode]] (P-frame
  * fixtures): ONE mvp implementation on both sides, so encoder mvd =
  * mv − mvp and decoder mv = mvp + mvd cannot drift apart. Provenance
  * note: like [[H264Cavlc]], this is a spec transcription validated by
  * round-trips and in-test reimplementations (no reference decoder in
  * this container); the same external-interop caveat applies.
  */
private[multimodal] object H264Inter {

  /** Table 9-4, inter column: codeNum → coded_block_pattern. Same
    * transcription-fidelity caveat as the CAVLC tables (H264Cavlc.scala
    * honesty note); prefix/structure checks + encoder round-trips pin
    * self-consistency.
    */
  val cbpInterByCodeNum: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)

  lazy val cbpInterToCodeNum: Map[Int, Int] =
    cbpInterByCodeNum.zipWithIndex.toMap

  /** Per-4x4-block L0 motion state of one picture. Quarter-pel units;
    * refIdx −1 marks intra / not-yet-decoded blocks (the §8.4.1.3
    * "not available for reference matching" value — only blocks whose
    * MACROBLOCK is marked decoded count as available at all).
    */
  final class MvGrid(val mbW: Int, val mbH: Int) {
    val w4: Int = mbW * 4
    val h4: Int = mbH * 4
    val mvX = new Array[Int](w4 * h4)
    val mvY = new Array[Int](w4 * h4)
    val refIdx: Array[Int] = Array.fill(w4 * h4)(-1)
    private val mbAvail = new Array[Boolean](mbW * mbH)
    // multi-slice pictures (r12): during decode, §6.4 availability
    // additionally requires the neighbor's MB to be in the CURRENT
    // slice. Once the picture completes, [[seal]] lifts the slice gate
    // — the retained grid (the co-located inputs, the deblocking bS
    // comparisons) is whole-picture state.
    private val mbSliceId = new Array[Int](mbW * mbH)
    var curSlice: Int = 0
    private var pictureSealed = false
    def seal(): Unit = pictureSealed = true
    // r10 (the B_8x8 tier): DECODED state per 4x4 block, not per MB.
    // §8.4.1.3.2/§6.4.11.7 mark a neighbor "not available" when its
    // block is not yet decoded — which inside a sub-partitioned MB can
    // be a LATER block of the same MB (e.g. the above-right C of a
    // bottom 8x4 sub-partition), triggering the C→D substitution. A
    // block that IS decoded but never references the list (intra MB,
    // other-list-only partition, unused direct list) must instead read
    // available-with-refIdx−1 — decoders mark those via [[markDone]];
    // [[set]] marks the blocks it writes. For every pre-r10 partition
    // geometry the two models coincide (no decode path could read a
    // marked-MB undecoded block), so committed streams are unaffected.
    private val blockDone = new Array[Boolean](w4 * h4)

    def markMb(mbAddr: Int): Unit = {
      mbAvail(mbAddr) = true
      mbSliceId(mbAddr) = curSlice
    }

    /** Mark blocks DECODED without giving them list motion (refIdx
      * stays −1): intra MBs, partitions that only use the other list,
      * unused spatial-direct lists.
      */
    def markDone(bx4: Int, by4: Int, pw4: Int, ph4: Int): Unit = {
      var y = by4
      while (y < by4 + ph4) {
        var x = bx4
        while (x < bx4 + pw4) { blockDone(y * w4 + x) = true; x += 1 }
        y += 1
      }
    }

    def blockAvail(x4: Int, y4: Int): Boolean =
      x4 >= 0 && y4 >= 0 && x4 < w4 && y4 < h4 &&
        mbAvail((y4 / 4) * mbW + x4 / 4) && blockDone(y4 * w4 + x4) &&
        (pictureSealed || mbSliceId((y4 / 4) * mbW + x4 / 4) == curSlice)

    /** Neighbor refIdx in this list, −1 when unavailable / intra — the
      * §9.3.3.1.1.6 ref_idx ctxIdxInc input (condTermFlagN = refIdx > 0)
      * and the §8.4.1.2.2 MinPositive input.
      */
    def refAt(x4: Int, y4: Int): Int =
      if (!blockAvail(x4, y4)) -1 else refIdx(y4 * w4 + x4)

    def set(bx4: Int, by4: Int, pw4: Int, ph4: Int,
        mx: Int, my: Int, ref: Int): Unit = {
      var y = by4
      while (y < by4 + ph4) {
        var x = bx4
        while (x < bx4 + pw4) {
          mvX(y * w4 + x) = mx; mvY(y * w4 + x) = my; refIdx(y * w4 + x) = ref
          blockDone(y * w4 + x) = true
          x += 1
        }
        y += 1
      }
    }

    @inline private def mvOf(x4: Int, y4: Int): (Int, Int, Int, Boolean) = {
      val av = blockAvail(x4, y4)
      if (!av) (0, 0, -1, false)
      else (mvX(y4 * w4 + x4), mvY(y4 * w4 + x4), refIdx(y4 * w4 + x4), true)
    }

    /** §8.4.1.3 median motion-vector prediction for a partition at
      * (bx4, by4) of size (pw4, ph4) in 4x4-block units; `kind`:
      * 0 = 16x16 / P_Skip / general, 1 = 16x8 top, 2 = 16x8 bottom,
      * 3 = 8x16 left, 4 = 8x16 right. `ref` = the partition's refIdxLX
      * in this grid's list (r11 multi-reference tier): the directional
      * shortcuts and the one-matching-neighbor rule fire only on
      * neighbors whose refIdx EQUALS the partition's (§8.4.1.3.2's
      * refIdxLXN == refIdxLX condition) — with a single active
      * reference every match is against 0, the pre-r11 behavior.
      */
    def mvPred(bx4: Int, by4: Int, pw4: Int, ph4: Int, kind: Int,
        ref: Int = 0): (Int, Int) = {
      val a = mvOf(bx4 - 1, by4)
      val b = mvOf(bx4, by4 - 1)
      val c0 = mvOf(bx4 + pw4, by4 - 1)
      val c = if (c0._4) c0 else mvOf(bx4 - 1, by4 - 1) // D substitutes C
      // directional shortcuts (§8.4.1.3.2) fire only on a ref match
      kind match {
        case 1 => if (b._3 == ref) return (b._1, b._2)
        case 2 => if (a._3 == ref) return (a._1, a._2)
        case 3 => if (a._3 == ref) return (a._1, a._2)
        case 4 => if (c._3 == ref) return (c._1, c._2)
        case _ =>
      }
      // rule 1: B and C unavailable, A available → mvA
      if (!b._4 && !c._4 && a._4) return (a._1, a._2)
      // rule 2: exactly one neighbor references this list/index
      val matches = Seq(a, b, c).filter(_._3 == ref)
      if (matches.size == 1) return (matches.head._1, matches.head._2)
      // rule 3: component-wise median (unavailable / intra → (0,0))
      def med(x: Int, y: Int, z: Int): Int =
        math.max(math.min(x, y), math.min(math.max(x, y), z))
      (med(a._1, b._1, c._1), med(a._2, b._2, c._2))
    }

    /** §8.4.1.2.2 spatial-direct reference index for the MB whose
      * top-left 4x4 block is (bx4, by4): MinPositive over the A/B/C
      * neighbors' refIdx in THIS list (D substitutes an unavailable C,
      * as in [[mvPred]]); −1 when no neighbor references the list.
      * With one active reference per list this is 0 or −1.
      */
    def directRef(bx4: Int, by4: Int): Int = {
      @inline def refOf(x4: Int, y4: Int): Int =
        if (!blockAvail(x4, y4)) -1 else refIdx(y4 * w4 + x4)
      val a = refOf(bx4 - 1, by4)
      val b = refOf(bx4, by4 - 1)
      val c =
        if (blockAvail(bx4 + 4, by4 - 1)) refIdx((by4 - 1) * w4 + bx4 + 4)
        else refOf(bx4 - 1, by4 - 1)
      val cands = Seq(a, b, c).filter(_ >= 0)
      if (cands.isEmpty) -1 else cands.min
    }

    /** §8.4.1.2.2 colZeroFlag against THIS grid as the co-located
      * picture's motion: the co-located 4x4 block is inter (refIdx 0)
      * with both mv components in [−1, 1] quarter-pel. Intra /
      * never-decoded blocks (refIdx −1) and unavailable MBs are false.
      */
    def colZero(x4: Int, y4: Int): Boolean =
      blockAvail(x4, y4) && refIdx(y4 * w4 + x4) == 0 && {
        val mx = mvX(y4 * w4 + x4); val my = mvY(y4 * w4 + x4)
        mx >= -1 && mx <= 1 && my >= -1 && my <= 1
      }

    /** §8.4.1.1 P_Skip motion vector for the MB whose top-left luma 4x4
      * block is (bx4, by4).
      */
    def skipMv(bx4: Int, by4: Int): (Int, Int) = {
      val a = mvOf(bx4 - 1, by4)
      val b = mvOf(bx4, by4 - 1)
      if (!a._4 || !b._4 ||
          (a._3 == 0 && a._1 == 0 && a._2 == 0) ||
          (b._3 == 0 && b._1 == 0 && b._2 == 0)) (0, 0)
      else mvPred(bx4, by4, 4, 4, 0)
    }
  }

  @inline private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Quarter-pel luma motion compensation (§8.4.2.2.1): predicts a
    * `bw`×`bh` block at picture position (px, py) displaced by
    * (mvx, mvy) quarter-pel, writing into `dst` (stride `dstStride`) at
    * (px, py). Out-of-picture full-pel fetches clamp to the edge
    * (§8.4.2.2's coordinate clip). Half-pel positions use the 6-tap
    * (1,−5,20,20,−5,1) filter; the center position j applies it to
    * UNROUNDED horizontal intermediates; quarter positions average the
    * two nearest integer/half samples.
    */
  def mcLuma(ref: Array[Byte], refStride: Int, refH: Int,
      dst: Array[Byte], dstStride: Int,
      px: Int, py: Int, bw: Int, bh: Int, mvx: Int, mvy: Int): Unit = {
    val bx = px + (mvx >> 2); val by = py + (mvy >> 2)
    val dx = mvx & 3; val dy = mvy & 3
    val maxX = refStride - 1; val maxY = refH - 1
    @inline def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x > maxX) maxX else x
      val cy = if (y < 0) 0 else if (y > maxY) maxY else y
      ref(cy * refStride + cx) & 0xff
    }
    // unrounded 6-tap intermediates
    @inline def tapH(x: Int, y: Int): Int =
      at(x - 2, y) - 5 * at(x - 1, y) + 20 * at(x, y) +
        20 * at(x + 1, y) - 5 * at(x + 2, y) + at(x + 3, y)
    @inline def tapV(x: Int, y: Int): Int =
      at(x, y - 2) - 5 * at(x, y - 1) + 20 * at(x, y) +
        20 * at(x, y + 1) - 5 * at(x, y + 2) + at(x, y + 3)
    @inline def halfB(x: Int, y: Int): Int = clip255((tapH(x, y) + 16) >> 5)
    @inline def halfH(x: Int, y: Int): Int = clip255((tapV(x, y) + 16) >> 5)
    @inline def halfJ(x: Int, y: Int): Int = {
      val j1 = tapH(x, y - 2) - 5 * tapH(x, y - 1) + 20 * tapH(x, y) +
        20 * tapH(x, y + 1) - 5 * tapH(x, y + 2) + tapH(x, y + 3)
      clip255((j1 + 512) >> 10)
    }
    var yy = 0
    while (yy < bh) {
      val sy = by + yy
      var xx = 0
      while (xx < bw) {
        val sx = bx + xx
        val v = (dx, dy) match {
          case (0, 0) => at(sx, sy)
          case (1, 0) => (at(sx, sy) + halfB(sx, sy) + 1) >> 1
          case (2, 0) => halfB(sx, sy)
          case (3, 0) => (halfB(sx, sy) + at(sx + 1, sy) + 1) >> 1
          case (0, 1) => (at(sx, sy) + halfH(sx, sy) + 1) >> 1
          case (0, 2) => halfH(sx, sy)
          case (0, 3) => (halfH(sx, sy) + at(sx, sy + 1) + 1) >> 1
          case (1, 1) => (halfB(sx, sy) + halfH(sx, sy) + 1) >> 1
          case (3, 1) => (halfB(sx, sy) + halfH(sx + 1, sy) + 1) >> 1
          case (1, 3) => (halfH(sx, sy) + halfB(sx, sy + 1) + 1) >> 1
          case (3, 3) => (halfH(sx + 1, sy) + halfB(sx, sy + 1) + 1) >> 1
          case (2, 1) => (halfB(sx, sy) + halfJ(sx, sy) + 1) >> 1
          case (2, 3) => (halfJ(sx, sy) + halfB(sx, sy + 1) + 1) >> 1
          case (1, 2) => (halfH(sx, sy) + halfJ(sx, sy) + 1) >> 1
          case (3, 2) => (halfJ(sx, sy) + halfH(sx + 1, sy) + 1) >> 1
          case _      => halfJ(sx, sy) // (2, 2)
        }
        dst((py + yy) * dstStride + px + xx) = v.toByte
        xx += 1
      }
      yy += 1
    }
  }

  /** Eighth-pel bilinear chroma motion compensation (§8.4.2.2.2): the
    * luma quarter-pel vector maps 1:1 to chroma eighth-pel at 4:2:0.
    * Block position (px, py) and size are in CHROMA samples.
    */
  def mcChroma(ref: Array[Byte], refStride: Int, refH: Int,
      dst: Array[Byte], dstStride: Int,
      px: Int, py: Int, bw: Int, bh: Int, mvx: Int, mvy: Int): Unit = {
    val bx = px + (mvx >> 3); val by = py + (mvy >> 3)
    val fx = mvx & 7; val fy = mvy & 7
    val maxX = refStride - 1; val maxY = refH - 1
    @inline def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x > maxX) maxX else x
      val cy = if (y < 0) 0 else if (y > maxY) maxY else y
      ref(cy * refStride + cx) & 0xff
    }
    var yy = 0
    while (yy < bh) {
      var xx = 0
      while (xx < bw) {
        val a = at(bx + xx, by + yy); val b = at(bx + xx + 1, by + yy)
        val c = at(bx + xx, by + yy + 1); val d = at(bx + xx + 1, by + yy + 1)
        val v = ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b +
          (8 - fx) * fy * c + fx * fy * d + 32) >> 6
        dst((py + yy) * dstStride + px + xx) = v.toByte
        xx += 1
      }
      yy += 1
    }
  }
}
