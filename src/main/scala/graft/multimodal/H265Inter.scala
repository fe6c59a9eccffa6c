package graft.multimodal

/** HEVC inter-prediction machinery for the r12 tier 3 (P slices,
  * single reference): the §8.5.4.2.2 fractional-sample interpolation
  * (8-tap DCT-IF luma at quarter-pel, 4-tap chroma at eighth-pel,
  * Tables 8-12/8-13), uni-directional motion compensation with edge
  * clamping, and the §8.5.3.2 motion-vector derivations — spatial
  * merge candidates (A1 B1 B0 A0 B2 with the normative pruning +
  * zero-MV fill) and the 2-candidate AMVP list. One derivation shared
  * by decoder and encoder-twin (the r10 lesson: availability/state
  * rules derived once cannot drift).
  *
  * Tier posture: list 0 only, refIdx 0 only (one active reference),
  * no temporal MVP (SPS disables it), no weighted prediction, 2Nx2N
  * PUs (part_mode reject elsewhere). Filters are spec transcriptions;
  * H265InterSpec pins constant-plane invariance, the exact half-pel
  * first moment, and per-tap impulse responses independently.
  */
private[multimodal] object H265Inter {

  /** Table 8-12: luma fractional-sample filters, taps at offsets
    * −3..+4 around the integer sample (row = xFrac/yFrac 0..3; the
    * frac-0 row is the identity and is bypassed in MC).
    */
  val lumaFilters: Array[Array[Int]] = Array(
    Array(0, 0, 0, 64, 0, 0, 0, 0),
    Array(-1, 4, -10, 58, 17, -5, 1, 0),
    Array(-1, 4, -11, 40, 40, -11, 4, -1),
    Array(0, 1, -5, 17, 58, -10, 4, -1))

  /** Table 8-13: chroma fractional-sample filters, taps at offsets
    * −1..+2 (row = frac 0..7 in eighth-pel units).
    */
  val chromaFilters: Array[Array[Int]] = Array(
    Array(0, 64, 0, 0),
    Array(-2, 58, 10, -2),
    Array(-4, 54, 16, -2),
    Array(-6, 46, 28, -4),
    Array(-4, 36, 36, -4),
    Array(-4, 28, 46, -6),
    Array(-2, 16, 54, -4),
    Array(-2, 10, 58, -2))

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** §8.5.4.2.2: uni-pred MC of an nW×nH block at (xPb, yPb) in the
    * destination plane from `ref` (refW×refH), mv in quarter-pel for
    * luma / eighth-pel steps for chroma — `fracBits` 2 (luma, 8-tap)
    * or 3 (chroma, 4-tap). Reference coordinates clamp to the picture
    * (§8.5.4.2.2's Clip3 on xInt/yInt). 8-bit path: shift1 = 0 (the
    * first filter pass keeps 14-bit headroom), shift2 = 6 between
    * passes, and the §8.5.4.2.3 uni-pred rounding (+32) >> 6 at the
    * end.
    */
  def mc(ref: Array[Byte], refW: Int, refH: Int,
      dst: Array[Byte], dstStride: Int, xPb: Int, yPb: Int,
      nW: Int, nH: Int, mvx: Int, mvy: Int, fracBits: Int): Unit = {
    val filters = if (fracBits == 2) lumaFilters else chromaFilters
    val nTaps = filters(0).length
    val center = nTaps / 2 - 1 // taps span −center .. nTaps−1−center
    val fracMask = (1 << fracBits) - 1
    val xInt = xPb + (mvx >> fracBits)
    val yInt = yPb + (mvy >> fracBits)
    val xF = mvx & fracMask
    val yF = mvy & fracMask
    @inline def refAt(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= refW) refW - 1 else x
      val cy = if (y < 0) 0 else if (y >= refH) refH - 1 else y
      ref(cy * refW + cx) & 0xff
    }
    if (xF == 0 && yF == 0) {
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          dst((yPb + y) * dstStride + xPb + x) = refAt(xInt + x, yInt + y).toByte
          x += 1
        }
        y += 1
      }
    } else if (yF == 0) {
      val f = filters(xF)
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          var s = 0
          var i = 0
          while (i < nTaps) {
            s += f(i) * refAt(xInt + x + i - center, yInt + y); i += 1
          }
          dst((yPb + y) * dstStride + xPb + x) = clip255((s + 32) >> 6).toByte
          x += 1
        }
        y += 1
      }
    } else if (xF == 0) {
      val f = filters(yF)
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          var s = 0
          var i = 0
          while (i < nTaps) {
            s += f(i) * refAt(xInt + x, yInt + y + i - center); i += 1
          }
          dst((yPb + y) * dstStride + xPb + x) = clip255((s + 32) >> 6).toByte
          x += 1
        }
        y += 1
      }
    } else {
      // two passes: horizontal into a 14-bit temp over nH + nTaps − 1
      // rows, then vertical with shift2 = 6
      val fh = filters(xF)
      val fv = filters(yF)
      val tmpH = nH + nTaps - 1
      val tmp = new Array[Int](nW * tmpH)
      var ty = 0
      while (ty < tmpH) {
        var x = 0
        while (x < nW) {
          var s = 0
          var i = 0
          while (i < nTaps) {
            s += fh(i) * refAt(xInt + x + i - center, yInt + ty - center)
            i += 1
          }
          tmp(ty * nW + x) = s
          x += 1
        }
        ty += 1
      }
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          var s = 0
          var i = 0
          while (i < nTaps) { s += fv(i) * tmp((y + i) * nW + x); i += 1 }
          dst((yPb + y) * dstStride + xPb + x) =
            clip255(((s >> 6) + 32) >> 6).toByte
          x += 1
        }
        y += 1
      }
    }
  }

  /** MC of a whole CU (luma + 4:2:0 chroma) from the reference
    * picture's planes into the current picture's, `mv` in quarter-pel
    * luma units (chroma reuses the same value at eighth-pel per
    * §8.5.3.2.9's 4:2:0 mvCLX = mvLX).
    */
  def mcCu(refPic: H265Decode.Pic, cur: H265Decode.Pic,
      x0: Int, y0: Int, nCb: Int, mvx: Int, mvy: Int): Unit = {
    mc(refPic.luma, refPic.width, refPic.height, cur.luma, cur.lumaStride,
      x0, y0, nCb, nCb, mvx, mvy, fracBits = 2)
    val cw = refPic.width >> 1; val ch = refPic.height >> 1
    mc(refPic.cb, cw, ch, cur.cb, cur.chromaStride,
      x0 >> 1, y0 >> 1, nCb >> 1, nCb >> 1, mvx, mvy, fracBits = 3)
    mc(refPic.cr, cw, ch, cur.cr, cur.chromaStride,
      x0 >> 1, y0 >> 1, nCb >> 1, nCb >> 1, mvx, mvy, fracBits = 3)
  }

  /** §8.5.3.2.3: the spatial merging candidates A1 B1 B0 A0 (B2 only
    * when fewer than 4 so far) with the normative pairwise pruning,
    * zero-MV-filled to `maxCand` (single-ref P: no temporal — the SPS
    * disables TMVP — and no combined bi-pred; every zero candidate is
    * (0,0) at refIdx 0). Candidate availability = decoded-inter
    * neighbor (z-scan availability via the Pic's recon grid).
    */
  def mergeCandidates(pic: H265Decode.Pic, xPb: Int, yPb: Int,
      nPbW: Int, nPbH: Int, maxCand: Int): IndexedSeq[(Int, Int)] = {
    @inline def m(x: Int, y: Int): Option[(Int, Int)] =
      if (pic.interAt(x, y)) Some(pic.mvAt(x, y)) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val a1 = m(xPb - 1, yPb + nPbH - 1)
    a1.foreach(out += _)
    val b1 = m(xPb + nPbW - 1, yPb - 1)
    b1.foreach { c => if (!a1.contains(c)) out += c }
    val b0 = m(xPb + nPbW, yPb - 1)
    b0.foreach { c => if (!b1.contains(c)) out += c }
    val a0 = m(xPb - 1, yPb + nPbH)
    a0.foreach { c => if (!a1.contains(c)) out += c }
    if (out.size < 4) {
      val b2 = m(xPb - 1, yPb - 1)
      b2.foreach { c => if (!a1.contains(c) && !b1.contains(c)) out += c }
    }
    while (out.size < maxCand) out += ((0, 0))
    out.take(maxCand).toIndexedSeq
  }

  /** §8.5.3.2.6: the 2-entry AMVP candidate list — first decoded-inter
    * neighbor of {A0, A1}, first of {B0, B1, B2}, B dropped when equal
    * to A, zero-MV filled. Single reference ⇒ the same-ref passes
    * always hit and no scaling applies (identity POC distance).
    */
  def amvpCandidates(pic: H265Decode.Pic, xPb: Int, yPb: Int,
      nPbW: Int, nPbH: Int): IndexedSeq[(Int, Int)] = {
    @inline def first(pos: Seq[(Int, Int)]): Option[(Int, Int)] =
      pos.collectFirst {
        case (x, y) if pic.interAt(x, y) => pic.mvAt(x, y)
      }
    val a = first(Seq((xPb - 1, yPb + nPbH), (xPb - 1, yPb + nPbH - 1)))
    val b = first(Seq((xPb + nPbW, yPb - 1), (xPb + nPbW - 1, yPb - 1),
      (xPb - 1, yPb - 1)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    a.foreach(out += _)
    b.foreach { c => if (!a.contains(c)) out += c }
    while (out.size < 2) out += ((0, 0))
    out.take(2).toIndexedSeq
  }
}
