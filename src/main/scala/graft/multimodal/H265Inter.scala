package graft.multimodal

/** HEVC inter-prediction machinery for the r12 tier 3 (P slices) and
  * the r13 tier 4 (B slices, two reference lists): the §8.5.4.2.2
  * fractional-sample interpolation (8-tap DCT-IF luma at quarter-pel,
  * 4-tap chroma at eighth-pel, Tables 8-12/8-13), uni- and
  * bi-directional motion compensation (bi combines the two 14-bit
  * intermediate predictions per §8.5.4.2.3's default weighted sample
  * prediction — NOT an average of rounded 8-bit outputs), and the
  * §8.5.3.2 motion-vector derivations — spatial merge candidates
  * (A1 B1 B0 A0 B2 with the normative pruning), the §8.5.3.2.4
  * combined bi-predictive candidates, zero fill, and the 2-candidate
  * per-list AMVP with the §8.5.3.2.7 cross-list / scaled passes. One
  * derivation shared by decoder and encoder-twin (the r10 lesson:
  * availability/state rules derived once cannot drift).
  *
  * Tier posture: refIdx 0 only (one active reference per list), no
  * temporal MVP (SPS disables it), no weighted prediction, 2Nx2N PUs
  * (part_mode reject elsewhere). Filters are spec transcriptions;
  * H265InterSpec / H265BSliceSpec pin constant-plane invariance, the
  * exact half-pel first moment, per-tap impulse responses, the bi
  * rounding, and the candidate derivations independently.
  */
private[multimodal] object H265Inter {

  /** Motion information of a PU / 4x4 grid cell: `dir` is the inter
    * prediction direction bitmask (1 = L0, 2 = L1, 3 = bi), MVs in
    * quarter-pel per list (unused list's MV is (0, 0)), and — since
    * the r13 multi-reference rung — the per-list reference indices
    * (`ref1` stays 0 in the tier: L1 carries one active reference).
    */
  final case class Mi(dir: Int, mv0x: Int, mv0y: Int,
      mv1x: Int, mv1y: Int, ref0: Int = 0, ref1: Int = 0) {
    def has(list: Int): Boolean = (dir & (1 << list)) != 0
    def mv(list: Int): (Int, Int) =
      if (list == 0) (mv0x, mv0y) else (mv1x, mv1y)
    def ref(list: Int): Int = if (list == 0) ref0 else ref1
  }

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

  /** §8.5.4.2.2 at 14-bit intermediate precision: the nW×nH predicted
    * block WITHOUT the final §8.5.4.2.3 rounding — full-pel samples
    * left-shifted by shift3 = 6, single-pass filter sums kept raw
    * (shift1 = 0 at 8-bit), two-pass vertical sums >> shift2 = 6.
    * This is the form the bi-predictive combine must consume: HEVC
    * averages the 14-bit intermediates ((a + b + 64) >> 7), which is
    * NOT the average of the two rounded 8-bit uni predictions.
    */
  def mcPred(ref: Array[Byte], refW: Int, refH: Int,
      xPb: Int, yPb: Int, nW: Int, nH: Int,
      mvx: Int, mvy: Int, fracBits: Int): Array[Int] = {
    val filters = if (fracBits == 2) lumaFilters else chromaFilters
    val nTaps = filters(0).length
    val center = nTaps / 2 - 1
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
    val out = new Array[Int](nW * nH)
    if (xF == 0 && yF == 0) {
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          out(y * nW + x) = refAt(xInt + x, yInt + y) << 6; x += 1
        }
        y += 1
      }
    } else if (yF == 0) {
      val f = filters(xF)
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          var s = 0; var i = 0
          while (i < nTaps) {
            s += f(i) * refAt(xInt + x + i - center, yInt + y); i += 1
          }
          out(y * nW + x) = s; x += 1
        }
        y += 1
      }
    } else if (xF == 0) {
      val f = filters(yF)
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          var s = 0; var i = 0
          while (i < nTaps) {
            s += f(i) * refAt(xInt + x, yInt + y + i - center); i += 1
          }
          out(y * nW + x) = s; x += 1
        }
        y += 1
      }
    } else {
      val fh = filters(xF)
      val fv = filters(yF)
      val tmpH = nH + nTaps - 1
      val tmp = new Array[Int](nW * tmpH)
      var ty = 0
      while (ty < tmpH) {
        var x = 0
        while (x < nW) {
          var s = 0; var i = 0
          while (i < nTaps) {
            s += fh(i) * refAt(xInt + x + i - center, yInt + ty - center)
            i += 1
          }
          tmp(ty * nW + x) = s; x += 1
        }
        ty += 1
      }
      var y = 0
      while (y < nH) {
        var x = 0
        while (x < nW) {
          var s = 0; var i = 0
          while (i < nTaps) { s += fv(i) * tmp((y + i) * nW + x); i += 1 }
          out(y * nW + x) = s >> 6; x += 1
        }
        y += 1
      }
    }
    out
  }

  /** §8.5.4.2.3 bi-predictive combine of two 14-bit intermediate
    * predictions: (a + b + offset2) >> shift2 with shift2 = 7,
    * offset2 = 64 at 8-bit, clipped to [0, 255].
    */
  private def biCombine(p0: Array[Int], p1: Array[Int],
      dst: Array[Byte], dstStride: Int, xPb: Int, yPb: Int,
      nW: Int, nH: Int): Unit = {
    var y = 0
    while (y < nH) {
      var x = 0
      while (x < nW) {
        dst((yPb + y) * dstStride + xPb + x) =
          clip255((p0(y * nW + x) + p1(y * nW + x) + 64) >> 7).toByte
        x += 1
      }
      y += 1
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

  /** Per-component explicit weight/offset (§7.4.7.3's derived
    * LumaWeight/LumaOffset form — flag-absent entries carry the
    * defaults w = 1 << denom, o = 0, under which the weighted
    * formulas reproduce the default prediction exactly).
    */
  final case class Wp(w: Int, o: Int)

  /** A slice's explicit weighted-prediction state (r13): shared luma /
    * chroma log2 denominators plus per-list per-component (w, o) at
    * refIdx 0.
    */
  final case class PredWeights(lumaDenom: Int, chromaDenom: Int,
      l0y: Wp, l0cb: Wp, l0cr: Wp, l1y: Wp, l1cb: Wp, l1cr: Wp) {
    def y(list: Int): Wp = if (list == 0) l0y else l1y
    def cb(list: Int): Wp = if (list == 0) l0cb else l1cb
    def cr(list: Int): Wp = if (list == 0) l0cr else l1cr
  }

  object PredWeights {
    /** Flag-absent defaults for both lists at the given denominators. */
    def default(lumaDenom: Int, chromaDenom: Int): PredWeights = {
      val y = Wp(1 << lumaDenom, 0); val c = Wp(1 << chromaDenom, 0)
      PredWeights(lumaDenom, chromaDenom, y, c, c, y, c, c)
    }
  }

  /** §8.5.4.2.3 explicit weighted UNI prediction over a 14-bit
    * intermediate block: Clip(((pred·w + 2^(log2WD−1)) >> log2WD) + o)
    * with log2WD = denom + shift1 (= 6 at 8-bit, so log2WD ≥ 6 ≥ 1
    * and the rounding term is always live).
    */
  private def wpUni(p: Array[Int], wp: Wp, denom: Int,
      dst: Array[Byte], dstStride: Int, xPb: Int, yPb: Int,
      nW: Int, nH: Int): Unit = {
    val log2Wd = denom + 6
    val rnd = 1 << (log2Wd - 1)
    var y = 0
    while (y < nH) {
      var x = 0
      while (x < nW) {
        dst((yPb + y) * dstStride + xPb + x) = clip255(
          ((p(y * nW + x) * wp.w + rnd) >> log2Wd) + wp.o).toByte
        x += 1
      }
      y += 1
    }
  }

  /** §8.5.4.2.3 explicit weighted BI prediction:
    * Clip((p0·w0 + p1·w1 + (o0 + o1 + 1) << log2WD) >> (log2WD + 1)).
    */
  private def wpBi(p0: Array[Int], p1: Array[Int], wp0: Wp, wp1: Wp,
      denom: Int, dst: Array[Byte], dstStride: Int, xPb: Int, yPb: Int,
      nW: Int, nH: Int): Unit = {
    val log2Wd = denom + 6
    val rnd = (wp0.o + wp1.o + 1) << log2Wd
    var y = 0
    while (y < nH) {
      var x = 0
      while (x < nW) {
        dst((yPb + y) * dstStride + xPb + x) = clip255(
          (p0(y * nW + x) * wp0.w + p1(y * nW + x) * wp1.w + rnd) >>
            (log2Wd + 1)).toByte
        x += 1
      }
      y += 1
    }
  }

  /** Weighted-prediction MC of a whole CU: every prediction runs the
    * 14-bit intermediate path, then the §8.5.4.2.3 explicit weighted
    * uni/bi combine per component.
    */
  def mcCuWp(ref0: H265Decode.Pic, ref1: H265Decode.Pic,
      cur: H265Decode.Pic, x0: Int, y0: Int, nCb: Int, mi: Mi,
      pw: PredWeights): Unit = {
    val w = (if (mi.has(0)) ref0 else ref1).width
    val h = (if (mi.has(0)) ref0 else ref1).height
    val cw = w >> 1; val ch = h >> 1; val nC = nCb >> 1
    def pred(ref: H265Decode.Pic, list: Int): (Array[Int], Array[Int], Array[Int]) = {
      val (mx, my) = mi.mv(list)
      (mcPred(ref.luma, w, h, x0, y0, nCb, nCb, mx, my, 2),
        mcPred(ref.cb, cw, ch, x0 >> 1, y0 >> 1, nC, nC, mx, my, 3),
        mcPred(ref.cr, cw, ch, x0 >> 1, y0 >> 1, nC, nC, mx, my, 3))
    }
    mi.dir match {
      case 3 =>
        val (y0p, cb0, cr0) = pred(ref0, 0)
        val (y1p, cb1, cr1) = pred(ref1, 1)
        wpBi(y0p, y1p, pw.y(0), pw.y(1), pw.lumaDenom,
          cur.luma, cur.lumaStride, x0, y0, nCb, nCb)
        wpBi(cb0, cb1, pw.cb(0), pw.cb(1), pw.chromaDenom,
          cur.cb, cur.chromaStride, x0 >> 1, y0 >> 1, nC, nC)
        wpBi(cr0, cr1, pw.cr(0), pw.cr(1), pw.chromaDenom,
          cur.cr, cur.chromaStride, x0 >> 1, y0 >> 1, nC, nC)
      case d =>
        val list = if (d == 1) 0 else 1
        val (yp, cbp, crp) = pred(if (d == 1) ref0 else ref1, list)
        wpUni(yp, pw.y(list), pw.lumaDenom,
          cur.luma, cur.lumaStride, x0, y0, nCb, nCb)
        wpUni(cbp, pw.cb(list), pw.chromaDenom,
          cur.cb, cur.chromaStride, x0 >> 1, y0 >> 1, nC, nC)
        wpUni(crp, pw.cr(list), pw.chromaDenom,
          cur.cr, cur.chromaStride, x0 >> 1, y0 >> 1, nC, nC)
    }
  }

  /** Motion compensation of a whole CU by full motion info: uni (L0 or
    * L1) delegates to [[mcCu]]; bi runs both references through the
    * 14-bit intermediate path and combines per §8.5.4.2.3.
    */
  def mcCuMi(ref0: H265Decode.Pic, ref1: H265Decode.Pic,
      cur: H265Decode.Pic, x0: Int, y0: Int, nCb: Int, mi: Mi): Unit =
    mi.dir match {
      case 1 => mcCu(ref0, cur, x0, y0, nCb, mi.mv0x, mi.mv0y)
      case 2 => mcCu(ref1, cur, x0, y0, nCb, mi.mv1x, mi.mv1y)
      case 3 =>
        val w = ref0.width; val h = ref0.height
        biCombine(
          mcPred(ref0.luma, w, h, x0, y0, nCb, nCb, mi.mv0x, mi.mv0y, 2),
          mcPred(ref1.luma, w, h, x0, y0, nCb, nCb, mi.mv1x, mi.mv1y, 2),
          cur.luma, cur.lumaStride, x0, y0, nCb, nCb)
        val cw = w >> 1; val ch = h >> 1; val nC = nCb >> 1
        biCombine(
          mcPred(ref0.cb, cw, ch, x0 >> 1, y0 >> 1, nC, nC, mi.mv0x, mi.mv0y, 3),
          mcPred(ref1.cb, cw, ch, x0 >> 1, y0 >> 1, nC, nC, mi.mv1x, mi.mv1y, 3),
          cur.cb, cur.chromaStride, x0 >> 1, y0 >> 1, nC, nC)
        biCombine(
          mcPred(ref0.cr, cw, ch, x0 >> 1, y0 >> 1, nC, nC, mi.mv0x, mi.mv0y, 3),
          mcPred(ref1.cr, cw, ch, x0 >> 1, y0 >> 1, nC, nC, mi.mv1x, mi.mv1y, 3),
          cur.cr, cur.chromaStride, x0 >> 1, y0 >> 1, nC, nC)
      case other =>
        throw new IllegalArgumentException(s"bad inter dir $other")
    }

  /** Collocated-picture context for temporal MV prediction (r15,
    * §8.5.3.2.8): the collocated reference picture (whose per-4x4
    * motion grids survive decode — our uncompressed stand-in for the
    * spec's 16x16-compressed MV storage; fetch addresses are masked to
    * 16x16 corners, making the two representations agree), its POC and
    * decode-time per-list reference POCs (carried on the Pic —
    * [[H265Decode.Pic.tmvpRefPocs0]]), the current POC, the CTB size
    * (C0's same-CTB-row rule), `allRefsBefore` = no reference of the
    * CURRENT picture follows it in output order (§8.5.3.2.9's
    * NoBackwardPredFlag, list selection), and collocated_from_l0.
    */
  final case class ColCtx(colPic: H265Decode.Pic, colPoc: Int,
      currPoc: Int, ctbLog2: Int, allRefsBefore: Boolean,
      colFromL0: Boolean)

  /** §8.5.3.2.8/9 temporal luma MV candidate for `listX` targeting
    * `targetRefPoc`: probe C0 (bottom-right, outside the PU, same CTB
    * row, inside the picture) then C1 (center), both masked to the
    * 16x16 MV-storage grid; pick the collocated cell's list per
    * §8.5.3.2.9 (only-list → that list; both → requested list when
    * NoBackwardPredFlag, else the list collocated_from_l0 points AWAY
    * from), then POC-scale ([[scaleMv]]; identity when the distances
    * match). No long-term handling — LT references are SPS-disabled in
    * the tier.
    */
  def tmvpMv(col: ColCtx, xPb: Int, yPb: Int, nPbW: Int, nPbH: Int,
      listX: Int, targetRefPoc: Int): Option[(Int, Int)] = {
    val p = col.colPic
    def fromCell(x: Int, y: Int): Option[(Int, Int)] = {
      val xm = x & ~15; val ym = y & ~15
      val i = (ym >> 2) * p.w4 + (xm >> 2)
      if (!p.inter4(i)) return None
      val dir = p.dir4(i)
      val listCol =
        if (dir == 1) 0
        else if (dir == 2) 1
        else if (col.allRefsBefore) listX
        else if (col.colFromL0) 1 else 0
      val (mvx, mvy) =
        if (listCol == 0) (p.mvx4(i).toInt, p.mvy4(i).toInt)
        else (p.mv1x4(i).toInt, p.mv1y4(i).toInt)
      val colRefPocs =
        if (listCol == 0) p.tmvpRefPocs0 else p.tmvpRefPocs1
      val refIdxCol = (if (listCol == 0) p.ref04(i) else p.ref14(i)).toInt
      if (refIdxCol >= colRefPocs.size) return None // I-pic grid noise guard
      val td = col.colPoc - colRefPocs(refIdxCol)
      val tb = col.currPoc - targetRefPoc
      Some(if (td == tb) (mvx, mvy) else scaleMv(mvx, mvy, tb, td))
    }
    val xBr = xPb + nPbW; val yBr = yPb + nPbH
    val c0 =
      if (xBr < p.width && yBr < p.height &&
          (yPb >> col.ctbLog2) == (yBr >> col.ctbLog2))
        fromCell(xBr, yBr)
      else None
    c0.orElse(fromCell(xPb + nPbW / 2, yPb + nPbH / 2))
  }

  /** §8.5.3.2.1's temporal merge candidate: refIdx 0 per used list,
    * available when either list's temporal MV derives. */
  private def tmvpMergeMi(col: ColCtx, xPb: Int, yPb: Int,
      nPbW: Int, nPbH: Int, bSlice: Boolean,
      refPocs0: IndexedSeq[Int], refPocs1: IndexedSeq[Int]): Option[Mi] = {
    val l0 = tmvpMv(col, xPb, yPb, nPbW, nPbH, 0, refPocs0.head)
    val l1 = if (bSlice) tmvpMv(col, xPb, yPb, nPbW, nPbH, 1, refPocs1.head)
      else None
    (l0, l1) match {
      case (Some((x0, y0)), Some((x1, y1))) => Some(Mi(3, x0, y0, x1, y1))
      case (Some((x0, y0)), None) => Some(Mi(1, x0, y0, 0, 0))
      case (None, Some((x1, y1))) => Some(Mi(2, 0, 0, x1, y1))
      case _ => None
    }
  }

  /** §8.5.3.2.3: the spatial merging candidates A1 B1 B0 A0 (B2 only
    * when fewer than 4 so far) with the normative pairwise pruning,
    * then — when the slice enables TMVP (`col` present, r15) — the
    * §8.5.3.2.1 temporal candidate (refIdx 0, NOT pruned against the
    * spatial ones), then — for B slices — the §8.5.3.2.4 combined
    * bi-predictive candidates over the original-candidate pairs, then
    * zero fill to `maxCand` (zero candidates are bi in a B slice, L0
    * in a P slice; refIdx is always 0 in the tier). Candidate
    * availability = decoded-inter neighbor (z-scan availability via
    * the Pic's recon grid).
    */
  def mergeCandidatesMi(pic: H265Decode.Pic, xPb: Int, yPb: Int,
      nPbW: Int, nPbH: Int, maxCand: Int, bSlice: Boolean,
      refPocs0: IndexedSeq[Int] = IndexedSeq(0),
      refPocs1: IndexedSeq[Int] = IndexedSeq(0),
      numRefMerge: Int = 1, col: Option[ColCtx] = None): IndexedSeq[Mi] = {
    @inline def m(x: Int, y: Int): Option[Mi] =
      if (pic.interAt(x, y)) Some(pic.miAt(x, y)) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[Mi]
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
    if (out.size < maxCand)
      col.flatMap(cc => tmvpMergeMi(cc, xPb, yPb, nPbW, nPbH, bSlice,
        refPocs0, refPocs1)).foreach(out += _)
    if (bSlice && out.size > 1 && out.size < maxCand) {
      // §8.5.3.2.4 combined bi-predictive candidates: L0 motion of
      // combCandList0(k) + L1 motion of combCandList1(k), valid when
      // both halves exist and the result is not a same-picture
      // same-MV degenerate (refs at distinct POCs always pass)
      val l0Idx = Array(0, 1, 0, 2, 1, 2, 0, 3, 1, 3, 2, 3)
      val l1Idx = Array(1, 0, 2, 0, 2, 1, 3, 0, 3, 1, 3, 2)
      val nOrig = out.size
      var k = 0
      while (out.size < maxCand && k < nOrig * (nOrig - 1)) {
        val c0 = out(l0Idx(k)); val c1 = out(l1Idx(k))
        if (c0.has(0) && c1.has(1) &&
            (refPocs0(c0.ref0) != refPocs1(c1.ref1) || c0.mv(0) != c1.mv(1)))
          out += Mi(3, c0.mv0x, c0.mv0y, c1.mv1x, c1.mv1y,
            c0.ref0, c1.ref1)
        k += 1
      }
    }
    // §8.5.3.2.5 zero candidates: reference indices count up through
    // the usable range (numRefMerge = active L0 refs for P, the
    // smaller active count for B), then pin to 0
    var zeroIdx = 0
    while (out.size < maxCand) {
      val zr = if (zeroIdx < numRefMerge) zeroIdx else 0
      out += Mi(if (bSlice) 3 else 1, 0, 0, 0, 0, zr, if (bSlice) zr else 0)
      zeroIdx += 1
    }
    out.take(maxCand).toIndexedSeq
  }

  /** P-slice convenience form of [[mergeCandidatesMi]] (list-0 MVs). */
  def mergeCandidates(pic: H265Decode.Pic, xPb: Int, yPb: Int,
      nPbW: Int, nPbH: Int, maxCand: Int): IndexedSeq[(Int, Int)] =
    mergeCandidatesMi(pic, xPb, yPb, nPbW, nPbH, maxCand,
      bSlice = false).map(mi => (mi.mv0x, mi.mv0y))

  /** §8.5.3.1.8's POC-distance motion vector scaling: tb = POC(curr) −
    * POC(target ref), td = POC(curr) − POC(neighbor's ref). Integer
    * division truncates toward zero, as the spec's does.
    */
  def scaleMv(mvx: Int, mvy: Int, tb: Int, td: Int): (Int, Int) = {
    // tb == td ⇔ the neighbor references the target picture — always
    // caught by the same-POC passes in a real stream, so the scaled
    // pass never sees it; the P convenience path (all POCs 0) does.
    // Identity, bypassing the formula (whose truncations are only
    // exercised for tb != td).
    if (tb == td) return (mvx, mvy)
    @inline def clip3(lo: Int, hi: Int, v: Int): Int =
      if (v < lo) lo else if (v > hi) hi else v
    val tdC = clip3(-128, 127, td)
    val tbC = clip3(-128, 127, tb)
    val tx = (16384 + (math.abs(tdC) >> 1)) / tdC
    val dsf = clip3(-4096, 4095, (tbC * tx + 32) >> 6)
    @inline def s(v: Int): Int = clip3(-32768, 32767,
      Integer.signum(dsf * v) * ((math.abs(dsf * v) + 127) >> 8))
    (s(mvx), s(mvy))
  }

  /** §8.5.3.2.6–8: the 2-entry AMVP candidate list for `listX` — the
    * A candidate (A0 then A1: same-list pass, cross-list same-POC
    * pass, then — only when neither A position is inter at all ⇒
    * isScaledFlagLX = 0 stays moot here — nothing), the B candidate
    * (B0 B1 B2: same two passes), the §8.5.3.2.7 fallback where an
    * absent A steals B's value and B re-derives through the SCALED
    * pass, B dropped when equal to A, zero-MV fill. `currPoc` /
    * `refPoc0` / `refPoc1` drive the POC matches and the scaling
    * distances; refIdx is always 0 in the tier, so the same-list pass
    * hits whenever the neighbor predicts from `listX`.
    */
  def amvpCandidatesMi(pic: H265Decode.Pic, xPb: Int, yPb: Int,
      nPbW: Int, nPbH: Int, listX: Int, currPoc: Int,
      refPocs0: IndexedSeq[Int], refPocs1: IndexedSeq[Int],
      refIdx: Int = 0, col: Option[ColCtx] = None): IndexedSeq[(Int, Int)] = {
    val listY = 1 - listX
    @inline def pocOf(list: Int, r: Int): Int =
      if (list == 0) refPocs0(r) else refPocs1(r)
    val tPoc = pocOf(listX, refIdx)
    @inline def mi(p: (Int, Int)): Option[Mi] =
      if (pic.interAt(p._1, p._2)) Some(pic.miAt(p._1, p._2)) else None
    // the two same-POC passes over a position set (§8.5.3.2.7 steps
    // 6/7): same list first, then the other list — either qualifies
    // only when the neighbor's reference is the SAME PICTURE as the
    // target (POC equality; with multiple refs the neighbor's refIdx
    // may differ from the target's)
    def samePoc(pos: Seq[(Int, Int)]): Option[(Int, Int)] =
      pos.iterator.flatMap(mi).collectFirst {
        case n if n.has(listX) && pocOf(listX, n.ref(listX)) == tPoc =>
          n.mv(listX)
        case n if n.has(listY) && pocOf(listY, n.ref(listY)) == tPoc =>
          n.mv(listY)
      }
    // the scaled pass (step 8): first inter neighbor's same-list MV
    // scaled by POC distance, else its other-list MV scaled
    def scaled(pos: Seq[(Int, Int)]): Option[(Int, Int)] =
      pos.iterator.flatMap(mi).collectFirst {
        case n if n.has(listX) =>
          val (mx, my) = n.mv(listX)
          scaleMv(mx, my, currPoc - tPoc,
            currPoc - pocOf(listX, n.ref(listX)))
        case n if n.has(listY) =>
          val (mx, my) = n.mv(listY)
          scaleMv(mx, my, currPoc - tPoc,
            currPoc - pocOf(listY, n.ref(listY)))
      }
    val aPos = Seq((xPb - 1, yPb + nPbH), (xPb - 1, yPb + nPbH - 1))
    val bPos = Seq((xPb + nPbW, yPb - 1), (xPb + nPbW - 1, yPb - 1),
      (xPb - 1, yPb - 1))
    // isScaledFlagLX: any A position is a decoded inter neighbor. When
    // set, the A candidate may come from A's scaled pass; when clear,
    // A steals B's same-POC value and B re-derives scaled (§8.5.3.2.7).
    val aInter = aPos.exists(p => pic.interAt(p._1, p._2))
    var a = samePoc(aPos)
    var b = samePoc(bPos)
    if (aInter) { if (a.isEmpty) a = scaled(aPos) }
    else { a = b; b = scaled(bPos) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    a.foreach(out += _)
    b.foreach { c => if (!a.contains(c)) out += c }
    // §8.5.3.2.6 step: the temporal predictor (r15) joins when fewer
    // than two spatial candidates survived the dedup — appended
    // unpruned, exactly like the merge list's temporal entry
    if (out.size < 2)
      col.flatMap(cc =>
        tmvpMv(cc, xPb, yPb, nPbW, nPbH, listX, tPoc)).foreach(out += _)
    while (out.size < 2) out += ((0, 0))
    out.take(2).toIndexedSeq
  }

  /** P-slice convenience form of [[amvpCandidatesMi]]: list 0, where
    * refIdx-0-only means the same-list pass always hits and no POC
    * arithmetic can trigger (arguments 0).
    */
  def amvpCandidates(pic: H265Decode.Pic, xPb: Int, yPb: Int,
      nPbW: Int, nPbH: Int): IndexedSeq[(Int, Int)] =
    amvpCandidatesMi(pic, xPb, yPb, nPbW, nPbH, listX = 0,
      currPoc = 0, refPocs0 = IndexedSeq(0), refPocs1 = IndexedSeq(0))
}
