package graft.multimodal

/** HEVC in-loop deblocking filter (ITU-T H.265 §8.7.2), intra-tier
  * scope: every filtered edge is a TU/CU boundary on the 8x8 luma grid
  * with boundary strength 2 (one side intra — always, in I pictures),
  * so the bS derivation reduces to edge existence. Unlike AVC's
  * per-MB interleave, HEVC filters ALL vertical edges of the picture
  * first, then all horizontal edges (the horizontal pass reads
  * vertically-filtered samples). Luma: per-4-line segment decisions
  * (d < β), strong/weak selection from lines 0 and 3, the 3-sample
  * strong filter and the Δ/Δp/Δq weak filter; chroma (bS 2 only): the
  * 1-sample Δ filter at the 16-luma grid. β/tC from Tables 8-11/8-12
  * (hard-pinned independently in H265DeblockSpec); pcm_loop_filter
  * _disabled masks WRITES inside PCM CUs while their samples still
  * feed neighbor decisions. Transcription caveat as ever — no external
  * conformance material in the container.
  */
private[multimodal] object H265Deblock {

  /** Table 8-11: β′ by index 0..51. */
  val betaTable: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64)

  /** Table 8-12: tC′ by index 0..53. */
  val tcTable: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4,
    4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24)

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** One luma edge SEGMENT (4 lines across the edge at positions
    * p3..p0 | q0..q3). `get`/`set` address (line 0..3, offset −4..3
    * across the edge, p-side negative: offset −1 = p0, 0 = q0).
    * `writeP`/`writeQ` gate writes (pcm_loop_filter_disabled).
    */
  private def filterLumaSegment(get: (Int, Int) => Int,
      set: (Int, Int, Int) => Unit, beta: Int, tc: Int,
      writeP: Boolean, writeQ: Boolean): Unit = {
    @inline def p(i: Int, line: Int): Int = get(line, -1 - i)
    @inline def q(i: Int, line: Int): Int = get(line, i)
    def dp(line: Int): Int =
      math.abs(p(2, line) - 2 * p(1, line) + p(0, line))
    def dq(line: Int): Int =
      math.abs(q(2, line) - 2 * q(1, line) + q(0, line))
    val dp0 = dp(0); val dp3 = dp(3); val dq0 = dq(0); val dq3 = dq(3)
    val d = dp0 + dq0 + dp3 + dq3
    if (d >= beta) return
    // strong/weak decision (§8.7.2.5.3, dSam from lines 0 and 3)
    def dSam(line: Int): Boolean = {
      val dpq = (if (line == 0) dp0 + dq0 else dp3 + dq3) * 2
      dpq < (beta >> 2) &&
        math.abs(p(3, line) - p(0, line)) + math.abs(q(0, line) - q(3, line)) <
          (beta >> 3) &&
        math.abs(p(0, line) - q(0, line)) < ((5 * tc + 1) >> 1)
    }
    val strong = dSam(0) && dSam(3)
    if (strong) {
      var line = 0
      while (line < 4) {
        val (p0, p1, p2, p3) = (p(0, line), p(1, line), p(2, line), p(3, line))
        val (q0, q1, q2, q3) = (q(0, line), q(1, line), q(2, line), q(3, line))
        if (writeP) {
          set(line, -1, clip3(p0 - 2 * tc, p0 + 2 * tc,
            (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3))
          set(line, -2, clip3(p1 - 2 * tc, p1 + 2 * tc,
            (p2 + p1 + p0 + q0 + 2) >> 2))
          set(line, -3, clip3(p2 - 2 * tc, p2 + 2 * tc,
            (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3))
        }
        if (writeQ) {
          set(line, 0, clip3(q0 - 2 * tc, q0 + 2 * tc,
            (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3))
          set(line, 1, clip3(q1 - 2 * tc, q1 + 2 * tc,
            (q2 + q1 + q0 + p0 + 2) >> 2))
          set(line, 2, clip3(q2 - 2 * tc, q2 + 2 * tc,
            (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3))
        }
        line += 1
      }
    } else {
      // weak filter: side-extension decisions are SEGMENT-level
      val dEp = dp0 + dp3 < ((beta + (beta >> 1)) >> 3)
      val dEq = dq0 + dq3 < ((beta + (beta >> 1)) >> 3)
      var line = 0
      while (line < 4) {
        val (p0, p1, p2) = (p(0, line), p(1, line), p(2, line))
        val (q0, q1, q2) = (q(0, line), q(1, line), q(2, line))
        val delta0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        if (math.abs(delta0) < tc * 10) {
          val delta = clip3(-tc, tc, delta0)
          if (writeP) set(line, -1, clip255(p0 + delta))
          if (writeQ) set(line, 0, clip255(q0 - delta))
          if (dEp && writeP) {
            val dp1 = clip3(-(tc >> 1), tc >> 1,
              (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1)
            set(line, -2, clip255(p1 + dp1))
          }
          if (dEq && writeQ) {
            val dq1 = clip3(-(tc >> 1), tc >> 1,
              (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1)
            set(line, 1, clip255(q1 + dq1))
          }
        }
        line += 1
      }
    }
  }

  /** One chroma edge segment (4 lines, bS 2): the §8.7.2.5.5 Δ filter. */
  private def filterChromaSegment(get: (Int, Int) => Int,
      set: (Int, Int, Int) => Unit, tc: Int,
      writeP: Boolean, writeQ: Boolean): Unit = {
    var line = 0
    while (line < 4) {
      val p1 = get(line, -2); val p0 = get(line, -1)
      val q0 = get(line, 0); val q1 = get(line, 1)
      val delta = clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
      if (writeP) set(line, -1, clip255(p0 + delta))
      if (writeQ) set(line, 0, clip255(q0 - delta))
      line += 1
    }
  }

  /** §8.7.2.4 boundary strength for one 4-sample segment whose p0 is
    * at (px, py) and q0 at (qx, qy), both sides inter and cbf-clean
    * (the intra → 2 and nonzero-TB → 1 rules are applied by the
    * caller): 1 on reference-picture or MV-count mismatch or a ≥4
    * quarter-pel component difference under the normative matching
    * (same-picture-twice blocks accept EITHER assignment), else 0.
    * References compare by PICTURE (POC via the slice's lists), not
    * by list index.
    */
  private def motionBs(a: H265Inter.Mi, b: H265Inter.Mi,
      refPocs0: IndexedSeq[Int], refPocs1: IndexedSeq[Int]): Int = {
    def refs(m: H265Inter.Mi): List[Int] = m.dir match {
      case 1 => List(refPocs0(m.ref0))
      case 2 => List(refPocs1(m.ref1))
      case _ => List(refPocs0(m.ref0), refPocs1(m.ref1))
    }
    def mvs(m: H265Inter.Mi): List[(Int, Int)] = m.dir match {
      case 1 => List((m.mv0x, m.mv0y))
      case 2 => List((m.mv1x, m.mv1y))
      case _ => List((m.mv0x, m.mv0y), (m.mv1x, m.mv1y))
    }
    @inline def far(p: (Int, Int), q: (Int, Int)): Boolean =
      math.abs(p._1 - q._1) >= 4 || math.abs(p._2 - q._2) >= 4
    val ra = refs(a); val rb = refs(b)
    val ma = mvs(a); val mb = mvs(b)
    if (ra.size != rb.size) 1
    else if (ra.size == 1) {
      if (ra.head != rb.head || far(ma.head, mb.head)) 1 else 0
    } else if (ra.sorted != rb.sorted) 1
    else if (ra.head != ra(1)) {
      // two DISTINCT pictures: match B's MVs to A's reference order
      val (mb0, mb1) =
        if (rb.head == ra.head) (mb.head, mb(1)) else (mb(1), mb.head)
      if (far(ma.head, mb0) || far(ma(1), mb1)) 1 else 0
    } else {
      // the same picture on both lists: bS 0 if EITHER assignment is
      // close (§8.7.2.4's "for at least one of the two possible
      // correspondences")
      val straight = !far(ma.head, mb.head) && !far(ma(1), mb(1))
      val crossed = !far(ma.head, mb(1)) && !far(ma(1), mb.head)
      if (straight || crossed) 0 else 1
    }
  }

  /** Filter a decoded picture IN PLACE (the in-loop property: callers
    * run this before the picture becomes a reference / output). Edge
    * existence comes from the Pic's TU-edge grids (collected at recon
    * time; 2Nx2N tier ⇒ every PU edge is also a TU edge). bS per
    * 4-sample segment (§8.7.2.4): 2 when either side is intra — the
    * only case in I pictures, and the only case chroma filters — 1 on
    * a nonzero-level luma TB or a motion mismatch ([[motionBs]]; r14,
    * unlocked by the libx265 external vectors), else 0 (unfiltered).
    * `qp` is the slice luma QP (no cu_qp_delta in the tier); β/tC
    * offsets are the PPS's.
    */
  def filterPicture(pic: H265Decode.Pic, qp: Int, cbQpOffset: Int,
      crQpOffset: Int, betaOff: Int, tcOff: Int,
      interPic: Boolean = false,
      refPocs0: IndexedSeq[Int] = IndexedSeq(0),
      refPocs1: IndexedSeq[Int] = IndexedSeq(0)): Unit = {
    val w = pic.width; val h = pic.height
    val beta = betaTable(clip3(0, 51, qp + (betaOff << 1)))
    def tcFor(bs: Int): Int =
      tcTable(clip3(0, 53, qp + 2 * (bs - 1) + (tcOff << 1)))
    def qpC(off: Int): Int =
      H265Transform.chromaQp(clip3(0, 57, qp + off))
    val tcCb = tcTable(clip3(0, 53, qpC(cbQpOffset) + 2 + (tcOff << 1)))
    val tcCr = tcTable(clip3(0, 53, qpC(crQpOffset) + 2 + (tcOff << 1)))

    @inline def noFilt(x: Int, y: Int): Boolean = pic.noFilter(x, y)
    /** bS of the segment whose adjacent samples are p0=(px,py),
      * q0=(qx,qy). */
    def bsAt(px: Int, py: Int, qx: Int, qy: Int): Int =
      if (!interPic) 2
      else if (!pic.interAt(px, py) || !pic.interAt(qx, qy)) 2
      else if (pic.cbfAt(px, py) || pic.cbfAt(qx, qy)) 1
      else motionBs(pic.miAt(px, py), pic.miAt(qx, qy),
        refPocs0, refPocs1)

    // ---- pass 1: ALL vertical edges (x on the 8-grid, x > 0)
    var x = 8
    while (x < w) {
      var y = 0
      while (y < h) {
        if (pic.tuEdgeV(x, y)) {
          val yy = y
          val bs = bsAt(x - 1, yy, x, yy)
          if (beta > 0 && bs > 0) filterLumaSegment(
            (line, off) => pic.luma((yy + line) * w + x + off) & 0xff,
            (line, off, v) => pic.luma((yy + line) * w + x + off) = v.toByte,
            beta, tcFor(bs),
            writeP = !noFilt(x - 1, yy), writeQ = !noFilt(x, yy))
        }
        y += 4
      }
      x += 8
    }
    // chroma vertical edges: luma-16 grid, bS 2 segments only
    val cw = w >> 1; val ch = h >> 1
    x = 16
    while (x < w) {
      var y = 0
      while (y < h) {
        if (pic.tuEdgeV(x, y) && tcCb + tcCr > 0 &&
            bsAt(x - 1, y, x, y) == 2) {
          val cx = x >> 1; val cy = y >> 1
          def run(plane: Array[Byte], t: Int): Unit =
            if (t > 0) filterChromaSegment(
              (line, off) => plane((cy + line) * cw + cx + off) & 0xff,
              (line, off, v) => plane((cy + line) * cw + cx + off) = v.toByte,
              t, writeP = !noFilt(x - 1, y), writeQ = !noFilt(x, y))
          run(pic.cb, tcCb); run(pic.cr, tcCr)
        }
        y += 8 // 4 chroma lines per segment
      }
      x += 16
    }
    // ---- pass 2: ALL horizontal edges (y on the 8-grid, y > 0)
    var y = 8
    while (y < h) {
      var x2 = 0
      while (x2 < w) {
        if (pic.tuEdgeH(x2, y)) {
          val xx = x2
          val bs = bsAt(xx, y - 1, xx, y)
          if (beta > 0 && bs > 0) filterLumaSegment(
            (line, off) => pic.luma((y + off) * w + xx + line) & 0xff,
            (line, off, v) => pic.luma((y + off) * w + xx + line) = v.toByte,
            beta, tcFor(bs),
            writeP = !noFilt(xx, y - 1), writeQ = !noFilt(xx, y))
        }
        x2 += 4
      }
      y += 8
    }
    y = 16
    while (y < h) {
      var x2 = 0
      while (x2 < w) {
        if (pic.tuEdgeH(x2, y) && tcCb + tcCr > 0 &&
            bsAt(x2, y - 1, x2, y) == 2) {
          val cx = x2 >> 1; val cy = y >> 1
          def run(plane: Array[Byte], t: Int): Unit =
            if (t > 0) filterChromaSegment(
              (line, off) => plane((cy + off) * cw + cx + line) & 0xff,
              (line, off, v) => plane((cy + off) * cw + cx + line) = v.toByte,
              t, writeP = !noFilt(x2, y - 1), writeQ = !noFilt(x2, y))
          run(pic.cb, tcCb); run(pic.cr, tcCr)
        }
        x2 += 8
      }
      y += 16
    }
  }
}
