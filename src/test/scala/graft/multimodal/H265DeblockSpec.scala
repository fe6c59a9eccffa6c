package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC in-loop deblocking (§8.7.2, r12). Pinning strategy mirrors the
  * r11 H.264 filter's: (1) β/tC tables hard-pinned; (2) closed-form
  * STRONG and WEAK luma edge expectations computed in this file from
  * the §8.7.2.5 equations over flat-step pictures whose unfiltered
  * recon the decoder itself provides (deblock-off twin of the same
  * coded content); (3) chroma Δ filter likewise; (4) an INDEPENDENT
  * whole-picture reimplementation (vertical-pass-then-horizontal,
  * per-segment decisions) must match the decoder on textured content;
  * (5) pcm_loop_filter_disabled write-masking pinned at the state
  * level; (6) encoder twin recon == decoder output (in-loop parity).
  */
class H265DeblockSpec extends AnyFunSuite {

  import H265Encode.{CuLeaf, CuSplit}

  test("β/tC tables: hard-coded spec values") {
    val b = H265Deblock.betaTable
    assert(b.length == 52)
    assert(b(15) == 0 && b(16) == 6 && b(20) == 10 && b(28) == 18 &&
      b(29) == 20 && b(40) == 42 && b(51) == 64)
    val t = H265Deblock.tcTable
    assert(t.length == 54)
    assert(t(17) == 0 && t(18) == 1 && t(26) == 1 && t(27) == 2 &&
      t(31) == 3 && t(35) == 4 && t(38) == 5 && t(45) == 10 && t(53) == 24)
  }

  /** Encode a flat-step pair of 32x32 CTBs (left value via the DC
    * prediction chain, right offset by `step` through a DC residual)
    * at `qp`, once with the filter and once without. Returns
    * (filtered frame, unfiltered frame).
    */
  private def stepPicture(step: Int, qp: Int): (H264Decode.Frame, H264Decode.Frame) = {
    val w = 64; val h = 32
    val sy = Array.tabulate(w * h)(i => (if (i % w < 32) 128 else 128 + step).toByte)
    val scb = Array.fill((w / 2) * (h / 2))(128.toByte)
    val scr = Array.tabulate((w / 2) * (h / 2))(i =>
      (if (i % (w / 2) < 16) 110 else 110 + step).toByte)
    val layout = Seq(CuLeaf(Seq(1)), CuLeaf(Seq(1))) // DC, one TU per CTB
    val (on, _) = H265Encode.encodeIntraPicture2(sy, scb, scr, w, h, layout,
      qp, deblock = true)
    val (off, _) = H265Encode.encodeIntraPicture2(sy, scb, scr, w, h, layout,
      qp, deblock = false)
    val fOn = H265Decode.decodeAnnexBIntraPictures(on, 1)
    val fOff = H265Decode.decodeAnnexBIntraPictures(off, 1)
    assert(fOn.size == 1 && fOff.size == 1)
    (fOn.head, fOff.head)
  }

  test("STRONG luma filter: closed-form §8.7.2.5.7 expectations on a small step") {
    val qp = 20 // β 10, tC 1: a 2-level step takes the strong branch
    val (on, off) = stepPicture(step = 2, qp = qp)
    val w = 64
    // unfiltered recon: flat halves (DC prediction + DC-only residual)
    val p = off.luma(5 * w + 31) & 0xff
    val q = off.luma(5 * w + 32) & 0xff
    assert((0 until 32).forall(y => (off.luma(y * w + 30) & 0xff) == p))
    assert(math.abs(p - q) == 2, s"recon step was ${q - p}")
    val tc = 1 // tcTable(20 + 2)
    def c(v: Int, base: Int) = math.max(base - 2 * tc, math.min(base + 2 * tc, v))
    val ep0 = c((5 * p + 3 * q + 4) >> 3, p) // (p2+2p1+2p0+2q0+q1+4)>>3 on flat sides
    val ep1 = c((3 * p + q + 2) >> 2, p)
    val ep2 = c((7 * p + q + 4) >> 3, p)
    val eq0 = c((5 * q + 3 * p + 4) >> 3, q)
    val eq1 = c((3 * q + p + 2) >> 2, q)
    val eq2 = c((7 * q + p + 4) >> 3, q)
    for (y <- 0 until 32) {
      assert((on.luma(y * w + 31) & 0xff) == ep0, s"p0 row $y")
      assert((on.luma(y * w + 30) & 0xff) == ep1, s"p1 row $y")
      assert((on.luma(y * w + 29) & 0xff) == ep2, s"p2 row $y")
      assert((on.luma(y * w + 28) & 0xff) == p, s"p3 row $y untouched")
      assert((on.luma(y * w + 32) & 0xff) == eq0, s"q0 row $y")
      assert((on.luma(y * w + 33) & 0xff) == eq1, s"q1 row $y")
      assert((on.luma(y * w + 34) & 0xff) == eq2, s"q2 row $y")
      assert((on.luma(y * w + 35) & 0xff) == q, s"q3 row $y untouched")
    }
  }

  test("WEAK luma filter: closed-form §8.7.2.5.7 Δ/Δp/Δq on a larger step") {
    val qp = 28 // β 18, tC 2: a ~6-level step fails dSam → weak branch
    val (on, off) = stepPicture(step = 6, qp = qp)
    val w = 64
    val p = off.luma(9 * w + 31) & 0xff
    val q = off.luma(9 * w + 32) & 0xff
    val s = q - p
    assert(s >= 5 && s <= 7, s"recon step was $s") // ≥ (5·2+1)>>1 breaks dSam
    val tc = 2
    val d0 = (9 * s - 3 * s + 8) >> 4
    assert(math.abs(d0) < 10 * tc)
    val delta = math.max(-tc, math.min(tc, d0))
    val dp1 = math.max(-(tc >> 1), math.min(tc >> 1, delta >> 1))
    val dq1 = math.max(-(tc >> 1), math.min(tc >> 1, (-delta) >> 1))
    for (y <- 0 until 32) {
      assert((on.luma(y * w + 31) & 0xff) == p + delta, s"p0 row $y")
      assert((on.luma(y * w + 32) & 0xff) == q - delta, s"q0 row $y")
      assert((on.luma(y * w + 30) & 0xff) == p + dp1, s"p1 row $y (dEp)")
      assert((on.luma(y * w + 33) & 0xff) == q + dq1, s"q1 row $y (dEq)")
      assert((on.luma(y * w + 29) & 0xff) == p, s"p2 row $y untouched")
    }
  }

  test("chroma Δ filter: closed-form §8.7.2.5.5 at the luma-16 edge") {
    val qp = 30 // qpC 29 → tC idx 31 → 3
    val (on, off) = stepPicture(step = 7, qp = qp)
    val cw = 32
    val p = off.cr(3 * cw + 15) & 0xff
    val q = off.cr(3 * cw + 16) & 0xff
    val tc = H265Deblock.tcTable(H265Transform.chromaQp(qp) + 2)
    assert(tc > 0)
    val delta = math.max(-tc, math.min(tc,
      (((q - p) << 2) + p - q + 4) >> 3))
    for (cy <- 0 until 16) {
      assert((on.cr(cy * cw + 15) & 0xff) == p + delta, s"cr p0 row $cy")
      assert((on.cr(cy * cw + 16) & 0xff) == q - delta, s"cr q0 row $cy")
      assert((on.cr(cy * cw + 14) & 0xff) == p, s"cr p1 row $cy untouched")
    }
    // cb is flat across the edge: Δ = 0, nothing moves
    assert(on.cb.toSeq == off.cb.toSeq)
  }

  // -------------------- independent whole-picture reimplementation

  /** Straight-from-the-spec reference filter, written independently of
    * H265Deblock (per-sample index arithmetic, no shared helpers):
    * vertical edges over the whole plane, then horizontal; β/tC looked
    * up per segment; bS fixed 2 (intra).
    */
  private def refFilter(luma: Array[Byte], cb: Array[Byte], cr: Array[Byte],
      w: Int, h: Int, edgeV: (Int, Int) => Boolean,
      edgeH: (Int, Int) => Boolean, qp: Int): Unit = {
    val beta = H265Deblock.betaTable(math.min(51, qp))
    val tc = H265Deblock.tcTable(math.min(53, qp + 2))
    val tcC = H265Deblock.tcTable(math.min(53, H265Transform.chromaQp(qp) + 2))
    def lumaPass(vertical: Boolean): Unit = {
      @inline def px(eA: Int, eB: Int, off: Int): Int =
        if (vertical) luma(eB * w + eA + off) & 0xff
        else luma((eA + off) * w + eB) & 0xff
      @inline def st(eA: Int, eB: Int, off: Int, v: Int): Unit =
        if (vertical) luma(eB * w + eA + off) = v.toByte
        else luma((eA + off) * w + eB) = v.toByte
      var e = 8
      while (e < (if (vertical) w else h)) {
        var s = 0
        while (s < (if (vertical) h else w)) {
          val isEdge = if (vertical) edgeV(e, s) else edgeH(s, e)
          if (isEdge && beta > 0) {
            def d2(line: Int, pSide: Boolean): Int =
              if (pSide) math.abs(px(e, s + line, -3) -
                2 * px(e, s + line, -2) + px(e, s + line, -1))
              else math.abs(px(e, s + line, 2) -
                2 * px(e, s + line, 1) + px(e, s + line, 0))
            val dp0 = d2(0, pSide = true); val dp3 = d2(3, pSide = true)
            val dq0 = d2(0, pSide = false); val dq3 = d2(3, pSide = false)
            if (dp0 + dq0 + dp3 + dq3 < beta) {
              def strongAt(line: Int): Boolean =
                2 * (if (line == 0) dp0 + dq0 else dp3 + dq3) < (beta >> 2) &&
                  math.abs(px(e, s + line, -4) - px(e, s + line, -1)) +
                    math.abs(px(e, s + line, 0) - px(e, s + line, 3)) < (beta >> 3) &&
                  math.abs(px(e, s + line, -1) - px(e, s + line, 0)) <
                    ((5 * tc + 1) >> 1)
              if (strongAt(0) && strongAt(3)) {
                for (l <- 0 until 4) {
                  val a = Array.tabulate(8)(k => px(e, s + l, k - 4))
                  // a(0..3) = p3..p0, a(4..7) = q0..q3
                  def cl(v: Int, base: Int) =
                    math.max(base - 2 * tc, math.min(base + 2 * tc, v))
                  st(e, s + l, -1, cl((a(1) + 2 * a(2) + 2 * a(3) + 2 * a(4) + a(5) + 4) >> 3, a(3)))
                  st(e, s + l, -2, cl((a(1) + a(2) + a(3) + a(4) + 2) >> 2, a(2)))
                  st(e, s + l, -3, cl((2 * a(0) + 3 * a(1) + a(2) + a(3) + a(4) + 4) >> 3, a(1)))
                  st(e, s + l, 0, cl((a(6) + 2 * a(5) + 2 * a(4) + 2 * a(3) + a(2) + 4) >> 3, a(4)))
                  st(e, s + l, 1, cl((a(6) + a(5) + a(4) + a(3) + 2) >> 2, a(5)))
                  st(e, s + l, 2, cl((2 * a(7) + 3 * a(6) + a(5) + a(4) + a(3) + 4) >> 3, a(6)))
                }
              } else {
                val dEp = dp0 + dp3 < ((beta + (beta >> 1)) >> 3)
                val dEq = dq0 + dq3 < ((beta + (beta >> 1)) >> 3)
                for (l <- 0 until 4) {
                  val p2 = px(e, s + l, -3); val p1 = px(e, s + l, -2)
                  val p0 = px(e, s + l, -1); val q0 = px(e, s + l, 0)
                  val q1 = px(e, s + l, 1); val q2 = px(e, s + l, 2)
                  val d0 = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
                  if (math.abs(d0) < 10 * tc) {
                    val d = math.max(-tc, math.min(tc, d0))
                    st(e, s + l, -1, math.max(0, math.min(255, p0 + d)))
                    st(e, s + l, 0, math.max(0, math.min(255, q0 - d)))
                    if (dEp) st(e, s + l, -2, math.max(0, math.min(255,
                      p1 + math.max(-(tc >> 1), math.min(tc >> 1,
                        (((p2 + p0 + 1) >> 1) - p1 + d) >> 1)))))
                    if (dEq) st(e, s + l, 1, math.max(0, math.min(255,
                      q1 + math.max(-(tc >> 1), math.min(tc >> 1,
                        (((q2 + q0 + 1) >> 1) - q1 - d) >> 1)))))
                  }
                }
              }
            }
          }
          s += 4
        }
        e += 8
      }
    }
    def chromaPass(plane: Array[Byte], vertical: Boolean): Unit = {
      val cw = w / 2
      @inline def px(e: Int, s: Int, off: Int): Int =
        if (vertical) plane(s * cw + e + off) & 0xff
        else plane((e + off) * cw + s) & 0xff
      @inline def st(e: Int, s: Int, off: Int, v: Int): Unit =
        if (vertical) plane(s * cw + e + off) = v.toByte
        else plane((e + off) * cw + s) = v.toByte
      var e = 16
      while (e < (if (vertical) w else h)) {
        var s = 0
        while (s < (if (vertical) h else w)) {
          val isEdge = if (vertical) edgeV(e, s) else edgeH(s, e)
          if (isEdge && tcC > 0) {
            for (l <- 0 until 4) {
              val p1 = px(e / 2, s / 2 + l, -2); val p0 = px(e / 2, s / 2 + l, -1)
              val q0 = px(e / 2, s / 2 + l, 0); val q1 = px(e / 2, s / 2 + l, 1)
              val d = math.max(-tcC, math.min(tcC,
                ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3)))
              st(e / 2, s / 2 + l, -1, math.max(0, math.min(255, p0 + d)))
              st(e / 2, s / 2 + l, 0, math.max(0, math.min(255, q0 - d)))
            }
          }
          s += 8
        }
        e += 16
      }
    }
    lumaPass(vertical = true)
    chromaPass(cb, vertical = true); chromaPass(cr, vertical = true)
    lumaPass(vertical = false)
    chromaPass(cb, vertical = false); chromaPass(cr, vertical = false)
  }

  test("independent whole-picture reimplementation matches the decoder on textured content") {
    val w = 64; val h = 64
    val rnd = new scala.util.Random(17)
    val sy = Array.tabulate(w * h)(i =>
      (60 + (i % w) + rnd.nextInt(31)).min(250).toByte)
    val scb = Array.tabulate((w / 2) * (h / 2))(_ => (100 + rnd.nextInt(41)).toByte)
    val scr = Array.tabulate((w / 2) * (h / 2))(_ => (120 + rnd.nextInt(25)).toByte)
    // uniform layout so the TEST knows the TU edges exactly: every CTB
    // split to four 16x16 CUs (one TU each) → edges on the 16-grid
    def tree = CuSplit(CuLeaf(Seq(1)), CuLeaf(Seq(26)), CuLeaf(Seq(10)),
      CuLeaf(Seq(0)))
    for (qp <- Seq(22, 30, 37)) {
      val (on, _) = H265Encode.encodeIntraPicture2(sy, scb, scr, w, h,
        Seq(tree, tree, tree, tree), qp, deblock = true)
      val (off, _) = H265Encode.encodeIntraPicture2(sy, scb, scr, w, h,
        Seq(tree, tree, tree, tree), qp, deblock = false)
      val fOn = H265Decode.decodeAnnexBIntraPictures(on, 1).head
      val fOff = H265Decode.decodeAnnexBIntraPictures(off, 1).head
      val ly = fOff.luma.clone(); val lcb = fOff.cb.clone(); val lcr = fOff.cr.clone()
      refFilter(ly, lcb, lcr, w, h,
        edgeV = (x, _) => x % 16 == 0, edgeH = (_, y) => y % 16 == 0, qp)
      assert(ly.toSeq == fOn.luma.toSeq, s"luma qp $qp")
      assert(lcb.toSeq == fOn.cb.toSeq, s"cb qp $qp")
      assert(lcr.toSeq == fOn.cr.toSeq, s"cr qp $qp")
      // liveness: SOME plane must move (luma's d < β gate may
      // legitimately reject every segment on high-contrast noise at
      // low qp; the bS-2 chroma filter always applies Δ)
      assert(ly.toSeq != fOff.luma.toSeq || lcb.toSeq != fOff.cb.toSeq ||
        lcr.toSeq != fOff.cr.toSeq, s"filter moved nothing at qp $qp")
    }
  }

  test("encoder twin recon == decoder output with the filter live (in-loop parity)") {
    val w = 64; val h = 32
    val rnd = new scala.util.Random(23)
    val sy = Array.tabulate(w * h)(_ => (50 + rnd.nextInt(161)).toByte)
    val scb = Array.fill((w / 2) * (h / 2))((128 + rnd.nextInt(9) - 4).toByte)
    val scr = Array.fill((w / 2) * (h / 2))((128 - rnd.nextInt(9)).toByte)
    def leaf8 = CuLeaf(Seq(rnd.nextInt(35)), splitTu = rnd.nextBoolean())
    def node16 = CuSplit(leaf8, leaf8, leaf8, leaf8)
    val tree = CuSplit(node16, CuLeaf(Seq(26)), node16, CuLeaf(Seq(4)))
    val (stream, recon) = H265Encode.encodeIntraPicture2(sy, scb, scr, w, h,
      Seq(tree, tree), 26, deblock = true)
    val f = H265Decode.decodeAnnexBIntraPictures(stream, 1).head
    assert(f.luma.toSeq == recon.luma.toSeq)
    assert(f.cb.toSeq == recon.cb.toSeq)
    assert(f.cr.toSeq == recon.cr.toSeq)
  }

  test("pcm_loop_filter_disabled masks writes, not reads (state-level pin)") {
    val pic = new H265Decode.Pic(32, 16)
    // two flat halves with a step at x=16; both sides recon'd, edge marked
    for (y <- 0 until 16; x <- 0 until 32)
      pic.luma(y * 32 + x) = (if (x < 16) 100 else 108).toByte
    java.util.Arrays.fill(pic.cb, 128.toByte)
    java.util.Arrays.fill(pic.cr, 128.toByte)
    pic.markLuma(0, 0, 16); pic.markLuma(16, 0, 16)
    pic.markLuma(0, 0, 16) // idempotent
    pic.markNoFilter(0, 0, 16) // the p side is a protected PCM CU
    H265Deblock.filterPicture(pic, 30, 0, 0, 0, 0)
    for (y <- 0 until 16) {
      assert((pic.luma(y * 32 + 15) & 0xff) == 100, s"PCM p0 row $y untouched")
      assert((pic.luma(y * 32 + 14) & 0xff) == 100, s"PCM p1 row $y untouched")
      assert((pic.luma(y * 32 + 16) & 0xff) != 108, s"q0 row $y must move")
    }
  }
}
