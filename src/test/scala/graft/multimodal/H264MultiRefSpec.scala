package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Multi-reference-list pins — the r11 ref_idx tier (DPB > 2, te(v) +
  * CABAC ref_idx syntax, ref-matched mv prediction, sliding-window
  * marking). Provenance posture as in H264InterSpec/H264BSliceSpec (no
  * reference decoder in this container): earlier pictures decode first
  * as ground truth, later multi-ref pictures with zero residual and
  * whole-pel motion must reproduce exact, independently computed pixel
  * expectations from the reference PICTURE each partition names.
  * The r10 lesson applies: encoder and decoder share the MvGrid
  * prediction logic, so the mvp ref-matching rules are additionally
  * pinned with HAND-WRITTEN slice bits carrying hand-computed mvd and
  * ref_idx sequences — a shared-logic bug cannot round-trip through
  * those.
  */
class H264MultiRefSpec extends AnyFunSuite {

  private val mbW = 4; private val mbH = 3
  private val W = mbW * 16; private val H = mbH * 16

  private def gradient(): Array[Array[Int]] =
    Array.tabulate(mbH, mbW)((r, c) => 30 + 29 * r + 17 * c)

  /** Edge-clamped whole-pel fetch. */
  private def at(p: Array[Byte], stride: Int, h: Int, x: Int, y: Int): Int = {
    val cx = math.max(0, math.min(stride - 1, x))
    val cy = math.max(0, math.min(h - 1, y))
    p(cy * stride + cx) & 0xff
  }

  /** IDR(poc 0) + P1(poc 2, uniform mv from the IDR) — the two-deep
    * ground truth every multi-ref picture below references. DPB
    * declared at `numRefFrames`.
    */
  private def ip(numRefFrames: Int, cabac: Boolean = false,
      idc: Int = 0): Array[Byte] = {
    val (idr, _) =
      if (cabac) H264Encode.encodeCabacI16x16Dc(gradient(),
        numRefFrames = numRefFrames)
      else H264Encode.encodeI16x16Dc(gradient(), numRefFrames = numRefFrames)
    val mvs = Array.fill(mbH, mbW)((8, 4)) // whole-pel (2, 1)
    val p =
      if (cabac) H264Encode.encodeCabacP16x16(mvs, initIdc = idc, poc = 2)
      else H264Encode.encodeP16x16(mvs, poc = 2)
    idr ++ H264Encode.annexB(Seq((1, 3, p)))
  }

  /** The multi-ref P2 used throughout: checkerboard ref_idx (0 = P1,
    * the most recent; 1 = the IDR) with per-MB whole-pel motion.
    */
  private def p2Mbs(): Array[Array[(Int, (Int, Int))]] =
    Array.tabulate(mbH, mbW) { (r, c) =>
      val ref = (r + c) % 2
      (ref, (4 * ((c % 3) - 1), 4 * (r % 2)))
    }

  test("CAVLC P multi-ref: each MB reconstructs from the PICTURE its ref_idx names") {
    val p2 = H264Encode.encodeP16x16MultiRef(p2Mbs(), numRef0 = 2, poc = 4)
    val stream = ip(numRefFrames = 2) ++ H264Encode.annexB(Seq((1, 3, p2)))
    val frames = H264Decode.decodeAnnexBPictures(stream)
    assert(frames.size === 3, "I, P1, P2 expected")
    val refs = Array(frames(1), frames(0)) // L0 = [P1, IDR]
    val mbs = p2Mbs()
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val (ref, (mx, my)) = mbs(mbY)(mbX)
      val rf = refs(ref)
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        val expect = at(rf.luma, W, H, x + mx / 4, y + my / 4)
        assert((frames(2).luma(y * W + x) & 0xff) === expect,
          s"mb($mbX,$mbY) ref $ref at ($x,$y)")
      }
    }
  }

  test("dual-entropy differential: CABAC multi-ref P pixels == CAVLC, all three init idc") {
    val base = H264Decode.decodeAnnexBPictures(ip(2) ++ H264Encode.annexB(
      Seq((1, 3, H264Encode.encodeP16x16MultiRef(p2Mbs(), 2, poc = 4)))))
    assert(base.size === 3)
    for (idc <- 0 to 2) {
      val p2 = H264Encode.encodeCabacP16x16MultiRef(p2Mbs(), 2,
        initIdc = idc, poc = 4)
      val fr = H264Decode.decodeAnnexBPictures(
        ip(2, cabac = true, idc = idc) ++ H264Encode.annexB(Seq((1, 3, p2))))
      assert(fr.size === 3, s"idc $idc")
      for (k <- 0 until 3) {
        assert(java.util.Arrays.equals(fr(k).luma, base(k).luma), s"idc $idc luma $k")
        assert(java.util.Arrays.equals(fr(k).cb, base(k).cb), s"idc $idc cb $k")
        assert(java.util.Arrays.equals(fr(k).cr, base(k).cr), s"idc $idc cr $k")
      }
    }
  }

  test("hand-written bits: te(v) ref_idx + rule-2 mvp ref-matching (mvds hand-computed)") {
    // te(v) at numRef0 = 2 is ONE INVERTED BIT: ref 0 -> '1', ref 1 -> '0'
    // (9.1's truncated form). The slice below is written bit-by-bit with
    // ref_idx and mvd values computed BY HAND from 8.4.1.3:
    //   MB(0,0) ref 0, mv (4,0):  A/B/C unavailable -> mvp (0,0), mvd (4,0)
    //   MB(1,0) ref 1, mv (0,4):  B/C unavailable, A available -> rule 1
    //     fires REGARDLESS of A's different refIdx: mvp = mvA = (4,0),
    //     mvd = (-4,4)
    //   MB(2,0) ref 0, mv (8,0):  rule 1 again, mvp = (0,4), mvd = (8,-4)
    //   MB(3,0) ref 0, mv (0,0):  rule 1, mvp = (8,0), mvd = (-8,0)
    //   MB(0,1) ref 1, mv (4,4):  A unavailable, B = MB(0,0) ref 0,
    //     C = MB(1,0) ref 1 -> exactly one neighbor (C) matches ref 1:
    //     rule 2 -> mvp = mvC = (0,4), mvd = (4,0)
    //   remaining MBs ref 0, mv (0,0), mvp = component-wise median
    //     (hand-tracked below via the shared grid ONLY for rows >= 1
    //     cells we don't assert mvp paths for)
    val w = new H264.BitWriter
    H264Encode.pSliceHeader(w, 26, poc = 4, numRef0 = 2)
    def mb(refBit: Int, mvdX: Int, mvdY: Int): Unit = {
      w.ue(0) // mb_skip_run
      w.ue(0) // P_L0_16x16
      w.u(refBit, 1) // te(v), max 1: ref 0 -> 1, ref 1 -> 0
      w.se(mvdX); w.se(mvdY)
      w.ue(H264Inter.cbpInterToCodeNum(0))
    }
    mb(1, 4, 0)    // MB(0,0) ref 0 mv (4,0)
    mb(0, -4, 4)   // MB(1,0) ref 1 mv (0,4)
    mb(1, 8, -4)   // MB(2,0) ref 0 mv (8,0)
    mb(1, -8, 0)   // MB(3,0) ref 0 mv (0,0)
    mb(0, 4, 0)    // MB(0,1) ref 1 mv (4,4) -- the rule-2 pin
    // MB(1,1) ref 0 mv (0,0): A = (4,4) ref1, B = (0,4) ref1, C = (8,0)
    // ref0 -> exactly one ref-0 neighbor (C): mvp = (8,0), mvd = (-8,0)
    mb(1, -8, 0)
    // MB(2,1) ref 0 mv (0,0): A = (0,0) ref0, B = (8,0) ref0, C = (0,0)
    // ref0 -> three matches, no single-match rule: median of A/B/C =
    // ((0|0|8 med)=0, 0) -> mvp (0,0), mvd (0,0)
    mb(1, 0, 0)
    // MB(3,1) ref 1 mv (0,0): A = (0,0) ref0, B = (0,0) ref0, C (off
    // right edge) -> D = MB(2,0) ref0: NO ref-1 match -> median of
    // mvA/mvB/mvD = ((0,0),(0,0),(8,0)) -> (0,0); mvd (0,0)
    mb(0, 0, 0)
    // row 2: all ref 0, mv (0,0); mvds derived with the shared grid is
    // NOT used here -- every neighbor above carries known motion:
    // MB(0,2): A unavail, B = (4,4) ref1, C = (0,0) ref0 -> rule 2 (C)
    // -> mvp (0,0), mvd (0,0)
    mb(1, 0, 0)
    // MB(1,2): A = (0,0) ref0, B = (0,0) ref0, C = (0,0) ref0 -> median
    // (0,0)
    mb(1, 0, 0)
    mb(1, 0, 0) // MB(2,2): same shape, all-zero neighbors
    // MB(3,2): A = (0,0) ref0, B = (0,0) ref1? no -- MB(3,1) is ref 1
    // mv (0,0); C off-edge -> D = MB(2,1) ref0 (0,0): single ref-0
    // match is NOT unique (A and D)... A=(0,0) ref0, B=MB(3,1) ref1,
    // D=(0,0) ref0 -> two matches -> median of ((0,0),(0,0),(0,0)) = 0
    mb(1, 0, 0)
    val p2 = H264.ebsp(w.stop())
    val frames = H264Decode.decodeAnnexBPictures(
      ip(2) ++ H264Encode.annexB(Seq((1, 3, p2))))
    assert(frames.size === 3)
    val refs = Array(frames(1), frames(0))
    val want: Seq[(Int, Int, Int, Int, Int)] = Seq( // (mbX, mbY, ref, mvx, mvy)
      (0, 0, 0, 4, 0), (1, 0, 1, 0, 4), (2, 0, 0, 8, 0), (3, 0, 0, 0, 0),
      (0, 1, 1, 4, 4), (1, 1, 0, 0, 0), (2, 1, 0, 0, 0), (3, 1, 1, 0, 0),
      (0, 2, 0, 0, 0), (1, 2, 0, 0, 0), (2, 2, 0, 0, 0), (3, 2, 0, 0, 0))
    want.foreach { case (mbX, mbY, ref, mvx, mvy) =>
      val rf = refs(ref)
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        val expect = at(rf.luma, W, H, x + mvx / 4, y + mvy / 4)
        assert((frames(2).luma(y * W + x) & 0xff) === expect,
          s"mb($mbX,$mbY) ref $ref at ($x,$y)")
      }
    }
  }

  test("sliding window at max_num_ref_frames = 2: ref_idx 1 reaches P1, never the evicted IDR") {
    // decode order IDR(0), P1(2), P2(4), P3(6): at P3 the DPB holds
    // [P1, P2] -- ref_idx 1 = P1. P1 differs from the IDR everywhere
    // (uniform (8,4)/whole-pel (2,1) shift of a gradient), so a decoder
    // that kept the IDR would produce different pixels.
    val p2 = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((0, 8)), poc = 4)
    val p3 = H264Encode.encodeP16x16MultiRef(
      Array.fill(mbH, mbW)((1, (0, 0))), numRef0 = 2, poc = 6)
    val frames = H264Decode.decodeAnnexBPictures(ip(2) ++
      H264Encode.annexB(Seq((1, 3, p2), (1, 3, p3))))
    assert(frames.size === 4)
    // P3 (ref_idx 1, zero mv) must be EXACTLY P1
    assert(java.util.Arrays.equals(frames(3).luma, frames(1).luma))
    assert(java.util.Arrays.equals(frames(3).cb, frames(1).cb))
    assert(!java.util.Arrays.equals(frames(3).luma, frames(0).luma),
      "P1 must differ from the IDR for the eviction pin to bite")
  }

  test("DPB 3 keeps the IDR reachable: same stream shape, ref_idx 2 = IDR") {
    val p2 = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((0, 8)), poc = 4)
    val p3 = H264Encode.encodeP16x16MultiRef(
      Array.fill(mbH, mbW)((2, (0, 0))), numRef0 = 3, poc = 6)
    val frames = H264Decode.decodeAnnexBPictures(ip(3) ++
      H264Encode.annexB(Seq((1, 3, p2), (1, 3, p3))))
    assert(frames.size === 4)
    assert(java.util.Arrays.equals(frames(3).luma, frames(0).luma))
  }

  test("B multi-ref L0: ref_idx_l0 selects P1 vs IDR; L1 stays the future picture") {
    // decode order IDR(0), P1(2), P2(8), B(4): B's L0 = [P1, IDR, P2],
    // L1 = [P2, P1, IDR]. Per-MB dir cycles L0/L1/Bi with ref0
    // alternating 0/1.
    val bMbs: Array[Array[(Int, (Int, (Int, Int)), (Int, (Int, Int)))]] =
      Array.tabulate(mbH, mbW) { (r, c) =>
        val dir = (r * mbW + c) % 3
        val r0 = (r + c) % 2
        (dir, (r0, (4 * ((c % 2) * 2 - 1), 0)), (0, (0, 4 * ((r % 2) * 2 - 1))))
      }
    val p2 = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((0, 8)), poc = 8)
    val b = H264Encode.encodeB16x16MultiRef(bMbs, numRef0 = 2, numRef1 = 1,
      poc = 4)
    val frames = H264Decode.decodeAnnexBPictures(ip(3) ++
      H264Encode.annexB(Seq((1, 3, p2), (1, 0, b))))
    assert(frames.size === 4, "display order IDR, P1, B, P2")
    val l0refs = Array(frames(1), frames(0)) // [P1, IDR]
    val fut = frames(3)
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val (dir, (r0, m0), (_, m1)) = bMbs(mbY)(mbX)
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        val e0 = at(l0refs(r0).luma, W, H, x + m0._1 / 4, y + m0._2 / 4)
        val e1 = at(fut.luma, W, H, x + m1._1 / 4, y + m1._2 / 4)
        val expect = dir match {
          case 0 => e0
          case 1 => e1
          case _ => (e0 + e1 + 1) >> 1
        }
        assert((frames(2).luma(y * W + x) & 0xff) === expect,
          s"mb($mbX,$mbY) dir $dir r0 $r0 at ($x,$y)")
      }
    }
    // dual-entropy: the CABAC twin decodes to identical pixels
    for (idc <- 0 to 2) {
      val bc = H264Encode.encodeCabacB16x16MultiRef(bMbs, 2, 1, poc = 4,
        initIdc = idc)
      val p2c = H264Encode.encodeCabacP16x16(
        Array.fill(mbH, mbW)((0, 8)), initIdc = idc, poc = 8)
      val fr = H264Decode.decodeAnnexBPictures(
        ip(3, cabac = true, idc = idc) ++
          H264Encode.annexB(Seq((1, 3, p2c), (1, 0, bc))))
      assert(fr.size === 4, s"idc $idc")
      for (k <- 0 until 4)
        assert(java.util.Arrays.equals(fr(k).luma, frames(k).luma),
          s"idc $idc frame $k")
    }
  }

  test("multi-ref explicit P weights: each reference uses ITS OWN table entry") {
    // P2 references P1 (ref 0, weight x2 via w=128 logWD 6... keep
    // moderate: w = 80, o = 3, logWD 6) and the IDR (ref 1, w = 32,
    // o = -5). Zero motion isolates the weighting arithmetic.
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient(),
      weightedPred = true, numRefFrames = 2)
    val p1 = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((8, 4)), poc = 2,
      weights = Some(H264Encode.PredWeights(6, 6,
        Seq(H264Encode.ListWeights(64, 0, 64, 0, 64, 0))))) // identity
    val wts = H264Encode.PredWeights(6, 6, Seq(
      H264Encode.ListWeights(80, 3, 64, 0, 64, 0),   // ref 0 = P1
      H264Encode.ListWeights(32, -5, 64, 0, 64, 0))) // ref 1 = IDR
    val mbs = Array.tabulate(mbH, mbW)((r, c) => ((r + c) % 2, (0, 0)))
    val p2 = H264Encode.encodeP16x16MultiRef(mbs, numRef0 = 2, poc = 4,
      weights = Some(wts))
    val frames = H264Decode.decodeAnnexBPictures(idr ++
      H264Encode.annexB(Seq((1, 3, p1), (1, 3, p2))))
    assert(frames.size === 3)
    def weighted(p: Int, w: Int, o: Int): Int =
      math.max(0, math.min(255, ((p * w + 32) >> 6) + o))
    val refs = Array(frames(1), frames(0))
    val params = Array((80, 3), (32, -5))
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val (ref, _) = mbs(mbY)(mbX)
      val (ww, oo) = params(ref)
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        val expect = weighted(at(refs(ref).luma, W, H, x, y), ww, oo)
        assert((frames(2).luma(y * W + x) & 0xff) === expect,
          s"mb($mbX,$mbY) ref $ref at ($x,$y)")
      }
    }
  }

  test("temporal direct maps the co-located reference through the col picture's own L0") {
    // decode order IDR(0), P1(2), P2(8, MULTI-REF: left half ref 0 = P1,
    // right half ref 1 = IDR, uniform mv (4,0)), B_Skip(4, temporal,
    // numRef0 = 2). Per 4x4 block the co-located P2 block's reference
    // maps to refIdxL0: poc 2 (P1) -> index 0, poc 0 (IDR) -> index 1;
    // tb/td and so DistScaleFactor DIFFER between the halves:
    //   left:  tb = 4-2 = 2, td = 8-2 = 6 -> tx = 2731, dsf = 85
    //   right: tb = 4-0 = 4, td = 8-0 = 8 -> tx = 2048, dsf = 128
    // mvCol = (4,0) -> left mvL0 = ((85*4+128)>>8, 0) = (1, 0),
    //   mvL1 = mvL0 - mvCol = (-3, 0)
    // right mvL0 = ((128*4+128)>>8, 0) = (2, 0), mvL1 = (-2, 0)
    val p2Refs = Array.tabulate(mbH, mbW)((r, c) =>
      (if (c < mbW / 2) 0 else 1, (4, 0)))
    val p2 = H264Encode.encodeP16x16MultiRef(p2Refs, numRef0 = 2, poc = 8)
    val w = new H264.BitWriter
    H264Encode.bSliceHeader(w, 26, poc = 4, spatial = false, numRef0 = 2)
    w.ue(mbW * mbH) // mb_skip_run: whole picture B_Skip
    val b = H264.ebsp(w.stop())
    val frames = H264Decode.decodeAnnexBPictures(ip(3) ++
      H264Encode.annexB(Seq((1, 3, p2), (1, 0, b))))
    assert(frames.size === 4, "display order IDR, P1, B, P2")
    val l0refs = Array(frames(1), frames(0)) // B's L0 = [P1(2), IDR(0), ...]
    val fut = frames(3)
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val (r0, dsf) = if (mbX < mbW / 2) (0, 85) else (1, 128)
      val m0x = (dsf * 4 + 128) >> 8
      val m1x = m0x - 4
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        // quarter-pel m0x/m1x: reuse the decoder-independent expectation
        // only at whole-pel-safe positions -- here mvs are fractional
        // (1 or 2 quarter-pel), so compare against a direct mcLuma call
        val e0 = {
          val t = new Array[Byte](1)
          H264Inter.mcLuma(l0refs(r0).luma, W, H * 1, t, 1, 0, 0, 1, 1,
            m0x + 4 * x, 0 + 4 * y)
          t(0) & 0xff
        }
        val e1 = {
          val t = new Array[Byte](1)
          H264Inter.mcLuma(fut.luma, W, H * 1, t, 1, 0, 0, 1, 1,
            m1x + 4 * x, 0 + 4 * y)
          t(0) & 0xff
        }
        val expect = (e0 + e1 + 1) >> 1
        assert((frames(2).luma(y * W + x) & 0xff) === expect,
          s"mb($mbX,$mbY) at ($x,$y)")
      }
    }
  }
}
