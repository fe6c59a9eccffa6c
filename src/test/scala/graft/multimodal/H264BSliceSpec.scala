package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** B-slice (bi-predictive inter) decode pins — the r9 B tier. Strategy
  * mirrors H264InterSpec's provenance posture (no reference decoder in
  * this container): the IDR and P pictures are decoded first as ground
  * truth, then B pictures predicting from them with zero residual and
  * whole-pel motion must reproduce exact, independently-computed pixel
  * expectations — L0-only == the past reference, L1-only == the future
  * reference, BiPred == their rounded average (§8.4.2.3.2) — plus the
  * CAVLC ≡ CABAC dual-entropy differential across all three
  * cabac_init_idc columns, display-order output, hand-written
  * two-partition B types, and graceful rejection of direct/skip.
  */
class H264BSliceSpec extends AnyFunSuite {

  private val mbW = 4; private val mbH = 3
  private val W = mbW * 16; private val H = mbH * 16

  private def gradient(): Array[Array[Int]] =
    Array.tabulate(mbH, mbW)((r, c) => 30 + 29 * r + 17 * c)

  /** IDR(poc 0) + P(poc 4, uniform whole-pel motion) as Annex-B. The
    * CABAC variant uses the CABAC IDR — entropy_coding_mode is a PPS
    * property, so the whole stream is one entropy tier.
    */
  private def ipStream(pMv: (Int, Int), cabac: Boolean = false,
      idc: Int = 0): Array[Byte] = {
    val (idr, _) =
      if (cabac) H264Encode.encodeCabacI16x16Dc(gradient())
      else H264Encode.encodeI16x16Dc(gradient())
    val mvs = Array.fill(mbH, mbW)(pMv)
    val p =
      if (cabac) H264Encode.encodeCabacP16x16(mvs, initIdc = idc, poc = 4)
      else H264Encode.encodeP16x16(mvs, poc = 4)
    idr ++ H264Encode.annexB(Seq((1, 3, p)))
  }

  /** The mixed-direction B picture used throughout: per-MB direction
    * cycles L0 / L1 / Bi with varied nonzero mvds (hitting the UEG3
    * prefix range and the per-list §9.3.3.1.1.7 increments).
    */
  private def mixedB(): Array[Array[(Int, (Int, Int), (Int, Int))]] =
    Array.tabulate(mbH, mbW) { (r, c) =>
      val dir = (r * mbW + c) % 3
      val m0 = (4 * ((c % 3) - 1), 4 * ((r % 2)))
      val m1 = (4 * ((r % 3) - 1), 4 * (((r + c) % 2) - 0))
      (dir, m0, m1)
    }

  /** Edge-clamped whole-pel fetch. */
  private def at(p: Array[Byte], stride: Int, h: Int, x: Int, y: Int): Int = {
    val cx = math.max(0, math.min(stride - 1, x))
    val cy = math.max(0, math.min(h - 1, y))
    p(cy * stride + cx) & 0xff
  }

  test("CAVLC B: L0 == past ref, L1 == future ref, Bi == rounded average (whole-pel motion)") {
    val b = H264Encode.encodeB16x16(mixedB())
    val stream = ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, b)))
    val frames = H264Decode.decodeAnnexBPictures(stream)
    assert(frames.size === 3, "I, B, P expected")
    val i = frames(0); val bf = frames(1); val p = frames(2)
    // display order: B (poc 2) sits between I (0) and P (4)
    val mbs = mixedB()
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val (dir, m0, m1) = mbs(mbY)(mbX)
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        val e0 = at(i.luma, W, H, x + m0._1 / 4, y + m0._2 / 4)
        val e1 = at(p.luma, W, H, x + m1._1 / 4, y + m1._2 / 4)
        val expect = dir match {
          case 0 => e0
          case 1 => e1
          case _ => (e0 + e1 + 1) >> 1
        }
        assert((bf.luma(y * W + x) & 0xff) === expect,
          s"mb($mbX,$mbY) dir $dir at ($x,$y)")
      }
    }
  }

  test("dual-entropy differential: CABAC B pixels == CAVLC B pixels, all three init idc") {
    val cavlcB = H264Encode.encodeB16x16(mixedB())
    val base = H264Decode.decodeAnnexBPictures(
      ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, cavlcB))))
    assert(base.size === 3)
    for (idc <- 0 to 2) {
      val cabacB = H264Encode.encodeCabacB16x16(mixedB(), initIdc = idc)
      val fr = H264Decode.decodeAnnexBPictures(
        ipStream((8, 4), cabac = true, idc = idc) ++
          H264Encode.annexB(Seq((1, 0, cabacB))))
      assert(fr.size === 3, s"idc $idc")
      for (k <- 0 until 3) {
        assert(java.util.Arrays.equals(fr(k).luma, base(k).luma), s"idc $idc luma $k")
        assert(java.util.Arrays.equals(fr(k).cb, base(k).cb), s"idc $idc cb $k")
        assert(java.util.Arrays.equals(fr(k).cr, base(k).cr), s"idc $idc cr $k")
      }
    }
  }

  test("display-order output: decode order I,P,B returns I,B,P; B is not used as a reference") {
    val b = H264Encode.encodeB16x16(mixedB())
    val ip = ipStream((8, 4))
    val ipFrames = H264Decode.decodeAnnexBPictures(ip)
    val ipb = H264Decode.decodeAnnexBPictures(ip ++ H264Encode.annexB(Seq((1, 0, b))))
    assert(ipFrames.size === 2 && ipb.size === 3)
    // first and last display frames are exactly the I and P of the
    // B-free stream: the non-reference B perturbed neither
    assert(java.util.Arrays.equals(ipb(0).luma, ipFrames(0).luma))
    assert(java.util.Arrays.equals(ipb(2).luma, ipFrames(1).luma))
    assert(!java.util.Arrays.equals(ipb(1).luma, ipFrames(0).luma))
  }

  test("two-partition B types (hand-written 16x8 L0/L1 and 8x16 Bi/L0) reconstruct per-partition") {
    // B_L0_L1_16x8 (mb_type 8): top half from the past ref, bottom from
    // the future; B_Bi_L0_8x16 (mb_type 17): left Bi, right L0 — one MB
    // each, remaining MBs B_L0_16x16 mv 0. All zero-mvd, zero residual.
    val w = new H264.BitWriter
    H264Encode.bSliceHeader(w, 26, 2)
    for (addr <- 0 until mbW * mbH) {
      w.ue(0) // mb_skip_run
      if (addr == 0) {
        w.ue(8) // B_L0_L1_16x8
        w.se(0); w.se(0) // mvd_l0 (top partition)
        w.se(0); w.se(0) // mvd_l1 (bottom partition)
      } else if (addr == 1) {
        w.ue(17) // B_Bi_L0_8x16
        w.se(0); w.se(0) // mvd_l0 left (Bi)
        w.se(0); w.se(0) // mvd_l0 right (L0)
        w.se(0); w.se(0) // mvd_l1 left (Bi)
      } else {
        w.ue(1) // B_L0_16x16
        w.se(0); w.se(0)
      }
      w.ue(H264Inter.cbpInterToCodeNum(0))
    }
    val b = H264.ebsp(w.stop())
    val frames = H264Decode.decodeAnnexBPictures(
      ipStream((4, 0)) ++ H264Encode.annexB(Seq((1, 0, b))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1); val p = frames(2)
    def lum(f: H264Decode.Frame, x: Int, y: Int): Int = f.luma(y * W + x) & 0xff
    for (y <- 0 until 16; x <- 0 until 16) {
      // MB 0: top 16x8 L0 == I, bottom 16x8 L1 == P
      val exp0 = if (y < 8) lum(i, x, y) else lum(p, x, y)
      assert(lum(bf, x, y) === exp0, s"mb0 ($x,$y)")
      // MB 1: left 8x16 Bi == avg, right 8x16 L0 == I
      val exp1 =
        if (x < 8) (lum(i, 16 + x, y) + lum(p, 16 + x, y) + 1) >> 1
        else lum(i, 16 + x, y)
      assert(lum(bf, 16 + x, y) === exp1, s"mb1 ($x,$y)")
    }
  }

  /** Hand-written all-B_Skip slice with direct_spatial_mv_pred_flag = 0
    * (TEMPORAL direct; bSliceHeader always writes spatial).
    */
  private def temporalSkipB(poc: Int): Array[Byte] = {
    val w = new H264.BitWriter
    w.ue(0); w.ue(6); w.ue(0) // first_mb, slice_type B, pps_id
    w.u(2, 4); w.u(poc & 15, 4) // frame_num, poc
    w.flag(false) // direct_spatial_mv_pred_flag = 0 (TEMPORAL)
    w.flag(false); w.flag(false); w.flag(false) // override, mod l0, mod l1
    w.se(0); w.ue(1) // qp delta, deblock off
    w.ue(mbW * mbH) // mb_skip_run = whole picture
    H264.ebsp(w.stop())
  }

  test("temporal direct: DistScaleFactor halves the co-located pan into symmetric L0/L1 halves") {
    // col P carries uniform mv (8,4); tb = 2−0 = 2, td = 4−0 = 4 →
    // tx = (16384+2)/4 = 4096, DSF = (2·4096+32)>>6 = 128 →
    // mvL0 = ((128·mv + 128)>>8) = (4,2), mvL1 = mvL0 − mvCol = (−4,−2).
    // Expected B = rounded average of MC(I,(4,2)) and MC(P,(−4,−2)) —
    // the MC primitives are pinned independently (H264InterSpec), so
    // this asserts the §8.4.1.2.3 derivation itself.
    val frames = H264Decode.decodeAnnexBPictures(
      ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, temporalSkipB(2)))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1); val p = frames(2)
    val e0 = new Array[Byte](W * H); val e1 = new Array[Byte](W * H)
    H264Inter.mcLuma(i.luma, W, H, e0, W, 0, 0, W, H, 4, 2)
    H264Inter.mcLuma(p.luma, W, H, e1, W, 0, 0, W, H, -4, -2)
    for (k <- 0 until W * H)
      assert((bf.luma(k) & 0xff) ===
        (((e0(k) & 0xff) + (e1(k) & 0xff) + 1) >> 1), s"luma $k")
  }

  /** The mixed B_8x8 layout used by the r10 sub-partition tests: sub
    * types cycle over all 12 non-direct Table 7-18 entries across the
    * picture, whole-pel mvs varied per (sub-block, sub-partition).
    */
  private def mixed8x8(): Array[Array[Seq[(Int, Seq[((Int, Int), (Int, Int))])]]] =
    Array.tabulate(mbH, mbW) { (r, c) =>
      val m = r * mbW + c
      (0 until 4).map { i =>
        val t = 1 + ((m * 4 + i) % 12)
        val (n, _, _, _) = H264Decode.bSubMbInfo(t)
        val mvs = (0 until n).map { j =>
          ((4 * ((j % 3) - 1), 4 * (i % 2)),
            (4 * (((i + j) % 3) - 1), 4 * ((r + j) % 2)))
        }
        (t, mvs)
      }
    }

  test("CAVLC B_8x8: every sub-partition reconstructs from its own list/mv (all 12 sub types)") {
    val stream = ipStream((8, 4)) ++
      H264Encode.annexB(Seq((1, 0, H264Encode.encodeB8x8(mixed8x8()))))
    val frames = H264Decode.decodeAnnexBPictures(stream)
    assert(frames.size === 3, "I, B, P expected")
    val i = frames(0); val bf = frames(1); val p = frames(2)
    val mbs = mixed8x8()
    for (mbY <- 0 until mbH; mbX <- 0 until mbW; si <- 0 until 4) {
      val (t, mvs) = mbs(mbY)(mbX)(si)
      val (n, dir, sw, sh) = H264Decode.bSubMbInfo(t)
      H264Decode.bSubPartOffsets(n, sw, sh).zipWithIndex.foreach {
        case ((sx, sy), j) =>
          val px = mbX * 16 + ((si % 2) * 2 + sx) * 4
          val py = mbY * 16 + ((si / 2) * 2 + sy) * 4
          val (m0, m1) = mvs(j)
          for (dy <- 0 until sh * 4; dx <- 0 until sw * 4) {
            val x = px + dx; val y = py + dy
            val e0 = at(i.luma, W, H, x + m0._1 / 4, y + m0._2 / 4)
            val e1 = at(p.luma, W, H, x + m1._1 / 4, y + m1._2 / 4)
            val expect = dir match {
              case 0 => e0
              case 1 => e1
              case _ => (e0 + e1 + 1) >> 1
            }
            assert((bf.luma(y * W + x) & 0xff) === expect,
              s"mb($mbX,$mbY) sub $si type $t part $j at ($x,$y)")
          }
      }
    }
  }

  test("dual-entropy differential: CABAC B_8x8 pixels == CAVLC B_8x8 pixels, all three init idc") {
    val base = H264Decode.decodeAnnexBPictures(ipStream((8, 4)) ++
      H264Encode.annexB(Seq((1, 0, H264Encode.encodeB8x8(mixed8x8())))))
    assert(base.size === 3)
    for (idc <- 0 to 2) {
      val fr = H264Decode.decodeAnnexBPictures(
        ipStream((8, 4), cabac = true, idc = idc) ++
          H264Encode.annexB(Seq((1, 0,
            H264Encode.encodeCabacB8x8(mixed8x8(), initIdc = idc)))))
      assert(fr.size === 3, s"idc $idc")
      for (k <- 0 until 3) {
        assert(java.util.Arrays.equals(fr(k).luma, base(k).luma), s"idc $idc luma $k")
        assert(java.util.Arrays.equals(fr(k).cb, base(k).cb), s"idc $idc cb $k")
        assert(java.util.Arrays.equals(fr(k).cr, base(k).cr), s"idc $idc cr $k")
      }
    }
  }

  test("B_8x8 sub-partition median: mid-MB undecoded above-right C falls back to D (hand-computed)") {
    // MB 0, sub-block 0 = B_L0_4x4 with mvs (24,0) (16,0) (8,0) and a
    // ZERO mvd on block (1,1), whose above-right C is block (2,0) —
    // sub-block 1, NOT yet decoded. §6.4.11.7: C unavailable → D
    // (block (0,0), mv 24) substitutes → median(8, 16, 24) = 16. A
    // per-MB availability model would read C as an in-MB (0,0,−1)
    // phantom and predict median(8, 16, 0) = 8 — two pixels apart.
    val w = new H264.BitWriter
    H264Encode.bSliceHeader(w, 26, 2)
    w.ue(0); w.ue(22) // mb_skip_run, mb_type B_8x8
    w.ue(10); w.ue(1); w.ue(1); w.ue(1) // sub types: L0_4x4, then L0_8x8 ×3
    // L0 mvds, decode order — hand-derived predictions in comments
    w.se(24); w.se(0) // (0,0): pred (0,0)   -> mv (24,0)
    w.se(-8); w.se(0) // (1,0): pred (24,0) (rule 1: only A) -> (16,0)
    w.se(-8); w.se(0) // (0,1): pred (16,0) (median 0,24,16) -> (8,0)
    w.se(0); w.se(0)  // (1,1): pred (16,0) (median 8,16,D=24) -> (16,0)
    w.se(-8); w.se(0) // sub 1 8x8: pred (16,0) (rule 1: only A) -> (8,0)
    w.se(0); w.se(0)  // sub 2 8x8: pred (8,0) (median 0,8,8)   -> (8,0)
    w.se(0); w.se(0)  // sub 3 8x8: pred (8,0) (median 8,8,16)  -> (8,0)
    w.ue(H264Inter.cbpInterToCodeNum(0))
    w.ue(mbW * mbH - 1) // remaining MBs: B_Skip
    val b = H264.ebsp(w.stop())
    val frames = H264Decode.decodeAnnexBPictures(
      ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, b))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1)
    val mvOf = Map((0, 0) -> 24, (1, 0) -> 16, (0, 1) -> 8, (1, 1) -> 16,
      (2, 0) -> 8, (3, 0) -> 8, (2, 1) -> 8, (3, 1) -> 8,
      (0, 2) -> 8, (1, 2) -> 8, (0, 3) -> 8, (1, 3) -> 8,
      (2, 2) -> 8, (3, 2) -> 8, (2, 3) -> 8, (3, 3) -> 8)
    for (((x4, y4), mv) <- mvOf; dy <- 0 until 4; dx <- 0 until 4) {
      val x = x4 * 4 + dx; val y = y4 * 4 + dy
      assert((bf.luma(y * W + x) & 0xff) === at(i.luma, W, H, x + mv / 4, y),
        s"block ($x4,$y4) mv $mv at ($x,$y)")
    }
  }

  test("B_Direct_8x8 inside B_8x8: spatial zero-prediction corner == Bi average of both refs") {
    // MB 0: sub 0 DIRECT (corner MB: no neighbors reference either
    // list → directZeroPrediction, Bi, mv 0 — col P pan (8,4) keeps
    // colZeroFlag false, changing nothing), subs 1..3 B_L0_8x8 with
    // zero mvd cascading the direct region's zero motion.
    val w = new H264.BitWriter
    H264Encode.bSliceHeader(w, 26, 2)
    w.ue(0); w.ue(22)
    w.ue(0); w.ue(1); w.ue(1); w.ue(1) // sub types: Direct, L0_8x8 ×3
    w.se(0); w.se(0) // sub 1: pred (0,0) via rule 1 (A = direct region)
    w.se(0); w.se(0) // sub 2: pred (0,0)
    w.se(0); w.se(0) // sub 3: pred (0,0)
    w.ue(H264Inter.cbpInterToCodeNum(0))
    w.ue(mbW * mbH - 1)
    val b = H264.ebsp(w.stop())
    val frames = H264Decode.decodeAnnexBPictures(
      ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, b))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1); val p = frames(2)
    for (y <- 0 until 16; x <- 0 until 16) {
      val e =
        if (x < 8 && y < 8) // the direct 8x8: rounded Bi average
          ((i.luma(y * W + x) & 0xff) + (p.luma(y * W + x) & 0xff) + 1) >> 1
        else i.luma(y * W + x) & 0xff // L0, mv 0
      assert((bf.luma(y * W + x) & 0xff) === e, s"($x,$y)")
    }
  }

  test("B_Direct_8x8 inside B_8x8: temporal direct scales the co-located pan per 4x4") {
    // same layout, direct_spatial_mv_pred_flag = 0: the direct 8x8
    // derives mvL0 (4,2) / mvL1 (−4,−2) from the col P's (8,4) pan
    // (tb 2, td 4 → DSF 128 — the q151-era derivation, now at
    // sub-block granularity). Subs 1..3 cascade (4,2) via L0 medians.
    val w = new H264.BitWriter
    H264Encode.bSliceHeader(w, 26, 2, spatial = false)
    w.ue(0); w.ue(22)
    w.ue(0); w.ue(1); w.ue(1); w.ue(1)
    w.se(0); w.se(0); w.se(0); w.se(0); w.se(0); w.se(0)
    w.ue(H264Inter.cbpInterToCodeNum(0))
    w.ue(mbW * mbH - 1)
    val b = H264.ebsp(w.stop())
    val frames = H264Decode.decodeAnnexBPictures(
      ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, b))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1); val p = frames(2)
    val e0 = new Array[Byte](W * H); val e1 = new Array[Byte](W * H)
    H264Inter.mcLuma(i.luma, W, H, e0, W, 0, 0, W, H, 4, 2)
    H264Inter.mcLuma(p.luma, W, H, e1, W, 0, 0, W, H, -4, -2)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((bf.luma(y * W + x) & 0xff) ===
        (((e0(y * W + x) & 0xff) + (e1(y * W + x) & 0xff) + 1) >> 1),
        s"direct ($x,$y)")
    // subs 1..3: L0 with mv (4,2) (rule-1/median cascade off the
    // temporal-direct region) — quarter-pel MC from the I frame
    for (y <- 0 until 16; x <- 0 until 16 if x >= 8 || y >= 8)
      assert((bf.luma(y * W + x) & 0xff) === (e0(y * W + x) & 0xff),
        s"L0 ($x,$y)")
  }

  test("graceful rejection: malformed B sub_mb_type ends the picture sequence") {
    val w = new H264.BitWriter
    H264Encode.bSliceHeader(w, 26, 2)
    w.ue(0); w.ue(22)
    w.ue(13); w.ue(1); w.ue(1); w.ue(1) // sub_mb_type 13: invalid
    val frames = H264Decode.decodeAnnexBPictures(
      ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, H264.ebsp(w.stop())))))
    assert(frames.size === 2, "I and P survive; the malformed B drops")
  }

  test("multi-GOP stream: each IDR starts a new CVS — per-GOP display order, DPB flushed") {
    // two complete I-B-P GOPs back to back. A raw-lsb global sort would
    // interleave them (I1,I2,B1,B2,P1,P2) and the un-flushed DPB would
    // reject GOP 2's B (refs straddling the IDR); per-CVS ordering must
    // reproduce each GOP's solo decode, in stream order.
    val b1 = H264Encode.encodeB16x16(mixedB())
    val gop1 = ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, b1)))
    val g2 = Array.tabulate(mbH, mbW)((r, c) => 200 - 23 * r - 11 * c)
    val (idr2, _) = H264Encode.encodeI16x16Dc(g2)
    val p2 = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((4, 8)), poc = 4)
    val gop2 = idr2 ++ H264Encode.annexB(Seq((1, 3, p2))) ++
      H264Encode.annexB(Seq((1, 0, H264Encode.encodeB16x16(mixedB()))))
    val solo1 = H264Decode.decodeAnnexBPictures(gop1)
    val solo2 = H264Decode.decodeAnnexBPictures(gop2)
    val both = H264Decode.decodeAnnexBPictures(gop1 ++ gop2, maxFrames = 8)
    assert(solo1.size === 3 && solo2.size === 3 && both.size === 6)
    for (k <- 0 until 3) {
      assert(java.util.Arrays.equals(both(k).luma, solo1(k).luma), s"gop1 frame $k")
      assert(java.util.Arrays.equals(both(k + 3).luma, solo2(k).luma), s"gop2 frame $k")
    }
  }

  test("poc-lsb wraparound inside a GOP: ordered by derived PicOrderCnt, not raw lsb") {
    // 4-bit poc lsb (modulus 16): P pocs 4,8,12,16(→lsb 0),20(→lsb 4).
    // A raw-lsb sort would move the wrapped pictures to the FRONT; the
    // §8.2.1.1 msb derivation keeps them last. The full decode's first
    // four display frames must equal the pre-wrap prefix decode.
    val mv = Array.fill(mbH, mbW)((8, 4))
    val ps = Seq(4, 8, 12, 16, 20).map(p => H264Encode.encodeP16x16(mv, poc = p))
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient())
    val full = idr ++ H264Encode.annexB(ps.map(p => (1, 3, p)))
    val prefix = idr ++ H264Encode.annexB(ps.take(3).map(p => (1, 3, p)))
    val fFull = H264Decode.decodeAnnexBPictures(full, maxFrames = 8)
    val fPre = H264Decode.decodeAnnexBPictures(prefix, maxFrames = 8)
    assert(fFull.size === 6 && fPre.size === 4)
    for (k <- 0 until 4)
      assert(java.util.Arrays.equals(fFull(k).luma, fPre(k).luma), s"frame $k")
    // each P pans the gradient again — successive display frames differ
    for (k <- 1 until 6)
      assert(!java.util.Arrays.equals(fFull(k).luma, fFull(k - 1).luma),
        s"frame $k vs ${k - 1}")
  }

  test("graceful rejection: B before two refs, B poc outside ref window") {
    val ip = ipStream((4, 0))
    // B with only one reference picture decoded → rejected
    val (idrOnly, _) = H264Encode.encodeI16x16Dc(gradient())
    val bOk = H264Encode.encodeB16x16(mixedB())
    assert(H264Decode.decodeAnnexBPictures(
      idrOnly ++ H264Encode.annexB(Seq((1, 0, bOk)))).size === 1)
    // B whose poc is NOT between the two refs' pocs → rejected
    val bLate = H264Encode.encodeB16x16(mixedB(), poc = 9)
    assert(H264Decode.decodeAnnexBPictures(
      ip ++ H264Encode.annexB(Seq((1, 0, bLate)))).size === 2)
  }

  test("all-B_Skip frame: spatial direct with no motion neighbors == rounded average of both refs") {
    // no MB in the skip frame has explicit motion, so MB 0 takes
    // directZeroPrediction (both lists, zero mv) and every later MB's
    // A/B/C neighbors are zero-motion refIdx-0 blocks → zero medians:
    // the whole picture must equal the (I + P + 1) >> 1 average,
    // regardless of the large P pan (|mv| > 1 keeps colZeroFlag false,
    // which changes nothing — the spatial mvs are already zero)
    val b = H264Encode.encodeBSkipFrame(mbW, mbH)
    val frames = H264Decode.decodeAnnexBPictures(
      ipStream((8, 4)) ++ H264Encode.annexB(Seq((1, 0, b))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1); val p = frames(2)
    for (k <- 0 until W * H)
      assert((bf.luma(k) & 0xff) ===
        (((i.luma(k) & 0xff) + (p.luma(k) & 0xff) + 1) >> 1), s"luma $k")
    for (k <- 0 until (W / 2) * (H / 2)) {
      assert((bf.cb(k) & 0xff) ===
        (((i.cb(k) & 0xff) + (p.cb(k) & 0xff) + 1) >> 1), s"cb $k")
      assert((bf.cr(k) & 0xff) ===
        (((i.cr(k) & 0xff) + (p.cr(k) & 0xff) + 1) >> 1), s"cr $k")
    }
    // CABAC all-B_Skip decodes to the identical picture, all three idc
    for (idc <- 0 to 2) {
      val cb = H264Encode.encodeCabacBSkipFrame(mbW, mbH, initIdc = idc)
      val cf = H264Decode.decodeAnnexBPictures(
        ipStream((8, 4), cabac = true, idc = idc) ++
          H264Encode.annexB(Seq((1, 0, cb))))
      assert(cf.size === 3, s"idc $idc")
      assert(java.util.Arrays.equals(cf(1).luma, bf.luma), s"idc $idc")
    }
  }

  test("B_Direct colZeroFlag: co-located small motion zeroes the spatial-median mv, large motion keeps it") {
    // hand-written B: row 0 = explicit B_L0_16x16 with mv (8,0) (mvd
    // (8,0) on the first MB, 0 after — left-neighbor prediction);
    // rows 1+ = B_Direct_16x16, zero residual. The direct MBs' spatial
    // derivation gives refIdxL0 = 0 (row-0 neighbors), refIdxL1 = -1,
    // median mv (8,0). colZeroFlag then decides per sub-block:
    //  - col P motion (8,0): |mv| > 1 → flag false → direct mv stays
    //    (8,0) → direct rows equal I shifted left by 2 integer pels;
    //  - col P motion (1,1): |mv| <= 1 both comps → flag true → direct
    //    mv forced (0,0) → direct rows equal I exactly.
    def bMixed(): Array[Byte] = {
      val w = new H264.BitWriter
      H264Encode.bSliceHeader(w, 26, 2)
      for (addr <- 0 until mbW * mbH) {
        w.ue(0) // mb_skip_run
        if (addr < mbW) {
          w.ue(1) // B_L0_16x16
          if (addr == 0) { w.se(8); w.se(0) } else { w.se(0); w.se(0) }
          w.ue(H264Inter.cbpInterToCodeNum(0))
        } else {
          w.ue(0) // B_Direct_16x16
          w.ue(H264Inter.cbpInterToCodeNum(0))
        }
      }
      H264.ebsp(w.stop())
    }
    def at(f: H264Decode.Frame, x: Int, y: Int): Int = {
      val cx = math.max(0, math.min(W - 1, x))
      f.luma(y * W + cx) & 0xff
    }
    for ((pMv, zeroed) <- Seq(((8, 0), false), ((1, 1), true))) {
      val frames = H264Decode.decodeAnnexBPictures(
        ipStream(pMv) ++ H264Encode.annexB(Seq((1, 0, bMixed()))))
      assert(frames.size === 3, s"pMv $pMv")
      val i = frames(0); val bf = frames(1)
      for (y <- 16 until H; x <- 0 until W) {
        val expect = if (zeroed) at(i, x, y) else at(i, x + 2, y)
        assert((bf.luma(y * W + x) & 0xff) === expect,
          s"pMv $pMv direct pixel ($x,$y)")
      }
    }
  }

  test("CABAC B_Direct matches CAVLC B_Direct pixels (shared derivation, distinct entropy paths)") {
    // same mixed layout as the colZero test, emitted through the CABAC
    // syntax (skip 0, mb_type 0 escape, cbp 0) by hand
    def bMixedCabac(idc: Int): Array[Byte] = {
      val w = new H264.BitWriter
      H264Encode.bSliceHeader(w, 26, 2, cabacInitIdc = idc)
      w.alignOne()
      val e = new H264Cabac.Encoder(w,
        new H264Cabac.Contexts(26, H264Cabac.ctxInitP(idc)))
      val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
      val grid0 = new H264Inter.MvGrid(mbW, mbH)
      for (addr <- 0 until mbW * mbH) {
        val mbX = addr % mbW; val mbY = addr / mbW
        H264Cabac.encodeMbSkipB(e, cc.skipCond(mbX, mbY), 0)
        grid0.markMb(addr)
        if (addr < mbW) {
          H264Cabac.encodeMbTypeB(e, cc.bTypeCond(mbX, mbY), 1)
          cc.markInter(addr)
          val (px, py) = grid0.mvPred(mbX * 4, mbY * 4, 4, 4, 0)
          val mvdX = 8 - px; val mvdY = 0 - py
          H264Cabac.encodeMvd(e, 0, cc.mvdInc(0, 0, mbX * 4, mbY * 4), mvdX)
          H264Cabac.encodeMvd(e, 1, cc.mvdInc(0, 1, mbX * 4, mbY * 4), mvdY)
          cc.setMvd(0, mbX * 4, mbY * 4, 4, 4, mvdX, mvdY)
          grid0.set(mbX * 4, mbY * 4, 4, 4, 8, 0, 0)
        } else {
          H264Cabac.encodeMbTypeB(e, cc.bTypeCond(mbX, mbY), 0)
          cc.markDirect(addr)
          // the decoder's direct derivation stores (8,0) refIdx-0 into
          // its grid; replay that so later explicit MBs (none here)
          // and ctx conditions stay aligned
          grid0.set(mbX * 4, mbY * 4, 4, 4, 8, 0, 0)
        }
        H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY), cc.cbpOf(mbX, mbY - 1), 0)
        cc.cbp(addr) = 0
        cc.prevQpDeltaNZ = false
        e.terminate(if (addr == mbW * mbH - 1) 1 else 0)
      }
      H264.ebsp(w.stop())
    }
    val cavlcFrames = H264Decode.decodeAnnexBPictures(
      ipStream((8, 0)) ++ H264Encode.annexB(Seq((1, 0, {
        val w = new H264.BitWriter
        H264Encode.bSliceHeader(w, 26, 2)
        for (addr <- 0 until mbW * mbH) {
          w.ue(0)
          if (addr < mbW) {
            w.ue(1)
            if (addr == 0) { w.se(8); w.se(0) } else { w.se(0); w.se(0) }
            w.ue(H264Inter.cbpInterToCodeNum(0))
          } else { w.ue(0); w.ue(H264Inter.cbpInterToCodeNum(0)) }
        }
        H264.ebsp(w.stop())
      }))))
    assert(cavlcFrames.size === 3)
    for (idc <- 0 to 2) {
      val fr = H264Decode.decodeAnnexBPictures(
        ipStream((8, 0), cabac = true, idc = idc) ++
          H264Encode.annexB(Seq((1, 0, bMixedCabac(idc)))))
      assert(fr.size === 3, s"idc $idc")
      assert(java.util.Arrays.equals(fr(1).luma, cavlcFrames(1).luma),
        s"idc $idc B luma")
    }
  }

  test("CABAC B truncation rejects instead of fabricating macroblocks") {
    val cabacB = H264Encode.encodeCabacB16x16(mixedB(), initIdc = 1)
    val whole = ipStream((8, 4), cabac = true, idc = 1)
    val full = H264Decode.decodeAnnexBPictures(
      whole ++ H264Encode.annexB(Seq((1, 0, cabacB))))
    assert(full.size === 3)
    val cut = cabacB.take(cabacB.length / 2)
    val trunc = H264Decode.decodeAnnexBPictures(
      whole ++ H264Encode.annexB(Seq((1, 0, cut))))
    assert(trunc.size === 2, "truncated B must reject, keeping I+P")
  }
}
