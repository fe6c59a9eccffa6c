package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Weighted-prediction pins (the r10 tier, §8.4.2.3): explicit P
  * pred_weight_table (weighted_pred_flag), explicit B tables
  * (weighted_bipred_idc 1) and implicit POC-derived B weights (idc 2).
  * Provenance posture as the B tier: references decode first as ground
  * truth, weighted pictures must reproduce exact per-pixel expectations
  * computed independently from the §8.4.2.3.2/.3.3 formulas, plus the
  * CAVLC ≡ CABAC differential (the table is slice-header Exp-Golomb,
  * shared by both entropy tiers — the differential certifies the MC
  * paths compose with weighting identically).
  */
class H264WeightedPredSpec extends AnyFunSuite {

  private val mbW = 4; private val mbH = 3
  private val W = mbW * 16; private val H = mbH * 16

  private def gradient(): Array[Array[Int]] =
    Array.tabulate(mbH, mbW)((r, c) => 30 + 29 * r + 17 * c)

  private def at(p: Array[Byte], stride: Int, h: Int, x: Int, y: Int): Int = {
    val cx = math.max(0, math.min(stride - 1, x))
    val cy = math.max(0, math.min(h - 1, y))
    p(cy * stride + cx) & 0xff
  }

  private def clip(v: Int): Int = math.max(0, math.min(255, v))

  /** §8.4.2.3.3 single-list explicit formula. */
  private def wp(p: Int, w: Int, o: Int, lwd: Int): Int =
    clip(if (lwd >= 1) ((p * w + (1 << (lwd - 1))) >> lwd) + o else p * w + o)

  /** §8.4.2.3.2 weighted-bi formula. */
  private def wbi(p0: Int, p1: Int, w0: Int, w1: Int, o0: Int, o1: Int,
      lwd: Int): Int =
    clip(((p0 * w0 + p1 * w1 + (1 << lwd)) >> (lwd + 1)) + ((o0 + o1 + 1) >> 1))

  private val pWeights = H264Encode.PredWeights(6, 5, Seq(
    H264Encode.ListWeights(lw = 32, lo = 16, cwCb = 16, coCb = -10,
      cwCr = 64, coCr = 0)))

  test("explicit weighted P (CAVLC): luma and chroma follow the 8.4.2.3.3 transform of the reference") {
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient(), weightedPred = true)
    val p = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((0, 0)),
      weights = Some(pWeights))
    val frames = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, p))))
    assert(frames.size === 2)
    val i = frames(0); val pf = frames(1)
    for (k <- 0 until W * H)
      assert((pf.luma(k) & 0xff) === wp(i.luma(k) & 0xff, 32, 16, 6), s"luma $k")
    for (k <- 0 until (W / 2) * (H / 2)) {
      assert((pf.cb(k) & 0xff) === wp(i.cb(k) & 0xff, 16, -10, 5), s"cb $k")
      // cr weight 64 at denom 32 doubles gray 128 -> clips at 255
      assert((pf.cr(k) & 0xff) === wp(i.cr(k) & 0xff, 64, 0, 5), s"cr $k")
    }
  }

  test("explicit weighted P: logWD 0 path multiplies without rounding shift") {
    val w0 = H264Encode.PredWeights(0, 0, Seq(
      H264Encode.ListWeights(2, -60, 1, 0, 1, 0)))
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient(), weightedPred = true)
    val p = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((0, 0)),
      weights = Some(w0))
    val frames = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, p))))
    assert(frames.size === 2)
    for (k <- 0 until W * H)
      assert((frames(1).luma(k) & 0xff) ===
        clip((frames(0).luma(k) & 0xff) * 2 - 60), s"luma $k")
  }

  test("weighted P_Skip: the skip copy runs through the same explicit weighting") {
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient(), weightedPred = true)
    val p = H264Encode.encodePSkipFrame(mbW, mbH, weights = Some(pWeights))
    val frames = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, p))))
    assert(frames.size === 2)
    for (k <- 0 until W * H)
      assert((frames(1).luma(k) & 0xff) ===
        wp(frames(0).luma(k) & 0xff, 32, 16, 6), s"luma $k")
  }

  test("dual-entropy differential: CABAC weighted P pixels == CAVLC weighted P pixels") {
    val (idrA, _) = H264Encode.encodeI16x16Dc(gradient(), weightedPred = true)
    val a = H264Decode.decodeAnnexBPictures(idrA ++ H264Encode.annexB(Seq(
      (1, 3, H264Encode.encodeP16x16(Array.fill(mbH, mbW)((8, 4)),
        weights = Some(pWeights))))))
    for (idc <- 0 to 2) {
      val (idrB, _) = H264Encode.encodeCabacI16x16Dc(gradient(), weightedPred = true)
      val b = H264Decode.decodeAnnexBPictures(idrB ++ H264Encode.annexB(Seq(
        (1, 3, H264Encode.encodeCabacP16x16(Array.fill(mbH, mbW)((8, 4)),
          initIdc = idc, weights = Some(pWeights))))))
      assert(a.size === 2 && b.size === 2, s"idc $idc")
      assert(java.util.Arrays.equals(a(1).luma, b(1).luma), s"idc $idc luma")
      assert(java.util.Arrays.equals(a(1).cb, b(1).cb), s"idc $idc cb")
      assert(java.util.Arrays.equals(a(1).cr, b(1).cr), s"idc $idc cr")
    }
  }

  /** IDR(poc 0) + P(poc 4, pan) under the given PPS weighting gates. */
  private def ipW(pMv: (Int, Int), wbIdc: Int): Array[Byte] = {
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient(),
      weightedBipredIdc = wbIdc)
    idr ++ H264Encode.annexB(Seq(
      (1, 3, H264Encode.encodeP16x16(Array.fill(mbH, mbW)(pMv), poc = 4))))
  }

  test("implicit B weights (idc 2): off-center poc scales Bi by POC distance; single-list stays unweighted") {
    // B at poc 1 between refs at 0 and 4: tb 1, td 4 -> DSF 64 ->
    // w1 = 16, w0 = 48 (8.4.2.3.1). MB directions cycle L0/L1/Bi with
    // zero motion; only the Bi MBs see the weights.
    val dirs = Array.tabulate(mbH, mbW)((r, c) =>
      ((r * mbW + c) % 3, (0, 0), (0, 0)))
    val frames = H264Decode.decodeAnnexBPictures(
      ipW((8, 4), wbIdc = 2) ++
        H264Encode.annexB(Seq((1, 0, H264Encode.encodeB16x16(dirs, poc = 1)))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1); val p = frames(2)
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val dir = (mbY * mbW + mbX) % 3
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        val e0 = i.luma(y * W + x) & 0xff; val e1 = p.luma(y * W + x) & 0xff
        val expect = dir match {
          case 0 => e0 // implicit weighting does NOT touch single-list
          case 1 => e1
          case _ => wbi(e0, e1, 48, 16, 0, 0, 5)
        }
        assert((bf.luma(y * W + x) & 0xff) === expect, s"mb($mbX,$mbY) ($x,$y)")
      }
    }
  }

  test("implicit B at the temporal midpoint (poc 2): 32/32 weights reproduce the default average") {
    val bi = Array.fill(mbH, mbW)((2, (0, 0), (0, 0)))
    val weighted = H264Decode.decodeAnnexBPictures(
      ipW((8, 4), wbIdc = 2) ++
        H264Encode.annexB(Seq((1, 0, H264Encode.encodeB16x16(bi, poc = 2)))))
    val plain = H264Decode.decodeAnnexBPictures(
      ipW((8, 4), wbIdc = 0) ++
        H264Encode.annexB(Seq((1, 0, H264Encode.encodeB16x16(bi, poc = 2)))))
    assert(weighted.size === 3 && plain.size === 3)
    for (k <- 0 until 3)
      assert(java.util.Arrays.equals(weighted(k).luma, plain(k).luma), s"frame $k")
  }

  test("explicit B weights (idc 1): per-list single-list weighting + the weighted-bi combine") {
    val bw = H264Encode.PredWeights(6, 5, Seq(
      H264Encode.ListWeights(48, 4, 32, 0, 32, 0),
      H264Encode.ListWeights(16, -2, 32, 0, 32, 0)))
    val dirs = Array.tabulate(mbH, mbW)((r, c) =>
      ((r * mbW + c) % 3, (0, 0), (0, 0)))
    val frames = H264Decode.decodeAnnexBPictures(
      ipW((8, 4), wbIdc = 1) ++ H264Encode.annexB(Seq(
        (1, 0, H264Encode.encodeB16x16(dirs, poc = 2, weights = Some(bw))))))
    assert(frames.size === 3)
    val i = frames(0); val bf = frames(1); val p = frames(2)
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val dir = (mbY * mbW + mbX) % 3
      for (dy <- 0 until 16; dx <- 0 until 16) {
        val x = mbX * 16 + dx; val y = mbY * 16 + dy
        val e0 = i.luma(y * W + x) & 0xff; val e1 = p.luma(y * W + x) & 0xff
        val expect = dir match {
          case 0 => wp(e0, 48, 4, 6)
          case 1 => wp(e1, 16, -2, 6)
          case _ => wbi(e0, e1, 48, 16, 4, -2, 6)
        }
        assert((bf.luma(y * W + x) & 0xff) === expect, s"mb($mbX,$mbY) ($x,$y)")
      }
    }
  }

  test("graceful rejection: out-of-range luma_log2_weight_denom drops the picture") {
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient(), weightedPred = true)
    val w = new H264.BitWriter
    w.ue(0); w.ue(5); w.ue(0) // first_mb, slice_type P, pps_id
    w.u(1, 4); w.u(0, 4) // frame_num, poc
    w.flag(false); w.flag(false) // override, list mod
    w.ue(8) // luma_log2_weight_denom = 8: INVALID (> 7)
    val frames = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, H264.ebsp(w.stop())))))
    assert(frames.size === 1, "only the IDR survives")
  }
}
