package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** r12: MULTI-SLICE pictures + P_8x8 sub-partitions.
  *
  * Pinning strategy: (1) slice-boundary availability is pinned with
  * HAND-COMPUTED expectations (a slice's first MB must predict from
  * 128 / fall back exactly as §6.4 derives with other-slice MBs
  * unavailable) — the r10 lesson that round-trips alone cannot catch
  * availability bugs when encoder and decoder share the derivation;
  * (2) P_8x8 pixels are asserted against INDEPENDENT per-sub-partition
  * motion compensation computed in this file from the decoded IDR;
  * (3) both entropy codings must produce identical pixels from the
  * same logical content; (4) single-slice vs multi-slice re-encodes of
  * the same means must DIFFER (availability is load-bearing).
  */
class H264MultiSliceSpec extends AnyFunSuite {

  private def gradient(mbW: Int, mbH: Int, seed: Int = 5): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(mbH, mbW)((y, x) => 40 + 12 * x + 18 * y + rnd.nextInt(9))
  }

  test("multi-slice I picture: recon == decode in BOTH entropy modes; slice-boundary MBs predict from 128") {
    val means = gradient(4, 4)
    for (cabac <- Seq(false, true); starts <- Seq(Seq(0, 8), Seq(0, 5, 11))) {
      val (stream, recon) =
        H264Encode.encodeI16x16DcSlices(means, qp = 20, starts, cabac)
      val f = H264Decode.decodeIdrFrame(stream)
      assert(f.nonEmpty, s"decode failed (cabac $cabac starts $starts)")
      for (mbY <- 0 until 4; mbX <- 0 until 4)
        assert((f.get.luma(mbY * 16 * 64 + mbX * 16) & 0xff) == recon(mbY)(mbX),
          s"MB ($mbX,$mbY) cabac $cabac starts $starts")
    }
  }

  test("slice-boundary availability hand pin: a leaky decoder reconstructs 200, a correct one exactly 128") {
    // rows 0..1 bright (200), rows 2..3 exactly 128, slice 2 starts at
    // row 2. The slice-aware encoder's pred for every slice-2 MB is
    // 128 (no cross-slice neighbors; then flat propagation), so it
    // emits DC level 0 throughout slice 2 — the decoded pixels there
    // are EXACTLY pred + pixelDelta(0). A decoder that leaks slice-1
    // availability predicts ~200 from the bright row above and
    // reconstructs ~200 from the same bits. Bit-exact, independent of
    // the shared search logic.
    val means = Array.tabulate(4, 4)((y, _) => if (y < 2) 200 else 128)
    for (cabac <- Seq(false, true)) {
      val (stream, _) =
        H264Encode.encodeI16x16DcSlices(means, qp = 20, Seq(0, 8), cabac)
      val f = H264Decode.decodeIdrFrame(stream).get
      for (y <- 32 until 64; x <- 0 until 64)
        assert((f.luma(y * 64 + x) & 0xff) == 128,
          s"($x,$y) cabac $cabac: slice-2 must reconstruct exactly 128")
      assert((f.luma(0) & 0xff) > 190, "slice 1 stays bright")
    }
  }

  import H264Encode.P8x8Mb

  /** IDR + one all-P_8x8 picture; returns (stream bytes, idr frame). */
  private def gop(mbs: Array[Array[P8x8Mb]], cabac: Boolean,
      pSliceStarts: Seq[Int] = Seq(0),
      iSliceStarts: Seq[Int] = Seq(0)): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    val means = gradient(mbW, mbH, seed = 31)
    // build the IDR with the same entropy mode (decoder requires one
    // PPS per stream)
    val w = mbW * 16; val h = mbH * 16
    val iNals = {
      val (str, _) = H264Encode.encodeI16x16DcSlices(means, 24,
        iSliceStarts, cabac)
      // strip SPS/PPS: re-emit below
      H264.nalUnitsAnnexB(str).filter(_.nalType == 5).map(_.payload)
    }
    val pNals = H264Encode.encodeP8x8Slices(mbs, qp = 26, poc = 2,
      sliceStarts = pSliceStarts, cabac = cabac)
    H264Encode.annexB(
      Seq((7, 3, H264.writeSps(w, h)), (8, 3, H264.writePps(cabac = cabac))) ++
        iNals.map(p => (5, 3, p)) ++ pNals.map(p => (1, 3, p)))
  }

  private def rndMbs(mbW: Int, mbH: Int, seed: Int): Array[Array[P8x8Mb]] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(mbH, mbW) { (_, _) =>
      val sub = Seq.fill(4)(rnd.nextInt(4))
      val n = sub.map(Seq(1, 2, 2, 4)).sum
      P8x8Mb(sub, Seq.fill(n)((rnd.nextInt(17) - 8, rnd.nextInt(13) - 6)))
    }
  }

  test("P_8x8: decoded pixels match INDEPENDENT per-sub-partition MC, both entropy modes") {
    val mbW = 3; val mbH = 3
    val mbs = rndMbs(mbW, mbH, 7)
    for (cabac <- Seq(false, true)) {
      val frames = H264Decode.decodeAnnexBPictures(gop(mbs, cabac), 2)
      assert(frames.size == 2, s"cabac $cabac")
      val idr = frames(0); val p = frames(1)
      // independent expectation: replay the mv derivation through a
      // FRESH grid (the shared-class twin) but apply MC with the
      // stand-alone mcLuma against the decoded IDR — pixel arithmetic
      // and partition geometry verified end to end
      val grid = new H264Inter.MvGrid(mbW, mbH)
      val expect = new Array[Byte](idr.luma.length)
      for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
        grid.markMb(mbY * mbW + mbX)
        val mb = mbs(mbY)(mbX)
        var mvIdx = 0
        for (i <- 0 until 4) {
          val ox = (i % 2) * 2; val oy = (i / 2) * 2
          val (n, sw, sh) = H264Decode.pSubMbInfo(mb.subTypes(i))
          H264Decode.bSubPartOffsets(n, sw, sh).foreach { case (sx, sy) =>
            val x4 = mbX * 4 + ox + sx; val y4 = mbY * 4 + oy + sy
            val (mx, my) = mb.mvs(mvIdx); mvIdx += 1
            grid.set(x4, y4, sw, sh, mx, my, 0)
            H264Inter.mcLuma(idr.luma, idr.lumaStride, mbH * 16,
              expect, idr.lumaStride, x4 * 4, y4 * 4, sw * 4, sh * 4, mx, my)
          }
        }
      }
      assert(p.luma.toSeq == expect.toSeq, s"cabac $cabac")
    }
  }

  test("P_8x8 cross-entropy: CAVLC and CABAC encodes of the same motion decode to identical pixels") {
    val mbs = rndMbs(3, 2, 11)
    val a = H264Decode.decodeAnnexBPictures(gop(mbs, cabac = false), 2)
    val b = H264Decode.decodeAnnexBPictures(gop(mbs, cabac = true), 2)
    assert(a.size == 2 && b.size == 2)
    assert(a(1).luma.toSeq == b(1).luma.toSeq)
    assert(a(1).cb.toSeq == b(1).cb.toSeq)
    // and the coded bytes differ (different entropy tiers)
    assert(gop(mbs, cabac = false).toSeq != gop(mbs, cabac = true).toSeq)
  }

  test("multi-slice P_8x8: slice-boundary mvPred ignores the previous slice (hand pin)") {
    // 2x2 MBs, slice 2 starts at MB 2 (row 1). MB 2's first
    // sub-partition has NO available neighbors in its slice → its mv
    // prediction is (0,0), so mv == mvd: plant mv (8, 4) and verify
    // the decoded pixels equal MC by exactly (8, 4) — if the decoder
    // leaked slice-1 availability, the median would differ and the
    // pixels would shift
    val mbW = 2; val mbH = 2
    val mv = (8, 4)
    val mbs = Array.tabulate(mbH, mbW)((_, _) =>
      P8x8Mb(Seq(0, 0, 0, 0), Seq.fill(4)(mv)))
    for (cabac <- Seq(false, true)) {
      val frames = H264Decode.decodeAnnexBPictures(
        gop(mbs, cabac, pSliceStarts = Seq(0, 2)), 2)
      assert(frames.size == 2, s"cabac $cabac")
      val idr = frames(0); val p = frames(1)
      val expect = new Array[Byte](idr.luma.length)
      for (mbY <- 0 until mbH; mbX <- 0 until mbW)
        H264Inter.mcLuma(idr.luma, idr.lumaStride, mbH * 16,
          expect, idr.lumaStride, mbX * 16, mbY * 16, 16, 16, mv._1, mv._2)
      assert(p.luma.toSeq == expect.toSeq, s"cabac $cabac")
    }
    // multi-slice I + multi-slice P in ONE stream also decodes
    val both = H264Decode.decodeAnnexBPictures(
      gop(mbs, cabac = true, pSliceStarts = Seq(0, 2), iSliceStarts = Seq(0, 2)), 2)
    assert(both.size == 2)
  }

  test("malformed multi-slice input rejects: overlapping or out-of-range first_mb") {
    val means = gradient(2, 2)
    val (stream, _) = H264Encode.encodeI16x16DcSlices(means, 20, Seq(0, 2))
    // corrupt the second slice's first_mb_in_slice to an absurd value:
    // decoding must not throw and must not return a full frame claiming
    // completeness it doesn't have — decodeIdrFrame returns None/Some
    // without crashing under header bit flips
    val nals = H264.nalUnitsAnnexB(stream)
    assert(nals.count(_.nalType == 5) == 2)
    var crashes = 0
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 100) {
      val m = stream.clone()
      val i = m.length - 1 - rnd.nextInt(m.length / 2)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      try H264Decode.decodeIdrFrame(m)
      catch { case _: Throwable => crashes += 1 }
    }
    assert(crashes == 0, s"$crashes uncaught throws under slice corruption")
  }
}
