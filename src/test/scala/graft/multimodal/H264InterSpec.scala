package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** P-slice (inter) decode pins: motion-compensated prediction against
  * IN-TEST reimplementations (integer copy, 6-tap half-pel computed in
  * the OPPOSITE separable order, Table 8-12 quarter averages), the
  * §8.4.1.3 mvp paths, P_Skip, 16x8/8x16 partitions via hand-written
  * bitstreams, multi-picture chains, and graceful rejection of
  * out-of-scope P features. Same provenance posture as H264CodecSpec:
  * no reference decoder exists in this container, so encoder↔decoder
  * round-trips + independent test math are the strongest available
  * cross-checks.
  */
class H264InterSpec extends AnyFunSuite {

  private def gradient(mbW: Int, mbH: Int): Array[Array[Int]] =
    Array.tabulate(mbH, mbW)((r, c) => 30 + 29 * r + 17 * c)

  /** IDR + the given P payloads as one Annex-B stream. */
  private def chain(mbW: Int, mbH: Int, pPayloads: Array[Byte]*): Array[Byte] = {
    val (idr, _) = H264Encode.encodeI16x16Dc(gradient(mbW, mbH))
    val ps = H264Encode.annexB(pPayloads.map(p => (1, 3, p)))
    idr ++ ps
  }

  // independent MC reimplementations ---------------------------------

  private def clamp(v: Int, lo: Int, hi: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  private def at(p: Array[Byte], stride: Int, h: Int, x: Int, y: Int): Int =
    p(clamp(y, 0, h - 1) * stride + clamp(x, 0, stride - 1)) & 0xff

  /** Integer-pel MC: shifted edge-clamped copy. */
  private def refInt(p: Array[Byte], stride: Int, h: Int,
      px: Int, py: Int, dx: Int, dy: Int): Int =
    at(p, stride, h, px + dx, py + dy)

  /** Half-pel values recomputed in the opposite separable order from the
    * decoder (vertical taps first for j) — equal by linearity iff both
    * transcriptions are right.
    */
  private def tapV(p: Array[Byte], s: Int, h: Int, x: Int, y: Int): Int =
    at(p, s, h, x, y - 2) - 5 * at(p, s, h, x, y - 1) + 20 * at(p, s, h, x, y) +
      20 * at(p, s, h, x, y + 1) - 5 * at(p, s, h, x, y + 2) + at(p, s, h, x, y + 3)
  private def refHalfH(p: Array[Byte], s: Int, h: Int, x: Int, y: Int): Int = {
    val t = at(p, s, h, x - 2, y) - 5 * at(p, s, h, x - 1, y) + 20 * at(p, s, h, x, y) +
      20 * at(p, s, h, x + 1, y) - 5 * at(p, s, h, x + 2, y) + at(p, s, h, x + 3, y)
    clamp((t + 16) >> 5, 0, 255)
  }
  private def refHalfV(p: Array[Byte], s: Int, h: Int, x: Int, y: Int): Int =
    clamp((tapV(p, s, h, x, y) + 16) >> 5, 0, 255)
  private def refHalfJ(p: Array[Byte], s: Int, h: Int, x: Int, y: Int): Int = {
    // vertical-first: 6-tap horizontally over unrounded vertical taps
    val t = tapV(p, s, h, x - 2, y) - 5 * tapV(p, s, h, x - 1, y) +
      20 * tapV(p, s, h, x, y) + 20 * tapV(p, s, h, x + 1, y) -
      5 * tapV(p, s, h, x + 2, y) + tapV(p, s, h, x + 3, y)
    clamp((t + 512) >> 10, 0, 255)
  }

  private def decodeTwo(stream: Array[Byte]): (H264Decode.Frame, H264Decode.Frame) = {
    val fs = H264Decode.decodeAnnexBPictures(stream, maxFrames = 4)
    assert(fs.size >= 2, s"expected >= 2 pictures, got ${fs.size}")
    (fs.head, fs(1))
  }

  test("P_Skip frame reproduces the reference exactly (luma + chroma)") {
    val p = H264Encode.encodePSkipFrame(3, 2)
    val (f1, f2) = decodeTwo(chain(3, 2, p))
    assert(java.util.Arrays.equals(f1.luma, f2.luma))
    assert(java.util.Arrays.equals(f1.cb, f2.cb))
    assert(java.util.Arrays.equals(f1.cr, f2.cr))
  }

  test("integer-pel P_L0_16x16: every MB equals the shifted clamped copy") {
    val (mbW, mbH) = (3, 3)
    // distinct integer vectors per MB exercise median/A-only mvp paths
    val mvs = Array.tabulate(mbH, mbW)((r, c) => ((c - 1) * 4, (r - 1) * 8))
    val p = H264Encode.encodeP16x16(mvs)
    val (f1, f2) = decodeTwo(chain(mbW, mbH, p))
    val s = f1.lumaStride; val h = mbH * 16
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val (mvx, mvy) = mvs(mbY)(mbX)
      for (y <- mbY * 16 until mbY * 16 + 16; x <- mbX * 16 until mbX * 16 + 16)
        assert((f2.luma(y * s + x) & 0xff) ==
          refInt(f1.luma, s, h, x, y, mvx >> 2, mvy >> 2), s"mb($mbX,$mbY) ($x,$y)")
      // chroma: integer luma vector = even chroma eighth-pel, fx=fy=0
      val cs = mbW * 8
      for (y <- mbY * 8 until mbY * 8 + 8; x <- mbX * 8 until mbX * 8 + 8) {
        assert((f2.cb(y * cs + x) & 0xff) ==
          refInt(f1.cb, cs, mbH * 8, x, y, mvx >> 3, mvy >> 3) ||
          (mvx % 8 != 0 || mvy % 8 != 0)) // odd chroma frac handled below
      }
    }
  }

  test("half-pel MC matches the opposite-separable-order reimplementation") {
    val (mbW, mbH) = (2, 2)
    for ((mvx, mvy) <- Seq((2, 0), (0, 2), (2, 2))) {
      val mvs = Array.fill(mbH, mbW)((mvx, mvy))
      val (f1, f2) = decodeTwo(chain(mbW, mbH, H264Encode.encodeP16x16(mvs)))
      val s = f1.lumaStride; val h = mbH * 16
      val expect: (Int, Int) => Int = (mvx, mvy) match {
        case (2, 0) => (x, y) => refHalfH(f1.luma, s, h, x, y)
        case (0, 2) => (x, y) => refHalfV(f1.luma, s, h, x, y)
        case _      => (x, y) => refHalfJ(f1.luma, s, h, x, y)
      }
      for (y <- 0 until h; x <- 0 until s)
        assert((f2.luma(y * s + x) & 0xff) == expect(x, y), s"mv($mvx,$mvy) ($x,$y)")
    }
  }

  test("quarter-pel MC equals the Table 8-12 neighbor averages") {
    val (mbW, mbH) = (2, 2)
    val s = mbW * 16; val h = mbH * 16
    // decode one stream per fractional position; expectations from the
    // independently-written averages over integer/half samples
    def run(mvx: Int, mvy: Int)(expect: (Array[Byte], Int, Int) => Int): Unit = {
      val mvs = Array.fill(mbH, mbW)((mvx, mvy))
      val (f1, f2) = decodeTwo(chain(mbW, mbH, H264Encode.encodeP16x16(mvs)))
      for (y <- 0 until h; x <- 0 until s)
        assert((f2.luma(y * s + x) & 0xff) == expect(f1.luma, x, y),
          s"mv($mvx,$mvy) ($x,$y)")
    }
    run(1, 0)((p, x, y) => (at(p, s, h, x, y) + refHalfH(p, s, h, x, y) + 1) >> 1)
    run(3, 0)((p, x, y) => (refHalfH(p, s, h, x, y) + at(p, s, h, x + 1, y) + 1) >> 1)
    run(0, 3)((p, x, y) => (refHalfV(p, s, h, x, y) + at(p, s, h, x, y + 1) + 1) >> 1)
    run(1, 1)((p, x, y) => (refHalfH(p, s, h, x, y) + refHalfV(p, s, h, x, y) + 1) >> 1)
    run(2, 1)((p, x, y) => (refHalfH(p, s, h, x, y) + refHalfJ(p, s, h, x, y) + 1) >> 1)
    run(3, 2)((p, x, y) => (refHalfJ(p, s, h, x, y) + refHalfV(p, s, h, x + 1, y) + 1) >> 1)
    run(3, 3)((p, x, y) =>
      (refHalfV(p, s, h, x + 1, y) + refHalfH(p, s, h, x, y + 1) + 1) >> 1)
  }

  test("chroma eighth-pel bilinear matches the direct formula") {
    val (mbW, mbH) = (2, 2)
    val mvs = Array.fill(mbH, mbW)((5, 3)) // fx=5, fy=3 in chroma eighths
    val (f1, f2) = decodeTwo(chain(mbW, mbH, H264Encode.encodeP16x16(mvs)))
    val cs = mbW * 8; val ch = mbH * 8
    for (y <- 0 until ch; x <- 0 until cs) {
      val a = at(f1.cb, cs, ch, x, y); val b = at(f1.cb, cs, ch, x + 1, y)
      val c = at(f1.cb, cs, ch, x, y + 1); val d = at(f1.cb, cs, ch, x + 1, y + 1)
      val want = (3 * 5 * a + 5 * 5 * b + 3 * 3 * c + 5 * 3 * d + 32) >> 6
      assert((f2.cb(y * cs + x) & 0xff) == want, s"($x,$y)")
    }
  }

  test("16x8 and 8x16 partitions decode with per-partition vectors") {
    val (mbW, mbH) = (2, 1)
    // hand-written slice: MB0 = P_L0_L0_16x8 (top mv (4,0), bottom
    // (0,4)); MB1 = P_L0_L0_8x16 (left (8,0), right (0,8)) — mvd from a
    // test-maintained grid through the SAME shared predictor class
    val grid = new H264Inter.MvGrid(mbW, mbH)
    val w = new H264.BitWriter
    w.ue(0); w.ue(5); w.ue(0); w.u(1, 4); w.u(0, 4)
    w.flag(false); w.flag(false); w.flag(false); w.se(0); w.ue(1)
    def part(bx4: Int, by4: Int, pw: Int, ph: Int, kind: Int, mv: (Int, Int)): Unit = {
      val (p0x, p0y) = grid.mvPred(bx4, by4, pw, ph, kind)
      w.se(mv._1 - p0x); w.se(mv._2 - p0y)
      grid.set(bx4, by4, pw, ph, mv._1, mv._2, 0)
    }
    grid.markMb(0)
    w.ue(0); w.ue(1) // skip_run 0, P_L0_L0_16x8
    part(0, 0, 4, 2, 1, (4, 0)); part(0, 2, 4, 2, 2, (0, 4))
    w.ue(H264Inter.cbpInterToCodeNum(0))
    grid.markMb(1)
    w.ue(0); w.ue(2) // skip_run 0, P_L0_L0_8x16
    part(4, 0, 2, 4, 3, (8, 0)); part(6, 0, 2, 4, 4, (0, 8))
    w.ue(H264Inter.cbpInterToCodeNum(0))
    val (f1, f2) = decodeTwo(chain(mbW, mbH, H264.ebsp(w.stop())))
    val s = f1.lumaStride; val h = mbH * 16
    def check(x0: Int, y0: Int, bw: Int, bh: Int, dx: Int, dy: Int): Unit =
      for (y <- y0 until y0 + bh; x <- x0 until x0 + bw)
        assert((f2.luma(y * s + x) & 0xff) == refInt(f1.luma, s, h, x, y, dx, dy),
          s"($x,$y)")
    check(0, 0, 16, 8, 1, 0); check(0, 8, 16, 8, 0, 1)
    check(16, 0, 8, 16, 2, 0); check(24, 0, 8, 16, 0, 2)
  }

  test("three-picture chain: each P references the PREVIOUS picture") {
    val (mbW, mbH) = (2, 2)
    val p1 = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((4, 0)))
    val p2 = H264Encode.encodeP16x16(Array.fill(mbH, mbW)((4, 0)))
    val fs = H264Decode.decodeAnnexBPictures(chain(mbW, mbH, p1, p2), 8)
    assert(fs.size == 3)
    val s = fs.head.lumaStride; val h = mbH * 16
    for (y <- 0 until h; x <- 0 until s) {
      assert((fs(1).luma(y * s + x) & 0xff) == at(fs.head.luma, s, h, x + 1, y))
      assert((fs(2).luma(y * s + x) & 0xff) == at(fs.head.luma, s, h, x + 2, y))
    }
  }

  test("out-of-scope P features reject gracefully, keeping decoded pictures") {
    val (mbW, mbH) = (2, 2)
    // P_8x8 (mb_type 3) after a good IDR: only the IDR survives
    val w = new H264.BitWriter
    w.ue(0); w.ue(5); w.ue(0); w.u(1, 4); w.u(0, 4)
    w.flag(false); w.flag(false); w.flag(false); w.se(0); w.ue(1)
    w.ue(0); w.ue(3) // P_8x8
    val fs = H264Decode.decodeAnnexBPictures(chain(mbW, mbH, H264.ebsp(w.stop())), 8)
    assert(fs.size == 1)
    // a P picture with no preceding IDR: nothing decodes
    val pOnly = H264Encode.annexB(Seq(
      (7, 3, H264.writeSps(mbW * 16, mbH * 16)),
      (8, 3, H264.writePps()),
      (1, 3, H264Encode.encodePSkipFrame(mbW, mbH))))
    assert(H264Decode.decodeAnnexBPictures(pOnly, 8).isEmpty)
  }

  test("IDR-only streams decode identically through both entry points") {
    val (stream, _) = H264Encode.encodeI16x16Dc(gradient(3, 2))
    val one = H264Decode.decodeIdrFrame(stream).get
    val seq = H264Decode.decodeAnnexBPictures(stream, 8)
    assert(seq.size == 1)
    assert(java.util.Arrays.equals(one.luma, seq.head.luma))
  }
}
