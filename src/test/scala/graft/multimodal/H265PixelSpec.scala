package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC pixel tier-1 pins (r11): PCM ground truth, the full 35-mode
  * §8.4.4.2 intra prediction surface against an INDEPENDENT in-test
  * predictor (its own ref-array structure), plus HAND-COMPUTED literal
  * cases (constant-ref DC, vertical/planar closed forms) that no
  * shared transcription slip can satisfy by accident. The PCM
  * round-trip additionally pins the CABAC flush/restart symmetry
  * (§9.3.2.5 DecodeBinTrm → DecodeFlush → byte-aligned samples →
  * engine re-init with persisting contexts).
  */
class H265PixelSpec extends AnyFunSuite {

  import H265Encode.{Ctu, Intra, Pcm}

  private def pcmBytes(seed: Int): Pcm = {
    val rnd = new scala.util.Random(seed)
    Pcm(Array.fill(256)(rnd.nextInt(256).toByte),
      Array.fill(64)(rnd.nextInt(256).toByte),
      Array.fill(64)(rnd.nextInt(256).toByte))
  }

  test("all-PCM picture round-trips exactly (CABAC flush / restart symmetry)") {
    val ctus: Array[Array[Ctu]] =
      Array.tabulate(2, 3)((r, c) => pcmBytes(r * 3 + c + 1))
    val stream = H265Encode.encodeIntraPicture(ctus)
    val frames = H265Decode.decodeAnnexBIntraPictures(stream)
    assert(frames.size === 1)
    val f = frames.head
    assert(f.width === 48 && f.height === 32)
    for (cy <- 0 until 2; cx <- 0 until 3) {
      val Pcm(l, cb, cr) = ctus(cy)(cx): @unchecked
      for (i <- 0 until 256) {
        val v = f.luma((cy * 16 + i / 16) * 48 + cx * 16 + i % 16)
        assert(v === l(i), s"ctu($cx,$cy) luma $i")
      }
      for (i <- 0 until 64) {
        assert(f.cb((cy * 8 + i / 8) * 24 + cx * 8 + i % 8) === cb(i))
        assert(f.cr((cy * 8 + i / 8) * 24 + cx * 8 + i % 8) === cr(i))
      }
    }
  }

  /** Independent §8.4.4.2 predictor over an explicit reference array:
    * refs(i) for i in 0..4nT addresses the L-shape from p[−1][2nT−1]
    * (i = 0) up the left column to the corner (i = 2nT) and across the
    * top row to p[2nT−1][−1] (i = 4nT). Operates on luma 16 semantics
    * (smoothing + DC/edge filters).
    */
  private def refPredict(refs: Array[Int], mode: Int): Array[Array[Int]] = {
    val nT = 16
    def left(y: Int) = refs(2 * nT - 1 - y)
    def top(x: Int) = refs(2 * nT + 1 + x)
    val corner = refs(2 * nT)
    // smoothing decision for nT = 16: all but DC / 9..11 / 25..27
    val sm = mode != 1 &&
      (mode == 0 || math.min(math.abs(mode - 26), math.abs(mode - 10)) > 1)
    val fl = Array.tabulate(32)(y =>
      if (!sm) left(y)
      else if (y == 31) left(31)
      else ((if (y == 0) corner else left(y - 1)) + 2 * left(y) + left(y + 1) + 2) >> 2)
    val ft = Array.tabulate(32)(x =>
      if (!sm) top(x)
      else if (x == 31) top(31)
      else ((if (x == 0) corner else top(x - 1)) + 2 * top(x) + top(x + 1) + 2) >> 2)
    val fc = if (!sm) corner else (left(0) + 2 * corner + top(0) + 2) >> 2
    val out = Array.ofDim[Int](16, 16) // out(y)(x)
    mode match {
      case 0 =>
        for (y <- 0 until 16; x <- 0 until 16)
          out(y)(x) = ((15 - x) * fl(y) + (x + 1) * ft(16) +
            (15 - y) * ft(x) + (y + 1) * fl(16) + 16) >> 5
      case 1 =>
        val dc = ((0 until 16).map(i => left(i) + top(i)).sum + 16) >> 5
        for (y <- 0 until 16; x <- 0 until 16) out(y)(x) = dc
        out(0)(0) = (left(0) + 2 * dc + top(0) + 2) >> 2
        for (k <- 1 until 16) {
          out(0)(k) = (top(k) + 3 * dc + 2) >> 2
          out(k)(0) = (left(k) + 3 * dc + 2) >> 2
        }
      case m =>
        val ang = H265Decode.predAngle(m - 2)
        val vert = m >= 18
        def mainRef(i: Int): Int = // extended main reference, index −16..32
          if (i < 0) {
            val ia = H265Decode.invAngle(ang)
            val idx = ((i * ia) + 128) >> 8
            if (idx == 0) fc else if (vert) fl(idx - 1) else ft(idx - 1)
          } else if (i == 0) fc
          else if (vert) ft(i - 1) else fl(i - 1)
        for (j <- 0 until 16; i <- 0 until 16) {
          val iIdx = ((j + 1) * ang) >> 5
          val iFact = ((j + 1) * ang) & 31
          val v =
            if (iFact == 0) mainRef(i + iIdx + 1)
            else ((32 - iFact) * mainRef(i + iIdx + 1) +
              iFact * mainRef(i + iIdx + 2) + 16) >> 5
          if (vert) out(j)(i) = v else out(i)(j) = v
        }
        def c255(v: Int) = math.max(0, math.min(255, v))
        if (m == 26) for (y <- 0 until 16)
          out(y)(0) = c255(top(0) + ((left(y) - corner) >> 1))
        if (m == 10) for (x <- 0 until 16)
          out(0)(x) = c255(left(0) + ((top(x) - corner) >> 1))
    }
    out
  }

  test("every intra mode 0..34 == independent reference-array predictor (PCM neighbors)") {
    for (mode <- 0 to 34) {
      val ctus: Array[Array[Ctu]] = Array(
        Array[Ctu](pcmBytes(mode * 4 + 1), pcmBytes(mode * 4 + 2)),
        Array[Ctu](pcmBytes(mode * 4 + 3), Intra(mode)))
      val frames = H265Decode.decodeAnnexBIntraPictures(
        H265Encode.encodeIntraPicture(ctus))
      assert(frames.size === 1, s"mode $mode")
      val f = frames.head
      val W = 32
      // build the reference L-shape for the bottom-right CTU at (16,16)
      // from the decoded PCM pixels: left column x=15 (y 16..31 from
      // CTU2; 32..47 outside -> propagate), corner (15,15) from CTU0,
      // top row y=15 (x 16..31 from CTU1; 32..47 outside -> propagate)
      val refs = new Array[Int](65)
      def lum(x: Int, y: Int) = f.luma(y * W + x) & 0xff
      for (y <- 16 until 32) refs(31 - (y - 16)) = lum(15, y) // left avail
      for (i <- 0 until 16) refs(i) = refs(16) // below-left: propagate up-scan
      refs(32) = lum(15, 15)
      for (x <- 16 until 32) refs(33 + (x - 16)) = lum(x, 15)
      for (i <- 49 until 65) refs(i) = refs(48) // above-right: propagate
      val expect = refPredict(refs, mode)
      for (y <- 0 until 16; x <- 0 until 16)
        assert(lum(16 + x, 16 + y) === expect(y)(x), s"mode $mode ($x,$y)")
    }
  }

  test("hand-computed DC: constant references reproduce the constant exactly") {
    val v = 77.toByte
    val flat = Pcm(Array.fill(256)(v), Array.fill(64)(v), Array.fill(64)(v))
    val ctus: Array[Array[Ctu]] = Array(
      Array[Ctu](flat, flat), Array[Ctu](flat, Intra(1)))
    val f = H265Decode.decodeAnnexBIntraPictures(
      H265Encode.encodeIntraPicture(ctus)).head
    // dc = 77; boundary smoothing: (77 + 3*77 + 2) >> 2 = 77 — every
    // sample of the predicted CTU is exactly 77, chroma included
    for (y <- 16 until 32; x <- 16 until 32)
      assert((f.luma(y * 32 + x) & 0xff) === 77, s"($x,$y)")
    for (cy <- 8 until 16; cx <- 8 until 16)
      assert((f.cb(cy * 16 + cx) & 0xff) === 77, s"chroma ($cx,$cy)")
  }

  test("hand-computed mode 26 (pure vertical): column copy + left edge filter") {
    // above CTU's bottom row carries a ramp T[x] = 60 + 4x; the left
    // CTU's right column L[y] = 100 + 2y; corner = 90. Mode 26 is
    // never smoothed at nT 16: pred[x][y] = T[x] for x > 0, and
    // pred[0][y] = T[0] + ((L[y] - corner) >> 1).
    val above = {
      val l = Array.tabulate(256) { i =>
        if (i / 16 == 15) (60 + 4 * (i % 16)).toByte else 50.toByte
      }
      Pcm(l, Array.fill(64)(128.toByte), Array.fill(64)(128.toByte))
    }
    val leftC = {
      val l = Array.tabulate(256) { i =>
        if (i % 16 == 15) (100 + 2 * (i / 16)).toByte else 40.toByte
      }
      Pcm(l, Array.fill(64)(128.toByte), Array.fill(64)(128.toByte))
    }
    val corner = {
      val l = Array.fill(256)(30.toByte); l(255) = 90.toByte
      Pcm(l, Array.fill(64)(128.toByte), Array.fill(64)(128.toByte))
    }
    val ctus: Array[Array[Ctu]] = Array(
      Array[Ctu](corner, above), Array[Ctu](leftC, Intra(26)))
    val f = H265Decode.decodeAnnexBIntraPictures(
      H265Encode.encodeIntraPicture(ctus)).head
    for (y <- 0 until 16; x <- 0 until 16) {
      val expect =
        if (x == 0) 60 + ((100 + 2 * y - 90) >> 1)
        else 60 + 4 * x
      assert((f.luma((16 + y) * 32 + 16 + x) & 0xff) === expect, s"($x,$y)")
    }
  }

  test("hand-computed planar: constant-top A / constant-left B closed form") {
    // top refs all A = 120 (incl. the x=16.. extension, same constant),
    // left refs all B = 64. Smoothing of constant arrays is the
    // identity except where top/left meet the corner — make the corner
    // consistent by averaging... simpler: corner = A so the top array
    // smooths to A everywhere; left(0) smooths to (A + 2B + B + 2) >> 2.
    // To keep EVERYTHING constant, use A == B: planar of constant V is
    // V — a pure arithmetic identity ((15-x)V + (x+1)V + (15-y)V +
    // (y+1)V + 16) >> 5 = (32V + 16) >> 5 = V.
    val v = 111.toByte
    val flat = Pcm(Array.fill(256)(v), Array.fill(64)(v), Array.fill(64)(v))
    val ctus: Array[Array[Ctu]] = Array(
      Array[Ctu](flat, flat), Array[Ctu](flat, Intra(0)))
    val f = H265Decode.decodeAnnexBIntraPictures(
      H265Encode.encodeIntraPicture(ctus)).head
    for (y <- 16 until 32; x <- 16 until 32)
      assert((f.luma(y * 32 + x) & 0xff) === 111, s"($x,$y)")
  }

  test("reference substitution: a top-left predicted CTU with no neighbors predicts mid-gray") {
    val ctus: Array[Array[Ctu]] = Array(
      Array[Ctu](Intra(1), pcmBytes(9)), Array[Ctu](pcmBytes(10), pcmBytes(11)))
    val f = H265Decode.decodeAnnexBIntraPictures(
      H265Encode.encodeIntraPicture(ctus)).head
    // all references unavailable -> substituted 128 -> DC = 128 (the
    // boundary smoothing of constant 128 is the identity)
    for (y <- 0 until 16; x <- 0 until 16)
      assert((f.luma(y * 32 + x) & 0xff) === 128, s"($x,$y)")
  }

  test("pixel-tier SPS round-trips through the deep parse") {
    val sps = H265.parseSps(H265.writeSpsPixel(64, 48)).get
    assert(sps.deep && sps.ctbLog2 === 4 && sps.minCbLog2 === 4 &&
      sps.maxTbLog2 === 4 && sps.pcmEnabled && sps.pcmBitDepth === 8 &&
      sps.pcmMinLog2 === 4 && sps.pcmMaxLog2 === 4 &&
      sps.pcmLoopFilterDisabled && !sps.saoEnabled)
    assert(sps.width === 64 && sps.height === 48)
    val pps = H265.parsePps(H265.writePpsPixel()).get
    assert(pps.supported && pps.deblockingDisabled && pps.initQp === 26)
    // the probe-tier SPS still parses, now with deep fields
    val probe = H265.parseSps(H265.writeSps(62, 30)).get
    assert(probe.deep && probe.ctbLog2 === 5 && !probe.pcmEnabled)
  }

  test("mutation fuzz: HEVC pixel streams decode or reject, never crash") {
    val ctus: Array[Array[Ctu]] = Array(
      Array[Ctu](pcmBytes(1), Intra(26), pcmBytes(2)),
      Array[Ctu](Intra(0), pcmBytes(3), Intra(9)))
    val base = H265Encode.encodeIntraPicture(ctus)
    assert(H265Decode.decodeAnnexBIntraPictures(base).size == 1)
    def ok(f: H264Decode.Frame): Boolean =
      f.width > 0 && f.height > 0 && f.width <= 8192 && f.height <= 8192 &&
        f.luma.length == f.mbW * 16 * f.mbH * 16
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      H265Decode.decodeAnnexBIntraPictures(m).foreach(f =>
        assert(ok(f), s"invalid frame at bit $bit"))
    }
    val rnd = new scala.util.Random(0x9158)
    for (_ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H265Decode.decodeAnnexBIntraPictures(m).foreach(f => assert(ok(f)))
    }
  }
}
