package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** CAVLC + intra-frame codec pins (SURVEY §2.4 media tier): table
  * structure, randomized residual round-trips, and full-frame
  * encode→decode checks where the expected pixels come from an
  * INDEPENDENT in-test reimplementation of the §8.3.1 predictors (not
  * from the decoder under test) — the strongest cross-check available in
  * a container with no reference H.264 implementation.
  */
class H264CodecSpec extends AnyFunSuite {

  test("every CAVLC VLC table is prefix-free, total, and the right size") {
    H264Cavlc.allTables.foreach { case (name, vlc) =>
      assert(vlc.prefixFree, s"$name not prefix-free")
    }
    // coeff_token: tc=0:1, tc=1:2, tc=2:3, tc=3..16: 4 → 62 codes
    assert(H264Cavlc.coeffToken0.byCode.size == 62)
    assert(H264Cavlc.coeffToken2.byCode.size == 62)
    assert(H264Cavlc.coeffToken4.byCode.size == 62)
    // chroma DC (maxNumCoeff 4): 1+2+3+4+4 = 14
    assert(H264Cavlc.coeffTokenChromaDc.byCode.size == 14)
    // total_zeros: TotalCoeff k has 17-k (4x4) / 5-k (chroma DC) entries
    (1 to 15).foreach(k => assert(H264Cavlc.totalZeros4x4(k).byCode.size == 16 - k + 1))
    (1 to 3).foreach(k => assert(H264Cavlc.totalZerosChromaDc(k).byCode.size == 4 - k + 1))
  }

  test("coeff_token FLC branch (nC >= 8) round-trips all 62 combinations") {
    for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc) if tc > 0 || t1 == 0) {
      val w = new H264.BitWriter
      H264Cavlc.encodeCoeffToken(w, nC = 8, tc, t1)
      val r = new H264.BitReader(w.stop())
      assert(H264Cavlc.decodeCoeffToken(r, nC = 8) == ((tc, t1)), s"($tc,$t1)")
    }
  }

  test("randomized residual blocks round-trip encode -> decode") {
    val rnd = new scala.util.Random(42)
    val shapes = Seq((16, 0), (16, 1), (16, 2), (16, 4), (16, 9),
      (15, 0), (15, 3), (15, 8), (4, -1))
    for (_ <- 1 to 3000) {
      val (maxCoeff, nC) = shapes(rnd.nextInt(shapes.length))
      val coeffs = new Array[Int](maxCoeff)
      val nnz = rnd.nextInt(maxCoeff + 1)
      val positions = rnd.shuffle((0 until maxCoeff).toList).take(nnz)
      positions.foreach { p =>
        val mag = rnd.nextInt(4) match {
          case 0 => 1 + rnd.nextInt(2)          // trailing-ones territory
          case 1 => 1 + rnd.nextInt(15)         // small levels
          case 2 => 16 + rnd.nextInt(200)       // suffix growth
          case _ => 500 + rnd.nextInt(5000)     // escape codes
        }
        coeffs(p) = if (rnd.nextBoolean()) mag else -mag
      }
      val w = new H264.BitWriter
      H264Cavlc.encodeResidualBlock(w, coeffs, nC)
      val r = new H264.BitReader(w.stop())
      val (decoded, tc) = H264Cavlc.decodeResidualBlock(r, maxCoeff, nC)
      assert(tc == coeffs.count(_ != 0))
      assert(decoded.toSeq == coeffs.toSeq,
        s"maxCoeff=$maxCoeff nC=$nC in=${coeffs.mkString(",")} out=${decoded.mkString(",")}")
    }
  }

  test("I_PCM frame: pixels round-trip exactly (incl. pad+crop dims)") {
    val (w, h) = (34, 18) // non-multiple-of-16 → SPS cropping path
    val luma = Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 5 % 256).toByte)
    val cbp = Array.tabulate(w / 2 * (h / 2))(i => ((i * 7) % 256).toByte)
    val crp = Array.tabulate(w / 2 * (h / 2))(i => ((i * 11) % 256).toByte)
    val stream = H264Encode.encodeIPcm(luma, cbp, crp, w, h)
    val frame = H264Decode.decodeIdrFrame(stream).getOrElse(fail("decode failed"))
    assert(frame.width == w && frame.height == h)
    assert(frame.croppedLuma.toSeq == luma.toSeq)
  }

  test("I_16x16 DC frames reconstruct the encoder-computed constants (qp 26 and 40)") {
    val mbMeans = Array.tabulate(3, 4)((my, mx) => (mx * 37 + my * 81) % 256)
    for (qp <- Seq(26, 40)) {
      val (stream, expected) = H264Encode.encodeI16x16Dc(mbMeans, qp)
      val frame = H264Decode.decodeIdrFrame(stream).getOrElse(fail(s"decode failed qp=$qp"))
      for (my <- 0 until 3; mx <- 0 until 4) {
        val vals = for (y <- 0 until 16; x <- 0 until 16)
          yield frame.luma((my * 16 + y) * frame.lumaStride + mx * 16 + x) & 0xff
        assert(vals.distinct == Seq(expected(my)(mx)),
          s"qp=$qp MB($mx,$my): got ${vals.distinct}, want ${expected(my)(mx)}")
      }
      // reconstruction actually tracks the requested pattern (DC quant error ≤ ~4)
      for (my <- 0 until 3; mx <- 0 until 4)
        assert(math.abs(expected(my)(mx) - mbMeans(my)(mx)) <= 6)
    }
  }

  // ---- independent §8.3.1.2 predictor reimplementation (for the I_4x4 pin)

  /** Reference 4x4 predictor, written from the equations independently of
    * H264Decode.predict4x4: neighbors passed explicitly as
    * (corner, top A..H, left I..L), missing = -1.
    */
  private def refPredict(mode: Int, c: Int, t: Array[Int], l: Array[Int]): Array[Int] = {
    val out = new Array[Int](16)
    def all(f: (Int, Int) => Int): Unit =
      for (y <- 0 until 4; x <- 0 until 4) out(y * 4 + x) = f(x, y)
    mode match {
      case 0 => all((x, _) => t(x))
      case 1 => all((_, y) => l(y))
      case 2 =>
        val dc =
          if (t(0) >= 0 && l(0) >= 0) (t.take(4).sum + l.sum + 4) >> 3
          else if (t(0) >= 0) (t.take(4).sum + 2) >> 2
          else if (l(0) >= 0) (l.sum + 2) >> 2
          else 128
        all((_, _) => dc)
      case 3 => all { (x, y) =>
        if (x == 3 && y == 3) (t(6) + 3 * t(7) + 2) >> 2
        else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
      }
      case 4 => all { (x, y) =>
        def tt(i: Int) = if (i < 0) c else t(i)
        def ll(i: Int) = if (i < 0) c else l(i)
        if (x > y) (tt(x - y - 2) + 2 * tt(x - y - 1) + tt(x - y) + 2) >> 2
        else if (x < y) (ll(y - x - 2) + 2 * ll(y - x - 1) + ll(y - x) + 2) >> 2
        else (t(0) + 2 * c + l(0) + 2) >> 2
      }
      case 5 => all { (x, y) =>
        def tt(i: Int) = if (i < 0) c else t(i)
        val z = 2 * x - y
        def ll(i: Int) = if (i < 0) c else l(i)
        if (z >= 0 && z % 2 == 0) (tt(x - y / 2 - 1) + tt(x - y / 2) + 1) >> 1
        else if (z > 0) (tt(x - y / 2 - 2) + 2 * tt(x - y / 2 - 1) + tt(x - y / 2) + 2) >> 2
        else if (z == -1) (l(0) + 2 * c + t(0) + 2) >> 2
        else (ll(y - 1) + 2 * ll(y - 2) + ll(y - 3) + 2) >> 2
      }
      case 6 => all { (x, y) =>
        def ll(i: Int) = if (i < 0) c else l(i)
        val z = 2 * y - x
        def tt(i: Int) = if (i < 0) c else t(i)
        if (z >= 0 && z % 2 == 0) (ll(y - x / 2 - 1) + ll(y - x / 2) + 1) >> 1
        else if (z > 0) (ll(y - x / 2 - 2) + 2 * ll(y - x / 2 - 1) + ll(y - x / 2) + 2) >> 2
        else if (z == -1) (t(0) + 2 * c + l(0) + 2) >> 2
        else (tt(x - 1) + 2 * tt(x - 2) + tt(x - 3) + 2) >> 2
      }
      case 7 => all { (x, y) =>
        if (y % 2 == 0) (t(x + y / 2) + t(x + y / 2 + 1) + 1) >> 1
        else (t(x + y / 2) + 2 * t(x + y / 2 + 1) + t(x + y / 2 + 2) + 2) >> 2
      }
      case 8 => all { (x, y) =>
        val z = x + 2 * y
        if (z % 2 == 0 && z < 5) (l(y + x / 2) + l(y + x / 2 + 1) + 1) >> 1
        else if (z < 5) (l(y + x / 2) + 2 * l(y + x / 2 + 1) + l(y + x / 2 + 2) + 2) >> 2
        else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
        else l(3)
      }
    }
    out
  }

  test("I_4x4 zero-residual frame: every block matches the independent predictor") {
    // 2x2 MBs; per-MB, per-block modes chosen to respect availability:
    //  - frame block (0,0): DC only; top row blocks: no V/DDL/DDR/VR/HD/VL;
    //    left column blocks: no H/DDR/VR/HD/HU
    def modesFor(mbX: Int, mbY: Int): Array[Int] =
      Array.tabulate(16) { b =>
        val (x4, y4) = H264Decode.blockScan(b)
        val ax = mbX * 4 + x4; val ay = mbY * 4 + y4
        if (ax == 0 && ay == 0) 2
        else if (ay == 0) Seq(1, 2, 8)((ax + b) % 3) // left-only modes
        else if (ax == 0) Seq(0, 2, 3, 7)((ay + b) % 4) // top-only modes
        else Seq(0, 1, 2, 3, 4, 5, 6, 7, 8)((ax * 7 + ay * 13 + b) % 9)
      }
    val modes = Array.tabulate(2, 2)((my, mx) => modesFor(mx, my))
    val stream = H264Encode.encodeI4x4Modes(modes)
    val frame = H264Decode.decodeIdrFrameUnsafe(stream).getOrElse(fail("decode failed"))
    val s = frame.lumaStride
    def pix(x: Int, y: Int): Int = frame.luma(y * s + x) & 0xff

    for (mbY <- 0 until 2; mbX <- 0 until 2; b <- 0 until 16) {
      val (x4, y4) = H264Decode.blockScan(b)
      val px = mbX * 16 + x4 * 4; val py = mbY * 16 + y4 * 4
      val leftAvail = px > 0
      val topAvail = py > 0
      // top-right rule replicated from §6.4.11.4 for the in-MB scan order
      val trAvail =
        if (y4 == 0) {
          if (x4 < 3) topAvail
          else topAvail && mbX + 1 < 2 // above-right MB exists & precedes in raster
        } else if (x4 == 3) false
        else H264Decode.blockScan.indexOf((x4 + 1, y4 - 1)) < b
      val t = new Array[Int](8)
      if (topAvail) {
        for (i <- 0 until 4) t(i) = pix(px + i, py - 1)
        if (trAvail) for (i <- 4 until 8) t(i) = pix(px + i, py - 1)
        else for (i <- 4 until 8) t(i) = t(3)
      } else java.util.Arrays.fill(t, -1)
      val l = if (leftAvail) Array.tabulate(4)(i => pix(px - 1, py + i))
        else Array.fill(4)(-1)
      val c = if (leftAvail && topAvail) pix(px - 1, py - 1) else -1
      val expected = refPredict(modes(mbY)(mbX)(b), c, t, l)
      val got = for (y <- 0 until 4; x <- 0 until 4) yield pix(px + x, py + y)
      assert(got == expected.toSeq,
        s"MB($mbX,$mbY) blk$b mode=${modes(mbY)(mbX)(b)}: got=$got want=${expected.toSeq}")
    }
  }

  test("fuzz: random and bit-flipped streams never throw or hang — None or a frame") {
    val rnd = new scala.util.Random(1234)
    // pure garbage wrapped in valid NAL framing (random slice payloads)
    for (_ <- 1 to 200) {
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      val stream = H264Encode.annexB(Seq(
        (7, 3, H264.writeSps(32, 32)), (8, 3, H264.writePps()), (5, 3, junk)))
      H264Decode.decodeIdrFrame(stream) // must not throw
    }
    // bit-flip corruption of a VALID stream (entropy desync paths)
    val (valid, _) = H264Encode.encodeI16x16Dc(Array.tabulate(2, 2)((a, b) => 60 + 40 * (a + b)))
    for (_ <- 1 to 300) {
      val c = valid.clone()
      val pos = rnd.nextInt(c.length - 20) + 20 // keep SPS/PPS region intact-ish
      c(pos) = (c(pos) ^ (1 << rnd.nextInt(8))).toByte
      H264Decode.decodeIdrFrame(c) // any outcome, no throw/hang
    }
  }

  test("decode rejects out-of-scope or garbage payloads with None, not throws") {
    assert(H264Decode.decodeIdrFrame(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(H264Decode.decodeIdrFrame(Array.fill[Byte](64)(0)).isEmpty)
    // SPS+PPS but no IDR
    val noIdr = H264Encode.annexB(Seq(
      (7, 3, H264.writeSps(32, 32)), (8, 3, H264.writePps())))
    assert(H264Decode.decodeIdrFrame(noIdr).isEmpty)
  }
}
