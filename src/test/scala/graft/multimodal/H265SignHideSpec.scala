package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC sign_data_hiding (r15, §7.4.9.11): per coefficient group whose
  * reverse-scan span exceeds 3, the first-in-scan sign is not coded —
  * the decoder infers it from the parity of the CG's absolute-level
  * sum, and the encoder repairs parity in place (bumping the
  * last-in-scan significant magnitude by one) when the implied sign
  * would be wrong. One of the two gaps the r14 x265 vectors
  * deliberately disabled (`signhide=0`); with this in place the
  * external vectors run it live (sh_128x64 / own_sh_128x64).
  */
class H265SignHideSpec extends AnyFunSuite {

  /** Encode with signHide (mutating `levels` via parity repair), then
    * decode with signHide; returns (decoded, repairedLevels). A bypass
    * tail proves exact payload consumption.
    */
  private def roundTrip(levels: Array[Int], log2: Int, luma: Boolean,
      scanIdx: Int): (Array[Int], Array[Int]) = {
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, H265Cabac.contexts(26))
    H265Encode.encodeResidual(e, levels, log2, luma, scanIdx,
      signHide = true)
    for (i <- 0 until 16) e.bypass(i & 1)
    e.terminate(1)
    val r = new H264.BitReader(w.stop())
    val d = new H264Cabac.Decoder(r, H265Cabac.contexts(26))
    val got = H265Decode.decodeResidual(d, log2, luma, scanIdx,
      signHide = true)
    for (i <- 0 until 16)
      assert(d.bypass() == (i & 1), s"bit drift at tail bit $i")
    (got, levels)
  }

  test("round-trip: hidden signs reconstruct across sizes, scans, parities") {
    val rnd = new scala.util.Random(1501)
    val scans = Seq(H265Transform.ScanDiag, H265Transform.ScanHor,
      H265Transform.ScanVer)
    for (log2 <- 2 to 5; luma <- Seq(true, false); scan <- scans
         if log2 <= 3 || scan == H265Transform.ScanDiag; trial <- 0 until 6) {
      val n = 1 << log2
      // dense enough that most CGs qualify (span > 3), signs random —
      // both parity-consistent and parity-repair cases arise
      val levels = Array.tabulate(n * n) { _ =>
        if (rnd.nextInt(3) == 0) 0 else rnd.nextInt(9) - 4
      }
      if (levels.exists(_ != 0)) {
        val before = levels.clone()
        val (got, repaired) = roundTrip(levels, log2, luma, scan)
        assert(got.sameElements(repaired),
          s"decode != repaired levels (log2=$log2 luma=$luma scan=$scan trial=$trial)")
        // repair only ever bumps magnitudes by one, never flips a sign
        // or changes the significance pattern
        for (i <- before.indices) {
          assert((before(i) == 0) == (repaired(i) == 0), s"sig changed at $i")
          assert(math.abs(math.abs(repaired(i)) - math.abs(before(i))) <= 1,
            s"repair bumped more than 1 at $i")
          if (before(i) != 0)
            assert(before(i).sign == repaired(i).sign, s"sign flipped at $i")
        }
      }
    }
  }

  test("qualifying CG omits the hidden sign bit (stream strictly shorter)") {
    // one CG, span 15 (qualifies), hidden sign positive with even sum
    val levels = new Array[Int](16)
    levels(0) = 1; levels(5) = 1; levels(10) = 1; levels(15) = 1
    def bits(signHide: Boolean): Int = {
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w, H265Cabac.contexts(26))
      H265Encode.encodeResidual(e, levels.clone(), 2, luma = true,
        H265Transform.ScanDiag, signHide)
      e.terminate(1)
      w.stop().length
    }
    // parity: sum 4 even → implied positive == actual: no repair, one
    // fewer bypass bin. CABAC may round into the same byte count, so
    // compare against a parity-repair-free decode instead where equal.
    assert(bits(signHide = true) <= bits(signHide = false))
    val (got, repaired) = roundTrip(levels.clone(), 2, true,
      H265Transform.ScanDiag)
    assert(got.sameElements(levels) && repaired.sameElements(levels),
      "parity-consistent CG must not be repaired")
  }

  test("parity repair flips the implied sign via a magnitude bump") {
    // span 15, sum odd (3), first-in-scan coefficient POSITIVE →
    // implied negative would be wrong → encoder must repair
    val levels = new Array[Int](16)
    levels(0) = 1; levels(7) = 1; levels(15) = 1
    val (got, repaired) = roundTrip(levels.clone(), 2, true,
      H265Transform.ScanDiag)
    assert(repaired.map(math.abs).sum == 4, "repair must bump sum to even")
    assert(got.sameElements(repaired))
    assert(got(0) == 1, "hidden (first-in-scan) sign must decode positive")
  }

  test("short-span CG (span <= 3) codes all signs explicitly") {
    val levels = new Array[Int](16)
    levels(0) = -2; levels(1) = 1 // diag scan span 1
    val (got, repaired) = roundTrip(levels.clone(), 2, true,
      H265Transform.ScanDiag)
    assert(repaired.sameElements(levels), "no repair without hiding")
    assert(got.sameElements(levels))
  }

  test("PPS flag round-trips and stays in the supported tier") {
    val pps = H265.parsePps(H265.writePpsPixel(signHide = true)).get
    assert(pps.supported && pps.signDataHiding)
    assert(!H265.parsePps(H265.writePpsPixel()).get.signDataHiding)
  }

  test("end-to-end: intra picture with signHide decodes bit-exact (twin)") {
    val rnd = new scala.util.Random(1502)
    val w = 64; val h = 64
    val sy = Array.tabulate(w * h)(i =>
      (30 + (((i % w) * 7 + (i / w) * 5 + rnd.nextInt(37)) % 200)).toByte)
    val scb = Array.tabulate(w * h / 4)(_ => (100 + rnd.nextInt(40)).toByte)
    val scr = Array.tabulate(w * h / 4)(_ => (110 + rnd.nextInt(30)).toByte)
    val layout = Seq[H265Encode.CuTree](
      H265Encode.CuSplit(
        H265Encode.CuLeaf(Seq(10)), H265Encode.CuLeaf(Seq(26)),
        H265Encode.CuLeaf(Seq(1), splitTu = true),
        H265Encode.CuLeaf(Seq(34))),
      H265Encode.CuLeaf(Seq(0)), H265Encode.CuLeaf(Seq(17)),
      H265Encode.CuLeaf(Seq(30), splitTu = true))
    val (stream, recon) = H265Encode.encodeIntraPicture2(sy, scb, scr,
      w, h, layout, qp = 30, signHide = true)
    // the PPS really declares it
    val pps = H265.nalUnitsAnnexB(stream)
      .find(_.nalType == H265.NalPps).get.payload
    assert(H265.parsePps(pps).get.signDataHiding)
    val dec = H265Decode.decodeAnnexBPictures(stream, maxFrames = 2)
    assert(dec.size == 1)
    assert(java.util.Arrays.equals(dec.head.luma, recon.luma))
    assert(java.util.Arrays.equals(dec.head.cb, recon.cb))
    assert(java.util.Arrays.equals(dec.head.cr, recon.cr))
  }

  test("end-to-end: P GOP with signHide decodes bit-exact (twin)") {
    val rnd = new scala.util.Random(1503)
    val w = 128; val h = 64
    def frame(k: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
      val r2 = new scala.util.Random(90)
      (Array.tabulate(w * h) { i =>
        val x = (i % w - 2 * k + 2 * w) % w
        (30 + ((x * 7 + (i / w) * 3) % 185) + r2.nextInt(23)).toByte
      },
        Array.tabulate(w * h / 4)(i => (96 + (i + k) % 37).toByte),
        Array.tabulate(w * h / 4)(i => (118 + (i + 2 * k) % 11).toByte))
    }
    val iLayout: Seq[H265Encode.CuTree] =
      Seq.fill(8)(H265Encode.CuLeaf(Seq(rnd.nextInt(35))))
    def pLayout(): Seq[H265Encode.CuTree] = Seq.fill(8) {
      if (rnd.nextInt(4) == 0) H265Encode.CuLeaf(Seq(rnd.nextInt(35)))
      else H265Encode.InterLeaf(8, 0): H265Encode.CuTree
    }
    val (stream, recons) = H265Encode.encodeGop(
      (0 to 2).map(frame), w, h, iLayout, Seq(pLayout(), pLayout()),
      qp = 27, signHide = true)
    val dec = H265Decode.decodeAnnexBPictures(stream, maxFrames = 4)
    assert(dec.size == recons.size)
    for ((d, r) <- dec.zip(recons)) {
      assert(java.util.Arrays.equals(d.luma, r.luma))
      assert(java.util.Arrays.equals(d.cb, r.cb))
      assert(java.util.Arrays.equals(d.cr, r.cr))
    }
  }
}
