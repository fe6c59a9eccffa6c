package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC pixel TIER 2 (r12): residual coding + coding-quadtree splits.
  *
  * Pinning strategy (no external conformance material in the
  * container — the standing caveat): (1) the transform matrices and
  * dequant arithmetic are pinned against HARD-CODED canonical values
  * and independently-computed expectations in this file, not against
  * the production generation code; (2) residual_coding() is
  * round-tripped through the raw CABAC engine across every size /
  * scan / magnitude class; (3) whole pictures round-trip
  * encoder→decoder across quadtree shapes, NxN, TU splits, PCM-less
  * tier-2 SPSes and multiple QPs; (4) low-QP recon must track the
  * SOURCE (residuals are live, not decorative); (5) bit-flip fuzz
  * must never hang or produce an uncaught throw.
  */
class H265Tier2Spec extends AnyFunSuite {

  // ------------------------------------------------------------ transforms

  test("DCT matrices match the canonical integer tables (hard-coded)") {
    assert(H265Transform.dct(4).map(_.toSeq).toSeq == Seq(
      Seq(64, 64, 64, 64),
      Seq(83, 36, -36, -83),
      Seq(64, -64, -64, 64),
      Seq(36, -83, 83, -36)))
    assert(H265Transform.dct(8)(1).toSeq ==
      Seq(89, 75, 50, 18, -18, -50, -75, -89))
    assert(H265Transform.dct(8)(3).toSeq ==
      Seq(75, -18, -89, -50, 50, 89, 18, -75))
    assert(H265Transform.dct(16)(1).toSeq ==
      Seq(90, 87, 80, 70, 57, 43, 25, 9,
        -9, -25, -43, -57, -70, -80, -87, -90))
    assert(H265Transform.dct32(1).take(16).toSeq ==
      Seq(90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4))
    // antisymmetry of odd rows, symmetry of even rows
    val m32 = H265Transform.dct(32)
    for (k <- 0 until 32; j <- 0 until 16) {
      if (k % 2 == 1) assert(m32(k)(31 - j) == -m32(k)(j))
      else assert(m32(k)(31 - j) == m32(k)(j))
    }
    assert(H265Transform.dst4.map(_.toSeq).toSeq == Seq(
      Seq(29, 55, 74, 84),
      Seq(74, 74, 0, -74),
      Seq(84, -29, -74, 55),
      Seq(55, -84, 74, -29)))
  }

  test("dequant: independent §8.6.3 computation (flat scaling)") {
    // qp 26 → levelScale 51, shift qp/6 = 4; log2 3 → bdShift 6
    def ref(level: Int, log2: Int, qp: Int): Int = {
      val bd = log2 + 3
      val v = ((level.toLong * 16 * H265Transform.levelScale(qp % 6)
        << (qp / 6)) + (1L << (bd - 1))) >> bd
      math.max(-32768, math.min(32767, v)).toInt
    }
    for (qp <- Seq(0, 4, 17, 26, 37, 51); log2 <- 2 to 5;
         lvl <- Seq(-300, -2, -1, 0, 1, 2, 7, 1023)) {
      val got = H265Transform.dequant(Array(lvl), log2, qp)(0)
      assert(got == ref(lvl, log2, qp), s"qp $qp log2 $log2 lvl $lvl")
    }
  }

  test("inverse transform: DC-only coefficient gives a flat block (hand pin)") {
    for (log2 <- 2 to 5) {
      val n = 1 << log2
      val d = new Array[Int](n * n)
      d(0) = 64
      val r = H265Transform.inverseTransform(d, log2, dst = false)
      // (64·64 + 64) >> 7 = 32; (64·32 + 2048) >> 12 = 1
      assert(r.forall(_ == 1), s"n=$n: ${r.take(4).toSeq}")
      d(0) = -6400
      val r2 = H265Transform.inverseTransform(d, log2, dst = false)
      // stage1: (−409600 + 64) >> 7 = −3200 (floor); stage2:
      // (64·−3200 + 2048) >> 12 = −50
      assert(r2.forall(_ == -50), s"n=$n: ${r2.take(4).toSeq}")
    }
  }

  test("inverse transform: single AC coefficient reproduces the basis row") {
    // coeff at (xFreq 1, yFreq 0) of a 4x4 DCT: residual row pattern
    // follows dct4 row 1 horizontally, constant vertically
    val d = new Array[Int](16)
    d(1) = 64 // row-major [yFreq=0][xFreq=1]
    val r = H265Transform.inverseTransform(d, 2, dst = false)
    val row1 = H265Transform.dct(4)(1)
    for (y <- 0 until 4; x <- 0 until 4) {
      val s1 = (64 * 64 + 64) >> 7 // vertical pass over yFreq 0 only
      val expect = (row1(x) * s1 + 2048) >> 12
      assert(r(y * 4 + x) == expect, s"($x,$y)")
    }
  }

  test("forward ∘ inverse at low qp reconstructs residuals closely") {
    val rnd = new scala.util.Random(7)
    for (log2 <- 2 to 5; dst <- Seq(false, true) if !dst || log2 == 2) {
      val n = 1 << log2
      val res = Array.fill(n * n)(rnd.nextInt(161) - 80)
      val lv = H265Transform.quantize(
        H265Transform.forwardTransform(res, log2, dst), log2, 4)
      val back = H265Transform.inverseTransform(
        H265Transform.dequant(lv, log2, 4), log2, dst)
      val maxErr = res.zip(back).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 3, s"log2 $log2 dst $dst maxErr $maxErr")
    }
  }

  test("scan orders: §6.5.3 up-right diagonal 4x4 (hand pin) + inverses") {
    val diag = H265Transform.scanOrder(4, H265Transform.ScanDiag)
    // (x,y) sequence: (0,0)(0,1)(1,0)(0,2)(1,1)(2,0)(0,3)(1,2)(2,1)
    // (3,0)(1,3)(2,2)(3,1)(2,3)(3,2)(3,3), packed y*4+x
    assert(diag.toSeq == Seq(0, 4, 1, 8, 5, 2, 12, 9, 6, 3, 13, 10, 7, 14, 11, 15))
    for (size <- Seq(1, 2, 4, 8); s <- 0 to 2)
      assert(H265Transform.scanOrder(size, s).sorted.toSeq ==
        (0 until size * size), s"size $size scan $s is a permutation")
    assert(H265Transform.scanOrder(4, H265Transform.ScanHor).toSeq ==
      (0 until 16))
    assert(H265Transform.scanOrder(4, H265Transform.ScanVer).take(4).toSeq ==
      Seq(0, 4, 8, 12))
  }

  test("sigCtxInc: independent spec-rule expectations") {
    import H265Decode.sigCtxInc
    import H265Transform.ScanDiag
    // DC always 0 (luma) / 27 (chroma)
    assert(sigCtxInc(true, 0, 0, 4, ScanDiag, false, false) == 0)
    assert(sigCtxInc(false, 0, 0, 3, ScanDiag, false, false) == 27)
    // 4x4: the fixed map
    assert(sigCtxInc(true, 1, 0, 2, ScanDiag, false, false) == 1)
    assert(sigCtxInc(true, 3, 3, 2, ScanDiag, false, false) == 8)
    assert(sigCtxInc(false, 2, 1, 2, ScanDiag, false, false) == 27 + 4)
    // 16x16 luma, DC sub-block, no coded neighbors: offset 21,
    // cnt by xP+yP
    assert(sigCtxInc(true, 1, 0, 4, ScanDiag, false, false) == 21 + 1)
    assert(sigCtxInc(true, 3, 3, 4, ScanDiag, false, false) == 21 + 0)
    // non-DC sub-block adds 3 (luma only)
    assert(sigCtxInc(true, 4, 0, 4, ScanDiag, false, false) == 21 + 3 + 2)
    assert(sigCtxInc(false, 4, 0, 4, ScanDiag, false, false) == 27 + 12 + 2)
    // right-coded neighbor: cnt keyed by yP alone
    assert(sigCtxInc(true, 5, 2, 4, ScanDiag, true, false) == 21 + 3 + 0)
    assert(sigCtxInc(true, 5, 4, 4, ScanDiag, true, false) == 21 + 3 + 2)
    // below-coded: by xP; both: 2
    assert(sigCtxInc(true, 4, 6, 4, ScanDiag, false, true) == 21 + 3 + 2)
    assert(sigCtxInc(true, 7, 6, 4, ScanDiag, true, true) == 21 + 3 + 2)
    // 8x8 luma: offset depends on scan
    assert(sigCtxInc(true, 1, 1, 3, ScanDiag, false, false) == 9 + 1)
    assert(sigCtxInc(true, 1, 1, 3, H265Transform.ScanHor, false, false) == 15 + 1)
  }

  // --------------------------------------------- residual_coding round-trip

  private def roundTripLevels(levels: Array[Int], log2: Int, luma: Boolean,
      scanIdx: Int, qp: Int = 26): Array[Int] = {
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, H265Cabac.contexts(qp))
    H265Encode.encodeResidual(e, levels, log2, luma, scanIdx)
    // trailing pattern proves the decoder consumed exactly the payload
    for (i <- 0 until 16) e.bypass(i & 1)
    e.terminate(1)
    val r = new H264.BitReader(w.stop())
    val d = new H264Cabac.Decoder(r, H265Cabac.contexts(qp))
    val got = H265Decode.decodeResidual(d, log2, luma, scanIdx)
    for (i <- 0 until 16)
      assert(d.bypass() == (i & 1), s"bit drift at tail bit $i")
    got
  }

  test("residual_coding round-trips across sizes, scans, planes, magnitudes") {
    val rnd = new scala.util.Random(42)
    val scans = Seq(H265Transform.ScanDiag, H265Transform.ScanHor,
      H265Transform.ScanVer)
    for (log2 <- 2 to 5; luma <- Seq(true, false); scan <- scans
         if log2 <= 3 || scan == H265Transform.ScanDiag) {
      val n = 1 << log2
      // sparse, dense, extreme, single-DC, single-far-corner
      val cases = Seq(
        Array.tabulate(n * n)(i => if (rnd.nextInt(8) == 0) rnd.nextInt(9) - 4 else 0),
        Array.tabulate(n * n)(_ => rnd.nextInt(7) - 3),
        Array.tabulate(n * n)(i =>
          if (rnd.nextInt(6) == 0) rnd.nextInt(40001) - 20000 else 0),
        { val a = new Array[Int](n * n); a(0) = 1; a },
        { val a = new Array[Int](n * n); a(n * n - 1) = -32768 + 1; a },
        { val a = new Array[Int](n * n); a(0) = 3; a((n - 1) * n) = 2
          a(n - 1) = -2; a }
      ).filter(_.exists(_ != 0))
      for ((lv, ci) <- cases.zipWithIndex) {
        val got = roundTripLevels(lv, log2, luma, scan)
        assert(got.toSeq == lv.toSeq,
          s"log2 $log2 luma $luma scan $scan case $ci")
      }
    }
  }

  test("residual_coding: middle-CG inferred-DC and csbf=0 paths round-trip") {
    // 16x16: last in CG (3,3)-ish area, a middle CG whose ONLY nonzero
    // is its DC (inferred-significance path), and fully-zero middle CGs
    val lv = new Array[Int](256)
    lv(15 * 16 + 15) = 1 // last coeff in the far CG
    lv(8 * 16 + 8) = 5   // DC of a middle CG, nothing else in it
    lv(0) = -7           // DC CG
    val got = roundTripLevels(lv, 4, luma = true, H265Transform.ScanDiag)
    assert(got.toSeq == lv.toSeq)
  }

  // ------------------------------------------------- full-picture round-trip

  private def gradient(w: Int, h: Int, seed: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val rnd = new scala.util.Random(seed)
    val y = Array.tabulate(w * h)(i =>
      ((i % w) * 2 + (i / w) * 3 + rnd.nextInt(25) + 40).min(235).toByte)
    val cb = Array.tabulate((w / 2) * (h / 2))(i =>
      (128 + (i % (w / 2)) - (i / (w / 2)) + rnd.nextInt(9) - 4).max(16).min(240).toByte)
    val cr = Array.tabulate((w / 2) * (h / 2))(i =>
      (120 + rnd.nextInt(17) - 8).toByte)
    (y, cb, cr)
  }

  import H265Encode.{CuLeaf, CuSplit, CuTree}

  private def mixedTree(seed: Int): CuTree = {
    val rnd = new scala.util.Random(seed)
    def leaf8(): CuTree =
      if (rnd.nextInt(3) == 0)
        CuLeaf(Seq.fill(4)(rnd.nextInt(35))) // NxN
      else CuLeaf(Seq(rnd.nextInt(35)), splitTu = rnd.nextBoolean())
    def node16(): CuTree =
      if (rnd.nextBoolean()) CuSplit(leaf8(), leaf8(), leaf8(), leaf8())
      else CuLeaf(Seq(rnd.nextInt(35)), splitTu = rnd.nextBoolean())
    CuSplit(node16(), node16(), node16(), node16())
  }

  private def assertPictureRoundTrip(w: Int, h: Int, layout: Seq[CuTree],
      qp: Int, seed: Int): Unit = {
    val (sy, scb, scr) = gradient(w, h, seed)
    val (stream, recon) =
      H265Encode.encodeIntraPicture2(sy, scb, scr, w, h, layout, qp)
    val frames = H265Decode.decodeAnnexBIntraPictures(stream, 1)
    assert(frames.size == 1, s"decode failed (qp $qp seed $seed)")
    val f = frames.head
    assert(f.luma.toSeq == recon.luma.toSeq, s"luma mismatch qp $qp seed $seed")
    assert(f.cb.toSeq == recon.cb.toSeq, s"cb mismatch qp $qp seed $seed")
    assert(f.cr.toSeq == recon.cr.toSeq, s"cr mismatch qp $qp seed $seed")
  }

  test("single-CTB pictures round-trip across qps and simple layouts") {
    for (qp <- Seq(6, 18, 26, 34, 45); mode <- Seq(0, 1, 10, 26, 33))
      assertPictureRoundTrip(32, 32, Seq(CuLeaf(Seq(mode))), qp, qp * 37 + mode)
  }

  test("quadtree pictures with NxN, TU splits and all scan classes round-trip") {
    for (seed <- 1 to 6; qp <- Seq(12, 27, 38))
      assertPictureRoundTrip(64, 32, Seq(mixedTree(seed), mixedTree(seed + 100)),
        qp, seed * 31 + qp)
  }

  test("multi-CTB 64x64 picture with deep quadtrees round-trips") {
    val layout = (0 until 4).map(i => mixedTree(i + 500))
    assertPictureRoundTrip(64, 64, layout, 22, 9001)
  }

  test("low-qp recon tracks the source (residuals are live)") {
    val w = 32; val h = 32
    val (sy, scb, scr) = gradient(w, h, 11)
    val (stream, _) = H265Encode.encodeIntraPicture2(
      sy, scb, scr, w, h, Seq(mixedTree(77)), qp = 4)
    val f = H265Decode.decodeAnnexBIntraPictures(stream, 1).head
    def maxErr(a: Array[Byte], b: Array[Byte]): Int =
      a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max
    assert(maxErr(f.luma, sy) <= 4, s"luma err ${maxErr(f.luma, sy)}")
    assert(maxErr(f.cb, scb) <= 4)
    assert(maxErr(f.cr, scr) <= 4)
    // and at high qp with zero-ish residuals it must NOT track the
    // noisy source this closely — pins that low-qp closeness came from
    // live residual decoding, not from prediction alone
    val (stream2, _) = H265Encode.encodeIntraPicture2(
      sy, scb, scr, w, h, Seq(CuLeaf(Seq(1))), qp = 51)
    val f2 = H265Decode.decodeAnnexBIntraPictures(stream2, 1).head
    assert(maxErr(f2.luma, sy) > 4)
  }

  test("tier-1 PCM/zero-residual streams still decode through the tier-2 path") {
    // the r11 encoder's output must be bit-identical under the
    // generalized quadtree decoder (CTB 16, CU == CTB, cbf 0)
    val ctus: Array[Array[H265Encode.Ctu]] = Array(
      Array(H265Encode.Intra(26), H265Encode.Intra(10)),
      Array(H265Encode.Intra(0), H265Encode.Intra(1)))
    val stream = H265Encode.encodeIntraPicture(ctus, qp = 30)
    val f = H265Decode.decodeAnnexBIntraPictures(stream, 1)
    assert(f.size == 1 && f.head.width == 32 && f.head.height == 32)
  }

  test("bit-flip fuzz: no hangs, no uncaught throws, flips never pass unnoticed silently") {
    val (sy, scb, scr) = gradient(32, 32, 3)
    val (stream, recon) = H265Encode.encodeIntraPicture2(
      sy, scb, scr, 32, 32, Seq(mixedTree(13)), qp = 20)
    val rnd = new scala.util.Random(5)
    var decoys = 0
    // flip only CONTENT bits: inside the slice NAL (flips in the
    // parameter sets hit parsed-but-ignored metadata — level idc,
    // reserved bits — and flips in the trailing CABAC-flush/alignment
    // bytes are never read past end_of_slice; both are invisible in
    // any conformant decoder, by construction)
    val sliceOff = {
      var last = -1
      for (k <- 0 until stream.length - 4)
        if (stream(k) == 0 && stream(k + 1) == 0 && stream(k + 2) == 0 &&
          stream(k + 3) == 1) last = k + 6
      last
    }
    assert(sliceOff > 0 && stream.length - sliceOff > 30)
    for (_ <- 0 until 300) {
      val mutated = stream.clone()
      val i = sliceOff + rnd.nextInt(stream.length - sliceOff - 6)
      mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
      val out = H265Decode.decodeAnnexBIntraPictures(mutated, 1)
      if (out.nonEmpty && out.head.luma.toSeq == recon.luma.toSeq &&
        out.head.cb.toSeq == recon.cb.toSeq) decoys += 1
    }
    // a flipped slice bit may land in CABAC padding; nearly all must
    // visibly change or kill the decode
    assert(decoys <= 6, s"$decoys byte-flips decoded identically")
  }
}
