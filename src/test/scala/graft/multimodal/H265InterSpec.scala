package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC inter tier 3 (r12): P slices over the single-reference GOP
  * form — merge / AMVP / skip signalling, mvd coding, the §8.5.4.2.2
  * DCT-IF interpolation, and motion-compensated recon with residual
  * coding.
  *
  * Pinning strategy (no external HEVC conformance material in the
  * container — the standing caveat): (1) the interpolation filter
  * tables are pinned against hard-coded values plus structural
  * invariants (tap sums, mirror symmetry) and per-tap IMPULSE
  * responses through the production MC path; (2) merge and AMVP
  * candidate derivations are pinned against hand-worked §8.5.3.2
  * scenarios on synthetic motion grids; (3) whole GOPs round-trip
  * encoder→decoder across skip / merge-with-residual / AMVP /
  * quarter-pel / negative / out-of-frame MVs, intra CUs inside P
  * slices, and multi-P chains; (4) low-QP P recon must track the
  * source; (5) bit-flip fuzz must never hang or escape.
  */
class H265InterSpec extends AnyFunSuite {

  // --------------------------------------------------------- filter tables

  test("luma DCT-IF taps match the hard-coded Table 8-12 rows") {
    assert(H265Inter.lumaFilters(1).toSeq ==
      Seq(-1, 4, -10, 58, 17, -5, 1, 0))
    assert(H265Inter.lumaFilters(2).toSeq ==
      Seq(-1, 4, -11, 40, 40, -11, 4, -1))
    assert(H265Inter.lumaFilters(3).toSeq ==
      Seq(0, 1, -5, 17, 58, -10, 4, -1))
    // every row sums to 64 (DC gain 1) and frac 3 mirrors frac 1
    for (f <- 0 to 3) assert(H265Inter.lumaFilters(f).sum == 64)
    assert(H265Inter.lumaFilters(3).toSeq ==
      H265Inter.lumaFilters(1).reverse.toSeq)
    // the half-pel row is symmetric and has first moment exactly 32
    // (64 · 1/2): linear signals interpolate exactly at half-pel
    assert(H265Inter.lumaFilters(2).toSeq ==
      H265Inter.lumaFilters(2).reverse.toSeq)
    assert(H265Inter.lumaFilters(2).zipWithIndex.map {
      case (c, i) => c * (i - 3)
    }.sum == 32)
  }

  test("chroma DCT-IF taps match the hard-coded Table 8-13 rows") {
    assert(H265Inter.chromaFilters(1).toSeq == Seq(-2, 58, 10, -2))
    assert(H265Inter.chromaFilters(4).toSeq == Seq(-4, 36, 36, -4))
    assert(H265Inter.chromaFilters(7).toSeq == Seq(-2, 10, 58, -2))
    for (f <- 0 to 7) {
      assert(H265Inter.chromaFilters(f).sum == 64)
      if (f > 0) // frac 8−f mirrors frac f
        assert(H265Inter.chromaFilters(8 - f).toSeq ==
          H265Inter.chromaFilters(f).reverse.toSeq)
    }
    // the half-sample row's first moment is exactly 32 (64 · 4/8)
    assert(H265Inter.chromaFilters(4).zipWithIndex.map {
      case (c, i) => c * (i - 1)
    }.sum == 32)
  }

  // --------------------------------------------------------------- raw MC

  private def mcOne(ref: Array[Byte], w: Int, h: Int, mvx: Int, mvy: Int,
      fracBits: Int, xPb: Int = 8, yPb: Int = 8, n: Int = 4): Array[Int] = {
    val dst = new Array[Byte](w * h)
    H265Inter.mc(ref, w, h, dst, w, xPb, yPb, n, n, mvx, mvy, fracBits)
    Array.tabulate(n * n)(i => dst((yPb + i / n) * w + xPb + i % n) & 0xff)
  }

  test("MC is exact on constant planes at every fractional position") {
    val w = 32; val h = 32
    val ref = Array.fill[Byte](w * h)(173.toByte)
    for (mvx <- -5 to 5; mvy <- -5 to 5) {
      assert(mcOne(ref, w, h, mvx, mvy, 2).forall(_ == 173),
        s"luma frac (${mvx & 3},${mvy & 3})")
      assert(mcOne(ref, w, h, mvx, mvy, 3).forall(_ == 173),
        s"chroma frac (${mvx & 7},${mvy & 7})")
    }
  }

  test("per-tap impulse responses through the production MC path") {
    val w = 32; val h = 32
    // background 100 with a +64 impulse: out − 100 recovers each tap
    // exactly ((64·100 + 64·tap + 32) >> 6 = 100 + tap)
    val ref = Array.fill[Byte](w * h)(100.toByte)
    ref(16 * w + 16) = 164.toByte
    // horizontal luma frac 1: block at (14..17, 16): sample x sees the
    // impulse through tap index (16 − (x − 3)) = 19 − x
    val out = new Array[Byte](w * h)
    H265Inter.mc(ref, w, h, out, w, 12, 16, 8, 1, 1, 0, fracBits = 2)
    val taps = H265Inter.lumaFilters(1)
    for (x <- 12 until 20) {
      val tapIdx = 19 - x
      val expect = 100 + (if (tapIdx >= 0 && tapIdx < 8) taps(tapIdx) else 0)
      assert((out(16 * w + x) & 0xff) == expect, s"x=$x")
    }
    // vertical chroma frac 3: sample y sees the impulse through tap
    // (16 − (y − 1)) = 17 − y
    val outC = new Array[Byte](w * h)
    H265Inter.mc(ref, w, h, outC, w, 16, 12, 1, 8, 0, 3, fracBits = 3)
    val ctaps = H265Inter.chromaFilters(3)
    for (y <- 12 until 20) {
      val tapIdx = 17 - y
      val expect = 100 + (if (tapIdx >= 0 && tapIdx < 4) ctaps(tapIdx) else 0)
      assert((outC(y * w + 16) & 0xff) == expect, s"y=$y")
    }
  }

  test("half-pel MC interpolates linear ramps exactly; edges clamp") {
    val w = 32; val h = 32
    val ref = Array.tabulate[Byte](w * h)(i => (4 * (i % w)).toByte)
    // (+half-pel, 0): expected (v(x+3) + v(x+4)) / 2 = 4x+14 exactly at
    // interior; mv = (7,0) quarter-pel → xInt offset 1, frac 2
    val got = mcOne(ref, w, h, 6, 0, 2, xPb = 8, yPb = 8, n = 4)
    for (i <- 0 until 16) {
      val x = 8 + i % 4
      assert(got(i) == 4 * x + 6, s"x=$x") // 4(x+1.5) = 4x+6
    }
    // integer MV far out of frame: every sample clamps to the border
    val gotFar = mcOne(ref, w, h, -400, -400, 2)
    assert(gotFar.forall(_ == 0))
    val gotFar2 = mcOne(ref, w, h, 400, 400, 2)
    assert(gotFar2.forall(_ == ((4 * (w - 1)) & 0xff)))
  }

  // ------------------------------------------- merge / AMVP derivations

  /** A 32x32 Pic with hand-placed decoded-inter 8x8 blocks. */
  private def gridPic(motions: Seq[(Int, Int, Int, Int)]): H265Decode.Pic = {
    val pic = new H265Decode.Pic(32, 32)
    motions.foreach { case (x, y, mvx, mvy) =>
      pic.setMotion(x, y, 8, mvx, mvy, skip = false)
      pic.markLuma(x, y, 8)
    }
    pic
  }

  test("merge candidates: §8.5.3.2.3 order A1 B1 B0 A0 B2 with pruning") {
    // current PU: 8x8 at (8, 8). Neighbors:
    //   A1 = (7, 15)  in block (0,8)   mv (4, 0)
    //   B1 = (15, 7)  in block (8,0)   mv (8, 4)
    //   B0 = (16, 7)  in block (16,0)  mv (12, -4)
    //   A0 = (7, 16)  in block (0,16)  mv (-4, 8)
    //   B2 = (7, 7)   in block (0,0)   mv (16, 16)
    val pic = gridPic(Seq((0, 8, 4, 0), (8, 0, 8, 4), (16, 0, 12, -4),
      (0, 16, -4, 8), (0, 0, 16, 16)))
    val cands = H265Inter.mergeCandidates(pic, 8, 8, 8, 8, 5)
    // four spatial candidates already present → B2 must be SKIPPED
    // (§8.5.3.2.3 admits B2 only when fewer than four so far); the
    // fifth slot is the zero-MV fill
    assert(cands == IndexedSeq((4, 0), (8, 4), (12, -4), (-4, 8), (0, 0)))

    // pruning: B1 == A1 drops B1; B0 == B1 drops B0; A0 == A1 drops A0;
    // B2 (≠ A1, ≠ B1) is admitted with only one candidate so far
    val pic2 = gridPic(Seq((0, 8, 4, 0), (8, 0, 4, 0), (16, 0, 4, 0),
      (0, 16, 4, 0), (0, 0, 16, 16)))
    val cands2 = H265Inter.mergeCandidates(pic2, 8, 8, 8, 8, 5)
    assert(cands2 == IndexedSeq((4, 0), (16, 16), (0, 0), (0, 0), (0, 0)))

    // B0 equal to A1 but different from B1 is NOT pruned (the spec
    // compares B0 against B1 only)
    val pic3 = gridPic(Seq((0, 8, 4, 0), (8, 0, 8, 4), (16, 0, 4, 0)))
    assert(H265Inter.mergeCandidates(pic3, 8, 8, 8, 8, 5).take(3) ==
      IndexedSeq((4, 0), (8, 4), (4, 0)))

    // no inter neighbors at all → zero-MV fill
    val empty = new H265Decode.Pic(32, 32)
    assert(H265Inter.mergeCandidates(empty, 8, 8, 8, 8, 5) ==
      IndexedSeq.fill(5)((0, 0)))
  }

  test("AMVP: first-of {A0,A1}, first-of {B0,B1,B2}, dedup, zero fill") {
    // A0 present at (7,16); B1 present at (15,7)
    val pic = gridPic(Seq((0, 16, -4, 8), (8, 0, 8, 4)))
    assert(H265Inter.amvpCandidates(pic, 8, 8, 8, 8) ==
      IndexedSeq((-4, 8), (8, 4)))
    // A0 absent → A1; B0 absent, B1 absent → B2
    val pic2 = gridPic(Seq((0, 8, 4, 0), (0, 0, 16, 16)))
    assert(H265Inter.amvpCandidates(pic2, 8, 8, 8, 8) ==
      IndexedSeq((4, 0), (16, 16)))
    // A == B → B dropped, zero fills slot 2
    val pic3 = gridPic(Seq((0, 8, 4, 0), (8, 0, 4, 0)))
    assert(H265Inter.amvpCandidates(pic3, 8, 8, 8, 8) ==
      IndexedSeq((4, 0), (0, 0)))
    // nothing available → two zero candidates
    val empty = new H265Decode.Pic(32, 32)
    assert(H265Inter.amvpCandidates(empty, 8, 8, 8, 8) ==
      IndexedSeq((0, 0), (0, 0)))
  }

  // ----------------------------------------------------- GOP round-trips

  private def planes(w: Int, h: Int, seed: Int,
      shift: Int = 0): (Array[Byte], Array[Byte], Array[Byte]) = {
    val rnd = new scala.util.Random(seed)
    val base = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (40 + ((x * 5 + y * 3) % 160) + rnd.nextInt(17)).toByte
    }
    val sy = Array.tabulate(w * h) { i =>
      val x = (i % w - shift + w) % w
      base((i / w) * w + x)
    }
    val scb = Array.tabulate((w / 2) * (h / 2))(i =>
      (90 + (i % (w / 2)) + (seed % 7)).toByte)
    val scr = Array.tabulate((w / 2) * (h / 2))(_ => (120 + seed % 11).toByte)
    (sy, scb, scr)
  }

  private def roundTrip(frames: Seq[(Array[Byte], Array[Byte], Array[Byte])],
      w: Int, h: Int, iLayout: Seq[H265Encode.CuTree],
      pLayouts: Seq[Seq[H265Encode.CuTree]], qp: Int,
      ctbLog2: Int = 5): Seq[H264Decode.Frame] = {
    val (stream, recons) = H265Encode.encodeGop(frames, w, h, iLayout,
      pLayouts, qp, ctbLog2 = ctbLog2)
    val decoded = H265Decode.decodeAnnexBPictures(stream, maxFrames = 16)
    assert(decoded.size == recons.size, "picture count")
    decoded.zip(recons).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f.luma.toSeq == r.luma.toSeq, s"picture $i luma")
      assert(f.cb.toSeq == r.cb.toSeq, s"picture $i cb")
      assert(f.cr.toSeq == r.cr.toSeq, s"picture $i cr")
    }
    decoded
  }

  import H265Encode.{CuLeaf, CuSplit, InterLeaf}

  test("GOP round-trip: static content decodes as all-skip P") {
    val w = 64; val h = 32
    val f0 = planes(w, h, 1)
    val iLayout = Seq.fill(2)(CuLeaf(Seq(1)): H265Encode.CuTree)
    // same source again: zero MV merges (first CU via zero-fill
    // candidate), residual zero at qp 20 only if recon == source?
    // No — P predicts from the IDR RECON, so residual is the IDR's
    // quantization error. Use dropResidual to force skip everywhere.
    val pLayout = Seq.fill(2)(InterLeaf(0, 0, dropResidual = true):
      H265Encode.CuTree)
    val decoded = roundTrip(Seq(f0, f0), w, h, iLayout, Seq(pLayout), 24)
    // all-skip P picture reproduces the IDR recon exactly
    assert(decoded(0).luma.toSeq == decoded(1).luma.toSeq)
    assert(decoded(0).cb.toSeq == decoded(1).cb.toSeq)
  }

  test("GOP round-trip: integer-MV translation + residual (merge/AMVP)") {
    val w = 64; val h = 32
    val f0 = planes(w, h, 2)
    val f1 = planes(w, h, 2, shift = 4) // content moves 4 px right
    val iLayout = Seq.fill(2)(CuLeaf(Seq(0)): H265Encode.CuTree)
    // MV (16, 0) quarter-pel = +4 px; first CU must take the AMVP path
    // (no inter neighbors yet), the second merges with the first
    val pLayout = Seq.fill(2)(InterLeaf(16, 0): H265Encode.CuTree)
    val decoded = roundTrip(Seq(f0, f1), w, h, iLayout, Seq(pLayout), 22)
    assert(decoded.size == 2)
  }

  test("GOP round-trip: quarter/half-pel and negative MVs") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 3)
    val f1 = planes(w, h, 4)
    val iLayout = Seq(CuLeaf(Seq(26)): H265Encode.CuTree)
    for (mv <- Seq((1, 0), (2, 3), (-5, 7), (-13, -2), (37, 21))) {
      val pLayout = Seq(InterLeaf(mv._1, mv._2): H265Encode.CuTree)
      roundTrip(Seq(f0, f1), w, h, iLayout, Seq(pLayout), 24)
    }
  }

  test("GOP round-trip: out-of-frame MVs clamp identically") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 5)
    val f1 = planes(w, h, 6)
    val iLayout = Seq(CuLeaf(Seq(10)): H265Encode.CuTree)
    for (mv <- Seq((-200, -200), (300, 0), (0, 300), (250, -250))) {
      val pLayout = Seq(InterLeaf(mv._1, mv._2): H265Encode.CuTree)
      roundTrip(Seq(f0, f1), w, h, iLayout, Seq(pLayout), 26)
    }
  }

  test("GOP round-trip: split CTBs, intra CUs inside the P slice") {
    val w = 64; val h = 64
    val f0 = planes(w, h, 7)
    val f1 = planes(w, h, 8)
    val iLayout = Seq.fill(4)(CuLeaf(Seq(1)): H265Encode.CuTree)
    def interSplit(mv: (Int, Int)): H265Encode.CuTree =
      CuSplit(InterLeaf(mv._1, mv._2), CuLeaf(Seq(26)),
        InterLeaf(0, 0, dropResidual = true), InterLeaf(mv._1, mv._2))
    val pLayout = Seq(interSplit((4, 0)), CuLeaf(Seq(0)),
      interSplit((-2, 6)), InterLeaf(8, 8))
    roundTrip(Seq(f0, f1), w, h, iLayout, Seq(pLayout), 24)
  }

  test("GOP round-trip: three chained P pictures (P refs P)") {
    val w = 32; val h = 32
    val fs = (0 to 3).map(i => planes(w, h, 10 + i))
    val iLayout = Seq(CuLeaf(Seq(1)): H265Encode.CuTree)
    val pLayouts = Seq(
      Seq(InterLeaf(3, 1): H265Encode.CuTree),
      Seq(InterLeaf(-2, 2): H265Encode.CuTree),
      Seq(InterLeaf(0, 0): H265Encode.CuTree))
    val decoded = roundTrip(fs, w, h, iLayout, pLayouts, 24)
    assert(decoded.size == 4)
  }

  test("low-QP P recon tracks the source (residuals are live)") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 20)
    val f1 = planes(w, h, 21)
    val iLayout = Seq(CuLeaf(Seq(1)): H265Encode.CuTree)
    val pLayout = Seq(InterLeaf(2, -3): H265Encode.CuTree)
    val decoded = roundTrip(Seq(f0, f1), w, h, iLayout, Seq(pLayout), 4)
    val err = decoded(1).luma.zip(f1._1).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff))
    }
    assert(err.sum.toDouble / err.length < 1.5, "mean abs luma error")
  }

  test("decodeAnnexBIntraPictures stops at the first P picture") {
    val w = 32; val h = 32
    val (stream, _) = H265Encode.encodeGop(
      Seq(planes(w, h, 30), planes(w, h, 31)), w, h,
      Seq(CuLeaf(Seq(1))), Seq(Seq(InterLeaf(4, 4))), 24)
    assert(H265Decode.decodeAnnexBIntraPictures(stream).size == 1)
    assert(H265Decode.decodeAnnexBPictures(stream).size == 2)
  }

  test("mvd binarization round-trips across magnitude classes") {
    val w = new H264.BitWriter
    val ctx = H265Cabac.contextsP(26)
    val e = new H264Cabac.Encoder(w, ctx)
    val vals = Seq((0, 0), (1, 0), (0, -1), (2, 2), (-7, 13), (255, -4096),
      (-32768, 32767))
    vals.foreach { case (x, y) => H265Cabac.encodeMvd(e, x, y) }
    e.terminate(1)
    val r = new H264.BitReader(w.stop())
    val d = new H264Cabac.Decoder(r, H265Cabac.contextsP(26))
    vals.foreach { v => assert(H265Cabac.decodeMvd(d) == v) }
  }

  test("merge_idx binarization round-trips at every cMax") {
    for (maxCand <- 1 to 5) {
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w, H265Cabac.contextsP(30))
      (0 until maxCand).foreach(i => H265Cabac.encodeMergeIdx(e, i, maxCand))
      e.terminate(1)
      val d = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
        H265Cabac.contextsP(30))
      (0 until maxCand).foreach(i =>
        assert(H265Cabac.decodeMergeIdx(d, maxCand) == i, s"cands $maxCand"))
    }
  }

  test("bit-flip fuzz over the P slice never hangs or escapes") {
    val w = 32; val h = 32
    val (stream, _) = H265Encode.encodeGop(
      Seq(planes(w, h, 40), planes(w, h, 41)), w, h,
      Seq(CuLeaf(Seq(1))), Seq(Seq(InterLeaf(5, -3))), 24)
    val rnd = new scala.util.Random(7)
    // the P slice sits in the tail half of the stream
    for (_ <- 0 until 300) {
      val mutated = stream.clone()
      val pos = stream.length / 2 + rnd.nextInt(stream.length / 2)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      val out = H265Decode.decodeAnnexBPictures(mutated, maxFrames = 4)
      assert(out.size <= 4)
    }
  }
}
