package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC inter tier 4 (r13): B slices — two reference lists, the
  * inter_pred_idc syntax, bi-prediction at 14-bit intermediate
  * precision, combined bi-predictive merge candidates, per-list AMVP
  * with the §8.5.3.2.7 cross-list / scaled passes, and the reordered
  * (decode ≠ display) GOP form with a non-reference TRAIL_N B.
  *
  * Pinning strategy mirrors H265InterSpec's (no external HEVC
  * conformance material in the container — the standing caveat):
  * hand-worked §8.5.3.2 candidate scenarios, an independent in-test
  * reimplementation of the §8.5.4.2 bi-pred arithmetic, hand-computed
  * §8.5.3.1.8 scaling values, whole-GOP encoder→decoder round-trips
  * across every signalling shape, and bit-flip fuzz.
  */
class H265BSliceSpec extends AnyFunSuite {

  import H265Encode.{BiLeaf, CuLeaf, CuSplit, GopPic, InterLeaf}
  import H265Inter.Mi

  // ------------------------------------------------------- context tables

  test("ctxInitB spot values are the initType-2 table rows") {
    // mn(v) = ((v >> 4)·5 − 45, ((v & 15) << 3) − 16), §9.3.2.2
    def mn(v: Int) = ((v >> 4) * 5 - 45, ((v & 15) << 3) - 16)
    val b = H265Cabac.ctxInitB
    assert(b(H265Cabac.CtxSaoType) == mn(160)) // B row: the old I bug's value
    assert(b(H265Cabac.CtxPredMode) == mn(134))
    assert(b(H265Cabac.CtxMergeFlag) == mn(154))
    assert(b(H265Cabac.CtxMergeIdx) == mn(137))
    assert(b(H265Cabac.CtxMvdGr0) == mn(169))
    assert(b(H265Cabac.CtxPrevIntraLuma) == mn(183))
    assert(b(H265Cabac.CtxTransSubdiv) == mn(224))
    assert(b(H265Cabac.CtxInterPredIdc + 0) == mn(95))
    assert(b(H265Cabac.CtxInterPredIdc + 4) == mn(31))
    // families where the B row equals the P row
    for (i <- 0 until 3)
      assert(b(H265Cabac.CtxCuSkip + i) ==
        H265Cabac.ctxInitP(H265Cabac.CtxCuSkip + i))
    for (i <- 0 until 4)
      assert(b(H265Cabac.CtxCsbf + i) ==
        H265Cabac.ctxInitP(H265Cabac.CtxCsbf + i))
    // and one where it differs (cbf_cb at depth 1: 92 vs P's 107)
    assert(b(H265Cabac.CtxCbfChroma + 1) == mn(92))
    assert(H265Cabac.ctxInitP(H265Cabac.CtxCbfChroma + 1) == mn(107))
  }

  test("inter_pred_idc binarization round-trips at every depth") {
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, H265Cabac.contextsB(26))
    val cases = for (d <- 0 to 3; idc <- 0 to 2) yield (d, idc)
    cases.foreach { case (d, idc) => H265Cabac.encodeInterPredIdc(e, d, idc) }
    e.terminate(1)
    val dec = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
      H265Cabac.contextsB(26))
    cases.foreach { case (d, idc) =>
      assert(H265Cabac.decodeInterPredIdc(dec, d) == idc, s"depth $d")
    }
  }

  // --------------------------------------------------------- MV scaling

  test("scaleMv matches hand-computed §8.5.3.1.8 values") {
    // tb = 1, td = 2 (B at POC 1 scaling a 2-distance MV): tx =
    // 16385/2 = 8192, dsf = (8192 + 32) >> 6 = 128 → exact halving
    // with the +127 rounding: 16 → 8, 15 → 7 ((1920+127)>>8), −15 → −7
    assert(H265Inter.scaleMv(16, -16, 1, 2) == ((8, -8)))
    assert(H265Inter.scaleMv(15, -15, 1, 2) == ((7, -7)))
    // tb = 1, td = −1 (cross-direction mirror): tx = −16384, dsf =
    // (−16384 + 32) >> 6 = −256 → exact negation
    assert(H265Inter.scaleMv(5, -9, 1, -1) == ((-5, 9)))
    assert(H265Inter.scaleMv(0, 0, 1, -1) == ((0, 0)))
    // tb = 2, td = 1 (doubling): tx = 16384, dsf = (32768+32)>>6 = 512
    assert(H265Inter.scaleMv(3, -7, 2, 1) == ((6, -14)))
    // tb == td is the identity (same target picture)
    assert(H265Inter.scaleMv(33, -21, 4, 4) == ((33, -21)))
    // clipping floor: huge dsf·mv clamps to the 16-bit MV range
    assert(H265Inter.scaleMv(30000, 0, 120, 1)._1 == 32767)
  }

  // ----------------------------------------- merge / AMVP B derivations

  /** A 32x32 Pic with hand-placed decoded-inter 8x8 blocks carrying
    * full motion info.
    */
  private def gridPic(motions: Seq[(Int, Int, Mi)]): H265Decode.Pic = {
    val pic = new H265Decode.Pic(32, 32)
    motions.foreach { case (x, y, mi) =>
      pic.setMotion2(x, y, 8, mi, skip = false)
      pic.markLuma(x, y, 8)
    }
    pic
  }

  test("B merge list: combined bi-predictive candidates (§8.5.3.2.4)") {
    // A1 is L0-only (4,0); B1 is L1-only (8,4): two spatial candidates,
    // then combIdx 0 pairs A1's L0 with B1's L1 → Mi(3,4,0,8,4);
    // combIdx 1 (B1's L0 half) is invalid; zero (bi) fills the rest
    val pic = gridPic(Seq((0, 8, Mi(1, 4, 0, 0, 0)),
      (8, 0, Mi(2, 0, 0, 8, 4))))
    val cands = H265Inter.mergeCandidatesMi(pic, 8, 8, 8, 8, 5,
      bSlice = true, refPocs0 = IndexedSeq(0), refPocs1 = IndexedSeq(2))
    assert(cands == IndexedSeq(Mi(1, 4, 0, 0, 0), Mi(2, 0, 0, 8, 4),
      Mi(3, 4, 0, 8, 4), Mi(3, 0, 0, 0, 0), Mi(3, 0, 0, 0, 0)))

    // two bi candidates: comb pairs (0,1) and (1,0) both valid
    val pic2 = gridPic(Seq((0, 8, Mi(3, 4, 0, -4, 0)),
      (8, 0, Mi(3, 8, 4, -8, 4))))
    val cands2 = H265Inter.mergeCandidatesMi(pic2, 8, 8, 8, 8, 5,
      bSlice = true, refPocs0 = IndexedSeq(0), refPocs1 = IndexedSeq(2))
    assert(cands2 == IndexedSeq(Mi(3, 4, 0, -4, 0), Mi(3, 8, 4, -8, 4),
      Mi(3, 4, 0, -8, 4), Mi(3, 8, 4, -4, 0), Mi(3, 0, 0, 0, 0)))

    // same-POC degenerate: refs at the SAME picture and equal MVs
    // reject the combination (the §8.5.3.2.4 validity clause)
    val pic3 = gridPic(Seq((0, 8, Mi(1, 4, 0, 0, 0)),
      (8, 0, Mi(2, 0, 0, 4, 0))))
    val cands3 = H265Inter.mergeCandidatesMi(pic3, 8, 8, 8, 8, 5,
      bSlice = true, refPocs0 = IndexedSeq(2), refPocs1 = IndexedSeq(2))
    assert(cands3(2) == Mi(3, 0, 0, 0, 0), "combined candidate rejected")

    // P slices never generate combined candidates and zero-fill uni
    val candsP = H265Inter.mergeCandidatesMi(pic, 8, 8, 8, 8, 5,
      bSlice = false)
    assert(candsP(2) == Mi(1, 0, 0, 0, 0))
  }

  test("B AMVP: cross-list scaled pass mirrors an opposite-direction MV") {
    // current B picture at POC 1, L0 ref POC 0, L1 ref POC 2. A0 is
    // L1-only with mv (6, -10): AMVP for L0 misses the same-list and
    // same-POC passes, then the scaled pass mirrors (tb = 1−0 = 1,
    // td = 1−2 = −1) → (−6, 10)
    val pic = gridPic(Seq((0, 16, Mi(2, 0, 0, 6, -10))))
    assert(H265Inter.amvpCandidatesMi(pic, 8, 8, 8, 8, listX = 0,
      currPoc = 1, refPocs0 = IndexedSeq(0), refPocs1 = IndexedSeq(2)) ==
      IndexedSeq((-6, 10), (0, 0)))
    // and for L1 the same-list pass takes it unscaled
    assert(H265Inter.amvpCandidatesMi(pic, 8, 8, 8, 8, listX = 1,
      currPoc = 1, refPocs0 = IndexedSeq(0), refPocs1 = IndexedSeq(2)) ==
      IndexedSeq((6, -10), (0, 0)))
    // asymmetric distances scale by the POC ratio: curr POC 2, L0 ref
    // POC 0, L1 ref 3; A0 L1-only mv (8, -16): tb = 2, td = −1 →
    // dsf = −512 → (−16, 32)
    val pic2 = gridPic(Seq((0, 16, Mi(2, 0, 0, 8, -16))))
    assert(H265Inter.amvpCandidatesMi(pic2, 8, 8, 8, 8, listX = 0,
      currPoc = 2, refPocs0 = IndexedSeq(0), refPocs1 = IndexedSeq(3)) ==
      IndexedSeq((-16, 32), (0, 0)))
    // when no A position is inter, A steals B's same-POC value and B
    // re-derives scaled: B1 bi (L0 (4,0), L1 (6,-2)) → A slot takes
    // L0's (4,0); B slot re-scans scaled and lands the same-list MV
    // identity-scaled — equal to A, so pruned to zero fill
    val pic3 = gridPic(Seq((8, 0, Mi(3, 4, 0, 6, -2))))
    assert(H265Inter.amvpCandidatesMi(pic3, 8, 8, 8, 8, listX = 0,
      currPoc = 1, refPocs0 = IndexedSeq(0), refPocs1 = IndexedSeq(2)) ==
      IndexedSeq((4, 0), (0, 0)))
  }

  // ------------------------------------------------ bi-pred arithmetic

  test("bi-prediction combines 14-bit intermediates (independent impl)") {
    val w = 32; val h = 32
    val rnd = new scala.util.Random(11)
    val ref0 = new H265Decode.Pic(w, h)
    val ref1 = new H265Decode.Pic(w, h)
    rnd.nextBytes(ref0.luma); rnd.nextBytes(ref0.cb); rnd.nextBytes(ref0.cr)
    rnd.nextBytes(ref1.luma); rnd.nextBytes(ref1.cb); rnd.nextBytes(ref1.cr)
    // independent §8.5.4.2.2/.3 luma path for one sample: horizontal
    // frac-only filtering at 14-bit, then (a + b + 64) >> 7
    def clamp(v: Int, n: Int) = math.max(0, math.min(n - 1, v))
    def pred14(p: Array[Byte], mvx: Int, mvy: Int, x: Int, y: Int): Int = {
      val xi = x + (mvx >> 2); val yi = y + (mvy >> 2)
      val xf = mvx & 3; val yf = mvy & 3
      require(yf == 0, "test helper is horizontal-only")
      if (xf == 0) (p(clamp(yi, h) * w + clamp(xi, w)) & 0xff) << 6
      else (0 until 8).map { i =>
        H265Inter.lumaFilters(xf)(i) *
          (p(clamp(yi, h) * w + clamp(xi + i - 3, w)) & 0xff)
      }.sum
    }
    for (mv0 <- Seq((0, 0), (1, 0), (2, 0), (3, 0), (-7, 0));
         mv1 <- Seq((0, 0), (5, 0), (-2, 0))) {
      val cur = new H265Decode.Pic(w, h)
      H265Inter.mcCuMi(ref0, ref1, cur, 8, 8, 8,
        Mi(3, mv0._1, mv0._2, mv1._1, mv1._2))
      for (x <- 8 until 16; y <- 8 until 16) {
        val a = pred14(ref0.luma, mv0._1, mv0._2, x, y)
        val b = pred14(ref1.luma, mv1._1, mv1._2, x, y)
        val want = math.max(0, math.min(255, (a + b + 64) >> 7))
        assert((cur.luma(y * w + x) & 0xff) == want, s"mv0=$mv0 mv1=$mv1 ($x,$y)")
      }
    }
    // and the uni paths agree with the rounded 14-bit form
    for (mv <- Seq((1, 0), (2, 0), (-5, 0))) {
      val cur = new H265Decode.Pic(w, h)
      H265Inter.mcCuMi(ref0, ref1, cur, 8, 8, 8, Mi(2, 0, 0, mv._1, mv._2))
      for (x <- 8 until 16; y <- 8 until 16) {
        val want = math.max(0, math.min(255,
          (pred14(ref1.luma, mv._1, mv._2, x, y) + 32) >> 6))
        assert((cur.luma(y * w + x) & 0xff) == want)
      }
    }
  }

  test("bi combine is NOT the average of rounded uni predictions") {
    // a/b = 14-bit intermediates: (a + b + 64) >> 7 differs from
    // averaging the rounded 8-bit outputs — e.g. a = b = 6368 + 31:
    // uni rounds to 100 each (avg 100), bi gives (12798+64)>>7 = 100;
    // a = 6368−1, b = 6368+65: uni 99 and 101 → naive avg 100, but
    // find a real divergent pair by scan and assert it exists
    val divergent = (0 until 1 << 14).exists { a =>
      val b = a + 95
      b < (1 << 14) && {
        val bi = (a + b + 64) >> 7
        val naive = (((a + 32) >> 6) + ((b + 32) >> 6) + 1) >> 1
        bi != naive
      }
    }
    assert(divergent, "14-bit combine must be observable vs naive averaging")
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

  /** Round-trip an I + GopPic structure; frames/pics in DECODE order,
    * comparison in DISPLAY order (both sides emit display order).
    */
  private def roundTrip(frames: Seq[(Array[Byte], Array[Byte], Array[Byte])],
      w: Int, h: Int, iLayout: Seq[H265Encode.CuTree],
      pics: Seq[GopPic], qp: Int): Seq[H264Decode.Frame] = {
    val (stream, recons) = H265Encode.encodeGopB(frames, w, h, iLayout,
      pics, qp)
    val decoded = H265Decode.decodeAnnexBPictures(stream, maxFrames = 16)
    assert(decoded.size == recons.size, "picture count")
    decoded.zip(recons).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f.luma.toSeq == r.luma.toSeq, s"display picture $i luma")
      assert(f.cb.toSeq == r.cb.toSeq, s"display picture $i cb")
      assert(f.cr.toSeq == r.cr.toSeq, s"display picture $i cr")
    }
    decoded
  }

  private def one(t: H265Encode.CuTree): Seq[H265Encode.CuTree] = Seq(t)

  test("I-P-B GOP round-trips; output is display order") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 1)
    val fP = planes(w, h, 2) // decode order: I(0), P(2), B(1)
    val fB = planes(w, h, 3)
    val decoded = roundTrip(Seq(f0, fP, fB), w, h, one(CuLeaf(Seq(1))),
      Seq(GopPic(2, 1, one(InterLeaf(3, -2)), negDelta = 2),
        GopPic(1, 0, one(BiLeaf(3, 2, 0, -2, 0)), isRef = false)), 24)
    assert(decoded.size == 3)
    // display order: the B picture (POC 1) sits between I and P —
    // verified bit-exact against its recon by roundTrip already; here
    // pin that it is NOT the P recon (reorder actually happened)
    assert(decoded(1).luma.toSeq != decoded(2).luma.toSeq)
  }

  test("B signalling shapes: skip, merge+residual, AMVP L0/L1/bi") {
    val w = 64; val h = 32
    val f0 = planes(w, h, 4)
    val fP = planes(w, h, 4, shift = 4)
    val fB = planes(w, h, 4, shift = 2)
    // CTB 0: AMVP bi (no neighbors yet → zero-fill merge cands won't
    // match (8,0)/(−8,0)); CTB 1: skip via merge with CTB 0's motion
    val bLayout = Seq(
      BiLeaf(3, 8, 0, -8, 0),
      BiLeaf(3, 8, 0, -8, 0, dropResidual = true))
    roundTrip(Seq(f0, fP, fB), w, h,
      Seq.fill(2)(CuLeaf(Seq(0)): H265Encode.CuTree),
      Seq(GopPic(2, 1, Seq.fill(2)(InterLeaf(16, 0): H265Encode.CuTree),
        negDelta = 2),
        GopPic(1, 0, bLayout, isRef = false)), 22)
    // uni-directional B CUs: list 0 only and list 1 only, with and
    // without residual, plus an intra CU inside the B slice
    val w2 = 64; val h2 = 64
    val g0 = planes(w2, h2, 5)
    val gP = planes(w2, h2, 6)
    val gB = planes(w2, h2, 7)
    val bLayout2 = Seq(
      BiLeaf(1, 5, -3),
      BiLeaf(2, 0, 0, -4, 2),
      CuLeaf(Seq(26)),
      CuSplit(BiLeaf(3, 1, 1, -1, -1), BiLeaf(1, 2, 0),
        BiLeaf(2, 0, 0, 7, 3, dropResidual = true), CuLeaf(Seq(10))))
    roundTrip(Seq(g0, gP, gB), w2, h2,
      Seq.fill(4)(CuLeaf(Seq(1)): H265Encode.CuTree),
      Seq(GopPic(2, 1, Seq.fill(4)(InterLeaf(0, 0): H265Encode.CuTree),
        negDelta = 2),
        GopPic(1, 0, bLayout2, isRef = false)), 24)
  }

  test("quarter-pel bi MVs and out-of-frame clamping round-trip") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 8)
    val fP = planes(w, h, 9)
    val fB = planes(w, h, 10)
    for (mvs <- Seq((1, 2, 3, 1), (-5, 7, 6, -2), (-250, 0, 0, 250),
        (37, 21, -13, -2))) {
      roundTrip(Seq(f0, fP, fB), w, h, one(CuLeaf(Seq(26))),
        Seq(GopPic(2, 1, one(InterLeaf(4, 4)), negDelta = 2),
          GopPic(1, 0, one(BiLeaf(3, mvs._1, mvs._2, mvs._3, mvs._4)),
            isRef = false)), 24)
    }
  }

  test("I0 P2 B1 P4 B3 chain: P refs P across a non-reference B") {
    val w = 32; val h = 32
    val fs = (0 to 4).map(i => planes(w, h, 20 + i))
    // decode order: I0, P2, B1, P4, B3 — B1 must NOT enter the DPB
    // (TRAIL_N), so P4's RPS delta-2 lookup lands on P2
    val decoded = roundTrip(fs, w, h, one(CuLeaf(Seq(1))),
      Seq(GopPic(2, 1, one(InterLeaf(3, 1)), negDelta = 2),
        GopPic(1, 0, one(BiLeaf(3, 1, 0, -1, 0)), isRef = false),
        GopPic(4, 1, one(InterLeaf(-2, 2)), negDelta = 2),
        GopPic(3, 0, one(BiLeaf(3, 0, 1, 0, -1)), isRef = false)), 24)
    assert(decoded.size == 5)
  }

  test("low-QP bi recon tracks the source (residuals live over bi-pred)") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 30)
    val fP = planes(w, h, 31)
    val fB = planes(w, h, 32)
    val decoded = roundTrip(Seq(f0, fP, fB), w, h, one(CuLeaf(Seq(1))),
      Seq(GopPic(2, 1, one(InterLeaf(2, -3)), negDelta = 2),
        GopPic(1, 0, one(BiLeaf(3, 1, 1, -1, -1)), isRef = false)), 4)
    val err = decoded(1).luma.zip(fB._1).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff))
    }
    assert(err.sum.toDouble / err.length < 1.5, "mean abs luma error")
  }

  test("cabac_init_flag swaps the P/B context tables and round-trips") {
    val w = 32; val h = 32
    val frames = Seq(planes(w, h, 50), planes(w, h, 51), planes(w, h, 52))
    val pics = Seq(GopPic(2, 1, one(InterLeaf(3, -2)), negDelta = 2),
      GopPic(1, 0, one(BiLeaf(3, 2, 1, -2, -1)), isRef = false))
    // swapped-table GOP decodes bit-exact...
    val (sw, reconsSw) = H265Encode.encodeGopB(frames, w, h,
      one(CuLeaf(Seq(1))), pics, 24, cabacInit = true)
    val decoded = H265Decode.decodeAnnexBPictures(sw, maxFrames = 8)
    assert(decoded.size == 3)
    decoded.zip(reconsSw).foreach { case (f, r) =>
      assert(f.luma.toSeq == r.luma.toSeq)
    }
    // ...the recon matches the unswapped encode of the same GOP (the
    // flag changes entropy coding only, never samples)...
    val (unsw, reconsUn) = H265Encode.encodeGopB(frames, w, h,
      one(CuLeaf(Seq(1))), pics, 24)
    reconsSw.zip(reconsUn).foreach { case (a, b) =>
      assert(a.luma.toSeq == b.luma.toSeq)
    }
    // ...and the streams genuinely differ (the flag is load-bearing:
    // a decoder ignoring it would desync)
    assert(sw.toSeq != unsw.toSeq)
  }

  test("bit-flip fuzz over the B slice never hangs or escapes") {
    val w = 32; val h = 32
    val (stream, _) = H265Encode.encodeGopB(
      Seq(planes(w, h, 40), planes(w, h, 41), planes(w, h, 42)), w, h,
      Seq(CuLeaf(Seq(1))),
      Seq(GopPic(2, 1, Seq(InterLeaf(5, -3)), negDelta = 2),
        GopPic(1, 0, Seq(BiLeaf(3, 2, 1, -2, -1)), isRef = false)), 24)
    val rnd = new scala.util.Random(13)
    // the B slice sits in the tail third of the stream
    for (_ <- 0 until 300) {
      val mutated = stream.clone()
      val pos = 2 * stream.length / 3 + rnd.nextInt(stream.length / 3)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      val out = H265Decode.decodeAnnexBPictures(mutated, maxFrames = 4)
      assert(out.size <= 4)
    }
  }
}
