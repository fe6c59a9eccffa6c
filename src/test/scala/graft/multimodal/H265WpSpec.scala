package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC explicit weighted prediction (r13 — the §8.5.4.2.3 weighted
  * sample forms over the tier-4 two-list machinery): pred_weight_table
  * syntax, the §7.4.7.3 chroma-offset prediction, weighted uni/bi
  * arithmetic, defaults ≡ unweighted, and fade GOP round-trips.
  */
class H265WpSpec extends AnyFunSuite {

  import H265Encode.{BiLeaf, CuLeaf, GopPic, InterLeaf}
  import H265Inter.{PredWeights, Wp}

  private def planes(w: Int, h: Int, seed: Int,
      scale: Double = 1.0): (Array[Byte], Array[Byte], Array[Byte]) = {
    val rnd = new scala.util.Random(seed)
    val sy = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val v = 40 + ((x * 5 + y * 3) % 160) + rnd.nextInt(17)
      math.min(255, (v * scale).toInt).toByte
    }
    val scb = Array.tabulate((w / 2) * (h / 2))(i =>
      (90 + (i % (w / 2))).toByte)
    val scr = Array.tabulate((w / 2) * (h / 2))(_ => (120 + seed % 11).toByte)
    (sy, scb, scr)
  }

  private def one(t: H265Encode.CuTree): Seq[H265Encode.CuTree] = Seq(t)

  private def roundTrip(frames: Seq[(Array[Byte], Array[Byte], Array[Byte])],
      w: Int, h: Int, pics: Seq[GopPic], qp: Int): Seq[H264Decode.Frame] = {
    val (stream, recons) = H265Encode.encodeGopB(frames, w, h,
      one(CuLeaf(Seq(1))), pics, qp)
    val decoded = H265Decode.decodeAnnexBPictures(stream, maxFrames = 16)
    assert(decoded.size == recons.size, "picture count")
    decoded.zip(recons).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f.luma.toSeq == r.luma.toSeq, s"picture $i luma")
      assert(f.cb.toSeq == r.cb.toSeq, s"picture $i cb")
      assert(f.cr.toSeq == r.cr.toSeq, s"picture $i cr")
    }
    decoded
  }

  test("weighted uni arithmetic matches the hand formula (fade halving)") {
    val w = 32; val h = 32
    val ref0 = new H265Decode.Pic(w, h)
    val rnd = new scala.util.Random(3)
    rnd.nextBytes(ref0.luma); rnd.nextBytes(ref0.cb); rnd.nextBytes(ref0.cr)
    val cur = new H265Decode.Pic(w, h)
    // denom 6: w = 32 halves, o = 10 lifts — integer MV so the 14-bit
    // intermediate is sample << 6 and the formula closes by hand:
    // clip(((s·64·32 + 2^11) >> 12) + 10) = clip((s·32 + 32·64) ... )
    val pw = PredWeights(6, 6, Wp(32, 10), Wp(64, 0), Wp(64, 0),
      Wp(64, 0), Wp(64, 0), Wp(64, 0))
    H265Inter.mcCuWp(ref0, null, cur, 8, 8, 8, H265Inter.Mi(1, 0, 0, 0, 0), pw)
    for (x <- 8 until 16; y <- 8 until 16) {
      val s = ref0.luma(y * w + x) & 0xff
      val want = math.min(255, math.max(0,
        (((s << 6) * 32 + (1 << 11)) >> 12) + 10))
      assert((cur.luma(y * w + x) & 0xff) == want, s"($x,$y)")
    }
    // chroma (block at (4,4)×4) carries default weights at denom 6:
    // ((c<<6)·64 + 2^12) >> 13 = c — identical to the source sample
    for (cx <- 4 until 8; cy <- 4 until 8)
      assert(cur.cb(cy * (w / 2) + cx) == ref0.cb(cy * (w / 2) + cx),
        s"cb($cx,$cy)")
  }

  test("weighted bi arithmetic matches the hand formula incl. offsets") {
    val w = 32; val h = 32
    val ref0 = new H265Decode.Pic(w, h)
    val ref1 = new H265Decode.Pic(w, h)
    val rnd = new scala.util.Random(5)
    rnd.nextBytes(ref0.luma); rnd.nextBytes(ref1.luma)
    val cur = new H265Decode.Pic(w, h)
    val pw = PredWeights(5, 5, Wp(48, -4), Wp(32, 0), Wp(32, 0),
      Wp(16, 7), Wp(32, 0), Wp(32, 0))
    H265Inter.mcCuWp(ref0, ref1, cur, 8, 8, 8, H265Inter.Mi(3, 0, 0, 0, 0), pw)
    val log2Wd = 5 + 6
    for (x <- 8 until 16; y <- 8 until 16) {
      val a = (ref0.luma(y * w + x) & 0xff) << 6
      val b = (ref1.luma(y * w + x) & 0xff) << 6
      val want = math.min(255, math.max(0,
        (a * 48 + b * 16 + ((-4 + 7 + 1) << log2Wd)) >> (log2Wd + 1)))
      assert((cur.luma(y * w + x) & 0xff) == want, s"($x,$y)")
    }
  }

  test("default weights reproduce unweighted MC exactly (uni and bi)") {
    val w = 32; val h = 32
    val ref0 = new H265Decode.Pic(w, h)
    val ref1 = new H265Decode.Pic(w, h)
    val rnd = new scala.util.Random(7)
    rnd.nextBytes(ref0.luma); rnd.nextBytes(ref0.cb); rnd.nextBytes(ref0.cr)
    rnd.nextBytes(ref1.luma); rnd.nextBytes(ref1.cb); rnd.nextBytes(ref1.cr)
    for (denom <- Seq(0, 3, 7);
         mi <- Seq(H265Inter.Mi(1, 5, -3, 0, 0), H265Inter.Mi(2, 0, 0, -7, 2),
           H265Inter.Mi(3, 1, 2, 3, -1))) {
      val a = new H265Decode.Pic(w, h)
      val b = new H265Decode.Pic(w, h)
      H265Inter.mcCuMi(ref0, ref1, a, 8, 8, 8, mi)
      H265Inter.mcCuWp(ref0, ref1, b, 8, 8, 8, mi,
        PredWeights.default(denom, denom))
      assert(b.luma.toSeq == a.luma.toSeq, s"denom $denom $mi luma")
      assert(b.cb.toSeq == a.cb.toSeq, s"denom $denom $mi cb")
    }
  }

  test("chroma offset round-trips the §7.4.7.3 prediction in the syntax") {
    // encode → decode a GOP whose chroma weights deviate, and verify
    // recon equality end-to-end (the writer emits delta_chroma_offset
    // = o + ((128·w >> denom) − 128); the reader inverts it)
    val w = 32; val h = 32
    val f0 = planes(w, h, 1)
    val fP = planes(w, h, 1, scale = 0.8)
    val pw = PredWeights(6, 5, Wp(51, 3), Wp(28, -9), Wp(35, 12),
      Wp(64, 0), Wp(32, 0), Wp(32, 0))
    roundTrip(Seq(f0, fP), w, h,
      Seq(GopPic(1, 1, one(InterLeaf(0, 0)), weights = Some(pw))), 22)
  }

  test("fade GOPs round-trip: weighted P and weighted-bi B") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 10)
    val fP = planes(w, h, 10, scale = 0.7) // fade toward black
    val fB = planes(w, h, 10, scale = 0.85)
    // P2 predicts the fade with w≈0.7·64=45; B1 mixes both refs
    val pwP = PredWeights(6, 6, Wp(45, 0), Wp(64, 0), Wp(64, 0),
      Wp(64, 0), Wp(64, 0), Wp(64, 0))
    val pwB = PredWeights(6, 6, Wp(54, 1), Wp(64, 0), Wp(64, 0),
      Wp(78, -2), Wp(64, 0), Wp(64, 0))
    val decoded = roundTrip(Seq(f0, fP, fB), w, h,
      Seq(GopPic(2, 1, one(InterLeaf(0, 0)), negDelta = 2,
        weights = Some(pwP)),
        GopPic(1, 0, one(BiLeaf(3, 0, 0, 0, 0)), isRef = false,
          weights = Some(pwB))), 20)
    assert(decoded.size == 3)
    // the weights are load-bearing: an unweighted encode of the same
    // structure reconstructs DIFFERENT samples
    val (_, reconsNoW) = H265Encode.encodeGopB(Seq(f0, fP, fB), w, h,
      one(CuLeaf(Seq(1))),
      Seq(GopPic(2, 1, one(InterLeaf(0, 0)), negDelta = 2),
        GopPic(1, 0, one(BiLeaf(3, 0, 0, 0, 0)), isRef = false)), 20)
    assert(decoded(2).luma.toSeq != reconsNoW(2).luma.toSeq)
  }

  test("mixed GOP: only the B slices carry tables when only B is weighted") {
    val w = 32; val h = 32
    val f0 = planes(w, h, 20)
    val fP = planes(w, h, 21)
    val fB = planes(w, h, 22)
    val pwB = PredWeights(4, 4, Wp(20, 0), Wp(16, 0), Wp(16, 0),
      Wp(12, 5), Wp(16, 0), Wp(16, 0))
    // the P picture carries no weights (weighted_pred_flag stays 0);
    // the B picture does (weighted_bipred_flag set)
    roundTrip(Seq(f0, fP, fB), w, h,
      Seq(GopPic(2, 1, one(InterLeaf(2, -1)), negDelta = 2),
        GopPic(1, 0, one(BiLeaf(3, 1, 0, -1, 0)), isRef = false,
          weights = Some(pwB))), 24)
  }

  test("bit-flip fuzz over a weighted GOP never hangs or escapes") {
    val w = 32; val h = 32
    val pw = PredWeights(6, 6, Wp(40, 2), Wp(64, 0), Wp(64, 0),
      Wp(88, -3), Wp(64, 0), Wp(64, 0))
    val (stream, _) = H265Encode.encodeGopB(
      Seq(planes(w, h, 30), planes(w, h, 31), planes(w, h, 32)), w, h,
      one(CuLeaf(Seq(1))),
      Seq(GopPic(2, 1, one(InterLeaf(5, -3)), negDelta = 2,
        weights = Some(pw)),
        GopPic(1, 0, one(BiLeaf(3, 2, 1, -2, -1)), isRef = false,
          weights = Some(pw))), 24)
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 200) {
      val mutated = stream.clone()
      val pos = stream.length / 2 + rnd.nextInt(stream.length / 2)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      assert(H265Decode.decodeAnnexBPictures(mutated, maxFrames = 4).size <= 4)
    }
  }
}
