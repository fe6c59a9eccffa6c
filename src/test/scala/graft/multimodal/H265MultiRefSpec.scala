package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC multi-reference P slices (r13): ref_idx_l0 syntax, multi-entry
  * short-term RPS with differential delta coding, L0 construction in
  * RPS order, per-refIdx AMVP (same-list SCALING becomes real — a
  * neighbor predicting from a farther reference scales by the POC
  * ratio), zero-merge refIdx progression, and GOP round-trips where a
  * CU's content exists only through the farther reference.
  */
class H265MultiRefSpec extends AnyFunSuite {

  import H265Encode.{CuLeaf, GopPic, InterLeaf}
  import H265Inter.Mi

  test("ref_idx TR binarization round-trips at every active count") {
    for (active <- 1 to 5) {
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w, H265Cabac.contextsP(26))
      (0 until active).foreach(i => H265Cabac.encodeRefIdx(e, i, active))
      e.terminate(1)
      val d = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
        H265Cabac.contextsP(26))
      (0 until active).foreach(i =>
        assert(H265Cabac.decodeRefIdx(d, active) == i, s"active $active"))
    }
    // active 1: no bins at all — the writer emits nothing
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, H265Cabac.contextsP(26))
    H265Cabac.encodeRefIdx(e, 0, 1)
    e.terminate(1)
    assert(w.stop().length <= 2, "ref_idx at one active ref costs no bins")
  }

  test("AMVP scales a neighbor's farther-reference MV by the POC ratio") {
    // current P at POC 3 with L0 = [POC 2 (refIdx 0), POC 0 (refIdx 1)].
    // A0 predicts from refIdx 1 (distance 3): targeting refIdx 0
    // (distance 1) misses both same-POC passes and scales by 1/3:
    // tb = 1, td = 3 → tx = (16384+1)/3 = 5461, dsf = (5461+32)>>6 = 85
    // (85·24 = 2040, (2040+127)>>8 = 8) → 24 → 8
    val pic = new H265Decode.Pic(32, 32)
    pic.setMotion2(0, 16, 8, Mi(1, 24, -24, 0, 0, ref0 = 1), skip = false)
    pic.markLuma(0, 16, 8)
    assert(H265Inter.amvpCandidatesMi(pic, 8, 8, 8, 8, listX = 0,
      currPoc = 3, refPocs0 = IndexedSeq(2, 0), refPocs1 = IndexedSeq(0),
      refIdx = 0) == IndexedSeq((8, -8), (0, 0)))
    // targeting refIdx 1 (the SAME picture the neighbor used): the
    // same-list same-POC pass takes it unscaled
    assert(H265Inter.amvpCandidatesMi(pic, 8, 8, 8, 8, listX = 0,
      currPoc = 3, refPocs0 = IndexedSeq(2, 0), refPocs1 = IndexedSeq(0),
      refIdx = 1) == IndexedSeq((24, -24), (0, 0)))
  }

  test("zero merge candidates walk the reference indices (§8.5.3.2.5)") {
    val empty = new H265Decode.Pic(32, 32)
    val cands = H265Inter.mergeCandidatesMi(empty, 8, 8, 8, 8, 5,
      bSlice = false, refPocs0 = IndexedSeq(4, 2, 0),
      refPocs1 = IndexedSeq(0), numRefMerge = 3)
    assert(cands.map(_.ref0) == IndexedSeq(0, 1, 2, 0, 0))
    assert(cands.forall(c => c.dir == 1 && c.mv(0) == ((0, 0))))
    // merge inherits a neighbor's refIdx verbatim
    val pic = new H265Decode.Pic(32, 32)
    pic.setMotion2(0, 8, 8, Mi(1, 4, 0, 0, 0, ref0 = 1), skip = false)
    pic.markLuma(0, 8, 8)
    assert(H265Inter.mergeCandidatesMi(pic, 8, 8, 8, 8, 5,
      bSlice = false, refPocs0 = IndexedSeq(2, 0),
      refPocs1 = IndexedSeq(0), numRefMerge = 2).head ==
      Mi(1, 4, 0, 0, 0, 1, 0))
  }

  private def planes(w: Int, h: Int, seed: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val rnd = new scala.util.Random(seed)
    (Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (40 + ((x * 5 + y * 3) % 160) + rnd.nextInt(17)).toByte
    },
      Array.tabulate((w / 2) * (h / 2))(i => (90 + (i % (w / 2))).toByte),
      Array.tabulate((w / 2) * (h / 2))(_ => (120 + seed % 11).toByte))
  }

  private def one(t: H265Encode.CuTree): Seq[H265Encode.CuTree] = Seq(t)

  test("multiref GOP: a CU predicting the FARTHER reference round-trips") {
    val w = 32; val h = 32
    // alternating content A, B, A: P2's best reference is the IDR
    // (identical content) at refIdx 1 — a refIdx-0 prediction would
    // see frame B
    val fA = planes(w, h, 1)
    val fB = planes(w, h, 2)
    val pics = Seq(
      GopPic(1, 1, one(InterLeaf(0, 0))),
      GopPic(2, 1, one(InterLeaf(0, 0, dropResidual = true, refIdx = 1)),
        negDelta = 1, moreNegDeltas = Seq(2)))
    val (stream, recons) = H265Encode.encodeGopB(
      Seq(fA, fB, fA), w, h, one(CuLeaf(Seq(1))), pics, 24)
    val decoded = H265Decode.decodeAnnexBPictures(stream, maxFrames = 8)
    assert(decoded.size == 3)
    decoded.zip(recons).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f.luma.toSeq == r.luma.toSeq, s"picture $i luma")
      assert(f.cb.toSeq == r.cb.toSeq, s"picture $i cb")
    }
    // the refIdx-1 skip-style CU reproduced the IDR's recon EXACTLY
    // (content A) — proof the farther reference was used
    assert(decoded(2).luma.toSeq == decoded(0).luma.toSeq,
      "P2 must reconstruct the IDR content through refIdx 1")
    assert(decoded(2).luma.toSeq != decoded(1).luma.toSeq)
  }

  test("non-contiguous RPS deltas (1, 3) differential-encode and resolve") {
    val w = 32; val h = 32
    val fs = (0 to 3).map(i => planes(w, h, 10 + i))
    // decode order I0 P1 P2 P3; P3's RPS = {POC 2 (delta 1), POC 0
    // (delta 3)} — the differential second delta is (3−1)−1 = 1
    val pics = Seq(
      GopPic(1, 1, one(InterLeaf(2, -1))),
      GopPic(2, 1, one(InterLeaf(-1, 2))),
      GopPic(3, 1, one(H265Encode.CuSplit(
        InterLeaf(1, 0), InterLeaf(0, 0, refIdx = 1),
        InterLeaf(0, 1), InterLeaf(2, 2, dropResidual = true, refIdx = 1))),
        negDelta = 1, moreNegDeltas = Seq(3)))
    val (stream, recons) = H265Encode.encodeGopB(
      fs, w, h, one(CuLeaf(Seq(26))), pics, 22)
    val decoded = H265Decode.decodeAnnexBPictures(stream, maxFrames = 8)
    assert(decoded.size == 4)
    decoded.zip(recons).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f.luma.toSeq == r.luma.toSeq, s"picture $i")
    }
  }

  test("mixed-refIdx AMVP/merge interplay round-trips across seeds") {
    val w = 32; val h = 32
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      val fs = (0 to 2).map(i => planes(w, h, 20 + 7 * seed + i))
      val layout = one(H265Encode.CuSplit(
        InterLeaf(rnd.nextInt(9) - 4, rnd.nextInt(9) - 4, refIdx = rnd.nextInt(2)),
        InterLeaf(rnd.nextInt(9) - 4, rnd.nextInt(9) - 4, refIdx = rnd.nextInt(2)),
        CuLeaf(Seq(rnd.nextInt(35))),
        InterLeaf(rnd.nextInt(9) - 4, rnd.nextInt(9) - 4,
          dropResidual = rnd.nextBoolean(), refIdx = rnd.nextInt(2))))
      val pics = Seq(
        GopPic(1, 1, one(InterLeaf(1, 1))),
        GopPic(2, 1, layout, negDelta = 1, moreNegDeltas = Seq(2)))
      val (stream, recons) = H265Encode.encodeGopB(
        fs, w, h, one(CuLeaf(Seq(1))), pics, 24)
      val decoded = H265Decode.decodeAnnexBPictures(stream, maxFrames = 8)
      assert(decoded.size == 3, s"seed $seed")
      decoded.zip(recons).foreach { case (f, r) =>
        assert(f.luma.toSeq == r.luma.toSeq, s"seed $seed")
      }
    }
  }

  test("DPB sizes from sps_max_dec_pic_buffering, not a fixed 8 (r14)") {
    // parseSps pins the new field (writer emits the MINUS1 value)
    val sps11 = H265.parseSps(H265.writeSpsPixel2(32, 32,
      decPicBuffering = 11)).get
    assert(sps11.deep && sps11.maxDecPicBuffering == 12)
    // level-limit clamp
    assert(H265.parseSps(H265.writeSpsPixel2(32, 32,
      decPicBuffering = 40)).get.maxDecPicBuffering == 16)

    // a conformant stream whose LAST P reaches 10 pictures back: IDR +
    // nine reference Ps (each a perfect skip of its predecessor), then
    // POC 10 whose ONLY RPS entry is the IDR. At decode time the DPB
    // holds 10 reference pictures — over the old fixed-8 FIFO, which
    // evicted the IDR and truncated the output.
    val w = 32; val h = 32
    val fA = planes(w, h, 7)
    val pics = (1 to 9).map(p => GopPic(p, 1, one(InterLeaf(0, 0)))) :+
      GopPic(10, 1, one(InterLeaf(0, 0)), negDelta = 10)
    val frames = Seq.fill(11)(fA)
    val (deepStream, recons) = H265Encode.encodeGopB(frames, w, h,
      one(CuLeaf(Seq(1))), pics, 24, decPicBuffering = 11)
    val decoded = H265Decode.decodeAnnexBPictures(deepStream, maxFrames = 16)
    assert(decoded.size == 11, "SPS-sized DPB must retain the IDR")
    // bit-exact against the encoder's decoder-twin recon — POC 10's
    // prediction resolves through the 10-back RPS entry, which only
    // exists if the IDR is still resident
    assert(decoded.last.luma.toSeq == recons.last.luma.toSeq)

    // the SAME coded pictures behind an SPS declaring only shallow
    // buffering (spliced in — the honest encoder now refuses to build
    // this GOP shallow, which is itself the fix working on the encode
    // side): the FIFO (max(8, sps)) drops the IDR before POC 10 needs
    // it, and decode truncates to the pictures-so-far — the documented
    // loud-reject posture, now SPS-governed
    intercept[IllegalArgumentException] {
      H265Encode.encodeGopB(frames, w, h, one(CuLeaf(Seq(1))), pics, 24)
    }
    val shallowStream = H265Encode.annexB(
      H265.nalUnitsAnnexB(deepStream).map { n =>
        val payload =
          if (n.nalType == H265.NalSps)
            H265.writeSpsPixel2(w, h, decPicBuffering = 3, reorderPics = 1)
          else n.payload
        (n.nalType, payload)
      })
    val truncated = H265Decode.decodeAnnexBPictures(shallowStream,
      maxFrames = 16)
    assert(truncated.size == 10, "shallow DPB truncates at the deep RPS")
  }

  test("bit-flip fuzz over a multiref P slice never hangs or escapes") {
    val w = 32; val h = 32
    val fs = (0 to 2).map(i => planes(w, h, 40 + i))
    val (stream, _) = H265Encode.encodeGopB(fs, w, h, one(CuLeaf(Seq(1))),
      Seq(GopPic(1, 1, one(InterLeaf(3, -2))),
        GopPic(2, 1, one(InterLeaf(0, 0, refIdx = 1)),
          negDelta = 1, moreNegDeltas = Seq(2))), 24)
    val rnd = new scala.util.Random(19)
    for (_ <- 0 until 200) {
      val mutated = stream.clone()
      val pos = stream.length / 2 + rnd.nextInt(stream.length / 2)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      assert(H265Decode.decodeAnnexBPictures(mutated, maxFrames = 4).size <= 4)
    }
  }
}
