package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC temporal MVP (r15, §8.5.3.2.8/9) — the second of the two named
  * gaps the r14 external vectors disabled. Decode is validated
  * bit-exact against x265 `temporal-mvp=1` streams (X265VectorSpec);
  * here: the derivation's unit semantics (C0/C1 selection, the 16x16
  * MV-storage masking, POC scaling, §8.5.3.2.9 list selection) and the
  * encoder twin (a TMVP-enabled own GOP decodes bit-exact, and the
  * flag genuinely changes the coded stream).
  */
class H265TmvpSpec extends AnyFunSuite {

  private def colPic(w: Int = 64, h: Int = 64): H265Decode.Pic = {
    val p = new H265Decode.Pic(w, h)
    p.tmvpRefPocs0 = IndexedSeq(0) // the pic's own L0: POC 0
    p
  }

  test("C0 bottom-right first, 16x16 masked; C1 center fallback; intra col unavailable") {
    val p = colPic()
    // inter motion over the 16x16 block at (16,16): C0 of PU (0,0)x16
    // lands at (16,16) -> masked (16,16)
    p.setMotion2(16, 16, 16, H265Inter.Mi(1, 12, -8, 0, 0), skip = false)
    val col = H265Inter.ColCtx(p, colPoc = 1, currPoc = 2, ctbLog2 = 5,
      allRefsBefore = true, colFromL0 = true)
    // same distance (td = 1-0 = 1, tb = 2-1 = 1): identity
    assert(H265Inter.tmvpMv(col, 0, 0, 16, 16, 0, targetRefPoc = 1)
      === Some((12, -8)))
    // C0 out of the picture (PU at the right/bottom edge): falls to the
    // CENTER cell (48+8, 48+8) = (56,56) -> masked (48,48) — intra there
    assert(H265Inter.tmvpMv(col, 48, 48, 16, 16, 0, 1).isEmpty)
    p.setMotion2(48, 48, 16, H265Inter.Mi(1, 4, 4, 0, 0), skip = false)
    assert(H265Inter.tmvpMv(col, 48, 48, 16, 16, 0, 1) === Some((4, 4)))
    // masking: PU (0,0)x8 -> C0 at (8,8) masks to (0,0) which is intra;
    // center (4,4) masks to (0,0) too -> unavailable
    assert(H265Inter.tmvpMv(col, 0, 0, 8, 8, 0, 1).isEmpty)
  }

  test("POC scaling doubles/halves the collocated MV") {
    val p = colPic()
    p.setMotion2(16, 16, 16, H265Inter.Mi(1, 10, -6, 0, 0), skip = false)
    // col at POC 1 references POC 0 (td 1); current POC 4 targets POC 2
    // (tb 2) -> scale x2
    val col = H265Inter.ColCtx(p, colPoc = 1, currPoc = 4, ctbLog2 = 5,
      allRefsBefore = true, colFromL0 = true)
    assert(H265Inter.tmvpMv(col, 0, 0, 16, 16, 0, targetRefPoc = 2)
      === Some(H265Inter.scaleMv(10, -6, 2, 1)))
    assert(H265Inter.scaleMv(10, -6, 2, 1) === ((20, -12)))
  }

  test("§8.5.3.2.9 list selection: only-list, both-lists x NoBackwardPred") {
    val p = colPic()
    p.tmvpRefPocs1 = IndexedSeq(4)
    // both lists coded on the col cell with distinct MVs
    p.setMotion2(16, 16, 16, H265Inter.Mi(3, 8, 0, -8, 0), skip = false)
    // all current refs before: listCol = requested list
    val before = H265Inter.ColCtx(p, colPoc = 2, currPoc = 3, ctbLog2 = 5,
      allRefsBefore = true, colFromL0 = true)
    assert(H265Inter.tmvpMv(before, 0, 0, 16, 16, 0, 1)
      === Some(H265Inter.scaleMv(8, 0, 3 - 1, 2 - 0)))
    assert(H265Inter.tmvpMv(before, 0, 0, 16, 16, 1, 1)
      === Some(H265Inter.scaleMv(-8, 0, 3 - 1, 2 - 4)))
    // backward refs exist: listCol = the list collocated_from_l0 points
    // away from (L1 when col is the L0 pic)
    val mixed = H265Inter.ColCtx(p, colPoc = 2, currPoc = 3, ctbLog2 = 5,
      allRefsBefore = false, colFromL0 = true)
    assert(H265Inter.tmvpMv(mixed, 0, 0, 16, 16, 0, 1)
      === Some(H265Inter.scaleMv(-8, 0, 3 - 1, 2 - 4)))
    // L1-only col cell always serves L1's motion
    val q = colPic(); q.tmvpRefPocs1 = IndexedSeq(4)
    q.setMotion2(16, 16, 16, H265Inter.Mi(2, 0, 0, 6, 2), skip = false)
    val c2 = H265Inter.ColCtx(q, colPoc = 2, currPoc = 3, ctbLog2 = 5,
      allRefsBefore = true, colFromL0 = true)
    assert(H265Inter.tmvpMv(c2, 0, 0, 16, 16, 0, 1)
      === Some(H265Inter.scaleMv(6, 2, 3 - 1, 2 - 4)))
  }

  test("C0 outside the CTB row of the PU is skipped") {
    val p = colPic(64, 64)
    // motion at the C0 cell (below the CTB row) AND a different motion
    // at the center cell: the center must win for a PU ending at the
    // CTB boundary (ctbLog2 5: yPb 16..31, yBr 32 -> next CTB row)
    p.setMotion2(32, 32, 16, H265Inter.Mi(1, 40, 40, 0, 0), skip = false)
    p.setMotion2(16, 16, 16, H265Inter.Mi(1, 2, 2, 0, 0), skip = false)
    val col = H265Inter.ColCtx(p, colPoc = 1, currPoc = 2, ctbLog2 = 5,
      allRefsBefore = true, colFromL0 = true)
    assert(H265Inter.tmvpMv(col, 16, 16, 16, 16, 0, 1) === Some((2, 2)))
    // with a 64-CTB SPS the same PU keeps C0
    val col64 = H265Inter.ColCtx(p, colPoc = 1, currPoc = 2, ctbLog2 = 6,
      allRefsBefore = true, colFromL0 = true)
    assert(H265Inter.tmvpMv(col64, 16, 16, 16, 16, 0, 1) === Some((40, 40)))
  }

  private def frames(w: Int, h: Int, dx: Int): Seq[(Array[Byte], Array[Byte], Array[Byte])] =
    (0 to 2).map { k =>
      val rnd = new scala.util.Random(95)
      (Array.tabulate(w * h) { i =>
        val x = (i % w - k * dx + 4 * w) % w
        (30 + ((x * 7 + (i / w) * 3) % 185) + rnd.nextInt(23)).toByte
      },
        Array.tabulate(w * h / 4)(i => (96 + (i + k) % 37).toByte),
        Array.tabulate(w * h / 4)(i => (118 + (i + 2 * k) % 11).toByte))
    }

  test("encoder twin: TMVP-enabled P GOP decodes bit-exact; stream differs from TMVP-off") {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(1504)
    val iLayout: Seq[H265Encode.CuTree] =
      Seq.fill(8)(H265Encode.CuLeaf(Seq(rnd.nextInt(35))))
    def pics(): Seq[H265Encode.GopPic] = Seq(
      H265Encode.GopPic(1, 1, Seq.fill(8)(
        if (rnd.nextInt(3) == 0) H265Encode.CuLeaf(Seq(rnd.nextInt(35)))
        else H265Encode.InterLeaf(8, 0): H265Encode.CuTree)),
      H265Encode.GopPic(2, 1, Seq.fill(8)(
        if (rnd.nextInt(4) == 0) H265Encode.CuLeaf(Seq(rnd.nextInt(35)))
        else H265Encode.InterLeaf(8, 0): H265Encode.CuTree), negDelta = 1))
    val layouts = pics()
    val (on, onRecons) = H265Encode.encodeGopB(frames(w, h, 2), w, h,
      iLayout, layouts, qp = 27, temporalMvp = true)
    val (off, _) = H265Encode.encodeGopB(frames(w, h, 2), w, h,
      iLayout, layouts, qp = 27)
    assert(!java.util.Arrays.equals(on, off),
      "TMVP must change the coded candidate indexes/stream")
    val sps = H265.nalUnitsAnnexB(on).find(_.nalType == H265.NalSps).get.payload
    assert(H265.parseSps(sps).exists(_.temporalMvp))
    val dec = H265Decode.decodeAnnexBPictures(on, maxFrames = 4,
      displayOrder = true)
    assert(dec.size == onRecons.size)
    for ((d, r) <- dec.zip(onRecons)) {
      assert(java.util.Arrays.equals(d.luma, r.luma))
      assert(java.util.Arrays.equals(d.cb, r.cb))
      assert(java.util.Arrays.equals(d.cr, r.cr))
    }
  }

  test("encoder twin: TMVP-enabled B GOP decodes bit-exact") {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(1505)
    val iLayout: Seq[H265Encode.CuTree] =
      Seq.fill(8)(H265Encode.CuLeaf(Seq(rnd.nextInt(35))))
    val pLayout: Seq[H265Encode.CuTree] = Seq.fill(8) {
      if (rnd.nextInt(3) == 0) H265Encode.CuLeaf(Seq(rnd.nextInt(35)))
      else H265Encode.InterLeaf(8, 0)
    }
    val bLayout: Seq[H265Encode.CuTree] = Seq.fill(8) {
      rnd.nextInt(3) match {
        case 0 => H265Encode.BiLeaf(3, 4, 0, -4, 0)
        case 1 => H265Encode.BiLeaf(1, 4, 0)
        case _ => H265Encode.CuLeaf(Seq(rnd.nextInt(35)))
      }
    }
    val (stream, recons) = H265Encode.encodeGopB(frames(w, h, 1), w, h,
      iLayout, Seq(
        H265Encode.GopPic(2, 1, pLayout, negDelta = 2),
        H265Encode.GopPic(1, 0, bLayout, isRef = false)),
      qp = 27, temporalMvp = true)
    val dec = H265Decode.decodeAnnexBPictures(stream, maxFrames = 4,
      displayOrder = true)
    assert(dec.size == recons.size)
    for ((d, r) <- dec.zip(recons)) {
      assert(java.util.Arrays.equals(d.luma, r.luma))
      assert(java.util.Arrays.equals(d.cb, r.cb))
      assert(java.util.Arrays.equals(d.cr, r.cr))
    }
  }
}
