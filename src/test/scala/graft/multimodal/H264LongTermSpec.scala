package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** H.264 long-term reference pictures + adaptive memory management
  * (MMCO, §7.3.3.3/§8.2.5 — r12): the IDR long_term_reference_flag,
  * MMCO ops 1/2/3/4/6, long-term-aware sliding window (only
  * short-term entries slide out) and §8.2.4.2 list initialization
  * (short-term by PicNum, then long-term by LongTermPicNum).
  *
  * Pinning strategy: hand-traced DPB evolutions over zero-residual
  * zero/known-MV GOPs whose every predicted macroblock must equal a
  * SPECIFIC reference picture's pixels — so a wrong eviction, a
  * missed long-term retention or a mis-ordered list lands on the
  * wrong anchor and fails pixel-exactly; the long-term flag must
  * CHANGE later content (anchor-vs-recent divergence pin); CAVLC and
  * CABAC tiers must agree; mutation fuzz must never escape.
  */
class H264LongTermSpec extends AnyFunSuite {

  private val qp = 26

  /** 4x4-MB anchor picture with per-MB distinct means. */
  private def anchorMeans: Array[Array[Int]] =
    Array.tabulate(4, 4)((my, mx) => 40 + 12 * (my * 4 + mx))

  private def mbLuma(f: H264Decode.Frame, mbX: Int, mbY: Int): Seq[Byte] =
    (0 until 16).flatMap(y =>
      (0 until 16).map(x => f.luma((mbY * 16 + y) * f.lumaStride + mbX * 16 + x)))

  /** GOP: IDR (long-term anchor) + P1 (pan, refs the anchor) +
    * P2 (checkerboard: ref 0 = P1, ref 1 = anchor) +
    * P3 (MMCO 1 drops P2 after decode) + P4 (ref 1 = the anchor —
    * only reachable if MMCO kept it and dropped P2).
    */
  private def ltGop(cabac: Boolean, longTerm: Boolean): Array[Byte] = {
    val pan: Array[Array[(Int, Int)]] = Array.fill(4, 4)((8, 0))
    val checker: Array[Array[(Int, (Int, Int))]] =
      Array.tabulate(4, 4)((my, mx) =>
        if ((mx + my) % 2 == 0) (0, (8, 0)) else (1, (0, 0)))
    val anchorMbs: Array[Array[(Int, (Int, Int))]] =
      Array.tabulate(4, 4)((my, mx) =>
        if (my < 2) (1, (0, 0)) else (0, (0, 0)))
    if (cabac)
      H264Encode.encodeCabacI16x16Dc(anchorMeans, qp, numRefFrames = 2,
        longTermRef = longTerm)._1 ++
        H264Encode.annexB(Seq(
          (1, 3, H264Encode.encodeCabacP16x16(pan, qp, poc = 2)),
          (1, 3, H264Encode.encodeCabacP16x16MultiRef(checker, 2, qp,
            poc = 4, frameNum = 2)),
          (1, 3, H264Encode.encodeCabacP16x16MultiRef(
            Array.fill(4, 4)((0, (0, 0))), 2, qp, poc = 6, frameNum = 3,
            mmco = Seq((1, 0, 0)))),
          (1, 3, H264Encode.encodeCabacP16x16MultiRef(anchorMbs, 2, qp,
            poc = 8, frameNum = 4))))
    else
      H264Encode.encodeI16x16Dc(anchorMeans, qp, numRefFrames = 2,
        longTermRef = longTerm)._1 ++
        H264Encode.annexB(Seq(
          (1, 3, H264Encode.encodeP16x16(pan, qp, poc = 2)),
          (1, 3, H264Encode.encodeP16x16MultiRef(checker, 2, qp,
            poc = 4, frameNum = 2)),
          (1, 3, H264Encode.encodeP16x16MultiRef(
            Array.fill(4, 4)((0, (0, 0))), 2, qp, poc = 6, frameNum = 3,
            mmco = Seq((1, 0, 0)))),
          (1, 3, H264Encode.encodeP16x16MultiRef(anchorMbs, 2, qp,
            poc = 8, frameNum = 4))))
  }

  test("long-term anchor GOP: hand-traced DPB keeps the anchor reachable at P4") {
    val frames = H264Decode.decodeAnnexBPictures(ltGop(cabac = false,
      longTerm = true), 8)
    assert(frames.size == 5, "IDR + 4 P pictures decode")
    val idr = frames(0)
    // P2's ref-1 (anchor, zero-MV) MBs equal the IDR pixels exactly;
    // its ref-0 MBs continue the pan (≠ anchor for non-uniform MBs)
    for (my <- 0 until 4; mx <- 0 until 4 if (mx + my) % 2 == 1)
      assert(mbLuma(frames(2), mx, my) == mbLuma(idr, mx, my),
        s"P2 anchor MB ($mx,$my)")
    // P4: top half refs the LONG-TERM anchor at zero MV — after the
    // sliding window would have evicted the IDR (max_num_ref_frames 2,
    // three short-term candidates since) and after MMCO 1 dropped P2.
    // Only correct marking semantics leave the anchor at ref_idx 1.
    for (my <- 0 until 2; mx <- 0 until 4)
      assert(mbLuma(frames(4), mx, my) == mbLuma(idr, mx, my),
        s"P4 anchor MB ($mx,$my)")
    // bottom half refs P3 (= P2's recon via zero MV = checkerboarded
    // pan) — at an even-parity MB the pan content must differ from the
    // anchor (odd-parity P2 MBs were themselves anchor copies)
    assert(mbLuma(frames(4), 0, 2) != mbLuma(idr, 0, 2),
      "P4 short-term MB must not read the anchor")
  }

  test("CAVLC and CABAC long-term GOPs decode pixel-identically") {
    val a = H264Decode.decodeAnnexBPictures(ltGop(cabac = false,
      longTerm = true), 8)
    val b = H264Decode.decodeAnnexBPictures(ltGop(cabac = true,
      longTerm = true), 8)
    assert(a.size == 5 && b.size == 5)
    a.zip(b).zipWithIndex.foreach { case ((fa, fb), i) =>
      assert(java.util.Arrays.equals(fa.luma, fb.luma), s"frame $i luma")
      assert(java.util.Arrays.equals(fa.cb, fb.cb), s"frame $i cb")
    }
  }

  test("the long-term flag is load-bearing: without it P4 reads a different picture") {
    val lt = H264Decode.decodeAnnexBPictures(ltGop(cabac = false,
      longTerm = true), 8)
    val noLt = H264Decode.decodeAnnexBPictures(ltGop(cabac = false,
      longTerm = false), 8)
    assert(lt.size == 5 && noLt.size == 5)
    // early pictures agree (the window hasn't evicted the IDR yet)
    assert(java.util.Arrays.equals(lt(1).luma, noLt(1).luma))
    // at P4, ref 1 is the anchor under LT marking but a recent
    // short-term without it — the decoded CONTENT must differ
    assert(!java.util.Arrays.equals(lt(4).luma, noLt(4).luma),
      "marking semantics must change which picture ref_idx 1 resolves to")
  }

  test("MMCO 3 converts a short-term picture to a long-term anchor") {
    // IDR (NOT long-term) + P1 + P2(mmco 3: IDR → LT idx 0) + P3 whose
    // ref 1 must still resolve to the IDR (the window alone would have
    // evicted it: 3 short-term candidates against max_num_ref_frames 2)
    val pan: Array[Array[(Int, Int)]] = Array.fill(4, 4)((8, 0))
    val stream =
      H264Encode.encodeI16x16Dc(anchorMeans, qp, numRefFrames = 2)._1 ++
        H264Encode.annexB(Seq(
          (1, 3, H264Encode.encodeP16x16(pan, qp, poc = 2)),
          (1, 3, H264Encode.encodeP16x16MultiRef(Array.fill(4, 4)((0, (8, 0))),
            2, qp, poc = 4, frameNum = 2, mmco = Seq((3, 1, 0)))),
          (1, 3, H264Encode.encodeP16x16MultiRef(
            Array.fill(4, 4)((1, (0, 0))), 2, qp, poc = 6, frameNum = 3))))
    val frames = H264Decode.decodeAnnexBPictures(stream, 8)
    assert(frames.size == 4)
    assert(java.util.Arrays.equals(frames(3).luma, frames(0).luma),
      "P3's ref 1 must be the MMCO-3-converted IDR anchor")
  }

  test("MMCO 2 unmarks a long-term reference; later demand rejects loudly") {
    val stream =
      H264Encode.encodeI16x16Dc(anchorMeans, qp, numRefFrames = 2,
        longTermRef = true)._1 ++
        H264Encode.annexB(Seq(
          (1, 3, H264Encode.encodeP16x16(Array.fill(4, 4)((0, 0)), qp,
            poc = 2)),
          // P2 drops the long-term anchor (MMCO 2, LongTermPicNum 0)
          (1, 3, H264Encode.encodeP16x16MultiRef(Array.fill(4, 4)((0, (0, 0))),
            1, qp, poc = 4, frameNum = 2, mmco = Seq((2, 0, 0)))),
          // P3 demands two references; the DPB now supplies P1+P2 only
          // if the window kept both — anchor gone, so ref 1 = P1
          (1, 3, H264Encode.encodeP16x16MultiRef(Array.fill(4, 4)((1, (0, 0))),
            2, qp, poc = 6, frameNum = 3))))
    val frames = H264Decode.decodeAnnexBPictures(stream, 8)
    assert(frames.size == 4)
    // ref 1 at P3 resolves to P1 (short-term), not the dropped anchor —
    // all pictures here are zero-MV copies of the IDR, so the real pin
    // is that decode SUCCEEDS with exactly two short-terms in the list
    assert(java.util.Arrays.equals(frames(3).luma, frames(0).luma))
  }

  test("MMCO 6 marks the current picture long-term; lists order by LongTermPicNum") {
    // IDR-LT0 + P1 (mmco 6 → LT idx 1) + P2 with numRef0 2: list0 is
    // all-long-term [IDR (idx 0), P1 (idx 1)] — ascending idx, NOT
    // recency order: ref 0 must be the IDR
    val pan: Array[Array[(Int, Int)]] = Array.fill(4, 4)((16, 0))
    val stream =
      H264Encode.encodeI16x16Dc(anchorMeans, qp, numRefFrames = 2,
        longTermRef = true)._1 ++
        H264Encode.annexB(Seq(
          (1, 3, H264Encode.encodeP16x16(pan, qp, poc = 2)),
          (1, 3, H264Encode.encodeP16x16MultiRef(Array.fill(4, 4)((0, (0, 0))),
            1, qp, poc = 4, frameNum = 2, mmco = Seq((6, 1, 0)))),
          (1, 3, H264Encode.encodeP16x16MultiRef(
            Array.tabulate(4, 4)((my, _) => if (my < 2) (0, (0, 0))
              else (1, (0, 0))), 2, qp, poc = 6, frameNum = 3))))
    val frames = H264Decode.decodeAnnexBPictures(stream, 8)
    assert(frames.size == 4)
    val idr = frames(0)
    for (mx <- 0 until 4) {
      // top half ref 0 = IDR (LongTermPicNum 0)
      assert(mbLuma(frames(3), mx, 0) == mbLuma(idr, mx, 0), s"ref0 MB $mx")
      // bottom half ref 1 = P2 (LT idx 1) = zero-MV copy of P1 (pan)
      assert(mbLuma(frames(3), mx, 3) == mbLuma(frames(2), mx, 3),
        s"ref1 MB $mx")
    }
    // pinned divergence: P1's pan makes ref0/ref1 content differ
    assert(mbLuma(frames(3), 1, 0) != mbLuma(frames(1), 1, 0) ||
      mbLuma(idr, 1, 0) != mbLuma(frames(1), 1, 0))
  }

  test("MMCO 4 caps the long-term index space") {
    // IDR-LT0 + P1 (mmco 6 → LT idx 1) + P2 (mmco 4 with
    // max_long_term_frame_idx_plus1 = 1 → drops LT idx 1, keeps idx 0)
    // + P3 demanding 2 refs: supplied by [P2 (short)] + [IDR (LT 0)]
    val stream =
      H264Encode.encodeI16x16Dc(anchorMeans, qp, numRefFrames = 2,
        longTermRef = true)._1 ++
        H264Encode.annexB(Seq(
          (1, 3, H264Encode.encodeP16x16(Array.fill(4, 4)((8, 0)), qp,
            poc = 2)),
          (1, 3, H264Encode.encodeP16x16MultiRef(Array.fill(4, 4)((0, (0, 0))),
            1, qp, poc = 4, frameNum = 2,
            mmco = Seq((6, 1, 0), (4, 1, 0)))),
          (1, 3, H264Encode.encodeP16x16MultiRef(
            Array.fill(4, 4)((1, (0, 0))), 2, qp, poc = 6, frameNum = 3))))
    // ops order: 6 marks current LT idx 1, then 4 (cap 1) drops it —
    // the current picture re-enters as... it was already inserted? No:
    // ops precede insertion, so op 4 caps BEFORE the current picture
    // lands with its op-6 idx. The decoder applies ops in order on the
    // DPB, then inserts the current with the op-6 mark: idx 1 SURVIVES
    // the earlier cap (it wasn't in the DPB yet). P3's ref 1 is then
    // the long-term idx 1 = P2 (zero-MV copy of P1's pan).
    val frames = H264Decode.decodeAnnexBPictures(stream, 8)
    assert(frames.size == 4)
    assert(java.util.Arrays.equals(frames(3).luma, frames(2).luma))
  }

  test("existing non-MMCO streams are bit-compatible (defaults unchanged)") {
    // the multi-ref corpus's exact bytes predate the MMCO fields: the
    // new encoder defaults must reproduce them
    val mbs: Array[Array[(Int, (Int, Int))]] = Array.fill(4, 4)((0, (4, 4)))
    val a = H264Encode.encodeP16x16MultiRef(mbs, 2, qp, poc = 2)
    val b = H264Encode.encodeP16x16MultiRef(mbs, 2, qp, poc = 2,
      frameNum = 1, mmco = Nil)
    assert(a.toSeq == b.toSeq)
  }

  test("mutation fuzz over MMCO streams never hangs or escapes") {
    val base = ltGop(cabac = false, longTerm = true)
    val baseC = ltGop(cabac = true, longTerm = true)
    val rnd = new scala.util.Random(31)
    for (src <- Seq(base, baseC); _ <- 0 until 200) {
      val mut = src.clone()
      mut(rnd.nextInt(mut.length)) = (mut(rnd.nextInt(mut.length)) ^
        (1 << rnd.nextInt(8))).toByte
      val out = H264Decode.decodeAnnexBPictures(mut, 8)
      assert(out.size <= 8)
    }
  }
}
