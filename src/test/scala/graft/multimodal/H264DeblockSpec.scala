package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** §8.7 in-loop deblocking pins — the r11 second codec-ladder rung.
  * Provenance posture as everywhere in this package (no reference
  * decoder in the container), with BOTH pin styles:
  *
  *  - an INDEPENDENT in-test reimplementation of the filter for
  *    all-intra pictures (its own 2D-matrix structure, §8.7 transcribed
  *    separately from H264Deblock's per-plane in-place walk) compared
  *    against the decoder over a 2x2-MB flat-block picture whose edges
  *    exercise the full-strong, weak-strong and no-filter bS-4 branches
  *    at once;
  *  - HAND-COMPUTED literal cases where the closed form is derivable on
  *    paper: the P-slice bS-1 normal filter over flat sides (tc
  *    clipping, p1/q1 adjustments), and the in-loop property itself
  *    (a P_Skip copy must reproduce the FILTERED reference — a
  *    display-pass filter fails this structurally).
  */
class H264DeblockSpec extends AnyFunSuite {

  /** Independent §8.7 reimplementation for ALL-INTRA frame pictures at
    * a uniform QP with zero filter offsets: bS = 4 on MB edges, 3
    * inside; per MB (raster order) vertical edges left→right then
    * horizontal top→bottom; luma only (callers assert chroma flatness
    * separately). Operates on a mutable 2D Int matrix.
    */
  private def refFilterIntra(px: Array[Array[Int]], mbW: Int, mbH: Int,
      qp: Int): Unit = {
    val alpha = H264Deblock.alphaTab(qp); val beta = H264Deblock.betaTab(qp)
    val tc0i = H264Deblock.tc0Tab(qp)(2) // bS 3 column for internal edges
    def clip3(lo: Int, hi: Int, v: Int) = math.max(lo, math.min(hi, v))
    // filter one line across an edge; sample(i) for i in -4..3 maps to
    // p3..p0,q0..q3; returns the replacement values map
    def line(bS: Int, s: Int => Int): Map[Int, Int] = {
      val p0 = s(-1); val q0 = s(0); val p1 = s(-2); val q1 = s(1)
      if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
        math.abs(q1 - q0) >= beta) return Map.empty
      val p2 = s(-3); val q2 = s(2)
      val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
      if (bS < 4) {
        val tc0 = H264Deblock.tc0Tab(qp)(bS - 1)
        val tc = tc0 + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
        val d = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
        var out = Map(-1 -> clip3(0, 255, p0 + d), 0 -> clip3(0, 255, q0 - d))
        if (ap < beta)
          out += (-2 -> (p1 + clip3(-tc0, tc0,
            (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)))
        if (aq < beta)
          out += (1 -> (q1 + clip3(-tc0, tc0,
            (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)))
        out
      } else {
        val small = math.abs(p0 - q0) < ((alpha >> 2) + 2)
        var out = Map.empty[Int, Int]
        if (small && ap < beta) {
          out += (-1 -> ((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3))
          out += (-2 -> ((p2 + p1 + p0 + q0 + 2) >> 2))
          out += (-3 -> ((2 * s(-4) + 3 * p2 + p1 + p0 + q0 + 4) >> 3))
        } else out += (-1 -> ((2 * p1 + p0 + q1 + 2) >> 2))
        if (small && aq < beta) {
          out += (0 -> ((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3))
          out += (1 -> ((q2 + q1 + q0 + p0 + 2) >> 2))
          out += (2 -> ((2 * s(3) + 3 * q2 + q1 + q0 + p0 + 4) >> 3))
        } else out += (0 -> ((2 * q1 + q0 + p1 + 2) >> 2))
        out
      }
    }
    val tcu = tc0i // silence unused warning path symmetry
    require(tcu >= 0)
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      for (e <- 0 until 4; if e > 0 || mbX > 0) { // vertical edges
        val x = mbX * 16 + e * 4
        val bS = if (e == 0) 4 else 3
        for (y <- mbY * 16 until mbY * 16 + 16) {
          val repl = line(bS, d => px(y)(x + d))
          repl.foreach { case (d, v) => px(y)(x + d) = v }
        }
      }
      for (e <- 0 until 4; if e > 0 || mbY > 0) { // horizontal edges
        val y = mbY * 16 + e * 4
        val bS = if (e == 0) 4 else 3
        for (x <- mbX * 16 until mbX * 16 + 16) {
          val repl = line(bS, d => px(y + d)(x))
          repl.foreach { case (d, v) => px(y + d)(x) = v }
        }
      }
    }
  }

  test("all-intra deblocking == independent reimplementation (full/weak/no-filter bS-4 branches)") {
    // qp 16: alpha 4, beta 2 — flat-block diffs of 2 (full strong),
    // 3 (weak strong) and >= 4 (unfiltered) exercise all three branches
    val means = Array(Array(100, 102), Array(103, 140))
    val qp = 16
    val (stream, recon) = H264Encode.encodeI16x16Dc(means, qp, deblock = true)
    val dec = H264Decode.decodeAnnexBPictures(stream, 2)
    assert(dec.size === 1)
    val f = dec.head
    // unfiltered ground truth: the same content with the filter off
    val (off, recon2) = H264Encode.encodeI16x16Dc(means, qp)
    val unf = H264Decode.decodeAnnexBPictures(off, 2).head
    assert(recon.flatten.toSeq == recon2.flatten.toSeq)
    assert(!java.util.Arrays.equals(f.luma, unf.luma),
      "the filter must be live (some edge diff is inside alpha)")
    // independent expectation: reimplementation over the unfiltered pixels
    val W = 32; val H = 32
    val m = Array.tabulate(H, W)((y, x) => unf.luma(y * W + x) & 0xff)
    refFilterIntra(m, 2, 2, qp)
    for (y <- 0 until H; x <- 0 until W)
      assert((f.luma(y * W + x) & 0xff) === m(y)(x), s"($x,$y)")
    // chroma is flat 128 everywhere: filtering is the identity there
    assert(java.util.Arrays.equals(f.cb, unf.cb))
    assert(java.util.Arrays.equals(f.cr, unf.cr))
  }

  test("P-slice bS-1 normal filter: hand-computed tc clip and p1/q1 adjustments over flat sides") {
    // IDR (deblocking OFF -> exact flat recon) with left MB A, right MB
    // B; P slice at qp 36 (alpha 40, beta 10, tc0(bS 1) = 2 per Table
    // 8-17's bS-1 row ...,33:2,34:2,35:2,36:2,37:3,...), MB0 mv (0,0),
    // MB1 mv (4,0) = 1 whole pel -> bS 1 at the MB edge (|mvd| >= 4),
    // bS 0 everywhere else (uniform motion, no residual, same ref).
    // Hand closed form for flat sides (ap = aq = 0 -> tc = tc0+2 = 4):
    //   delta = clip(+-4, (3d + 4) >> 3)
    //   p1'   = A + clip(+-2, ((d+1)>>1) >> 1)
    //   q1'   = B + clip(+-2, (((d+1)>>1) - d) >> 1)
    val (idr, recon) = H264Encode.encodeI16x16Dc(Array(Array(100, 120)), 26)
    val a = recon(0)(0); val b = recon(0)(1); val d = b - a
    assert(d > 0 && d < 40, s"flat diff $d must be filterable at qp 36")
    val p = H264Encode.encodeP16x16(
      Array(Array((0, 0), (4, 0))), qp = 36, poc = 2, deblock = true)
    val frames = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, p))))
    assert(frames.size === 2)
    val W = 32
    def clip3(lo: Int, hi: Int, v: Int) = math.max(lo, math.min(hi, v))
    val delta = clip3(-4, 4, (3 * d + 4) >> 3)
    val p1e = a + clip3(-2, 2, ((d + 1) >> 1) >> 1)
    val q1e = b + clip3(-2, 2, (((d + 1) >> 1) - d) >> 1)
    for (y <- 0 until 16) {
      val row = frames(1).luma.slice(y * W, y * W + 32).map(_ & 0xff)
      for (x <- 0 until 32) {
        val expect = x match {
          case 14 => p1e
          case 15 => a + delta
          case 16 => b - delta
          case 17 => q1e
          case _ => if (x < 16) a else b
        }
        assert(row(x) === expect, s"($x,$y) d=$d")
      }
    }
  }

  test("in-loop property: P_Skip reproduces the FILTERED reference exactly") {
    // IDR with a filterable edge, deblocking ON; all-skip P. The P
    // picture's own edges are all bS 0 (skip: same mv, same ref, no
    // coefficients, not intra), so its pixels are a pure copy of the
    // stored reference. A decoder filtering at display instead of
    // in-loop would emit the UNFILTERED reference here.
    val (idr, _) = H264Encode.encodeI16x16Dc(
      Array(Array(100, 102)), 16, deblock = true)
    val pskip = H264Encode.encodePSkipFrame(2, 1)
    val frames = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, pskip))))
    assert(frames.size === 2)
    assert(java.util.Arrays.equals(frames(0).luma, frames(1).luma))
    assert(java.util.Arrays.equals(frames(0).cb, frames(1).cb))
    // and the filter was live on the IDR
    val (off, _) = H264Encode.encodeI16x16Dc(Array(Array(100, 102)), 16)
    val unf = H264Decode.decodeAnnexBPictures(off, 1).head
    assert(!java.util.Arrays.equals(frames(0).luma, unf.luma))
  }

  test("dual-entropy differential: deblocked CABAC GOP pixels == CAVLC, all three init idc") {
    val means = Array(Array(100, 102), Array(103, 140))
    val (idr, _) = H264Encode.encodeI16x16Dc(means, 16, deblock = true)
    val p = H264Encode.encodeP16x16(
      Array.fill(2, 2)((4, 0)), qp = 36, poc = 2, deblock = true)
    val base = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, p))))
    assert(base.size === 2)
    for (idc <- 0 to 2) {
      val (idrC, _) = H264Encode.encodeCabacI16x16Dc(means, 16, deblock = true)
      val pC = H264Encode.encodeCabacP16x16(Array.fill(2, 2)((4, 0)),
        qp = 36, initIdc = idc, poc = 2, deblock = true)
      val fr = H264Decode.decodeAnnexBPictures(
        idrC ++ H264Encode.annexB(Seq((1, 3, pC))))
      assert(fr.size === 2, s"idc $idc")
      for (k <- 0 until 2) {
        assert(java.util.Arrays.equals(fr(k).luma, base(k).luma), s"idc $idc luma $k")
        assert(java.util.Arrays.equals(fr(k).cb, base(k).cb), s"idc $idc cb $k")
      }
    }
  }

  test("deblocking over B slices rejects (out of r11 scope), never decodes wrong") {
    val (idr, _) = H264Encode.encodeI16x16Dc(Array(Array(100, 102)), 16)
    val p = H264Encode.encodeP16x16(Array.fill(1, 2)((0, 0)), poc = 4)
    // hand-write a B slice header with the filter enabled
    val w = new H264.BitWriter
    w.ue(0); w.ue(6); w.ue(0) // first_mb, slice_type B, pps_id
    w.u(2, 4); w.u(2, 4) // frame_num, poc lsb 2
    w.flag(true) // direct_spatial
    w.flag(false) // no num_ref_idx override
    w.flag(false); w.flag(false) // no list modification
    w.se(0) // slice_qp_delta
    w.ue(0); w.se(0); w.se(0) // deblocking ON
    w.ue(2) // mb_skip_run: whole picture
    val b = H264.ebsp(w.stop())
    val frames = H264Decode.decodeAnnexBPictures(
      idr ++ H264Encode.annexB(Seq((1, 3, p), (1, 0, b))))
    // the I and P decode; the B is rejected, not fabricated
    assert(frames.size === 2)
  }
}
