package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The decode paths no generator-produced fixture exercises yet: I_4x4
  * LUMA RESIDUALS (per-4x4 CAVLC blocks gated by coded_block_pattern,
  * with the nC neighbor-context updates) and the CHROMA DC + AC chain
  * (2x2 Hadamard, §8.5.11 scaling, chroma-QP mapping). The bitstream is
  * hand-rolled here with the same BitWriter/H264Cavlc primitives an
  * encoder uses, and the EXPECTED pixels are computed by an independent
  * in-test reimplementation of the §8.5 dequant/IDCT chain (matrix
  * form) — not by the decoder under test.
  */
class H264ResidualSpec extends AnyFunSuite {

  /** Independent §8.5.12 reference: dequantize (raster 4x4, optionally
    * sparing the DC slot) then exact integer inverse transform with the
    * final (x + 32) >> 6 rounding — straight matrix arithmetic, no
    * shared code with H264Decode.
    */
  private def refResidual(raster: Array[Int], qp: Int, skipDc: Boolean): Array[Int] = {
    val scaleRows = Array(
      Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
      Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
    val v = scaleRows(qp % 6)
    def cls(i: Int, j: Int) =
      if (i % 2 == 0 && j % 2 == 0) 0 else if (i % 2 == 1 && j % 2 == 1) 1 else 2
    val d = Array.tabulate(4, 4) { (i, j) =>
      val c = raster(i * 4 + j)
      if (skipDc && i == 0 && j == 0) c
      else (c * v(cls(i, j))) << (qp / 6)
    }
    // inverse core transform as explicit matrix products:
    // Ci rows per §8.5.12.2 (the (1, 1/2) butterflies), integer form
    val tmp = Array.ofDim[Int](4, 4)
    for (i <- 0 until 4) {
      val (a, b, c2, e) = (d(i)(0), d(i)(1), d(i)(2), d(i)(3))
      tmp(i)(0) = a + c2 + b + (e >> 1)
      tmp(i)(1) = a - c2 + (b >> 1) - e
      tmp(i)(2) = a - c2 - (b >> 1) + e
      tmp(i)(3) = a + c2 - b - (e >> 1)
    }
    val out = new Array[Int](16)
    for (j <- 0 until 4) {
      val (a, b, c2, e) = (tmp(0)(j), tmp(1)(j), tmp(2)(j), tmp(3)(j))
      out(j) = (a + c2 + b + (e >> 1) + 32) >> 6
      out(4 + j) = (a - c2 + (b >> 1) - e + 32) >> 6
      out(8 + j) = (a - c2 - (b >> 1) + e + 32) >> 6
      out(12 + j) = (a + c2 - b - (e >> 1) + 32) >> 6
    }
    out
  }

  private def clip(v: Int) = math.max(0, math.min(255, v))

  test("I_4x4 with full luma + chroma residuals decodes to independently computed pixels") {
    // single-MB frame, all-DC prediction (no neighbors → pred 128 luma
    // and chroma), cbp = 47 (luma 15 | chroma 2: DC + AC coded)
    val qp = 26
    val w = new H264.BitWriter
    w.ue(0); w.ue(7); w.ue(0) // first_mb, slice_type I, pps_id
    w.u(0, 4); w.ue(0); w.u(0, 4) // frame_num, idr_pic_id, poc_lsb
    w.flag(false); w.flag(false) // dec_ref_pic_marking
    w.se(qp - 26) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc

    w.ue(0) // mb_type I_4x4
    for (_ <- 0 until 16) w.flag(true) // all blocks: use predicted mode (DC=2)
    w.ue(0) // intra_chroma_pred_mode DC
    w.ue(H264Decode.cbpIntraToCodeNum(47)) // cbp 47: luma 15, chroma 2
    w.se(0) // mb_qp_delta

    // deterministic per-block luma coefficients in SCAN order (sparse,
    // mixed signs, DC + a few ACs)
    def lumaScan(b: Int): Array[Int] = {
      val a = new Array[Int](16)
      a(0) = 5 + b // DC
      a(1) = if (b % 2 == 0) -3 else 2
      a(4) = if (b % 3 == 0) 1 else 0
      a
    }
    // luma residual blocks in §6.4.3 block scan order; nC context: this
    // is the only MB, so nC for block b comes from already-decoded
    // in-MB neighbors — replicate the decoder's bookkeeping
    val nnz = Array.fill(4, 4)(-1) // -1 = unavailable
    for (b <- 0 until 16) {
      val (x4, y4) = H264Decode.blockScan(b)
      val nA = if (x4 > 0) nnz(y4)(x4 - 1) else -1
      val nB = if (y4 > 0) nnz(y4 - 1)(x4) else -1
      val nC =
        if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
        else if (nA >= 0) nA else if (nB >= 0) nB else 0
      nnz(y4)(x4) = H264Cavlc.encodeResidualBlock(w, lumaScan(b), nC)
    }
    // chroma DC (4 coeffs, nC = -1): Cb then Cr
    val cbDc = Array(8, -4, 2, 0)
    val crDc = Array(-6, 0, 3, 1)
    H264Cavlc.encodeResidualBlock(w, cbDc, -1)
    H264Cavlc.encodeResidualBlock(w, crDc, -1)
    // chroma AC (15 coeffs each, 4 blocks per component); nC from chroma
    // neighbor bookkeeping (single MB → only in-MB left/top neighbors)
    def chromaScan(c: Int, b: Int): Array[Int] = {
      val a = new Array[Int](15)
      a(0) = (if (c == 0) 2 else -2) + b
      if (b == 3) a(2) = 1
      a
    }
    for (c <- 0 until 2) {
      val cn = Array.fill(2, 2)(-1)
      for (b <- 0 until 4) {
        val (x2, y2) = (b % 2, b / 2)
        val nA = if (x2 > 0) cn(y2)(x2 - 1) else -1
        val nB = if (y2 > 0) cn(y2 - 1)(x2) else -1
        val nC =
          if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
          else if (nA >= 0) nA else if (nB >= 0) nB else 0
        cn(y2)(x2) = H264Cavlc.encodeResidualBlock(w, chromaScan(c, b), nC)
      }
    }

    val stream = H264Encode.annexB(Seq(
      (7, 3, H264.writeSps(16, 16)),
      (8, 3, H264.writePps()),
      (5, 3, H264.ebsp(w.stop()))))
    val frame = H264Decode.decodeIdrFrameUnsafe(stream).getOrElse(fail("decode failed"))

    // ---- expected luma: sequential reference reconstruction — each
    // block's DC prediction averages the RECONSTRUCTED neighbors (only
    // the frame-corner block predicts flat 128)
    val buf = Array.fill(16 * 16)(0)
    for (b <- 0 until 16) {
      val (x4, y4) = H264Decode.blockScan(b)
      val raster = new Array[Int](16)
      val scan = lumaScan(b)
      for (k <- 0 until 16) raster(H264Decode.zigzag4x4(k)) = scan(k)
      val res = refResidual(raster, qp, skipDc = false)
      val (px, py) = (x4 * 4, y4 * 4)
      val availL = px > 0; val availT = py > 0
      var sum = 0; var cnt = 0
      if (availT) { for (x <- 0 until 4) sum += buf((py - 1) * 16 + px + x); cnt += 4 }
      if (availL) { for (y <- 0 until 4) sum += buf((py + y) * 16 + px - 1); cnt += 4 }
      val pred = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
      for (y <- 0 until 4; x <- 0 until 4)
        buf((py + y) * 16 + px + x) = clip(pred + res(y * 4 + x))
    }
    for (y <- 0 until 16; x <- 0 until 16)
      assert((frame.luma(y * 16 + x) & 0xff) == buf(y * 16 + x), s"luma ($x,$y)")

    // ---- expected chroma: pred 128 + (2x2 Hadamard DC ref) + AC refs
    val qpc = H264Decode.chromaQp(qp) // chroma_qp_index_offset = 0 in writePps
    val lsc = Array(10, 11, 13, 14, 16, 18)(qpc % 6)
    def chromaExpected(dcIn: Array[Int], c: Int): Array[Int] = {
      // independent 2x2 Hadamard + §8.5.11 scaling
      val f = Array(
        dcIn(0) + dcIn(1) + dcIn(2) + dcIn(3),
        dcIn(0) - dcIn(1) + dcIn(2) - dcIn(3),
        dcIn(0) + dcIn(1) - dcIn(2) - dcIn(3),
        dcIn(0) - dcIn(1) - dcIn(2) + dcIn(3))
      val dc = f.map(x => ((x * lsc) << (qpc / 6)) >> 5)
      val out = new Array[Int](64)
      for (b <- 0 until 4) {
        val raster = new Array[Int](16)
        raster(0) = dc(b)
        val scan = chromaScan(c, b)
        for (k <- 0 until 15) raster(H264Decode.zigzag4x4(k + 1)) = scan(k)
        val res = refResidual(raster, qpc, skipDc = true)
        val (bx, by) = ((b % 2) * 4, (b / 2) * 4)
        for (y <- 0 until 4; x <- 0 until 4)
          out((by + y) * 8 + bx + x) = clip(128 + res(y * 4 + x))
      }
      out
    }
    val expCb = chromaExpected(cbDc, 0)
    val expCr = chromaExpected(crDc, 1)
    for (y <- 0 until 8; x <- 0 until 8) {
      assert((frame.cb(y * 8 + x) & 0xff) == expCb(y * 8 + x), s"cb ($x,$y)")
      assert((frame.cr(y * 8 + x) & 0xff) == expCr(y * 8 + x), s"cr ($x,$y)")
    }
  }
}
