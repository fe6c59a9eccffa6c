package graft.multimodal

/** H.264 in-loop deblocking filter (§8.7) — the r11 second codec-ladder
  * rung. Operates on a fully reconstructed picture (single-slice scope:
  * the per-MB state arrays — intra flags, per-MB QPy, per-4x4 nnz and
  * motion — are those the slice decode produced), macroblocks in raster
  * order, per MB all VERTICAL edges left-to-right then all HORIZONTAL
  * edges top-to-bottom, each edge reading the partially filtered
  * samples the previous edges wrote, exactly as §8.7's in-place
  * process specifies. 4x4 transform only (no 8x8 — transform_8x8 is
  * outside the decoder's profile scope), frame pictures, 4:2:0.
  *
  * Boundary strength (§8.7.2.1, frame-picture clauses):
  *   4 — macroblock edge with either side intra;
  *   3 — internal edge with either side intra;
  *   2 — either 4x4 block carries nonzero coefficients;
  *   1 — prediction differs: different reference PICTURE sets, a
  *       different motion-vector count, or any used vector pair
  *       differing by ≥ 4 quarter-pel in either component;
  *   0 — otherwise (no filtering).
  * P-slice pictures compare the single L0 reference per block
  * (reference identity = the DPB picture, compared here through the
  * per-block refIdx against each side's slice-level list — one slice
  * per picture, so equal refIdx ⟺ equal picture). B pictures are out
  * of the r11 deblocking scope and REJECT at the slice header when the
  * filter is enabled (see H264Decode) — a B stream with deblocking on
  * decodes wrong nowhere; it simply doesn't decode.
  *
  * Tables 8-16 (α, β) and 8-17 (t_C0) are transcribed from the spec;
  * the same provenance caveat as the CAVLC/CABAC tables applies
  * (validated by hand-computed cases + the encoder's decoys, no
  * reference decoder in this container).
  */
private[multimodal] object H264Deblock {

  // Table 8-16: alpha / beta by index 0..51
  val alphaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255)
  val betaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18)
  // Table 8-17: t_C0 by (index 0..51)(bS-1)
  val tc0Tab: Array[Array[Int]] = Array(
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0), Array(0, 0, 0),
    Array(0, 0, 0),
    Array(0, 0, 1), Array(0, 0, 1), Array(0, 0, 1), Array(0, 0, 1),
    Array(0, 1, 1), Array(0, 1, 1), Array(1, 1, 1), Array(1, 1, 1),
    Array(1, 1, 1), Array(1, 1, 1), Array(1, 1, 2), Array(1, 1, 2),
    Array(1, 1, 2), Array(1, 1, 2), Array(1, 2, 3), Array(1, 2, 3),
    Array(2, 2, 3), Array(2, 2, 4), Array(2, 3, 4), Array(2, 3, 4),
    Array(3, 3, 5), Array(3, 4, 6), Array(3, 4, 6), Array(4, 5, 7),
    Array(4, 5, 8), Array(4, 6, 9), Array(5, 7, 10), Array(6, 8, 11),
    Array(6, 8, 13), Array(7, 10, 14), Array(8, 11, 16), Array(9, 12, 18),
    Array(10, 13, 20), Array(11, 15, 23), Array(13, 17, 25))

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clip1(v: Int): Int = clip3(0, 255, v)

  /** Everything the bS derivation needs about the decoded picture.
    * `mbIntra`/`mbQp` are per-MB; nnz and motion per 4x4 luma block.
    * `chromaQpOff` = the PPS chroma_qp_index_offset; offsets A/B from
    * the slice header (slice_alpha_c0_offset_div2 << 1 etc.).
    */
  final class PicState(val mbW: Int, val mbH: Int,
      val mbIntra: Array[Boolean], val mbQp: Array[Int],
      val nnzLuma: Array[Int], val mv: H264Inter.MvGrid,
      val chromaQp: Int => Int,
      val offsetA: Int, val offsetB: Int)

  /** bS for the edge between luma 4x4 blocks p = (px4, py4) and
    * q = (qx4, qy4) (q is the current block; p its left/up neighbor).
    * `mbEdge` marks a macroblock boundary.
    */
  private def boundaryStrength(s: PicState, px4: Int, py4: Int,
      qx4: Int, qy4: Int, mbEdge: Boolean): Int = {
    val pMb = (py4 / 4) * s.mbW + px4 / 4
    val qMb = (qy4 / 4) * s.mbW + qx4 / 4
    val intra = s.mbIntra(pMb) || s.mbIntra(qMb)
    if (intra) return if (mbEdge) 4 else 3
    val w4 = s.mbW * 4
    if (s.nnzLuma(py4 * w4 + px4) > 0 || s.nnzLuma(qy4 * w4 + qx4) > 0)
      return 2
    // P-slice motion comparison: single L0 vector per block
    val rp = s.mv.refIdx(py4 * w4 + px4)
    val rq = s.mv.refIdx(qy4 * w4 + qx4)
    if (rp != rq) return 1
    val dx = s.mv.mvX(py4 * w4 + px4) - s.mv.mvX(qy4 * w4 + qx4)
    val dy = s.mv.mvY(py4 * w4 + px4) - s.mv.mvY(qy4 * w4 + qx4)
    if (dx <= -4 || dx >= 4 || dy <= -4 || dy >= 4) 1 else 0
  }

  /** Filter one 1-pixel line across an edge. `get`/`set` address
    * samples at signed distance from the edge: get(-1) = p0, get(0) =
    * q0, get(-2) = p1, … `chroma` selects the chroma clauses.
    */
  private def filterLine(bS: Int, alpha: Int, beta: Int, tc0: Int,
      chroma: Boolean, get: Int => Int, set: (Int, Int) => Unit): Unit = {
    val p0 = get(-1); val q0 = get(0)
    val p1 = get(-2); val q1 = get(1)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return
    if (bS < 4) {
      val p2 = get(-3); val q2 = get(2)
      val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
      val tc =
        if (chroma) tc0 + 1
        else tc0 + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      set(-1, clip1(p0 + delta))
      set(0, clip1(q0 - delta))
      if (!chroma && ap < beta)
        set(-2, p1 + clip3(-tc0, tc0,
          (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1))
      if (!chroma && aq < beta)
        set(1, q1 + clip3(-tc0, tc0,
          (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1))
    } else { // bS == 4, strong filter (§8.7.2.4)
      if (chroma) {
        set(-1, (2 * p1 + p0 + q1 + 2) >> 2)
        set(0, (2 * q1 + q0 + p1 + 2) >> 2)
        return
      }
      val p2 = get(-3); val q2 = get(2)
      val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
      val small = math.abs(p0 - q0) < ((alpha >> 2) + 2)
      if (small && ap < beta) {
        val p3 = get(-4)
        set(-1, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
        set(-2, (p2 + p1 + p0 + q0 + 2) >> 2)
        set(-3, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
      } else set(-1, (2 * p1 + p0 + q1 + 2) >> 2)
      if (small && aq < beta) {
        val q3 = get(3)
        set(0, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
        set(1, (q2 + q1 + q0 + p0 + 2) >> 2)
        set(2, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
      } else set(0, (2 * q1 + q0 + p1 + 2) >> 2)
    }
  }

  /** Deblock a full picture IN PLACE: luma + both chroma planes. */
  def filterPicture(s: PicState, luma: Array[Byte], cb: Array[Byte],
      cr: Array[Byte]): Unit = {
    val lStride = s.mbW * 16
    val cStride = s.mbW * 8
    var mbY = 0
    while (mbY < s.mbH) {
      var mbX = 0
      while (mbX < s.mbW) {
        val qpQ = s.mbQp(mbY * s.mbW + mbX)
        // ---- vertical edges (filter across columns), left to right:
        // edge e at luma x = mbX*16 + e*4 (e = 0 is the MB edge)
        var e = 0
        while (e < 4) {
          if (e > 0 || mbX > 0) {
            val qx4 = mbX * 4 + e
            val px4 = qx4 - 1
            val qpP =
              if (e > 0) qpQ else s.mbQp(mbY * s.mbW + mbX - 1)
            val qpAvg = (qpP + qpQ + 1) >> 1
            val idxA = clip3(0, 51, qpAvg + s.offsetA)
            val idxB = clip3(0, 51, qpAvg + s.offsetB)
            val alpha = alphaTab(idxA); val beta = betaTab(idxB)
            val cqp = (s.chromaQp(qpP) + s.chromaQp(qpQ) + 1) >> 1
            val cIdxA = clip3(0, 51, cqp + s.offsetA)
            val cIdxB = clip3(0, 51, cqp + s.offsetB)
            val cAlpha = alphaTab(cIdxA); val cBeta = betaTab(cIdxB)
            var seg = 0
            while (seg < 4) { // 4-row segments, one bS each
              val qy4 = mbY * 4 + seg
              val bS = boundaryStrength(s, px4, qy4, qx4, qy4, e == 0)
              if (bS > 0 && alpha > 0) {
                val tc0 = tc0Tab(idxA)(math.min(bS, 3) - 1)
                var row = 0
                while (row < 4) {
                  val y = (mbY * 16) + seg * 4 + row
                  val x = mbX * 16 + e * 4
                  filterLine(bS, alpha, beta, tc0, chroma = false,
                    d => luma(y * lStride + x + d) & 0xff,
                    (d, v) => luma(y * lStride + x + d) = v.toByte)
                  row += 1
                }
              }
              // chroma shares the luma bS; chroma edges exist only at
              // e = 0 and e = 2 (8-sample chroma blocks)
              if (bS > 0 && cAlpha > 0 && (e == 0 || e == 2)) {
                val ctc0 = tc0Tab(cIdxA)(math.min(bS, 3) - 1)
                val cx = mbX * 8 + (e / 2) * 4
                var row = 0
                while (row < 2) { // 2 chroma rows per luma segment row
                  val cy = mbY * 8 + seg * 2 + row
                  Seq(cb, cr).foreach { plane =>
                    filterLine(bS, cAlpha, cBeta, ctc0, chroma = true,
                      d => plane(cy * cStride + cx + d) & 0xff,
                      (d, v) => plane(cy * cStride + cx + d) = v.toByte)
                  }
                  row += 1
                }
              }
              seg += 1
            }
          }
          e += 1
        }
        // ---- horizontal edges (filter across rows), top to bottom
        e = 0
        while (e < 4) {
          if (e > 0 || mbY > 0) {
            val qy4 = mbY * 4 + e
            val py4 = qy4 - 1
            val qpP =
              if (e > 0) qpQ else s.mbQp((mbY - 1) * s.mbW + mbX)
            val qpAvg = (qpP + qpQ + 1) >> 1
            val idxA = clip3(0, 51, qpAvg + s.offsetA)
            val idxB = clip3(0, 51, qpAvg + s.offsetB)
            val alpha = alphaTab(idxA); val beta = betaTab(idxB)
            val cqp = (s.chromaQp(qpP) + s.chromaQp(qpQ) + 1) >> 1
            val cIdxA = clip3(0, 51, cqp + s.offsetA)
            val cIdxB = clip3(0, 51, cqp + s.offsetB)
            val cAlpha = alphaTab(cIdxA); val cBeta = betaTab(cIdxB)
            var seg = 0
            while (seg < 4) {
              val qx4 = mbX * 4 + seg
              val bS = boundaryStrength(s, qx4, py4, qx4, qy4, e == 0)
              if (bS > 0 && alpha > 0) {
                val tc0 = tc0Tab(idxA)(math.min(bS, 3) - 1)
                var colI = 0
                while (colI < 4) {
                  val x = mbX * 16 + seg * 4 + colI
                  val y = mbY * 16 + e * 4
                  filterLine(bS, alpha, beta, tc0, chroma = false,
                    d => luma((y + d) * lStride + x) & 0xff,
                    (d, v) => luma((y + d) * lStride + x) = v.toByte)
                  colI += 1
                }
              }
              if (bS > 0 && cAlpha > 0 && (e == 0 || e == 2)) {
                val ctc0 = tc0Tab(cIdxA)(math.min(bS, 3) - 1)
                val cy = mbY * 8 + (e / 2) * 4
                var colI = 0
                while (colI < 2) {
                  val cx = mbX * 8 + seg * 2 + colI
                  Seq(cb, cr).foreach { plane =>
                    filterLine(bS, cAlpha, cBeta, ctc0, chroma = true,
                      d => plane((cy + d) * cStride + cx) & 0xff,
                      (d, v) => plane((cy + d) * cStride + cx) = v.toByte)
                  }
                  colI += 1
                }
              }
              seg += 1
            }
          }
          e += 1
        }
        mbX += 1
      }
      mbY += 1
    }
  }
}
