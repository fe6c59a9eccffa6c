package graft.multimodal

/** H.265/HEVC PIXEL decode, tier 1 (r11): I-slice pictures built of
  * 16x16 CTUs where every CU is either PCM (raw 8-bit samples — the
  * ground-truth path, §7.3.8.7) or an intra-predicted CU with ZERO
  * residual (cbf 0 everywhere) — the full §8.4.4.2 luma prediction
  * surface (reference-sample substitution, [1 2 1] smoothing, planar,
  * DC with boundary smoothing, all 33 angular modes with the inverse-
  * angle reference extension and the mode-10/26 edge filters) plus
  * derived-mode chroma, under real HEVC CABAC (the H.264 arithmetic
  * engine with §9.3.2.2 initValue contexts — [[H265Cabac]]).
  *
  * Deliberately NOT in tier 1 (each rejects loudly, §the-H.264-ladder
  * precedent): residual coding (any nonzero cbf), coding-quadtree
  * splits (SPS pins min CB = CTB), SAO, deblocking (PPS must disable),
  * partial CTBs, inter anything. Provenance: spec transcription
  * validated by own-encoder round-trips and independent per-mode
  * expectations (H265PixelSpec); no reference decoder in the container.
  */
object H265Decode {

  import H264Decode.Frame

  // §8.4.4.2.6 Table 8-5: intraPredAngle for modes 2..34
  private[multimodal] val predAngle: Array[Int] = Array(
    32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26, -32,
    -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26, 32)
  // Table 8-6: invAngle for the negative angles
  private[multimodal] val invAngle: Map[Int, Int] = Map(
    -2 -> -4096, -5 -> -1638, -9 -> -910, -13 -> -630,
    -17 -> -482, -21 -> -390, -26 -> -315, -32 -> -256)

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** One picture's decode state: CTU-granular (tier 1: CU == CTU). */
  private final class Pic(val sps: H265.SpsInfo) {
    val ctbW: Int = sps.width >> 4
    val ctbH: Int = sps.height >> 4
    val lumaStride: Int = ctbW * 16
    val chromaStride: Int = ctbW * 8
    val luma = new Array[Byte](lumaStride * ctbH * 16)
    val cb = new Array[Byte](chromaStride * ctbH * 8)
    val cr = new Array[Byte](chromaStride * ctbH * 8)
    val done = new Array[Boolean](ctbW * ctbH)
    // per-CTU decoded luma intra mode (PCM CTUs: DC, §8.4.2's
    // "pcm_flag == 1 → INTRA_DC" convention for neighbor derivation)
    val lumaMode: Array[Int] = Array.fill(ctbW * ctbH)(1)

    /** Sample availability (§6.4.1 at tier-1 granularity): inside the
      * picture and inside an already-decoded CTU (raster scan).
      */
    def availLuma(x: Int, y: Int, curCtu: Int): Boolean =
      x >= 0 && y >= 0 && x < lumaStride && y < ctbH * 16 && {
        val idx = (y >> 4) * ctbW + (x >> 4)
        idx < curCtu && done(idx)
      }
    def availChroma(cx: Int, cy: Int, curCtu: Int): Boolean =
      availLuma(cx * 2, cy * 2, curCtu)
  }

  /** §8.4.4.2.2 reference-sample gathering + substitution for an nT×nT
    * block at (px, py) in `plane`. Returns (left, top, corner):
    * left(y) = p[−1][y] for y 0..2nT−1, top(x) = p[x][−1], corner =
    * p[−1][−1]. Unavailable samples substitute by the normative scan
    * (all-unavailable → 128; else propagate from the first available
    * starting at p[−1][2nT−1] up the left column, through the corner,
    * then across the top row).
    */
  private def references(plane: Array[Byte], stride: Int, px: Int, py: Int,
      nT: Int, avail: (Int, Int) => Boolean): (Array[Int], Array[Int], Int) = {
    val n2 = 2 * nT
    // raw fetch with availability, −1 = unavailable
    def at(x: Int, y: Int): Int =
      if (avail(x, y)) plane(y * stride + x) & 0xff else -1
    // scan order: p[−1][2nT−1] .. p[−1][−1], then p[0][−1] .. p[2nT−1][−1]
    val scan = new Array[Int](n2 + 1 + n2)
    var k = 0
    var y = n2 - 1
    while (y >= -1) { scan(k) = at(px - 1, py + y); k += 1; y -= 1 }
    var x = 0
    while (x < n2) { scan(k) = at(px + x, py - 1); k += 1; x += 1 }
    if (scan.forall(_ < 0)) java.util.Arrays.fill(scan, 128)
    else {
      // first entry: if unavailable, copy the first available later one
      if (scan(0) < 0) {
        var j = 1
        while (scan(j) < 0) j += 1
        scan(0) = scan(j)
      }
      var i = 1
      while (i < scan.length) {
        if (scan(i) < 0) scan(i) = scan(i - 1)
        i += 1
      }
    }
    val left = new Array[Int](n2)
    var i = 0
    while (i < n2) { left(i) = scan(n2 - 1 - i); i += 1 }
    val corner = scan(n2)
    val top = new Array[Int](n2)
    i = 0
    while (i < n2) { top(i) = scan(n2 + 1 + i); i += 1 }
    (left, top, corner)
  }

  /** §8.4.4.2.3 [1 2 1] reference smoothing (luma only; strong
    * smoothing is SPS-disabled in the tier). Returns filtered copies.
    */
  private def smooth(left: Array[Int], top: Array[Int],
      corner: Int): (Array[Int], Array[Int], Int) = {
    val n2 = left.length
    val fl = new Array[Int](n2); val ft = new Array[Int](n2)
    val fc = (left(0) + 2 * corner + top(0) + 2) >> 2
    var i = 0
    while (i < n2) {
      val up = if (i == 0) corner else left(i - 1)
      val dn = if (i == n2 - 1) left(i) else left(i + 1)
      fl(i) = if (i == n2 - 1) left(i) else (up + 2 * left(i) + dn + 2) >> 2
      val lf = if (i == 0) corner else top(i - 1)
      val rt = if (i == n2 - 1) top(i) else top(i + 1)
      ft(i) = if (i == n2 - 1) top(i) else (lf + 2 * top(i) + rt + 2) >> 2
      i += 1
    }
    (fl, ft, fc)
  }

  /** §8.4.4.2.4–.6 intra prediction of an nT×nT block into `plane` at
    * (px, py). `luma` gates reference smoothing, DC boundary smoothing
    * and the mode-10/26 edge filters (all luma-only at nT < 32).
    */
  private[multimodal] def predictIntra(plane: Array[Byte], stride: Int,
      px: Int, py: Int, nT: Int, mode: Int, luma: Boolean,
      avail: (Int, Int) => Boolean): Unit = {
    val (l0, t0, c0) = references(plane, stride, px, py, nT, avail)
    // filterFlag (§8.4.4.2.3): luma, not DC, and the mode far enough
    // from pure horizontal/vertical for this size (nT 16 → threshold 1;
    // nT 8 → 7; nT 4 → never; tier sizes: luma 16, chroma 8-unfiltered)
    val thres = nT match { case 8 => 7; case 16 => 1; case 32 => 0; case _ => 99 }
    val filter = luma && mode != 1 && nT > 4 &&
      (mode == 0 || math.min(math.abs(mode - 26), math.abs(mode - 10)) > thres)
    val (left, top, corner) = if (filter) smooth(l0, t0, c0) else (l0, t0, c0)
    @inline def put(x: Int, y: Int, v: Int): Unit =
      plane((py + y) * stride + px + x) = clip255(v).toByte
    val log2 = Integer.numberOfTrailingZeros(nT)
    mode match {
      case 0 => // planar §8.4.4.2.4
        var y = 0
        while (y < nT) {
          var x = 0
          while (x < nT) {
            put(x, y, ((nT - 1 - x) * left(y) + (x + 1) * top(nT) +
              (nT - 1 - y) * top(x) + (y + 1) * left(nT) + nT) >> (log2 + 1))
            x += 1
          }
          y += 1
        }
      case 1 => // DC §8.4.4.2.5
        var s = nT
        var i = 0
        while (i < nT) { s += left(i) + top(i); i += 1 }
        val dc = s >> (log2 + 1)
        var y = 0
        while (y < nT) {
          var x = 0
          while (x < nT) { put(x, y, dc); x += 1 }
          y += 1
        }
        if (luma && nT < 32) { // boundary smoothing
          put(0, 0, (left(0) + 2 * dc + top(0) + 2) >> 2)
          var k = 1
          while (k < nT) {
            put(k, 0, (top(k) + 3 * dc + 2) >> 2)
            put(0, k, (left(k) + 3 * dc + 2) >> 2)
            k += 1
          }
        }
      case m => // angular §8.4.4.2.6
        val angle = predAngle(m - 2)
        val vertical = m >= 18
        // main = the prediction direction's source row/col; side = the
        // other; the spec's horizontal case is the vertical case with
        // x/y swapped
        val main = if (vertical) top else left
        val side = if (vertical) left else top
        val ref = new Array[Int](3 * nT + 1) // index offset nT
        val off = nT
        var i = 0
        while (i <= nT) {
          ref(off + i) = if (i == 0) corner else main(i - 1)
          i += 1
        }
        if (angle < 0) {
          val lowest = (nT * angle) >> 5
          if (lowest < -1) {
            val ia = invAngle(angle)
            var k = -1
            while (k >= lowest) {
              val idx = ((k * ia) + 128) >> 8 // side-array projection
              ref(off + k) = if (idx == 0) corner else side(idx - 1)
              k -= 1
            }
          }
        } else {
          var k = nT + 1
          while (k <= 2 * nT) { ref(off + k) = main(k - 1); k += 1 }
        }
        var j = 0
        while (j < nT) { // j = y (vertical) or x (horizontal)
          val iIdx = ((j + 1) * angle) >> 5
          val iFact = ((j + 1) * angle) & 31
          var i2 = 0
          while (i2 < nT) { // i2 = x (vertical) or y (horizontal)
            val v =
              if (iFact == 0) ref(off + i2 + iIdx + 1)
              else ((32 - iFact) * ref(off + i2 + iIdx + 1) +
                iFact * ref(off + i2 + iIdx + 2) + 16) >> 5
            if (vertical) put(i2, j, v) else put(j, i2, v)
            i2 += 1
          }
          j += 1
        }
        if (luma && nT < 32 && (m == 26 || m == 10)) {
          // pure vertical/horizontal edge filter (unsmoothed refs:
          // modes 10/26 never smooth at these sizes)
          var k = 0
          while (k < nT) {
            if (m == 26) put(0, k, t0(0) + ((l0(k) - c0) >> 1))
            else put(k, 0, l0(0) + ((t0(k) - c0) >> 1))
            k += 1
          }
        }
    }
  }

  /** §8.4.2 luma MPM candidate list from the left/above neighbor modes
    * (DC when unavailable, non-intra, or above outside the current CTB
    * row — tier 1: above CTU ⇒ outside the CTB, so candB is left DC
    * unless... the neighbor CTU above IS outside the current CTB, per
    * the normative yCb−1 < ((yCb >> CtbLog2) << CtbLog2) test).
    */
  private[multimodal] def mpmList(candA: Int, candB: Int): Array[Int] =
    if (candA == candB) {
      if (candA < 2) Array(0, 1, 26)
      else Array(candA, 2 + ((candA + 29) % 32), 2 + ((candA - 2 + 1) % 32))
    } else {
      val c = if (candA != 0 && candB != 0) 0
        else if (candA + candB < 2) 26 else 1
      Array(candA, candB, c)
    }

  /** Decode the first picture of an Annex-B HEVC stream (or up to
    * `maxFrames` IRAP/I pictures — tier 1 is intra-only, so decode
    * order IS display order). Undecodable content yields the pictures
    * completed so far, the corpus posture shared with H.264.
    */
  def decodeAnnexBIntraPictures(bytes: Array[Byte],
      maxFrames: Int = 8): Seq[Frame] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var sps: Option[H265.SpsInfo] = None
    var pps: Option[H265.PpsInfo] = None
    try {
      val nals = H265.nalUnitsAnnexB(bytes).iterator
      while (nals.hasNext && out.size < maxFrames) {
        val nal = nals.next()
        nal.nalType match {
          case H265.NalSps => sps = H265.parseSps(nal.payload)
          case H265.NalPps => pps = H265.parsePps(nal.payload)
          case t if H265.isIrap(t) || t <= 9 =>
            (sps, pps) match {
              case (Some(s), Some(p)) if p.supported && s.deep &&
                  s.chromaFormatIdc == 1 && s.bitDepthLuma == 8 &&
                  s.width > 0 && s.width <= 8192 && s.height <= 8192 =>
                decodeSlice(s, p, nal.payload, H265.isIrap(nal.nalType))
                  .foreach(out += _)
              case _ => return out.toSeq
            }
          case _ => // VPS / SEI / AUD
        }
      }
    } catch {
      case e @ (_: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
          _: java.util.NoSuchElementException) =>
        if (sys.env.contains("H265_DEBUG")) e.printStackTrace()
    }
    out.toSeq
  }

  private def decodeSlice(sps: H265.SpsInfo, pps: H265.PpsInfo,
      payload: Array[Byte], irap: Boolean): Option[Frame] = {
    // tier-1 structural requirements — each a loud reject, not a wrong
    // decode
    require(sps.minCbLog2 == 4 && sps.ctbLog2 == 4,
      "tier 1 wants CTB 16 with min CB 16 (no coding-quadtree split)")
    require(sps.maxTbLog2 == 4 && sps.maxTrafoDepthIntra == 0,
      "tier 1 wants TU == CU")
    require(!sps.saoEnabled && !sps.scalingList, "SAO/scaling lists out of scope")
    require(pps.deblockingDisabled, "HEVC deblocking out of scope — PPS must disable")
    require(sps.width % 16 == 0 && sps.height % 16 == 0,
      "partial CTBs out of scope")
    val r = new H264.BitReader(H264.rbsp(payload))
    require(r.flag(), "tier 1 wants single-slice pictures") // first_slice_..._flag
    if (irap) r.flag() // no_output_of_prior_pics
    r.ue() // slice_pic_parameter_set_id
    val sliceType = r.ue()
    require(sliceType == 2, s"non-I slice type $sliceType out of scope")
    if (!irap) {
      // non-IRAP I slices would carry POC/RPS syntax — out of scope
      throw new IllegalArgumentException("non-IRAP slice out of scope")
    }
    val qp = pps.initQp + r.se()
    require(qp >= 0 && qp <= 51, s"bad slice qp $qp")
    // byte_alignment (§7.3.2.10): one, then zeros
    require(r.u(1) == 1, "alignment_bit_equal_to_one")
    while (r.remaining % 8 != 0) require(r.u(1) == 0, "alignment zero bit")

    val pic = new Pic(sps)
    val ctx = H265Cabac.contexts(qp)
    var d = new H264Cabac.Decoder(r, ctx)
    var ctu = 0
    val nCtu = pic.ctbW * pic.ctbH
    var end = false
    while (!end) {
      require(ctu < nCtu, "CTU address past picture end")
      val ctbX = ctu % pic.ctbW; val ctbY = ctu / pic.ctbW
      val px = ctbX * 16; val py = ctbY * 16
      // coding_unit at 16x16 == min CB: part_mode (require 2Nx2N),
      // then pcm_flag (terminate-coded)
      require(d.decision(H265Cabac.CtxPartMode) == 1,
        "PART_NxN out of the tier's scope")
      val pcm = d.terminate() == 1
      if (pcm) {
        // §9.3.1: DecodeFlush after the terminate bin, then byte-
        // aligned raw samples, then a fresh engine init over the same
        // (persisting) context variables
        d.flushAfterTerminate()
        while (r.remaining % 8 != 0) r.u(1) // pcm_alignment_zero_bit
        var i = 0
        while (i < 256) {
          pic.luma((py + i / 16) * pic.lumaStride + px + i % 16) = r.u(8).toByte
          i += 1
        }
        val cpx = px / 2; val cpy = py / 2
        i = 0
        while (i < 64) {
          pic.cb((cpy + i / 8) * pic.chromaStride + cpx + i % 8) = r.u(8).toByte
          i += 1
        }
        i = 0
        while (i < 64) {
          pic.cr((cpy + i / 8) * pic.chromaStride + cpx + i % 8) = r.u(8).toByte
          i += 1
        }
        d = new H264Cabac.Decoder(r, ctx)
        pic.lumaMode(ctu) = 1 // PCM counts as DC for later MPMs (§8.4.2)
      } else {
        // luma mode: prev_intra_luma_pred_flag + mpm_idx / rem
        val prev = d.decision(H265Cabac.CtxPrevIntraLuma) == 1
        def neighborMode(nCtbX: Int, nCtbY: Int, aboveOutsideCtb: Boolean): Int =
          if (aboveOutsideCtb || nCtbX < 0 || nCtbY < 0 ||
            nCtbY * pic.ctbW + nCtbX >= ctu) 1
          else pic.lumaMode(nCtbY * pic.ctbW + nCtbX)
        // tier 1: the above neighbor is ALWAYS outside the current CTB
        // (CU == CTB), so candB is INTRA_DC by the normative rule
        val candA = neighborMode(ctbX - 1, ctbY, aboveOutsideCtb = false)
        val candB = 1
        val mpm = mpmList(candA, candB)
        val mode =
          if (prev) mpm(H265Cabac.decodeMpmIdx(d))
          else {
            val rem = H265Cabac.decodeRemIntra(d)
            val sorted = mpm.sorted
            var m = rem
            var i = 0
            while (i < 3) { if (m >= sorted(i)) m += 1; i += 1 }
            m
          }
        require(mode >= 0 && mode <= 34, s"bad intra mode $mode")
        val chromaMode = H265Cabac.decodeChromaMode(d)
        require(chromaMode == 4, "explicit chroma modes out of the tier")
        // transform tree at depth 0 / TU == CU: cbf_cb, cbf_cr, cbf_luma
        val cbfCb = d.decision(H265Cabac.CtxCbfChroma) == 1
        val cbfCr = d.decision(H265Cabac.CtxCbfChroma) == 1
        val cbfL = d.decision(H265Cabac.CtxCbfLuma + 1) == 1
        require(!cbfCb && !cbfCr && !cbfL,
          "residual coding out of the tier's scope")
        pic.lumaMode(ctu) = mode
        val cur = ctu
        predictIntra(pic.luma, pic.lumaStride, px, py, 16, mode,
          luma = true, (x, y) => pic.availLuma(x, y, cur))
        predictIntra(pic.cb, pic.chromaStride, px / 2, py / 2, 8, mode,
          luma = false, (x, y) => pic.availChroma(x, y, cur))
        predictIntra(pic.cr, pic.chromaStride, px / 2, py / 2, 8, mode,
          luma = false, (x, y) => pic.availChroma(x, y, cur))
      }
      pic.done(ctu) = true
      ctu += 1
      end = d.terminate() == 1 // end_of_slice_segment_flag
      require(!d.exhausted, "HEVC CABAC bitstream exhausted mid-slice")
    }
    require(ctu == nCtu, "slice ended before the picture completed")
    Some(Frame(sps.width, sps.height, pic.ctbW, pic.ctbH,
      pic.luma, pic.cb, pic.cr))
  }
}
