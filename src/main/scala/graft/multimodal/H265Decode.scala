package graft.multimodal

/** H.265/HEVC PIXEL decode, tiers 1+2 (r11/r12): I-slice pictures of
  * CTBs (16/32/64) carrying a full coding quadtree down to 8x8 CUs,
  * where every CU is PCM (raw 8-bit samples — the ground-truth path,
  * §7.3.8.7), or an intra-predicted CU — 2Nx2N or NxN at min size —
  * with RESIDUAL CODING (r12): the §7.3.8.11 sig-map/last-pos/
  * coeff-level CABAC syntax, §8.6.3 dequantization (flat scaling) and
  * the §8.6.4 inverse DCT-II 4..32 / DST-VII 4x4 transforms, over the
  * full §8.4.4.2 luma prediction surface (reference-sample
  * substitution, [1 2 1] smoothing, planar, DC with boundary
  * smoothing, all 33 angular modes with the inverse-angle reference
  * extension and the mode-10/26 edge filters) plus derived-mode
  * chroma, under real HEVC CABAC (the H.264 arithmetic engine with
  * §9.3.2.2 initValue contexts — [[H265Cabac]]).
  *
  * Deliberately NOT in tier 2 (each rejects loudly, §the-H.264-ladder
  * precedent): SAO, deblocking (PPS must disable — the next rung),
  * partial CTBs, transform skip / transquant bypass / sign hiding /
  * cu_qp_delta (PPS gates), scaling lists, AMP, strong intra
  * smoothing (SPS gates), multi-slice pictures, inter anything.
  * Provenance: spec transcription validated by own-encoder
  * round-trips and independent per-mode/per-category expectations
  * (H265PixelSpec); no reference decoder in the container.
  */
object H265Decode {

  import H264Decode.Frame

  // Debug gates hoisted out of the per-TB/per-PU hot loops:
  // scala.sys.env materializes a fresh Map of the whole environment
  // per call, which would add allocation per transform block.
  private val debugEnv = sys.env.contains("H265_DEBUG")
  private val debugTb = sys.env.contains("H265_DEBUG_TB")
  private val debugPu = sys.env.contains("H265_DEBUG_PU")

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

  /** One picture's decode state (r12: 4x4-granular, the minimal-block
    * grid every availability/neighbor rule reduces to). Shared by the
    * decoder and the encoder's decoder-twin — a single derivation of
    * availability, depth and mode state, so encode/decode cannot drift
    * (the r10 lesson).
    */
  private[multimodal] final class Pic(val width: Int, val height: Int) {
    val lumaStride: Int = width
    val chromaStride: Int = width >> 1
    val luma = new Array[Byte](width * height)
    val cb = new Array[Byte]((width >> 1) * (height >> 1))
    val cr = new Array[Byte]((width >> 1) * (height >> 1))
    val w4: Int = width >> 2
    val h4: Int = height >> 2
    private val cw4 = width >> 3
    private val ch4 = height >> 3
    /** luma recon progress, 4x4 granularity == z-scan precedence at
      * prediction time (recon order is z-order).
      */
    val done4 = new Array[Boolean](w4 * h4)
    /** chroma recon progress, 4x4-chroma granularity. */
    val doneC4 = new Array[Boolean](cw4 * ch4)
    /** per-4x4 luma intra mode; −1 = not yet parsed (PCM parses as DC,
      * §8.4.2's pcm_flag → INTRA_DC convention).
      */
    val mode4: Array[Int] = Array.fill(w4 * h4)(-1)
    /** per-4x4 coding-quadtree depth; −1 = not yet parsed. */
    val depth4: Array[Int] = Array.fill(w4 * h4)(-1)
    /** TU-edge grids for the deblocking filter (r12): cell (x4, y4)
      * in tuEdgeV4 ⇔ a vertical TU/CU boundary at column x4·4 across
      * rows y4·4..+3; tuEdgeH4 the transpose. Collected by
      * [[markLuma]] (every call IS a completed luma TB or PCM CU).
      */
    val tuEdgeV4 = new Array[Boolean](w4 * h4)
    val tuEdgeH4 = new Array[Boolean](w4 * h4)
    /** 4x4 cells whose samples the loop filter must not MODIFY
      * (pcm_loop_filter_disabled); they still feed neighbor decisions.
      */
    val noFilter4 = new Array[Boolean](w4 * h4)
    /** Per-4x4 inter state (r12 tier 3, two-list since r13): `dir4` is
      * the inter prediction direction bitmask (1 = list 0, 2 = list 1,
      * 3 = bi; 0 = not inter), quarter-pel MVs per list at refIdx 0;
      * `skip4` feeds the cu_skip_flag ctxInc (§9.3.4.2.2). Parse-time
      * validity = done4 (recon order is z-scan, and inter CUs mark
      * recon only after their residual completes).
      */
    /** Decode-time per-list reference POCs of THIS picture (r15,
      * TMVP): §8.5.3.2.9 scales a collocated cell's MV by the POC
      * distance to the cell's OWN reference, so the collocated
      * picture must carry its lists past its decode. Empty for intra
      * pictures (their cells are never inter, so never consulted).
      */
    var tmvpRefPocs0: IndexedSeq[Int] = IndexedSeq.empty
    var tmvpRefPocs1: IndexedSeq[Int] = IndexedSeq.empty
    val inter4 = new Array[Boolean](w4 * h4)
    val skip4 = new Array[Boolean](w4 * h4)
    val dir4 = new Array[Byte](w4 * h4)
    val mvx4 = new Array[Short](w4 * h4)
    val mvy4 = new Array[Short](w4 * h4)
    val mv1x4 = new Array[Short](w4 * h4)
    val mv1y4 = new Array[Short](w4 * h4)
    val ref04 = new Array[Byte](w4 * h4)
    val ref14 = new Array[Byte](w4 * h4)
    def setMotion(x0: Int, y0: Int, n: Int, mvx: Int, mvy: Int,
        skip: Boolean): Unit =
      setMotion2(x0, y0, n, H265Inter.Mi(1, mvx, mvy, 0, 0), skip)
    def setMotion2(x0: Int, y0: Int, n: Int, mi: H265Inter.Mi,
        skip: Boolean): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + n) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + n) >> 2)) {
          val i = y * w4 + x
          inter4(i) = true; skip4(i) = skip
          dir4(i) = mi.dir.toByte
          mvx4(i) = mi.mv0x.toShort; mvy4(i) = mi.mv0y.toShort
          mv1x4(i) = mi.mv1x.toShort; mv1y4(i) = mi.mv1y.toShort
          ref04(i) = mi.ref0.toByte; ref14(i) = mi.ref1.toByte
          x += 1
        }
        y += 1
      }
    }
    /** Neighbor is a decoded inter cell (merge/AMVP availability). */
    def interAt(x: Int, y: Int): Boolean =
      availLuma(x, y) && inter4((y >> 2) * w4 + (x >> 2))
    def mvAt(x: Int, y: Int): (Int, Int) = {
      val i = (y >> 2) * w4 + (x >> 2)
      (mvx4(i).toInt, mvy4(i).toInt)
    }
    def miAt(x: Int, y: Int): H265Inter.Mi = {
      val i = (y >> 2) * w4 + (x >> 2)
      H265Inter.Mi(dir4(i).toInt, mvx4(i).toInt, mvy4(i).toInt,
        mv1x4(i).toInt, mv1y4(i).toInt, ref04(i).toInt, ref14(i).toInt)
    }
    def skipAt(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= width || y >= height) 0
      else if (skip4((y >> 2) * w4 + (x >> 2))) 1 else 0
    def tuEdgeV(x: Int, y: Int): Boolean = tuEdgeV4((y >> 2) * w4 + (x >> 2))
    def tuEdgeH(x: Int, y: Int): Boolean = tuEdgeH4((y >> 2) * w4 + (x >> 2))
    /** Luma-TB-has-nonzero-levels grid (r14, inter deblocking): the
      * §8.7.2.4 bS=1 rule needs "p0/q0 in a luma TB with one or more
      * nonzero coefficient levels"; painted per TB at recon time.
      */
    val cbf4 = new Array[Boolean](w4 * h4)
    def markCbf(x0: Int, y0: Int, n: Int): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + n) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + n) >> 2)) { cbf4(y * w4 + x) = true; x += 1 }
        y += 1
      }
    }
    def cbfAt(x: Int, y: Int): Boolean = cbf4((y >> 2) * w4 + (x >> 2))
    def noFilter(x: Int, y: Int): Boolean = noFilter4((y >> 2) * w4 + (x >> 2))
    def markNoFilter(x0: Int, y0: Int, n: Int): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + n) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + n) >> 2)) { noFilter4(y * w4 + x) = true; x += 1 }
        y += 1
      }
    }

    def availLuma(x: Int, y: Int): Boolean =
      x >= 0 && y >= 0 && x < width && y < height &&
        done4((y >> 2) * w4 + (x >> 2))
    def availChroma(cx: Int, cy: Int): Boolean =
      cx >= 0 && cy >= 0 && cx < (width >> 1) && cy < (height >> 1) &&
        doneC4((cy >> 2) * cw4 + (cx >> 2))

    def markLuma(x0: Int, y0: Int, n: Int): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + n) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + n) >> 2)) { done4(y * w4 + x) = true; x += 1 }
        tuEdgeV4(y * w4 + (x0 >> 2)) = true // the TB's left edge
        y += 1
      }
      var x = x0 >> 2
      while (x < ((x0 + n) >> 2)) {
        tuEdgeH4((y0 >> 2) * w4 + x) = true // the TB's top edge
        x += 1
      }
    }
    def markChroma(cx0: Int, cy0: Int, n: Int): Unit = {
      var y = cy0 >> 2
      while (y < ((cy0 + n) >> 2)) {
        var x = cx0 >> 2
        while (x < ((cx0 + n) >> 2)) { doneC4(y * cw4 + x) = true; x += 1 }
        y += 1
      }
    }
    def setMode(x0: Int, y0: Int, n: Int, mode: Int): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + n) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + n) >> 2)) { mode4(y * w4 + x) = mode; x += 1 }
        y += 1
      }
    }
    def setDepth(x0: Int, y0: Int, n: Int, d: Int): Unit = {
      var y = y0 >> 2
      while (y < ((y0 + n) >> 2)) {
        var x = x0 >> 2
        while (x < ((x0 + n) >> 2)) { depth4(y * w4 + x) = d; x += 1 }
        y += 1
      }
    }
    /** Neighbor luma mode for MPM derivation (§8.4.2): DC when outside
      * the picture, not yet parsed (z-scan availability), or — for the
      * above neighbor — outside the current CTB row.
      */
    def candMode(x: Int, y: Int, aboveOutsideCtb: Boolean): Int =
      if (aboveOutsideCtb || x < 0 || y < 0 || x >= width || y >= height) 1
      else {
        val m = mode4((y >> 2) * w4 + (x >> 2))
        if (m < 0) 1 else m
      }
    /** split_cu_flag ctxInc contribution of a neighbor minimal block:
      * 1 iff available (parsed) and deeper than `depth` (§9.3.4.2.2).
      */
    def depthGt(x: Int, y: Int, depth: Int): Int =
      if (x < 0 || y < 0 || x >= width || y >= height) 0
      else if (depth4((y >> 2) * w4 + (x >> 2)) > depth) 1 else 0
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

  /** Decode up to `maxFrames` IRAP/I pictures of an Annex-B HEVC
    * stream — the intra-only view (stops at the first inter picture).
    * Undecodable content yields the pictures completed so far, the
    * corpus posture shared with H.264.
    */
  def decodeAnnexBIntraPictures(bytes: Array[Byte],
      maxFrames: Int = 8): Seq[Frame] =
    decodeAnnexBPictures(bytes, maxFrames, allowInter = false)

  /** Decode up to `maxFrames` pictures of an Annex-B HEVC stream,
    * including tier-3 P and tier-4 B pictures. The DPB holds the most
    * recent reference pictures (IRAP + odd-numbered trailing NAL
    * types; TRAIL_N B pictures are never referenced); RPS entries
    * resolve into it by POC. Output is DISPLAY order — pictures sort
    * by (IRAP period, POC), which reorders I-P-B decode order GOPs to
    * I-B-P and leaves display-order streams untouched. Undecodable
    * content yields the pictures completed so far.
    */
  def decodeAnnexBPictures(bytes: Array[Byte], maxFrames: Int = 8,
      allowInter: Boolean = true,
      displayOrder: Boolean = true): Seq[Frame] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Frame)]
    var sps: Option[H265.SpsInfo] = None
    var pps: Option[H265.PpsInfo] = None
    val dpb = scala.collection.mutable.ArrayBuffer.empty[(Pic, Int)]
    var prevPoc = 0 // POC of prevTid0Pic (previous reference picture)
    var period = 0 // IRAP counter: POCs only order within a period
    def display: Seq[Frame] =
      if (displayOrder) out.sortBy(f => (f._1, f._2)).map(_._3).toSeq
      else out.map(_._3).toSeq // decode order (x265 recon-file order)
    try {
      val nals = H265.nalUnitsAnnexB(bytes).iterator
      while (nals.hasNext && out.size < maxFrames) {
        val nal = nals.next()
        nal.nalType match {
          case H265.NalSps => sps = H265.parseSps(nal.payload)
          case H265.NalPps => pps = H265.parsePps(nal.payload)
          case t if H265.isIrap(t) || t <= 9 =>
            if (!H265.isIrap(t) && !allowInter) return display
            (sps, pps) match {
              case (Some(s), Some(p)) if p.supported && s.deep &&
                  s.chromaFormatIdc == 1 && s.bitDepthLuma == 8 &&
                  s.width > 0 && s.width <= 8192 && s.height <= 8192 =>
                if (H265.isIrap(t)) { // new IRAP period: DPB resets
                  dpb.clear(); prevPoc = 0; period += 1
                }
                decodeSlice(s, p, nal.payload, nal.nalType,
                    dpb.toSeq, prevPoc) match {
                  case Some((frame, pic, poc)) =>
                    out += ((period, poc, frame))
                    // §7.4.2.2: trailing types 0..14 are references
                    // iff odd (TRAIL_R 1 vs TRAIL_N 0, etc.)
                    if (H265.isIrap(t) || (t & 1) == 1) {
                      dpb += ((pic, poc))
                      // FIFO depth from the SPS (§7.4.3.2.1), not a
                      // fixed 8 (r14): never below the old cap so
                      // sub-8 declarations can't shrink behavior, and
                      // capped at the level-limit 16 in parseSps
                      if (dpb.size > math.max(8, s.maxDecPicBuffering))
                        dpb.remove(0)
                      prevPoc = poc
                    }
                  case None => return display
                }
              case _ => return display
            }
          case _ => // VPS / SEI / AUD
        }
      }
    } catch {
      case e @ (_: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
          _: java.util.NoSuchElementException) =>
        if (debugEnv) e.printStackTrace()
    }
    display
  }

  /** §7.4.9.11 transform-skip-less 4x4 sig_coeff_flag ctx map. */
  private[multimodal] val ctxIndMap4x4: Array[Int] =
    Array(0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8)

  /** §9.3.4.2.5 sig_coeff_flag context increment. `csbfR`/`csbfB` are
    * the coded_sub_block flags of the right/below coefficient groups.
    */
  private[multimodal] def sigCtxInc(luma: Boolean, xC: Int, yC: Int,
      log2Size: Int, scanIdx: Int, csbfR: Boolean, csbfB: Boolean): Int = {
    val base = if (luma) 0 else 27
    if (xC + yC == 0) return base
    if (log2Size == 2) return base + ctxIndMap4x4(yC * 4 + xC)
    val offset =
      if (log2Size == 3) { if (scanIdx == H265Transform.ScanDiag) 9 else 15 }
      else if (luma) 21 else 12
    val prevCsbf = (if (csbfR) 1 else 0) + (if (csbfB) 2 else 0)
    val xP = xC & 3; val yP = yC & 3
    val cnt = prevCsbf match {
      case 0 => if (xP + yP == 0) 2 else if (xP + yP < 3) 1 else 0
      case 1 => if (yP == 0) 2 else if (yP == 1) 1 else 0
      case 2 => if (xP == 0) 2 else if (xP == 1) 1 else 0
      case _ => 2
    }
    base + offset + cnt +
      (if (luma && ((xC >> 2) + (yC >> 2)) > 0) 3 else 0)
  }

  /** Decode one residual_coding() block (§7.3.8.11) into an n×n level
    * array (row-major, [yC][xC]). `c1` is the cross-CG greater1 state
    * (in/out via the returned value): ctxSet increments when the
    * previously processed CG of this TB ended with c1 == 0.
    *
    * `signHide` = PPS sign_data_hiding_enabled (r15): per CG, when the
    * reverse-scan span between the last and first significant
    * coefficients exceeds 3, the sign of the FIRST-in-scan coefficient
    * is not coded — it is inferred negative iff the sum of absolute
    * levels in the CG is odd (§7.4.9.11).
    */
  private[multimodal] def decodeResidual(d: H264Cabac.Decoder, log2Size: Int,
      luma: Boolean, scanIdx: Int, signHide: Boolean = false): Array[Int] = {
    import H265Cabac._
    val n = 1 << log2Size
    val out = new Array[Int](n * n)
    val px = decodeLastPrefix(d, CtxLastX, log2Size, luma)
    val py = decodeLastPrefix(d, CtxLastY, log2Size, luma)
    var lastX = decodeLastSuffix(d, px)
    var lastY = decodeLastSuffix(d, py)
    if (scanIdx == H265Transform.ScanVer) { val t = lastX; lastX = lastY; lastY = t }
    require(lastX < n && lastY < n, "last_sig_coeff out of block")
    val sub = H265Transform.scan(4, scanIdx) // within-CG scan: idx → y*4+x
    val cgSize = math.max(n >> 2, 1)
    val cg = H265Transform.scan(cgSize, scanIdx) // CG scan: idx → yS*cgSize+xS
    // scan index of the last coefficient
    val lastCgPos = (lastY >> 2) * cgSize + (lastX >> 2)
    val lastSubBlock = cg.indexOf(lastCgPos)
    val lastPosInCg = sub.indexOf((lastY & 3) * 4 + (lastX & 3))
    val csbf = new Array[Boolean](cgSize * cgSize) // indexed yS*cgSize+xS
    csbf(lastCgPos) = true
    var c1 = 1 // persists across CGs of this TB (§9.3.4.2.6)
    var i = lastSubBlock
    while (i >= 0) {
      val cgPos = cg(i)
      val xS = cgPos % cgSize; val yS = cgPos / cgSize
      var infer = false
      val coded =
        if (i == lastSubBlock || i == 0) { csbf(cgPos) = true; true }
        else {
          val right = xS + 1 < cgSize && csbf(yS * cgSize + xS + 1)
          val below = yS + 1 < cgSize && csbf((yS + 1) * cgSize + xS)
          val ctxInc = (if (luma) 0 else 2) +
            (if (right || below) 1 else 0)
          infer = true
          val c = d.decision(CtxCsbf + ctxInc) == 1
          csbf(cgPos) = c
          c
        }
      if (coded) {
        // significance pass, reverse scan within the CG
        val sigPos = new Array[Int](16)
        var nSig = 0
        var n0 = if (i == lastSubBlock) lastPosInCg else 15
        if (i == lastSubBlock) { sigPos(nSig) = lastPosInCg; nSig += 1; n0 -= 1 }
        while (n0 >= 0) {
          if (n0 > 0 || !infer) {
            val p = sub(n0)
            val xC = (xS << 2) + (p & 3); val yC = (yS << 2) + (p >> 2)
            val right = xS + 1 < cgSize && csbf(yS * cgSize + xS + 1)
            val below = yS + 1 < cgSize && csbf((yS + 1) * cgSize + xS)
            if (d.decision(CtxSig +
                sigCtxInc(luma, xC, yC, log2Size, scanIdx, right, below)) == 1) {
              sigPos(nSig) = n0; nSig += 1
              infer = false
            }
          } else { // DC of a decoded-csbf CG with no other sig: inferred 1
            sigPos(nSig) = 0; nSig += 1
          }
          n0 -= 1
        }
        if (nSig > 0) {
          // greater1 (first 8), greater2 (first g1 == 1), signs, remaining
          var ctxSet = (if (i > 0 && luma) 2 else 0) + (if (c1 == 0) 1 else 0)
          c1 = 1
          val g1 = new Array[Boolean](nSig)
          var firstG1 = -1
          var k = 0
          while (k < math.min(nSig, 8)) {
            val b = d.decision(CtxG1 + (if (luma) 0 else 16) +
              4 * ctxSet + c1) == 1
            g1(k) = b
            if (b) { if (firstG1 < 0) firstG1 = k; c1 = 0 }
            else if (c1 > 0 && c1 < 3) c1 += 1
            k += 1
          }
          var g2 = false
          if (firstG1 >= 0)
            g2 = d.decision(CtxG2 + (if (luma) 0 else 4) + ctxSet) == 1
          // sigPos is in parse (reverse-scan) order: sigPos(0) is the
          // LAST significant coefficient in scan order, sigPos(nSig-1)
          // the FIRST — §7.4.9.11's span test and hidden position
          val signHidden = signHide && sigPos(0) - sigPos(nSig - 1) > 3
          val neg = new Array[Boolean](nSig)
          k = 0
          while (k < nSig) {
            neg(k) = (!signHidden || k < nSig - 1) && d.bypass() == 1
            k += 1
          }
          var rice = 0
          var firstCoeff2 = 1
          var sumAbs = 0
          var hiddenIdx = -1
          k = 0
          while (k < nSig) {
            var abs = 1 + (if (k < 8 && g1(k)) 1 else 0) +
              (if (k == firstG1) (if (g2) 1 else 0) else 0)
            val baseLevel = if (k < 8) 2 + firstCoeff2 else 1
            if (abs == baseLevel) {
              abs += decodeRemaining(d, rice)
            }
            if (abs > (3 << rice) && rice < 4) rice += 1
            if (abs >= 2) firstCoeff2 = 0
            sumAbs += abs
            val p = sub(sigPos(k))
            val xC = (xS << 2) + (p & 3); val yC = (yS << 2) + (p >> 2)
            if (signHidden && k == nSig - 1) hiddenIdx = yC * n + xC
            out(yC * n + xC) = if (neg(k)) -abs else abs
            k += 1
          }
          // hidden sign: negative iff the CG's absolute-level sum is odd
          if (hiddenIdx >= 0 && (sumAbs & 1) == 1)
            out(hiddenIdx) = -out(hiddenIdx)
        }
      }
      i -= 1
    }
    out
  }

  /** Slice-level decode parameters + state shared down the quadtree.
    * `sliceType` 2 = I, 1 = P (tier 3); `ref` is the single list-0
    * reference picture (null for I).
    */
  private final class SliceCtx(val sps: H265.SpsInfo, val pps: H265.PpsInfo,
      val pic: Pic, val qpY: Int, val sliceType: Int = 2,
      val refs0: IndexedSeq[Pic] = IndexedSeq.empty, val maxMerge: Int = 5,
      val ref1: Pic = null, val currPoc: Int = 0,
      val refPocs0: IndexedSeq[Int] = IndexedSeq(0), val refPoc1: Int = 0,
      val mvdL1Zero: Boolean = false,
      val weights: Option[H265Inter.PredWeights] = None,
      val activeL0: Int = 1,
      val col: Option[H265Inter.ColCtx] = None) {
    def refPocs1: IndexedSeq[Int] = IndexedSeq(refPoc1)
    val qpCb: Int =
      H265Transform.chromaQp(math.max(0, math.min(57, qpY + pps.cbQpOffset)))
    val qpCr: Int =
      H265Transform.chromaQp(math.max(0, math.min(57, qpY + pps.crQpOffset)))
    var d: H264Cabac.Decoder = _
    var r: H264.BitReader = _
    var ctx: H264Cabac.Contexts = _
  }

  /** Decode + reconstruct one TB's plane: predict (intra; `mode` −1
    * marks an INTER TB whose samples were already motion-compensated
    * — no prediction here, diagonal scan), then (if cbf) add the
    * dequantized inverse-transformed residual, then mark recon
    * progress.
    */
  private def reconTb(s: SliceCtx, plane: Array[Byte], stride: Int,
      px: Int, py: Int, log2Size: Int, mode: Int, luma: Boolean,
      cbf: Boolean, qp: Int): Unit = {
    val n = 1 << log2Size
    val pic = s.pic
    if (mode >= 0) {
      val avail: (Int, Int) => Boolean =
        if (luma) (x, y) => pic.availLuma(x, y) else (x, y) => pic.availChroma(x, y)
      predictIntra(plane, stride, px, py, n, mode, luma, avail)
    }
    if (cbf) {
      val scanIdx =
        if (mode >= 0) H265Transform.scanIdxFor(log2Size, luma, mode)
        else H265Transform.ScanDiag
      val levels = decodeResidual(s.d, log2Size, luma, scanIdx,
        signHide = s.pps.signDataHiding)
      val deq = H265Transform.dequant(levels, log2Size, qp)
      val res = H265Transform.inverseTransform(deq, log2Size,
        dst = luma && n == 4)
      if (debugTb && !luma)
        println(s"TB ($px,$py)x$n qp=$qp lv=" +
          levels.zipWithIndex.filter(_._1 != 0).map(z => s"${z._2}:${z._1}").mkString(",") +
          " res00=" + res(0) + " resTR=" + res(n - 1))
      var y = 0
      while (y < n) {
        var x = 0
        while (x < n) {
          val idx = (py + y) * stride + px + x
          plane(idx) = clip255((plane(idx) & 0xff) + res(y * n + x)).toByte
          x += 1
        }
        y += 1
      }
    }
    if (luma) {
      pic.markLuma(px, py, n)
      if (cbf) pic.markCbf(px, py, n)
    } else pic.markChroma(px, py, n)
  }

  /** Per-CU context threaded through the transform tree. `inter` CUs
    * carry mode −1 (no intra prediction, diagonal scans).
    */
  private final class CuCtx(val cuX: Int, val cuY: Int, val log2CbSize: Int,
      val nxn: Boolean, val modes: Array[Int],
      val inter: Boolean = false, val chromaIdx: Int = 4) {
    def lumaMode(x0: Int, y0: Int): Int =
      if (inter) -1
      else if (!nxn) modes(0)
      else {
        val half = 1 << (log2CbSize - 1)
        modes((if (y0 - cuY >= half) 2 else 0) + (if (x0 - cuX >= half) 1 else 0))
      }
    /** 4:2:0 chroma mode per Table 8-3 (§8.4.3): DM derives from the
      * TOP-LEFT PU; the four EXPLICIT modes (planar/vertical/
      * horizontal/DC — r14, unlocked by the libx265 external vector)
      * substitute angular-34 when they would collide with the luma
      * mode.
      */
    def chromaMode: Int =
      if (inter) -1
      else {
        val l = modes(0)
        chromaIdx match {
          case 4 => l
          case 0 => if (l == 0) 34 else 0
          case 1 => if (l == 26) 34 else 26
          case 2 => if (l == 10) 34 else 10
          case 3 => if (l == 1) 34 else 1
          case other => throw new IllegalArgumentException(
            s"bad chroma mode idx $other")
        }
      }
  }

  /** transform_tree (§7.3.8.8) + transform_unit (§7.3.8.10) + recon. */
  private def transformTree(s: SliceCtx, cu: CuCtx, x0: Int, y0: Int,
      xBase: Int, yBase: Int, log2Size: Int, depth: Int, blkIdx: Int,
      parentCbfCb: Boolean, parentCbfCr: Boolean): Unit = {
    import H265Cabac._
    val sps = s.sps
    val intraSplit = cu.nxn && depth == 0
    val maxDepth = (if (cu.inter) sps.maxTrafoDepthInter
      else sps.maxTrafoDepthIntra) + (if (cu.nxn) 1 else 0)
    val split =
      if (log2Size > sps.maxTbLog2) true
      else if (intraSplit) true
      else if (log2Size > sps.minTbLog2 && depth < maxDepth)
        s.d.decision(CtxTransSubdiv + 5 - log2Size) == 1
      else false
    var cbfCb = parentCbfCb
    var cbfCr = parentCbfCr
    if (log2Size > 2) {
      if (depth == 0 || parentCbfCb)
        cbfCb = s.d.decision(CtxCbfChroma + depth) == 1
      else cbfCb = false
      if (depth == 0 || parentCbfCr)
        cbfCr = s.d.decision(CtxCbfChroma + depth) == 1
      else cbfCr = false
    }
    if (split) {
      val h = 1 << (log2Size - 1)
      transformTree(s, cu, x0, y0, x0, y0, log2Size - 1, depth + 1, 0, cbfCb, cbfCr)
      transformTree(s, cu, x0 + h, y0, x0, y0, log2Size - 1, depth + 1, 1, cbfCb, cbfCr)
      transformTree(s, cu, x0, y0 + h, x0, y0, log2Size - 1, depth + 1, 2, cbfCb, cbfCr)
      transformTree(s, cu, x0 + h, y0 + h, x0, y0, log2Size - 1, depth + 1, 3, cbfCb, cbfCr)
    } else {
      // cbf_luma: decoded for intra always; for inter inferred 1 at
      // depth 0 with both chroma cbfs 0 (§7.3.8.8 — rqt_root_cbf
      // already promised residual)
      val cbfLuma =
        if (cu.inter && depth == 0 && !cbfCb && !cbfCr) true
        else s.d.decision(CtxCbfLuma + (if (depth == 0) 1 else 0)) == 1
      // ---- transform_unit: luma TB, then chroma at this or parent level
      val mode = cu.lumaMode(x0, y0)
      reconTb(s, s.pic.luma, s.pic.lumaStride, x0, y0, log2Size, mode,
        luma = true, cbfLuma, s.qpY)
      if (log2Size > 2) {
        val cLog2 = log2Size - 1
        reconTb(s, s.pic.cb, s.pic.chromaStride, x0 >> 1, y0 >> 1, cLog2,
          cu.chromaMode, luma = false, cbfCb, s.qpCb)
        reconTb(s, s.pic.cr, s.pic.chromaStride, x0 >> 1, y0 >> 1, cLog2,
          cu.chromaMode, luma = false, cbfCr, s.qpCr)
      } else if (blkIdx == 3) {
        // 4x4 luma TBs: the single 4x4 chroma TB rides the LAST child,
        // at the parent's coordinates, with the parent-level cbfs
        reconTb(s, s.pic.cb, s.pic.chromaStride, xBase >> 1, yBase >> 1, 2,
          cu.chromaMode, luma = false, parentCbfCb, s.qpCb)
        reconTb(s, s.pic.cr, s.pic.chromaStride, xBase >> 1, yBase >> 1, 2,
          cu.chromaMode, luma = false, parentCbfCr, s.qpCr)
      }
    }
  }

  /** Shared tail of an inter CU: motion/mode grids, MC already done by
    * the caller; decode the transform tree when `rootCbf`, else mark
    * the CU reconstructed as-is.
    */
  private def finishInterCu(s: SliceCtx, x0: Int, y0: Int, log2CbSize: Int,
      mi: H265Inter.Mi, skip: Boolean, rootCbf: Boolean): Unit = {
    val pic = s.pic
    val nCb = 1 << log2CbSize
    pic.setMotion2(x0, y0, nCb, mi, skip)
    pic.setMode(x0, y0, nCb, 1) // inter counts as DC for intra MPMs (§8.4.2)
    if (rootCbf) {
      val cu = new CuCtx(x0, y0, log2CbSize, nxn = false, Array(-1),
        inter = true)
      transformTree(s, cu, x0, y0, x0, y0, log2CbSize, 0, 0,
        parentCbfCb = false, parentCbfCr = false)
    } else {
      pic.markLuma(x0, y0, nCb)
      pic.markChroma(x0 >> 1, y0 >> 1, nCb >> 1)
    }
  }

  /** coding_unit (§7.3.8.5): cu_skip / pred_mode / part_mode / pcm /
    * intra modes / inter PU / transform tree, with recon inline (recon
    * order == z-scan order). Inter scope (tier 3): P slices, 2Nx2N
    * PUs, merge or AMVP against the single list-0 reference.
    */
  private def codingUnit(s: SliceCtx, x0: Int, y0: Int, log2CbSize: Int,
      cqtDepth: Int): Unit = {
    import H265Cabac._
    val sps = s.sps
    val pic = s.pic
    val nCb = 1 << log2CbSize
    pic.setDepth(x0, y0, nCb, cqtDepth)
    if (s.sliceType != 2) {
      val bSlice = s.sliceType == 0
      // cu_skip_flag, ctxInc from decoded neighbor skips (§9.3.4.2.2)
      val ctxInc = pic.skipAt(x0 - 1, y0) + pic.skipAt(x0, y0 - 1)
      if (s.d.decision(CtxCuSkip + ctxInc) == 1) {
        val idx = decodeMergeIdx(s.d, s.maxMerge)
        val mi = H265Inter.mergeCandidatesMi(pic, x0, y0, nCb, nCb,
          s.maxMerge, bSlice, s.refPocs0, s.refPocs1,
          numRefMerge = if (bSlice) 1 else s.activeL0, col = s.col)(idx)
        if (debugPu)
          println(s"PU ($x0,$y0)x$nCb skip idx=$idx mi=$mi")
        s.weights match {
          case Some(pw) => H265Inter.mcCuWp(s.refs0(mi.ref0), s.ref1,
            pic, x0, y0, nCb, mi, pw)
          case None => H265Inter.mcCuMi(s.refs0(mi.ref0), s.ref1,
            pic, x0, y0, nCb, mi)
        }
        finishInterCu(s, x0, y0, log2CbSize, mi, skip = true,
          rootCbf = false)
        return
      }
      if (s.d.decision(CtxPredMode) == 0) { // MODE_INTER
        // part_mode (always present for inter CUs): tier = 2Nx2N only
        require(s.d.decision(CtxPartMode) == 1,
          "non-2Nx2N inter partitions out of the tier")
        // prediction_unit(x0, y0, nCb, nCb): one active reference per
        // list (no ref_idx bins); B slices carry inter_pred_idc
        val merge = s.d.decision(CtxMergeFlag) == 1
        val mi =
          if (merge) {
            val idx = decodeMergeIdx(s.d, s.maxMerge)
            H265Inter.mergeCandidatesMi(pic, x0, y0, nCb, nCb, s.maxMerge,
              bSlice, s.refPocs0, s.refPocs1,
              numRefMerge = if (bSlice) 1 else s.activeL0, col = s.col)(idx)
          } else {
            val dir =
              if (bSlice) decodeInterPredIdc(s.d, cqtDepth) match {
                case 0 => 1; case 1 => 2; case _ => 3
              }
              else 1
            var mv0 = (0, 0); var mv1 = (0, 0)
            var r0 = 0
            if ((dir & 1) != 0) {
              // ref_idx_l0 precedes mvd_coding (§7.3.8.6), present
              // only when more than one reference is active
              r0 = H265Cabac.decodeRefIdx(s.d, s.activeL0)
              val (mvdX, mvdY) = decodeMvd(s.d)
              val mvpIdx = s.d.decision(CtxMvpFlag)
              val mvp = H265Inter.amvpCandidatesMi(pic, x0, y0, nCb, nCb,
                listX = 0, s.currPoc, s.refPocs0, s.refPocs1,
                refIdx = r0, col = s.col)(mvpIdx)
              mv0 = (mvp._1 + mvdX, mvp._2 + mvdY)
            }
            if ((dir & 2) != 0) {
              // §7.3.8.6: MvdL1 = 0 when mvd_l1_zero_flag and bi-pred
              // (mvd_coding absent; mvp_l1_flag still present)
              val (mvdX, mvdY) =
                if (s.mvdL1Zero && dir == 3) (0, 0) else decodeMvd(s.d)
              val mvpIdx = s.d.decision(CtxMvpFlag)
              val mvp = H265Inter.amvpCandidatesMi(pic, x0, y0, nCb, nCb,
                listX = 1, s.currPoc, s.refPocs0, s.refPocs1,
                col = s.col)(mvpIdx)
              mv1 = (mvp._1 + mvdX, mvp._2 + mvdY)
            }
            H265Inter.Mi(dir, mv0._1, mv0._2, mv1._1, mv1._2, r0, 0)
          }
        if (debugPu)
          println(s"PU ($x0,$y0)x$nCb merge=$merge mi=$mi")
        s.weights match {
          case Some(pw) => H265Inter.mcCuWp(s.refs0(mi.ref0), s.ref1,
            pic, x0, y0, nCb, mi, pw)
          case None => H265Inter.mcCuMi(s.refs0(mi.ref0), s.ref1,
            pic, x0, y0, nCb, mi)
        }
        // rqt_root_cbf: parsed unless merge-2Nx2N (then inferred 1)
        val rootCbf = merge || s.d.decision(CtxRqtRootCbf) == 1
        finishInterCu(s, x0, y0, log2CbSize, mi, skip = false,
          rootCbf = rootCbf)
        return
      }
      // MODE_INTRA falls through to the intra path below
    }
    // part_mode: decoded only at min CB (intra: bin 1 = 2Nx2N, 0 = NxN;
    // NxN only legal when the CU can split its transform once)
    val nxn =
      if (log2CbSize == sps.minCbLog2 && log2CbSize > sps.minTbLog2)
        s.d.decision(CtxPartMode) == 0
      else if (log2CbSize == sps.minCbLog2) { // 8x8 floor with minTb 8: 2Nx2N only
        require(s.d.decision(CtxPartMode) == 1, "PART_NxN without TU split room")
        false
      } else false
    val pcmOk = sps.pcmEnabled && !nxn &&
      log2CbSize >= sps.pcmMinLog2 && log2CbSize <= sps.pcmMaxLog2
    val pcm = pcmOk && s.d.terminate() == 1
    if (pcm) {
      require(sps.pcmBitDepth == 8, "non-8-bit PCM out of scope")
      // §9.3.1: flush after the terminate bin, byte-align, raw samples,
      // fresh engine init over the same (persisting) context variables
      s.d.flushAfterTerminate()
      val r = s.r
      while (r.remaining % 8 != 0) r.u(1) // pcm_alignment_zero_bit
      var i = 0
      while (i < nCb * nCb) {
        pic.luma((y0 + i / nCb) * pic.lumaStride + x0 + i % nCb) = r.u(8).toByte
        i += 1
      }
      val half = nCb >> 1
      val cpx = x0 >> 1; val cpy = y0 >> 1
      i = 0
      while (i < half * half) {
        pic.cb((cpy + i / half) * pic.chromaStride + cpx + i % half) = r.u(8).toByte
        i += 1
      }
      i = 0
      while (i < half * half) {
        pic.cr((cpy + i / half) * pic.chromaStride + cpx + i % half) = r.u(8).toByte
        i += 1
      }
      s.d = new H264Cabac.Decoder(r, s.ctx)
      pic.setMode(x0, y0, nCb, 1) // PCM counts as DC for MPMs (§8.4.2)
      pic.markLuma(x0, y0, nCb)
      pic.markChroma(cpx, cpy, half)
      if (sps.pcmLoopFilterDisabled) pic.markNoFilter(x0, y0, nCb)
      return
    }
    // prev_intra_luma_pred_flag for every PU FIRST, then per-PU
    // mpm_idx / rem (§7.3.8.5 syntax order)
    val nPu = if (nxn) 4 else 1
    val puSize = if (nxn) nCb >> 1 else nCb
    val prev = new Array[Boolean](nPu)
    var p = 0
    while (p < nPu) { prev(p) = s.d.decision(CtxPrevIntraLuma) == 1; p += 1 }
    val modes = new Array[Int](nPu)
    val ctbMask = ~((1 << sps.ctbLog2) - 1)
    p = 0
    while (p < nPu) {
      val xPb = x0 + (if ((p & 1) == 1) puSize else 0)
      val yPb = y0 + (if (p >= 2) puSize else 0)
      val candA = pic.candMode(xPb - 1, yPb, aboveOutsideCtb = false)
      val candB = pic.candMode(xPb, yPb - 1,
        aboveOutsideCtb = (yPb - 1) < (yPb & ctbMask))
      val mpm = mpmList(candA, candB)
      val mode =
        if (prev(p)) mpm(decodeMpmIdx(s.d))
        else {
          val rem = decodeRemIntra(s.d)
          val sorted = mpm.sorted
          var m = rem
          var i = 0
          while (i < 3) { if (m >= sorted(i)) m += 1; i += 1 }
          m
        }
      require(mode >= 0 && mode <= 34, s"bad intra mode $mode")
      modes(p) = mode
      pic.setMode(xPb, yPb, puSize, mode) // parse-time: PU p+1's candA
      p += 1
    }
    val chromaMode = decodeChromaMode(s.d)
    if (debugPu)
      println(s"IN ($x0,$y0)x$nCb nxn=$nxn modes=${modes.toList} chromaIdx=$chromaMode")
    val cu = new CuCtx(x0, y0, log2CbSize, nxn, modes,
      chromaIdx = chromaMode)
    transformTree(s, cu, x0, y0, x0, y0, log2CbSize, 0, 0,
      parentCbfCb = false, parentCbfCr = false)
  }

  /** coding_quadtree (§7.3.8.4). Dimensions are CTB-aligned (checked at
    * slice level), so the in-picture split inferences never trigger.
    */
  private def codingQuadtree(s: SliceCtx, x0: Int, y0: Int,
      log2CbSize: Int, cqtDepth: Int): Unit = {
    val split =
      if (log2CbSize > s.sps.minCbLog2) {
        val ctxInc = s.pic.depthGt(x0 - 1, y0, cqtDepth) +
          s.pic.depthGt(x0, y0 - 1, cqtDepth)
        s.d.decision(H265Cabac.CtxSplitCu + ctxInc) == 1
      } else false
    if (split) {
      val h = 1 << (log2CbSize - 1)
      codingQuadtree(s, x0, y0, log2CbSize - 1, cqtDepth + 1)
      codingQuadtree(s, x0 + h, y0, log2CbSize - 1, cqtDepth + 1)
      codingQuadtree(s, x0, y0 + h, log2CbSize - 1, cqtDepth + 1)
      codingQuadtree(s, x0 + h, y0 + h, log2CbSize - 1, cqtDepth + 1)
    } else codingUnit(s, x0, y0, log2CbSize, cqtDepth)
  }

  /** pred_weight_table (§7.3.6.3) at one active reference per list,
    * 4:2:0: shared luma/chroma log2 denominators, per-list flags and
    * (delta weight, offset) pairs. Chroma offsets decode through the
    * §7.4.7.3 prediction: ChromaOffset = Clip3(−128, 127,
    * delta − (((128·w) >> denom) − 128)). Flag-absent entries take
    * the defaults (w = 1 << denom, o = 0).
    */
  private def readPredWeightTable(r: H264.BitReader,
      bSlice: Boolean): H265Inter.PredWeights = {
    import H265Inter.Wp
    val lumaDenom = r.ue()
    require(lumaDenom <= 7, s"bad luma_log2_weight_denom $lumaDenom")
    val chromaDenom = lumaDenom + r.se()
    require(chromaDenom >= 0 && chromaDenom <= 7,
      s"bad chroma log2 weight denom $chromaDenom")
    def list(): (Wp, Wp, Wp) = {
      val lumaFlag = r.flag()
      val chromaFlag = r.flag()
      val y = if (lumaFlag) {
        val w = (1 << lumaDenom) + r.se()
        val o = r.se()
        require(w >= -128 && w <= 127 + (1 << lumaDenom) &&
          o >= -128 && o <= 127, "luma weight/offset out of range")
        Wp(w, o)
      } else Wp(1 << lumaDenom, 0)
      val (cbW, crW) =
        if (chromaFlag) {
          def one(): Wp = {
            val w = (1 << chromaDenom) + r.se()
            val dOff = r.se()
            val o = math.max(-128, math.min(127,
              dOff - (((128 * w) >> chromaDenom) - 128)))
            Wp(w, o)
          }
          (one(), one())
        } else (Wp(1 << chromaDenom, 0), Wp(1 << chromaDenom, 0))
      (y, cbW, crW)
    }
    val (l0y, l0cb, l0cr) = list()
    val (l1y, l1cb, l1cr) =
      if (bSlice) list()
      else (Wp(1 << lumaDenom, 0), Wp(1 << chromaDenom, 0),
        Wp(1 << chromaDenom, 0))
    H265Inter.PredWeights(lumaDenom, chromaDenom, l0y, l0cb, l0cr,
      l1y, l1cb, l1cr)
  }

  private def decodeSlice(sps: H265.SpsInfo, pps: H265.PpsInfo,
      payload: Array[Byte], nalType: Int,
      dpb: Seq[(Pic, Int)], prevPoc: Int): Option[(Frame, Pic, Int)] = {
    val irap = H265.isIrap(nalType)
    val idr = nalType == 19 || nalType == 20 // IDR_W_RADL / IDR_N_LP
    // tier structural requirements — each a loud reject, not a wrong
    // decode
    require(sps.ctbLog2 >= 4 && sps.ctbLog2 <= 6, "CTB must be 16/32/64")
    require(sps.minCbLog2 >= 3 && sps.minCbLog2 <= sps.ctbLog2, "bad min CB")
    require(sps.minTbLog2 == 2 && sps.maxTbLog2 >= 2 && sps.maxTbLog2 <= 5,
      "TB sizes out of range")
    require(sps.maxTrafoDepthIntra <= 3, "transform hierarchy too deep")
    require(!sps.scalingList && !sps.ampEnabled &&
      !sps.strongIntraSmoothing,
      "scaling lists/AMP/strong smoothing out of scope")
    // SAO: live since r12 (slice-flag-controlled, §8.7.3)
    // deblocking: live since r12 (PPS-controlled; tier-1/2 fixture
    // streams keep it disabled, the q160 rung enables it)
    val ctbSize = 1 << sps.ctbLog2
    require(sps.width % ctbSize == 0 && sps.height % ctbSize == 0,
      "partial CTBs out of scope")
    val r = new H264.BitReader(H264.rbsp(payload))
    require(r.flag(), "multi-slice pictures out of scope") // first_slice_..._flag
    if (irap) r.flag() // no_output_of_prior_pics
    r.ue() // slice_pic_parameter_set_id
    val sliceType = r.ue()
    require(sliceType >= 0 && sliceType <= 2,
      s"slice type $sliceType out of the tier")
    if (irap) require(sliceType == 2, "inter slice in an IRAP picture")
    @inline def inDpb(p: Int): Pic =
      dpb.collectFirst { case (pic, pc) if pc == p => pic }.getOrElse(
        throw new IllegalArgumentException(s"RPS POC $p not in the DPB"))
    var poc = 0
    var refs0: IndexedSeq[Pic] = IndexedSeq.empty; var ref1: Pic = null
    var refPocs0: IndexedSeq[Int] = IndexedSeq(0); var refPoc1 = 0
    var sliceTmvp = false
    if (!idr) {
      // slice_pic_order_cnt_lsb + §8.3.1 POC derivation vs the
      // previous reference picture (prevTid0Pic)
      val lsb = r.u(sps.log2MaxPocLsb)
      val maxLsb = 1 << sps.log2MaxPocLsb
      val prevLsb = prevPoc & (maxLsb - 1)
      val prevMsb = prevPoc - prevLsb
      poc =
        if (lsb < prevLsb && prevLsb - lsb >= maxLsb / 2)
          prevMsb + maxLsb + lsb
        else if (lsb > prevLsb && lsb - prevLsb > maxLsb / 2)
          prevMsb - maxLsb + lsb
        else prevMsb + lsb
      require(!r.flag(), "SPS-indexed RPS with an empty SPS RPS list")
      // st_ref_pic_set(stRpsIdx = 0 = num_st_rps): no inter-RPS
      // prediction flag at index 0
      val numNeg = r.ue(); val numPos = r.ue()
      // §7.4.8: delta_poc_s0_minus1[i] is the distance FROM THE
      // PREVIOUS entry — deltas accumulate (closest reference first)
      val negDeltas = new Array[Int](numNeg)
      val negUsed = new Array[Boolean](numNeg)
      var acc = 0
      var i = 0
      while (i < numNeg) {
        acc += r.ue() + 1
        negDeltas(i) = acc; negUsed(i) = r.flag(); i += 1
      }
      val posDeltas = new Array[Int](numPos)
      val posUsed = new Array[Boolean](numPos)
      acc = 0
      i = 0
      while (i < numPos) {
        acc += r.ue() + 1
        posDeltas(i) = acc; posUsed(i) = r.flag(); i += 1
      }
      // r14 (x265 external vectors): RPS entries may be KEPT for
      // future pictures without being used by this one — only the
      // used_by_curr_pic entries build the reference lists (§8.3.4's
      // StCurrBefore/StCurrAfter), in RPS order (closest first)
      val usedNeg = (0 until numNeg).filter(negUsed)
      val usedPos = (0 until numPos).filter(posUsed)
      if (sliceType == 1) {
        require(usedNeg.nonEmpty && usedPos.isEmpty,
          "P pictures use negative references only in the tier")
        refPocs0 = usedNeg.map(k => poc - negDeltas(k)).toIndexedSeq
        refs0 = refPocs0.map(inDpb)
      }
      if (sliceType == 0) {
        // tier-4 B: one used past + one used future reference active —
        // L0 = [StCurrBefore], L1 = [StCurrAfter]
        require(usedNeg.nonEmpty && usedPos.nonEmpty,
          "B pictures need a used reference in each direction")
        refPocs0 = usedNeg.map(k => poc - negDeltas(k)).toIndexedSeq
        refPoc1 = poc + posDeltas(usedPos.head)
        refs0 = refPocs0.map(inDpb)
        ref1 = inDpb(refPoc1)
        require(usedPos.size == 1,
          "tier-4 B slices carry one used future reference")
      }
      // long-term refs: SPS-disabled in all tier streams (flag absent)
      // slice_temporal_mvp_enabled_flag (§7.3.6.1, r15: decoded —
      // temporal MVP is in the tier)
      if (sps.temporalMvp) sliceTmvp = r.flag()
    }
    var saoLuma = false
    var saoChroma = false
    if (sps.saoEnabled) {
      saoLuma = r.flag() // slice_sao_luma_flag
      saoChroma = r.flag() // slice_sao_chroma_flag
    }
    var maxMerge = 5
    var mvdL1Zero = false
    var cabacSwap = false
    var weights: Option[H265Inter.PredWeights] = None
    var activeL0 = 1
    var colFromL0 = true
    var colRefIdx = 0
    if (sliceType != 2) {
      // active reference counts: L0 may carry several (r13 multiref
      // P); L1 stays single; cyclic list construction (active >
      // available, §8.3.4's modulo wrap) stays out of the tier
      if (r.flag()) { // num_ref_idx_active_override_flag
        activeL0 = r.ue() + 1
        if (sliceType == 0)
          require(r.ue() == 0, "one active list-1 reference only")
      } else {
        activeL0 = pps.numRefL0Default + 1
        require(sliceType == 1 || pps.numRefL1Default == 0,
          "PPS default L1 active references beyond the tier")
      }
      require(activeL0 >= 1 && activeL0 <= refs0.size,
        s"active L0 refs $activeL0 beyond the ${refs0.size} RPS entries")
      if (sliceType == 0) require(activeL0 == 1,
        "tier-4 B slices carry one active reference per list")
      // ref_pic_lists_modification: present when the PPS allows it
      // and NumPicTotalCurr > 1. Accept only the identity permutation
      // (list_entry i == i reproduces the default initialization).
      // NumPicTotalCurr (§7.4.7.2): all used entries, both directions
      val numPicTotalCurr = if (sliceType == 0) refs0.size + 1 else refs0.size
      if (pps.listsModification && numPicTotalCurr > 1) {
        val entryBits = 32 - Integer.numberOfLeadingZeros(numPicTotalCurr - 1)
        if (r.flag()) { // ref_pic_list_modification_flag_l0
          var k = 0
          while (k < activeL0) {
            require(r.u(entryBits) == k, "modified ref list 0 out of the tier")
            k += 1
          }
        }
        if (sliceType == 0 && r.flag())
          require(r.u(entryBits) == 0, "modified ref list 1 out of the tier")
      }
      if (sliceType == 0) mvdL1Zero = r.flag() // mvd_l1_zero_flag
      // cabac_init_flag (§9.3.2.2): swaps the P and B context init
      // tables — initType becomes 2 for P, 1 for B
      if (pps.cabacInitPresent) cabacSwap = r.flag()
      // collocated_from_l0_flag / collocated_ref_idx (§7.3.6.1, r15):
      // P slices infer from-L0 = 1; the ref_idx ue appears only when
      // the pointed list has more than one active entry (L1 carries
      // one in the tier, so only the L0 side can spell it out)
      if (sliceTmvp) {
        if (sliceType == 0) colFromL0 = r.flag()
        if (colFromL0 && activeL0 > 1) {
          colRefIdx = r.ue()
          require(colRefIdx < activeL0, s"collocated_ref_idx $colRefIdx")
        }
      }
      // pred_weight_table (§7.3.6.3)
      // when the PPS enables explicit weighting for this slice type
      if ((sliceType == 1 && pps.weightedPred) ||
          (sliceType == 0 && pps.weightedBipred)) {
        // the tier's pred_weight_table carries ONE entry per list —
        // per-reference weight sets stay out of scope
        require(activeL0 == 1,
          "weighted prediction with multiple references out of the tier")
        weights = Some(readPredWeightTable(r, sliceType == 0))
      }
      maxMerge = 5 - r.ue() // five_minus_max_num_merge_cand
      require(maxMerge >= 1 && maxMerge <= 5, s"bad MaxNumMergeCand $maxMerge")
      // deblocking with inter pictures: live since r14 (full §8.7.2.4
      // bS derivation, validated bit-exact against libx265 vectors)
    }
    val qp = pps.initQp + r.se()
    require(qp >= 0 && qp <= 51, s"bad slice qp $qp")
    // slice_loop_filter_across_slices_enabled_flag (§7.3.6.1: present
    // when the PPS enables cross-slice filtering and any in-loop
    // filter — SAO or deblocking — is live)
    if (pps.loopFilterAcrossSlices &&
        (saoLuma || saoChroma || !pps.deblockingDisabled))
      r.flag()
    // byte_alignment (§7.3.2.10): one, then zeros
    require(r.u(1) == 1, "alignment_bit_equal_to_one")
    while (r.remaining % 8 != 0) require(r.u(1) == 0, "alignment zero bit")

    if (debugPu)
      println(s"SLICE poc=$poc type=$sliceType qp=$qp")
    val pic = new Pic(sps.width, sps.height)
    // this picture's lists survive on the Pic for later TMVP against it
    if (sliceType != 2) {
      pic.tmvpRefPocs0 = refPocs0
      if (sliceType == 0) pic.tmvpRefPocs1 = IndexedSeq(refPoc1)
    }
    // §8.5.3.2.8's collocated picture context for THIS slice
    val col =
      if (sliceTmvp && sliceType != 2) {
        val allBefore = refPocs0.forall(_ <= poc) &&
          (sliceType != 0 || refPoc1 <= poc)
        Some(H265Inter.ColCtx(
          if (colFromL0) refs0(colRefIdx) else ref1,
          if (colFromL0) refPocs0(colRefIdx) else refPoc1,
          poc, sps.ctbLog2, allBefore, colFromL0))
      } else None
    val s = new SliceCtx(sps, pps, pic, qp, sliceType,
      refs0, maxMerge, ref1, poc, refPocs0, refPoc1, mvdL1Zero, weights,
      activeL0, col)
    s.r = r
    // §9.3.2.2 initType: I → 0; P → 1 (2 with cabac_init_flag);
    // B → 2 (1 with cabac_init_flag)
    s.ctx = sliceType match {
      case 0 => if (cabacSwap) H265Cabac.contextsP(qp)
        else H265Cabac.contextsB(qp)
      case 1 => if (cabacSwap) H265Cabac.contextsB(qp)
        else H265Cabac.contextsP(qp)
      case _ => H265Cabac.contexts(qp)
    }
    s.d = new H264Cabac.Decoder(r, s.ctx)
    val ctbW = sps.width >> sps.ctbLog2
    val ctbH = sps.height >> sps.ctbLog2
    val saoParams =
      if (saoLuma || saoChroma) new Array[H265Sao.Params](ctbW * ctbH)
      else null
    var ctu = 0
    val nCtu = ctbW * ctbH
    var end = false
    while (!end) {
      require(ctu < nCtu, "CTU address past picture end")
      if (saoParams != null) // sao() leads coding_tree_unit (§7.3.8.2)
        H265Sao.decode(s.d, saoParams, ctu, ctbW, saoLuma, saoChroma)
      codingQuadtree(s, (ctu % ctbW) << sps.ctbLog2,
        (ctu / ctbW) << sps.ctbLog2, sps.ctbLog2, 0)
      ctu += 1
      end = s.d.terminate() == 1 // end_of_slice_segment_flag
      require(!s.d.exhausted, "HEVC CABAC bitstream exhausted mid-slice")
    }
    require(ctu == nCtu, "slice ended before the picture completed")
    // in-loop filters (r12; inter bS since r14): deblocking, then SAO
    // over the deblocked picture — before output and before the
    // picture serves as a reference
    if (!pps.deblockingDisabled)
      H265Deblock.filterPicture(pic, qp, pps.cbQpOffset, pps.crQpOffset,
        pps.betaOffsetDiv2, pps.tcOffsetDiv2,
        interPic = sliceType != 2,
        refPocs0 = refPocs0, refPocs1 = IndexedSeq(refPoc1))
    if (saoParams != null)
      H265Sao.applyPicture(pic, saoParams, ctbW, ctbH, sps.ctbLog2)
    Some((Frame(sps.width, sps.height, sps.width >> 4, sps.height >> 4,
      pic.luma, pic.cb, pic.cr), pic, poc))
  }
}
