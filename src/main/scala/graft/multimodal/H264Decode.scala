package graft.multimodal

/** H.264 baseline-profile INTRA (IDR) frame decoding — pure Scala, no
  * codec library: slice-header parse (§7.3.3), I-slice macroblock layer
  * (§7.3.5: I_4x4 / I_16x16 / I_PCM), CAVLC residual entropy decode
  * ([[H264Cavlc]], §9.2), dequantization + inverse integer transform
  * (§8.5), and full intra prediction (§8.3.1–8.3.3: all nine 4x4 luma
  * modes, four 16x16 luma modes, four chroma modes). This closes the
  * slice-data gap the earlier rounds declared behind the
  * [[Multimodal.FrameDecoder]] boundary — keyframe pixels now
  * reconstruct, so video near-dup can hash DECODED pixels (aHash), not
  * just compressed keyframe bytes.
  *
  * Scope (exactly what corpus keyframe extraction needs, stated
  * honestly):
  *  - IDR pictures only (nal_unit_type 5), frame_mbs_only, 4:2:0,
  *    8-bit, CAVLC or (r8) CABAC entropy (both values of
  *    entropy_coding_mode_flag; CABAC intra via [[H264Cabac]]),
  *    num_slice_groups 1. Anything else returns None — an
  *    undecodable payload is data, not an error, at corpus scale.
  *  - no deblocking filter: output is the pre-filter reconstruction
  *    (bit-exact for streams encoded with
  *    disable_deblocking_filter_idc = 1, which [[H264Encode]] sets; an
  *    approximation 8x8-aHash cannot see for others).
  *  - P/B slices (motion compensation) are out of scope: dedup samples
  *    keyframes, which are self-contained by definition.
  *
  * Reference context: the reference schema carries no media columns at
  * all (music_db.sql defines only relational text/int fields); decode is
  * this library's multimodal extension tier for LLM-training corpora.
  */
object H264Decode {

  /** Parsed PPS — the fields an I-slice decode needs (§7.3.2.2), plus
    * the r10 weighted-prediction gates (`weightedPred` keys the P
    * slice-header `pred_weight_table`; `weightedBipredIdc` 1 = explicit
    * B table, 2 = implicit POC-derived B weights).
    */
  final case class PpsInfo(
      ppsId: Int, spsId: Int, cavlc: Boolean, bottomFieldPoc: Boolean,
      numSliceGroups: Int, picInitQp: Int, chromaQpOffset: Int,
      deblockingPresent: Boolean, constrainedIntra: Boolean,
      redundantPresent: Boolean,
      weightedPred: Boolean = false, weightedBipredIdc: Int = 0,
      numRefIdxL0Default: Int = 1, numRefIdxL1Default: Int = 1)

  /** Parse a PPS NAL payload (EBSP, header stripped) per §7.3.2.2. */
  def parsePps(payload: Array[Byte]): Option[PpsInfo] =
    try {
      val r = new H264.BitReader(H264.rbsp(payload))
      val ppsId = r.ue()
      val spsId = r.ue()
      val cavlc = !r.flag()
      val bottomPoc = r.flag()
      val groups = r.ue() + 1
      if (groups != 1) return None // FMO out of scope
      val nr0 = r.ue() + 1 // num_ref_idx_l0_default_active
      val nr1 = r.ue() + 1 // num_ref_idx_l1_default_active
      val wp = r.flag() // weighted_pred_flag
      val wbi = r.u(2) // weighted_bipred_idc
      val qp = 26 + r.se()
      r.se() // pic_init_qs_minus26
      val cqo = r.se()
      val deb = r.flag()
      val cip = r.flag()
      val red = r.flag()
      Some(PpsInfo(ppsId, spsId, cavlc, bottomPoc, groups, qp, cqo, deb, cip,
        red, wp, wbi, nr0, nr1))
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }

  /** Decoded picture: full (uncropped) planes; `width`/`height` are the
    * CROPPED display dims from the SPS.
    */
  final case class Frame(width: Int, height: Int, mbW: Int, mbH: Int,
      luma: Array[Byte], cb: Array[Byte], cr: Array[Byte]) {
    def lumaStride: Int = mbW * 16
    /** Cropped luma plane, row-major, one byte per pixel. */
    def croppedLuma: Array[Byte] = {
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(luma, y * lumaStride, out, y * width, width)
        y += 1
      }
      out
    }
  }

  // -------------------------------------------------- tables (§8.5)

  /** LevelScale4x4 entries by qp%6: (v0: DC-ish corners, v1: odd-odd,
    * v2: the rest) — Table in §8.5.9.
    */
  private val levelScale: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  @inline private def scaleClass(i: Int, j: Int): Int =
    if ((i & 1) == 0 && (j & 1) == 0) 0 else if ((i & 1) == 1 && (j & 1) == 1) 1 else 2

  /** zig-zag scan: scan index → raster index within a 4x4 block (§8.5.6). */
  val zigzag4x4: Array[Int] = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** 4x4 luma block decoding order within an MB → (x4, y4) block coords (§6.4.3). */
  val blockScan: Array[(Int, Int)] = Array(
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))

  /** Chroma QP mapping (Table 8-15). */
  def chromaQp(qpRaw: Int): Int = {
    val qp = math.max(0, math.min(51, qpRaw))
    if (qp < 30) qp
    else Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
      38, 38, 38, 39, 39, 39, 39)(qp - 30)
  }

  @inline private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Inverse 4x4 integer transform core (§8.5.12.2) on a raster block,
    * IN PLACE, without the final rounding shift.
    */
  private def inverseTransform4x4(d: Array[Int]): Unit = {
    // rows
    var i = 0
    while (i < 4) {
      val o = i * 4
      val e0 = d(o) + d(o + 2); val e1 = d(o) - d(o + 2)
      val e2 = (d(o + 1) >> 1) - d(o + 3); val e3 = d(o + 1) + (d(o + 3) >> 1)
      d(o) = e0 + e3; d(o + 1) = e1 + e2; d(o + 2) = e1 - e2; d(o + 3) = e0 - e3
      i += 1
    }
    // columns
    var j = 0
    while (j < 4) {
      val e0 = d(j) + d(8 + j); val e1 = d(j) - d(8 + j)
      val e2 = (d(4 + j) >> 1) - d(12 + j); val e3 = d(4 + j) + (d(12 + j) >> 1)
      d(j) = e0 + e3; d(4 + j) = e1 + e2; d(8 + j) = e1 - e2; d(12 + j) = e0 - e3
      j += 1
    }
  }

  /** Inverse 4x4 Hadamard (for I_16x16 luma DC, §8.5.10), in place. */
  private def inverseHadamard4x4(d: Array[Int]): Unit = {
    var i = 0
    while (i < 4) {
      val o = i * 4
      val e0 = d(o) + d(o + 2); val e1 = d(o) - d(o + 2)
      val e2 = d(o + 1) - d(o + 3); val e3 = d(o + 1) + d(o + 3)
      d(o) = e0 + e3; d(o + 1) = e1 + e2; d(o + 2) = e1 - e2; d(o + 3) = e0 - e3
      i += 1
    }
    var j = 0
    while (j < 4) {
      val e0 = d(j) + d(8 + j); val e1 = d(j) - d(8 + j)
      val e2 = d(4 + j) - d(12 + j); val e3 = d(4 + j) + d(12 + j)
      d(j) = e0 + e3; d(4 + j) = e1 + e2; d(8 + j) = e1 - e2; d(12 + j) = e0 - e3
      j += 1
    }
  }

  /** Dequantize a 4x4 residual block (raster order) for luma/chroma AC or
    * whole-4x4 blocks: c·LevelScale(qp%6, class) << (qp/6) (§8.5.12.1).
    * `skipDc` leaves index 0 untouched (I_16x16 / chroma AC blocks carry
    * their DC separately).
    */
  private def dequant4x4(c: Array[Int], qp: Int, skipDc: Boolean): Unit = {
    val ls = levelScale(qp % 6); val shift = qp / 6
    var k = if (skipDc) 1 else 0
    while (k < 16) {
      val i = k / 4; val j = k % 4
      c(k) = (c(k) * ls(scaleClass(i, j))) << shift
      k += 1
    }
  }

  // ---------------------------------------------- decoder frame state

  private final class State(val sps: H264.SpsInfo, val pps: PpsInfo) {
    val mbW: Int = (sps.width + 15) / 16
    val mbH: Int = (sps.height + 15) / 16
    val lumaStride: Int = mbW * 16
    val chromaStride: Int = mbW * 8
    val luma = new Array[Byte](lumaStride * mbH * 16)
    val cb = new Array[Byte](chromaStride * mbH * 8)
    val cr = new Array[Byte](chromaStride * mbH * 8)
    // per-4x4-block nonzero-coefficient counts (nC context, §9.2.1)
    val nnzLuma = new Array[Int](mbW * 4 * mbH * 4)
    val nnzCb = new Array[Int](mbW * 2 * mbH * 2)
    val nnzCr = new Array[Int](mbW * 2 * mbH * 2)
    // per-4x4-block intra prediction modes (-1 = not an I_4x4 block;
    // I_16x16/I_PCM blocks predict as DC (2) per §8.3.1.1)
    val i4Modes = Array.fill(mbW * 4 * mbH * 4)(-1)
    val mbDecoded = new Array[Boolean](mbW * mbH)
    // multi-slice pictures (r12): §6.4 availability requires the
    // neighbor MB to belong to the CURRENT slice — MBs of earlier
    // slices are decoded but unavailable for intra prediction, nC,
    // and mv prediction. curSlice increments per slice header.
    val mbSlice: Array[Int] = Array.fill(mbW * mbH)(-1)
    var curSlice: Int = -1
    // deblock-parameter consistency across a picture's slices (the
    // filter applies picture-level switches): −3 = none seen yet
    var deblockIdcSeen: Int = -3
    // deblocking inputs (r11, §8.7): per-MB intra/I_PCM flags and the
    // QPy each MB decoded with, plus the slice header's filter switch
    // and alpha/beta offsets (already doubled, §7.3.3's *_div2 * 2)
    val mbIntra = new Array[Boolean](mbW * mbH)
    val mbIPcm = new Array[Boolean](mbW * mbH)
    val mbQp = new Array[Int](mbW * mbH)
    var deblock = false
    var deblockOffA = 0
    var deblockOffB = 0
    // inter state: per-4x4-block motion grids (§8.4.1.3 prediction
    // context, one per reference list; refIdx entries carry the REAL
    // per-partition reference index since r11) and the reference
    // picture lists — RefPicList0/RefPicList1 (§8.2.4.2) as (POC,
    // picture) sequences in list order, built by the sequencer from
    // its sliding-window DPB and truncated to the slice header's
    // num_ref_idx_active counts. Availability/ref-matching is per
    // list: an MB that predicts only from L1 leaves refIdx −1 in the
    // L0 grid and vice versa.
    val mv = new H264Inter.MvGrid(mbW, mbH)
    val mvL1 = new H264Inter.MvGrid(mbW, mbH)
    var list0: IndexedSeq[(Int, Frame)] = IndexedSeq.empty
    var list1: IndexedSeq[(Int, Frame)] = IndexedSeq.empty
    var numRef0: Int = 1 // num_ref_idx_l0_active for the current slice
    var numRef1: Int = 1
    // r12 long-term reference state: the slice's frame_num (picNum
    // arithmetic for MMCO), the IDR long_term_reference_flag, the
    // parsed adaptive marking ops (applied by the sequencer at picture
    // end), and whether the DPB holds long-term entries (gates
    // temporal direct, whose POC-distance scaling is short-term-only
    // in this tier)
    var frameNum: Int = 0
    var isIdrPic: Boolean = false
    var idrLongTerm: Boolean = false
    val mmcoOps = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var mmcoParsed: Boolean = false
    var hasLongTerm: Boolean = false
    @inline def ref0(i: Int): Frame = list0(i)._2
    @inline def ref1(i: Int): Frame = list1(i)._2
    @inline def poc0(i: Int): Int = list0(i)._1
    @inline def poc1(i: Int): Int = list1(i)._1
    // the CO-LOCATED picture's motion grid (the first picture of
    // RefPicList1 = its own decoded motion) — §8.4.1.2.2's
    // colZeroFlag input for spatial direct, and §8.4.1.2.3's mvCol
    // for temporal direct — plus that picture's own L0 POC table
    // (colRefPocs), which maps a co-located block's refIdx to the
    // PICTURE it referenced for the §8.4.1.2.3 refIdxL0 derivation
    var colMv: H264Inter.MvGrid = null
    var colRefPocs: Array[Int] = Array.empty
    // pic_order_cnt_lsb of this picture (pocType 0; 0 otherwise) plus
    // the §8.2.1.1 MSB derivation state: prevPocMsb/prevPocLsb are the
    // previous reference picture's values (seeded by the sequencer, 0
    // after an IDR), pocMsb/poc are derived when the slice header's
    // pic_order_cnt_lsb is parsed. `poc` is the display-order key —
    // wraparound-safe, unlike the raw lsb.
    var pocLsb: Int = 0
    var prevPocMsb: Int = 0
    var prevPocLsb: Int = 0
    var pocMsb: Int = 0
    var poc: Int = 0
    // weighted prediction (r10, §8.4.2.3): explicit slice-header table
    // (P with weighted_pred_flag / B with weighted_bipred_idc 1) or
    // implicit POC-derived B weights (idc 2). Defaults are identity.
    var wpExplicit: Boolean = false
    var wpImplicit: Boolean = false
    var wpLumaLog2: Int = 0
    var wpChromaLog2: Int = 0
    // explicit tables per (list, refIdx) — §7.3.3.2 carries one entry
    // per active reference since the r11 multi-ref tier (16 = the
    // §7.4.2.1.1 max_num_ref_frames ceiling)
    val wpLw: Array[Array[Int]] = Array.fill(2, 16)(1) // (list)(ref) luma w
    val wpLo: Array[Array[Int]] = Array.fill(2, 16)(0) // (list)(ref) luma o
    val wpCw: Array[Array[Array[Int]]] = Array.fill(2, 16, 2)(1) // (list)(ref)(cb/cr)
    val wpCo: Array[Array[Array[Int]]] = Array.fill(2, 16, 2)(0)

    /** Implicit B weights (§8.4.2.3.1, weighted_bipred_idc 2) for a
      * BiPred partition referencing (L0[r0], L1[r1]) — POC-derived per
      * reference PAIR since r11: w1 = DistScaleFactor >> 2 from
      * tb = poc(cur) − poc(L0[r0]), td = poc(L1[r1]) − poc(L0[r0]);
      * 32/32 when the refs share a POC or w1 leaves [−64, 128].
      */
    def implicitW(r0: Int, r1: Int): (Int, Int) = {
      val tb = clip3m(-128, 127, poc - poc0(r0))
      val td = clip3m(-128, 127, poc1(r1) - poc0(r0))
      if (td == 0) return (32, 32)
      val tx = (16384 + math.abs(td / 2)) / td
      val dsf = clip3m(-1024, 1023, (tb * tx + 32) >> 6)
      val w1 = dsf >> 2
      if (w1 < -64 || w1 > 128) (32, 32) else (64 - w1, w1)
    }

    def mbAvailable(mbX: Int, mbY: Int): Boolean =
      mbX >= 0 && mbY >= 0 && mbX < mbW && mbY < mbH &&
        mbDecoded(mbY * mbW + mbX) && mbSlice(mbY * mbW + mbX) == curSlice

    /** nC for a luma 4x4 block at absolute block coords (§9.2.1). */
    def lumaNc(x4: Int, y4: Int): Int = {
      val availA = x4 > 0 && mbAvailable((x4 - 1) / 4, y4 / 4)
      val availB = y4 > 0 && mbAvailable(x4 / 4, (y4 - 1) / 4)
      val nA = if (availA) nnzLuma(y4 * mbW * 4 + (x4 - 1)) else 0
      val nB = if (availB) nnzLuma((y4 - 1) * mbW * 4 + x4) else 0
      if (availA && availB) (nA + nB + 1) >> 1
      else if (availA) nA else if (availB) nB else 0
    }

    def chromaNc(nnz: Array[Int], x2: Int, y2: Int): Int = {
      val availA = x2 > 0 && mbAvailable((x2 - 1) / 2, y2 / 2)
      val availB = y2 > 0 && mbAvailable(x2 / 2, (y2 - 1) / 2)
      val nA = if (availA) nnz(y2 * mbW * 2 + (x2 - 1)) else 0
      val nB = if (availB) nnz((y2 - 1) * mbW * 2 + x2) else 0
      if (availA && availB) (nA + nB + 1) >> 1
      else if (availA) nA else if (availB) nB else 0
    }
  }

  // ------------------------------------------------ intra prediction

  /** 4x4 luma intra prediction (§8.3.1.2). Writes predicted samples into
    * the plane at (px, py); residual add happens afterwards. Neighbor
    * sample availability follows MB availability + block position; the
    * top-right run (E–H) substitutes D when above-right is unavailable.
    */
  private def predict4x4(st: State, mode: Int, px: Int, py: Int,
      availLeft: Boolean, availTop: Boolean, availTopRight: Boolean): Array[Int] = {
    val s = st.lumaStride; val pl = st.luma
    @inline def pix(x: Int, y: Int): Int = pl((py + y) * s + (px + x)) & 0xff
    val top = new Array[Int](8) // A..H
    val left = new Array[Int](4) // I..L
    var corner = 0
    if (availTop) {
      var i = 0
      while (i < 4) { top(i) = pix(i, -1); i += 1 }
      if (availTopRight) { while (i < 8) { top(i) = pix(i, -1); i += 1 } }
      else { while (i < 8) { top(i) = top(3); i += 1 } }
    }
    if (availLeft) { var i = 0; while (i < 4) { left(i) = pix(-1, i); i += 1 } }
    if (availLeft && availTop) corner = pix(-1, -1)
    val out = new Array[Int](16)
    @inline def set(x: Int, y: Int, v: Int): Unit = out(y * 4 + x) = v
    mode match {
      case 0 => // Vertical
        require(availTop, "V pred needs top")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { set(x, y, top(x)); x += 1 }; y += 1 }
      case 1 => // Horizontal
        require(availLeft, "H pred needs left")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { set(x, y, left(y)); x += 1 }; y += 1 }
      case 2 => // DC
        val dc =
          if (availLeft && availTop)
            (top(0) + top(1) + top(2) + top(3) + left(0) + left(1) + left(2) + left(3) + 4) >> 3
          else if (availTop) (top(0) + top(1) + top(2) + top(3) + 2) >> 2
          else if (availLeft) (left(0) + left(1) + left(2) + left(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(out, dc)
      case 3 => // Diagonal Down-Left
        require(availTop, "DDL pred needs top")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val v =
              if (x == 3 && y == 3) (top(6) + 3 * top(7) + 2) >> 2
              else (top(x + y) + 2 * top(x + y + 1) + top(x + y + 2) + 2) >> 2
            set(x, y, v); x += 1
          }
          y += 1
        }
      case 4 => // Diagonal Down-Right
        require(availLeft && availTop, "DDR pred needs left+top")
        // index −1 = the corner sample p(−1,−1) (adjacent-diagonal rows)
        @inline def tcd(i: Int): Int = if (i < 0) corner else top(i)
        @inline def lcd(i: Int): Int = if (i < 0) corner else left(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val v =
              if (x > y) (tcd(x - y - 2) + 2 * tcd(x - y - 1) + tcd(x - y) + 2) >> 2
              else if (x < y) (lcd(y - x - 2) + 2 * lcd(y - x - 1) + lcd(y - x) + 2) >> 2
              else (top(0) + 2 * corner + left(0) + 2) >> 2
            set(x, y, v); x += 1
          }
          y += 1
        }
      case 5 => // Vertical-Right
        require(availLeft && availTop, "VR pred needs left+top")
        @inline def tc(i: Int): Int = if (i < 0) corner else top(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * x - y
            val v =
              if (z >= 0 && z % 2 == 0) (tc(x - (y >> 1) - 1) + tc(x - (y >> 1)) + 1) >> 1
              else if (z >= 0) (tc(x - (y >> 1) - 2) + 2 * tc(x - (y >> 1) - 1) + tc(x - (y >> 1)) + 2) >> 2
              else if (z == -1) (left(0) + 2 * corner + top(0) + 2) >> 2
              else { // zVR < −1: x == 0, indices y−k reach −1 = corner
                @inline def lci(i: Int): Int = if (i < 0) corner else left(i)
                (lci(y - 1) + 2 * lci(y - 2) + lci(y - 3) + 2) >> 2
              }
            set(x, y, v); x += 1
          }
          y += 1
        }
      case 6 => // Horizontal-Down
        require(availLeft && availTop, "HD pred needs left+top")
        @inline def lc(i: Int): Int = if (i < 0) corner else left(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * y - x
            val v =
              if (z >= 0 && z % 2 == 0) (lc(y - (x >> 1) - 1) + lc(y - (x >> 1)) + 1) >> 1
              else if (z >= 0) (lc(y - (x >> 1) - 2) + 2 * lc(y - (x >> 1) - 1) + lc(y - (x >> 1)) + 2) >> 2
              else if (z == -1) (top(0) + 2 * corner + left(0) + 2) >> 2
              else { // zHD < −1: y == 0, indices x−k reach −1 = corner
                @inline def tci(i: Int): Int = if (i < 0) corner else top(i)
                (tci(x - 1) + 2 * tci(x - 2) + tci(x - 3) + 2) >> 2
              }
            set(x, y, v); x += 1
          }
          y += 1
        }
      case 7 => // Vertical-Left
        require(availTop, "VL pred needs top")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val v =
              if (y % 2 == 0) (top(x + (y >> 1)) + top(x + (y >> 1) + 1) + 1) >> 1
              else (top(x + (y >> 1)) + 2 * top(x + (y >> 1) + 1) + top(x + (y >> 1) + 2) + 2) >> 2
            set(x, y, v); x += 1
          }
          y += 1
        }
      case 8 => // Horizontal-Up
        require(availLeft, "HU pred needs left")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = x + 2 * y
            val v =
              if (z % 2 == 0 && z < 5) (left(y + (x >> 1)) + left(y + (x >> 1) + 1) + 1) >> 1
              else if (z < 5) (left(y + (x >> 1)) + 2 * left(y + (x >> 1) + 1) + left(y + (x >> 1) + 2) + 2) >> 2
              else if (z == 5) (left(2) + 3 * left(3) + 2) >> 2
              else left(3)
            set(x, y, v); x += 1
          }
          y += 1
        }
      case other => throw new IllegalArgumentException(s"bad intra4x4 mode $other")
    }
    out
  }

  /** 16x16 luma (size 16) / 8x8 chroma (size 8) plane prediction shared
    * helper for V/H/DC/Plane (§8.3.2 / §8.3.4 with the size-dependent
    * plane constants).
    */
  private def predictPlaneBlock(plane: Array[Byte], stride: Int, px: Int, py: Int,
      size: Int, mode: Int, availLeft: Boolean, availTop: Boolean): Array[Int] = {
    @inline def pix(x: Int, y: Int): Int = plane((py + y) * stride + (px + x)) & 0xff
    val out = new Array[Int](size * size)
    mode match {
      case 0 => // Vertical (chroma mode 2 maps here by caller)
        require(availTop, "V pred needs top")
        var y = 0
        while (y < size) { var x = 0; while (x < size) { out(y * size + x) = pix(x, -1); x += 1 }; y += 1 }
      case 1 => // Horizontal
        require(availLeft, "H pred needs left")
        var y = 0
        while (y < size) { var x = 0; while (x < size) { out(y * size + x) = pix(-1, y); x += 1 }; y += 1 }
      case 2 => // DC (whole-block; chroma's per-quadrant DC handled by caller)
        var sum = 0; var cnt = 0
        if (availTop) { var x = 0; while (x < size) { sum += pix(x, -1); x += 1 }; cnt += size }
        if (availLeft) { var y = 0; while (y < size) { sum += pix(-1, y); y += 1 }; cnt += size }
        val dc = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
        java.util.Arrays.fill(out, dc)
      case 3 => // Plane
        require(availLeft && availTop, "plane pred needs left+top")
        val half = size / 2
        var h = 0; var v = 0
        var i = 1
        while (i <= half) {
          h += i * (pix(half - 1 + i, -1) - pix(half - 1 - i, -1))
          v += i * (pix(-1, half - 1 + i) - pix(-1, half - 1 - i))
          i += 1
        }
        val (b, c) =
          if (size == 16) (((5 * h + 32) >> 6), ((5 * v + 32) >> 6))
          else (((17 * h + 16) >> 5), ((17 * v + 16) >> 5))
        val a = 16 * (pix(-1, size - 1) + pix(size - 1, -1))
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            out(y * size + x) = clip255((a + b * (x - (half - 1)) + c * (y - (half - 1)) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case other => throw new IllegalArgumentException(s"bad plane pred mode $other")
    }
    out
  }

  /** Chroma 8x8 DC prediction with the §8.3.4.1 per-4x4-quadrant rules:
    * each 4x4 sub-block averages ITS top/left runs (top-only for the
    * upper-right quadrant when left is also available, etc.).
    */
  private def predictChromaDc(plane: Array[Byte], stride: Int, px: Int, py: Int,
      availLeft: Boolean, availTop: Boolean): Array[Int] = {
    @inline def pix(x: Int, y: Int): Int = plane((py + y) * stride + (px + x)) & 0xff
    val out = new Array[Int](64)
    var by = 0
    while (by < 2) {
      var bx = 0
      while (bx < 2) {
        var sumT = 0; var sumL = 0
        if (availTop) { var x = 0; while (x < 4) { sumT += pix(bx * 4 + x, -1); x += 1 } }
        if (availLeft) { var y = 0; while (y < 4) { sumL += pix(-1, by * 4 + y); y += 1 } }
        val dc =
          if ((bx, by) == ((0, 0)) || (bx, by) == ((1, 1))) {
            if (availTop && availLeft) (sumT + sumL + 4) >> 3
            else if (availTop) (sumT + 2) >> 2
            else if (availLeft) (sumL + 2) >> 2
            else 128
          } else if (bx == 1 && by == 0) {
            if (availTop) (sumT + 2) >> 2
            else if (availLeft) (sumL + 2) >> 2
            else 128
          } else { // bx == 0, by == 1
            if (availLeft) (sumL + 2) >> 2
            else if (availTop) (sumT + 2) >> 2
            else 128
          }
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) { out((by * 4 + y) * 8 + bx * 4 + x) = dc; x += 1 }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    out
  }

  // ------------------------------------------------- coded_block_pattern

  /** Table 9-4 (intra column): codeNum → coded_block_pattern for
    * ChromaArrayType 1 (4:2:0).
    */
  val cbpIntraByCodeNum: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** Inverse of [[cbpIntraByCodeNum]] (for the encoder). */
  lazy val cbpIntraToCodeNum: Map[Int, Int] =
    cbpIntraByCodeNum.zipWithIndex.toMap

  // ------------------------------------------------------ slice decode

  /** Decode the first IDR picture of an Annex-B byte stream. Returns None
    * when the stream is missing SPS/PPS/IDR NALs or uses features out of
    * the declared scope.
    */
  def decodeIdrFrame(annexB: Array[Byte]): Option[Frame] =
    try decodeIdrFrameUnsafe(annexB)
    catch {
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
          _: java.util.NoSuchElementException => None
    }

  /** [[decodeIdrFrame]] without the malformed-input catch — test/debug
    * face: a fixture that SHOULD decode surfaces its failure as the
    * exception instead of a silent None.
    */
  private[multimodal] def decodeIdrFrameUnsafe(annexB: Array[Byte]): Option[Frame] = {
    val nals = H264.nalUnitsAnnexB(annexB)
    var sps: Option[H264.SpsInfo] = None
    var pps: Option[PpsInfo] = None
    var st: State = null
    var sawIdr = false
    nals.foreach { nal =>
      nal.nalType match {
        case 7 => sps = H264.parseSps(nal.payload)
        case 8 => pps = parsePps(nal.payload)
        case 5 if st == null || !st.mbDecoded.forall(identity) =>
          // stop consuming IDR NALs once the FIRST picture is complete
          // (r7 advice): a multi-picture Annex-B stream must return
          // picture 1's pixels, not let later IDR slices overwrite them
          (sps, pps) match {
            // dims bound: a corrupted SPS can declare absurd sizes via
            // ue(v) and the State allocation would OOM before any parse
            // error surfaces — 8192² is beyond every defined H.264 level
            case (Some(s), Some(p)) if s.frameMbsOnly && s.chromaFormatIdc == 1 &&
                s.width > 0 && s.height > 0 && s.width <= 8192 && s.height <= 8192 =>
              if (st == null) st = new State(s, p)
              decodeSlice(st, nal.payload, isIdr = true)
              sawIdr = true
            case _ => return None
          }
        case _ => // ignore SEI, AUD, non-IDR slices after the first picture
      }
    }
    if (!sawIdr || st == null || !st.mbDecoded.forall(identity)) None
    else Some(Frame(st.sps.width, st.sps.height, st.mbW, st.mbH,
      st.luma, st.cb, st.cr))
  }

  /** Decode the sync-sample IDR pictures of an avc1 mp4 to frames, by
    * re-framing each keyframe as Annex-B (avcC SPS + PPS + the sample's
    * IDR slice NALs) and running [[decodeIdrFrame]]. Keyframes outside
    * the decode scope (non-4:2:0, FMO, …) are skipped, not errors.
    */
  def decodeMp4AvcKeyframes(bytes: Array[Byte], maxFrames: Int = 4): Seq[Frame] = {
    val parsed = for {
      avcc <- VideoContainers.mp4AvcC(bytes)
      (lengthSize, spsL, ppsL) <- H264.parseAvcC(avcc)
      if spsL.nonEmpty && ppsL.nonEmpty
    } yield {
      val ranges = VideoContainers.mp4SampleRanges(bytes)
      val sync = VideoContainers.mp4SyncSamples(bytes) match {
        case Nil => ranges.indices.map(_ + 1)
        case s => s
      }
      sync.iterator.flatMap { s1 =>
        ranges.lift(s1 - 1).flatMap { case (off, len) =>
          if (off < 0 || len <= 0 || off + len > bytes.length) None
          else {
            val sample = java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)
            val idr = H264.nalUnitsAvcc(sample, lengthSize).filter(_.nalType == 5)
            if (idr.isEmpty) None
            else decodeIdrFrame(H264Encode.annexB(
              Seq((7, 3, spsL.head), (8, 3, ppsL.head)) ++
                idr.map(n => (5, n.refIdc, n.payload))))
          }
        }
      }.take(maxFrames).toSeq
    }
    parsed.getOrElse(Nil)
  }

  /** Luma plane → 8-bit grayscale BufferedImage (the hand-off into the
    * real image path: [[Multimodal.imageAHash]] and friends — gray RGB
    * has luminance exactly equal to the luma byte).
    */
  def toGrayImage(frame: Frame): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      frame.width, frame.height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, frame.width, frame.height, frame.croppedLuma)
    img
  }

  private def decodeSlice(st: State, payload: Array[Byte], isIdr: Boolean,
      refIdc: Int = 1): Unit = {
    val rb = H264.rbsp(payload)
    val r = new H264.BitReader(rb)
    // last 1 bit = rbsp_stop_one_bit; more_rbsp_data while bits remain before it
    val totalBits = rb.length * 8
    var lastOne = -1
    var k = totalBits - 1
    while (k >= 0 && lastOne < 0) {
      if (((rb(k >> 3) >> (7 - (k & 7))) & 1) == 1) lastOne = k
      k -= 1
    }
    require(lastOne >= 0, "no rbsp stop bit")
    def moreData: Boolean = (totalBits - r.remaining) < lastOne

    // ---- slice_header (§7.3.3): IDR I-slice subset, plus the P-slice
    // subset (r11: up to 16 active L0 references via the
    // num_ref_idx_active override, no list modification, no MMCO) when
    // the State carries reference pictures, plus the B-slice subset
    // (r9 lists, r11 multi-ref per list) when it carries both lists
    // dec_ref_pic_marking, non-IDR form (§7.3.3.3, r12): the adaptive
    // MMCO op list — 1 (unmark short-term by picNum difference), 2
    // (unmark long-term by idx), 3 (convert short-term to long-term),
    // 4 (cap the long-term idx space), 6 (mark CURRENT long-term);
    // 0 ends, 5 (full reset) stays out of scope. Ops are recorded once
    // per picture (every slice repeats them identically — §7.4.3.3);
    // the sequencer applies them at picture end.
    def parseRefPicMarking(st: State, r: H264.BitReader): Unit = {
      if (!r.flag()) return // sliding window
      val local = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var done = false
      while (!done) {
        val op = r.ue()
        op match {
          case 0 => done = true
          case 1 | 2 | 4 | 6 => local += ((op, r.ue(), 0))
          case 3 => local += ((op, r.ue(), r.ue()))
          case 5 => throw new IllegalArgumentException(
            "MMCO 5 (reset all) out of scope")
          case other => throw new IllegalArgumentException(s"bad MMCO $other")
        }
        require(local.size <= 32, "runaway MMCO op list")
      }
      require(local.nonEmpty, "adaptive marking with no ops")
      if (!st.mmcoParsed) st.mmcoOps ++= local
      else require(st.mmcoOps == local,
        "MMCO ops differ between slices of one picture")
      st.mmcoParsed = true
    }

    val firstMb = r.ue()
    val sliceType = r.ue()
    val isP = sliceType == 0 || sliceType == 5
    val isB = sliceType == 1 || sliceType == 6
    require(sliceType == 2 || sliceType == 7 || isP || isB,
      s"slice type $sliceType out of scope")
    // multi-slice pictures (r12): each slice bumps the availability
    // epoch — MBs of earlier slices turn unavailable for §6.4
    // neighbor derivations while staying decoded picture state
    st.curSlice += 1
    st.mv.curSlice = st.curSlice
    st.mvL1.curSlice = st.curSlice
    require(firstMb == 0 || st.curSlice > 0,
      "continuation slice without a picture start")
    require(firstMb < st.mbW * st.mbH, "first_mb_in_slice past picture end")
    require(!isP || st.list0.nonEmpty, "P slice without a reference picture")
    require(!isB || (st.list0.nonEmpty && st.list1.nonEmpty),
      "B slice without both reference lists")
    r.ue() // pps_id (single active PPS assumed)
    st.frameNum = r.u(st.sps.log2MaxFrameNum) // frame_num
    st.isIdrPic = isIdr
    // idr_pic_id presence is keyed on the NAL type (IdrPicFlag, §7.3.3),
    // NOT the slice type: a legal I slice carried in a non-IDR NAL
    // (nal_unit_type 1, common in open-GOP streams) has no idr_pic_id
    if (isIdr) r.ue() // idr_pic_id
    // pocType 1's delta_pic_order_cnt needs SPS flags we don't retain
    require(st.sps.pocType == 0 || st.sps.pocType == 2,
      s"poc type ${st.sps.pocType} out of scope")
    if (st.sps.pocType == 0) {
      st.pocLsb = r.u(st.sps.log2MaxPocLsb) // pic_order_cnt_lsb
      st.pocMsb = derivePocMsb(st.prevPocMsb, st.prevPocLsb, st.pocLsb,
        st.sps.log2MaxPocLsb)
      st.poc = st.pocMsb + st.pocLsb
    }
    if (st.pps.redundantPresent) r.ue()
    // direct_spatial_mv_pred_flag: spatial direct (§8.4.1.2.2) is
    // implemented; temporal direct (POC-distance mv scaling) is out of
    // scope and rejects at the first direct MB
    val directSpatial = if (isB) r.flag() else false
    // temporal direct's §8.4.1.2.3 POC-distance scaling assumes
    // short-term references on both sides — long-term col refs take a
    // fixed scale this tier doesn't implement
    require(!isB || directSpatial || !st.hasLongTerm,
      "temporal direct with long-term references out of scope")
    var cabacInitIdc = 0
    if (isP || isB) {
      // num_ref_idx_active (r11 multi-ref tier): PPS defaults, slice
      // override. The sequencer built full candidate lists from its
      // DPB; a slice demanding more ACTIVE references than the DPB can
      // supply is undecodable here (frame_num-gap repetition is out of
      // scope) and rejects.
      st.numRef0 = st.pps.numRefIdxL0Default
      st.numRef1 = st.pps.numRefIdxL1Default
      if (r.flag()) { // num_ref_idx_active_override_flag
        st.numRef0 = r.ue() + 1
        if (isB) st.numRef1 = r.ue() + 1
      }
      require(st.numRef0 >= 1 && st.numRef0 <= 16 &&
        st.numRef1 >= 1 && st.numRef1 <= 16, "num_ref_idx_active out of range")
      require(st.numRef0 <= st.list0.size,
        s"L0 wants ${st.numRef0} refs, DPB supplies ${st.list0.size}")
      require(!isB || st.numRef1 <= st.list1.size,
        s"L1 wants ${st.numRef1} refs, DPB supplies ${st.list1.size}")
      require(!r.flag(), "ref_pic_list_modification (L0) out of scope")
      if (isB) require(!r.flag(), "ref_pic_list_modification (L1) out of scope")
      // pred_weight_table (§7.3.3.2, r10; r11 multi-ref): explicit
      // weights for P when weighted_pred_flag, for B when
      // weighted_bipred_idc == 1 — one entry per ACTIVE reference per
      // list. A weight flag of 0 leaves that entry at the identity
      // (1 << logWD, offset 0).
      if ((st.pps.weightedPred && isP) ||
          (st.pps.weightedBipredIdc == 1 && isB)) {
        st.wpExplicit = true
        st.wpLumaLog2 = r.ue()
        require(st.wpLumaLog2 <= 7, s"bad luma_log2_weight_denom ${st.wpLumaLog2}")
        st.wpChromaLog2 = r.ue()
        require(st.wpChromaLog2 <= 7,
          s"bad chroma_log2_weight_denom ${st.wpChromaLog2}")
        var l = 0
        val lists = if (isB) 2 else 1
        while (l < lists) {
          val nRefs = if (l == 0) st.numRef0 else st.numRef1
          var ri = 0
          while (ri < nRefs) {
            st.wpLw(l)(ri) = 1 << st.wpLumaLog2; st.wpLo(l)(ri) = 0
            if (r.flag()) {
              st.wpLw(l)(ri) = r.se(); st.wpLo(l)(ri) = r.se()
              require(st.wpLw(l)(ri) >= -128 && st.wpLw(l)(ri) <= 127 &&
                st.wpLo(l)(ri) >= -128 && st.wpLo(l)(ri) <= 127,
                "luma weight out of range")
            }
            var c = 0
            while (c < 2) {
              st.wpCw(l)(ri)(c) = 1 << st.wpChromaLog2
              st.wpCo(l)(ri)(c) = 0; c += 1
            }
            if (r.flag()) {
              c = 0
              while (c < 2) {
                st.wpCw(l)(ri)(c) = r.se(); st.wpCo(l)(ri)(c) = r.se()
                require(st.wpCw(l)(ri)(c) >= -128 && st.wpCw(l)(ri)(c) <= 127 &&
                  st.wpCo(l)(ri)(c) >= -128 && st.wpCo(l)(ri)(c) <= 127,
                  "chroma weight out of range")
                c += 1
              }
            }
            ri += 1
          }
          l += 1
        }
      }
      // implicit B weights (§8.4.2.3.1, idc 2): no syntax — derived
      // per BiPred partition's reference pair (State.implicitW)
      if (st.pps.weightedBipredIdc == 2 && isB) st.wpImplicit = true
      // dec_ref_pic_marking: present only for reference pictures
      // (nal_ref_idc > 0) — our B pictures are non-reference
      if (refIdc > 0) parseRefPicMarking(st, r)
      if (!st.pps.cavlc) {
        cabacInitIdc = r.ue() // cabac_init_idc (§7.3.3: CABAC, non-I)
        require(cabacInitIdc <= 2, s"bad cabac_init_idc $cabacInitIdc")
      }
    } else if (isIdr) {
      // dec_ref_pic_marking (IDR): no_output_of_prior_pics +
      // long_term_reference_flag (r12: marks the IDR long-term idx 0)
      r.flag()
      st.idrLongTerm = r.flag()
    } else if (refIdc > 0) {
      // non-IDR I slice: dec_ref_pic_marking takes the non-IDR form
      parseRefPicMarking(st, r)
    }
    var qp = st.pps.picInitQp + r.se()
    if (st.pps.deblockingPresent) {
      val disable = r.ue()
      require(disable <= 2, s"bad disable_deblocking_filter_idc $disable")
      // idc 0 enables the filter; idc 2 differs from 0 only across
      // slice boundaries — identical for single-slice pictures, but a
      // MULTI-slice picture with idc 2 would need per-edge slice
      // masking the filter doesn't carry: reject loudly (r12 scope)
      require(disable != 2 || st.curSlice == 0,
        "disable_deblocking_filter_idc 2 on a multi-slice picture out of scope")
      // the filter applies picture-level switches/offsets: every slice
      // of a picture must agree (a conformant per-slice variation is
      // out of this tier's scope — fail loud, never filter wrong)
      require(st.deblockIdcSeen == -3 || st.deblockIdcSeen == disable,
        "per-slice deblocking variation out of scope")
      st.deblockIdcSeen = disable
      val prevOffA = st.deblockOffA; val prevOffB = st.deblockOffB
      st.deblock = disable != 1
      if (disable != 1) {
        st.deblockOffA = r.se() * 2 // slice_alpha_c0_offset_div2
        st.deblockOffB = r.se() * 2 // slice_beta_offset_div2
        require(st.deblockOffA >= -12 && st.deblockOffA <= 12 &&
          st.deblockOffB >= -12 && st.deblockOffB <= 12,
          "deblocking offsets out of range")
        // r11 scope: the bS derivation compares single-L0 motion — B
        // pictures (two lists, bidirectional §8.7.2.1 clauses) reject
        // rather than filter wrong
        require(!isB, "deblocking over B slices out of scope")
        require(st.curSlice == 0 ||
          (st.deblockOffA == prevOffA && st.deblockOffB == prevOffB),
          "per-slice deblocking-offset variation out of scope")
      }
    }

    if (!st.pps.cavlc) { // ---- CABAC slice data (r8 intra + r9 inter)
      decodeSliceDataCabac(st, r, firstMb, qp, isP, isB, directSpatial,
        cabacInitIdc)
      return
    }

    // ---- macroblock loop; P and B slices interleave mb_skip_run
    // (§7.3.4). A B skip is B_Skip: spatial-direct motion (§8.4.1.2.2),
    // zero residual.
    var mbAddr = firstMb
    var first = true
    var done = false
    while (!done && (first || moreData)) {
      first = false
      if (isP || isB) {
        var skip = r.ue()
        while (skip > 0) {
          require(mbAddr < st.mbW * st.mbH, "mb address past picture end")
          st.mbDecoded(mbAddr) = true
        st.mbSlice(mbAddr) = st.curSlice
          st.mbQp(mbAddr) = qp // skip MBs carry the running QPy (§8.7)
          st.mv.markMb(mbAddr)
          if (isB) { st.mvL1.markMb(mbAddr)
            decodeBDirectMotion(st, mbAddr, directSpatial) }
          else decodePSkip(st, mbAddr)
          mbAddr += 1
          skip -= 1
        }
        if (!moreData) done = true
      }
      if (!done) {
        require(mbAddr < st.mbW * st.mbH, "mb address past picture end")
        // mark available BEFORE decoding: §6.4.11.4 treats the current
        // MB's already-decoded 4x4 blocks as available neighbors — the nC
        // context of in-MB blocks depends on it (H264ResidualSpec caught
        // the post-hoc marking as a coeff_token table desync)
        st.mbDecoded(mbAddr) = true
        st.mbSlice(mbAddr) = st.curSlice
        st.mv.markMb(mbAddr)
        st.mvL1.markMb(mbAddr)
        val mbType = r.ue()
        qp =
          if (isB) {
            if (mbType >= 23) decodeMacroblock(st, r, mbAddr, qp, mbType - 23)
            else if (mbType == 0) { // B_Direct_16x16: direct motion + residual
              decodeBDirectMotion(st, mbAddr, directSpatial)
              decodeInterResidualCavlc(st, r,
                mbAddr % st.mbW, mbAddr / st.mbW, qp)
            }
            else if (mbType == 22)
              decodeB8x8Macroblock(st, r, mbAddr, qp, directSpatial)
            else decodeBMacroblock(st, r, mbAddr, qp, mbType)
          }
          else if (!isP) decodeMacroblock(st, r, mbAddr, qp, mbType)
          else if (mbType >= 5) decodeMacroblock(st, r, mbAddr, qp, mbType - 5)
          else decodeInterMacroblock(st, r, mbAddr, qp, mbType)
        // record the MB's decoded QPy for deblocking (I_PCM pins 0 at
        // filter time via mbIPcm, §8.7.2's qP assignment)
        st.mbQp(mbAddr) = qp
        mbAddr += 1
      }
    }
    if (st.deblock && mbAddr >= st.mbW * st.mbH) applyDeblock(st)
  }

  /** Run the §8.7 in-loop filter over the completed picture (r11):
    * in place, so the sequencer retains FILTERED planes as references
    * — deblocking is inside the prediction loop, not a display pass.
    */
  private def applyDeblock(st: State): Unit = {
    // the filter's bS motion comparisons read the completed picture's
    // grids across slice boundaries (idc 0): lift the slice gate
    st.mv.seal(); st.mvL1.seal()
    val qps = Array.tabulate(st.mbW * st.mbH)(i =>
      if (st.mbIPcm(i)) 0 else st.mbQp(i))
    H264Deblock.filterPicture(new H264Deblock.PicState(st.mbW, st.mbH,
      st.mbIntra, qps, st.nnzLuma, st.mv,
      q => chromaQp(q + st.pps.chromaQpOffset),
      st.deblockOffA, st.deblockOffB), st.luma, st.cb, st.cr)
  }

  /** Direct motion for one B_Skip / B_Direct_16x16 macroblock,
    * followed by its motion compensation; `spatial` selects the mode.
    *
    * SPATIAL (§8.4.1.2.2) — per list: refIdxLX = MinPositive over the
    * A/B/C neighbors (−1 when none); both −1 → directZeroPrediction
    * (both lists, zero motion); else mvLX = the §8.4.1.3 16x16 median
    * against that list's grid. Per 4x4 sub-block, colZeroFlag (the
    * CO-LOCATED block of the first RefPicList1 picture is inter with
    * |mv| ≤ 1 quarter-pel both components) forces that sub-block's mv
    * to zero for every list with refIdx 0 — which is every used list
    * here (one reference per list).
    *
    * TEMPORAL (§8.4.1.2.3) — per 4x4 sub-block: mvCol from the
    * co-located block (zero when intra / unavailable, the normative
    * fallback), scaled by DistScaleFactor computed from the POC
    * distances tb = poc(cur) − poc(ref0), td = poc(ref1) − poc(ref0):
    * mvL0 = (DSF·mvCol + 128) >> 8, mvL1 = mvL0 − mvCol, both lists
    * always predicted (BiPred).
    *
    * Derived motion is STORED into the grids, so later MBs'
    * predictions see this MB as a normal inter neighbor.
    *
    * r10: region-parameterized for the B_8x8 tier — a B_Direct_8x8
    * sub-block invokes the SAME process over its 2x2-block region
    * (ox4/oy4/rw4/rh4 in 4x4 units, MB-relative). The spatial
    * refIdx/mv derivation stays at MB granularity (§8.4.1.2.2 derives
    * them "for the whole macroblock", its neighbors being the MB's own
    * A/B/C — all outside the MB, so in-MB decode progress cannot
    * change them); only the per-4x4 colZero test and the stores/MC are
    * region-scoped.
    */
  private def decodeBDirectMotion(st: State, mbAddr: Int,
      spatial: Boolean = true, ox4: Int = 0, oy4: Int = 0,
      rw4: Int = 4, rh4: Int = 4): Unit = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    if (!spatial) { // ---- temporal direct
      var y4r = oy4
      while (y4r < oy4 + rh4) {
        var x4r = ox4
        while (x4r < ox4 + rw4) {
          val ax4 = bx4 + x4r; val ay4 = by4 + y4r
          // §8.4.1.2.3 (r11 multi-ref): the co-located block's refIdx
          // maps through the col picture's own L0 POC table to the
          // PICTURE it referenced; refIdxL0 is that picture's index in
          // the CURRENT L0 (must be active). Intra / unavailable
          // co-located blocks take mvCol = 0 with refIdxL0 = 0.
          val colOk = st.colMv != null && st.colMv.blockAvail(ax4, ay4) &&
            st.colMv.refIdx(ay4 * st.colMv.w4 + ax4) >= 0
          val (mcx, mcy, r0) =
            if (colOk) {
              val cr = st.colMv.refIdx(ay4 * st.colMv.w4 + ax4)
              require(cr < st.colRefPocs.length,
                "co-located refIdx outside the col picture's L0")
              val colPoc = st.colRefPocs(cr)
              val idx = st.list0.indexWhere(_._1 == colPoc)
              require(idx >= 0 && idx < st.numRef0,
                "temporal direct: co-located reference not in active L0")
              (st.colMv.mvX(ay4 * st.colMv.w4 + ax4),
                st.colMv.mvY(ay4 * st.colMv.w4 + ax4), idx)
            } else (0, 0, 0)
          val tb = clip3m(-128, 127, st.poc - st.poc0(r0))
          val td = clip3m(-128, 127, st.poc1(0) - st.poc0(r0))
          require(td != 0, "temporal direct with zero POC distance")
          val tx = (16384 + math.abs(td / 2)) / td
          val dsf = clip3m(-1024, 1023, (tb * tx + 32) >> 6)
          val m0x = (dsf * mcx + 128) >> 8; val m0y = (dsf * mcy + 128) >> 8
          val m1x = m0x - mcx; val m1y = m0y - mcy
          st.mv.set(ax4, ay4, 1, 1, m0x, m0y, r0)
          st.mvL1.set(ax4, ay4, 1, 1, m1x, m1y, 0)
          compensateB(st, px + x4r * 4, py + y4r * 4, 4, 4, 2,
            (m0x, m0y), (m1x, m1y), r0, 0)
          x4r += 1
        }
        y4r += 1
      }
      return
    }
    val r0 = st.mv.directRef(bx4, by4)
    val r1 = st.mvL1.directRef(bx4, by4)
    val zeroAll = r0 < 0 && r1 < 0
    val use0 = zeroAll || r0 >= 0
    val use1 = zeroAll || r1 >= 0
    val r0e = if (zeroAll) 0 else r0 // effective refIdx (directZero → 0)
    val r1e = if (zeroAll) 0 else r1
    require(!use0 || r0e < st.numRef0, "spatial direct refIdxL0 not active")
    require(!use1 || r1e < st.numRef1, "spatial direct refIdxL1 not active")
    val m0 = if (!zeroAll && r0 >= 0) st.mv.mvPred(bx4, by4, 4, 4, 0, r0) else (0, 0)
    val m1 = if (!zeroAll && r1 >= 0) st.mvL1.mvPred(bx4, by4, 4, 4, 0, r1) else (0, 0)
    val dir = if (use0 && use1) 2 else if (use0) 0 else 1
    // an unused list's region is still DECODED (refIdx −1 neighbors)
    if (!use0) st.mv.markDone(bx4 + ox4, by4 + oy4, rw4, rh4)
    if (!use1) st.mvL1.markDone(bx4 + ox4, by4 + oy4, rw4, rh4)
    var y4r = oy4
    while (y4r < oy4 + rh4) {
      var x4r = ox4
      while (x4r < ox4 + rw4) {
        val ax4 = bx4 + x4r; val ay4 = by4 + y4r
        val cz = st.colMv != null && st.colMv.colZero(ax4, ay4)
        // §8.4.1.2.2: colZeroFlag zeroes a list's mv only when that
        // list's refIdx is 0 (with one ref per list, every used list)
        val mv0 = if (cz && r0e == 0) (0, 0) else m0
        val mv1 = if (cz && r1e == 0) (0, 0) else m1
        if (use0) st.mv.set(ax4, ay4, 1, 1, mv0._1, mv0._2, r0e)
        if (use1) st.mvL1.set(ax4, ay4, 1, 1, mv1._1, mv1._2, r1e)
        compensateB(st, px + x4r * 4, py + y4r * 4, 4, 4, dir, mv0, mv1,
          r0e, r1e)
        x4r += 1
      }
      y4r += 1
    }
  }

  @inline private def clip3m(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Decode one I-slice macroblock (`mbType` already read — P slices
    * remap their intra range before dispatching here); returns the
    * updated QPy.
    */
  private def decodeMacroblock(st: State, r: H264.BitReader, mbAddr: Int,
      qpIn: Int, mbType: Int): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    var qp = qpIn
    // intra MB: decoded-but-no-list-motion in both grids (available
    // neighbors with refIdx −1 per §8.4.1.3.2 — see MvGrid.markDone)
    st.mv.markDone(mbX * 4, mbY * 4, 4, 4)
    st.mvL1.markDone(mbX * 4, mbY * 4, 4, 4)
    st.mbIntra(mbAddr) = true // deblocking bS 4/3 input (§8.7.2.1)

    if (mbType == 25) { // ---- I_PCM (§7.3.5 + §8.3.5)
      st.mbIPcm(mbAddr) = true // deblocking pins an I_PCM MB's qP to 0
      while ((r.remaining % 8) != 0) require(r.u(1) == 0, "pcm alignment bit not 0")
      var i = 0
      while (i < 256) {
        st.luma((py + i / 16) * st.lumaStride + px + i % 16) = r.u(8).toByte
        i += 1
      }
      val cpx = mbX * 8; val cpy = mbY * 8
      i = 0
      while (i < 64) {
        st.cb((cpy + i / 8) * st.chromaStride + cpx + i % 8) = r.u(8).toByte
        i += 1
      }
      i = 0
      while (i < 64) {
        st.cr((cpy + i / 8) * st.chromaStride + cpx + i % 8) = r.u(8).toByte
        i += 1
      }
      // I_PCM blocks count as 16 nonzero coeffs for neighbor nC (§9.2.1)
      var b = 0
      while (b < 16) {
        st.nnzLuma((mbY * 4 + b / 4) * st.mbW * 4 + mbX * 4 + b % 4) = 16
        b += 1
      }
      b = 0
      while (b < 4) {
        st.nnzCb((mbY * 2 + b / 2) * st.mbW * 2 + mbX * 2 + b % 2) = 16
        st.nnzCr((mbY * 2 + b / 2) * st.mbW * 2 + mbX * 2 + b % 2) = 16
        b += 1
      }
      return qp
    }

    require(mbType <= 25, s"bad I-slice mb_type $mbType")
    val availLeftMb = st.mbAvailable(mbX - 1, mbY)
    val availTopMb = st.mbAvailable(mbX, mbY - 1)

    if (mbType == 0) { // ---------------------------------------- I_4x4
      // parse the 16 prediction modes first (syntax order), §8.3.1.1
      val modes = new Array[Int](16)
      var b = 0
      while (b < 16) {
        val (x4r, y4r) = blockScan(b)
        val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
        // predIntra4x4PredMode from neighbors (DC=2 when unavailable or
        // not I_4x4 — i4Modes stores -1 for non-I_4x4, mapped to 2)
        val leftAvail =
          if (x4r > 0) true else availLeftMb
        val topAvail =
          if (y4r > 0) true else availTopMb
        val mA =
          if (!leftAvail) -1
          else {
            val m = st.i4Modes(ay4 * st.mbW * 4 + ax4 - 1)
            if (m < 0) 2 else m
          }
        val mB =
          if (!topAvail) -1
          else if (st.i4Modes((ay4 - 1) * st.mbW * 4 + ax4) < 0) 2
          else st.i4Modes((ay4 - 1) * st.mbW * 4 + ax4)
        val pred = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
        val mode =
          if (r.flag()) pred
          else { val rem = r.u(3); if (rem < pred) rem else rem + 1 }
        modes(b) = mode
        st.i4Modes(ay4 * st.mbW * 4 + ax4) = mode
        b += 1
      }
      val chromaMode = r.ue()
      require(chromaMode <= 3, s"bad intra_chroma_pred_mode $chromaMode")
      val cbp = {
        val cn = r.ue()
        require(cn < 48, s"bad cbp codeNum $cn")
        cbpIntraByCodeNum(cn)
      }
      val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
      if (cbpLuma > 0 || cbpChroma > 0) qp = ((qp + r.se()) + 52) % 52

      // residual luma 4x4 blocks (§7.3.5.3), then per-block reconstruct
      val coeffs = Array.ofDim[Int](16, 16)
      var blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
        if ((cbpLuma & (1 << (blk / 4))) != 0) {
          val nC = st.lumaNc(ax4, ay4)
          val (scan, tc) = H264Cavlc.decodeResidualBlock(r, 16, nC)
          st.nnzLuma(ay4 * st.mbW * 4 + ax4) = tc
          var si = 0
          while (si < 16) { coeffs(blk)(zigzag4x4(si)) = scan(si); si += 1 }
        } else st.nnzLuma(ay4 * st.mbW * 4 + ax4) = 0
        blk += 1
      }
      // reconstruct in block scan order so intra pred sees neighbors
      blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val bpx = px + x4r * 4; val bpy = py + y4r * 4
        val leftAvail = if (x4r > 0) true else availLeftMb
        val topAvail = if (y4r > 0) true else availTopMb
        // top-right availability per §6.4.11.4 (within MB: only blocks
        // whose above-right neighbor is decoded earlier in scan order)
        val trAvail =
          if (y4r == 0) (if (x4r < 3) availTopMb else st.mbAvailable(mbX + 1, mbY - 1))
          else if (x4r == 3) false
          else blockScan.indexOf((x4r + 1, y4r - 1)) < blk
        val pred = predict4x4(st, modes(blk), bpx, bpy, leftAvail, topAvail, trAvail)
        val res = coeffs(blk)
        if ((cbpLuma & (1 << (blk / 4))) != 0) {
          dequant4x4(res, qp, skipDc = false)
          inverseTransform4x4(res)
        }
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val rv = if ((cbpLuma & (1 << (blk / 4))) != 0) (res(y * 4 + x) + 32) >> 6 else 0
            st.luma((bpy + y) * st.lumaStride + bpx + x) =
              clip255(pred(y * 4 + x) + rv).toByte
            x += 1
          }
          y += 1
        }
        blk += 1
      }
      decodeChroma(st, r, mbX, mbY, chromaMode, cbpChroma, qp, availLeftMb, availTopMb)

    } else { // ------------------------------------------------ I_16x16
      val m = mbType - 1
      val predMode = m % 4
      val cbpChroma = (m / 4) % 3
      val cbpLuma = if (m >= 12) 15 else 0
      // this MB's blocks predict future I_4x4 neighbors as DC
      var b0 = 0
      while (b0 < 16) {
        st.i4Modes((mbY * 4 + b0 / 4) * st.mbW * 4 + mbX * 4 + b0 % 4) = -1
        b0 += 1
      }
      val chromaMode = r.ue()
      require(chromaMode <= 3, s"bad intra_chroma_pred_mode $chromaMode")
      qp = ((qp + r.se()) + 52) % 52

      // Intra16x16DCLevel: one 16-coeff CAVLC block, nC from block 0's
      // neighbors (§9.2.1); its TotalCoeff does NOT enter the nnz cache
      val dcNc = st.lumaNc(mbX * 4, mbY * 4)
      val (dcScan, _) = H264Cavlc.decodeResidualBlock(r, 16, dcNc)
      val dc = new Array[Int](16)
      var si = 0
      while (si < 16) { dc(zigzag4x4(si)) = dcScan(si); si += 1 }
      inverseHadamard4x4(dc)
      val ls = levelScale(qp % 6)(0)
      si = 0
      while (si < 16) {
        dc(si) =
          if (qp >= 36) (dc(si) * ls) << (qp / 6 - 6)
          else (dc(si) * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
        si += 1
      }

      // AC blocks (15 coeffs each) when cbpLuma; nnz cache from AC counts
      val coeffs = Array.ofDim[Int](16, 16)
      var blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
        if (cbpLuma != 0) {
          val nC = st.lumaNc(ax4, ay4)
          val (scan, tc) = H264Cavlc.decodeResidualBlock(r, 15, nC)
          st.nnzLuma(ay4 * st.mbW * 4 + ax4) = tc
          var k = 0
          while (k < 15) { coeffs(blk)(zigzag4x4(k + 1)) = scan(k); k += 1 }
        } else st.nnzLuma(ay4 * st.mbW * 4 + ax4) = 0
        // raster DC index for this block
        coeffs(blk)(0) = dc(y4r * 4 + x4r)
        blk += 1
      }

      val pred = predictPlaneBlock(st.luma, st.lumaStride, px, py, 16,
        predMode, availLeftMb, availTopMb)
      blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val res = coeffs(blk)
        dequant4x4(res, qp, skipDc = true)
        inverseTransform4x4(res)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val gx = x4r * 4 + x; val gy = y4r * 4 + y
            st.luma((py + gy) * st.lumaStride + px + gx) =
              clip255(pred(gy * 16 + gx) + ((res(y * 4 + x) + 32) >> 6)).toByte
            x += 1
          }
          y += 1
        }
        blk += 1
      }
      decodeChroma(st, r, mbX, mbY, chromaMode, cbpChroma, qp, availLeftMb, availTopMb)
    }
    qp
  }

  /** CABAC slice data (§7.3.4, entropy_coding_mode 1): alignment one
    * bits, arithmetic-engine init, then per-MB decode with an
    * end_of_slice_flag terminate after every macroblock. Context
    * variables and the neighbor bookkeeping reset per slice (other-
    * slice MBs are unavailable for context derivation, §9.3.1).
    * P slices (r9 inter tier) read a per-MB mb_skip_flag — CABAC has
    * no skip RUNS — then dispatch inter / remapped-intra on the P
    * mb_type binarization; contexts initialize from the
    * cabac_init_idc-selected P column.
    */
  private def decodeSliceDataCabac(st: State, r: H264.BitReader,
      firstMb: Int, sliceQp: Int, isP: Boolean, isB: Boolean,
      directSpatial: Boolean, initIdc: Int): Unit = {
    while (r.remaining % 8 != 0)
      require(r.u(1) == 1, "cabac_alignment_one_bit must be 1")
    val init =
      if (isP || isB) H264Cabac.ctxInitP(initIdc) else H264Cabac.ctxInitI
    val d = new H264Cabac.Decoder(r, new H264Cabac.Contexts(sliceQp, init))
    val cc = new H264Cabac.IntraCtxTrack(st.mbW, st.mbH)
    var qp = sliceQp
    var mbAddr = firstMb
    var end = false
    while (!end) {
      require(mbAddr < st.mbW * st.mbH, "mb address past picture end")
      val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
      if (isP && H264Cabac.decodeMbSkip(d, cc.skipCond(mbX, mbY)) == 1) {
        st.mv.markMb(mbAddr)
        decodePSkip(st, mbAddr)
        cc.markSkip(mbAddr)
      } else if (isP) {
        st.mv.markMb(mbAddr)
        val mbType = H264Cabac.decodeMbTypeP(d)
        qp =
          if (mbType >= 5) decodeMacroblockCabac(st, d, cc, mbAddr, qp,
            preType = mbType - 5)
          else decodeInterMacroblockCabac(st, d, cc, mbAddr, qp, mbType)
      } else if (isB &&
          H264Cabac.decodeMbSkipB(d, cc.skipCond(mbX, mbY)) == 1) {
        st.mv.markMb(mbAddr)
        st.mvL1.markMb(mbAddr)
        decodeBDirectMotion(st, mbAddr, directSpatial)
        cc.markSkip(mbAddr)
      } else if (isB) {
        st.mv.markMb(mbAddr)
        st.mvL1.markMb(mbAddr)
        val mbType = H264Cabac.decodeMbTypeB(d, cc.bTypeCond(mbX, mbY))
        qp =
          if (mbType >= 23) decodeMacroblockCabac(st, d, cc, mbAddr, qp,
            preType = mbType - 23)
          else if (mbType == 0) { // B_Direct_16x16: direct motion + residual
            cc.markDirect(mbAddr)
            decodeBDirectMotion(st, mbAddr, directSpatial)
            decodeInterResidualCabac(st, d, cc, mbAddr, qp)
          }
          else if (mbType == 22) { cc.markInter(mbAddr)
            decodeB8x8MacroblockCabac(st, d, cc, mbAddr, qp, directSpatial) }
          else { cc.markInter(mbAddr)
            decodeBMacroblockCabac(st, d, cc, mbAddr, qp, mbType) }
      } else qp = decodeMacroblockCabac(st, d, cc, mbAddr, qp)
      // truncated streams must REJECT, not fabricate: if readBit ran
      // past the end, this MB was (partly) decoded from synthetic zero
      // bits. Checked BEFORE committing the MB; the final terminate's
      // own flush reads are after the last committed MB and so exempt.
      require(!d.exhausted, "CABAC bitstream exhausted mid-slice")
      st.mbDecoded(mbAddr) = true
        st.mbSlice(mbAddr) = st.curSlice
      st.mbQp(mbAddr) = qp // deblocking input (skip MBs: running QPy)
      mbAddr += 1
      end = d.terminate() == 1
    }
    if (st.deblock && mbAddr >= st.mbW * st.mbH) applyDeblock(st)
  }

  /** One CABAC I-slice macroblock: the [[decodeMacroblock]] structure
    * with every syntax element read through the arithmetic engine
    * (§9.3.2/§9.3.3 binarizations via [[H264Cabac]]) and
    * coded_block_flag bookkeeping in `cc`. Reconstruction (prediction,
    * dequant, transforms) is shared with the CAVLC path.
    */
  private def decodeMacroblockCabac(st: State, d: H264Cabac.Decoder,
      cc: H264Cabac.IntraCtxTrack, mbAddr: Int, qpIn: Int,
      preType: Int = -1): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    var qp = qpIn
    // intra MB: decoded-but-no-list-motion (see decodeMacroblock)
    st.mv.markDone(mbX * 4, mbY * 4, 4, 4)
    st.mvL1.markDone(mbX * 4, mbY * 4, 4, 4)
    st.mbIntra(mbAddr) = true // deblocking bS 4/3 input (§8.7.2.1)
    val availLeftMb = st.mbAvailable(mbX - 1, mbY)
    val availTopMb = st.mbAvailable(mbX, mbY - 1)

    // preType >= 0: an intra MB inside a P slice — its mb_type arrived
    // through the P binarization's intra suffix (already read)
    val mbType =
      if (preType >= 0) preType
      else H264Cabac.decodeMbTypeI(d, cc.mbTypeCond(mbX, mbY))
    require(mbType != 25, "I_PCM under CABAC out of scope")

    def chromaCabac(chromaMode: Int, cbpChroma: Int, qpNow: Int): Unit =
      decodeChromaWith(st, mbX, mbY, chromaMode, cbpChroma, qpNow,
        availLeftMb, availTopMb,
        c => {
          val (scan, tc) = H264Cabac.decodeResidual(d, 3, 4,
            cc.chromaDcInc(c, mbX, mbY))
          (if (c == 0) cc.cbfCbDc else cc.cbfCrDc)(mbAddr) = tc > 0
          scan
        },
        (c, x2, y2) => {
          val (scan, tc) = H264Cabac.decodeResidual(d, 4, 15,
            cc.chromaAcInc(c, x2, y2))
          (if (c == 0) cc.cbfCbAc else cc.cbfCrAc)(y2 * st.mbW * 2 + x2) = tc > 0
          (scan, tc)
        })

    if (mbType == 0) { // ---------------------------------------- I_4x4
      cc.markI4(mbAddr)
      val modes = new Array[Int](16)
      var b = 0
      while (b < 16) {
        val (x4r, y4r) = blockScan(b)
        val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
        val leftAvail = if (x4r > 0) true else availLeftMb
        val topAvail = if (y4r > 0) true else availTopMb
        val mA =
          if (!leftAvail) -1
          else { val m = st.i4Modes(ay4 * st.mbW * 4 + ax4 - 1); if (m < 0) 2 else m }
        val mB =
          if (!topAvail) -1
          else if (st.i4Modes((ay4 - 1) * st.mbW * 4 + ax4) < 0) 2
          else st.i4Modes((ay4 - 1) * st.mbW * 4 + ax4)
        val pred = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
        val mode = H264Cabac.decodeIntra4x4Mode(d, pred)
        modes(b) = mode
        st.i4Modes(ay4 * st.mbW * 4 + ax4) = mode
        b += 1
      }
      val chromaMode = H264Cabac.decodeChromaPredMode(d,
        cc.chromaModeCondA(mbX, mbY), cc.chromaModeCondB(mbX, mbY))
      cc.chromaNZ(mbAddr) = chromaMode != 0
      val cbp = H264Cabac.decodeCbp(d, cc.cbpOf(mbX - 1, mbY),
        cc.cbpOf(mbX, mbY - 1))
      cc.cbp(mbAddr) = cbp
      val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
      if (cbpLuma > 0 || cbpChroma > 0) {
        val delta = H264Cabac.decodeQpDelta(d, cc.prevQpDeltaNZ)
        qp = ((qp + delta) + 52) % 52
        cc.prevQpDeltaNZ = delta != 0
      } else cc.prevQpDeltaNZ = false

      val coeffs = Array.ofDim[Int](16, 16)
      var blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
        if ((cbpLuma & (1 << (blk / 4))) != 0) {
          val (scan, tc) = H264Cabac.decodeResidual(d, 2, 16,
            cc.lumaAcInc(ax4, ay4))
          cc.cbfLAc(ay4 * st.mbW * 4 + ax4) = tc > 0
          st.nnzLuma(ay4 * st.mbW * 4 + ax4) = tc
          var si = 0
          while (si < 16) { coeffs(blk)(zigzag4x4(si)) = scan(si); si += 1 }
        } else st.nnzLuma(ay4 * st.mbW * 4 + ax4) = 0
        blk += 1
      }
      blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val bpx = px + x4r * 4; val bpy = py + y4r * 4
        val leftAvail = if (x4r > 0) true else availLeftMb
        val topAvail = if (y4r > 0) true else availTopMb
        val trAvail =
          if (y4r == 0) (if (x4r < 3) availTopMb else st.mbAvailable(mbX + 1, mbY - 1))
          else if (x4r == 3) false
          else blockScan.indexOf((x4r + 1, y4r - 1)) < blk
        val pred = predict4x4(st, modes(blk), bpx, bpy, leftAvail, topAvail, trAvail)
        val res = coeffs(blk)
        if ((cbpLuma & (1 << (blk / 4))) != 0) {
          dequant4x4(res, qp, skipDc = false)
          inverseTransform4x4(res)
        }
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val rv = if ((cbpLuma & (1 << (blk / 4))) != 0) (res(y * 4 + x) + 32) >> 6 else 0
            st.luma((bpy + y) * st.lumaStride + bpx + x) =
              clip255(pred(y * 4 + x) + rv).toByte
            x += 1
          }
          y += 1
        }
        blk += 1
      }
      chromaCabac(chromaMode, cbpChroma, qp)

    } else { // ------------------------------------------------ I_16x16
      cc.markI16(mbAddr)
      val m = mbType - 1
      val predMode = m % 4
      val cbpChroma = (m / 4) % 3
      val cbpLuma = if (m >= 12) 15 else 0
      cc.cbp(mbAddr) = (cbpChroma << 4) | cbpLuma
      var b0 = 0
      while (b0 < 16) {
        st.i4Modes((mbY * 4 + b0 / 4) * st.mbW * 4 + mbX * 4 + b0 % 4) = -1
        b0 += 1
      }
      val chromaMode = H264Cabac.decodeChromaPredMode(d,
        cc.chromaModeCondA(mbX, mbY), cc.chromaModeCondB(mbX, mbY))
      cc.chromaNZ(mbAddr) = chromaMode != 0
      val delta = H264Cabac.decodeQpDelta(d, cc.prevQpDeltaNZ)
      qp = ((qp + delta) + 52) % 52
      cc.prevQpDeltaNZ = delta != 0

      val (dcScan, tcDc) = H264Cabac.decodeResidual(d, 0, 16,
        cc.lumaDcInc(mbX, mbY))
      cc.cbfLDc(mbAddr) = tcDc > 0
      val dc = new Array[Int](16)
      var si = 0
      while (si < 16) { dc(zigzag4x4(si)) = dcScan(si); si += 1 }
      inverseHadamard4x4(dc)
      val ls = levelScale(qp % 6)(0)
      si = 0
      while (si < 16) {
        dc(si) =
          if (qp >= 36) (dc(si) * ls) << (qp / 6 - 6)
          else (dc(si) * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
        si += 1
      }

      val coeffs = Array.ofDim[Int](16, 16)
      var blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
        if (cbpLuma != 0) {
          val (scan, tc) = H264Cabac.decodeResidual(d, 1, 15,
            cc.lumaAcInc(ax4, ay4))
          cc.cbfLAc(ay4 * st.mbW * 4 + ax4) = tc > 0
          st.nnzLuma(ay4 * st.mbW * 4 + ax4) = tc
          var k = 0
          while (k < 15) { coeffs(blk)(zigzag4x4(k + 1)) = scan(k); k += 1 }
        } else st.nnzLuma(ay4 * st.mbW * 4 + ax4) = 0
        coeffs(blk)(0) = dc(y4r * 4 + x4r)
        blk += 1
      }

      val pred = predictPlaneBlock(st.luma, st.lumaStride, px, py, 16,
        predMode, availLeftMb, availTopMb)
      blk = 0
      while (blk < 16) {
        val (x4r, y4r) = blockScan(blk)
        val res = coeffs(blk)
        dequant4x4(res, qp, skipDc = true)
        inverseTransform4x4(res)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val gx = x4r * 4 + x; val gy = y4r * 4 + y
            st.luma((py + gy) * st.lumaStride + px + gx) =
              clip255(pred(gy * 16 + gx) + ((res(y * 4 + x) + 32) >> 6)).toByte
            x += 1
          }
          y += 1
        }
        blk += 1
      }
      chromaCabac(chromaMode, cbpChroma, qp)
    }
    qp
  }

  /** Chroma residual + reconstruction for one MB (§7.3.5.3.1 residual
    * order: Cb DC, Cr DC, Cb AC×4, Cr AC×4 — DC blocks for both
    * components precede the AC blocks). CAVLC entropy; the parse/recon
    * split lives in [[decodeChromaWith]] so the CABAC tier reuses the
    * identical reconstruction.
    */
  private def decodeChroma(st: State, r: H264.BitReader, mbX: Int, mbY: Int,
      chromaMode: Int, cbpChroma: Int, qpLuma: Int,
      availLeft: Boolean, availTop: Boolean): Unit =
    decodeChromaWith(st, mbX, mbY, chromaMode, cbpChroma, qpLuma,
      availLeft, availTop,
      _ => H264Cavlc.decodeResidualBlock(r, 4, -1)._1,
      (c, x2, y2) => {
        val nnzs = if (c == 0) st.nnzCb else st.nnzCr
        H264Cavlc.decodeResidualBlock(r, 15, st.chromaNc(nnzs, x2, y2))
      })

  /** Entropy-agnostic chroma decode: `dcBlock(c)` parses the 4-coeff
    * chroma DC block of component c (0 = Cb, 1 = Cr), `acBlock(c, x2,
    * y2)` the 15-coeff AC block — both in scan order, the CAVLC/CABAC
    * residual contract.
    */
  private def decodeChromaWith(st: State, mbX: Int, mbY: Int,
      chromaMode: Int, cbpChroma: Int, qpLuma: Int,
      availLeft: Boolean, availTop: Boolean,
      dcBlock: Int => Array[Int],
      acBlock: (Int, Int, Int) => (Array[Int], Int)): Unit = {
    val qpc = chromaQp(qpLuma + st.pps.chromaQpOffset)
    val cpx = mbX * 8; val cpy = mbY * 8
    val planes = Array(st.cb, st.cr)
    val nnzs = Array(st.nnzCb, st.nnzCr)
    val dc = Array.ofDim[Int](2, 4)
    if (cbpChroma != 0) {
      var c = 0
      while (c < 2) {
        val scan = dcBlock(c)
        // 2x2 inverse Hadamard + §8.5.11 scaling
        val f0 = scan(0) + scan(1); val f1 = scan(0) - scan(1)
        val f2 = scan(2) + scan(3); val f3 = scan(2) - scan(3)
        val g = Array(f0 + f2, f1 + f3, f0 - f2, f1 - f3)
        val ls = levelScale(qpc % 6)(0)
        var k = 0
        while (k < 4) { dc(c)(k) = ((g(k) * ls) << (qpc / 6)) >> 5; k += 1 }
        c += 1
      }
    }
    val coeffs = Array.ofDim[Int](2, 4, 16)
    var c = 0
    while (c < 2) {
      var b = 0
      while (b < 4) {
        val x2 = mbX * 2 + b % 2; val y2 = mbY * 2 + b / 2
        if (cbpChroma == 2) {
          val (scan, tc) = acBlock(c, x2, y2)
          nnzs(c)(y2 * st.mbW * 2 + x2) = tc
          var k = 0
          while (k < 15) { coeffs(c)(b)(zigzag4x4(k + 1)) = scan(k); k += 1 }
        } else nnzs(c)(y2 * st.mbW * 2 + x2) = 0
        coeffs(c)(b)(0) = dc(c)(b)
        b += 1
      }
      c += 1
    }
    c = 0
    while (c < 2) {
      val plane = planes(c)
      val pred =
        if (chromaMode == 0) predictChromaDc(plane, st.chromaStride, cpx, cpy, availLeft, availTop)
        else predictPlaneBlock(plane, st.chromaStride, cpx, cpy, 8,
          // chroma modes: 0=DC, 1=H, 2=V, 3=Plane → shared helper's 1/0/3
          chromaMode match { case 1 => 1; case 2 => 0; case 3 => 3 },
          availLeft, availTop)
      var b = 0
      while (b < 4) {
        val res = coeffs(c)(b)
        val doRes = cbpChroma != 0
        if (doRes) { dequant4x4(res, qpc, skipDc = true); inverseTransform4x4(res) }
        val bx = (b % 2) * 4; val by = (b / 2) * 4
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val rv = if (doRes) (res(y * 4 + x) + 32) >> 6 else 0
            plane((cpy + by + y) * st.chromaStride + cpx + bx + x) =
              clip255(pred((by + y) * 8 + bx + x) + rv).toByte
            x += 1
          }
          y += 1
        }
        b += 1
      }
      c += 1
    }
  }

  // ------------------------------------------------ inter (P slices)

  /** P_Skip reconstruction (§8.4.1.1): predicted motion, zero residual. */
  private def decodePSkip(st: State, mbAddr: Int): Unit = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val (mx, my) = st.mv.skipMv(mbX * 4, mbY * 4)
    st.mv.set(mbX * 4, mbY * 4, 4, 4, mx, my, 0)
    motionCompensate(st, mbX * 16, mbY * 16, 16, 16, mx, my)
  }

  /** MC one luma block (+ the matching chroma blocks) from L0[refIdx]
    * into the current planes; (px, py)/(bw, bh) in LUMA samples.
    * P-slice face: applies the explicit L0 weights for that reference
    * when the slice carried a pred_weight_table (§8.4.2.3.3 — P_Skip
    * included, same process).
    */
  private def motionCompensate(st: State, px: Int, py: Int,
      bw: Int, bh: Int, mx: Int, my: Int, refIdx: Int = 0): Unit = {
    motionCompensateFrom(st, st.ref0(refIdx), px, py, bw, bh, mx, my)
    if (st.wpExplicit) applyExplicitWeight(st, 0, refIdx, px, py, bw, bh)
  }

  /** §8.4.2.3.3 explicit single-list weighting, applied IN PLACE over a
    * just-motion-compensated region (luma + both chroma): logWD ≥ 1 →
    * Clip1(((p·w + 2^(logWD−1)) >> logWD) + o); logWD 0 → Clip1(p·w+o).
    * Weights are the (list, refIdx) entry of the slice's table (r11).
    */
  private def applyExplicitWeight(st: State, list: Int, refIdx: Int,
      px: Int, py: Int, bw: Int, bh: Int): Unit = {
    val lwd = st.wpLumaLog2
    val w = st.wpLw(list)(refIdx); val o = st.wpLo(list)(refIdx)
    var y = 0
    while (y < bh) {
      var x = 0
      while (x < bw) {
        val idx = (py + y) * st.lumaStride + px + x
        val p = st.luma(idx) & 0xff
        val v =
          if (lwd >= 1) ((p * w + (1 << (lwd - 1))) >> lwd) + o
          else p * w + o
        st.luma(idx) = clip255(v).toByte
        x += 1
      }
      y += 1
    }
    val cwd = st.wpChromaLog2
    val planes = Array(st.cb, st.cr)
    var c = 0
    while (c < 2) {
      val cw = st.wpCw(list)(refIdx)(c); val co = st.wpCo(list)(refIdx)(c)
      val plane = planes(c)
      var cy = 0
      while (cy < bh / 2) {
        var cx = 0
        while (cx < bw / 2) {
          val idx = (py / 2 + cy) * st.chromaStride + px / 2 + cx
          val p = plane(idx) & 0xff
          val v =
            if (cwd >= 1) ((p * cw + (1 << (cwd - 1))) >> cwd) + co
            else p * cw + co
          plane(idx) = clip255(v).toByte
          cx += 1
        }
        cy += 1
      }
      c += 1
    }
  }

  /** [[motionCompensate]] from an explicit reference picture — the B
    * tier predicts from either list's picture.
    */
  private def motionCompensateFrom(st: State, f: Frame, px: Int, py: Int,
      bw: Int, bh: Int, mx: Int, my: Int): Unit = {
    H264Inter.mcLuma(f.luma, f.lumaStride, f.mbH * 16,
      st.luma, st.lumaStride, px, py, bw, bh, mx, my)
    H264Inter.mcChroma(f.cb, f.mbW * 8, f.mbH * 8,
      st.cb, st.chromaStride, px / 2, py / 2, bw / 2, bh / 2, mx, my)
    H264Inter.mcChroma(f.cr, f.mbW * 8, f.mbH * 8,
      st.cr, st.chromaStride, px / 2, py / 2, bw / 2, bh / 2, mx, my)
  }

  /** Decode one P-slice inter macroblock (P_L0_16x16 / P_L0_L0_16x8 /
    * P_L0_L0_8x16; P_8x8 / P_8x8ref0 dispatch to
    * [[decodeP8x8Macroblock]] since r12); returns the updated QPy. r11 multi-ref: §7.3.5.1
    * mb_pred reads ALL partitions' ref_idx_l0 (te(v), absent with one
    * active reference) BEFORE the mvd_l0 loop; each partition's mvp
    * ref-matches against its own refIdx.
    */
  private def decodeInterMacroblock(st: State, r: H264.BitReader,
      mbAddr: Int, qpIn: Int, mbType: Int): Int = {
    if (mbType == 3 || mbType == 4) // P_8x8 / P_8x8ref0 (r12)
      return decodeP8x8Macroblock(st, r, mbAddr, qpIn,
        ref0Inferred = mbType == 4)
    require(mbType <= 2, s"bad P mb_type $mbType")
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    val qp = qpIn
    // partitions as (offX4, offY4, w4, h4, mvp kind)
    val parts: Seq[(Int, Int, Int, Int, Int)] = mbType match {
      case 0 => Seq((0, 0, 4, 4, 0))
      case 1 => Seq((0, 0, 4, 2, 1), (0, 2, 4, 2, 2))
      case _ => Seq((0, 0, 2, 4, 3), (2, 0, 2, 4, 4))
    }
    val refs = parts.map { _ =>
      val ri = r.te(st.numRef0 - 1)
      require(ri < st.numRef0, s"ref_idx_l0 $ri out of range"); ri
    }
    // mvd_l0 in partition order; each partition's mvp sees the previous
    // partitions' assigned vectors (§8.4.1.3 decode-order context)
    parts.zip(refs).foreach { case ((ox, oy, pw, ph, kind), ri) =>
      val mvdX = r.se(); val mvdY = r.se()
      val (px0, py0) = st.mv.mvPred(bx4 + ox, by4 + oy, pw, ph, kind, ri)
      val mx = px0 + mvdX; val my = py0 + mvdY
      st.mv.set(bx4 + ox, by4 + oy, pw, ph, mx, my, ri)
      motionCompensate(st, px + ox * 4, py + oy * 4, pw * 4, ph * 4,
        mx, my, ri)
    }
    decodeInterResidualCavlc(st, r, mbX, mbY, qp)
  }

  /** CAVLC inter-MB residual tail (cbp → mb_qp_delta → luma 4x4 adds →
    * chroma), shared by the P and B macroblock paths; returns the
    * updated QPy.
    */
  private def decodeInterResidualCavlc(st: State, r: H264.BitReader,
      mbX: Int, mbY: Int, qpIn: Int): Int = {
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    var qp = qpIn
    val cbp = {
      val cn = r.ue()
      require(cn < 48, s"bad inter cbp codeNum $cn")
      H264Inter.cbpInterByCodeNum(cn)
    }
    val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
    if (cbpLuma > 0 || cbpChroma > 0) qp = ((qp + r.se()) + 52) % 52
    // luma residual: plain 4x4 transforms ADDED to the MC prediction
    // already in the plane (no intra pass, no 16x16 DC Hadamard)
    var blk = 0
    while (blk < 16) {
      val (x4r, y4r) = blockScan(blk)
      val ax4 = bx4 + x4r; val ay4 = by4 + y4r
      if ((cbpLuma & (1 << (blk / 4))) != 0) {
        val nC = st.lumaNc(ax4, ay4)
        val (scan, tc) = H264Cavlc.decodeResidualBlock(r, 16, nC)
        st.nnzLuma(ay4 * st.mbW * 4 + ax4) = tc
        addLumaResidual4x4(st, scan, qp, px + x4r * 4, py + y4r * 4)
      } else st.nnzLuma(ay4 * st.mbW * 4 + ax4) = 0
      blk += 1
    }
    decodeChromaInter(st, r, mbX, mbY, cbpChroma, qp)
    qp
  }

  /** B-slice partition layout from Table 7-14 (r9 B tier): mb_type
    * 1..3 are the single-partition 16x16 types (Pred_L0 / Pred_L1 /
    * BiPred); 4..21 are the two-partition 16x8 / 8x16 types whose
    * per-partition directions cycle (L0,L0) (L1,L1) (L0,L1) (L1,L0)
    * (L0,Bi) (L1,Bi) (Bi,L0) (Bi,L1) (Bi,Bi); 0 (B_Direct_16x16) and
    * 22 (B_8x8) dispatch to their own decoders before reaching here.
    * Returns (offX4, offY4, w4, h4, mvp kind, dir) with dir 0 = L0,
    * 1 = L1, 2 = Bi.
    */
  private def bPartitions(mbType: Int): Seq[(Int, Int, Int, Int, Int, Int)] = {
    require(mbType >= 1 && mbType <= 21,
      s"B mb_type $mbType dispatched to the wrong decoder")
    if (mbType <= 3) return Seq((0, 0, 4, 4, 0, mbType - 1))
    val dirPairs = Seq((0, 0), (1, 1), (0, 1), (1, 0), (0, 2), (1, 2),
      (2, 0), (2, 1), (2, 2))
    val (d0, d1) = dirPairs((mbType - 4) / 2)
    if ((mbType - 4) % 2 == 0) // 16x8
      Seq((0, 0, 4, 2, 1, d0), (0, 2, 4, 2, 2, d1))
    else // 8x16
      Seq((0, 0, 2, 4, 3, d0), (2, 0, 2, 4, 4, d1))
  }

  /** Table 7-18 B sub_mb_type properties: (numSubMbPart, dir, sw4, sh4)
    * with dir −1 = Direct, 0 = Pred_L0, 1 = Pred_L1, 2 = BiPred;
    * sub-partition width/height in 4x4-block units.
    */
  private[multimodal] def bSubMbInfo(t: Int): (Int, Int, Int, Int) = t match {
    case 0  => (4, -1, 1, 1) // B_Direct_8x8 (region direct, 4x4 colZero)
    case 1  => (1, 0, 2, 2)  // B_L0_8x8
    case 2  => (1, 1, 2, 2)  // B_L1_8x8
    case 3  => (1, 2, 2, 2)  // B_Bi_8x8
    case 4  => (2, 0, 2, 1)  // B_L0_8x4
    case 5  => (2, 0, 1, 2)  // B_L0_4x8
    case 6  => (2, 1, 2, 1)  // B_L1_8x4
    case 7  => (2, 1, 1, 2)  // B_L1_4x8
    case 8  => (2, 2, 2, 1)  // B_Bi_8x4
    case 9  => (2, 2, 1, 2)  // B_Bi_4x8
    case 10 => (4, 0, 1, 1)  // B_L0_4x4
    case 11 => (4, 1, 1, 1)  // B_L1_4x4
    case 12 => (4, 2, 1, 1)  // B_Bi_4x4
    case _ => throw new IllegalArgumentException(s"bad B sub_mb_type $t")
  }

  /** Sub-partition origins within an 8x8 (4x4-block units, §6.4.2.2
    * decode order): 8x4 top→bottom, 4x8 left→right, 4x4 raster.
    */
  private[multimodal] def bSubPartOffsets(n: Int, sw4: Int, sh4: Int): Seq[(Int, Int)] =
    (n, sw4, sh4) match {
      case (1, _, _) => Seq((0, 0))
      case (2, 2, 1) => Seq((0, 0), (0, 1))
      case (2, 1, 2) => Seq((0, 0), (1, 0))
      case _         => Seq((0, 0), (1, 0), (0, 1), (1, 1))
    }

  /** Table 7-17 P sub_mb_type properties: (numSubMbPart, sw4, sh4) —
    * all sub-partitions predict from L0.
    */
  private[multimodal] def pSubMbInfo(t: Int): (Int, Int, Int) = t match {
    case 0 => (1, 2, 2) // P_L0_8x8
    case 1 => (2, 2, 1) // P_L0_8x4
    case 2 => (2, 1, 2) // P_L0_4x8
    case 3 => (4, 1, 1) // P_L0_4x4
    case _ => throw new IllegalArgumentException(s"bad P sub_mb_type $t")
  }

  /** Decode one P_8x8 / P_8x8ref0 macroblock (CAVLC; mb_type 3 / 4,
    * r12): four sub_mb_type elements (Table 7-17), then every 8x8's
    * ref_idx_l0 (te(v) — absent for P_8x8ref0 or one active
    * reference), then mvd_l0 per sub-partition in sub-block order
    * (§7.3.5.2). Sub-partition MVs use the PLAIN §8.4.1.3 median, the
    * B_8x8 precedent: the 16x8/8x16 directional shortcuts apply only
    * to macroblock partitions, and MvGrid's per-block decodedness
    * gives a later-block C the §6.4.11.7 D substitution. Residual
    * tail shared with the P/B macroblock paths.
    */
  private def decodeP8x8Macroblock(st: State, r: H264.BitReader,
      mbAddr: Int, qpIn: Int, ref0Inferred: Boolean): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    val subTypes = Array.fill(4) {
      val t = r.ue(); require(t <= 3, s"bad P sub_mb_type $t"); t
    }
    val refs = Array.tabulate(4) { _ =>
      if (!ref0Inferred && st.numRef0 > 1) {
        val ri = r.te(st.numRef0 - 1)
        require(ri < st.numRef0, s"ref_idx_l0 $ri out of range"); ri
      } else 0
    }
    var i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, sw, sh) = pSubMbInfo(subTypes(i))
      bSubPartOffsets(n, sw, sh).foreach { case (sx, sy) =>
        val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
        val mvdX = r.se(); val mvdY = r.se()
        val (p0x, p0y) = st.mv.mvPred(x4, y4, sw, sh, 0, refs(i))
        val mx = p0x + mvdX; val my = p0y + mvdY
        st.mv.set(x4, y4, sw, sh, mx, my, refs(i))
        motionCompensate(st, px + (ox + sx) * 4, py + (oy + sy) * 4,
          sw * 4, sh * 4, mx, my, refs(i))
      }
      i += 1
    }
    decodeInterResidualCavlc(st, r, mbX, mbY, qpIn)
  }

  /** CABAC twin of [[decodeP8x8Macroblock]] (mb_type 3; P_8x8ref0 has
    * no CABAC binarization): sub_mb_type through the ctx-21..23 tree,
    * ref_idx/mvds through the shared contexts at sub-partition
    * granularity.
    */
  private def decodeP8x8MacroblockCabac(st: State, d: H264Cabac.Decoder,
      cc: H264Cabac.IntraCtxTrack, mbAddr: Int, qpIn: Int): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    val subTypes = Array.fill(4)(H264Cabac.decodePSubMbType(d))
    val refs = Array.tabulate(4) { k =>
      if (st.numRef0 > 1) {
        val x4 = bx4 + (k % 2) * 2; val y4 = by4 + (k / 2) * 2
        val ri = H264Cabac.decodeRefIdx(d, cc.refIdxInc(0, x4, y4))
        require(ri < st.numRef0, s"ref_idx_l0 $ri out of range")
        cc.setRefCtx(0, x4, y4, 2, 2, ri)
        ri
      } else 0
    }
    var i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, sw, sh) = pSubMbInfo(subTypes(i))
      bSubPartOffsets(n, sw, sh).foreach { case (sx, sy) =>
        val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
        val mvdX = H264Cabac.decodeMvd(d, 0, cc.mvdInc(0, 0, x4, y4))
        val mvdY = H264Cabac.decodeMvd(d, 1, cc.mvdInc(0, 1, x4, y4))
        cc.setMvd(0, x4, y4, sw, sh, mvdX, mvdY)
        val (p0x, p0y) = st.mv.mvPred(x4, y4, sw, sh, 0, refs(i))
        val mx = p0x + mvdX; val my = p0y + mvdY
        st.mv.set(x4, y4, sw, sh, mx, my, refs(i))
        motionCompensate(st, px + (ox + sx) * 4, py + (oy + sy) * 4,
          sw * 4, sh * 4, mx, my, refs(i))
      }
      i += 1
    }
    decodeInterResidualCabac(st, d, cc, mbAddr, qpIn)
  }

  /** Decode one B_8x8 macroblock (CAVLC; mb_type 22): four sub_mb_type
    * elements (Table 7-18), then list-major mvds — mvd_l0 for every
    * L0/Bi sub-partition of every sub-block in order, then mvd_l1
    * (§7.3.5.2). Sub-partition MVs use the PLAIN §8.4.1.3 median (the
    * 16x8/8x16 directional shortcuts apply only to macroblock
    * partitions); B_Direct_8x8 sub-blocks run the shared
    * [[decodeBDirectMotion]] over their 2x2-block region. Per-block
    * decodedness (MvGrid r10) makes a sub-partition whose above-right
    * C lands on a not-yet-decoded later block of the SAME MB fall back
    * to D, as §6.4.11.7 requires. Residual tail shared with P.
    */
  private def decodeB8x8Macroblock(st: State, r: H264.BitReader,
      mbAddr: Int, qpIn: Int, directSpatial: Boolean): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    val subTypes = Array.fill(4) {
      val t = r.ue(); require(t <= 12, s"bad B sub_mb_type $t"); t
    }
    val mv0 = Array.fill(4)(new Array[(Int, Int)](4))
    val mv1 = Array.fill(4)(new Array[(Int, Int)](4))
    // §7.3.5.2 ref_idx loops (r11 multi-ref): every non-direct 8x8's
    // ref_idx_l0 (te(v), absent with one active ref), then ref_idx_l1
    val ref0s = subTypes.map { t =>
      val (_, dir, _, _) = bSubMbInfo(t)
      if (dir == 0 || dir == 2) {
        val ri = r.te(st.numRef0 - 1)
        require(ri < st.numRef0, s"ref_idx_l0 $ri out of range"); ri
      } else 0
    }
    val ref1s = subTypes.map { t =>
      val (_, dir, _, _) = bSubMbInfo(t)
      if (dir == 1 || dir == 2) {
        val ri = r.te(st.numRef1 - 1)
        require(ri < st.numRef1, s"ref_idx_l1 $ri out of range"); ri
      } else 0
    }
    // L0 pass (direct sub-blocks derive + compensate inline, in order,
    // so later sub-partitions' medians see their final motion)
    var i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, dir, sw, sh) = bSubMbInfo(subTypes(i))
      if (dir == -1)
        decodeBDirectMotion(st, mbAddr, directSpatial, ox, oy, 2, 2)
      else if (dir != 1) {
        bSubPartOffsets(n, sw, sh).zipWithIndex.foreach { case ((sx, sy), j) =>
          val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
          val mvdX = r.se(); val mvdY = r.se()
          val (p0x, p0y) = st.mv.mvPred(x4, y4, sw, sh, 0, ref0s(i))
          mv0(i)(j) = (p0x + mvdX, p0y + mvdY)
          st.mv.set(x4, y4, sw, sh, mv0(i)(j)._1, mv0(i)(j)._2, ref0s(i))
        }
      } else st.mv.markDone(bx4 + ox, by4 + oy, 2, 2)
      i += 1
    }
    // L1 pass
    i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, dir, sw, sh) = bSubMbInfo(subTypes(i))
      if (dir == 1 || dir == 2) {
        bSubPartOffsets(n, sw, sh).zipWithIndex.foreach { case ((sx, sy), j) =>
          val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
          val mvdX = r.se(); val mvdY = r.se()
          val (p1x, p1y) = st.mvL1.mvPred(x4, y4, sw, sh, 0, ref1s(i))
          mv1(i)(j) = (p1x + mvdX, p1y + mvdY)
          st.mvL1.set(x4, y4, sw, sh, mv1(i)(j)._1, mv1(i)(j)._2, ref1s(i))
        }
      } else if (dir == 0) st.mvL1.markDone(bx4 + ox, by4 + oy, 2, 2)
      i += 1
    }
    // MC pass (direct regions already compensated)
    i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, dir, sw, sh) = bSubMbInfo(subTypes(i))
      if (dir >= 0) bSubPartOffsets(n, sw, sh).zipWithIndex.foreach {
        case ((sx, sy), j) =>
          compensateB(st, px + (ox + sx) * 4, py + (oy + sy) * 4,
            sw * 4, sh * 4, dir, mv0(i)(j), mv1(i)(j), ref0s(i), ref1s(i))
      }
      i += 1
    }
    decodeInterResidualCavlc(st, r, mbX, mbY, qpIn)
  }

  /** CABAC twin of [[decodeB8x8Macroblock]]: sub_mb_type through the
    * ctx-36..39 tree ([[H264Cabac.decodeBSubMbType]]), mvds through the
    * shared UEG3 contexts with list-keyed increments at sub-partition
    * granularity, residual tail shared with P. Caller has read mb_type
    * (22) and marked the MB in `cc`.
    */
  private def decodeB8x8MacroblockCabac(st: State, d: H264Cabac.Decoder,
      cc: H264Cabac.IntraCtxTrack, mbAddr: Int, qpIn: Int,
      directSpatial: Boolean): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    val subTypes = Array.fill(4)(H264Cabac.decodeBSubMbType(d))
    val mv0 = Array.fill(4)(new Array[(Int, Int)](4))
    val mv1 = Array.fill(4)(new Array[(Int, Int)](4))
    // §7.3.5.2 ref_idx loops (r11 multi-ref): present per non-direct
    // 8x8 using the list, only with >1 active ref; ctx updated as read
    val ref0s = Array.tabulate(4) { k =>
      val (_, dir, _, _) = bSubMbInfo(subTypes(k))
      if ((dir == 0 || dir == 2) && st.numRef0 > 1) {
        val x4 = bx4 + (k % 2) * 2; val y4 = by4 + (k / 2) * 2
        val ri = H264Cabac.decodeRefIdx(d, cc.refIdxInc(0, x4, y4))
        require(ri < st.numRef0, s"ref_idx_l0 $ri out of range")
        cc.setRefCtx(0, x4, y4, 2, 2, ri)
        ri
      } else 0
    }
    val ref1s = Array.tabulate(4) { k =>
      val (_, dir, _, _) = bSubMbInfo(subTypes(k))
      if ((dir == 1 || dir == 2) && st.numRef1 > 1) {
        val x4 = bx4 + (k % 2) * 2; val y4 = by4 + (k / 2) * 2
        val ri = H264Cabac.decodeRefIdx(d, cc.refIdxInc(1, x4, y4))
        require(ri < st.numRef1, s"ref_idx_l1 $ri out of range")
        cc.setRefCtx(1, x4, y4, 2, 2, ri)
        ri
      } else 0
    }
    var i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, dir, sw, sh) = bSubMbInfo(subTypes(i))
      if (dir == -1)
        decodeBDirectMotion(st, mbAddr, directSpatial, ox, oy, 2, 2)
      else if (dir != 1) {
        bSubPartOffsets(n, sw, sh).zipWithIndex.foreach { case ((sx, sy), j) =>
          val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
          val mvdX = H264Cabac.decodeMvd(d, 0, cc.mvdInc(0, 0, x4, y4))
          val mvdY = H264Cabac.decodeMvd(d, 1, cc.mvdInc(0, 1, x4, y4))
          cc.setMvd(0, x4, y4, sw, sh, mvdX, mvdY)
          val (p0x, p0y) = st.mv.mvPred(x4, y4, sw, sh, 0, ref0s(i))
          mv0(i)(j) = (p0x + mvdX, p0y + mvdY)
          st.mv.set(x4, y4, sw, sh, mv0(i)(j)._1, mv0(i)(j)._2, ref0s(i))
        }
      } else st.mv.markDone(bx4 + ox, by4 + oy, 2, 2)
      i += 1
    }
    i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, dir, sw, sh) = bSubMbInfo(subTypes(i))
      if (dir == 1 || dir == 2) {
        bSubPartOffsets(n, sw, sh).zipWithIndex.foreach { case ((sx, sy), j) =>
          val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
          val mvdX = H264Cabac.decodeMvd(d, 0, cc.mvdInc(1, 0, x4, y4))
          val mvdY = H264Cabac.decodeMvd(d, 1, cc.mvdInc(1, 1, x4, y4))
          cc.setMvd(1, x4, y4, sw, sh, mvdX, mvdY)
          val (p1x, p1y) = st.mvL1.mvPred(x4, y4, sw, sh, 0, ref1s(i))
          mv1(i)(j) = (p1x + mvdX, p1y + mvdY)
          st.mvL1.set(x4, y4, sw, sh, mv1(i)(j)._1, mv1(i)(j)._2, ref1s(i))
        }
      } else if (dir == 0) st.mvL1.markDone(bx4 + ox, by4 + oy, 2, 2)
      i += 1
    }
    i = 0
    while (i < 4) {
      val ox = (i % 2) * 2; val oy = (i / 2) * 2
      val (n, dir, sw, sh) = bSubMbInfo(subTypes(i))
      if (dir >= 0) bSubPartOffsets(n, sw, sh).zipWithIndex.foreach {
        case ((sx, sy), j) =>
          compensateB(st, px + (ox + sx) * 4, py + (oy + sy) * 4,
            sw * 4, sh * 4, dir, mv0(i)(j), mv1(i)(j), ref0s(i), ref1s(i))
      }
      i += 1
    }
    decodeInterResidualCabac(st, d, cc, mbAddr, qpIn)
  }

  /** Decode one B-slice inter macroblock (CAVLC): mvd_l0 for every
    * partition predicting from L0 (in partition order), then mvd_l1
    * likewise (§7.3.5.1's list-major element order); per-list §8.4.1.3
    * median prediction against that list's motion grid; BiPred
    * partitions average the two MC blocks (§8.4.2.3.2, no weighted
    * prediction). Residual tail shared with the P path.
    */
  private def decodeBMacroblock(st: State, r: H264.BitReader,
      mbAddr: Int, qpIn: Int, mbType: Int): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    val parts = bPartitions(mbType)
    val mv0 = new Array[(Int, Int)](parts.length)
    val mv1 = new Array[(Int, Int)](parts.length)
    // §7.3.5.1 element order: every partition's ref_idx_l0 (te(v),
    // absent with one active ref), then every ref_idx_l1, then the
    // mvd_l0 loop, then mvd_l1 (r11 multi-ref)
    val ref0s = parts.map { case (_, _, _, _, _, dir) =>
      if (dir != 1) {
        val ri = r.te(st.numRef0 - 1)
        require(ri < st.numRef0, s"ref_idx_l0 $ri out of range"); ri
      } else 0
    }
    val ref1s = parts.map { case (_, _, _, _, _, dir) =>
      if (dir != 0) {
        val ri = r.te(st.numRef1 - 1)
        require(ri < st.numRef1, s"ref_idx_l1 $ri out of range"); ri
      } else 0
    }
    parts.zipWithIndex.foreach { case ((ox, oy, pw, ph, kind, dir), i) =>
      if (dir != 1) {
        val mvdX = r.se(); val mvdY = r.se()
        val (p0x, p0y) = st.mv.mvPred(bx4 + ox, by4 + oy, pw, ph, kind,
          ref0s(i))
        mv0(i) = (p0x + mvdX, p0y + mvdY)
        st.mv.set(bx4 + ox, by4 + oy, pw, ph, mv0(i)._1, mv0(i)._2, ref0s(i))
      } else st.mv.markDone(bx4 + ox, by4 + oy, pw, ph) // L1-only: decoded, no L0 ref
    }
    parts.zipWithIndex.foreach { case ((ox, oy, pw, ph, kind, dir), i) =>
      if (dir != 0) {
        val mvdX = r.se(); val mvdY = r.se()
        val (p1x, p1y) = st.mvL1.mvPred(bx4 + ox, by4 + oy, pw, ph, kind,
          ref1s(i))
        mv1(i) = (p1x + mvdX, p1y + mvdY)
        st.mvL1.set(bx4 + ox, by4 + oy, pw, ph, mv1(i)._1, mv1(i)._2, ref1s(i))
      } else st.mvL1.markDone(bx4 + ox, by4 + oy, pw, ph) // L0-only: decoded, no L1 ref
    }
    parts.zipWithIndex.foreach { case ((ox, oy, pw, ph, _, dir), i) =>
      compensateB(st, px + ox * 4, py + oy * 4, pw * 4, ph * 4,
        dir, mv0(i), mv1(i), ref0s(i), ref1s(i))
    }
    decodeInterResidualCavlc(st, r, mbX, mbY, qpIn)
  }

  /** MC one B partition: single-list prediction straight into the
    * planes; BiPred predicts each list into a scratch block and writes
    * the rounded average (§8.4.2.3.2). r10: explicit (idc 1) weights
    * apply per list to single-list partitions and via the weighted-bi
    * formula to BiPred; implicit (idc 2) POC-derived weights apply to
    * BiPred ONLY — single-list implicit prediction is the unweighted
    * default, per §8.4.2.3.
    */
  private def compensateB(st: State, px: Int, py: Int, bw: Int, bh: Int,
      dir: Int, m0: (Int, Int), m1: (Int, Int),
      r0: Int = 0, r1: Int = 0): Unit = dir match {
    case 0 =>
      motionCompensateFrom(st, st.ref0(r0), px, py, bw, bh, m0._1, m0._2)
      if (st.wpExplicit) applyExplicitWeight(st, 0, r0, px, py, bw, bh)
    case 1 =>
      motionCompensateFrom(st, st.ref1(r1), px, py, bw, bh, m1._1, m1._2)
      if (st.wpExplicit) applyExplicitWeight(st, 1, r1, px, py, bw, bh)
    case _ =>
      // scratch-plane MC at origin: shifting the mv by 4·pos (luma) /
      // 8·pos (chroma) moves the SOURCE block while the destination
      // stays at (0,0) — the sub-pel phase (&3 / &7) is unchanged
      // because the position offsets are whole-pel multiples
      def lumaBlock(f: Frame, mx: Int, my: Int): Array[Byte] = {
        val t = new Array[Byte](bw * bh)
        H264Inter.mcLuma(f.luma, f.lumaStride, f.mbH * 16, t, bw,
          0, 0, bw, bh, mx + 4 * px, my + 4 * py)
        t
      }
      def chromaBlock(src: Array[Byte], f: Frame, mx: Int, my: Int): Array[Byte] = {
        val t = new Array[Byte]((bw / 2) * (bh / 2))
        H264Inter.mcChroma(src, f.mbW * 8, f.mbH * 8, t, bw / 2,
          0, 0, bw / 2, bh / 2, mx + 8 * (px / 2), my + 8 * (py / 2))
        t
      }
      val l0 = lumaBlock(st.ref0(r0), m0._1, m0._2)
      val l1 = lumaBlock(st.ref1(r1), m1._1, m1._2)
      // weighted-bi combine (§8.4.2.3.2): explicit uses the (list, ref)
      // table entries; implicit derives the POC pair weights at logWD 5
      val weighted = st.wpExplicit || st.wpImplicit
      val (wi0, wi1) = if (st.wpImplicit) st.implicitW(r0, r1) else (32, 32)
      val (lw0, lw1, lwd, lo0, lo1) =
        if (st.wpImplicit) (wi0, wi1, 5, 0, 0)
        else (st.wpLw(0)(r0), st.wpLw(1)(r1), st.wpLumaLog2,
          st.wpLo(0)(r0), st.wpLo(1)(r1))
      var y = 0
      while (y < bh) {
        var x = 0
        while (x < bw) {
          val p0 = l0(y * bw + x) & 0xff; val p1 = l1(y * bw + x) & 0xff
          val v =
            if (weighted)
              clip255(((p0 * lw0 + p1 * lw1 + (1 << lwd)) >> (lwd + 1)) +
                ((lo0 + lo1 + 1) >> 1))
            else (p0 + p1 + 1) >> 1
          st.luma((py + y) * st.lumaStride + px + x) = v.toByte
          x += 1
        }
        y += 1
      }
      Seq((st.cb, (f: Frame) => f.cb, 0), (st.cr, (f: Frame) => f.cr, 1)).foreach {
        case (plane, sel, c) =>
          val c0 = chromaBlock(sel(st.ref0(r0)), st.ref0(r0), m0._1, m0._2)
          val c1 = chromaBlock(sel(st.ref1(r1)), st.ref1(r1), m1._1, m1._2)
          val (cw0, cw1, cwd, co0, co1) =
            if (st.wpImplicit) (wi0, wi1, 5, 0, 0)
            else (st.wpCw(0)(r0)(c), st.wpCw(1)(r1)(c), st.wpChromaLog2,
              st.wpCo(0)(r0)(c), st.wpCo(1)(r1)(c))
          val cw = bw / 2; val ch = bh / 2
          val cpx = px / 2; val cpy = py / 2
          var cy = 0
          while (cy < ch) {
            var cx = 0
            while (cx < cw) {
              val p0 = c0(cy * cw + cx) & 0xff; val p1 = c1(cy * cw + cx) & 0xff
              val v =
                if (weighted)
                  clip255(((p0 * cw0 + p1 * cw1 + (1 << cwd)) >> (cwd + 1)) +
                    ((co0 + co1 + 1) >> 1))
                else (p0 + p1 + 1) >> 1
              plane((cpy + cy) * st.chromaStride + cpx + cx) = v.toByte
              cx += 1
            }
            cy += 1
          }
      }
  }

  /** Dequantize + inverse-transform one 4x4 luma residual (scan order)
    * and ADD it to the motion-compensated prediction already in the
    * plane at (bpx, bpy) — the inter reconstruction step shared by the
    * CAVLC and CABAC entropy tiers.
    */
  private def addLumaResidual4x4(st: State, scan: Array[Int], qp: Int,
      bpx: Int, bpy: Int): Unit = {
    val res = new Array[Int](16)
    var si = 0
    while (si < 16) { res(zigzag4x4(si)) = scan(si); si += 1 }
    dequant4x4(res, qp, skipDc = false)
    inverseTransform4x4(res)
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        val idx = (bpy + y) * st.lumaStride + bpx + x
        st.luma(idx) = clip255(
          (st.luma(idx) & 0xff) + ((res(y * 4 + x) + 32) >> 6)).toByte
        x += 1
      }
      y += 1
    }
  }

  /** CABAC twin of [[decodeInterMacroblock]] (P_L0_16x16 / 16x8 / 8x16;
    * P_8x8 rejects the frame, the inter tier's declared scope): mvd
    * through the UEG3 contexts, cbp / mb_qp_delta / residual through
    * the machinery shared with the intra tier, reconstruction shared
    * with the CAVLC path. The MB is marked in `cc` BEFORE its mvds are
    * read so in-MB earlier partitions are context-available
    * (§6.4.11.7 decode-order neighbors).
    */
  private def decodeInterMacroblockCabac(st: State, d: H264Cabac.Decoder,
      cc: H264Cabac.IntraCtxTrack, mbAddr: Int, qpIn: Int,
      mbType: Int): Int = {
    cc.markInter(mbAddr)
    if (mbType == 3) // P_8x8 (r12; P_8x8ref0 has no CABAC binarization)
      return decodeP8x8MacroblockCabac(st, d, cc, mbAddr, qpIn)
    require(mbType <= 2, s"bad P mb_type $mbType")
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    var qp = qpIn
    val parts: Seq[(Int, Int, Int, Int, Int)] = mbType match {
      case 0 => Seq((0, 0, 4, 4, 0))
      case 1 => Seq((0, 0, 4, 2, 1), (0, 2, 4, 2, 2))
      case _ => Seq((0, 0, 2, 4, 3), (2, 0, 2, 4, 4))
    }
    // §7.3.5.1: all partitions' ref_idx_l0 (present only with >1
    // active ref) precede the mvd loop (r11 multi-ref)
    val refs = parts.map { case (ox, oy, pw, ph, _) =>
      if (st.numRef0 > 1) {
        val ri = H264Cabac.decodeRefIdx(d, cc.refIdxInc(0, bx4 + ox, by4 + oy))
        require(ri < st.numRef0, s"ref_idx_l0 $ri out of range")
        cc.setRefCtx(0, bx4 + ox, by4 + oy, pw, ph, ri)
        ri
      } else 0
    }
    parts.zip(refs).foreach { case ((ox, oy, pw, ph, kind), ri) =>
      val mvdX = H264Cabac.decodeMvd(d, 0, cc.mvdInc(0, 0, bx4 + ox, by4 + oy))
      val mvdY = H264Cabac.decodeMvd(d, 1, cc.mvdInc(0, 1, bx4 + ox, by4 + oy))
      cc.setMvd(0, bx4 + ox, by4 + oy, pw, ph, mvdX, mvdY)
      val (px0, py0) = st.mv.mvPred(bx4 + ox, by4 + oy, pw, ph, kind, ri)
      val mx = px0 + mvdX; val my = py0 + mvdY
      st.mv.set(bx4 + ox, by4 + oy, pw, ph, mx, my, ri)
      motionCompensate(st, px + ox * 4, py + oy * 4, pw * 4, ph * 4,
        mx, my, ri)
    }
    decodeInterResidualCabac(st, d, cc, mbAddr, qp)
  }

  /** CABAC inter-MB residual tail (cbp → mb_qp_delta → luma 4x4 adds →
    * chroma), shared by the P and B macroblock paths; returns the
    * updated QPy.
    */
  private def decodeInterResidualCabac(st: State, d: H264Cabac.Decoder,
      cc: H264Cabac.IntraCtxTrack, mbAddr: Int, qpIn: Int): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    var qp = qpIn
    val cbp = H264Cabac.decodeCbp(d, cc.cbpOf(mbX - 1, mbY),
      cc.cbpOf(mbX, mbY - 1))
    cc.cbp(mbAddr) = cbp
    val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
    if (cbpLuma > 0 || cbpChroma > 0) {
      val delta = H264Cabac.decodeQpDelta(d, cc.prevQpDeltaNZ)
      qp = ((qp + delta) + 52) % 52
      cc.prevQpDeltaNZ = delta != 0
    } else cc.prevQpDeltaNZ = false
    var blk = 0
    while (blk < 16) {
      val (x4r, y4r) = blockScan(blk)
      val ax4 = bx4 + x4r; val ay4 = by4 + y4r
      if ((cbpLuma & (1 << (blk / 4))) != 0) {
        val (scan, tc) = H264Cabac.decodeResidual(d, 2, 16,
          cc.lumaAcInc(ax4, ay4))
        cc.cbfLAc(ay4 * st.mbW * 4 + ax4) = tc > 0
        st.nnzLuma(ay4 * st.mbW * 4 + ax4) = tc
        addLumaResidual4x4(st, scan, qp, px + x4r * 4, py + y4r * 4)
      } else st.nnzLuma(ay4 * st.mbW * 4 + ax4) = 0
      blk += 1
    }
    decodeChromaInterCabac(st, d, cc, mbX, mbY, cbpChroma, qp)
    qp
  }

  /** CABAC twin of [[decodeBMacroblock]]: per-list mvds through the
    * shared UEG3 contexts with list-keyed §9.3.3.1.1.7 increments,
    * per-list §8.4.1.3 prediction, BiPred averaging, residual tail
    * shared with the P path. Caller has already read mb_type (and
    * dispatched intra remaps elsewhere) and marked the MB in `cc`.
    */
  private def decodeBMacroblockCabac(st: State, d: H264Cabac.Decoder,
      cc: H264Cabac.IntraCtxTrack, mbAddr: Int, qpIn: Int,
      mbType: Int): Int = {
    val mbX = mbAddr % st.mbW; val mbY = mbAddr / st.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx4 = mbX * 4; val by4 = mbY * 4
    val parts = bPartitions(mbType)
    val mv0 = new Array[(Int, Int)](parts.length)
    val mv1 = new Array[(Int, Int)](parts.length)
    // §7.3.5.1 element order (r11 multi-ref): every partition's
    // ref_idx_l0 (present only with >1 active ref), then ref_idx_l1,
    // then the mvd loops; each ref element updates the ctx tracker as
    // read so later partitions' bin0 increments see it
    val ref0s = parts.map { case (ox, oy, pw, ph, _, dir) =>
      if (dir != 1 && st.numRef0 > 1) {
        val ri = H264Cabac.decodeRefIdx(d, cc.refIdxInc(0, bx4 + ox, by4 + oy))
        require(ri < st.numRef0, s"ref_idx_l0 $ri out of range")
        cc.setRefCtx(0, bx4 + ox, by4 + oy, pw, ph, ri)
        ri
      } else 0
    }
    val ref1s = parts.map { case (ox, oy, pw, ph, _, dir) =>
      if (dir != 0 && st.numRef1 > 1) {
        val ri = H264Cabac.decodeRefIdx(d, cc.refIdxInc(1, bx4 + ox, by4 + oy))
        require(ri < st.numRef1, s"ref_idx_l1 $ri out of range")
        cc.setRefCtx(1, bx4 + ox, by4 + oy, pw, ph, ri)
        ri
      } else 0
    }
    parts.zipWithIndex.foreach { case ((ox, oy, pw, ph, kind, dir), i) =>
      if (dir != 1) {
        val mvdX = H264Cabac.decodeMvd(d, 0, cc.mvdInc(0, 0, bx4 + ox, by4 + oy))
        val mvdY = H264Cabac.decodeMvd(d, 1, cc.mvdInc(0, 1, bx4 + ox, by4 + oy))
        cc.setMvd(0, bx4 + ox, by4 + oy, pw, ph, mvdX, mvdY)
        val (p0x, p0y) = st.mv.mvPred(bx4 + ox, by4 + oy, pw, ph, kind,
          ref0s(i))
        mv0(i) = (p0x + mvdX, p0y + mvdY)
        st.mv.set(bx4 + ox, by4 + oy, pw, ph, mv0(i)._1, mv0(i)._2, ref0s(i))
      } else st.mv.markDone(bx4 + ox, by4 + oy, pw, ph)
    }
    parts.zipWithIndex.foreach { case ((ox, oy, pw, ph, kind, dir), i) =>
      if (dir != 0) {
        val mvdX = H264Cabac.decodeMvd(d, 0, cc.mvdInc(1, 0, bx4 + ox, by4 + oy))
        val mvdY = H264Cabac.decodeMvd(d, 1, cc.mvdInc(1, 1, bx4 + ox, by4 + oy))
        cc.setMvd(1, bx4 + ox, by4 + oy, pw, ph, mvdX, mvdY)
        val (p1x, p1y) = st.mvL1.mvPred(bx4 + ox, by4 + oy, pw, ph, kind,
          ref1s(i))
        mv1(i) = (p1x + mvdX, p1y + mvdY)
        st.mvL1.set(bx4 + ox, by4 + oy, pw, ph, mv1(i)._1, mv1(i)._2, ref1s(i))
      } else st.mvL1.markDone(bx4 + ox, by4 + oy, pw, ph)
    }
    parts.zipWithIndex.foreach { case ((ox, oy, pw, ph, _, dir), i) =>
      compensateB(st, px + ox * 4, py + oy * 4, pw * 4, ph * 4,
        dir, mv0(i), mv1(i), ref0s(i), ref1s(i))
    }
    decodeInterResidualCabac(st, d, cc, mbAddr, qpIn)
  }

  /** Chroma residual for an INTER MB under CABAC: the
    * [[decodeChromaInter]] assembly (DC Hadamard + per-block AC added
    * to the MC prediction) with the residual blocks read through the
    * arithmetic engine (cat3 DC / cat4 AC, cbf bookkeeping in `cc`).
    */
  private def decodeChromaInterCabac(st: State, d: H264Cabac.Decoder,
      cc: H264Cabac.IntraCtxTrack, mbX: Int, mbY: Int, cbpChroma: Int,
      qpLuma: Int): Unit = {
    val mbAddr = mbY * st.mbW + mbX
    val qpc = chromaQp(qpLuma + st.pps.chromaQpOffset)
    val cpx = mbX * 8; val cpy = mbY * 8
    val planes = Array(st.cb, st.cr)
    val nnzs = Array(st.nnzCb, st.nnzCr)
    val dc = Array.ofDim[Int](2, 4)
    if (cbpChroma != 0) {
      var c = 0
      while (c < 2) {
        val (scan, tcDc) = H264Cabac.decodeResidual(d, 3, 4,
          cc.chromaDcInc(c, mbX, mbY))
        (if (c == 0) cc.cbfCbDc else cc.cbfCrDc)(mbAddr) = tcDc > 0
        val f0 = scan(0) + scan(1); val f1 = scan(0) - scan(1)
        val f2 = scan(2) + scan(3); val f3 = scan(2) - scan(3)
        val g = Array(f0 + f2, f1 + f3, f0 - f2, f1 - f3)
        val ls = levelScale(qpc % 6)(0)
        var k = 0
        while (k < 4) { dc(c)(k) = ((g(k) * ls) << (qpc / 6)) >> 5; k += 1 }
        c += 1
      }
    }
    var c = 0
    while (c < 2) {
      val coeffs = Array.ofDim[Int](4, 16)
      var b = 0
      while (b < 4) {
        val x2 = mbX * 2 + b % 2; val y2 = mbY * 2 + b / 2
        if (cbpChroma == 2) {
          val (scan, tc) = H264Cabac.decodeResidual(d, 4, 15,
            cc.chromaAcInc(c, x2, y2))
          (if (c == 0) cc.cbfCbAc else cc.cbfCrAc)(y2 * st.mbW * 2 + x2) = tc > 0
          nnzs(c)(y2 * st.mbW * 2 + x2) = tc
          var k = 0
          while (k < 15) { coeffs(b)(zigzag4x4(k + 1)) = scan(k); k += 1 }
        } else nnzs(c)(y2 * st.mbW * 2 + x2) = 0
        coeffs(b)(0) = dc(c)(b)
        b += 1
      }
      if (cbpChroma != 0) {
        val plane = planes(c)
        b = 0
        while (b < 4) {
          val res = coeffs(b)
          dequant4x4(res, qpc, skipDc = true)
          inverseTransform4x4(res)
          val bx = (b % 2) * 4; val by = (b / 2) * 4
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val idx = (cpy + by + y) * st.chromaStride + cpx + bx + x
              plane(idx) = clip255(
                (plane(idx) & 0xff) + ((res(y * 4 + x) + 32) >> 6)).toByte
              x += 1
            }
            y += 1
          }
          b += 1
        }
      }
      c += 1
    }
  }

  /** Chroma residual for an INTER MB: same §7.3.5.3.1 parse as
    * [[decodeChroma]], but the prediction is the motion-compensated
    * samples already in the planes — residual adds in place.
    */
  private def decodeChromaInter(st: State, r: H264.BitReader, mbX: Int,
      mbY: Int, cbpChroma: Int, qpLuma: Int): Unit = {
    val qpc = chromaQp(qpLuma + st.pps.chromaQpOffset)
    val cpx = mbX * 8; val cpy = mbY * 8
    val planes = Array(st.cb, st.cr)
    val nnzs = Array(st.nnzCb, st.nnzCr)
    val dc = Array.ofDim[Int](2, 4)
    if (cbpChroma != 0) {
      var c = 0
      while (c < 2) {
        val (scan, _) = H264Cavlc.decodeResidualBlock(r, 4, -1)
        val f0 = scan(0) + scan(1); val f1 = scan(0) - scan(1)
        val f2 = scan(2) + scan(3); val f3 = scan(2) - scan(3)
        val g = Array(f0 + f2, f1 + f3, f0 - f2, f1 - f3)
        val ls = levelScale(qpc % 6)(0)
        var k = 0
        while (k < 4) { dc(c)(k) = ((g(k) * ls) << (qpc / 6)) >> 5; k += 1 }
        c += 1
      }
    }
    var c = 0
    while (c < 2) {
      val coeffs = Array.ofDim[Int](4, 16)
      var b = 0
      while (b < 4) {
        val x2 = mbX * 2 + b % 2; val y2 = mbY * 2 + b / 2
        if (cbpChroma == 2) {
          val nC = st.chromaNc(nnzs(c), x2, y2)
          val (scan, tc) = H264Cavlc.decodeResidualBlock(r, 15, nC)
          nnzs(c)(y2 * st.mbW * 2 + x2) = tc
          var k = 0
          while (k < 15) { coeffs(b)(zigzag4x4(k + 1)) = scan(k); k += 1 }
        } else nnzs(c)(y2 * st.mbW * 2 + x2) = 0
        coeffs(b)(0) = dc(c)(b)
        b += 1
      }
      if (cbpChroma != 0) {
        val plane = planes(c)
        b = 0
        while (b < 4) {
          val res = coeffs(b)
          dequant4x4(res, qpc, skipDc = true)
          inverseTransform4x4(res)
          val bx = (b % 2) * 4; val by = (b / 2) * 4
          var y = 0
          while (y < 4) {
            var x = 0
            while (x < 4) {
              val idx = (cpy + by + y) * st.chromaStride + cpx + bx + x
              plane(idx) = clip255(
                (plane(idx) & 0xff) + ((res(y * 4 + x) + 32) >> 6)).toByte
              x += 1
            }
            y += 1
          }
          b += 1
        }
      }
      c += 1
    }
  }

  /** Decode an Annex-B stream's picture SEQUENCE — the IDR intra frame
    * plus following P pictures (L0 built most-recent-first from the
    * sliding-window DPB, §8.2.4.2.1) and B pictures (r11: L0/L1 by the
    * §8.2.4.2.3 POC split — past descending then future ascending, and
    * the mirror — over a DPB of up to max_num_ref_frames pictures,
    * with per-partition ref_idx selection inside the slices), up to
    * `maxFrames`. A slice with first_mb_in_slice 0 starts a new
    * picture; out-of-scope or malformed content ends the sequence
    * gracefully with the pictures completed so far (corpus posture:
    * undecodable tail = data, not an error). Frames return in DISPLAY
    * order WITHIN each coded video sequence: an IDR starts a new CVS
    * (§7.4.1.2.4 — its access unit precedes every later picture in
    * both decode and display order), so ordering is a stable sort on
    * (cvs index, PicOrderCnt) with the full §8.2.1.1 MSB derivation —
    * poc-lsb wraparound inside a long GOP and multi-GOP streams both
    * order correctly; a no-op for the all-poc-0 P-only streams of the
    * r9 encoder's predecessors. An IDR also flushes the sliding-window
    * DPB and resets the POC derivation state, per §8.2.1.
    */
  def decodeAnnexBPictures(annexB: Array[Byte], maxFrames: Int = 8): Seq[Frame] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[((Int, Int), Frame)]
    var sps: Option[H264.SpsInfo] = None
    var pps: Option[PpsInfo] = None
    var st: State = null
    var stRefIdc = 0
    var cvs = -1 // coded-video-sequence index; first IDR → 0
    // §8.2.1.1 state: the previous REFERENCE picture's pocMsb/pocLsb
    var prevPocMsb = 0
    var prevPocLsb = 0
    // the sliding-window DPB (§8.2.5.3, r11 multi-ref): reference
    // pictures in DECODE order with their POCs, decoded motion grids
    // (the co-located inputs), and each picture's own active-L0 POC
    // table (the §8.4.1.2.3 temporal-direct refIdx mapping). Without
    // MMCO and with gapless frame_num (this decoder's scope), decode
    // order IS ascending FrameNumWrap, so the window evicts the oldest
    // entry when the SPS's max_num_ref_frames is exceeded.
    final case class DpbEntry(poc: Int, frame: Frame,
        grid: H264Inter.MvGrid, refPocs: Array[Int],
        frameNum: Int = 0, longTerm: Boolean = false, ltIdx: Int = 0)
    val dpb = scala.collection.mutable.ArrayBuffer.empty[DpbEntry]
    def finish(): Unit =
      if (st != null && st.mbDecoded.forall(identity)) {
        st.mv.seal(); st.mvL1.seal() // retained grids are whole-picture
        val f = Frame(st.sps.width, st.sps.height, st.mbW, st.mbH,
          st.luma, st.cb, st.cr)
        out += (((cvs, st.poc), f))
        if (stRefIdc > 0) {
          val ownL0 = st.list0.take(st.numRef0).map(_._1).toArray
          if (st.isIdrPic) {
            // DPB was flushed at dispatch; long_term_reference_flag
            // marks the IDR long-term at idx 0 (§8.2.5.1)
            dpb += DpbEntry(st.poc, f, st.mv, ownL0, st.frameNum,
              longTerm = st.idrLongTerm, ltIdx = 0)
          } else {
            // adaptive marking (§8.2.5.4) BEFORE inserting the current
            // picture; op 6 marks the current picture itself
            var currLtIdx = -1
            st.mmcoOps.foreach {
              case (1, diff, _) =>
                // gapless frame_num in this tier's scope: picNum ==
                // frameNum, no wrap (loud reject keeps it honest)
                val picNumX = st.frameNum - (diff + 1)
                require(picNumX >= 0, "MMCO 1 picNum wrap out of scope")
                val i = dpb.indexWhere(e => !e.longTerm && e.frameNum == picNumX)
                require(i >= 0, s"MMCO 1 target picNum $picNumX absent")
                dpb.remove(i)
              case (2, ltPicNum, _) =>
                val i = dpb.indexWhere(e => e.longTerm && e.ltIdx == ltPicNum)
                require(i >= 0, s"MMCO 2 target long-term $ltPicNum absent")
                dpb.remove(i)
              case (3, diff, idx) =>
                val picNumX = st.frameNum - (diff + 1)
                require(picNumX >= 0, "MMCO 3 picNum wrap out of scope")
                val j = dpb.indexWhere(e => e.longTerm && e.ltIdx == idx)
                if (j >= 0) dpb.remove(j)
                val i = dpb.indexWhere(e => !e.longTerm && e.frameNum == picNumX)
                require(i >= 0, s"MMCO 3 target picNum $picNumX absent")
                dpb(i) = dpb(i).copy(longTerm = true, ltIdx = idx)
              case (4, maxPlus1, _) =>
                dpb.filterInPlace(e => !e.longTerm || e.ltIdx < maxPlus1)
              case (6, idx, _) =>
                val j = dpb.indexWhere(e => e.longTerm && e.ltIdx == idx)
                if (j >= 0) dpb.remove(j)
                currLtIdx = idx
              case (op, _, _) => throw new IllegalArgumentException(
                s"MMCO $op unsupported")
            }
            dpb += DpbEntry(st.poc, f, st.mv, ownL0, st.frameNum,
              longTerm = currLtIdx >= 0, ltIdx = math.max(currLtIdx, 0))
            // window capacity floors at 2: the r8–r10 fixture encoders
            // declared max_num_ref_frames = 1 while their IDR+P+B GOPs
            // retain two pictures (a non-conformance the pre-r11
            // two-slot decoder never saw). Retaining more than declared
            // is observably harmless for conformant non-MMCO streams —
            // their lists only ever index the declared prefix — so the
            // tolerant floor keeps frozen corpora decodable. The
            // sliding window only ever evicts SHORT-term entries
            // (§8.2.5.3); long-term pictures leave via MMCO 2/4 only.
            if (dpb.size > math.max(2, st.sps.maxNumRefFrames)) {
              val i = dpb.indexWhere(!_.longTerm)
              require(i >= 0, "DPB holds only long-term references")
              dpb.remove(i) // oldest short-term in decode order out
            }
          }
          prevPocMsb = st.pocMsb; prevPocLsb = st.pocLsb
        }
        st = null
      }
    try {
      val nals = H264.nalUnitsAnnexB(annexB).iterator
      while (nals.hasNext && out.size < maxFrames) {
        val nal = nals.next()
        nal.nalType match {
          case 7 => sps = H264.parseSps(nal.payload)
          case 8 => pps = parsePps(nal.payload)
          case 5 | 1 =>
            (sps, pps) match {
              case (Some(s), Some(p)) if s.frameMbsOnly &&
                  s.chromaFormatIdc == 1 && s.width > 0 && s.height > 0 &&
                  s.width <= 8192 && s.height <= 8192 =>
                val hr = new H264.BitReader(H264.rbsp(nal.payload))
                val firstMb = hr.ue()
                val sliceType = hr.ue()
                if (firstMb == 0) {
                  finish()
                  if (out.size < maxFrames) {
                    if (nal.nalType == 5) {
                      // IDR: new CVS — flush the DPB and reset the POC
                      // derivation (an IDR's prevPocMsb/prevPocLsb are
                      // 0 by §8.2.1); pictures after it never reference
                      // or display-order against the previous GOP
                      cvs += 1
                      dpb.clear()
                      prevPocMsb = 0; prevPocLsb = 0
                    }
                    st = new State(s, p)
                    st.prevPocMsb = prevPocMsb
                    st.prevPocLsb = prevPocLsb
                    stRefIdc = nal.refIdc
                    if (nal.nalType == 1) {
                      if (dpb.isEmpty) return result(out) // inter before any IDR
                      val longs = dpb.filter(_.longTerm).sortBy(_.ltIdx)
                      st.hasLongTerm = longs.nonEmpty
                      if (sliceType == 1 || sliceType == 6) { // B
                        // peek the B picture's POC to split the
                        // SHORT-term DPB into past / future for the
                        // §8.2.4.2.3 lists; long-term entries append
                        // to both lists in ascending LongTermPicNum
                        hr.ue() // pps_id
                        hr.u(s.log2MaxFrameNum) // frame_num
                        if (s.pocType != 0) return result(out)
                        val lsb = hr.u(s.log2MaxPocLsb)
                        val poc = derivePocMsb(prevPocMsb, prevPocLsb,
                          lsb, s.log2MaxPocLsb) + lsb
                        val shorts = dpb.filter(!_.longTerm)
                        val past = shorts.filter(_.poc < poc).sortBy(-_.poc)
                        val future = shorts.filter(_.poc > poc).sortBy(_.poc)
                        // scope: a B needs at least one short-term
                        // reference on each temporal side (no
                        // L0==L1 swap case; the co-located picture —
                        // RefPicList1[0] — is short-term)
                        if (past.isEmpty || future.isEmpty) return result(out)
                        st.list0 = (past ++ future ++ longs)
                          .map(e => (e.poc, e.frame)).toIndexedSeq
                        st.list1 = (future ++ past ++ longs)
                          .map(e => (e.poc, e.frame)).toIndexedSeq
                        st.colMv = future.head.grid
                        st.colRefPocs = future.head.refPocs
                      } else
                        // P: §8.2.4.2.1 — short-term by descending
                        // PicNum (most recent decode order first;
                        // gapless frame_num), then long-term by
                        // ascending LongTermPicNum
                        st.list0 = (dpb.filter(!_.longTerm).reverseIterator ++
                          longs.iterator)
                          .map(e => (e.poc, e.frame)).toIndexedSeq
                    }
                  }
                }
                if (st != null)
                  decodeSlice(st, nal.payload, isIdr = nal.nalType == 5,
                    refIdc = nal.refIdc)
              case _ => return result(out)
            }
          case _ => // SEI / AUD / filler
        }
      }
      finish()
    } catch {
      case e @ (_: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
          _: java.util.NoSuchElementException) =>
        if (sys.env.contains("H264_DEBUG")) e.printStackTrace() // keep completed pictures
    }
    result(out)
  }

  /** PicOrderCntMsb for poc type 0 (§8.2.1.1): the lsb is a modular
    * counter; a backward jump of ≥ half the modulus means the msb
    * wrapped UP, a forward jump of > half means the reference's msb was
    * one modulus AHEAD of this picture.
    */
  private def derivePocMsb(prevMsb: Int, prevLsb: Int, lsb: Int,
      log2MaxLsb: Int): Int = {
    val max = 1 << log2MaxLsb
    if (lsb < prevLsb && prevLsb - lsb >= max / 2) prevMsb + max
    else if (lsb > prevLsb && lsb - prevLsb > max / 2) prevMsb - max
    else prevMsb
  }

  private def result(
      out: scala.collection.mutable.ArrayBuffer[((Int, Int), Frame)]): Seq[Frame] =
    out.sortBy(_._1).map(_._2).toSeq
}
