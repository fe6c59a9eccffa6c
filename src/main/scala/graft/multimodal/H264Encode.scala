package graft.multimodal

/** Minimal H.264 baseline INTRA encoder — the fixture-producing inverse
  * of [[H264Decode]], from the same public spec sections. Three encoding
  * strategies, each emitting a complete conformant-by-construction
  * Annex-B stream (SPS + PPS + one IDR slice):
  *
  *  - [[encodeIPcm]]: every macroblock I_PCM (§7.3.5 raw-sample mode) —
  *    pixels round-trip EXACTLY, no transform/entropy involvement. This
  *    is the ground-truth path: any decoder bug elsewhere cannot hide
  *    here.
  *  - [[encodeI16x16Dc]]: every macroblock I_16x16 with DC prediction
  *    and a CAVLC-coded luma-DC-only residual — exercises slice/MB
  *    headers, coeff_token/level/total_zeros entropy, the inverse
  *    Hadamard + dequant chain, and DC intra prediction. The encoder
  *    replicates the decoder's prediction recursion, so reconstruction
  *    targets are computed, not assumed.
  *  - [[encodeI4x4Modes]]: every macroblock I_4x4 with caller-chosen
  *    per-block prediction modes and zero residual (cbp = 0) —
  *    exercises the §8.3.1 mode-prediction syntax (prev/rem flags
  *    against the min(A,B) predictor) and all nine spatial predictors.
  *
  * The deblocking filter is signalled OFF (disable_deblocking_filter_idc
  * = 1), making [[H264Decode]]'s pre-filter reconstruction the exact
  * conformant output.
  */
object H264Encode {

  /** Wrap (nalType, refIdc, EBSP payload) triples as an Annex-B stream. */
  def annexB(nals: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { case (t, refIdc, payload) =>
      out.write(Array[Byte](0, 0, 0, 1))
      out.write(((refIdc & 3) << 5) | (t & 0x1f))
      out.write(payload, 0, payload.length)
    }
    out.toByteArray
  }

  private[multimodal] def sliceHeader(w: H264.BitWriter, qp: Int,
      deblock: Boolean = false, firstMb: Int = 0,
      longTermRef: Boolean = false): Unit = {
    w.ue(firstMb) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices in picture)
    w.ue(0) // pps_id
    w.u(0, 4) // frame_num (log2_max_frame_num = 4 per writeSps)
    w.ue(0) // idr_pic_id
    w.u(0, 4) // pic_order_cnt_lsb (pocType 0, log2 = 4 per writeSps)
    // dec_ref_pic_marking (IDR): no_output_of_prior_pics +
    // long_term_reference_flag (r12: anchors the IDR at LT idx 0)
    w.flag(false); w.flag(longTermRef)
    w.se(qp - 26) // slice_qp_delta (writePps sets pic_init_qp = 26)
    if (deblock) { // r11 deblocking tier: filter ON, zero offsets
      w.ue(0); w.se(0); w.se(0)
    } else w.ue(1) // disable_deblocking_filter_idc = 1
  }

  /** Explicit pred_weight_table content (r10 weighted-prediction tier):
    * one [[ListWeights]] per active reference list. Mirrors §7.3.3.2
    * with both weight flags set.
    */
  final case class ListWeights(lw: Int, lo: Int, cwCb: Int, coCb: Int,
      cwCr: Int, coCr: Int)
  final case class PredWeights(lumaLog2: Int, chromaLog2: Int,
      lists: Seq[ListWeights]) {
    require(lumaLog2 >= 0 && lumaLog2 <= 7 && chromaLog2 >= 0 && chromaLog2 <= 7,
      "weight denominators out of range")
  }

  private def writePredWeightTable(w: H264.BitWriter, pw: PredWeights): Unit = {
    w.ue(pw.lumaLog2); w.ue(pw.chromaLog2)
    pw.lists.foreach { l =>
      w.flag(true); w.se(l.lw); w.se(l.lo) // luma_weight_lX_flag + w/o
      w.flag(true) // chroma_weight_lX_flag
      w.se(l.cwCb); w.se(l.coCb); w.se(l.cwCr); w.se(l.coCr)
    }
  }

  /** P slice header; `cabacInitIdc` >= 0 writes the cabac_init_idc
    * syntax element (§7.3.3: present iff entropy_coding_mode and a
    * non-I slice) — pass -1 for CAVLC streams. `weights` writes the
    * explicit pred_weight_table (the stream's PPS must set
    * weighted_pred_flag — `H264.writePps(weightedPred = true)`).
    */
  private[multimodal] def pSliceHeader(w: H264.BitWriter, qp: Int,
      cabacInitIdc: Int = -1, poc: Int = 0,
      weights: Option[PredWeights] = None, numRef0: Int = 1,
      deblock: Boolean = false, firstMb: Int = 0, frameNum: Int = 1,
      mmco: Seq[(Int, Int, Int)] = Nil): Unit = {
    w.ue(firstMb) // first_mb_in_slice
    w.ue(5) // slice_type: P (all slices in picture)
    w.ue(0) // pps_id
    w.u(frameNum & 15, 4) // frame_num (log2_max_frame_num = 4 per writeSps)
    w.u(poc & 15, 4) // pic_order_cnt_lsb
    if (numRef0 > 1) { // r11 multi-ref: slice override of the PPS default
      w.flag(true) // num_ref_idx_active_override_flag
      w.ue(numRef0 - 1)
    } else w.flag(false)
    w.flag(false) // ref_pic_list_modification_flag_l0
    weights.foreach { pw =>
      require(pw.lists.size == numRef0,
        "P pred_weight_table carries one entry per active L0 reference")
      writePredWeightTable(w, pw)
    }
    // dec_ref_pic_marking: sliding window, or the r12 adaptive MMCO
    // op list ((op, p1, p2) triples; op 3 carries two parameters)
    if (mmco.isEmpty) w.flag(false)
    else {
      w.flag(true) // adaptive_ref_pic_marking_mode_flag
      mmco.foreach { case (op, p1, p2) =>
        require(op == 1 || op == 2 || op == 3 || op == 4 || op == 6,
          s"unsupported MMCO $op")
        w.ue(op); w.ue(p1)
        if (op == 3) w.ue(p2)
      }
      w.ue(0) // end of ops
    }
    if (cabacInitIdc >= 0) w.ue(cabacInitIdc) // cabac_init_idc
    w.se(qp - 26) // slice_qp_delta
    if (deblock) { // r11 deblocking tier: filter ON, zero offsets
      w.ue(0); w.se(0); w.se(0)
    } else w.ue(1) // disable_deblocking_filter_idc = 1
  }

  /** B slice header (r9 B tier): non-reference picture (callers wrap
    * the payload with nal_ref_idc 0, so dec_ref_pic_marking is absent),
    * one reference per list, `spatial` selecting the direct-mode flag
    * (both §8.4.1.2.2 spatial and §8.4.1.2.3 temporal decode), display
    * position `poc` (pic_order_cnt_lsb, pocType 0) strictly between
    * the two reference pictures'.
    */
  private[multimodal] def bSliceHeader(w: H264.BitWriter, qp: Int, poc: Int,
      cabacInitIdc: Int = -1, spatial: Boolean = true,
      weights: Option[PredWeights] = None,
      numRef0: Int = 1, numRef1: Int = 1): Unit = {
    w.ue(0) // first_mb_in_slice
    w.ue(6) // slice_type: B (all slices in picture)
    w.ue(0) // pps_id
    w.u(2, 4) // frame_num (decoder ignores; gaps allowed are N/A here)
    w.u(poc & 15, 4) // pic_order_cnt_lsb
    w.flag(spatial) // direct_spatial_mv_pred_flag
    if (numRef0 > 1 || numRef1 > 1) { // r11 multi-ref slice override
      w.flag(true) // num_ref_idx_active_override_flag
      w.ue(numRef0 - 1); w.ue(numRef1 - 1)
    } else w.flag(false)
    w.flag(false) // ref_pic_list_modification_flag_l0
    w.flag(false) // ref_pic_list_modification_flag_l1
    // explicit B pred_weight_table (weighted_bipred_idc == 1 streams)
    weights.foreach { pw =>
      require(pw.lists.size == numRef0 + numRef1,
        "B pred_weight_table carries one entry per active reference " +
          "(L0 entries then L1)")
      writePredWeightTable(w, pw)
    }
    if (cabacInitIdc >= 0) w.ue(cabacInitIdc) // cabac_init_idc
    w.se(qp - 26) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc = 1
  }

  /** B-slice payload (non-IDR, NAL type 1, nal_ref_idc = 0), CAVLC:
    * every macroblock a 16x16 single-partition B type with ZERO
    * residual — `mbs(mbY)(mbX)` = (dir, mvL0, mvL1) with dir 0 =
    * B_L0_16x16, 1 = B_L1_16x16, 2 = B_Bi_16x16 (the unused list's mv
    * is ignored). mvds derive from the decoder's own per-list
    * [[H264Inter.MvGrid]] §8.4.1.3 predictors, so the two sides cannot
    * drift; mvd_l0s for the picture's L0 users precede mvd_l1s per MB
    * (§7.3.5.1 list-major order — trivially satisfied at one
    * partition).
    */
  def encodeB16x16(mbs: Array[Array[(Int, (Int, Int), (Int, Int))]],
      qp: Int = 26, poc: Int = 2,
      weights: Option[PredWeights] = None): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc, weights = weights)
    val grid0 = new H264Inter.MvGrid(mbW, mbH)
    val grid1 = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val (dir, m0, m1) = mbs(mbY)(mbX)
        require(dir >= 0 && dir <= 2, s"bad B dir $dir")
        grid0.markMb(mbY * mbW + mbX); grid1.markMb(mbY * mbW + mbX)
        w.ue(0) // mb_skip_run
        w.ue(1 + dir) // mb_type: B_L0/L1/Bi_16x16
        if (dir != 1) {
          val (p0x, p0y) = grid0.mvPred(mbX * 4, mbY * 4, 4, 4, 0)
          w.se(m0._1 - p0x); w.se(m0._2 - p0y) // mvd_l0
          grid0.set(mbX * 4, mbY * 4, 4, 4, m0._1, m0._2, 0)
        } else grid0.markDone(mbX * 4, mbY * 4, 4, 4) // decoder's r10 discipline
        if (dir != 0) {
          val (p1x, p1y) = grid1.mvPred(mbX * 4, mbY * 4, 4, 4, 0)
          w.se(m1._1 - p1x); w.se(m1._2 - p1y) // mvd_l1
          grid1.set(mbX * 4, mbY * 4, 4, 4, m1._1, m1._2, 0)
        } else grid1.markDone(mbX * 4, mbY * 4, 4, 4)
        w.ue(H264Inter.cbpInterToCodeNum(0)) // coded_block_pattern 0
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** B_8x8 slice payload (CAVLC, the r10 sub-partition tier): every
    * macroblock mb_type 22 with four NON-DIRECT sub_mb_types —
    * `mbs(mbY)(mbX)` = four (subType 1..12 per Table 7-18, per-sub-
    * partition (mvL0, mvL1) pairs in §6.4.2.2 order; the unused list's
    * mv is ignored). mvds derive from the decoder's own grids (per-list
    * plain-median at sub-partition granularity, r10 per-block
    * decodedness discipline), list-major element order, zero residual.
    * Direct sub-blocks (subType 0) are NOT encodable here — their
    * motion derivation needs the co-located picture; hand-written
    * slices cover them (H264BSliceSpec).
    */
  def encodeB8x8(
      mbs: Array[Array[Seq[(Int, Seq[((Int, Int), (Int, Int))])]]],
      qp: Int = 26, poc: Int = 2): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc)
    val grid0 = new H264Inter.MvGrid(mbW, mbH)
    val grid1 = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val subs = mbs(mbY)(mbX)
        require(subs.length == 4, "a B_8x8 MB needs exactly 4 sub-blocks")
        grid0.markMb(mbY * mbW + mbX); grid1.markMb(mbY * mbW + mbX)
        val bx4 = mbX * 4; val by4 = mbY * 4
        w.ue(0) // mb_skip_run
        w.ue(22) // mb_type B_8x8
        subs.foreach { case (t, mvs) =>
          require(t >= 1 && t <= 12, s"sub_mb_type $t not encodable")
          val (n, _, _, _) = H264Decode.bSubMbInfo(t)
          require(mvs.length == n, s"sub_mb_type $t needs $n mv pairs")
          w.ue(t)
        }
        // L0 pass then L1 pass, mirroring the decoder exactly
        for (i <- 0 until 4) {
          val ox = (i % 2) * 2; val oy = (i / 2) * 2
          val (t, mvs) = subs(i)
          val (n, dir, sw, sh) = H264Decode.bSubMbInfo(t)
          if (dir != 1) {
            H264Decode.bSubPartOffsets(n, sw, sh).zipWithIndex.foreach {
              case ((sx, sy), j) =>
                val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
                val (p0x, p0y) = grid0.mvPred(x4, y4, sw, sh, 0)
                val m0 = mvs(j)._1
                w.se(m0._1 - p0x); w.se(m0._2 - p0y)
                grid0.set(x4, y4, sw, sh, m0._1, m0._2, 0)
            }
          } else grid0.markDone(bx4 + ox, by4 + oy, 2, 2)
        }
        for (i <- 0 until 4) {
          val ox = (i % 2) * 2; val oy = (i / 2) * 2
          val (t, mvs) = subs(i)
          val (n, dir, sw, sh) = H264Decode.bSubMbInfo(t)
          if (dir != 0) {
            H264Decode.bSubPartOffsets(n, sw, sh).zipWithIndex.foreach {
              case ((sx, sy), j) =>
                val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
                val (p1x, p1y) = grid1.mvPred(x4, y4, sw, sh, 0)
                val m1 = mvs(j)._2
                w.se(m1._1 - p1x); w.se(m1._2 - p1y)
                grid1.set(x4, y4, sw, sh, m1._1, m1._2, 0)
            }
          } else grid1.markDone(bx4 + ox, by4 + oy, 2, 2)
        }
        w.ue(H264Inter.cbpInterToCodeNum(0)) // coded_block_pattern 0
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** CABAC twin of [[encodeB8x8]]: mb_type 22 through the B tree,
    * sub_mb_types through ctx 36..39, mvds through the shared UEG3
    * contexts at sub-partition granularity, cbp 0, terminate per MB.
    */
  def encodeCabacB8x8(
      mbs: Array[Array[Seq[(Int, Seq[((Int, Int), (Int, Int))])]]],
      qp: Int = 26, poc: Int = 2, initIdc: Int = 0): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    require(initIdc >= 0 && initIdc <= 2, s"bad cabac_init_idc $initIdc")
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc, cabacInitIdc = initIdc)
    w.alignOne()
    val e = new H264Cabac.Encoder(w,
      new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc)))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    val grid0 = new H264Inter.MvGrid(mbW, mbH)
    val grid1 = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mbAddr = mbY * mbW + mbX
        val subs = mbs(mbY)(mbX)
        require(subs.length == 4, "a B_8x8 MB needs exactly 4 sub-blocks")
        grid0.markMb(mbAddr); grid1.markMb(mbAddr)
        val bx4 = mbX * 4; val by4 = mbY * 4
        H264Cabac.encodeMbSkipB(e, cc.skipCond(mbX, mbY), 0)
        H264Cabac.encodeMbTypeB(e, cc.bTypeCond(mbX, mbY), 22)
        cc.markInter(mbAddr)
        subs.foreach { case (t, mvs) =>
          require(t >= 1 && t <= 12, s"sub_mb_type $t not encodable")
          val (n, _, _, _) = H264Decode.bSubMbInfo(t)
          require(mvs.length == n, s"sub_mb_type $t needs $n mv pairs")
          H264Cabac.encodeBSubMbType(e, t)
        }
        for (i <- 0 until 4) {
          val ox = (i % 2) * 2; val oy = (i / 2) * 2
          val (t, mvs) = subs(i)
          val (n, dir, sw, sh) = H264Decode.bSubMbInfo(t)
          if (dir != 1) {
            H264Decode.bSubPartOffsets(n, sw, sh).zipWithIndex.foreach {
              case ((sx, sy), j) =>
                val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
                val (p0x, p0y) = grid0.mvPred(x4, y4, sw, sh, 0)
                val m0 = mvs(j)._1
                val mvdX = m0._1 - p0x; val mvdY = m0._2 - p0y
                H264Cabac.encodeMvd(e, 0, cc.mvdInc(0, 0, x4, y4), mvdX)
                H264Cabac.encodeMvd(e, 1, cc.mvdInc(0, 1, x4, y4), mvdY)
                cc.setMvd(0, x4, y4, sw, sh, mvdX, mvdY)
                grid0.set(x4, y4, sw, sh, m0._1, m0._2, 0)
            }
          } else grid0.markDone(bx4 + ox, by4 + oy, 2, 2)
        }
        for (i <- 0 until 4) {
          val ox = (i % 2) * 2; val oy = (i / 2) * 2
          val (t, mvs) = subs(i)
          val (n, dir, sw, sh) = H264Decode.bSubMbInfo(t)
          if (dir != 0) {
            H264Decode.bSubPartOffsets(n, sw, sh).zipWithIndex.foreach {
              case ((sx, sy), j) =>
                val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
                val (p1x, p1y) = grid1.mvPred(x4, y4, sw, sh, 0)
                val m1 = mvs(j)._2
                val mvdX = m1._1 - p1x; val mvdY = m1._2 - p1y
                H264Cabac.encodeMvd(e, 0, cc.mvdInc(1, 0, x4, y4), mvdX)
                H264Cabac.encodeMvd(e, 1, cc.mvdInc(1, 1, x4, y4), mvdY)
                cc.setMvd(1, x4, y4, sw, sh, mvdX, mvdY)
                grid1.set(x4, y4, sw, sh, m1._1, m1._2, 0)
            }
          } else grid1.markDone(bx4 + ox, by4 + oy, 2, 2)
        }
        H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY),
          cc.cbpOf(mbX, mbY - 1), 0)
        cc.cbp(mbAddr) = 0
        cc.prevQpDeltaNZ = false // mb_qp_delta absent when cbp == 0
        e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0)
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** All-B_Skip slice payload (CAVLC): one mb_skip_run covering the
    * picture — every macroblock reconstructs via §8.4.1.2.2 spatial
    * direct motion against both reference lists, no residual. The
    * decoder's derivation needs no per-MB syntax at all, so this is
    * the B analogue of [[encodePSkipFrame]].
    */
  def encodeBSkipFrame(mbW: Int, mbH: Int, qp: Int = 26,
      poc: Int = 2, spatial: Boolean = true,
      numRef0: Int = 1, numRef1: Int = 1): Array[Byte] = {
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc, spatial = spatial,
      numRef0 = numRef0, numRef1 = numRef1)
    w.ue(mbW * mbH) // mb_skip_run = whole picture
    H264.ebsp(w.stop())
  }

  /** CABAC all-B_Skip frame: mb_skip_flag 1 (B context block) + an
    * end_of_slice terminate per MB.
    */
  def encodeCabacBSkipFrame(mbW: Int, mbH: Int, qp: Int = 26,
      poc: Int = 2, initIdc: Int = 0, spatial: Boolean = true,
      numRef0: Int = 1, numRef1: Int = 1): Array[Byte] = {
    require(initIdc >= 0 && initIdc <= 2, s"bad cabac_init_idc $initIdc")
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc, cabacInitIdc = initIdc, spatial = spatial,
      numRef0 = numRef0, numRef1 = numRef1)
    w.alignOne()
    val e = new H264Cabac.Encoder(w,
      new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc)))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    var mbAddr = 0
    while (mbAddr < mbW * mbH) {
      H264Cabac.encodeMbSkipB(e, cc.skipCond(mbAddr % mbW, mbAddr / mbW), 1)
      cc.markSkip(mbAddr)
      e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0)
      mbAddr += 1
    }
    H264.ebsp(w.stop())
  }

  /** CABAC twin of [[encodeB16x16]]: mb_skip_flag 0 through the B
    * context block, the Table 9-37 B mb_type binarization, per-list
    * UEG3 mvds with list-keyed context increments (shared
    * [[H264Cabac.IntraCtxTrack]] bookkeeping), cbp 0, a terminate per
    * MB. `initIdc` selects the cabac_init_idc column — B and P share
    * the three columns (§9.3.1.1).
    */
  def encodeCabacB16x16(mbs: Array[Array[(Int, (Int, Int), (Int, Int))]],
      qp: Int = 26, poc: Int = 2, initIdc: Int = 0,
      weights: Option[PredWeights] = None): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    require(initIdc >= 0 && initIdc <= 2, s"bad cabac_init_idc $initIdc")
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc, cabacInitIdc = initIdc, weights = weights)
    w.alignOne()
    val e = new H264Cabac.Encoder(w,
      new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc)))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    val grid0 = new H264Inter.MvGrid(mbW, mbH)
    val grid1 = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mbAddr = mbY * mbW + mbX
        val (dir, m0, m1) = mbs(mbY)(mbX)
        require(dir >= 0 && dir <= 2, s"bad B dir $dir")
        grid0.markMb(mbAddr); grid1.markMb(mbAddr)
        H264Cabac.encodeMbSkipB(e, cc.skipCond(mbX, mbY), 0)
        H264Cabac.encodeMbTypeB(e, cc.bTypeCond(mbX, mbY), 1 + dir)
        cc.markInter(mbAddr)
        if (dir != 1) {
          val (p0x, p0y) = grid0.mvPred(mbX * 4, mbY * 4, 4, 4, 0)
          val mvdX = m0._1 - p0x; val mvdY = m0._2 - p0y
          H264Cabac.encodeMvd(e, 0, cc.mvdInc(0, 0, mbX * 4, mbY * 4), mvdX)
          H264Cabac.encodeMvd(e, 1, cc.mvdInc(0, 1, mbX * 4, mbY * 4), mvdY)
          cc.setMvd(0, mbX * 4, mbY * 4, 4, 4, mvdX, mvdY)
          grid0.set(mbX * 4, mbY * 4, 4, 4, m0._1, m0._2, 0)
        } else grid0.markDone(mbX * 4, mbY * 4, 4, 4) // decoder's r10 discipline
        if (dir != 0) {
          val (p1x, p1y) = grid1.mvPred(mbX * 4, mbY * 4, 4, 4, 0)
          val mvdX = m1._1 - p1x; val mvdY = m1._2 - p1y
          H264Cabac.encodeMvd(e, 0, cc.mvdInc(1, 0, mbX * 4, mbY * 4), mvdX)
          H264Cabac.encodeMvd(e, 1, cc.mvdInc(1, 1, mbX * 4, mbY * 4), mvdY)
          cc.setMvd(1, mbX * 4, mbY * 4, 4, 4, mvdX, mvdY)
          grid1.set(mbX * 4, mbY * 4, 4, 4, m1._1, m1._2, 0)
        } else grid1.markDone(mbX * 4, mbY * 4, 4, 4)
        H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY),
          cc.cbpOf(mbX, mbY - 1), 0)
        cc.cbp(mbAddr) = 0
        cc.prevQpDeltaNZ = false // mb_qp_delta absent when cbp == 0
        e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0) // end_of_slice
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** P-slice payload (non-IDR, NAL type 1, nal_ref_idc > 0): every
    * macroblock P_L0_16x16 with the given quarter-pel motion vector and
    * ZERO residual (cbp 0) — pure motion-compensated prediction from
    * the previous picture. mvd_l0 derives from the SAME
    * [[H264Inter.MvGrid]] §8.4.1.3 predictor the decoder runs, so the
    * two sides cannot drift. `mvs(mbY)(mbX)` = (mvx, mvy) quarter-pel.
    */
  def encodeP16x16(mvs: Array[Array[(Int, Int)]], qp: Int = 26,
      poc: Int = 0, weights: Option[PredWeights] = None,
      deblock: Boolean = false): Array[Byte] = {
    val mbH = mvs.length; val mbW = mvs.head.length
    require(mvs.forall(_.length == mbW), "ragged mvs")
    val w = new H264.BitWriter
    pSliceHeader(w, qp, poc = poc, weights = weights, deblock = deblock)
    val grid = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        grid.markMb(mbY * mbW + mbX)
        w.ue(0) // mb_skip_run
        w.ue(0) // mb_type: P_L0_16x16
        val (mx, my) = mvs(mbY)(mbX)
        val (p0x, p0y) = grid.mvPred(mbX * 4, mbY * 4, 4, 4, 0)
        w.se(mx - p0x); w.se(my - p0y) // mvd_l0
        grid.set(mbX * 4, mbY * 4, 4, 4, mx, my, 0)
        w.ue(H264Inter.cbpInterToCodeNum(0)) // coded_block_pattern 0
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** Multi-reference P-slice payload (CAVLC, the r11 ref_idx tier):
    * every macroblock P_L0_16x16 with `mbs(mbY)(mbX)` = (refIdx, mv) —
    * ref_idx_l0 rides te(v) against `numRef0` active references
    * (§7.3.5.1 puts it before the mvds), and each MB's mvp ref-matches
    * its own refIdx against the decoder-shared grid, so multi-ref
    * median prediction cannot drift between the two sides. Zero
    * residual. `weights` (optional) carries one entry per active
    * reference.
    */
  def encodeP16x16MultiRef(mbs: Array[Array[(Int, (Int, Int))]],
      numRef0: Int, qp: Int = 26, poc: Int = 0,
      weights: Option[PredWeights] = None, frameNum: Int = 1,
      mmco: Seq[(Int, Int, Int)] = Nil): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    require(numRef0 >= 1 && numRef0 <= 16, s"bad numRef0 $numRef0")
    val w = new H264.BitWriter
    pSliceHeader(w, qp, poc = poc, weights = weights, numRef0 = numRef0,
      frameNum = frameNum, mmco = mmco)
    val grid = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        grid.markMb(mbY * mbW + mbX)
        val (ref, (mx, my)) = mbs(mbY)(mbX)
        require(ref >= 0 && ref < numRef0, s"refIdx $ref out of range")
        w.ue(0) // mb_skip_run
        w.ue(0) // mb_type: P_L0_16x16
        w.te(ref, numRef0 - 1) // ref_idx_l0
        val (p0x, p0y) = grid.mvPred(mbX * 4, mbY * 4, 4, 4, 0, ref)
        w.se(mx - p0x); w.se(my - p0y) // mvd_l0
        grid.set(mbX * 4, mbY * 4, 4, 4, mx, my, ref)
        w.ue(H264Inter.cbpInterToCodeNum(0)) // coded_block_pattern 0
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** CABAC twin of [[encodeP16x16MultiRef]]: ref_idx_l0 through the
    * ctx-54..59 unary binarization with the decoder-shared
    * [[H264Cabac.IntraCtxTrack]] neighbor increments, mvds through the
    * UEG3 contexts, zero residual, terminate per MB.
    */
  def encodeCabacP16x16MultiRef(mbs: Array[Array[(Int, (Int, Int))]],
      numRef0: Int, qp: Int = 26, initIdc: Int = 0, poc: Int = 0,
      weights: Option[PredWeights] = None, frameNum: Int = 1,
      mmco: Seq[(Int, Int, Int)] = Nil): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    require(numRef0 >= 1 && numRef0 <= 16, s"bad numRef0 $numRef0")
    require(initIdc >= 0 && initIdc <= 2, s"bad cabac_init_idc $initIdc")
    val w = new H264.BitWriter
    pSliceHeader(w, qp, cabacInitIdc = initIdc, poc = poc,
      weights = weights, numRef0 = numRef0, frameNum = frameNum,
      mmco = mmco)
    w.alignOne()
    val e = new H264Cabac.Encoder(w,
      new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc)))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    val grid = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mbAddr = mbY * mbW + mbX
        grid.markMb(mbAddr)
        H264Cabac.encodeMbSkip(e, cc.skipCond(mbX, mbY), 0)
        H264Cabac.encodeMbTypeP(e, 0) // P_L0_16x16
        cc.markInter(mbAddr)
        val (ref, (mx, my)) = mbs(mbY)(mbX)
        require(ref >= 0 && ref < numRef0, s"refIdx $ref out of range")
        if (numRef0 > 1) {
          H264Cabac.encodeRefIdx(e, cc.refIdxInc(0, mbX * 4, mbY * 4), ref)
          cc.setRefCtx(0, mbX * 4, mbY * 4, 4, 4, ref)
        }
        val (p0x, p0y) = grid.mvPred(mbX * 4, mbY * 4, 4, 4, 0, ref)
        val mvdX = mx - p0x; val mvdY = my - p0y
        H264Cabac.encodeMvd(e, 0, cc.mvdInc(0, 0, mbX * 4, mbY * 4), mvdX)
        H264Cabac.encodeMvd(e, 1, cc.mvdInc(0, 1, mbX * 4, mbY * 4), mvdY)
        cc.setMvd(0, mbX * 4, mbY * 4, 4, 4, mvdX, mvdY)
        grid.set(mbX * 4, mbY * 4, 4, 4, mx, my, ref)
        H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY),
          cc.cbpOf(mbX, mbY - 1), 0)
        cc.cbp(mbAddr) = 0
        cc.prevQpDeltaNZ = false
        e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0)
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** Multi-reference B-slice payload (CAVLC): every macroblock a
    * 16x16 single-partition B type with `mbs(mbY)(mbX)` =
    * (dir, (refIdx0, mvL0), (refIdx1, mvL1)) — ref_idx_lX rides te(v)
    * before the list-major mvds (§7.3.5.1), mvps ref-match per list.
    * Zero residual, non-reference picture.
    */
  def encodeB16x16MultiRef(
      mbs: Array[Array[(Int, (Int, (Int, Int)), (Int, (Int, Int)))]],
      numRef0: Int, numRef1: Int, qp: Int = 26, poc: Int = 2): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    require(numRef0 >= 1 && numRef0 <= 16 && numRef1 >= 1 && numRef1 <= 16,
      "bad active ref counts")
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc, numRef0 = numRef0, numRef1 = numRef1)
    val grid0 = new H264Inter.MvGrid(mbW, mbH)
    val grid1 = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val (dir, (r0, m0), (r1, m1)) = mbs(mbY)(mbX)
        require(dir >= 0 && dir <= 2, s"bad B dir $dir")
        require(r0 >= 0 && r0 < numRef0 && r1 >= 0 && r1 < numRef1,
          "refIdx out of range")
        grid0.markMb(mbY * mbW + mbX); grid1.markMb(mbY * mbW + mbX)
        w.ue(0) // mb_skip_run
        w.ue(1 + dir) // mb_type: B_L0/L1/Bi_16x16
        if (dir != 1) w.te(r0, numRef0 - 1) // ref_idx_l0
        if (dir != 0) w.te(r1, numRef1 - 1) // ref_idx_l1
        if (dir != 1) {
          val (p0x, p0y) = grid0.mvPred(mbX * 4, mbY * 4, 4, 4, 0, r0)
          w.se(m0._1 - p0x); w.se(m0._2 - p0y) // mvd_l0
          grid0.set(mbX * 4, mbY * 4, 4, 4, m0._1, m0._2, r0)
        } else grid0.markDone(mbX * 4, mbY * 4, 4, 4)
        if (dir != 0) {
          val (p1x, p1y) = grid1.mvPred(mbX * 4, mbY * 4, 4, 4, 0, r1)
          w.se(m1._1 - p1x); w.se(m1._2 - p1y) // mvd_l1
          grid1.set(mbX * 4, mbY * 4, 4, 4, m1._1, m1._2, r1)
        } else grid1.markDone(mbX * 4, mbY * 4, 4, 4)
        w.ue(H264Inter.cbpInterToCodeNum(0)) // coded_block_pattern 0
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** CABAC twin of [[encodeB16x16MultiRef]]: B mb_type tree, ref_idx
    * through ctx 54..59 with list-keyed increments, UEG3 mvds, zero
    * residual, terminate per MB.
    */
  def encodeCabacB16x16MultiRef(
      mbs: Array[Array[(Int, (Int, (Int, Int)), (Int, (Int, Int)))]],
      numRef0: Int, numRef1: Int, qp: Int = 26, poc: Int = 2,
      initIdc: Int = 0): Array[Byte] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    require(numRef0 >= 1 && numRef0 <= 16 && numRef1 >= 1 && numRef1 <= 16,
      "bad active ref counts")
    require(initIdc >= 0 && initIdc <= 2, s"bad cabac_init_idc $initIdc")
    val w = new H264.BitWriter
    bSliceHeader(w, qp, poc, cabacInitIdc = initIdc,
      numRef0 = numRef0, numRef1 = numRef1)
    w.alignOne()
    val e = new H264Cabac.Encoder(w,
      new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc)))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    val grid0 = new H264Inter.MvGrid(mbW, mbH)
    val grid1 = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mbAddr = mbY * mbW + mbX
        val bx4 = mbX * 4; val by4 = mbY * 4
        val (dir, (r0, m0), (r1, m1)) = mbs(mbY)(mbX)
        require(dir >= 0 && dir <= 2, s"bad B dir $dir")
        require(r0 >= 0 && r0 < numRef0 && r1 >= 0 && r1 < numRef1,
          "refIdx out of range")
        grid0.markMb(mbAddr); grid1.markMb(mbAddr)
        H264Cabac.encodeMbSkipB(e, cc.skipCond(mbX, mbY), 0)
        H264Cabac.encodeMbTypeB(e, cc.bTypeCond(mbX, mbY), 1 + dir)
        cc.markInter(mbAddr)
        if (dir != 1 && numRef0 > 1) {
          H264Cabac.encodeRefIdx(e, cc.refIdxInc(0, bx4, by4), r0)
          cc.setRefCtx(0, bx4, by4, 4, 4, r0)
        }
        if (dir != 0 && numRef1 > 1) {
          H264Cabac.encodeRefIdx(e, cc.refIdxInc(1, bx4, by4), r1)
          cc.setRefCtx(1, bx4, by4, 4, 4, r1)
        }
        if (dir != 1) {
          val (p0x, p0y) = grid0.mvPred(bx4, by4, 4, 4, 0, r0)
          val dX = m0._1 - p0x; val dY = m0._2 - p0y
          H264Cabac.encodeMvd(e, 0, cc.mvdInc(0, 0, bx4, by4), dX)
          H264Cabac.encodeMvd(e, 1, cc.mvdInc(0, 1, bx4, by4), dY)
          cc.setMvd(0, bx4, by4, 4, 4, dX, dY)
          grid0.set(bx4, by4, 4, 4, m0._1, m0._2, r0)
        } else grid0.markDone(bx4, by4, 4, 4)
        if (dir != 0) {
          val (p1x, p1y) = grid1.mvPred(bx4, by4, 4, 4, 0, r1)
          val dX = m1._1 - p1x; val dY = m1._2 - p1y
          H264Cabac.encodeMvd(e, 0, cc.mvdInc(1, 0, bx4, by4), dX)
          H264Cabac.encodeMvd(e, 1, cc.mvdInc(1, 1, bx4, by4), dY)
          cc.setMvd(1, bx4, by4, 4, 4, dX, dY)
          grid1.set(bx4, by4, 4, 4, m1._1, m1._2, r1)
        } else grid1.markDone(bx4, by4, 4, 4)
        H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY),
          cc.cbpOf(mbX, mbY - 1), 0)
        cc.cbp(mbAddr) = 0
        cc.prevQpDeltaNZ = false
        e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0)
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** All-P_Skip slice payload: one mb_skip_run covering the picture —
    * the §8.4.1.1 predicted-motion copy of the reference.
    */
  def encodePSkipFrame(mbW: Int, mbH: Int, qp: Int = 26,
      weights: Option[PredWeights] = None): Array[Byte] = {
    val w = new H264.BitWriter
    pSliceHeader(w, qp, weights = weights)
    w.ue(mbW * mbH) // mb_skip_run = whole picture
    H264.ebsp(w.stop())
  }

  /** CABAC twin of [[encodeP16x16]] (r9 inter entropy tier): every MB
    * P_L0_16x16 with the given quarter-pel motion and zero residual,
    * arithmetic-coded — mb_skip_flag 0, the P mb_type binarization,
    * UEG3 mvds against the decoder's own context derivations
    * ([[H264Cabac.IntraCtxTrack]] is shared, so drift is structurally
    * impossible), cbp 0, a terminate after every MB. `initIdc` selects
    * the cabac_init_idc context column (0..2), exercised across all
    * three by H264CabacSpec.
    */
  def encodeCabacP16x16(mvs: Array[Array[(Int, Int)]], qp: Int = 26,
      initIdc: Int = 0, poc: Int = 0,
      weights: Option[PredWeights] = None,
      deblock: Boolean = false): Array[Byte] = {
    val mbH = mvs.length; val mbW = mvs.head.length
    require(mvs.forall(_.length == mbW), "ragged mvs")
    require(initIdc >= 0 && initIdc <= 2, s"bad cabac_init_idc $initIdc")
    val w = new H264.BitWriter
    pSliceHeader(w, qp, cabacInitIdc = initIdc, poc = poc, weights = weights,
      deblock = deblock)
    w.alignOne() // cabac_alignment_one_bit (§7.3.4)
    val e = new H264Cabac.Encoder(w,
      new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc)))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    val grid = new H264Inter.MvGrid(mbW, mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mbAddr = mbY * mbW + mbX
        grid.markMb(mbAddr)
        H264Cabac.encodeMbSkip(e, cc.skipCond(mbX, mbY), 0)
        H264Cabac.encodeMbTypeP(e, 0) // P_L0_16x16
        cc.markInter(mbAddr)
        val (mx, my) = mvs(mbY)(mbX)
        val (p0x, p0y) = grid.mvPred(mbX * 4, mbY * 4, 4, 4, 0)
        val mvdX = mx - p0x; val mvdY = my - p0y
        H264Cabac.encodeMvd(e, 0, cc.mvdInc(0, 0, mbX * 4, mbY * 4), mvdX)
        H264Cabac.encodeMvd(e, 1, cc.mvdInc(0, 1, mbX * 4, mbY * 4), mvdY)
        cc.setMvd(0, mbX * 4, mbY * 4, 4, 4, mvdX, mvdY)
        grid.set(mbX * 4, mbY * 4, 4, 4, mx, my, 0)
        H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY),
          cc.cbpOf(mbX, mbY - 1), 0)
        cc.cbp(mbAddr) = 0
        cc.prevQpDeltaNZ = false // mb_qp_delta absent when cbp == 0
        e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0) // end_of_slice
        mbX += 1
      }
      mbY += 1
    }
    H264.ebsp(w.stop())
  }

  /** CABAC all-skip P frame: mb_skip_flag 1 + end_of_slice terminate
    * per MB (CABAC has no skip runs).
    */
  def encodeCabacPSkipFrame(mbW: Int, mbH: Int, qp: Int = 26,
      initIdc: Int = 0): Array[Byte] = {
    require(initIdc >= 0 && initIdc <= 2, s"bad cabac_init_idc $initIdc")
    val w = new H264.BitWriter
    pSliceHeader(w, qp, cabacInitIdc = initIdc)
    w.alignOne()
    val e = new H264Cabac.Encoder(w,
      new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc)))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    var mbAddr = 0
    while (mbAddr < mbW * mbH) {
      H264Cabac.encodeMbSkip(e, cc.skipCond(mbAddr % mbW, mbAddr / mbW), 1)
      cc.markSkip(mbAddr)
      e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0)
      mbAddr += 1
    }
    H264.ebsp(w.stop())
  }

  private def mbPad(plane: Array[Byte], w: Int, h: Int, mbDim: Int): (Array[Byte], Int, Int) = {
    val pw = (w + mbDim - 1) / mbDim * mbDim
    val ph = (h + mbDim - 1) / mbDim * mbDim
    val out = new Array[Byte](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        out(y * pw + x) = plane(sy * w + math.min(x, w - 1))
        x += 1
      }
      y += 1
    }
    (out, pw, ph)
  }

  /** All-I_PCM encode of 4:2:0 planes (luma w×h; cb/cr (w/2)×(h/2)).
    * `width`/`height` must be even (4:2:0); non-multiple-of-16 dims pad
    * by edge replication and crop via the SPS.
    */
  def encodeIPcm(luma: Array[Byte], cb: Array[Byte], cr: Array[Byte],
      width: Int, height: Int): Array[Byte] = {
    require(luma.length == width * height, "luma plane size mismatch")
    require(cb.length == width / 2 * (height / 2) && cr.length == cb.length,
      "chroma plane size mismatch (4:2:0)")
    val (yP, yw, yh) = mbPad(luma, width, height, 16)
    val (bP, cw, _) = mbPad(cb, width / 2, height / 2, 8)
    val (rP, _, _) = mbPad(cr, width / 2, height / 2, 8)
    val mbW = yw / 16; val mbH = yh / 16
    val w = new H264.BitWriter
    sliceHeader(w, qp = 26)
    var mb = 0
    while (mb < mbW * mbH) {
      val mbX = mb % mbW; val mbY = mb / mbW
      w.ue(25) // I_PCM
      w.alignZero()
      var i = 0
      while (i < 256) {
        w.u(yP((mbY * 16 + i / 16) * yw + mbX * 16 + i % 16) & 0xff, 8); i += 1
      }
      i = 0
      while (i < 64) {
        w.u(bP((mbY * 8 + i / 8) * cw + mbX * 8 + i % 8) & 0xff, 8); i += 1
      }
      i = 0
      while (i < 64) {
        w.u(rP((mbY * 8 + i / 8) * cw + mbX * 8 + i % 8) & 0xff, 8); i += 1
      }
      mb += 1
    }
    annexB(Seq(
      (7, 3, H264.writeSps(width, height)),
      (8, 3, H264.writePps()),
      (5, 3, H264.ebsp(w.stop()))))
  }

  /** I_16x16/DC encode: one luma level per macroblock. `mbMeans(mbY)(mbX)`
    * is the target mean luma; the encoder replicates the decoder's DC
    * prediction recursion and picks the CAVLC DC level whose
    * reconstruction lands closest. Chroma is predicted-DC with no
    * residual (uniform gray). Returns (stream, expected) where `expected`
    * is the exact per-MB reconstructed luma constant the decoder must
    * produce.
    */
  def encodeI16x16Dc(mbMeans: Array[Array[Int]], qp: Int = 26,
      weightedPred: Boolean = false,
      weightedBipredIdc: Int = 0,
      numRefFrames: Int = 1,
      deblock: Boolean = false,
      longTermRef: Boolean = false): (Array[Byte], Array[Array[Int]]) = {
    val mbH = mbMeans.length; val mbW = mbMeans.head.length
    require(mbMeans.forall(_.length == mbW), "ragged mbMeans")
    require(qp >= 0 && qp <= 51, s"bad qp $qp")
    val w = new H264.BitWriter
    sliceHeader(w, qp, deblock = deblock, longTermRef = longTermRef)
    val recon = Array.ofDim[Int](mbH, mbW)
    val scale0 = Array(10, 11, 13, 14, 16, 18)(qp % 6)

    /** decoder's §8.5.10 DC chain for a single level L at scan pos 0:
      * per-pixel residual after Hadamard/dequant/IDCT rounding.
      */
    def pixelDelta(level: Int): Int = {
      val dc =
        if (qp >= 36) (level * scale0) << (qp / 6 - 6)
        else (level * scale0 + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      (dc + 32) >> 6
    }

    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        // decoder's 16x16 DC prediction from reconstructed neighbors:
        // whole rows/columns of constant-valued MBs
        val availL = mbX > 0; val availT = mbY > 0
        val pred =
          if (availL && availT) ((recon(mbY)(mbX - 1) + recon(mbY - 1)(mbX)) * 16 + 16) >> 5
          else if (availT) recon(mbY - 1)(mbX)
          else if (availL) recon(mbY)(mbX - 1)
          else 128
        val want = mbMeans(mbY)(mbX) - pred
        // smallest |level| whose reconstruction is nearest the target
        // (±4000 spans the full ±255 delta range even at qp 26, where one
        // level step moves the pixel by ~0.05 — also exercises the CAVLC
        // level escape codes with realistic large DC levels)
        var best = 0; var bestErr = math.abs(pixelDelta(0) - want)
        var l = -4000
        while (l <= 4000) {
          val e = math.abs(pixelDelta(l) - want)
          if (e < bestErr || (e == bestErr && math.abs(l) < math.abs(best))) {
            best = l; bestErr = e
          }
          l += 1
        }
        recon(mbY)(mbX) = math.max(0, math.min(255, pred + pixelDelta(best)))

        w.ue(3) // mb_type: I_16x16, predMode DC(2), cbpChroma 0, cbpLuma 0
        w.ue(0) // intra_chroma_pred_mode: DC
        w.se(0) // mb_qp_delta
        // Intra16x16DCLevel: single coefficient at scan position 0.
        // nC: all AC totalCoeffs are 0 in this stream, so nC = 0
        val coeffs = new Array[Int](16)
        coeffs(0) = best
        H264Cavlc.encodeResidualBlock(w, coeffs, nC = 0)
        // cbp = 0: no AC blocks, no chroma residual
        mbX += 1
      }
      mbY += 1
    }
    val stream = annexB(Seq(
      (7, 3, H264.writeSps(mbW * 16, mbH * 16, numRefFrames = numRefFrames)),
      (8, 3, H264.writePps(weightedPred = weightedPred,
        weightedBipredIdc = weightedBipredIdc)),
      (5, 3, H264.ebsp(w.stop()))))
    (stream, recon)
  }

  /** CABAC twin of [[encodeI16x16Dc]] (r8 intra CABAC tier): the same
    * per-MB DC-level search and reconstruction recursion, entropy-coded
    * through the §9.3 arithmetic engine — mb_type / chroma mode /
    * mb_qp_delta / Intra16x16DC residual as context-coded bins, an
    * end_of_slice_flag terminate after every MB, and the SAME
    * [[H264Cabac.IntraCtxTrack]] neighbor bookkeeping the decoder runs
    * (shared class: context drift is structurally impossible). Returns
    * (Annex-B stream, expected per-MB reconstructed luma).
    */
  def encodeCabacI16x16Dc(mbMeans: Array[Array[Int]], qp: Int = 26,
      weightedPred: Boolean = false,
      weightedBipredIdc: Int = 0,
      numRefFrames: Int = 1,
      deblock: Boolean = false,
      longTermRef: Boolean = false): (Array[Byte], Array[Array[Int]]) = {
    val mbH = mbMeans.length; val mbW = mbMeans.head.length
    require(mbMeans.forall(_.length == mbW), "ragged mbMeans")
    require(qp >= 0 && qp <= 51, s"bad qp $qp")
    val w = new H264.BitWriter
    sliceHeader(w, qp, deblock = deblock, longTermRef = longTermRef)
    w.alignOne() // cabac_alignment_one_bit (§7.3.4)
    val e = new H264Cabac.Encoder(w, new H264Cabac.Contexts(qp))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    val recon = Array.ofDim[Int](mbH, mbW)
    val scale0 = Array(10, 11, 13, 14, 16, 18)(qp % 6)
    def pixelDelta(level: Int): Int = {
      val dc =
        if (qp >= 36) (level * scale0) << (qp / 6 - 6)
        else (level * scale0 + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      (dc + 32) >> 6
    }
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val availL = mbX > 0; val availT = mbY > 0
        val pred =
          if (availL && availT) ((recon(mbY)(mbX - 1) + recon(mbY - 1)(mbX)) * 16 + 16) >> 5
          else if (availT) recon(mbY - 1)(mbX)
          else if (availL) recon(mbY)(mbX - 1)
          else 128
        val want = mbMeans(mbY)(mbX) - pred
        var best = 0; var bestErr = math.abs(pixelDelta(0) - want)
        var l = -4000
        while (l <= 4000) {
          val err = math.abs(pixelDelta(l) - want)
          if (err < bestErr || (err == bestErr && math.abs(l) < math.abs(best))) {
            best = l; bestErr = err
          }
          l += 1
        }
        recon(mbY)(mbX) = math.max(0, math.min(255, pred + pixelDelta(best)))

        val mbAddr = mbY * mbW + mbX
        // mb_type 3: I_16x16, DC pred, cbpChroma 0, cbpLuma 0
        H264Cabac.encodeMbTypeI(e, cc.mbTypeCond(mbX, mbY), 3)
        cc.markI16(mbAddr)
        cc.cbp(mbAddr) = 0
        H264Cabac.encodeChromaPredMode(e, cc.chromaModeCondA(mbX, mbY),
          cc.chromaModeCondB(mbX, mbY), 0)
        cc.chromaNZ(mbAddr) = false
        H264Cabac.encodeQpDelta(e, cc.prevQpDeltaNZ, 0)
        cc.prevQpDeltaNZ = false
        val coeffs = new Array[Int](16)
        coeffs(0) = best
        val tc = H264Cabac.encodeResidual(e, 0, coeffs,
          cc.lumaDcInc(mbX, mbY))
        cc.cbfLDc(mbAddr) = tc > 0
        // cbpLuma 0, cbpChroma 0: no AC / chroma residual syntax
        e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0) // end_of_slice
        mbX += 1
      }
      mbY += 1
    }
    val stream = annexB(Seq(
      (7, 3, H264.writeSps(mbW * 16, mbH * 16, numRefFrames = numRefFrames)),
      (8, 3, H264.writePps(cabac = true, weightedPred = weightedPred,
        weightedBipredIdc = weightedBipredIdc)),
      (5, 3, H264.ebsp(w.stop()))))
    (stream, recon)
  }

  /** CABAC twin of [[encodeI4x4Modes]]: caller-chosen I_4x4 prediction
    * modes, zero residual, arithmetic-coded.
    */
  // ---------------------------------------- r12: multi-slice + P_8x8

  /** Multi-slice I_16x16-DC IDR picture (r12): the [[encodeI16x16Dc]]
    * DC-level search, with the picture carved into `sliceStarts`
    * slices (MB addresses, first must be 0) — each slice its own NAL
    * with its own header, entropy state (fresh CABAC engine/contexts
    * per slice when `cabac`) and §6.4 availability epoch: the
    * DC prediction of a slice's first MBs must NOT see earlier
    * slices' reconstructions, exactly as the decoder derives it.
    * Returns (stream, expected per-MB recon).
    */
  def encodeI16x16DcSlices(mbMeans: Array[Array[Int]], qp: Int = 26,
      sliceStarts: Seq[Int] = Seq(0),
      cabac: Boolean = false): (Array[Byte], Array[Array[Int]]) = {
    val mbH = mbMeans.length; val mbW = mbMeans.head.length
    require(mbMeans.forall(_.length == mbW), "ragged mbMeans")
    require(qp >= 0 && qp <= 51, s"bad qp $qp")
    val nMb = mbW * mbH
    require(sliceStarts.nonEmpty && sliceStarts.head == 0 &&
      sliceStarts == sliceStarts.sorted && sliceStarts.distinct == sliceStarts &&
      sliceStarts.forall(a => a >= 0 && a < nMb), "bad sliceStarts")
    val bounds = sliceStarts :+ nMb
    def sliceOf(addr: Int): Int = bounds.lastIndexWhere(_ <= addr, bounds.size - 2)
    val recon = Array.ofDim[Int](mbH, mbW)
    val scale0 = Array(10, 11, 13, 14, 16, 18)(qp % 6)
    def pixelDelta(level: Int): Int = {
      val dc =
        if (qp >= 36) (level * scale0) << (qp / 6 - 6)
        else (level * scale0 + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      (dc + 32) >> 6
    }
    val sliceNals = (0 until sliceStarts.size).map { si =>
      val begin = bounds(si); val endEx = bounds(si + 1)
      val w = new H264.BitWriter
      sliceHeader(w, qp, firstMb = begin)
      if (cabac) w.alignOne()
      val e = if (cabac) new H264Cabac.Encoder(w, new H264Cabac.Contexts(qp))
        else null
      val cc = if (cabac) new H264Cabac.IntraCtxTrack(mbW, mbH) else null
      var addr = begin
      while (addr < endEx) {
        val mbX = addr % mbW; val mbY = addr / mbW
        // availability = decoded AND same slice (§6.4, the r12 rule)
        val availL = mbX > 0 && sliceOf(addr - 1) == si
        val availT = mbY > 0 && sliceOf(addr - mbW) == si
        val pred =
          if (availL && availT)
            ((recon(mbY)(mbX - 1) + recon(mbY - 1)(mbX)) * 16 + 16) >> 5
          else if (availT) recon(mbY - 1)(mbX)
          else if (availL) recon(mbY)(mbX - 1)
          else 128
        val want = mbMeans(mbY)(mbX) - pred
        var best = 0; var bestErr = math.abs(pixelDelta(0) - want)
        var l = -4000
        while (l <= 4000) {
          val err = math.abs(pixelDelta(l) - want)
          if (err < bestErr || (err == bestErr && math.abs(l) < math.abs(best))) {
            best = l; bestErr = err
          }
          l += 1
        }
        recon(mbY)(mbX) = math.max(0, math.min(255, pred + pixelDelta(best)))
        val coeffs = new Array[Int](16)
        coeffs(0) = best
        if (!cabac) {
          w.ue(3) // I_16x16, DC, cbp 0
          w.ue(0) // intra_chroma_pred_mode: DC
          w.se(0) // mb_qp_delta
          H264Cavlc.encodeResidualBlock(w, coeffs, nC = 0)
        } else {
          H264Cabac.encodeMbTypeI(e, cc.mbTypeCond(mbX, mbY), 3)
          cc.markI16(addr)
          cc.cbp(addr) = 0
          H264Cabac.encodeChromaPredMode(e, cc.chromaModeCondA(mbX, mbY),
            cc.chromaModeCondB(mbX, mbY), 0)
          cc.chromaNZ(addr) = false
          H264Cabac.encodeQpDelta(e, cc.prevQpDeltaNZ, 0)
          cc.prevQpDeltaNZ = false
          val tc = H264Cabac.encodeResidual(e, 0, coeffs,
            cc.lumaDcInc(mbX, mbY))
          cc.cbfLDc(addr) = tc > 0
          e.terminate(if (addr == endEx - 1) 1 else 0) // end_of_slice
        }
        addr += 1
      }
      H264.ebsp(w.stop())
    }
    val stream = annexB(
      Seq((7, 3, H264.writeSps(mbW * 16, mbH * 16)),
        (8, 3, H264.writePps(cabac = cabac))) ++
        sliceNals.map(p => (5, 3, p)))
    (stream, recon)
  }

  /** One P_8x8 macroblock's content: four Table 7-17 sub_mb_types and
    * the quarter-pel mv per sub-partition, flat in sub-block order.
    */
  final case class P8x8Mb(subTypes: Seq[Int], mvs: Seq[(Int, Int)]) {
    require(subTypes.size == 4 && subTypes.forall(t => t >= 0 && t <= 3),
      s"bad subTypes $subTypes")
    require(mvs.size == subTypes.map(Seq(1, 2, 2, 4)).sum,
      "one mv per sub-partition")
  }

  /** P-slice payload(s) of all-P_8x8 macroblocks with zero residual
    * (r12) — sub_mb_type per 8x8, per-sub-partition mvds derived from
    * the SAME slice-aware [[H264Inter.MvGrid]] the decoder runs, in
    * both entropy codings, optionally carved into `sliceStarts`
    * slices. Emits the slice NALs only (callers assemble GOPs, the
    * encodeP16x16 convention lifted to pictures-as-NAL-lists).
    */
  def encodeP8x8Slices(mbs: Array[Array[P8x8Mb]], qp: Int = 26,
      poc: Int = 0, sliceStarts: Seq[Int] = Seq(0),
      cabac: Boolean = false, initIdc: Int = 0): Seq[Array[Byte]] = {
    val mbH = mbs.length; val mbW = mbs.head.length
    require(mbs.forall(_.length == mbW), "ragged mbs")
    val nMb = mbW * mbH
    require(sliceStarts.nonEmpty && sliceStarts.head == 0 &&
      sliceStarts == sliceStarts.sorted && sliceStarts.distinct == sliceStarts &&
      sliceStarts.forall(a => a >= 0 && a < nMb), "bad sliceStarts")
    val bounds = sliceStarts :+ nMb
    val grid = new H264Inter.MvGrid(mbW, mbH)
    (0 until sliceStarts.size).map { si =>
      val begin = bounds(si); val endEx = bounds(si + 1)
      grid.curSlice = si // decoder-twin slice epoch (availability gate)
      val w = new H264.BitWriter
      pSliceHeader(w, qp, cabacInitIdc = if (cabac) initIdc else -1,
        poc = poc, firstMb = begin)
      if (cabac) w.alignOne()
      val e = if (cabac) new H264Cabac.Encoder(w,
        new H264Cabac.Contexts(qp, H264Cabac.ctxInitP(initIdc))) else null
      val cc = if (cabac) new H264Cabac.IntraCtxTrack(mbW, mbH) else null
      var addr = begin
      while (addr < endEx) {
        val mbX = addr % mbW; val mbY = addr / mbW
        val bx4 = mbX * 4; val by4 = mbY * 4
        grid.markMb(addr)
        val mb = mbs(mbY)(mbX)
        if (!cabac) {
          w.ue(0) // mb_skip_run
          w.ue(3) // mb_type: P_8x8
          mb.subTypes.foreach(w.ue)
        } else {
          H264Cabac.encodeMbSkip(e, cc.skipCond(mbX, mbY), 0)
          cc.markInter(addr)
          H264Cabac.encodeMbTypeP(e, 3)
          mb.subTypes.foreach(t => H264Cabac.encodePSubMbType(e, t))
        }
        // (numRef0 == 1: no ref_idx syntax — te(v) absent / no bins)
        var mvIdx = 0
        var i = 0
        while (i < 4) {
          val ox = (i % 2) * 2; val oy = (i / 2) * 2
          val (n, sw, sh) = H264Decode.pSubMbInfo(mb.subTypes(i))
          H264Decode.bSubPartOffsets(n, sw, sh).foreach { case (sx, sy) =>
            val x4 = bx4 + ox + sx; val y4 = by4 + oy + sy
            val (mx, my) = mb.mvs(mvIdx); mvIdx += 1
            val (p0x, p0y) = grid.mvPred(x4, y4, sw, sh, 0, 0)
            if (!cabac) { w.se(mx - p0x); w.se(my - p0y) }
            else {
              H264Cabac.encodeMvd(e, 0, cc.mvdInc(0, 0, x4, y4), mx - p0x)
              H264Cabac.encodeMvd(e, 1, cc.mvdInc(0, 1, x4, y4), my - p0y)
              cc.setMvd(0, x4, y4, sw, sh, mx - p0x, my - p0y)
            }
            grid.set(x4, y4, sw, sh, mx, my, 0)
          }
          i += 1
        }
        if (!cabac) w.ue(H264Inter.cbpInterToCodeNum(0)) // cbp 0
        else {
          H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY),
            cc.cbpOf(mbX, mbY - 1), 0)
          cc.cbp(addr) = 0
          cc.prevQpDeltaNZ = false
          e.terminate(if (addr == endEx - 1) 1 else 0)
        }
        addr += 1
      }
      H264.ebsp(w.stop())
    }
  }

  def encodeCabacI4x4Modes(modes: Array[Array[Array[Int]]], qp: Int = 26): Array[Byte] = {
    val mbH = modes.length; val mbW = modes.head.length
    val w = new H264.BitWriter
    sliceHeader(w, qp)
    w.alignOne()
    val e = new H264Cabac.Encoder(w, new H264Cabac.Contexts(qp))
    val cc = new H264Cabac.IntraCtxTrack(mbW, mbH)
    val blockModes = Array.fill(mbH * 4, mbW * 4)(-1)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mbAddr = mbY * mbW + mbX
        H264Cabac.encodeMbTypeI(e, cc.mbTypeCond(mbX, mbY), 0) // I_4x4
        cc.markI4(mbAddr)
        var b = 0
        while (b < 16) {
          val (x4r, y4r) = H264Decode.blockScan(b)
          val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
          val leftAvail = ax4 > 0
          val topAvail = ay4 > 0
          val mA = if (!leftAvail) -1
            else { val m = blockModes(ay4)(ax4 - 1); if (m < 0) 2 else m }
          val mB = if (!topAvail) -1
            else { val m = blockModes(ay4 - 1)(ax4); if (m < 0) 2 else m }
          val predMode = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
          val mode = modes(mbY)(mbX)(b)
          H264Cabac.encodeIntra4x4Mode(e, predMode, mode)
          blockModes(ay4)(ax4) = mode
          b += 1
        }
        H264Cabac.encodeChromaPredMode(e, cc.chromaModeCondA(mbX, mbY),
          cc.chromaModeCondB(mbX, mbY), 0)
        cc.chromaNZ(mbAddr) = false
        H264Cabac.encodeCbp(e, cc.cbpOf(mbX - 1, mbY),
          cc.cbpOf(mbX, mbY - 1), 0)
        cc.cbp(mbAddr) = 0
        // cbp 0: no mb_qp_delta, no residual
        e.terminate(if (mbAddr == mbW * mbH - 1) 1 else 0)
        mbX += 1
      }
      mbY += 1
    }
    annexB(Seq(
      (7, 3, H264.writeSps(mbW * 16, mbH * 16)),
      (8, 3, H264.writePps(cabac = true)),
      (5, 3, H264.ebsp(w.stop()))))
  }

  /** I_4x4 encode with caller-chosen per-block prediction modes and ZERO
    * residual: reconstruction is pure spatial prediction. `modes(mbY)(mbX)`
    * holds 16 mode indices (0–8) in §6.4.3 block scan order. The encoder
    * replicates the decoder's §8.3.1.1 most-probable-mode derivation to
    * emit prev/rem syntax. Callers must respect availability (mode 0
    * needs a top neighbor etc.) — the decoder enforces it.
    */
  def encodeI4x4Modes(modes: Array[Array[Array[Int]]], qp: Int = 26): Array[Byte] = {
    val mbH = modes.length; val mbW = modes.head.length
    val w = new H264.BitWriter
    sliceHeader(w, qp)
    // absolute per-4x4-block modes for predictor derivation
    val blockModes = Array.fill(mbH * 4, mbW * 4)(-1)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        w.ue(0) // I_4x4
        var b = 0
        while (b < 16) {
          val (x4r, y4r) = H264Decode.blockScan(b)
          val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
          val leftAvail = ax4 > 0
          val topAvail = ay4 > 0
          val mA = if (!leftAvail) -1
            else { val m = blockModes(ay4)(ax4 - 1); if (m < 0) 2 else m }
          val mB = if (!topAvail) -1
            else { val m = blockModes(ay4 - 1)(ax4); if (m < 0) 2 else m }
          val predMode = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
          val mode = modes(mbY)(mbX)(b)
          if (mode == predMode) w.flag(true)
          else {
            w.flag(false)
            w.u(if (mode < predMode) mode else mode - 1, 3)
          }
          blockModes(ay4)(ax4) = mode
          b += 1
        }
        w.ue(0) // intra_chroma_pred_mode: DC
        w.ue(H264Decode.cbpIntraToCodeNum(0)) // coded_block_pattern = 0
        // cbp == 0: no mb_qp_delta, no residual
        mbX += 1
      }
      mbY += 1
    }
    annexB(Seq(
      (7, 3, H264.writeSps(mbW * 16, mbH * 16)),
      (8, 3, H264.writePps()),
      (5, 3, H264.ebsp(w.stop()))))
  }
}
