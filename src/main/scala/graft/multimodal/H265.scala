package graft.multimodal

/** H.265/HEVC PROBE tier (ITU-T H.265): NAL framing, SPS parse down to
  * exact coded dimensions / chroma format / bit depths, minimal
  * VPS/SPS/PPS writers (round-trip-pinned), hvcC
  * (HEVCDecoderConfigurationRecord, ISO/IEC 14496-15 §8.3.3.1) parse,
  * and IRAP keyframe payload extraction for compressed-domain dedup.
  * Pixel decode of HEVC slice data is OUT of scope — it stays behind
  * the injectable FrameDecoder boundary ([[Multimodal]]), exactly as
  * the H.264 tier began (probe → keyframe dedup → pixel tiers).
  *
  * Reuses [[H264]]'s BitReader/BitWriter and EBSP↔RBSP (the §7.3/§9.1
  * Exp-Golomb and emulation-prevention layers are identical between
  * the two specs); only the NAL header (2 bytes in HEVC) and the
  * parameter-set syntax differ.
  */
object H265 {

  /** HEVC NAL: 2-byte header — forbidden_zero(1) nal_unit_type(6)
    * nuh_layer_id(6) nuh_temporal_id_plus1(3) (§7.3.1.2).
    */
  final case class Nal(nalType: Int, layerId: Int, tidPlus1: Int,
      payload: Array[Byte])

  /** IRAP picture NAL types (§7.4.2.2): BLA 16..18, IDR 19..20, CRA 21
    * (+ reserved IRAP 22..23).
    */
  def isIrap(nalType: Int): Boolean = nalType >= 16 && nalType <= 23

  val NalVps = 32
  val NalSps = 33
  val NalPps = 34
  val NalIdrWRadl = 19
  val NalTrailR = 1
  val NalTrailN = 0 // sub-layer non-reference trailing picture

  /** Scan an Annex-B HEVC stream (§B.2): same start codes as H.264,
    * 2-byte NAL headers. Leading garbage tolerated; Nil for none.
    */
  def nalUnitsAnnexB(bytes: Array[Byte]): Seq[Nal] = {
    val out = Seq.newBuilder[Nal]
    var i = 0
    val n = bytes.length
    def isStart(p: Int): Int =
      if (p + 2 < n && bytes(p) == 0 && bytes(p + 1) == 0 && bytes(p + 2) == 1) 3
      else if (p + 3 < n && bytes(p) == 0 && bytes(p + 1) == 0 &&
        bytes(p + 2) == 0 && bytes(p + 3) == 1) 4
      else 0
    while (i < n && isStart(i) == 0) i += 1
    while (i < n) {
      val sc = isStart(i)
      if (sc == 0) return out.result()
      val begin = i + sc
      var j = begin
      while (j < n && isStart(j) == 0) j += 1
      if (begin + 1 < j) out += mkNal(bytes, begin, j - begin)
      i = j
    }
    out.result()
  }

  /** Length-prefixed (mp4 `hvc1`/`hev1` sample) NAL scan. */
  def nalUnitsHvcc(bytes: Array[Byte], lengthSize: Int = 4): Seq[Nal] = {
    require(lengthSize >= 1 && lengthSize <= 4, s"bad lengthSize $lengthSize")
    val out = Seq.newBuilder[Nal]
    var i = 0
    val n = bytes.length
    while (i + lengthSize <= n) {
      var len = 0L
      var k = 0
      while (k < lengthSize) { len = (len << 8) | (bytes(i + k) & 0xffL); k += 1 }
      i += lengthSize
      if (len < 2 || i + len > n) return out.result()
      out += mkNal(bytes, i, len.toInt)
      i += len.toInt
    }
    out.result()
  }

  private def mkNal(bytes: Array[Byte], off: Int, len: Int): Nal = {
    val h0 = bytes(off) & 0xff; val h1 = bytes(off + 1) & 0xff
    Nal((h0 >> 1) & 0x3f, ((h0 & 1) << 5) | (h1 >> 3), h1 & 7,
      java.util.Arrays.copyOfRange(bytes, off + 2, off + len))
  }

  /** The 2-byte NAL header for (type, layer 0, temporal id 0). */
  def nalHeader(nalType: Int): Array[Byte] =
    Array(((nalType & 0x3f) << 1).toByte, 0x01.toByte)

  /** Probed SPS facts (§7.3.2.2.1): `width`/`height` are the CROPPED
    * (conformance-window-applied) display dimensions.
    */
  final case class SpsInfo(profileIdc: Int, tierFlag: Boolean, levelIdc: Int,
      spsId: Int, chromaFormatIdc: Int, width: Int, height: Int,
      bitDepthLuma: Int, bitDepthChroma: Int, log2MaxPocLsb: Int,
      // r11 pixel-tier fields (defaults = the probe writer's values);
      // `deep` is false when the probe bailed before reading them
      deep: Boolean = false,
      minCbLog2: Int = 3, ctbLog2: Int = 5,
      minTbLog2: Int = 2, maxTbLog2: Int = 5,
      maxTrafoDepthIntra: Int = 0,
      scalingList: Boolean = false, ampEnabled: Boolean = false,
      saoEnabled: Boolean = false,
      pcmEnabled: Boolean = false, pcmBitDepth: Int = 8,
      pcmMinLog2: Int = 3, pcmMaxLog2: Int = 3,
      pcmLoopFilterDisabled: Boolean = false,
      strongIntraSmoothing: Boolean = false,
      // r12 tier-3 (inter) fields
      maxTrafoDepthInter: Int = 0, temporalMvp: Boolean = false,
      // §7.4.3.2.1 sps_max_dec_pic_buffering_minus1 + 1 for the highest
      // sub-layer, clamped to the level-limit ceiling of 16 (r14): the
      // decode-order reference FIFO is sized from this, so a conformant
      // stream whose RPS reaches deeper than the old fixed 8 decodes
      // instead of truncating. Default 8 = the old cap, kept for probe-
      // only (non-deep) parses.
      maxDecPicBuffering: Int = 8)

  /** profile_tier_level (§7.3.3): fixed 96-bit general block + optional
    * per-sub-layer blocks. Returns (profileIdc, tier, levelIdc).
    */
  private def readProfileTierLevel(r: H264.BitReader,
      maxSubLayersMinus1: Int): (Int, Boolean, Int) = {
    r.u(2) // general_profile_space
    val tier = r.flag()
    val profile = r.u(5)
    r.u(32) // general_profile_compatibility_flags
    r.u(32); r.u(16) // progressive/interlaced/non_packed/frame_only + 44 reserved
    val level = r.u(8)
    val profPresent = new Array[Boolean](maxSubLayersMinus1)
    val levelPresent = new Array[Boolean](maxSubLayersMinus1)
    var i = 0
    while (i < maxSubLayersMinus1) {
      profPresent(i) = r.flag(); levelPresent(i) = r.flag(); i += 1
    }
    if (maxSubLayersMinus1 > 0) {
      i = maxSubLayersMinus1
      while (i < 8) { r.u(2); i += 1 } // reserved_zero_2bits
    }
    i = 0
    while (i < maxSubLayersMinus1) {
      if (profPresent(i)) { r.u(32); r.u(32); r.u(24) } // 88-bit sub-layer profile
      if (levelPresent(i)) r.u(8)
      i += 1
    }
    (profile, tier, level)
  }

  /** Parse an SPS NAL payload (EBSP, 2-byte header stripped) down to
    * the probe facts; None on malformed/out-of-scope input.
    */
  def parseSps(payload: Array[Byte]): Option[SpsInfo] =
    try {
      val r = new H264.BitReader(H264.rbsp(payload))
      r.u(4) // sps_video_parameter_set_id
      val maxSub = r.u(3) // sps_max_sub_layers_minus1
      r.flag() // sps_temporal_id_nesting_flag
      val (profile, tier, level) = readProfileTierLevel(r, maxSub)
      val spsId = r.ue()
      val chroma = r.ue()
      if (chroma > 3) return None
      if (chroma == 3) r.flag() // separate_colour_plane_flag
      val w = r.ue(); val h = r.ue()
      if (w <= 0 || h <= 0 || w > 16888 || h > 16888) return None
      var (cl, cr, ct, cb) = (0, 0, 0, 0)
      if (r.flag()) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
      val bdl = 8 + r.ue()
      val bdc = 8 + r.ue()
      val pocBits = 4 + r.ue()
      if (pocBits > 16) return None
      // SubWidthC/SubHeightC (Table 6-1): 4:2:0 → 2/2, 4:2:2 → 2/1
      val swc = if (chroma == 1 || chroma == 2) 2 else 1
      val shc = if (chroma == 1) 2 else 1
      val width = w - swc * (cl + cr)
      val height = h - shc * (ct + cb)
      if (width <= 0 || height <= 0) return None
      val base = SpsInfo(profile, tier, level, spsId, chroma, width, height,
        bdl, bdc, pocBits)
      // r11 pixel tier: continue into the coding-structure fields. A
      // malformed tail keeps the probe-level info (deep = false) — the
      // pixel decoder requires deep = true.
      try {
        // sps_max_dec_pic_buffering_minus1: when per-sub-layer values
        // are present, the HIGHEST sub-layer's entry governs the whole
        // sequence (§7.4.3.2.1) — that is the one the DPB is sized from
        // (r14, advice item: a fixed 8-deep FIFO truncated conformant
        // streams whose RPS reaches a 9th-back picture)
        var decPicBufM1 = 0
        if (r.flag()) { // sps_sub_layer_ordering_info_present
          var i = 0
          while (i <= maxSub) { decPicBufM1 = r.ue(); r.ue(); r.ue(); i += 1 }
        } else { decPicBufM1 = r.ue(); r.ue(); r.ue() }
        val minCb = 3 + r.ue()
        val ctb = minCb + r.ue()
        val minTb = 2 + r.ue()
        val maxTb = minTb + r.ue()
        if (ctb > 6 || maxTb > 5 || minTb >= ctb) return Some(base)
        val depthInter = r.ue() // max_transform_hierarchy_depth_inter
        val depthIntra = r.ue()
        val scaling = r.flag()
        if (scaling) return Some(base.copy(deep = false)) // skip-parse out of scope
        val amp = r.flag()
        val sao = r.flag()
        val pcm = r.flag()
        var (pcmBd, pcmMin, pcmMax, pcmNoFilter) = (8, 3, 3, false)
        if (pcm) {
          pcmBd = 1 + r.u(4)
          r.u(4) // pcm chroma bit depth (tier 1: = luma, unchecked)
          pcmMin = 3 + r.ue()
          pcmMax = pcmMin + r.ue()
          pcmNoFilter = r.flag()
        }
        val numStRps = r.ue()
        if (numStRps != 0) return Some(base) // RPS parse beyond the tier
        if (r.flag()) { // long_term_ref_pics_present
          val n = r.ue()
          var i = 0
          while (i < n) { r.u(pocBits); r.flag(); i += 1 }
        }
        val tmvp = r.flag() // sps_temporal_mvp_enabled
        val strong = r.flag()
        Some(base.copy(deep = true, minCbLog2 = minCb, ctbLog2 = ctb,
          minTbLog2 = minTb, maxTbLog2 = maxTb,
          maxTrafoDepthIntra = depthIntra, scalingList = scaling,
          ampEnabled = amp, saoEnabled = sao, pcmEnabled = pcm,
          pcmBitDepth = pcmBd, pcmMinLog2 = pcmMin, pcmMaxLog2 = pcmMax,
          pcmLoopFilterDisabled = pcmNoFilter,
          strongIntraSmoothing = strong,
          maxTrafoDepthInter = depthInter, temporalMvp = tmvp,
          maxDecPicBuffering = math.min(16, decPicBufM1 + 1)))
      } catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException =>
          Some(base)
      }
    } catch {
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException =>
        None
    }

  /** Fixed 96-bit Main-profile general profile_tier_level block. */
  private[multimodal] def writeProfileTierLevel(w: H264.BitWriter): Unit = {
    w.u(0, 2)       // general_profile_space
    w.flag(false)   // general_tier_flag: Main
    w.u(1, 5)       // general_profile_idc: Main
    w.u(1 << 30, 32) // compatibility: bit 1 (Main)
    w.u(1, 1); w.u(0, 1); w.u(1, 1); w.u(1, 1) // progressive, !interlaced, non_packed, frame_only
    w.u(0, 32); w.u(0, 12) // 44 reserved bits
    w.u(93, 8)      // general_level_idc: 3.1
  }

  /** Minimal valid SPS (EBSP, no NAL header) declaring the given coded
    * dimensions at 4:2:0 / 8-bit — pic dims pad to the 8-sample CTB
    * grid with a conformance window, exactly as encoders emit. Round-
    * trips through [[parseSps]] (pinned in H265Spec).
    */
  def writeSps(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"4:2:0 dims must be positive and even, got ${width}x$height")
    val w = new H264.BitWriter
    w.u(0, 4)  // sps_video_parameter_set_id
    w.u(0, 3)  // sps_max_sub_layers_minus1
    w.flag(true) // sps_temporal_id_nesting_flag
    writeProfileTierLevel(w)
    w.ue(0)    // sps_seq_parameter_set_id
    w.ue(1)    // chroma_format_idc: 4:2:0
    val padW = (width + 7) / 8 * 8
    val padH = (height + 7) / 8 * 8
    w.ue(padW); w.ue(padH)
    if (padW != width || padH != height) {
      w.flag(true) // conformance_window_flag
      w.ue(0); w.ue((padW - width) / 2) // left, right (SubWidthC = 2)
      w.ue(0); w.ue((padH - height) / 2) // top, bottom
    } else w.flag(false)
    w.ue(0); w.ue(0) // bit_depth_luma/chroma_minus8
    w.ue(0)    // log2_max_pic_order_cnt_lsb_minus4
    w.flag(false) // sps_sub_layer_ordering_info_present (one set follows)
    w.ue(1); w.ue(0); w.ue(0) // dec_pic_buffering, reorder, latency
    w.ue(0)    // log2_min_luma_coding_block_size_minus3 (8x8 CTB floor)
    w.ue(2)    // log2_diff_max_min_luma_coding_block_size (32x32 CTB)
    w.ue(0)    // log2_min_luma_transform_block_size_minus2
    w.ue(3)    // log2_diff_max_min_luma_transform_block_size
    w.ue(0); w.ue(0) // max_transform_hierarchy_depth_inter/intra
    w.flag(false) // scaling_list_enabled
    w.flag(false) // amp_enabled
    w.flag(false) // sample_adaptive_offset_enabled
    w.flag(false) // pcm_enabled
    w.ue(0)    // num_short_term_ref_pic_sets
    w.flag(false) // long_term_ref_pics_present
    w.flag(false) // sps_temporal_mvp_enabled
    w.flag(false) // strong_intra_smoothing_enabled
    w.flag(false) // vui_parameters_present
    w.flag(false) // sps_extension_present
    H264.ebsp(w.stop())
  }

  /** SPS for the r11 PIXEL tier: 16x16 CTBs with min CB 16 (every CTU
    * one CU, no coding-quadtree split), TBs 4..16 with intra hierarchy
    * depth 0 (TU == CU), PCM enabled at 16x16 / 8-bit with the loop
    * filter disabled over PCM, SAO/AMP/scaling lists off. Dimensions
    * must be CTB-aligned (the tier keeps the conformance window empty
    * — partial CTBs are the next rung).
    */
  def writeSpsPixel(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 16 == 0 && height % 16 == 0,
      s"pixel-tier dims must be 16-aligned, got ${width}x$height")
    val w = new H264.BitWriter
    w.u(0, 4)  // sps_video_parameter_set_id
    w.u(0, 3)  // sps_max_sub_layers_minus1
    w.flag(true) // sps_temporal_id_nesting_flag
    writeProfileTierLevel(w)
    w.ue(0)    // sps_seq_parameter_set_id
    w.ue(1)    // chroma_format_idc: 4:2:0
    w.ue(width); w.ue(height)
    w.flag(false) // conformance_window_flag
    w.ue(0); w.ue(0) // bit_depth_luma/chroma_minus8
    w.ue(0)    // log2_max_pic_order_cnt_lsb_minus4
    w.flag(false) // sps_sub_layer_ordering_info_present (one set follows)
    w.ue(1); w.ue(0); w.ue(0) // dec_pic_buffering, reorder, latency
    w.ue(1)    // log2_min_luma_coding_block_size_minus3 (min CB 16)
    w.ue(0)    // log2_diff_max_min_luma_coding_block_size (CTB 16)
    w.ue(0)    // log2_min_luma_transform_block_size_minus2 (4)
    w.ue(2)    // log2_diff_max_min_luma_transform_block_size (16)
    w.ue(0); w.ue(0) // max_transform_hierarchy_depth_inter/intra
    w.flag(false) // scaling_list_enabled
    w.flag(false) // amp_enabled
    w.flag(false) // sample_adaptive_offset_enabled
    w.flag(true)  // pcm_enabled
    w.u(7, 4); w.u(7, 4) // pcm_sample_bit_depth_luma/chroma_minus1: 8-bit
    w.ue(1)    // log2_min_pcm_luma_coding_block_size_minus3 (16)
    w.ue(0)    // log2_diff_max_min_pcm_luma_coding_block_size
    w.flag(true) // pcm_loop_filter_disabled
    w.ue(0)    // num_short_term_ref_pic_sets
    w.flag(false) // long_term_ref_pics_present
    w.flag(false) // sps_temporal_mvp_enabled
    w.flag(false) // strong_intra_smoothing_enabled
    w.flag(false) // vui_parameters_present
    w.flag(false) // sps_extension_present
    H264.ebsp(w.stop())
  }

  /** SPS for the r12 pixel TIER 2: a real coding quadtree (CTB
    * 1<<ctbLog2 down to 8x8 CUs), TBs 4..(1<<maxTbLog2) with intra
    * transform-hierarchy depth `depthIntra`, residual coding live; no
    * PCM (tier-1 streams keep covering it), SAO/AMP/scaling/strong
    * smoothing off. Dimensions must be CTB-aligned.
    */
  def writeSpsPixel2(width: Int, height: Int, ctbLog2: Int = 5,
      minCbLog2: Int = 3, maxTbLog2: Int = 5, depthIntra: Int = 1,
      sao: Boolean = false, decPicBuffering: Int = 1,
      reorderPics: Int = 0, latencyPlus1: Int = 0,
      log2PocLsb: Int = 4, temporalMvp: Boolean = false): Array[Byte] = {
    val ctb = 1 << ctbLog2
    require(width > 0 && height > 0 && width % ctb == 0 && height % ctb == 0,
      s"tier-2 dims must be CTB-aligned, got ${width}x$height at CTB $ctb")
    require(minCbLog2 >= 3 && minCbLog2 <= ctbLog2 && ctbLog2 <= 6 &&
      maxTbLog2 >= 2 && maxTbLog2 <= 5, "bad coding-structure params")
    val w = new H264.BitWriter
    w.u(0, 4)  // sps_video_parameter_set_id
    w.u(0, 3)  // sps_max_sub_layers_minus1
    w.flag(true) // sps_temporal_id_nesting_flag
    writeProfileTierLevel(w)
    w.ue(0)    // sps_seq_parameter_set_id
    w.ue(1)    // chroma_format_idc: 4:2:0
    w.ue(width); w.ue(height)
    w.flag(false) // conformance_window_flag
    w.ue(0); w.ue(0) // bit_depth_luma/chroma_minus8
    w.ue(log2PocLsb - 4) // log2_max_pic_order_cnt_lsb_minus4
    w.flag(false) // sps_sub_layer_ordering_info_present (one set follows)
    // dec_pic_buffering_minus1 / num_reorder_pics / max_latency: B GOPs
    // hold two references + the current picture and reorder by one
    w.ue(decPicBuffering); w.ue(reorderPics); w.ue(latencyPlus1)
    w.ue(minCbLog2 - 3) // log2_min_luma_coding_block_size_minus3
    w.ue(ctbLog2 - minCbLog2) // log2_diff_max_min_luma_coding_block_size
    w.ue(0)    // log2_min_luma_transform_block_size_minus2 (4)
    w.ue(maxTbLog2 - 2) // log2_diff_max_min_luma_transform_block_size
    w.ue(0); w.ue(depthIntra) // max_transform_hierarchy_depth_inter/intra
    w.flag(false) // scaling_list_enabled
    w.flag(false) // amp_enabled
    w.flag(sao)   // sample_adaptive_offset_enabled (r12 SAO rung)
    w.flag(false) // pcm_enabled
    w.ue(0)    // num_short_term_ref_pic_sets
    w.flag(false) // long_term_ref_pics_present
    w.flag(temporalMvp) // sps_temporal_mvp_enabled (r15)
    w.flag(false) // strong_intra_smoothing_enabled
    w.flag(false) // vui_parameters_present
    w.flag(false) // sps_extension_present
    H264.ebsp(w.stop())
  }

  /** PPS for the pixel tiers: the probe PPS with explicit deblocking
    * control (override off). r11 tier-1/2 streams DISABLE the in-loop
    * filter (`deblockDisabled = true`); the r12 deblocking rung writes
    * `false` (filter live, zero β/tC offsets) — HEVC deblocking is on
    * by default in every real encoder.
    */
  def writePpsPixel(deblockDisabled: Boolean = true,
      cabacInit: Boolean = false, weightedPred: Boolean = false,
      weightedBipred: Boolean = false,
      signHide: Boolean = false): Array[Byte] = {
    val w = new H264.BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.flag(false) // dependent_slice_segments_enabled
    w.flag(false) // output_flag_present
    w.u(0, 3) // num_extra_slice_header_bits
    w.flag(signHide) // sign_data_hiding_enabled (r15)
    w.flag(cabacInit) // cabac_init_present
    w.ue(0); w.ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.se(0)   // init_qp_minus26
    w.flag(false) // constrained_intra_pred
    w.flag(false) // transform_skip_enabled
    w.flag(false) // cu_qp_delta_enabled
    w.se(0); w.se(0) // pps_cb/cr_qp_offset
    w.flag(false) // pps_slice_chroma_qp_offsets_present
    w.flag(weightedPred); w.flag(weightedBipred)
    w.flag(false) // transquant_bypass_enabled
    w.flag(false); w.flag(false) // tiles_enabled, entropy_coding_sync
    w.flag(true)  // pps_loop_filter_across_slices_enabled
    w.flag(true)  // deblocking_filter_control_present
    w.flag(false) //   deblocking_filter_override_enabled
    w.flag(deblockDisabled) // pps_deblocking_filter_disabled
    if (!deblockDisabled) { w.se(0); w.se(0) } // beta/tc offsets div2
    w.flag(false) // pps_scaling_list_data_present
    w.flag(false) // lists_modification_present
    w.ue(0)   // log2_parallel_merge_level_minus2
    w.flag(false) // slice_segment_header_extension_present
    w.flag(false) // pps_extension_present
    H264.ebsp(w.stop())
  }

  /** Parsed PPS fields the pixel tier needs (§7.3.2.3). */
  final case class PpsInfo(ppsId: Int, spsId: Int, initQp: Int,
      cbQpOffset: Int, crQpOffset: Int, deblockingDisabled: Boolean,
      supported: Boolean,
      betaOffsetDiv2: Int = 0, tcOffsetDiv2: Int = 0,
      loopFilterAcrossSlices: Boolean = true,
      numRefL0Default: Int = 0,
      // r13 (B slices): L1 default active refs + whether slice headers
      // may carry ref_pic_lists_modification
      numRefL1Default: Int = 0, listsModification: Boolean = false,
      cabacInitPresent: Boolean = false,
      weightedPred: Boolean = false, weightedBipred: Boolean = false,
      // r15: sign_data_hiding_enabled_flag (§7.4.3.3.1) — decoded, not
      // rejected: residual_coding infers the first-in-scan sign from
      // the coefficient-group level parity (§7.4.9.11)
      signDataHiding: Boolean = false)

  /** Parse a PPS down to the pixel tier's needs; `supported` = false
    * when it enables machinery outside the tier (dependent slices,
    * transform skip, cu qp delta, transquant bypass, tiles,
    * wavefronts, scaling lists). Sign hiding, cabac init and weighted
    * prediction are decoded (r15/r13).
    */
  def parsePps(payload: Array[Byte]): Option[PpsInfo] =
    try {
      val r = new H264.BitReader(H264.rbsp(payload))
      val ppsId = r.ue(); val spsId = r.ue()
      var ok = true
      if (r.flag()) ok = false // dependent_slice_segments_enabled
      r.flag() // output_flag_present
      if (r.u(3) != 0) ok = false // num_extra_slice_header_bits
      val signHide = r.flag() // sign_data_hiding (r15: decoded)
      val cabacInit = r.flag() // cabac_init_present (r13: supported)
      val numRefL0 = r.ue(); val numRefL1 = r.ue() // l0/l1 default actives
      val initQp = 26 + r.se()
      r.flag() // constrained_intra_pred (no inter in the tier: harmless)
      if (r.flag()) ok = false // transform_skip
      if (r.flag()) ok = false // cu_qp_delta
      val cbOff = r.se(); val crOff = r.se()
      r.flag() // slice chroma qp offsets present
      val wp = r.flag(); val wbp = r.flag() // weighted pred/bipred (r13)
      if (r.flag()) ok = false // transquant_bypass
      if (r.flag() | r.flag()) ok = false // tiles / entropy sync
      val lfAcross = r.flag() // loop_filter_across_slices
      var deblockDisabled = false
      var betaOff = 0
      var tcOff = 0
      if (r.flag()) { // deblocking_filter_control_present
        if (r.flag()) ok = false // override enabled (slice-level knobs)
        deblockDisabled = r.flag()
        if (!deblockDisabled) { betaOff = r.se(); tcOff = r.se() }
      }
      if (r.flag()) ok = false // pps_scaling_list_data_present
      val listsMod = r.flag() // lists_modification_present
      // log2_parallel_merge_level_minus2 > 0 changes the merge
      // candidate availability rules (§8.5.3.2.3's parallel merge
      // estimation region) — out of the tier
      if (r.ue() != 0) ok = false
      Some(PpsInfo(ppsId, spsId, initQp, cbOff, crOff, deblockDisabled, ok,
        betaOff, tcOff, lfAcross, numRefL0, numRefL1, listsMod, cabacInit,
        wp, wbp, signHide))
    } catch {
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException =>
        None
    }

  /** Minimal valid VPS (EBSP, no NAL header). The ordering-info
    * arguments MUST cover the paired SPS's values: §7.4.3.2.1 requires
    * sps_max_dec_pic_buffering_minus1 / sps_max_num_reorder_pics ≤
    * the VPS's — r15's libde265 external-decoder rung caught encodeGopB
    * emitting SPS (3, 1) under a hardcoded VPS (1, 0), and libde265
    * honors the VPS: reordered B GOPs came out in DECODE order. An
    * inconsistent pair is a conformance violation a decoder may act on.
    */
  def writeVps(decPicBuffering: Int = 1, reorderPics: Int = 0,
      latencyPlus1: Int = 0): Array[Byte] = {
    val w = new H264.BitWriter
    w.u(0, 4)  // vps_video_parameter_set_id
    w.flag(true); w.flag(true) // base_layer_internal / available
    w.u(0, 6)  // vps_max_layers_minus1
    w.u(0, 3)  // vps_max_sub_layers_minus1
    w.flag(true) // vps_temporal_id_nesting_flag
    w.u(0xffff, 16) // vps_reserved_0xffff_16bits
    writeProfileTierLevel(w)
    w.flag(false) // vps_sub_layer_ordering_info_present (one set)
    w.ue(decPicBuffering); w.ue(reorderPics); w.ue(latencyPlus1)
    w.u(0, 6)  // vps_max_layer_id
    w.ue(0)    // vps_num_layer_sets_minus1
    w.flag(false) // vps_timing_info_present
    w.flag(false) // vps_extension
    H264.ebsp(w.stop())
  }

  /** Minimal valid PPS (EBSP, no NAL header). */
  def writePps(): Array[Byte] = {
    val w = new H264.BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.flag(false) // dependent_slice_segments_enabled
    w.flag(false) // output_flag_present
    w.u(0, 3) // num_extra_slice_header_bits
    w.flag(false) // sign_data_hiding_enabled
    w.flag(false) // cabac_init_present
    w.ue(0); w.ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.se(0)   // init_qp_minus26
    w.flag(false) // constrained_intra_pred
    w.flag(false) // transform_skip_enabled
    w.flag(false) // cu_qp_delta_enabled
    w.se(0); w.se(0) // pps_cb/cr_qp_offset
    w.flag(false) // pps_slice_chroma_qp_offsets_present
    w.flag(false); w.flag(false) // weighted_pred, weighted_bipred
    w.flag(false) // transquant_bypass_enabled
    w.flag(false); w.flag(false) // tiles_enabled, entropy_coding_sync
    w.flag(true)  // pps_loop_filter_across_slices_enabled
    w.flag(false) // deblocking_filter_control_present
    w.flag(false) // pps_scaling_list_data_present
    w.flag(false) // lists_modification_present
    w.ue(0)   // log2_parallel_merge_level_minus2
    w.flag(false) // slice_segment_header_extension_present
    w.flag(false) // pps_extension_present
    H264.ebsp(w.stop())
  }

  /** Parse an hvcC (HEVCDecoderConfigurationRecord, 14496-15 §8.3.3.1):
    * returns (lengthSize, arrays of (nalType, NAL bytes WITH the 2-byte
    * header)). None on malformed input.
    */
  def parseHvcC(b: Array[Byte]): Option[(Int, Seq[(Int, Array[Byte])])] =
    try {
      if (b.length < 23 || (b(0) & 0xff) != 1) return None
      // 14496-15 allows lengthSizeMinusOne in {0,1,3} (1/2/4-byte
      // lengths); 2 (3-byte) is reserved — reject rather than tolerate.
      if ((b(21) & 3) == 2) return None
      val lengthSize = (b(21) & 3) + 1
      val numArrays = b(22) & 0xff
      val out = Seq.newBuilder[(Int, Array[Byte])]
      var off = 23
      var a = 0
      while (a < numArrays) {
        if (off + 3 > b.length) return None
        val nalType = b(off) & 0x3f
        val numNalus = ((b(off + 1) & 0xff) << 8) | (b(off + 2) & 0xff)
        off += 3
        var k = 0
        while (k < numNalus) {
          if (off + 2 > b.length) return None
          val len = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
          off += 2
          if (len < 2 || off + len > b.length) return None
          out += ((nalType, java.util.Arrays.copyOfRange(b, off, off + len)))
          off += len
          k += 1
        }
        a += 1
      }
      Some((lengthSize, out.result()))
    } catch { case _: Exception => None }

  /** Serialize an hvcC from the given parameter sets (each WITHOUT its
    * NAL header — headers are added here), Main-profile defaults,
    * 4-byte lengths. Inverse-pinned against [[parseHvcC]].
    */
  def writeHvcC(vps: Array[Byte], sps: Array[Byte],
      pps: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // configurationVersion
    out.write(1) // profile_space 0 / tier 0 / profile_idc Main
    out.write(Array[Byte](0x60, 0, 0, 0), 0, 4) // compat flags (bit 1 + bit 2)
    out.write(Array[Byte](0xb0.toByte, 0, 0, 0, 0, 0), 0, 6) // constraint flags
    out.write(93) // general_level_idc
    out.write(0xf0); out.write(0) // min_spatial_segmentation_idc
    out.write(0xfc) // parallelismType 0
    out.write(0xfc | 1) // chromaFormat 4:2:0
    out.write(0xf8) // bitDepthLumaMinus8 0
    out.write(0xf8) // bitDepthChromaMinus8 0
    out.write(0); out.write(0) // avgFrameRate
    out.write((0 << 6) | (0 << 3) | (1 << 2) | 3) // numTemporal 0, nested, lengthSize 4
    out.write(3) // numOfArrays
    def array(t: Int, payload: Array[Byte]): Unit = {
      out.write(0x80 | t) // array_completeness 1
      out.write(0); out.write(1) // numNalus = 1
      val nal = nalHeader(t) ++ payload
      out.write(nal.length >> 8); out.write(nal.length & 0xff)
      out.write(nal, 0, nal.length)
    }
    array(NalVps, vps); array(NalSps, sps); array(NalPps, pps)
    out.toByteArray
  }

  /** IRAP keyframe payloads of an Annex-B HEVC stream: for each run of
    * consecutive IRAP NALs (one keyframe picture — multi-slice safe),
    * the concatenated slice payload bytes. Compressed-domain identity
    * for keyframe-hash dedup, exactly [[H264.idrPayloads]]'s contract.
    */
  def irapPayloads(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var run: java.io.ByteArrayOutputStream = null
    nalUnitsAnnexB(bytes).foreach { nal =>
      if (isIrap(nal.nalType)) {
        if (run == null) run = new java.io.ByteArrayOutputStream()
        run.write(nal.payload, 0, nal.payload.length)
      } else if (run != null) { out += run.toByteArray; run = null }
    }
    if (run != null) out += run.toByteArray
    out.result()
  }
}
