package graft.multimodal

/** HEVC CABAC layer for the r11 pixel tier-1 (ITU-T H.265 §9.3): the
  * ARITHMETIC engine is byte-for-byte the H.264 one (identical
  * rangeTabLps / transIdx tables, 9-bit init, renormalization and
  * terminate — §9.3.4.3 vs H.264 §9.3.3.2), so [[H264Cabac.Decoder]] /
  * [[H264Cabac.Encoder]] are reused verbatim; only CONTEXT
  * INITIALIZATION and the binarizations differ. H.265 initializes from
  * an 8-bit initValue via slopeIdx/offsetIdx (§9.3.2.2):
  *   m = (initValue >> 4) * 5 − 45,  n = ((initValue & 15) << 3) − 16
  * after which preCtxState = Clip3(1, 126, ((m·qp) >> 4) + n) — the
  * same form [[H264Cabac.Contexts]] computes, so an initValue→(m, n)
  * map plugs straight in.
  *
  * Tier-1 syntax scope (I slices, no residual coding): part_mode,
  * pcm_flag (terminate-coded), prev_intra_luma_pred_flag / mpm_idx /
  * rem_intra_luma_pred_mode, intra_chroma_pred_mode, cbf_luma,
  * cbf_cb/cbf_cr, end_of_slice_segment_flag. Init values are the
  * I-slice (initType 0) rows of the spec's Tables 9-21..9-24 (the same
  * values the public HM reference software ships in its context
  * tables); the transcription caveat of H264Cavlc applies.
  */
private[multimodal] object H265Cabac {

  // context index space (our own layout; the engine's ctx array is
  // index-agnostic). Tier 1 indices 0..13; tier 2 (r12, residual
  // coding + quadtree) appends the §7.3.8.11 context families.
  val CtxPartMode = 0
  val CtxPrevIntraLuma = 1
  val CtxChromaPredMode = 2
  val CtxCbfLuma = 3 // +0 trafoDepth>0, +1 depth 0
  val CtxCbfChroma = 5 // +trafoDepth
  val CtxSplitCu = 10 // +ctxInc 0..2
  val CtxSaoMergeUnused = 13
  val CtxTransSubdiv = 14 // + (5 - log2TrafoSize) 0..2
  val CtxLastX = 20 // +ctxInc 0..17 (luma 0..14, chroma 15..17)
  val CtxLastY = 38 // +ctxInc 0..17
  val CtxCsbf = 56 // + (cIdx>0 ? 2 : 0) + min(csbfCtx, 1)
  val CtxSig = 60 // +sigCtxInc (luma 0..26, chroma 27..41)
  val CtxG1 = 102 // + (cIdx>0 ? 16 : 0) + 4·ctxSet + min(greater1Ctx, 3)
  val CtxG2 = 126 // + (cIdx>0 ? 4 : 0) + ctxSet
  // tier 3 (r12, inter P): the §7.3.8.5/.6/.9 inter syntax families
  val CtxCuSkip = 132 // + (left skip) + (above skip), 0..2
  val CtxPredMode = 135
  val CtxMergeFlag = 136
  val CtxMergeIdx = 137
  val CtxMvdGr0 = 138
  val CtxMvdGr1 = 139
  val CtxMvpFlag = 140
  val CtxRqtRootCbf = 141
  val CtxRefIdx = 142 // + binIdx 0..1 (unused at 1 active ref)
  // r12 SAO (§7.3.8.3): one shared merge ctx, one type-idx ctx
  val CtxSaoMerge = 144
  val CtxSaoType = 145
  // r13 (inter B): inter_pred_idc (§9.3.4.2.2 — bin 0 ctxInc = CtDepth
  // 0..3, bin 1 ctxInc = 4)
  val CtxInterPredIdc = 146 // +0..4

  @inline private def mn(initValue: Int): (Int, Int) =
    ((initValue >> 4) * 5 - 45, ((initValue & 15) << 3) - 16)

  private def family(base: Int, inits: Array[Int]): Seq[(Int, (Int, Int))] =
    inits.toIndexedSeq.zipWithIndex.map { case (v, i) => (base + i) -> mn(v) }

  /** I-slice (initType 0) context initialization map, as (m, n) pairs
    * consumable by [[H264Cabac.Contexts]]. Values are the initType-0
    * rows of the spec's Tables 9-21..9-40 (identical to the public HM
    * reference software's INIT_* tables); transcription caveat as ever.
    */
  val ctxInitI: Map[Int, (Int, Int)] = (Seq(
    CtxSaoMerge -> mn(153),
    CtxSaoType -> mn(200),
    CtxPartMode -> mn(184),
    CtxPrevIntraLuma -> mn(184),
    CtxChromaPredMode -> mn(63),
    (CtxCbfLuma + 0) -> mn(111),
    (CtxCbfLuma + 1) -> mn(141),
    (CtxCbfChroma + 0) -> mn(94),
    (CtxCbfChroma + 1) -> mn(138),
    (CtxCbfChroma + 2) -> mn(182),
    (CtxCbfChroma + 3) -> mn(154),
    (CtxCbfChroma + 4) -> mn(154),
    (CtxSplitCu + 0) -> mn(139),
    (CtxSplitCu + 1) -> mn(141),
    (CtxSplitCu + 2) -> mn(157)) ++
    family(CtxTransSubdiv, Array(153, 138, 138)) ++
    // last_sig_coeff_x/y_prefix share one init row
    family(CtxLastX, Array(110, 110, 124, 125, 140, 153, 125, 127, 140,
      109, 111, 143, 127, 111, 79, 108, 123, 63)) ++
    family(CtxLastY, Array(110, 110, 124, 125, 140, 153, 125, 127, 140,
      109, 111, 143, 127, 111, 79, 108, 123, 63)) ++
    family(CtxCsbf, Array(91, 171, 134, 141)) ++
    family(CtxSig, Array(111, 111, 125, 110, 110, 94, 124, 108, 124,
      107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125,
      107, 125, 141, 179, 153, 125, 140, 139, 182, 182, 152, 136,
      152, 136, 153, 136, 139, 111, 136, 139, 111)) ++
    family(CtxG1, Array(140, 92, 137, 138, 140, 152, 138, 139, 153, 74,
      149, 92, 139, 107, 122, 152, 140, 179, 166, 182, 140, 227, 122, 197)) ++
    family(CtxG2, Array(138, 153, 136, 167, 152, 152))).toMap

  /** P-slice (initType 1, cabac_init_flag absent) context map — the
    * initType-1 rows of the same spec tables (Tables 9-5..9-32 /
    * public HM INIT_* tables), covering both the intra-CU syntax that
    * P slices still carry and the r12 inter families (cu_skip_flag,
    * pred_mode_flag, merge, mvd, mvp, rqt_root_cbf). Transcription
    * caveat as ever: encoder and decoder share this table, so
    * own-encoder round-trips cannot catch a mis-transcribed value —
    * externally-produced P streams are the open validation.
    */
  val ctxInitP: Map[Int, (Int, Int)] = (Seq(
    CtxSaoMerge -> mn(153),
    CtxSaoType -> mn(185),
    CtxPartMode -> mn(154),
    CtxPrevIntraLuma -> mn(154),
    CtxChromaPredMode -> mn(152),
    (CtxCbfLuma + 0) -> mn(153),
    (CtxCbfLuma + 1) -> mn(111),
    (CtxCbfChroma + 0) -> mn(149),
    (CtxCbfChroma + 1) -> mn(107),
    (CtxCbfChroma + 2) -> mn(167),
    (CtxCbfChroma + 3) -> mn(154),
    (CtxCbfChroma + 4) -> mn(154),
    (CtxSplitCu + 0) -> mn(107),
    (CtxSplitCu + 1) -> mn(139),
    (CtxSplitCu + 2) -> mn(126),
    CtxPredMode -> mn(149),
    CtxMergeFlag -> mn(110),
    CtxMergeIdx -> mn(122),
    CtxMvdGr0 -> mn(140),
    CtxMvdGr1 -> mn(198),
    CtxMvpFlag -> mn(168),
    CtxRqtRootCbf -> mn(79),
    (CtxRefIdx + 0) -> mn(153),
    (CtxRefIdx + 1) -> mn(153)) ++
    family(CtxCuSkip, Array(197, 185, 201)) ++
    family(CtxTransSubdiv, Array(124, 138, 94)) ++
    family(CtxLastX, Array(125, 110, 94, 110, 95, 79, 125, 111, 110,
      78, 110, 111, 111, 95, 94, 108, 123, 108)) ++
    family(CtxLastY, Array(125, 110, 94, 110, 95, 79, 125, 111, 110,
      78, 110, 111, 111, 95, 94, 108, 123, 108)) ++
    family(CtxCsbf, Array(121, 140, 61, 154)) ++
    family(CtxSig, Array(155, 154, 139, 153, 139, 123, 123, 63, 153,
      166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154,
      166, 183, 140, 136, 153, 154, 170, 153, 123, 123, 107, 121,
      107, 121, 167, 151, 183, 140, 151, 183, 140)) ++
    family(CtxG1, Array(154, 196, 196, 167, 154, 152, 167, 182, 182, 134,
      149, 136, 153, 121, 136, 137, 169, 194, 166, 167, 154, 167, 137, 182)) ++
    family(CtxG2, Array(107, 167, 91, 122, 107, 167)) ++
    family(CtxInterPredIdc, Array(95, 79, 63, 31, 31))).toMap

  /** B-slice (initType 2, cabac_init_flag absent/0 — §9.3.2.2) context
    * map: the initType-2 rows of the same spec tables / public HM
    * INIT_* tables. Families whose B row equals the P row (cu_skip,
    * split_cu, part_mode, csbf, sao_merge, mvp, ref_idx, rqt_root_cbf,
    * inter_pred_idc) still get their own entries here — one table per
    * initType, no cross-referencing, so a transcription fix in one
    * cannot silently shift another. Transcription caveat as ever.
    */
  val ctxInitB: Map[Int, (Int, Int)] = (Seq(
    CtxSaoMerge -> mn(153),
    CtxSaoType -> mn(160),
    CtxPartMode -> mn(154),
    CtxPrevIntraLuma -> mn(183),
    CtxChromaPredMode -> mn(152),
    (CtxCbfLuma + 0) -> mn(153),
    (CtxCbfLuma + 1) -> mn(111),
    (CtxCbfChroma + 0) -> mn(149),
    (CtxCbfChroma + 1) -> mn(92),
    (CtxCbfChroma + 2) -> mn(167),
    (CtxCbfChroma + 3) -> mn(154),
    (CtxCbfChroma + 4) -> mn(154),
    (CtxSplitCu + 0) -> mn(107),
    (CtxSplitCu + 1) -> mn(139),
    (CtxSplitCu + 2) -> mn(126),
    CtxPredMode -> mn(134),
    CtxMergeFlag -> mn(154),
    CtxMergeIdx -> mn(137),
    CtxMvdGr0 -> mn(169),
    CtxMvdGr1 -> mn(198),
    CtxMvpFlag -> mn(168),
    CtxRqtRootCbf -> mn(79),
    (CtxRefIdx + 0) -> mn(153),
    (CtxRefIdx + 1) -> mn(153)) ++
    family(CtxCuSkip, Array(197, 185, 201)) ++
    family(CtxInterPredIdc, Array(95, 79, 63, 31, 31)) ++
    family(CtxTransSubdiv, Array(224, 167, 122)) ++
    family(CtxLastX, Array(125, 110, 124, 110, 95, 94, 125, 111, 111,
      79, 125, 126, 111, 111, 79, 108, 123, 93)) ++
    family(CtxLastY, Array(125, 110, 124, 110, 95, 94, 125, 111, 111,
      79, 125, 126, 111, 111, 79, 108, 123, 93)) ++
    family(CtxCsbf, Array(121, 140, 61, 154)) ++
    family(CtxSig, Array(170, 154, 139, 153, 139, 123, 123, 63, 124,
      166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154,
      166, 183, 140, 136, 153, 154, 170, 153, 138, 138, 122, 121,
      122, 121, 167, 151, 183, 140, 151, 183, 140)) ++
    family(CtxG1, Array(154, 196, 167, 167, 154, 152, 167, 182, 182, 134,
      149, 136, 153, 121, 136, 122, 169, 208, 166, 167, 154, 152, 167, 182)) ++
    family(CtxG2, Array(107, 167, 91, 107, 107, 167))).toMap

  def contexts(sliceQp: Int): H264Cabac.Contexts =
    new H264Cabac.Contexts(sliceQp, ctxInitI)

  def contextsP(sliceQp: Int): H264Cabac.Contexts =
    new H264Cabac.Contexts(sliceQp, ctxInitP)

  def contextsB(sliceQp: Int): H264Cabac.Contexts =
    new H264Cabac.Contexts(sliceQp, ctxInitB)

  /** inter_pred_idc for 2Nx2N PUs (nPbW + nPbH != 12, §9.3.3.7): bin 0
    * at ctxInc = cqtDepth distinguishes PRED_BI (1); otherwise bin 1 at
    * ctxInc 4 picks PRED_L0 (0) vs PRED_L1 (1). Returns 0 / 1 / 2 =
    * PRED_L0 / PRED_L1 / PRED_BI.
    */
  def decodeInterPredIdc(d: H264Cabac.Decoder, cqtDepth: Int): Int =
    if (d.decision(CtxInterPredIdc + cqtDepth) == 1) 2
    else d.decision(CtxInterPredIdc + 4)

  def encodeInterPredIdc(e: H264Cabac.Encoder, cqtDepth: Int,
      idc: Int): Unit = {
    require(idc >= 0 && idc <= 2, s"bad inter_pred_idc $idc")
    e.decision(CtxInterPredIdc + cqtDepth, if (idc == 2) 1 else 0)
    if (idc != 2) e.decision(CtxInterPredIdc + 4, idc)
  }

  /** ref_idx_l0/l1 (§9.3.3.2 TR at cMax = active − 1; Table 9-41:
    * bins 0 and 1 context-coded at CtxRefIdx + binIdx, later bins
    * bypass).
    */
  def decodeRefIdx(d: H264Cabac.Decoder, numActive: Int): Int = {
    val cMax = numActive - 1
    if (cMax == 0) return 0
    var v = 0
    var more = true
    while (more && v < cMax) {
      val bin =
        if (v < 2) d.decision(CtxRefIdx + v)
        else d.bypass()
      if (bin == 1) v += 1 else more = false
    }
    v
  }

  def encodeRefIdx(e: H264Cabac.Encoder, idx: Int, numActive: Int): Unit = {
    val cMax = numActive - 1
    require(idx >= 0 && idx <= cMax, s"bad ref_idx $idx")
    if (cMax == 0) return
    var i = 0
    while (i < idx) {
      if (i < 2) e.decision(CtxRefIdx + i, 1) else e.bypass(1)
      i += 1
    }
    if (idx < cMax) {
      if (idx < 2) e.decision(CtxRefIdx + idx, 0) else e.bypass(0)
    }
  }

  /** mpm_idx: TR(cMax 2), bypass bins — '0' → 0, '10' → 1, '11' → 2. */
  def decodeMpmIdx(d: H264Cabac.Decoder): Int =
    if (d.bypass() == 0) 0 else 1 + d.bypass()

  def encodeMpmIdx(e: H264Cabac.Encoder, idx: Int): Unit = {
    require(idx >= 0 && idx <= 2, s"bad mpm_idx $idx")
    if (idx == 0) e.bypass(0)
    else { e.bypass(1); e.bypass(idx - 1) }
  }

  /** rem_intra_luma_pred_mode: FL(31), 5 bypass bins. */
  def decodeRemIntra(d: H264Cabac.Decoder): Int = {
    var v = 0
    var i = 0
    while (i < 5) { v = (v << 1) | d.bypass(); i += 1 }
    v
  }

  def encodeRemIntra(e: H264Cabac.Encoder, v: Int): Unit = {
    require(v >= 0 && v < 32, s"bad rem_intra $v")
    var i = 4
    while (i >= 0) { e.bypass((v >> i) & 1); i -= 1 }
  }

  /** intra_chroma_pred_mode (§9.3.3.8): first bin ctx — 0 = derived
    * (DM, value 4), 1 = explicit + 2 bypass bins. Tier 1 en/decodes the
    * full binarization but the encoder only emits DM.
    */
  def decodeChromaMode(d: H264Cabac.Decoder): Int =
    if (d.decision(CtxChromaPredMode) == 0) 4
    else (d.bypass() << 1) | d.bypass()

  def encodeChromaModeDm(e: H264Cabac.Encoder): Unit =
    e.decision(CtxChromaPredMode, 0)

  // ----------------------------- r12 residual-coding binarizations (§9.3.3)

  /** last_sig_coeff_{x,y}_prefix context increment base + shift for a
    * TB (§9.3.4.2.3): luma offset 3(log2−2) + ((log2−1)>>2), shift
    * (log2+1)>>2; chroma offset 15, shift log2−2.
    */
  @inline def lastCtx(log2Size: Int, luma: Boolean): (Int, Int) =
    if (luma) (3 * (log2Size - 2) + ((log2Size - 1) >> 2), (log2Size + 1) >> 2)
    else (15, log2Size - 2)

  /** Decode one last_sig_coeff_{x,y}_prefix: TR(cMax 2·log2−1) on
    * contexts `base+offset+(bin>>shift)` (§9.3.4.2.3). SYNTAX ORDER:
    * both prefixes precede both suffixes (§7.3.8.11) — callers decode
    * x-prefix, y-prefix, then the two [[decodeLastSuffix]]es.
    */
  def decodeLastPrefix(d: H264Cabac.Decoder, base: Int, log2Size: Int,
      luma: Boolean): Int = {
    val (off, shift) = lastCtx(log2Size, luma)
    val cMax = (log2Size << 1) - 1
    var p = 0
    while (p < cMax && d.decision(base + off + (p >> shift)) == 1) p += 1
    p
  }

  /** FL bypass suffix for a prefix > 3; returns the full coordinate
    * (§7.4.9.11: (2 + p%2) << (p/2 − 1) + suffix). Prefixes ≤ 3 ARE
    * the coordinate.
    */
  def decodeLastSuffix(d: H264Cabac.Decoder, p: Int): Int =
    if (p <= 3) p
    else {
      val nBits = (p >> 1) - 1
      var suffix = 0
      var i = 0
      while (i < nBits) { suffix = (suffix << 1) | d.bypass(); i += 1 }
      ((2 + (p & 1)) << nBits) + suffix
    }

  /** The prefix value for coordinate v (inverse of the TR+FL pair). */
  def lastPrefixOf(v: Int, log2Size: Int): Int =
    if (v <= 3) v
    else {
      val cMax = (log2Size << 1) - 1
      var q = 3
      while (q < cMax && v >= ((2 + ((q + 1) & 1)) << (((q + 1) >> 1) - 1)))
        q += 1
      q
    }

  def encodeLastPrefix(e: H264Cabac.Encoder, base: Int, log2Size: Int,
      luma: Boolean, p: Int): Unit = {
    val (off, shift) = lastCtx(log2Size, luma)
    val cMax = (log2Size << 1) - 1
    var i = 0
    while (i < p) { e.decision(base + off + (i >> shift), 1); i += 1 }
    if (p < cMax) e.decision(base + off + (p >> shift), 0)
  }

  def encodeLastSuffix(e: H264Cabac.Encoder, p: Int, v: Int): Unit =
    if (p > 3) {
      val nBits = (p >> 1) - 1
      val suffix = v - ((2 + (p & 1)) << nBits)
      var b = nBits - 1
      while (b >= 0) { e.bypass((suffix >> b) & 1); b -= 1 }
    }

  /** coeff_abs_level_remaining, Golomb-Rice with parameter `rice`
    * (§9.3.3.13): unary prefix (bypass); prefix ≤ 3 → (p << rice) +
    * FL(rice); else escape with (p − 3 + rice) suffix bits from base
    * ((1 << (p−3)) + 2) << rice.
    */
  def decodeRemaining(d: H264Cabac.Decoder, rice: Int): Int = {
    var p = 0
    while (p < 32 && d.bypass() == 1) p += 1
    require(p < 32, "malformed coeff_abs_level_remaining prefix")
    if (p <= 3) {
      var suffix = 0
      var i = 0
      while (i < rice) { suffix = (suffix << 1) | d.bypass(); i += 1 }
      (p << rice) + suffix
    } else {
      val nBits = p - 3 + rice
      require(nBits < 31, "malformed remaining escape")
      var suffix = 0
      var i = 0
      while (i < nBits) { suffix = (suffix << 1) | d.bypass(); i += 1 }
      (((1 << (p - 3)) + 2) << rice) + suffix
    }
  }

  // ----------------------------- r12 inter binarizations (§9.3.3)

  /** merge_idx (§9.3.3.9): TR with cMax = MaxNumMergeCand − 1; bin 0
    * context-coded, bins 1.. bypass.
    */
  def decodeMergeIdx(d: H264Cabac.Decoder, maxNumMergeCand: Int): Int = {
    val cMax = maxNumMergeCand - 1
    if (cMax == 0 || d.decision(CtxMergeIdx) == 0) 0
    else {
      var v = 1
      while (v < cMax && d.bypass() == 1) v += 1
      v
    }
  }

  def encodeMergeIdx(e: H264Cabac.Encoder, idx: Int,
      maxNumMergeCand: Int): Unit = {
    val cMax = maxNumMergeCand - 1
    require(idx >= 0 && idx <= cMax, s"bad merge_idx $idx")
    if (cMax > 0) {
      e.decision(CtxMergeIdx, if (idx > 0) 1 else 0)
      var i = 1
      while (i < idx) { e.bypass(1); i += 1 }
      if (idx > 0 && idx < cMax) e.bypass(0)
    }
  }

  /** k-th order Exp-Golomb, bypass bins (§9.3.3.3): unary prefix of
    * leading ones, then (prefixLen + k) suffix bits.
    */
  def decodeEgk(d: H264Cabac.Decoder, k: Int): Int = {
    var p = 0
    while (p < 28 && d.bypass() == 1) p += 1
    require(p < 28, "malformed EGk prefix")
    var v = 0
    var i = 0
    val nBits = p + k
    while (i < nBits) { v = (v << 1) | d.bypass(); i += 1 }
    (((1 << p) - 1) << k) + v
  }

  def encodeEgk(e: H264Cabac.Encoder, k: Int, value: Int): Unit = {
    require(value >= 0, s"bad EGk value $value")
    var p = 0
    while ((((1 << (p + 1)) - 1) << k) <= value) p += 1
    var i = 0
    while (i < p) { e.bypass(1); i += 1 }
    e.bypass(0)
    val suffix = value - (((1 << p) - 1) << k)
    var b = p + k - 1
    while (b >= 0) { e.bypass((suffix >> b) & 1); b -= 1 }
  }

  /** mvd_coding (§7.3.8.9): greater0/greater1 flags for BOTH
    * components first, then per-component abs_mvd_minus2 (EG1) +
    * sign. Returns (mvdX, mvdY).
    */
  def decodeMvd(d: H264Cabac.Decoder): (Int, Int) = {
    val gr0x = d.decision(CtxMvdGr0) == 1
    val gr0y = d.decision(CtxMvdGr0) == 1
    val gr1x = gr0x && d.decision(CtxMvdGr1) == 1
    val gr1y = gr0y && d.decision(CtxMvdGr1) == 1
    def component(gr0: Boolean, gr1: Boolean): Int =
      if (!gr0) 0
      else {
        val abs = if (gr1) 2 + decodeEgk(d, 1) else 1
        if (d.bypass() == 1) -abs else abs
      }
    val x = component(gr0x, gr1x)
    val y = component(gr0y, gr1y)
    (x, y)
  }

  def encodeMvd(e: H264Cabac.Encoder, mvdX: Int, mvdY: Int): Unit = {
    val ax = math.abs(mvdX); val ay = math.abs(mvdY)
    e.decision(CtxMvdGr0, if (ax > 0) 1 else 0)
    e.decision(CtxMvdGr0, if (ay > 0) 1 else 0)
    if (ax > 0) e.decision(CtxMvdGr1, if (ax > 1) 1 else 0)
    if (ay > 0) e.decision(CtxMvdGr1, if (ay > 1) 1 else 0)
    if (ax > 0) {
      if (ax > 1) encodeEgk(e, 1, ax - 2)
      e.bypass(if (mvdX < 0) 1 else 0)
    }
    if (ay > 0) {
      if (ay > 1) encodeEgk(e, 1, ay - 2)
      e.bypass(if (mvdY < 0) 1 else 0)
    }
  }

  def encodeRemaining(e: H264Cabac.Encoder, rice: Int, v: Int): Unit = {
    require(v >= 0, s"bad remaining $v")
    val q = v >> rice
    if (q <= 3) {
      var i = 0
      while (i < q) { e.bypass(1); i += 1 }
      e.bypass(0)
      var b = rice - 1
      while (b >= 0) { e.bypass((v >> b) & 1); b -= 1 }
    } else {
      // escape: find p > 3 with base(p) <= v < base(p+1)
      var p = 4
      while (((1L << (p - 2)) + 2L) << rice <= v) p += 1
      var i = 0
      while (i < p) { e.bypass(1); i += 1 }
      e.bypass(0)
      val nBits = p - 3 + rice
      val suffix = v - (((1 << (p - 3)) + 2) << rice)
      var b = nBits - 1
      while (b >= 0) { e.bypass((suffix >> b) & 1); b -= 1 }
    }
  }
}
