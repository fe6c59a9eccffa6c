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

  def contexts(sliceQp: Int): H264Cabac.Contexts =
    new H264Cabac.Contexts(sliceQp, ctxInitI)

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
