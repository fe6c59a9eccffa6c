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

  // tier-1 context index space (our own layout; the engine's ctx array
  // is index-agnostic)
  val CtxPartMode = 0
  val CtxPrevIntraLuma = 1
  val CtxChromaPredMode = 2
  val CtxCbfLuma = 3 // +0 trafoDepth>0, +1 depth 0
  val CtxCbfChroma = 5 // +trafoDepth
  val CtxSplitCu = 10 // +ctxInc 0..2
  val CtxSaoMergeUnused = 13

  @inline private def mn(initValue: Int): (Int, Int) =
    ((initValue >> 4) * 5 - 45, ((initValue & 15) << 3) - 16)

  /** I-slice (initType 0) context initialization map for the tier-1
    * contexts, as (m, n) pairs consumable by [[H264Cabac.Contexts]].
    */
  val ctxInitI: Map[Int, (Int, Int)] = Map(
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
    (CtxSplitCu + 2) -> mn(157))

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
}
