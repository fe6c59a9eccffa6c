package graft.multimodal

/** HEVC tier-1 encoder — the fixture-producing inverse of
  * [[H265Decode]]: IDR I-pictures of 16x16 CTUs, each either PCM (raw
  * samples, exact round-trip — the ground-truth path) or an
  * intra-predicted CU with zero residual whose pixels exist only
  * through the §8.4.4.2 prediction machinery. CABAC through the shared
  * engine + [[H265Cabac]] contexts; the MPM encoding replays the
  * decoder's own candidate-list derivation so mode signalling cannot
  * drift (pixel expectations are pinned independently in
  * H265PixelSpec, the r10 lesson).
  */
object H265Encode {

  /** One CTU's content: PCM samples (256 luma + 64 cb + 64 cr bytes)
    * or an intra luma mode 0..34 (chroma rides DM).
    */
  sealed trait Ctu
  final case class Pcm(luma: Array[Byte], cb: Array[Byte],
      cr: Array[Byte]) extends Ctu {
    require(luma.length == 256 && cb.length == 64 && cr.length == 64,
      "PCM payload must be 16x16 + 2x 8x8")
  }
  final case class Intra(mode: Int) extends Ctu {
    require(mode >= 0 && mode <= 34, s"bad intra mode $mode")
  }

  /** Wrap (nalType, EBSP payload) pairs as an Annex-B HEVC stream
    * (2-byte NAL headers, nuh_layer_id 0, tid_plus1 1).
    */
  def annexB(nals: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { case (t, payload) =>
      out.write(Array[Byte](0, 0, 0, 1))
      out.write((t & 0x3f) << 1)
      out.write(1)
      out.write(payload, 0, payload.length)
    }
    out.toByteArray
  }

  /** Encode one IDR picture (`ctus` in CTB raster order, dims implied
    * by ctbW) as a full Annex-B stream: VPS + pixel-tier SPS/PPS + the
    * IDR_W_RADL slice.
    */
  def encodeIntraPicture(ctus: Array[Array[Ctu]], qp: Int = 26): Array[Byte] = {
    val ctbH = ctus.length; val ctbW = ctus.head.length
    require(ctus.forall(_.length == ctbW), "ragged ctus")
    require(qp >= 0 && qp <= 51, s"bad qp $qp")
    val w = new H264.BitWriter
    // slice_segment_header (§7.3.6.1), IDR_W_RADL
    w.flag(true) // first_slice_segment_in_pic_flag
    w.flag(false) // no_output_of_prior_pics_flag
    w.ue(0) // slice_pic_parameter_set_id
    w.ue(2) // slice_type: I
    w.se(qp - 26) // slice_qp_delta (PPS init_qp 26)
    w.u(1, 1) // byte_alignment: alignment_bit_equal_to_one
    w.alignZero()

    val ctx = H265Cabac.contexts(qp)
    var e = new H264Cabac.Encoder(w, ctx)
    // decoder-twin state for the MPM derivation
    val lumaMode = Array.fill(ctbW * ctbH)(1)
    var ctu = 0
    while (ctu < ctbW * ctbH) {
      val ctbX = ctu % ctbW
      e.decision(H265Cabac.CtxPartMode, 1) // part_mode: PART_2Nx2N
      ctus(ctu / ctbW)(ctbX) match {
        case Pcm(l, cbP, crP) =>
          e.terminate(1) // pcm_flag (terminate-coded; flush inside)
          w.alignZero() // pcm_alignment_zero_bit run
          l.foreach(b => w.u(b & 0xff, 8))
          cbP.foreach(b => w.u(b & 0xff, 8))
          crP.foreach(b => w.u(b & 0xff, 8))
          e = new H264Cabac.Encoder(w, ctx) // engine restart, ctx kept
          lumaMode(ctu) = 1
        case Intra(mode) =>
          e.terminate(0) // pcm_flag 0
          val candA = if (ctbX > 0) lumaMode(ctu - 1) else 1
          val mpm = H265Decode.mpmList(candA, 1)
          val inMpm = mpm.indexOf(mode)
          if (inMpm >= 0) {
            e.decision(H265Cabac.CtxPrevIntraLuma, 1)
            H265Cabac.encodeMpmIdx(e, inMpm)
          } else {
            e.decision(H265Cabac.CtxPrevIntraLuma, 0)
            val sorted = mpm.sorted
            var rem = mode
            var i = 2
            while (i >= 0) { if (mode > sorted(i)) rem -= 1; i -= 1 }
            H265Cabac.encodeRemIntra(e, rem)
          }
          H265Cabac.encodeChromaModeDm(e)
          e.decision(H265Cabac.CtxCbfChroma, 0) // cbf_cb
          e.decision(H265Cabac.CtxCbfChroma, 0) // cbf_cr
          e.decision(H265Cabac.CtxCbfLuma + 1, 0) // cbf_luma
          lumaMode(ctu) = mode
      }
      ctu += 1
      e.terminate(if (ctu == ctbW * ctbH) 1 else 0) // end_of_slice
    }
    val slice = H264.ebsp(w.stop())
    annexB(Seq(
      (H265.NalVps, H265.writeVps()),
      (H265.NalSps, H265.writeSpsPixel(ctbW * 16, ctbH * 16)),
      (H265.NalPps, H265.writePpsPixel()),
      (H265.NalIdrWRadl, slice)))
  }

  // ------------------------------------------------------------ tier 2 (r12)

  /** Coding-quadtree layout for [[encodeIntraPicture2]]: a tree per
    * CTB. A leaf carries 1 (2Nx2N) or 4 (NxN — min-CB only) intra luma
    * modes; `splitTu` splits the CU's transform once (2Nx2N CUs with
    * room in the hierarchy). Chroma rides DM.
    */
  sealed trait CuTree
  final case class CuSplit(c0: CuTree, c1: CuTree, c2: CuTree,
      c3: CuTree) extends CuTree
  final case class CuLeaf(modes: Seq[Int], splitTu: Boolean = false)
      extends CuTree {
    require(modes.size == 1 || modes.size == 4, "1 (2Nx2N) or 4 (NxN) modes")
    require(modes.forall(m => m >= 0 && m <= 34), s"bad intra modes $modes")
  }
  /** Inter leaf for P pictures (r12 tier 3): a 2Nx2N PU at quarter-pel
    * `(mvx, mvy)` against the single list-0 reference. The encoder
    * picks the cheapest legal signalling — cu_skip when the MV merges
    * and the residual is zero (or dropped), merge_flag otherwise when
    * it merges, AMVP (best-mvp mvd) when it doesn't. `dropResidual`
    * encodes prediction-only (skip / rqt_root_cbf 0).
    */
  final case class InterLeaf(mvx: Int, mvy: Int,
      dropResidual: Boolean = false, refIdx: Int = 0) extends CuTree {
    require(refIdx >= 0 && refIdx <= 14, s"bad ref idx $refIdx")
  }

  /** Inter leaf for B pictures (r13 tier 4): a 2Nx2N PU with full
    * motion info — `dir` 1 (L0), 2 (L1) or 3 (bi) at quarter-pel MVs
    * against the single reference of each list. Signalling is chosen
    * like [[InterLeaf]]'s: cu_skip when the motion merges and the
    * residual is zero/dropped, merge otherwise when it merges, AMVP
    * (inter_pred_idc + per-list mvd/mvp) when it doesn't.
    */
  final case class BiLeaf(dir: Int, mv0x: Int, mv0y: Int,
      mv1x: Int = 0, mv1y: Int = 0,
      dropResidual: Boolean = false) extends CuTree {
    require(dir >= 1 && dir <= 3, s"bad inter dir $dir")
  }

  final case class Recon(luma: Array[Byte], cb: Array[Byte], cr: Array[Byte])

  /** Encode one IDR picture of `layout` quadtrees over the given
    * SOURCE planes with RESIDUAL CODING at `qp`: per TB, predict from
    * the decoder-twin recon, forward-transform + quantize src − pred,
    * emit the §7.3.8.11 syntax, and reconstruct through the NORMATIVE
    * dequant + inverse transform — so the returned [[Recon]] is
    * bit-exact what a conformant decoder must output. Returns
    * (Annex-B stream, recon).
    *
    * Parent-level chroma cbfs of SPLIT transform trees are emitted as
    * 1 unconditionally (children carry the truthful flags) — legal and
    * simplest; the NxN case, where the parent cbf IS the 4x4 chroma
    * TB's flag, is computed truthfully.
    */
  def encodeIntraPicture2(srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], width: Int, height: Int, layout: Seq[CuTree],
      qp: Int, ctbLog2: Int = 5, minCbLog2: Int = 3, maxTbLog2: Int = 5,
      depthIntra: Int = 1, deblock: Boolean = false,
      sao: Seq[H265Sao.Params] = Nil,
      signHide: Boolean = false): (Array[Byte], Recon) = {
    val ctb = 1 << ctbLog2
    require(width % ctb == 0 && height % ctb == 0, "CTB-aligned dims only")
    require(srcY.length == width * height &&
      srcCb.length == (width >> 1) * (height >> 1) &&
      srcCr.length == srcCb.length, "bad source plane sizes")
    require(qp >= 0 && qp <= 51, s"bad qp $qp")
    val ctbW = width >> ctbLog2
    val ctbH = height >> ctbLog2
    require(layout.size == ctbW * ctbH, "one tree per CTB")
    val useSao = sao.nonEmpty
    require(!useSao || sao.size == layout.size, "one SAO param set per CTB")
    val w = new H264.BitWriter
    w.flag(true) // first_slice_segment_in_pic_flag
    w.flag(false) // no_output_of_prior_pics_flag
    w.ue(0) // slice_pic_parameter_set_id
    w.ue(2) // slice_type: I
    if (useSao) { w.flag(true); w.flag(true) } // slice_sao_luma/chroma
    w.se(qp - 26) // slice_qp_delta (PPS init_qp 26)
    if (deblock || useSao)
      w.flag(true) // slice_loop_filter_across_slices_enabled
    w.u(1, 1); w.alignZero() // byte_alignment

    val ctx = H265Cabac.contexts(qp)
    val e = new H264Cabac.Encoder(w, ctx)
    val pic = new H265Decode.Pic(width, height)
    val enc = new SliceEnc(e, pic, srcY, srcCb, srcCr, qp, ctbLog2,
      minCbLog2, maxTbLog2, depthIntra, sliceType = 2,
      signHide = signHide)
    val saoParams =
      if (useSao) new Array[H265Sao.Params](layout.size) else null
    var ctu = 0
    val nCtu = layout.size
    while (ctu < nCtu) {
      if (useSao) {
        // reference-equal params signal a MERGE with that neighbor
        val p = sao(ctu)
        val mergeL = (ctu % ctbW) > 0 && (p eq sao(ctu - 1))
        val mergeU = !mergeL && ctu >= ctbW && (p eq sao(ctu - ctbW))
        H265Sao.encode(e, saoParams, ctu, ctbW, saoLuma = true,
          saoChroma = true, p, mergeLeft = mergeL, mergeUp = mergeU)
      }
      enc.quadtree((ctu % ctbW) << ctbLog2, (ctu / ctbW) << ctbLog2,
        ctbLog2, 0, layout(ctu))
      ctu += 1
      e.terminate(if (ctu == nCtu) 1 else 0) // end_of_slice_segment_flag
    }
    val slice = H264.ebsp(w.stop())
    val stream = annexB(Seq(
      (H265.NalVps, H265.writeVps()),
      (H265.NalSps, H265.writeSpsPixel2(width, height, ctbLog2, minCbLog2,
        maxTbLog2, depthIntra, sao = useSao)),
      (H265.NalPps, H265.writePpsPixel(deblockDisabled = !deblock,
        signHide = signHide)),
      (H265.NalIdrWRadl, slice)))
    // decoder-twin IN-LOOP filters: deblocking, then SAO over the
    // deblocked picture — the returned recon is what a conformant
    // decoder outputs (and would use as a reference)
    if (deblock)
      H265Deblock.filterPicture(pic, qp, 0, 0, 0, 0)
    if (useSao)
      H265Sao.applyPicture(pic, saoParams, ctbW, ctbH, ctbLog2)
    (stream, Recon(pic.luma, pic.cb, pic.cr))
  }

  /** Encode a GOP (r12 tier 3): one IDR picture carrying `iLayout`
    * (the tier-2 intra machinery) followed by one TRAIL_R P picture
    * per entry of `pLayouts`, each referencing the previously decoded
    * picture (single negative RPS at delta 1, one active list-0
    * reference, MaxNumMergeCand 5, deblocking off). `frames` holds the
    * source planes (luma, cb, cr) per picture. Returns the Annex-B
    * stream and the decoder-twin recon of every picture — bit-exact
    * what a conformant decoder must output.
    */
  def encodeGop(frames: Seq[(Array[Byte], Array[Byte], Array[Byte])],
      width: Int, height: Int, iLayout: Seq[CuTree],
      pLayouts: Seq[Seq[CuTree]], qp: Int, ctbLog2: Int = 5,
      minCbLog2: Int = 3, maxTbLog2: Int = 5,
      depthIntra: Int = 1,
      signHide: Boolean = false): (Array[Byte], Seq[Recon]) = {
    require(frames.nonEmpty && frames.size == pLayouts.size + 1,
      "one source frame for the IDR plus one per P layout")
    val ctbW = width >> ctbLog2
    val (f0y, f0cb, f0cr) = frames.head
    val (iStream, iRecon) = encodeIntraPicture2(f0y, f0cb, f0cr, width,
      height, iLayout, qp, ctbLog2, minCbLog2, maxTbLog2, depthIntra,
      signHide = signHide)
    val idrSlice = H265.nalUnitsAnnexB(iStream)
      .find(_.nalType == H265.NalIdrWRadl).get.payload
    val recons = scala.collection.mutable.ArrayBuffer(iRecon)
    val nals = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])](
      (H265.NalVps, H265.writeVps()),
      (H265.NalSps, H265.writeSpsPixel2(width, height, ctbLog2, minCbLog2,
        maxTbLog2, depthIntra)),
      (H265.NalPps, H265.writePpsPixel(signHide = signHide)),
      (H265.NalIdrWRadl, idrSlice))
    var prev = new H265Decode.Pic(width, height)
    System.arraycopy(iRecon.luma, 0, prev.luma, 0, iRecon.luma.length)
    System.arraycopy(iRecon.cb, 0, prev.cb, 0, iRecon.cb.length)
    System.arraycopy(iRecon.cr, 0, prev.cr, 0, iRecon.cr.length)
    var i = 0
    while (i < pLayouts.size) {
      val poc = i + 1
      val (sy, scb, scr) = frames(i + 1)
      require(pLayouts(i).size == ctbW * (height >> ctbLog2),
        "one tree per CTB")
      val w = new H264.BitWriter
      w.flag(true)  // first_slice_segment_in_pic_flag
      w.ue(0)       // slice_pic_parameter_set_id
      w.ue(1)       // slice_type: P
      w.u(poc & 15, 4) // slice_pic_order_cnt_lsb (log2MaxPocLsb 4)
      w.flag(false) // short_term_ref_pic_set_sps_flag
      w.ue(1); w.ue(0) // st_ref_pic_set: one negative, no positives
      w.ue(0)       // delta_poc_s0_minus1: reference = POC − 1
      w.flag(true)  // used_by_curr_pic_s0_flag
      w.flag(false) // num_ref_idx_active_override (PPS default: 1 active)
      w.ue(0)       // five_minus_max_num_merge_cand → MaxNumMergeCand 5
      w.se(qp - 26) // slice_qp_delta
      // (deblocking disabled in the PPS → no cross-slice filter flag)
      w.u(1, 1); w.alignZero() // byte_alignment
      val ctx = H265Cabac.contextsP(qp)
      val e = new H264Cabac.Encoder(w, ctx)
      val pic = new H265Decode.Pic(width, height)
      val enc = new SliceEnc(e, pic, sy, scb, scr, qp, ctbLog2, minCbLog2,
        maxTbLog2, depthIntra, sliceType = 1, refs0 = IndexedSeq(prev),
        signHide = signHide)
      var ctu = 0
      val nCtu = pLayouts(i).size
      while (ctu < nCtu) {
        enc.quadtree((ctu % ctbW) << ctbLog2, (ctu / ctbW) << ctbLog2,
          ctbLog2, 0, pLayouts(i)(ctu))
        ctu += 1
        e.terminate(if (ctu == nCtu) 1 else 0)
      }
      nals += ((H265.NalTrailR, H264.ebsp(w.stop())))
      recons += Recon(pic.luma.clone(), pic.cb.clone(), pic.cr.clone())
      prev = pic
      i += 1
    }
    (annexB(nals.toSeq), recons.toSeq)
  }

  /** One non-IRAP picture of a [[encodeGopB]] structure, in DECODE
    * order: `sliceType` 1 (P, references POC − `negDelta`) or 0 (B,
    * references POC − `negDelta` and POC + `posDelta`); `isRef` picks
    * TRAIL_R vs TRAIL_N (non-reference B pictures never enter the
    * DPB). Referenced POCs must already be decoded.
    */
  final case class GopPic(poc: Int, sliceType: Int, layout: Seq[CuTree],
      negDelta: Int = 1, posDelta: Int = 1, isRef: Boolean = true,
      weights: Option[H265Inter.PredWeights] = None,
      moreNegDeltas: Seq[Int] = Nil) {
    require(sliceType == 0 || sliceType == 1, "P or B pictures only")
    require(negDelta >= 1 && posDelta >= 1, "bad RPS deltas")
    // r13 multiref: additional PAST references beyond the first, as
    // ABSOLUTE POC deltas in increasing order (P slices only; every
    // listed reference becomes active on L0 in RPS order)
    require(moreNegDeltas.isEmpty || sliceType == 1,
      "multiref is a P-slice tier")
    require((negDelta +: moreNegDeltas) == (negDelta +: moreNegDeltas).sorted &&
      moreNegDeltas.forall(_ > negDelta), "deltas must increase")
    def negDeltas: Seq[Int] = negDelta +: moreNegDeltas
  }

  /** Encode a reordered GOP (r13 tier 4): one IDR at POC 0 carrying
    * `iLayout`, then `pics` in DECODE order — e.g. the classic
    * I0 P2 B1 structure, where B1's L0 = {I0} and L1 = {P2}. `frames`
    * holds source planes per picture, in the SAME decode order
    * (head = IDR). Slice headers carry the §7.4.8 short-term RPS of
    * each picture (one used negative, plus one used positive for B),
    * one active reference per list, MaxNumMergeCand 5, mvd_l1_zero 0,
    * deblocking off. Returns the Annex-B stream and the decoder-twin
    * recon of every picture in DISPLAY (POC) order — bit-exact what a
    * conformant decoder must output.
    */
  def encodeGopB(frames: Seq[(Array[Byte], Array[Byte], Array[Byte])],
      width: Int, height: Int, iLayout: Seq[CuTree],
      pics: Seq[GopPic], qp: Int, ctbLog2: Int = 5,
      minCbLog2: Int = 3, maxTbLog2: Int = 5,
      depthIntra: Int = 1,
      cabacInit: Boolean = false,
      decPicBuffering: Int = 3,
      signHide: Boolean = false,
      temporalMvp: Boolean = false): (Array[Byte], Seq[Recon]) = {
    require(frames.nonEmpty && frames.size == pics.size + 1,
      "one source frame for the IDR plus one per GOP picture")
    val ctbW = width >> ctbLog2
    val (f0y, f0cb, f0cr) = frames.head
    val (iStream, iRecon) = encodeIntraPicture2(f0y, f0cb, f0cr, width,
      height, iLayout, qp, ctbLog2, minCbLog2, maxTbLog2, depthIntra,
      signHide = signHide)
    val idrSlice = H265.nalUnitsAnnexB(iStream)
      .find(_.nalType == H265.NalIdrWRadl).get.payload
    val recons = scala.collection.mutable.ArrayBuffer((0, iRecon))
    val nals = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])](
      // VPS ordering info must COVER the SPS's (§7.4.3.2.1) — the r15
      // libde265 rung caught the hardcoded (1, 0) VPS under this
      // (dpb, 1) SPS making external decoders output in decode order
      (H265.NalVps, H265.writeVps(decPicBuffering, reorderPics = 1)),
      (H265.NalSps, H265.writeSpsPixel2(width, height, ctbLog2, minCbLog2,
        maxTbLog2, depthIntra, decPicBuffering = decPicBuffering,
        reorderPics = 1, temporalMvp = temporalMvp)),
      (H265.NalPps, H265.writePpsPixel(cabacInit = cabacInit,
        weightedPred = pics.exists(p => p.sliceType == 1 && p.weights.isDefined),
        weightedBipred = pics.exists(p => p.sliceType == 0 && p.weights.isDefined),
        signHide = signHide)),
      (H265.NalIdrWRadl, idrSlice))
    val anyWp = pics.exists(p => p.sliceType == 1 && p.weights.isDefined)
    val anyWbp = pics.exists(p => p.sliceType == 0 && p.weights.isDefined)
    // decoder-twin DPB of reference recons, keyed by POC
    val dpb = scala.collection.mutable.LinkedHashMap.empty[Int, H265Decode.Pic]
    val idrPic = new H265Decode.Pic(width, height)
    System.arraycopy(iRecon.luma, 0, idrPic.luma, 0, iRecon.luma.length)
    System.arraycopy(iRecon.cb, 0, idrPic.cb, 0, iRecon.cb.length)
    System.arraycopy(iRecon.cr, 0, idrPic.cr, 0, iRecon.cr.length)
    dpb(0) = idrPic
    var i = 0
    while (i < pics.size) {
      val spec = pics(i)
      val (sy, scb, scr) = frames(i + 1)
      require(spec.layout.size == ctbW * (height >> ctbLog2),
        "one tree per CTB")
      val bSlice = spec.sliceType == 0
      val refPocs0 = spec.negDeltas.map(spec.poc - _).toIndexedSeq
      val refPoc1 = spec.poc + spec.posDelta
      val refs0 = refPocs0.map(p => dpb.getOrElse(p,
        throw new IllegalArgumentException(s"ref POC $p not decoded")))
      val ref1 = if (!bSlice) null
        else dpb.getOrElse(refPoc1,
          throw new IllegalArgumentException(s"ref POC $refPoc1 not decoded"))
      require(spec.weights.isEmpty || refs0.size == 1,
        "weighted prediction with multiple references out of the tier")
      val w = new H264.BitWriter
      w.flag(true)  // first_slice_segment_in_pic_flag
      w.ue(0)       // slice_pic_parameter_set_id
      w.ue(spec.sliceType) // slice_type
      w.u(spec.poc & 15, 4) // slice_pic_order_cnt_lsb (log2MaxPocLsb 4)
      w.flag(false) // short_term_ref_pic_set_sps_flag
      // st_ref_pic_set: deltas emit DIFFERENTIALLY (§7.4.8)
      w.ue(spec.negDeltas.size); w.ue(if (bSlice) 1 else 0)
      var prevDelta = 0
      spec.negDeltas.foreach { d =>
        w.ue(d - prevDelta - 1) // delta_poc_s0_minus1
        w.flag(true)            // used_by_curr_pic_s0_flag
        prevDelta = d
      }
      if (bSlice) {
        w.ue(spec.posDelta - 1) // delta_poc_s1_minus1
        w.flag(true) // used_by_curr_pic_s1_flag
      }
      // slice_temporal_mvp_enabled_flag (§7.3.6.1, r15)
      if (temporalMvp) w.flag(true)
      if (refs0.size > 1) {
        w.flag(true)              // num_ref_idx_active_override
        w.ue(refs0.size - 1)      // num_ref_idx_l0_active_minus1
        if (bSlice) w.ue(0)
      } else w.flag(false)        // PPS defaults: 1 active each
      if (bSlice) w.flag(false) // mvd_l1_zero_flag
      // cabac_init_flag = 1 when the PPS enables it: swap the P/B
      // context init tables (§9.3.2.2)
      if (cabacInit) w.flag(true)
      // collocated_from_l0 (B; the encoder always collocates on the
      // closest L0 reference) + collocated_ref_idx when L0 has >1
      // active entry (§7.3.6.1)
      if (temporalMvp) {
        if (bSlice) w.flag(true)
        if (refs0.size > 1) w.ue(0)
      }
      // pred_weight_table when this slice type is PPS-weighted (a
      // weighted GOP must give EVERY such slice a table — the PPS
      // flag makes it mandatory; GopPic.weights None = the defaults,
      // written explicitly-absent via zero flags)
      if ((bSlice && anyWbp) || (!bSlice && anyWp)) {
        val pw = spec.weights.getOrElse(
          H265Inter.PredWeights.default(0, 0))
        w.ue(pw.lumaDenom)
        w.se(pw.chromaDenom - pw.lumaDenom)
        def one(y: H265Inter.Wp, cb: H265Inter.Wp,
            cr: H265Inter.Wp): Unit = {
          val defY = y == H265Inter.Wp(1 << pw.lumaDenom, 0)
          val defC = cb == H265Inter.Wp(1 << pw.chromaDenom, 0) &&
            cr == H265Inter.Wp(1 << pw.chromaDenom, 0)
          w.flag(!defY); w.flag(!defC)
          if (!defY) { w.se(y.w - (1 << pw.lumaDenom)); w.se(y.o) }
          if (!defC) Seq(cb, cr).foreach { c =>
            w.se(c.w - (1 << pw.chromaDenom))
            w.se(c.o + (((128 * c.w) >> pw.chromaDenom) - 128))
          }
        }
        one(pw.l0y, pw.l0cb, pw.l0cr)
        if (bSlice) one(pw.l1y, pw.l1cb, pw.l1cr)
      }
      w.ue(0)       // five_minus_max_num_merge_cand → MaxNumMergeCand 5
      w.se(qp - 26) // slice_qp_delta
      // (deblocking disabled in the PPS → no cross-slice filter flag)
      w.u(1, 1); w.alignZero() // byte_alignment
      val swapped = if (cabacInit) !bSlice else bSlice
      val ctx = if (swapped) H265Cabac.contextsB(qp)
        else H265Cabac.contextsP(qp)
      val e = new H264Cabac.Encoder(w, ctx)
      val pic = new H265Decode.Pic(width, height)
      val effWeights =
        if ((bSlice && anyWbp) || (!bSlice && anyWp))
          Some(spec.weights.getOrElse(H265Inter.PredWeights.default(0, 0)))
        else None
      // decoder-twin ColCtx: collocate on L0 entry 0 (matches the
      // header syntax above); the referenced Pic carries its own lists
      val col =
        if (temporalMvp) Some(H265Inter.ColCtx(refs0.head, refPocs0.head,
          spec.poc, ctbLog2,
          allRefsBefore = refPocs0.forall(_ <= spec.poc) &&
            (!bSlice || refPoc1 <= spec.poc),
          colFromL0 = true))
        else None
      val enc = new SliceEnc(e, pic, sy, scb, scr, qp, ctbLog2, minCbLog2,
        maxTbLog2, depthIntra, sliceType = spec.sliceType, refs0 = refs0,
        refPic1 = ref1, currPoc = spec.poc,
        refPocs0 = refPocs0, refPoc1 = if (bSlice) refPoc1 else 0,
        weights = effWeights, activeL0 = refs0.size, signHide = signHide,
        col = col)
      var ctu = 0
      val nCtu = spec.layout.size
      while (ctu < nCtu) {
        enc.quadtree((ctu % ctbW) << ctbLog2, (ctu / ctbW) << ctbLog2,
          ctbLog2, 0, spec.layout(ctu))
        ctu += 1
        e.terminate(if (ctu == nCtu) 1 else 0)
      }
      nals += ((if (spec.isRef) H265.NalTrailR else H265.NalTrailN,
        H264.ebsp(w.stop())))
      recons += ((spec.poc,
        Recon(pic.luma.clone(), pic.cb.clone(), pic.cr.clone())))
      if (spec.isRef) {
        // TMVP metadata for later pictures collocating on this one
        pic.tmvpRefPocs0 = refPocs0
        if (bSlice) pic.tmvpRefPocs1 = IndexedSeq(refPoc1)
        dpb(spec.poc) = pic
        // decoder-twin eviction mirrors H265Decode: FIFO depth from
        // the declared SPS buffering, floored at the legacy 8 (r14)
        if (dpb.size > math.max(8, decPicBuffering + 1))
          dpb.remove(dpb.head._1)
      }
      i += 1
    }
    (annexB(nals.toSeq), recons.sortBy(_._1).map(_._2).toSeq)
  }

  /** Decoder-twin slice encoder shared by the tier-2 intra writer and
    * the tier-3 P-picture writer: one copy of the prediction /
    * quantization / transform-tree / CU emission logic over the SAME
    * [[H265Decode.Pic]] state machine the decoder runs, so signalling
    * and recon cannot drift between slice types (the r10 lesson).
    */
  private final class SliceEnc(e: H264Cabac.Encoder, pic: H265Decode.Pic,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      qp: Int, ctbLog2: Int, minCbLog2: Int, maxTbLog2: Int,
      depthIntra: Int, sliceType: Int,
      refs0: IndexedSeq[H265Decode.Pic] = IndexedSeq.empty,
      maxMerge: Int = 5,
      refPic1: H265Decode.Pic = null, currPoc: Int = 0,
      refPocs0: IndexedSeq[Int] = IndexedSeq(0), refPoc1: Int = 0,
      weights: Option[H265Inter.PredWeights] = None,
      activeL0: Int = 1, signHide: Boolean = false,
      col: Option[H265Inter.ColCtx] = None) {
    private val refPocs1 = IndexedSeq(refPoc1)
    private val qpCb = H265Transform.chromaQp(math.max(0, math.min(57, qp)))

    // ---- per-TB helpers against the decoder-twin recon state
    private def predQuant(plane: Array[Byte], src: Array[Byte], stride: Int,
        px: Int, py: Int, log2Size: Int, mode: Int,
        luma: Boolean): Array[Int] = {
      val n = 1 << log2Size
      val avail: (Int, Int) => Boolean =
        if (luma) pic.availLuma else pic.availChroma
      H265Decode.predictIntra(plane, stride, px, py, n, mode, luma, avail)
      val res = new Array[Int](n * n)
      var y = 0
      while (y < n) {
        var x = 0
        while (x < n) {
          res(y * n + x) = (src((py + y) * stride + px + x) & 0xff) -
            (plane((py + y) * stride + px + x) & 0xff)
          x += 1
        }
        y += 1
      }
      val dst = luma && n == 4
      H265Transform.quantize(
        H265Transform.forwardTransform(res, log2Size, dst), log2Size,
        if (luma) qp else qpCb)
    }
    def reconTb(plane: Array[Byte], stride: Int, px: Int, py: Int,
        log2Size: Int, levels: Array[Int], luma: Boolean): Unit = {
      val n = 1 << log2Size
      if (levels != null && levels.exists(_ != 0)) {
        val deq = H265Transform.dequant(levels, log2Size,
          if (luma) qp else qpCb)
        val res = H265Transform.inverseTransform(deq, log2Size,
          dst = luma && n == 4)
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) {
            val idx = (py + y) * stride + px + x
            val v = (plane(idx) & 0xff) + res(y * n + x)
            plane(idx) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            x += 1
          }
          y += 1
        }
      }
      if (luma) pic.markLuma(px, py, n) else pic.markChroma(px, py, n)
    }
    def emitResidual(levels: Array[Int], log2Size: Int, luma: Boolean,
        mode: Int): Unit =
      encodeResidual(e, levels, log2Size, luma,
        H265Transform.scanIdxFor(log2Size, luma, mode), signHide)

    // ---- transform tree encoder (mirrors H265Decode.transformTree)
    def transformTree(cuX: Int, cuY: Int, log2CbSize: Int, nxn: Boolean,
        modes: IndexedSeq[Int], splitTu: Boolean, x0: Int, y0: Int,
        xBase: Int, yBase: Int, log2Size: Int, depth: Int, blkIdx: Int,
        parentChroma: Option[(Array[Int], Array[Int])]): Unit = {
      val intraSplit = nxn && depth == 0
      val maxDepth = depthIntra + (if (nxn) 1 else 0)
      val decodable = log2Size <= maxTbLog2 && log2Size > 2 &&
        depth < maxDepth && !intraSplit
      val split =
        if (log2Size > maxTbLog2) true
        else if (intraSplit) true
        else if (decodable) {
          val v = splitTu && depth == 0
          e.decision(H265Cabac.CtxTransSubdiv + 5 - log2Size, if (v) 1 else 0)
          v
        } else false
      def lumaModeAt(x: Int, y: Int): Int =
        if (!nxn) modes(0)
        else {
          val half = 1 << (log2CbSize - 1)
          modes((if (y - cuY >= half) 2 else 0) + (if (x - cuX >= half) 1 else 0))
        }
      val chromaMode = modes(0)
      if (split) {
        // children at 4x4 luma → the 4x4 chroma TB is coded at THIS
        // level's cbfs: compute it truthfully now (its prediction only
        // needs neighbors outside this CU's chroma area)
        val childChroma: Option[(Array[Int], Array[Int])] =
          if (log2Size == 3) {
            val cx = x0 >> 1; val cy = y0 >> 1
            val lvCb = predQuant(pic.cb, srcCb, pic.chromaStride, cx, cy, 2,
              chromaMode, luma = false)
            val lvCr = predQuant(pic.cr, srcCr, pic.chromaStride, cx, cy, 2,
              chromaMode, luma = false)
            e.decision(H265Cabac.CtxCbfChroma + depth,
              if (lvCb.exists(_ != 0)) 1 else 0)
            e.decision(H265Cabac.CtxCbfChroma + depth,
              if (lvCr.exists(_ != 0)) 1 else 0)
            Some((lvCb, lvCr))
          } else {
            // parent chroma cbfs: emitted 1, children carry the truth
            e.decision(H265Cabac.CtxCbfChroma + depth, 1)
            e.decision(H265Cabac.CtxCbfChroma + depth, 1)
            None
          }
        val h = 1 << (log2Size - 1)
        transformTree(cuX, cuY, log2CbSize, nxn, modes, splitTu,
          x0, y0, x0, y0, log2Size - 1, depth + 1, 0, childChroma)
        transformTree(cuX, cuY, log2CbSize, nxn, modes, splitTu,
          x0 + h, y0, x0, y0, log2Size - 1, depth + 1, 1, childChroma)
        transformTree(cuX, cuY, log2CbSize, nxn, modes, splitTu,
          x0, y0 + h, x0, y0, log2Size - 1, depth + 1, 2, childChroma)
        transformTree(cuX, cuY, log2CbSize, nxn, modes, splitTu,
          x0 + h, y0 + h, x0, y0, log2Size - 1, depth + 1, 3, childChroma)
      } else {
        // leaf: chroma first (pred independent of this leaf's luma),
        // so the tree-level cbfs can be truthful
        var lvCb: Array[Int] = null
        var lvCr: Array[Int] = null
        if (log2Size > 2) {
          val cx = x0 >> 1; val cy = y0 >> 1
          lvCb = predQuant(pic.cb, srcCb, pic.chromaStride, cx, cy,
            log2Size - 1, chromaMode, luma = false)
          lvCr = predQuant(pic.cr, srcCr, pic.chromaStride, cx, cy,
            log2Size - 1, chromaMode, luma = false)
          if (depth == 0 || parentChroma.isEmpty) {
            // depth 0: decoded; depth > 0 under the emitted-1 parent:
            // also decoded
            e.decision(H265Cabac.CtxCbfChroma + depth,
              if (lvCb.exists(_ != 0)) 1 else 0)
            e.decision(H265Cabac.CtxCbfChroma + depth,
              if (lvCr.exists(_ != 0)) 1 else 0)
          }
        }
        val mode = lumaModeAt(x0, y0)
        val lvY = predQuant(pic.luma, srcY, pic.lumaStride, x0, y0,
          log2Size, mode, luma = true)
        val cbfL = lvY.exists(_ != 0)
        e.decision(H265Cabac.CtxCbfLuma + (if (depth == 0) 1 else 0),
          if (cbfL) 1 else 0)
        if (cbfL) emitResidual(lvY, log2Size, luma = true, mode)
        reconTb(pic.luma, pic.lumaStride, x0, y0, log2Size, lvY, luma = true)
        if (log2Size > 2) {
          val cx = x0 >> 1; val cy = y0 >> 1
          if (lvCb.exists(_ != 0))
            emitResidual(lvCb, log2Size - 1, luma = false, chromaMode)
          reconTb(pic.cb, pic.chromaStride, cx, cy, log2Size - 1, lvCb,
            luma = false)
          if (lvCr.exists(_ != 0))
            emitResidual(lvCr, log2Size - 1, luma = false, chromaMode)
          reconTb(pic.cr, pic.chromaStride, cx, cy, log2Size - 1, lvCr,
            luma = false)
        } else if (blkIdx == 3) {
          val (pCb, pCr) = parentChroma.get
          val cx = xBase >> 1; val cy = yBase >> 1
          if (pCb.exists(_ != 0)) emitResidual(pCb, 2, luma = false, chromaMode)
          reconTb(pic.cb, pic.chromaStride, cx, cy, 2, pCb, luma = false)
          if (pCr.exists(_ != 0)) emitResidual(pCr, 2, luma = false, chromaMode)
          reconTb(pic.cr, pic.chromaStride, cx, cy, 2, pCr, luma = false)
        }
      }
    }

    // ---- coding unit / quadtree encoders (mirror the decoder)
    def codingUnit(x0: Int, y0: Int, log2CbSize: Int, cqtDepth: Int,
        leaf: CuLeaf): Unit = {
      val nCb = 1 << log2CbSize
      pic.setDepth(x0, y0, nCb, cqtDepth)
      if (sliceType != 2) {
        // intra CU inside a P slice: cu_skip 0, pred_mode MODE_INTRA
        val skipCtx = pic.skipAt(x0 - 1, y0) + pic.skipAt(x0, y0 - 1)
        e.decision(H265Cabac.CtxCuSkip + skipCtx, 0)
        e.decision(H265Cabac.CtxPredMode, 1)
      }
      val nxn = leaf.modes.size == 4
      if (log2CbSize == minCbLog2 && log2CbSize > 2)
        e.decision(H265Cabac.CtxPartMode, if (nxn) 0 else 1)
      else require(!nxn, "NxN only at min CB with TU split room")
      // (tier-2 SPS: no PCM, so pcm_flag is never present)
      val nPu = if (nxn) 4 else 1
      val puSize = if (nxn) nCb >> 1 else nCb
      val ctbMask = ~((1 << ctbLog2) - 1)
      // pass A: derive MPM per PU in decode order (grid updated between)
      val inMpm = new Array[Int](nPu)
      val rems = new Array[Int](nPu)
      val mpms = new Array[Array[Int]](nPu)
      var p = 0
      while (p < nPu) {
        val xPb = x0 + (if ((p & 1) == 1) puSize else 0)
        val yPb = y0 + (if (p >= 2) puSize else 0)
        val mode = leaf.modes(p)
        val candA = pic.candMode(xPb - 1, yPb, aboveOutsideCtb = false)
        val candB = pic.candMode(xPb, yPb - 1,
          aboveOutsideCtb = (yPb - 1) < (yPb & ctbMask))
        val mpm = H265Decode.mpmList(candA, candB)
        mpms(p) = mpm
        inMpm(p) = mpm.indexOf(mode)
        if (inMpm(p) < 0) {
          val sorted = mpm.sorted
          var rem = mode
          var i = 2
          while (i >= 0) { if (mode > sorted(i)) rem -= 1; i -= 1 }
          rems(p) = rem
        }
        pic.setMode(xPb, yPb, puSize, mode)
        p += 1
      }
      // emit: all prev flags first, then per-PU mpm_idx / rem (§7.3.8.5)
      p = 0
      while (p < nPu) {
        e.decision(H265Cabac.CtxPrevIntraLuma, if (inMpm(p) >= 0) 1 else 0)
        p += 1
      }
      p = 0
      while (p < nPu) {
        if (inMpm(p) >= 0) H265Cabac.encodeMpmIdx(e, inMpm(p))
        else H265Cabac.encodeRemIntra(e, rems(p))
        p += 1
      }
      H265Cabac.encodeChromaModeDm(e)
      transformTree(x0, y0, log2CbSize, nxn, leaf.modes.toIndexedSeq,
        leaf.splitTu, x0, y0, x0, y0, log2CbSize, 0, 0, None)
    }
    /** One inter CU (tier 3): 2Nx2N PU at the leaf's MV, signalled as
      * cu_skip / merge / AMVP by what the decoder-twin's candidate
      * lists offer, residual (TU = CU) through the normative quantize
      * → emit → dequant recon path.
      */
    def interCu(x0: Int, y0: Int, log2CbSize: Int, cqtDepth: Int,
        mi: H265Inter.Mi, dropResidual: Boolean): Unit = {
      val bSlice = sliceType == 0
      require(refs0.nonEmpty, "inter leaf outside an inter slice")
      require(!mi.has(1) || refPic1 != null, "list-1 motion outside a B slice")
      require(bSlice || mi.dir == 1, "L1/bi motion in a P slice")
      require(mi.ref0 < activeL0, "ref_idx beyond the active references")
      require(log2CbSize <= maxTbLog2,
        "fixture encoder: inter CU must fit one TU")
      val nCb = 1 << log2CbSize
      pic.setDepth(x0, y0, nCb, cqtDepth)
      val cands = H265Inter.mergeCandidatesMi(pic, x0, y0, nCb, nCb,
        maxMerge, bSlice, refPocs0, refPocs1,
        numRefMerge = if (bSlice) 1 else activeL0, col = col)
      val mergeIdx = cands.indexOf(mi)
      // prediction first (into the twin planes), then residual decisions
      weights match {
        case Some(pw) => H265Inter.mcCuWp(refs0(mi.ref0), refPic1,
          pic, x0, y0, nCb, mi, pw)
        case None => H265Inter.mcCuMi(refs0(mi.ref0), refPic1,
          pic, x0, y0, nCb, mi)
      }
      def resid(plane: Array[Byte], src: Array[Byte], stride: Int,
          px: Int, py: Int, l2: Int, luma: Boolean): Array[Int] = {
        val n = 1 << l2
        val res = new Array[Int](n * n)
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) {
            res(y * n + x) = (src((py + y) * stride + px + x) & 0xff) -
              (plane((py + y) * stride + px + x) & 0xff)
            x += 1
          }
          y += 1
        }
        H265Transform.quantize(
          H265Transform.forwardTransform(res, l2, dst = false), l2,
          if (luma) qp else qpCb)
      }
      val lvY = if (dropResidual) null
        else resid(pic.luma, srcY, pic.lumaStride, x0, y0, log2CbSize,
          luma = true)
      val lvCb = if (dropResidual) null
        else resid(pic.cb, srcCb, pic.chromaStride, x0 >> 1, y0 >> 1,
          log2CbSize - 1, luma = false)
      val lvCr = if (dropResidual) null
        else resid(pic.cr, srcCr, pic.chromaStride, x0 >> 1, y0 >> 1,
          log2CbSize - 1, luma = false)
      val cbfY = lvY != null && lvY.exists(_ != 0)
      val cbfCb = lvCb != null && lvCb.exists(_ != 0)
      val cbfCr = lvCr != null && lvCr.exists(_ != 0)
      val anyCbf = cbfY || cbfCb || cbfCr
      val skip = mergeIdx >= 0 && !anyCbf
      val skipCtx = pic.skipAt(x0 - 1, y0) + pic.skipAt(x0, y0 - 1)
      e.decision(H265Cabac.CtxCuSkip + skipCtx, if (skip) 1 else 0)
      if (skip) H265Cabac.encodeMergeIdx(e, mergeIdx, maxMerge)
      else {
        e.decision(H265Cabac.CtxPredMode, 0) // MODE_INTER
        e.decision(H265Cabac.CtxPartMode, 1) // PART_2Nx2N
        if (mergeIdx >= 0) {
          // merge non-skip: rqt_root_cbf is inferred 1, so the
          // residual must be live (the zero-residual case IS skip)
          e.decision(H265Cabac.CtxMergeFlag, 1)
          H265Cabac.encodeMergeIdx(e, mergeIdx, maxMerge)
        } else {
          e.decision(H265Cabac.CtxMergeFlag, 0)
          if (bSlice)
            H265Cabac.encodeInterPredIdc(e, cqtDepth,
              mi.dir match { case 1 => 0; case 2 => 1; case _ => 2 })
          var list = 0
          while (list < 2) {
            if (mi.has(list)) {
              val (mvx, mvy) = mi.mv(list)
              if (list == 0)
                H265Cabac.encodeRefIdx(e, mi.ref0, activeL0)
              val mvps = H265Inter.amvpCandidatesMi(pic, x0, y0, nCb, nCb,
                list, currPoc, refPocs0, refPocs1,
                refIdx = mi.ref(list), col = col)
              val c0 = math.abs(mvx - mvps(0)._1) + math.abs(mvy - mvps(0)._2)
              val c1 = math.abs(mvx - mvps(1)._1) + math.abs(mvy - mvps(1)._2)
              val mvpIdx = if (c1 < c0) 1 else 0
              // (mvd_l1_zero_flag is written 0 in the tier headers, so
              // mvd_coding is always present for a used list)
              H265Cabac.encodeMvd(e, mvx - mvps(mvpIdx)._1,
                mvy - mvps(mvpIdx)._2)
              e.decision(H265Cabac.CtxMvpFlag, mvpIdx)
            }
            list += 1
          }
          e.decision(H265Cabac.CtxRqtRootCbf, if (anyCbf) 1 else 0)
        }
        if (anyCbf || mergeIdx >= 0) {
          // transform_tree depth 0, TU = CU (hierarchy depth 0 for
          // inter in the tier SPS → no split flag): chroma cbfs, then
          // cbf_luma (parsed only when a chroma cbf is set, §7.3.8.8)
          e.decision(H265Cabac.CtxCbfChroma + 0, if (cbfCb) 1 else 0)
          e.decision(H265Cabac.CtxCbfChroma + 0, if (cbfCr) 1 else 0)
          if (cbfCb || cbfCr)
            e.decision(H265Cabac.CtxCbfLuma + 1, if (cbfY) 1 else 0)
          else require(cbfY,
            "inter TU with inferred cbf_luma must carry luma residual")
          if (cbfY)
            encodeResidual(e, lvY, log2CbSize, luma = true,
              H265Transform.ScanDiag, signHide)
        }
      }
      // recon + grids (reconTb adds the residual and marks progress;
      // inter TBs scan diagonally and skip intra prediction)
      reconTb(pic.luma, pic.lumaStride, x0, y0, log2CbSize,
        if (skip) null else lvY, luma = true)
      if (!skip && cbfCb)
        encodeResidual(e, lvCb, log2CbSize - 1, luma = false,
          H265Transform.ScanDiag, signHide)
      reconTb(pic.cb, pic.chromaStride, x0 >> 1, y0 >> 1, log2CbSize - 1,
        if (skip) null else lvCb, luma = false)
      if (!skip && cbfCr)
        encodeResidual(e, lvCr, log2CbSize - 1, luma = false,
          H265Transform.ScanDiag, signHide)
      reconTb(pic.cr, pic.chromaStride, x0 >> 1, y0 >> 1, log2CbSize - 1,
        if (skip) null else lvCr, luma = false)
      pic.setMotion2(x0, y0, nCb, mi, skip)
      pic.setMode(x0, y0, nCb, 1) // inter is DC for intra MPMs
    }

    def quadtree(x0: Int, y0: Int, log2CbSize: Int, cqtDepth: Int,
        tree: CuTree): Unit = tree match {
      case CuSplit(c0, c1, c2, c3) =>
        require(log2CbSize > minCbLog2, "split below min CB")
        val ctxInc = pic.depthGt(x0 - 1, y0, cqtDepth) +
          pic.depthGt(x0, y0 - 1, cqtDepth)
        e.decision(H265Cabac.CtxSplitCu + ctxInc, 1)
        val h = 1 << (log2CbSize - 1)
        quadtree(x0, y0, log2CbSize - 1, cqtDepth + 1, c0)
        quadtree(x0 + h, y0, log2CbSize - 1, cqtDepth + 1, c1)
        quadtree(x0, y0 + h, log2CbSize - 1, cqtDepth + 1, c2)
        quadtree(x0 + h, y0 + h, log2CbSize - 1, cqtDepth + 1, c3)
      case leaf =>
        if (log2CbSize > minCbLog2) {
          val ctxInc = pic.depthGt(x0 - 1, y0, cqtDepth) +
            pic.depthGt(x0, y0 - 1, cqtDepth)
          e.decision(H265Cabac.CtxSplitCu + ctxInc, 0)
        }
        leaf match {
          case l: CuLeaf => codingUnit(x0, y0, log2CbSize, cqtDepth, l)
          case l: InterLeaf => interCu(x0, y0, log2CbSize, cqtDepth,
            H265Inter.Mi(1, l.mvx, l.mvy, 0, 0, l.refIdx), l.dropResidual)
          case l: BiLeaf => interCu(x0, y0, log2CbSize, cqtDepth,
            H265Inter.Mi(l.dir, l.mv0x, l.mv0y, l.mv1x, l.mv1y),
            l.dropResidual)
          case _: CuSplit => throw new IllegalStateException("unreachable")
        }
    }
  }

  /** residual_coding() emitter — the bit-exact mirror of
    * [[H265Decode]]'s decode flow (same context derivations in the
    * same order). `levels` must contain at least one nonzero.
    */
  /** CABAC residual mirror of [[H265Decode.decodeResidual]].
    *
    * `signHide` (r15): when set and a CG's reverse-scan span exceeds 3,
    * the first-in-scan sign is NOT written — the decoder infers it
    * from the CG's absolute-level parity (§7.4.9.11). When the current
    * parity would imply the wrong sign, the encoder repairs it by
    * bumping |last-in-scan significant coefficient| by one IN PLACE
    * (the standard encoder-side distortion trade); callers MUST
    * reconstruct from the same `levels` array AFTER this call (every
    * tier-2/3 path already emits before reconTb), which keeps the
    * decoder twin and external decoders bit-identical.
    */
  private[multimodal] def encodeResidual(e: H264Cabac.Encoder,
      levels: Array[Int], log2Size: Int, luma: Boolean,
      scanIdx: Int, signHide: Boolean = false): Unit = {
    import H265Cabac._
    val n = 1 << log2Size
    val sub = H265Transform.scan(4, scanIdx)
    val cgSize = math.max(n >> 2, 1)
    val cg = H265Transform.scan(cgSize, scanIdx)
    @inline def level(cgPos: Int, posInCg: Int): Int = {
      val p = sub(posInCg)
      val xC = ((cgPos % cgSize) << 2) + (p & 3)
      val yC = ((cgPos / cgSize) << 2) + (p >> 2)
      levels(yC * n + xC)
    }
    // last significant coefficient in scan order
    var lastSubBlock = -1
    var lastPosInCg = -1
    var i = cg.length - 1
    while (i >= 0 && lastSubBlock < 0) {
      var n0 = 15
      while (n0 >= 0 && lastSubBlock < 0) {
        if (level(cg(i), n0) != 0) { lastSubBlock = i; lastPosInCg = n0 }
        n0 -= 1
      }
      i -= 1
    }
    require(lastSubBlock >= 0, "encodeResidual on all-zero levels")
    val lastP = sub(lastPosInCg)
    var lastX = ((cg(lastSubBlock) % cgSize) << 2) + (lastP & 3)
    var lastY = ((cg(lastSubBlock) / cgSize) << 2) + (lastP >> 2)
    if (scanIdx == H265Transform.ScanVer) {
      val t = lastX; lastX = lastY; lastY = t
    }
    val pX = lastPrefixOf(lastX, log2Size)
    val pY = lastPrefixOf(lastY, log2Size)
    encodeLastPrefix(e, CtxLastX, log2Size, luma, pX)
    encodeLastPrefix(e, CtxLastY, log2Size, luma, pY)
    encodeLastSuffix(e, pX, lastX)
    encodeLastSuffix(e, pY, lastY)
    val csbf = new Array[Boolean](cgSize * cgSize)
    var j = 0
    while (j < cg.length) {
      var any = false
      var n0 = 0
      while (n0 < 16 && !any) { any = level(cg(j), n0) != 0; n0 += 1 }
      csbf(cg(j)) = any
      j += 1
    }
    csbf(cg(lastSubBlock)) = true
    var c1 = 1
    i = lastSubBlock
    while (i >= 0) {
      val cgPos = cg(i)
      val xS = cgPos % cgSize; val yS = cgPos / cgSize
      var infer = false
      val coded =
        if (i == lastSubBlock || i == 0) { csbf(cgPos) = true; true }
        else {
          val right = xS + 1 < cgSize && csbf(yS * cgSize + xS + 1)
          val below = yS + 1 < cgSize && csbf((yS + 1) * cgSize + xS)
          val ctxInc = (if (luma) 0 else 2) + (if (right || below) 1 else 0)
          infer = true
          e.decision(CtxCsbf + ctxInc, if (csbf(cgPos)) 1 else 0)
          csbf(cgPos)
        }
      if (coded) {
        val sigPos = new Array[Int](16)
        var nSig = 0
        var n0 = if (i == lastSubBlock) lastPosInCg else 15
        if (i == lastSubBlock) { sigPos(nSig) = lastPosInCg; nSig += 1; n0 -= 1 }
        while (n0 >= 0) {
          val sig = level(cgPos, n0) != 0
          if (n0 > 0 || !infer) {
            val p = sub(n0)
            val xC = (xS << 2) + (p & 3); val yC = (yS << 2) + (p >> 2)
            val right = xS + 1 < cgSize && csbf(yS * cgSize + xS + 1)
            val below = yS + 1 < cgSize && csbf((yS + 1) * cgSize + xS)
            e.decision(CtxSig +
              H265Decode.sigCtxInc(luma, xC, yC, log2Size, scanIdx, right, below),
              if (sig) 1 else 0)
            if (sig) { sigPos(nSig) = n0; nSig += 1; infer = false }
          } else {
            // DC of a decoded-csbf CG with no other sig: inferred 1 —
            // csbf(cgPos) == true guarantees it IS significant
            require(sig, "inferred-DC CG with zero DC")
            sigPos(nSig) = 0; nSig += 1
          }
          n0 -= 1
        }
        if (nSig > 0) {
          // §7.4.9.11 span test (sigPos is in reverse-scan order);
          // parity repair must precede the g1/g2/remaining passes so
          // they read the repaired magnitudes
          val signHidden = signHide && sigPos(0) - sigPos(nSig - 1) > 3
          if (signHidden) {
            var sumAbs = 0
            var m = 0
            while (m < nSig) {
              sumAbs += math.abs(level(cgPos, sigPos(m))); m += 1
            }
            val impliedNeg = (sumAbs & 1) == 1
            if (impliedNeg != (level(cgPos, sigPos(nSig - 1)) < 0)) {
              val p = sub(sigPos(0))
              val xC = ((cgPos % cgSize) << 2) + (p & 3)
              val yC = ((cgPos / cgSize) << 2) + (p >> 2)
              val v = levels(yC * n + xC)
              levels(yC * n + xC) = if (v < 0) v - 1 else v + 1
            }
          }
          var ctxSet = (if (i > 0 && luma) 2 else 0) + (if (c1 == 0) 1 else 0)
          c1 = 1
          val g1 = new Array[Boolean](nSig)
          var firstG1 = -1
          var k = 0
          while (k < math.min(nSig, 8)) {
            val abs = math.abs(level(cgPos, sigPos(k)))
            val b = abs > 1
            e.decision(CtxG1 + (if (luma) 0 else 16) + 4 * ctxSet + c1,
              if (b) 1 else 0)
            g1(k) = b
            if (b) { if (firstG1 < 0) firstG1 = k; c1 = 0 }
            else if (c1 > 0 && c1 < 3) c1 += 1
            k += 1
          }
          var g2 = false
          if (firstG1 >= 0) {
            g2 = math.abs(level(cgPos, sigPos(firstG1))) > 2
            e.decision(CtxG2 + (if (luma) 0 else 4) + ctxSet,
              if (g2) 1 else 0)
          }
          k = 0
          while (k < nSig) {
            if (!signHidden || k < nSig - 1)
              e.bypass(if (level(cgPos, sigPos(k)) < 0) 1 else 0)
            k += 1
          }
          var rice = 0
          var firstCoeff2 = 1
          k = 0
          while (k < nSig) {
            val abs = math.abs(level(cgPos, sigPos(k)))
            val coded1 = 1 + (if (k < 8 && g1(k)) 1 else 0) +
              (if (k == firstG1 && g2) 1 else 0)
            val baseLevel = if (k < 8) 2 + firstCoeff2 else 1
            if (coded1 == baseLevel && abs >= coded1)
              encodeRemaining(e, rice, abs - coded1)
            else require(abs == coded1,
              s"level $abs not representable (base $baseLevel coded $coded1)")
            if (abs > (3 << rice) && rice < 4) rice += 1
            if (abs >= 2) firstCoeff2 = 0
            k += 1
          }
        }
      }
      i -= 1
    }
  }
}
