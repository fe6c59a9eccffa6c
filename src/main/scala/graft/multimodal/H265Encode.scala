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
}
