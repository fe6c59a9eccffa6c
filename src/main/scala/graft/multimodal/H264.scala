package graft.multimodal

/** Pure-Scala H.264/AVC BITSTREAM STRUCTURE parsing — no codec library.
  *
  * Everything here is implemented from the public ITU-T H.264 (08/2021)
  * spec text: Annex B byte-stream NAL scanning (§B.1), AVCC
  * length-prefixed NAL framing (ISO/IEC 14496-15 §5.3), RBSP
  * emulation-prevention stripping (§7.3.1), Exp-Golomb entropy of the
  * PARAMETER sets (§9.1), and the sequence-parameter-set syntax
  * (§7.3.2.1.1) down to the exact cropped width/height arithmetic
  * (§7.4.2.1.1 equations 7-13…7-16). Resolution/profile probing,
  * keyframe (IDR) identification and compressed-keyframe extraction are
  * all real; since r7 the CAVLC INTRA slice-data decode is too
  * ([[H264Decode]]/[[H264Cavlc]]) — pixels reconstruct for baseline
  * IDR frames, leaving CABAC/inter/H.265 as the remaining codec tier.
  *
  * Reference context: the reference system stores media paths as plain
  * varchar (reference musicdb.sql:22 `songs.file_path`); bitstream
  * inspection is part of this library's multimodal extension tier.
  */
object H264 {

  /** One NAL unit: `nalType` per §7.4.1 Table 7-1 (1 = non-IDR slice,
    * 5 = IDR slice, 7 = SPS, 8 = PPS, …); `payload` is the EBSP bytes
    * AFTER the 1-byte NAL header (emulation-prevention still present —
    * strip via [[rbsp]] before bit-parsing).
    */
  final case class Nal(nalType: Int, refIdc: Int, payload: Array[Byte])

  /** Parsed SPS — the fields a corpus probe needs (§7.3.2.1.1), plus the
    * entropy-length fields slice-header decoding needs
    * (log2MaxFrameNum / pocType / log2MaxPocLsb — [[H264Decode]]). Width/
    * height are the CROPPED display dimensions (§7.4.2.1.1).
    */
  final case class SpsInfo(profileIdc: Int, levelIdc: Int, spsId: Int,
      width: Int, height: Int, frameMbsOnly: Boolean, chromaFormatIdc: Int,
      log2MaxFrameNum: Int = 4, pocType: Int = 0, log2MaxPocLsb: Int = 4,
      maxNumRefFrames: Int = 1, mbAdaptiveFrameField: Boolean = false) {
    /** Sequence coding structure (§7.4.2.1.1): `progressive` when
      * frame_mbs_only, else `mbaff` (frame/field decided per MB pair)
      * or `paff` (per picture — field pictures may occur). The r13
      * probe-level classification: PAFF/MBAFF DECODE stays a loud
      * reject, but corpus stats must count field-coded streams.
      */
    def codingStructure: String =
      if (frameMbsOnly) "progressive"
      else if (mbAdaptiveFrameField) "mbaff"
      else "paff"
  }

  // ------------------------------------------------------------ framing

  /** Scan an Annex-B byte stream (§B.1): NAL units delimited by
    * 00 00 01 / 00 00 00 01 start codes. Tolerates leading garbage
    * (scans to the first start code) and returns Nil for streams with
    * none — undecodable blobs are data, not errors, at corpus scale.
    */
  def nalUnitsAnnexB(bytes: Array[Byte]): Seq[Nal] = {
    val out = Seq.newBuilder[Nal]
    var i = 0
    val n = bytes.length
    def isStart(p: Int): Int = // returns start-code length at p, or 0
      if (p + 2 < n && bytes(p) == 0 && bytes(p + 1) == 0 && bytes(p + 2) == 1) 3
      else if (p + 3 < n && bytes(p) == 0 && bytes(p + 1) == 0 &&
        bytes(p + 2) == 0 && bytes(p + 3) == 1) 4
      else 0
    // find first start code
    while (i < n && isStart(i) == 0) i += 1
    while (i < n) {
      val sc = isStart(i)
      if (sc == 0) return out.result() // defensive; loop below keeps alignment
      val begin = i + sc
      var j = begin
      while (j < n && isStart(j) == 0) j += 1
      if (begin < j) out += mkNal(bytes, begin, j - begin)
      i = j
    }
    out.result()
  }

  /** Scan AVCC framing (length-prefixed NALs, ISO/IEC 14496-15): each
    * NAL is preceded by a `lengthSize`-byte big-endian length. This is
    * the sample format inside mp4 `avc1` tracks.
    */
  def nalUnitsAvcc(bytes: Array[Byte], lengthSize: Int = 4): Seq[Nal] = {
    require(lengthSize >= 1 && lengthSize <= 4, s"bad lengthSize $lengthSize")
    val out = Seq.newBuilder[Nal]
    var i = 0
    val n = bytes.length
    while (i + lengthSize <= n) {
      var len = 0L
      var k = 0
      while (k < lengthSize) { len = (len << 8) | (bytes(i + k) & 0xffL); k += 1 }
      i += lengthSize
      if (len < 1 || i + len > n) return out.result() // truncated: keep what parsed
      out += mkNal(bytes, i, len.toInt)
      i += len.toInt
    }
    out.result()
  }

  private def mkNal(bytes: Array[Byte], off: Int, len: Int): Nal = {
    val hdr = bytes(off) & 0xff
    Nal(hdr & 0x1f, (hdr >> 5) & 0x3,
      java.util.Arrays.copyOfRange(bytes, off + 1, off + len))
  }

  /** EBSP → RBSP: drop each emulation-prevention 0x03 that follows
    * 00 00 (§7.3.1 / §7.4.1.1).
    */
  def rbsp(ebsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ebsp.length)
    var zeros = 0
    var i = 0
    while (i < ebsp.length) {
      val b = ebsp(i) & 0xff
      if (zeros >= 2 && b == 3) zeros = 0 // skip the EP byte
      else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** MSB-first bit reader with Exp-Golomb (§9.1) — parameter-set entropy
    * only (slice data uses CABAC/CAVLC, which is the declared boundary).
    */
  final class BitReader(data: Array[Byte]) {
    private var pos = 0 // bit position
    def remaining: Int = data.length * 8 - pos
    def u(bits: Int): Int = {
      var v = 0
      var k = 0
      while (k < bits) {
        require(pos < data.length * 8, "bitstream underrun")
        v = (v << 1) | ((data(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; k += 1
      }
      v
    }
    def flag(): Boolean = u(1) == 1
    def ue(): Int = { // Exp-Golomb: leadingZeros zeros, 1, leadingZeros info bits
      var zeros = 0
      while (u(1) == 0) { zeros += 1; require(zeros <= 31, "ue(v) overflow") }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = { // §9.1.1 mapping
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    /** Truncated Exp-Golomb (§9.1, te(v)): with range [0, max] — max 0
      * reads nothing (value 0), max 1 reads one INVERTED bit, max > 1
      * falls back to ue(v). The ref_idx_lX syntax element's descriptor.
      */
    def te(max: Int): Int =
      if (max <= 0) 0 else if (max == 1) 1 - u(1) else ue()
  }

  // ---------------------------------------------------------- SPS parse

  private val extendedProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** Parse an SPS NAL payload (EBSP, header already stripped) per
    * §7.3.2.1.1. Returns None on malformed input rather than throwing —
    * probing a corpus must not die on one bad blob.
    */
  def parseSps(payload: Array[Byte]): Option[SpsInfo] =
    try {
      val r = new BitReader(rbsp(payload))
      val profileIdc = r.u(8)
      r.u(8) // constraint_set flags + reserved_zero_2bits
      val levelIdc = r.u(8)
      val spsId = r.ue()
      var chromaFormatIdc = 1 // default 4:2:0 when the branch is absent
      if (extendedProfiles(profileIdc)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) r.flag() // separate_colour_plane_flag
        r.ue(); r.ue() // bit_depth_luma/chroma_minus8
        r.flag() // qpprime_y_zero_transform_bypass_flag
        if (r.flag()) { // seq_scaling_matrix_present_flag
          val lists = if (chromaFormatIdc != 3) 8 else 12
          var i = 0
          while (i < lists) {
            if (r.flag()) skipScalingList(r, if (i < 6) 16 else 64)
            i += 1
          }
        }
      }
      val log2MaxFrameNum = r.ue() + 4
      val pocType = r.ue()
      var log2MaxPocLsb = 4
      if (pocType == 0) log2MaxPocLsb = r.ue() + 4
      else if (pocType == 1) {
        r.flag(); r.se(); r.se()
        val cycles = r.ue()
        var i = 0
        while (i < cycles) { r.se(); i += 1 }
      }
      val maxNumRefFrames = r.ue() // sliding-window DPB capacity (§8.2.5.3)
      r.flag() // gaps_in_frame_num_value_allowed_flag
      val widthMbs = r.ue() + 1
      val heightMapUnits = r.ue() + 1
      val frameMbsOnly = r.flag()
      val mbAff = !frameMbsOnly && r.flag() // mb_adaptive_frame_field_flag
      r.flag() // direct_8x8_inference_flag
      var width = widthMbs * 16
      var height = heightMapUnits * 16 * (if (frameMbsOnly) 1 else 2)
      if (r.flag()) { // frame_cropping_flag — §7.4.2.1.1 crop units
        val (subW, subH) = chromaFormatIdc match {
          case 0 => (1, 1) // monochrome: crop in luma samples
          case 1 => (2, 2) // 4:2:0
          case 2 => (2, 1) // 4:2:2
          case _ => (1, 1) // 4:4:4
        }
        val cropUnitX = subW
        val cropUnitY = subH * (if (frameMbsOnly) 1 else 2)
        val (l, rr, t, b) = (r.ue(), r.ue(), r.ue(), r.ue())
        width -= (l + rr) * cropUnitX
        height -= (t + b) * cropUnitY
      }
      Some(SpsInfo(profileIdc, levelIdc, spsId, width, height,
        frameMbsOnly, chromaFormatIdc, log2MaxFrameNum, pocType,
        log2MaxPocLsb, maxNumRefFrames, mbAff))
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }

  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var lastScale = 8; var nextScale = 8
    var j = 0
    while (j < size) {
      if (nextScale != 0) nextScale = (lastScale + r.se() + 256) % 256
      if (nextScale != 0) lastScale = nextScale
      j += 1
    }
  }

  // ------------------------------------------------------- stream probes

  /** First SPS in an Annex-B stream → parsed info. */
  def probeAnnexB(bytes: Array[Byte]): Option[SpsInfo] =
    nalUnitsAnnexB(bytes).iterator
      .filter(_.nalType == 7).flatMap(n => parseSps(n.payload)).nextOption()

  /** Parse an `avcC` (AVCDecoderConfigurationRecord) box payload:
    * returns (lengthSize, sps list, pps list) — the mp4 `avc1` probe
    * path. ISO/IEC 14496-15 §5.3.3.1.
    */
  def parseAvcC(b: Array[Byte]): Option[(Int, Seq[Array[Byte]], Seq[Array[Byte]])] =
    try {
      if (b.length < 7 || (b(0) & 0xff) != 1) return None
      val lengthSize = (b(4) & 0x3) + 1
      var i = 6
      def readSet(count: Int): Seq[Array[Byte]] = {
        val out = Seq.newBuilder[Array[Byte]]
        var c = 0
        while (c < count) {
          val len = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
          i += 2
          // stored WITH the NAL header byte; strip it to match Nal.payload
          out += java.util.Arrays.copyOfRange(b, i + 1, i + len)
          i += len
          c += 1
        }
        out.result()
      }
      val sps = readSet(b(5) & 0x1f)
      val ppsCount = b(i) & 0xff
      i += 1
      val pps = readSet(ppsCount)
      Some((lengthSize, sps, pps))
    } catch { case _: ArrayIndexOutOfBoundsException => None }

  // ------------------------------------------------- SPS/PPS generation

  /** MSB-first bit writer with Exp-Golomb and RBSP trailing bits —
    * the inverse of [[BitReader]], used to GENERATE valid parameter
    * sets for fixtures/tests (and to pin the parser round-trip).
    */
  final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u(v: Int, bits: Int): this.type = {
      var k = bits - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1)
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        k -= 1
      }
      this
    }
    def flag(b: Boolean): this.type = u(if (b) 1 else 0, 1)
    def ue(v: Int): this.type = {
      require(v >= 0)
      val cp = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cp)
      u(0, len - 1); u(cp, len)
    }
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** Truncated Exp-Golomb writer — inverse of [[BitReader.te]]. */
    def te(v: Int, max: Int): this.type = {
      require(v >= 0 && v <= max, s"te($v) out of [0, $max]")
      if (max <= 0) this else if (max == 1) u(1 - v, 1) else ue(v)
    }
    /** pcm_alignment_zero_bit run: zero-pad to the next byte boundary
      * (§7.3.5 I_PCM). No-op when already aligned.
      */
    def alignZero(): this.type = { while (nBits != 0) u(0, 1); this }
    /** cabac_alignment_one_bit run: ONE-pad to the next byte boundary
      * (§7.3.4 slice data, entropy_coding_mode 1). No-op when aligned.
      */
    def alignOne(): this.type = { while (nBits != 0) u(1, 1); this }
    /** rbsp_trailing_bits: stop bit + zero-pad to byte boundary. */
    def stop(): Array[Byte] = {
      u(1, 1)
      if (nBits > 0) { cur <<= (8 - nBits); buf += cur.toByte; cur = 0; nBits = 0 }
      buf.toArray
    }
  }

  /** RBSP → EBSP: insert emulation-prevention 0x03 wherever 00 00 is
    * followed by 00/01/02/03 (§7.4.1.1) — inverse of [[rbsp]].
    */
  def ebsp(rbspBytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbspBytes.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbspBytes.length) {
      val b = rbspBytes(i) & 0xff
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** Generate a valid baseline-profile SPS payload (EBSP, no NAL
    * header) declaring the given CROPPED dimensions — 4:2:0, so `width`
    * and `height` must be even; non-multiple-of-16 dims emit frame
    * cropping exactly as an encoder would. Round-trips through
    * [[parseSps]] by construction (pinned in MultimodalSpec).
    */
  def writeSps(width: Int, height: Int, levelIdc: Int = 31,
      numRefFrames: Int = 1, frameMbsOnly: Boolean = true,
      mbAff: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"4:2:0 dims must be positive and even, got ${width}x$height")
    require(numRefFrames >= 1 && numRefFrames <= 16,
      s"max_num_ref_frames $numRefFrames out of range")
    require(frameMbsOnly || height % 32 == 0,
      "field-coded SPS needs map-unit (32-line) aligned height")
    val mbsW = (width + 15) / 16
    val mapH = (height + 15) / 16 / (if (frameMbsOnly) 1 else 2)
    val w = new BitWriter
    w.u(66, 8) // profile_idc: baseline — no chroma/scaling branch
    w.u(0, 8)  // constraint flags + reserved
    w.u(levelIdc, 8)
    w.ue(0)    // sps_id
    w.ue(0)    // log2_max_frame_num_minus4
    w.ue(0)    // pic_order_cnt_type 0
    w.ue(0)    //   log2_max_pic_order_cnt_lsb_minus4
    w.ue(numRefFrames) // max_num_ref_frames (sliding-window DPB size)
    w.flag(false) // gaps_in_frame_num_value_allowed
    w.ue(mbsW - 1)
    w.ue(mapH - 1)
    w.flag(frameMbsOnly)
    if (!frameMbsOnly) w.flag(mbAff) // mb_adaptive_frame_field_flag
    w.flag(true)  // direct_8x8_inference
    val cropR = (mbsW * 16 - width) / 2  // CropUnitX = 2 at 4:2:0
    val cropB = (mapH * 16 * (if (frameMbsOnly) 1 else 2) - height) / 2
    if (cropR > 0 || cropB > 0) {
      w.flag(true)
      w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
    } else w.flag(false)
    w.flag(false) // vui_parameters_present
    ebsp(w.stop())
  }

  /** Generate a minimal valid PPS payload (EBSP, no NAL header).
    * `weightedPred` / `weightedBipredIdc` gate the r10 weighted-
    * prediction tier (§8.4.2.3): explicit P tables, explicit (1) or
    * implicit POC-derived (2) B weights.
    */
  def writePps(cabac: Boolean = false, weightedPred: Boolean = false,
      weightedBipredIdc: Int = 0): Array[Byte] = {
    require(weightedBipredIdc >= 0 && weightedBipredIdc <= 2,
      s"bad weighted_bipred_idc $weightedBipredIdc")
    val w = new BitWriter
    w.ue(0)       // pps_id
    w.ue(0)       // sps_id
    w.flag(cabac) // entropy_coding_mode (false = CAVLC, true = CABAC)
    w.flag(false) // bottom_field_pic_order_in_frame_present
    w.ue(0)       // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.flag(weightedPred) // weighted_pred
    w.u(weightedBipredIdc, 2) // weighted_bipred_idc
    w.se(0); w.se(0); w.se(0) // pic_init_qp/qs_minus26, chroma_qp_offset
    w.flag(true)  // deblocking_filter_control_present
    w.flag(false) // constrained_intra_pred
    w.flag(false) // redundant_pic_cnt_present
    ebsp(w.stop())
  }

  /** IDR access units of an Annex-B stream: for each IDR (nalType 5)
    * picture, the concatenated slice payload bytes. Consecutive type-5
    * NALs belong to one IDR picture (multi-slice frames); a non-slice
    * NAL or a type-1 slice ends the run. Compressed-domain identity:
    * byte-identical sources ⇒ byte-identical IDR payloads, which is
    * what keyframe-hash dedup hashes.
    */
  def idrPayloads(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var run: java.io.ByteArrayOutputStream = null
    nalUnitsAnnexB(bytes).foreach { nal =>
      if (nal.nalType == 5) {
        if (run == null) run = new java.io.ByteArrayOutputStream()
        run.write(nal.payload, 0, nal.payload.length)
      } else if (run != null) { out += run.toByteArray; run = null }
    }
    if (run != null) out += run.toByteArray
    out.result()
  }
}
