package graft.multimodal

/** MP3 (MPEG-1/2/2.5 audio, ISO/IEC 11172-3 / 13818-3) PROBE tier
  * (r12) — the compressed-audio rung, started exactly as the H.265
  * ladder was in r10: frame-header scan and validation, ID3v2/ID3v1
  * tag skipping, duration/bitrate probing, and per-frame PAYLOAD
  * extraction for compressed-domain dedup (the q155 keyframe-hash
  * posture: framing is parsed for real, the Huffman/MDCT payload
  * stays opaque behind the same injectable decoder boundary the video
  * codecs use). A writer builds conformant frame sequences for
  * round-trip pins and the fixture corpus.
  *
  * Header (32 bits, §2.4.1.3): 11-bit sync, 2-bit version
  * (0=2.5, 2=MPEG-2, 3=MPEG-1), 2-bit layer (1=III, 2=II, 3=I),
  * !protection, 4-bit bitrate index, 2-bit sample-rate index,
  * padding, private, 2-bit channel mode, 2-bit mode ext, copyright,
  * original, 2-bit emphasis. Frame length (Layer III): 144·bitrate /
  * sampleRate + padding (72· for MPEG-2/2.5); 1152 samples per
  * MPEG-1 frame (576 for MPEG-2/2.5).
  */
object Mp3 {

  /** MPEG-1 Layer III bitrates (kbps) by index 1..14. */
  private val bitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 0)
  /** MPEG-2/2.5 Layer III bitrates. */
  private val bitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 144, 160, 0)
  private val sampleRateV1 = Array(44100, 48000, 32000, 0)

  final case class FrameHeader(version: Int, layer: Int, crc: Boolean,
      bitrateKbps: Int, sampleRate: Int, padding: Boolean,
      channels: Int, frameLen: Int, samples: Int)

  final case class Mp3Info(sampleRate: Int, channels: Int, nFrames: Int,
      durationMs: Long, avgBitrateKbps: Int, vbr: Boolean)

  /** Parse the 4-byte header at `off`; None unless a valid Layer-III
    * frame with a defined bitrate/sample rate (free-format and
    * reserved values reject — the probe never guesses frame lengths).
    */
  def parseFrameHeader(b: Array[Byte], off: Int): Option[FrameHeader] = {
    if (off + 4 > b.length) return None
    val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None // 11-bit sync
    val version = (h >>> 19) & 3 // 0: 2.5, 1: reserved, 2: MPEG-2, 3: MPEG-1
    val layer = (h >>> 17) & 3 // 1: III, 2: II, 3: I
    if (version == 1 || layer != 1) return None // Layer III only (this tier)
    val crc = ((h >>> 16) & 1) == 0
    val brIdx = (h >>> 12) & 15
    val srIdx = (h >>> 10) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = ((h >>> 9) & 1) == 1
    val mode = (h >>> 6) & 3
    val v1 = version == 3
    val bitrate = (if (v1) bitrateV1L3 else bitrateV2L3)(brIdx)
    val srBase = sampleRateV1(srIdx)
    val sampleRate =
      if (v1) srBase else if (version == 2) srBase / 2 else srBase / 4
    val samples = if (v1) 1152 else 576
    val frameLen = (samples / 8) * (bitrate * 1000) / sampleRate +
      (if (padding) 1 else 0)
    if (frameLen < 24) return None
    Some(FrameHeader(version, 3, crc, bitrate, sampleRate, padding,
      if (mode == 3) 1 else 2, frameLen, samples))
  }

  /** Bytes to skip for a leading ID3v2 tag (10-byte header + syncsafe
    * size + optional footer), 0 if none.
    */
  def id3v2Size(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val footer = (b(5) & 0x10) != 0
    10 + size + (if (footer) 10 else 0)
  }

  /** Walk the frame sequence from the first valid header after any
    * ID3v2 tag; stops at the first invalid/truncated frame or an
    * ID3v1 ("TAG") tail. Returns frame offsets paired with headers.
    */
  def frames(b: Array[Byte]): Seq[(Int, FrameHeader)] = {
    val out = Seq.newBuilder[(Int, FrameHeader)]
    var off = id3v2Size(b)
    if (off < 0 || off > b.length) return Nil
    // tolerate sync-scan up to 4k of leading garbage after the tag
    var scanned = 0
    while (off + 4 <= b.length && parseFrameHeader(b, off).isEmpty &&
        scanned < 4096) { off += 1; scanned += 1 }
    var done = false
    while (!done) {
      parseFrameHeader(b, off) match {
        case Some(h) if off + h.frameLen <= b.length =>
          out += ((off, h))
          off += h.frameLen
        case _ => done = true
      }
    }
    out.result()
  }

  /** Probe: sample rate / channels from the first frame, duration and
    * average bitrate across the walked sequence. None without at
    * least one valid frame.
    */
  def probe(b: Array[Byte]): Option[Mp3Info] = {
    val fs = frames(b)
    if (fs.isEmpty) return None
    val h0 = fs.head._2
    val totalSamples = fs.map(_._2.samples.toLong).sum
    val durMs = totalSamples * 1000 / h0.sampleRate
    val rates = fs.map(_._2.bitrateKbps).distinct
    Some(Mp3Info(h0.sampleRate, h0.channels, fs.size, durMs,
      (fs.map(_._2.bitrateKbps.toLong).sum / fs.size).toInt,
      vbr = rates.size > 1))
  }

  /** Per-frame PAYLOAD bytes (after the 4-byte header and the 2-byte
    * CRC when present, minus the padding byte): the compressed-domain
    * identity for tag-invariant dedup — two files carrying the same
    * audio frames under different ID3 tags yield identical payload
    * sequences while their byte hashes differ.
    */
  def framePayloads(b: Array[Byte]): Seq[Array[Byte]] =
    frames(b).map { case (off, h) =>
      val start = off + 4 + (if (h.crc) 2 else 0)
      val end = off + h.frameLen - (if (h.padding) 1 else 0)
      java.util.Arrays.copyOfRange(b, start, math.max(start, end))
    }

  // ------------------------------------------- side info (r13 deep probe)

  /** One granule-channel's side info (§2.4.1.7 / ISO 13818-3 §2.4.1.7
    * for the LSF form). `tableSelect` has 3 entries (2 used when
    * window switching); `regionCounts` is (region0, region1) for the
    * long-block layout, (-1, -1) under window switching.
    */
  final case class GranuleInfo(part23Length: Int, bigValues: Int,
      globalGain: Int, scalefacCompress: Int, windowSwitching: Boolean,
      blockType: Int, mixedBlock: Boolean, tableSelect: Seq[Int],
      subblockGain: Seq[Int], region0: Int, region1: Int,
      preflag: Int, scalefacScale: Int, count1Table: Int) {
    /** Table B.7 defines no Huffman tables 4 and 14; window switching
      * with block_type 0 is forbidden (§2.4.1.7); big_values caps at
      * 288. A conformant encoder can emit none of these.
      */
    def valid: Boolean =
      bigValues <= 288 &&
        tableSelect.forall(t => t != 4 && t != 14) &&
        (!windowSwitching || blockType != 0)
  }

  /** Parsed side info of one frame: the reservoir back-pointer plus
    * per-(granule, channel) coding facts. MPEG-1 carries two granules;
    * MPEG-2/2.5 (LSF) one.
    */
  final case class SideInfo(mainDataBegin: Int, scfsi: Seq[Int],
      granules: Seq[Seq[GranuleInfo]], sideBytes: Int) {
    def valid: Boolean = granules.flatten.forall(_.valid)
    def part23Total: Int = granules.flatten.map(_.part23Length).sum
  }

  /** Side-info byte length for a header (§2.4.1.7): MPEG-1 32/17
    * (stereo/mono), LSF 17/9.
    */
  def sideInfoBytes(h: FrameHeader): Int =
    if (h.version == 3) { if (h.channels == 2) 32 else 17 }
    else { if (h.channels == 2) 17 else 9 }

  /** Parse the side info of the frame at `off` (whose header is `h`).
    * Pure bit-layout parse — no Huffman table needed, so this runs on
    * ANY Layer III stream and validates the fields a conformant
    * encoder is constrained on ([[GranuleInfo.valid]]).
    */
  def parseSideInfo(b: Array[Byte], off: Int,
      h: FrameHeader): Option[SideInfo] = {
    val start = off + 4 + (if (h.crc) 2 else 0)
    val nBytes = sideInfoBytes(h)
    if (start + nBytes > b.length) return None
    var bitPos = start * 8
    def u(n: Int): Int = {
      var v = 0
      var k = n
      while (k > 0) {
        val byte = b(bitPos >> 3) & 0xff
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, k)
        v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
        bitPos += take; k -= take
      }
      v
    }
    val v1 = h.version == 3
    val mainDataBegin = u(if (v1) 9 else 8)
    u(if (v1) { if (h.channels == 2) 3 else 5 }
      else { if (h.channels == 2) 2 else 1 }) // private_bits
    val scfsi = if (v1) Seq.fill(h.channels)(u(4)) else Nil
    val nGran = if (v1) 2 else 1
    val granules = Seq.fill(nGran) {
      Seq.fill(h.channels) {
        val part23 = u(12)
        val bigValues = u(9)
        val gain = u(8)
        val sfc = u(if (v1) 4 else 9)
        val ws = u(1) == 1
        var blockType = 0
        var mixed = false
        var tables: Seq[Int] = Nil
        var sub: Seq[Int] = Nil
        var r0 = -1; var r1 = -1
        if (ws) {
          blockType = u(2)
          mixed = u(1) == 1
          tables = Seq(u(5), u(5))
          sub = Seq(u(3), u(3), u(3))
        } else {
          tables = Seq(u(5), u(5), u(5))
          r0 = u(4); r1 = u(3)
        }
        val pre = if (v1) u(1) else 0 // LSF has no preflag bit
        val sfs = u(1)
        val c1t = u(1)
        GranuleInfo(part23, bigValues, gain, sfc, ws, blockType, mixed,
          tables, sub, r0, r1, pre, sfs, c1t)
      }
    }
    Some(SideInfo(mainDataBegin, scfsi, granules, nBytes))
  }

  /** One frame's reservoir accounting from [[reservoirAudit]]. */
  final case class ReservoirStep(offset: Int, mainDataBegin: Int,
      mainDataBytes: Int, part23Bits: Int, feasible: Boolean,
      sideValid: Boolean)

  /** Walk the whole stream's BIT RESERVOIR (§2.4.2.1): each frame's
    * main_data_begin points back into previous frames' main-data
    * bytes, and its Σ part2_3_length bits must fit inside
    * [start − main_data_begin, this frame's main-data end). The audit
    * checks both per frame — every field it uses is side-info-level,
    * so it validates real encoder output (the external conformance
    * vector) without any Huffman decode. Returns one step per walked
    * frame; `feasible` = the back-pointer resolves inside the
    * accumulated reservoir AND the declared bits fit.
    */
  def reservoirAudit(b: Array[Byte]): Seq[ReservoirStep] = {
    var reservoir = 0 // unconsumed main-data bytes before this frame
    frames(b).flatMap { case (off, h) =>
      parseSideInfo(b, off, h).map { si =>
        val mdBytes = h.frameLen - 4 - (if (h.crc) 2 else 0) - si.sideBytes
        val avail = (si.mainDataBegin + math.max(0, mdBytes)) * 8
        val feasible = si.mainDataBegin <= reservoir &&
          si.part23Total <= avail
        // bytes left unconsumed after this frame (what later frames
        // may back-reference), never negative, spec-capped at the
        // 9-bit (MPEG-1) / 8-bit (LSF) pointer range
        val cap = if (h.version == 3) 511 else 255
        reservoir = math.min(cap, math.max(0,
          si.mainDataBegin + math.max(0, mdBytes) -
            (si.part23Total + 7) / 8))
        ReservoirStep(off, si.mainDataBegin, mdBytes, si.part23Total,
          feasible, si.valid)
      }
    }
  }

  /** Build a conformant MPEG-1 Layer III frame sequence from payload
    * bytes (one frame per payload; each must exactly fill its frame at
    * the given bitrate/sample-rate), optionally wrapped in ID3v2/ID3v1
    * tags. Round-trip partner of [[frames]]/[[framePayloads]].
    */
  def build(payloads: Seq[Array[Byte]], brIdx: Int = 9, srIdx: Int = 0,
      id3v2: Option[Array[Byte]] = None, id3v1: Boolean = false): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2, "bad indices")
    val bitrate = bitrateV1L3(brIdx)
    val sr = sampleRateV1(srIdx)
    val frameLen = 144 * (bitrate * 1000) / sr
    val out = new java.io.ByteArrayOutputStream()
    id3v2.foreach { tag =>
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // v2.3, no flags
      out.write((tag.length >> 21) & 0x7f); out.write((tag.length >> 14) & 0x7f)
      out.write((tag.length >> 7) & 0x7f); out.write(tag.length & 0x7f)
      out.write(tag, 0, tag.length)
    }
    payloads.foreach { p =>
      require(p.length == frameLen - 4,
        s"payload ${p.length} != frame $frameLen - 4 header bytes")
      // sync 0x7ff, version MPEG-1 (3), layer III (1), no CRC (1)
      out.write(0xff); out.write(0xfb)
      out.write((brIdx << 4) | (srIdx << 2)) // no padding, not private
      out.write(0x44) // joint stereo, no ext, no copyright, original
      out.write(p, 0, p.length)
    }
    if (id3v1) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      out.write(tag, 0, 128)
    }
    out.toByteArray
  }
}
