package graft.multimodal

/** AAC ADTS (ISO/IEC 13818-7 §6.2 / 14496-3 §1.A.3) PROBE tier (r12)
  * — the second compressed-audio rung, the [[Mp3]] posture applied to
  * the format real corpora actually carry: ADTS frame-header scan and
  * validation (fixed + variable header fields, CRC form), ID3v2 tag
  * skipping (ADTS files in the wild are commonly ID3-wrapped),
  * duration/bitrate probing, and per-frame PAYLOAD extraction for
  * compressed-domain dedup. The raw_data_block payload (Huffman
  * spectral data) stays opaque behind the same injectable decoder
  * boundary as the video codecs. A writer builds conformant frame
  * sequences for round-trip pins and the fixture corpus.
  *
  * ADTS header (56/72 bits): 12-bit sync 0xFFF, 1-bit ID (1 = MPEG-2,
  * 0 = MPEG-4), 2-bit layer (must be 0), 1-bit protection_absent,
  * 2-bit profile (0 Main, 1 LC, 2 SSR), 4-bit sampling_frequency
  * _index (0..12 valid), 1-bit private, 3-bit channel_configuration,
  * original + home, copyright id bit + start, 13-bit aac_frame_length
  * (INCLUDING the header), 11-bit adts_buffer_fullness, 2-bit
  * number_of_raw_data_blocks_in_frame (+1 blocks × 1024 samples);
  * 16-bit CRC when protection_absent is 0.
  */
object Aac {

  /** Table 35 (13818-7): sampling_frequency_index → Hz. */
  val sampleRates: Array[Int] = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  final case class AdtsHeader(mpeg2: Boolean, profile: Int,
      sampleRate: Int, srIndex: Int, channels: Int, crc: Boolean,
      frameLen: Int, bufferFullness: Int, rawDataBlocks: Int) {
    def headerLen: Int = if (crc) 9 else 7
    def samples: Int = 1024 * rawDataBlocks
  }

  final case class AacInfo(sampleRate: Int, channels: Int, profile: Int,
      nFrames: Int, durationMs: Long, avgBitrateKbps: Int)

  /** Parse the ADTS header at `off`; None unless a valid AAC frame
    * with a defined sample rate and a frame length that can hold its
    * own header (reserved sample-rate indices, nonzero layer and
    * impossible lengths reject — the probe never guesses framing).
    */
  def parseHeader(b: Array[Byte], off: Int): Option[AdtsHeader] = {
    if (off + 7 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xf0) != 0xf0) return None
    val h1 = b(off + 1) & 0xff
    if (((h1 >> 1) & 3) != 0) return None // layer must be 00
    val mpeg2 = ((h1 >> 3) & 1) == 1
    val crc = (h1 & 1) == 0
    val h2 = b(off + 2) & 0xff
    val profile = (h2 >> 6) & 3
    val srIdx = (h2 >> 2) & 0xf
    if (srIdx >= sampleRates.length) return None
    val channels = (((h2 & 1) << 2) | ((b(off + 3) & 0xc0) >> 6))
    if (channels == 0) return None // program_config_element out of the tier
    val frameLen = (((b(off + 3) & 0x03) << 11) |
      ((b(off + 4) & 0xff) << 3) | ((b(off + 5) & 0xe0) >> 5))
    val fullness = ((b(off + 5) & 0x1f) << 6) | ((b(off + 6) & 0xfc) >> 2)
    val rdb = (b(off + 6) & 3) + 1
    val hdrLen = if (crc) 9 else 7
    if (frameLen < hdrLen + 1) return None
    Some(AdtsHeader(mpeg2, profile, sampleRates(srIdx), srIdx, channels,
      crc, frameLen, fullness, rdb))
  }

  /** Walk the ADTS frame sequence from the first valid header after
    * any ID3v2 tag (reusing [[Mp3.id3v2Size]] — the tag layer is
    * format-agnostic); stops at the first invalid or truncated frame.
    */
  def frames(b: Array[Byte]): Seq[(Int, AdtsHeader)] = {
    val out = Seq.newBuilder[(Int, AdtsHeader)]
    var off = Mp3.id3v2Size(b)
    if (off < 0 || off > b.length) return Nil
    var scanned = 0
    while (off + 7 <= b.length && parseHeader(b, off).isEmpty &&
        scanned < 4096) { off += 1; scanned += 1 }
    var done = false
    while (!done) {
      parseHeader(b, off) match {
        case Some(h) if off + h.frameLen <= b.length =>
          out += ((off, h))
          off += h.frameLen
        case _ => done = true
      }
    }
    out.result()
  }

  /** Probe: stream facts from the first frame + the walked sequence.
    * Average bitrate derives from total frame bytes over total
    * samples (ADTS is natively VBR). None without one valid frame.
    */
  def probe(b: Array[Byte]): Option[AacInfo] = {
    val fs = frames(b)
    if (fs.isEmpty) return None
    val h0 = fs.head._2
    val totalSamples = fs.map(_._2.samples.toLong).sum
    val totalBytes = fs.map(_._2.frameLen.toLong).sum
    val durMs = totalSamples * 1000 / h0.sampleRate
    val kbps =
      if (durMs == 0) 0 else (totalBytes * 8 / durMs).toInt
    Some(AacInfo(h0.sampleRate, h0.channels, h0.profile, fs.size, durMs, kbps))
  }

  /** Per-frame PAYLOAD bytes (raw_data_blocks — after the 7/9-byte
    * header): the compressed-domain identity. Two muxes of the same
    * AAC frames under different ID3 tags, buffer-fullness values or
    * CRC forms yield identical payload sequences while their byte
    * hashes differ.
    */
  def framePayloads(b: Array[Byte]): Seq[Array[Byte]] =
    frames(b).map { case (off, h) =>
      java.util.Arrays.copyOfRange(b, off + h.headerLen, off + h.frameLen)
    }

  /** Build a conformant ADTS stream from payload bytes (one LC frame
    * per payload), optionally ID3v2-wrapped. `fullness` defaults to
    * the 0x7FF "VBR" convention. Round-trip partner of
    * [[frames]]/[[framePayloads]].
    */
  def build(payloads: Seq[Array[Byte]], srIdx: Int = 8, channels: Int = 1,
      fullness: Int = 0x7ff, id3v2: Option[Array[Byte]] = None): Array[Byte] = {
    require(srIdx >= 0 && srIdx < sampleRates.length, s"bad srIdx $srIdx")
    require(channels >= 1 && channels <= 7, s"bad channels $channels")
    require(fullness >= 0 && fullness <= 0x7ff, s"bad fullness $fullness")
    val out = new java.io.ByteArrayOutputStream()
    id3v2.foreach { tag =>
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((tag.length >> 21) & 0x7f); out.write((tag.length >> 14) & 0x7f)
      out.write((tag.length >> 7) & 0x7f); out.write(tag.length & 0x7f)
      out.write(tag, 0, tag.length)
    }
    payloads.foreach { p =>
      val frameLen = 7 + p.length
      require(frameLen < (1 << 13), s"payload too large: ${p.length}")
      out.write(0xff)
      out.write(0xf1) // MPEG-4, layer 0, no CRC
      out.write((1 << 6) | (srIdx << 2) | ((channels >> 2) & 1)) // LC profile
      out.write(((channels & 3) << 6) | ((frameLen >> 11) & 3))
      out.write((frameLen >> 3) & 0xff)
      out.write(((frameLen & 7) << 5) | ((fullness >> 6) & 0x1f))
      out.write(((fullness & 0x3f) << 2)) // 1 raw data block
      out.write(p, 0, p.length)
    }
    out.toByteArray
  }
}
