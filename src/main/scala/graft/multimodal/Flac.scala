package graft.multimodal

/** FLAC PROBE tier (r12, the third compressed-audio rung — the
  * xiph.org FLAC format, now also RFC 9639): metadata-block walking
  * (STREAMINFO / VORBIS_COMMENT / PICTURE / PADDING / anything —
  * typed, length-prefixed), STREAMINFO parse down to exact sample
  * rate / channels / bit depth / total samples (duration needs no
  * frame walk — FLAC declares it up front), first-frame header parse
  * with the spec's CRC-8 verified (sync, blocksize/rate codes with
  * their follow-on fields, channel assignment, UTF-8-coded frame
  * number), and AUDIO-SECTION extraction for tag-invariant dedup:
  * everything after the metadata section is the compressed audio
  * identity — re-tagged FLACs (new comments, cover art, padding)
  * differ only in metadata blocks, the canonical lossless-audio
  * duplicate. Subframe payloads stay opaque behind the injectable
  * decoder boundary, exactly the MP3/AAC posture. A writer builds
  * conformant files for round-trip pins and the fixture corpus.
  */
object Flac {

  final case class StreamInfo(minBlock: Int, maxBlock: Int,
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long)

  final case class FlacInfo(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, durationMs: Long,
      metadataBytes: Int, hasVorbisComment: Boolean, hasPicture: Boolean)

  final case class FrameHeader(blockingStrategy: Int, blockSize: Int,
      sampleRate: Int, channelAssignment: Int, channels: Int,
      bitsPerSample: Int, frameNumber: Long, headerLen: Int)

  /** Walk the metadata blocks after "fLaC": returns (STREAMINFO,
    * first-frame offset, types seen). None on malformed input (bad
    * magic, truncated block, missing or malformed STREAMINFO — the
    * spec requires it first).
    */
  def metadata(b: Array[Byte]): Option[(StreamInfo, Int, Set[Int])] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
      b(3) != 'C') return None
    var off = 4
    var si: StreamInfo = null
    val types = Set.newBuilder[Int]
    var last = false
    var first = true
    while (!last) {
      if (off + 4 > b.length) return None
      val h = b(off) & 0xff
      last = (h & 0x80) != 0
      val tpe = h & 0x7f
      if (tpe == 127) return None // forbidden
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      if (off + 4 + len > b.length) return None
      if (first) {
        if (tpe != 0 || len < 34) return None // STREAMINFO must lead
        si = parseStreamInfo(b, off + 4)
        if (si == null) return None
        first = false
      }
      types += tpe
      off += 4 + len
    }
    if (si == null) None else Some((si, off, types.result()))
  }

  private def parseStreamInfo(b: Array[Byte], off: Int): StreamInfo = {
    val minBlock = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    val maxBlock = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    // skip min/max frame size (3 + 3 bytes) → bit-packed tail at +10:
    // 20 bits rate, 3 bits channels−1, 5 bits bps−1, 36 bits samples
    val v = (0 until 8).map(i => (b(off + 10 + i) & 0xffL)).reduce((a, c) =>
      (a << 8) | c)
    val rate = (v >>> 44).toInt
    val channels = ((v >>> 41) & 7).toInt + 1
    val bps = ((v >>> 36) & 31).toInt + 1
    val total = v & 0xfffffffffL
    if (rate <= 0 || rate > 655350 || minBlock < 16 || maxBlock < minBlock)
      null
    else StreamInfo(minBlock, maxBlock, rate, channels, bps, total)
  }

  /** Probe: STREAMINFO facts + metadata extent + tag presence. */
  def probe(b: Array[Byte]): Option[FlacInfo] =
    metadata(b).map { case (si, end, types) =>
      FlacInfo(si.sampleRate, si.channels, si.bitsPerSample,
        si.totalSamples,
        if (si.sampleRate > 0) si.totalSamples * 1000 / si.sampleRate else 0,
        end, types.contains(4), types.contains(6))
    }

  /** CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the frame
    * header checksum.
    */
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Parse (and CRC-verify) the frame header at `off`. `si` supplies
    * the stream defaults the 0-codes refer back to.
    */
  def parseFrameHeader(b: Array[Byte], off: Int,
      si: StreamInfo): Option[FrameHeader] = {
    if (off + 5 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xfc) != 0xf8) return None
    val blocking = b(off + 1) & 1
    val bsCode = (b(off + 2) & 0xf0) >> 4
    val srCode = b(off + 2) & 0x0f
    val chCode = (b(off + 3) & 0xf0) >> 4
    val ssCode = (b(off + 3) & 0x0e) >> 1
    if ((b(off + 3) & 1) != 0) return None // reserved bit
    if (bsCode == 0 || srCode == 15 || chCode > 10 || ssCode == 3)
      return None
    var i = off + 4
    // UTF-8-coded frame/sample number (up to 7 bytes for 36 bits)
    val first = b(i) & 0xff
    var nCont = 0
    var num: Long = 0
    if ((first & 0x80) == 0) num = first
    else {
      var mask = 0x40
      while ((first & mask) != 0 && nCont < 7) { nCont += 1; mask >>= 1 }
      if (nCont < 1 || nCont > 6 || (first & mask) != 0) return None
      num = first & (mask - 1)
    }
    i += 1
    var k = 0
    while (k < nCont) {
      if (i >= b.length || (b(i) & 0xc0) != 0x80) return None
      num = (num << 6) | (b(i) & 0x3f)
      i += 1; k += 1
    }
    // follow-on blocksize / sample-rate fields
    var blockSize = bsCode match {
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => -1 // 8-bit value − 1 follows
      case 7 => -2 // 16-bit value − 1 follows
      case c => 256 << (c - 8)
    }
    if (blockSize == -1) {
      if (i >= b.length) return None
      blockSize = (b(i) & 0xff) + 1; i += 1
    } else if (blockSize == -2) {
      if (i + 1 >= b.length) return None
      blockSize = (((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)) + 1; i += 2
    }
    var rate = srCode match {
      case 0 => si.sampleRate
      case 1 => 88200
      case 2 => 176400
      case 3 => 192000
      case 4 => 8000
      case 5 => 16000
      case 6 => 22050
      case 7 => 24000
      case 8 => 32000
      case 9 => 44100
      case 10 => 48000
      case 11 => 96000
      case 12 => -1 // kHz in 8 bits follows
      case 13 => -2 // Hz in 16 bits follows
      case _ => -3  // Hz/10 in 16 bits follows
    }
    if (rate == -1) {
      if (i >= b.length) return None
      rate = (b(i) & 0xff) * 1000; i += 1
    } else if (rate == -2 || rate == -3) {
      if (i + 1 >= b.length) return None
      val v = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
      rate = if (rate == -2) v else v * 10
      i += 2
    }
    if (i >= b.length) return None
    if (crc8(b, off, i) != (b(i) & 0xff)) return None // header CRC-8
    i += 1
    val channels = if (chCode <= 7) chCode + 1 else 2
    val bps = ssCode match {
      case 0 => si.bitsPerSample
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case _ => 32
    }
    Some(FrameHeader(blocking, blockSize, rate, chCode, channels, bps,
      num, i - off))
  }

  /** The compressed AUDIO SECTION (everything after the metadata
    * blocks) — the tag-invariant identity — provided the first frame
    * header validates (sync + CRC-8 + stream-consistent rate).
    */
  def audioSection(b: Array[Byte]): Option[Array[Byte]] =
    metadata(b).flatMap { case (si, end, _) =>
      parseFrameHeader(b, end, si).flatMap { fh =>
        if (fh.sampleRate != si.sampleRate) None
        else Some(java.util.Arrays.copyOfRange(b, end, b.length))
      }
    }

  /** Build a conformant FLAC file: STREAMINFO (+ optional
    * VORBIS_COMMENT and PADDING blocks) + a first frame (valid header
    * with CRC-8, fixed-blocksize strategy, frame number 0) followed
    * by opaque payload bytes. Round-trip partner of
    * [[metadata]]/[[parseFrameHeader]]/[[audioSection]].
    */
  def build(rate: Int, channels: Int, bps: Int, totalSamples: Long,
      payload: Array[Byte], vorbisComment: Option[Array[Byte]] = None,
      paddingLen: Int = 0): Array[Byte] = {
    require(rate > 0 && rate <= 655350 && channels >= 1 && channels <= 8 &&
      bps >= 4 && bps <= 32, "bad stream parameters")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val moreBlocks = vorbisComment.isDefined || paddingLen > 0
    // STREAMINFO
    out.write(if (moreBlocks) 0x00 else 0x80)
    out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0x00 // min block 4096
    si(2) = 0x10; si(3) = 0x00 // max block 4096
    // min/max frame size: 0 (unknown) — bytes 4..9 stay 0
    var v: Long = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | (totalSamples & 0xfffffffffL)
    var k = 0
    while (k < 8) { si(10 + k) = ((v >>> (56 - 8 * k)) & 0xff).toByte; k += 1 }
    // MD5 bytes 18..33 stay 0 (unknown)
    out.write(si, 0, 34)
    vorbisComment.foreach { vc =>
      out.write(if (paddingLen > 0) 0x04 else 0x84)
      out.write((vc.length >> 16) & 0xff); out.write((vc.length >> 8) & 0xff)
      out.write(vc.length & 0xff)
      out.write(vc, 0, vc.length)
    }
    if (paddingLen > 0) {
      out.write(0x81) // PADDING, last
      out.write((paddingLen >> 16) & 0xff); out.write((paddingLen >> 8) & 0xff)
      out.write(paddingLen & 0xff)
      out.write(new Array[Byte](paddingLen), 0, paddingLen)
    }
    // first frame: fixed blocking, blocksize 4096 (code 12 = 256<<4),
    // rate from STREAMINFO (code 0), independent channels, bps from
    // STREAMINFO (code 0), frame number 0
    val fh = Array[Byte](0xff.toByte, 0xf8.toByte, 0xc0.toByte,
      ((channels - 1) << 4).toByte, 0x00)
    out.write(fh, 0, 5)
    out.write(crc8(fh, 0, 5))
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
}
