package graft.multimodal

/** G.711 companded audio (ITU-T G.711 µ-law and A-law, the CCITT bit
  * algorithm in its 14/13-bit libst form) plus the two classic
  * big-endian audio containers that carry it — Sun AU (".snd") and
  * AIFF / AIFF-C (EA IFF 85) — and a minimal RIFF/WAVE parse for the
  * PCM / G.711 format tags. This is the audio ladder's first DECODE
  * rung (r12): MP3 (q162) probes compressed frames without decoding;
  * G.711 decodes to linear PCM, so dedup graduates from payload-byte
  * identity to decoded-sample identity across containers and
  * companding laws.
  *
  * EXTERNAL conformance (unlike the video entropy tiers, this rung has
  * in-container vectors): the CPython test-suite audio corpus
  * (Lib/test/audiodata, the "pluck" family — ships in this container
  * under the installed Python trees) provides externally-produced
  * µ-law AU, A-law/µ-law AIFF-C and PCM WAV/AIFF/AU renditions of one
  * recording, with the expected decoded frames published in
  * test_sunau/test_aifc; G711AudioSpec pins our decode byte-exact
  * against those vectors and against the JDK's independent
  * javax.sound ULAW converter.
  */
object G711Audio {

  // ------------------------------------------------------------ G.711 codecs

  /** µ-law byte → 16-bit linear (§G.711 Table 2a/2b, the CCITT
    * expansion: invert, extract segment+quantization, bias 0x84).
    */
  def ulawToLinear(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** 16-bit linear → µ-law byte (the 14-bit variant: magnitudes are
    * taken at 14-bit precision with CLIP 8159 and bias 0x84 >> 2 —
    * the form CPython's audioop ships; decode∘encode is the identity
    * on codes except 0x7F, whose negative zero re-encodes as 0xFF).
    */
  def linearToUlaw(pcmIn: Int): Int = {
    var pcm = pcmIn >> 2
    val mask = if (pcm >= 0) 0xff else 0x7f
    if (pcm < 0) pcm = -pcm
    if (pcm > 8159) pcm = 8159
    pcm += 0x21
    var seg = 0
    while (seg < 8 && pcm > ulawSegEnd(seg)) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else ((seg << 4) | ((pcm >> (seg + 1)) & 0x0f)) ^ mask
  }
  private val ulawSegEnd =
    Array(0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff, 0x1fff)

  /** A-law byte → 16-bit linear (§G.711 Table 1a/1b: XOR 0x55,
    * segment expansion with the half-step offset).
    */
  def alawToLinear(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** 16-bit linear → A-law byte (13-bit variant; decode∘encode is the
    * identity on all 256 codes).
    */
  def linearToAlaw(pcmIn: Int): Int = {
    var pcm = pcmIn >> 3
    var mask = 0xd5
    if (pcm < 0) { mask = 0x55; pcm = -pcm - 1 }
    var seg = 0
    while (seg < 8 && pcm > alawSegEnd(seg)) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      var aval = seg << 4
      aval |= (if (seg < 2) (pcm >> 1) else (pcm >> seg)) & 0x0f
      aval ^ mask
    }
  }
  private val alawSegEnd =
    Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  // -------------------------------------------------------- decoded result

  /** `format`: "pcm8" | "pcm16" | "ulaw" | "alaw" (the CODED form);
    * samples are interleaved 16-bit linear regardless.
    */
  final case class AudioInfo(format: String, sampleRate: Int,
      channels: Int, frames: Int)
  final case class DecodedPcm(info: AudioInfo, samples: Array[Short])

  @inline private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  @inline private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  @inline private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  @inline private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  private def decodeBody(format: String, data: Array[Byte], off: Int,
      len: Int, littleEndianPcm: Boolean): Array[Short] = format match {
    case "ulaw" =>
      Array.tabulate(len)(i => ulawToLinear(data(off + i) & 0xff).toShort)
    case "alaw" =>
      Array.tabulate(len)(i => alawToLinear(data(off + i) & 0xff).toShort)
    case "pcm8" => // AU linear-8 is SIGNED; WAV 8-bit is unsigned (offset)
      if (littleEndianPcm)
        Array.tabulate(len)(i => (((data(off + i) & 0xff) - 128) << 8).toShort)
      else Array.tabulate(len)(i => (data(off + i) << 8).toShort)
    case "pcm16" =>
      Array.tabulate(len / 2)(i =>
        (if (littleEndianPcm) le16(data, off + 2 * i)
         else be16(data, off + 2 * i)).toShort)
    case other => throw new IllegalArgumentException(s"bad format $other")
  }

  // --------------------------------------------------------------- Sun AU

  /** AU encoding ids (au_filehdr.h): 1 µ-law, 2 linear-8, 3 linear-16
    * BE, 27 A-law.
    */
  def parseAu(b: Array[Byte]): Option[(AudioInfo, Int, Int)] = {
    if (b.length < 24 || b(0) != '.' || b(1) != 's' || b(2) != 'n' ||
      b(3) != 'd') return None
    val dataOff = be32(b, 4)
    val rawSize = be32(b, 8) // 0xffffffff = unknown → rest of file
    val enc = be32(b, 12)
    val rate = be32(b, 16)
    val channels = be32(b, 20)
    if (dataOff < 24 || dataOff > b.length || rate <= 0 || rate > 1000000 ||
      channels <= 0 || channels > 16) return None
    // any negative be32 size (not just 0xffffffff) = unknown → rest of file,
    // else Array.tabulate(negative) downstream would throw instead of None
    val size = math.min(
      if (rawSize < 0) b.length - dataOff else rawSize, b.length - dataOff)
    val (fmt, bytesPer) = enc match {
      case 1 => ("ulaw", 1)
      case 2 => ("pcm8", 1)
      case 3 => ("pcm16", 2)
      case 27 => ("alaw", 1)
      case _ => return None
    }
    Some((AudioInfo(fmt, rate, channels, size / (bytesPer * channels)),
      dataOff, size))
  }

  def decodeAu(b: Array[Byte]): Option[DecodedPcm] =
    parseAu(b).map { case (info, off, size) =>
      DecodedPcm(info, decodeBody(info.format, b, off, size,
        littleEndianPcm = false))
    }

  /** Minimal AU writer (24-byte header + body). `format` as in
    * [[AudioInfo]]; pcm16 bodies must already be big-endian bytes.
    */
  def writeAu(format: String, rate: Int, channels: Int,
      body: Array[Byte]): Array[Byte] = {
    val enc = format match {
      case "ulaw" => 1; case "pcm8" => 2; case "pcm16" => 3; case "alaw" => 27
      case other => throw new IllegalArgumentException(s"bad format $other")
    }
    val out = java.nio.ByteBuffer.allocate(24 + body.length)
    out.put(".snd".getBytes("US-ASCII"))
    out.putInt(24).putInt(body.length).putInt(enc).putInt(rate).putInt(channels)
    out.put(body)
    out.array()
  }

  // ------------------------------------------------------------ AIFF/AIFC

  /** IEEE 754 80-bit extended float → integer sample rate (the COMM
    * chunk's rate field): sign(1) exponent(15) explicit-integer-bit
    * mantissa(64).
    */
  private[multimodal] def readExtended(b: Array[Byte], i: Int): Int = {
    val exp = (((b(i) & 0x7f) << 8) | (b(i + 1) & 0xff)) - 16383
    var mant = 0L
    var k = 0
    while (k < 8) { mant = (mant << 8) | (b(i + 2 + k) & 0xff); k += 1 }
    if (mant == 0 || exp < 0 || exp > 62) return 0
    val shift = 63 - exp
    (((mant >>> (shift - 1)) + 1) >> 1).toInt // round half up
  }

  private[multimodal] def writeExtended(rate: Int): Array[Byte] = {
    require(rate > 0, s"bad rate $rate")
    var exp = 16383 + 63
    var mant = rate.toLong
    while ((mant & 0x8000000000000000L) == 0) { mant <<= 1; exp -= 1 }
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0x7f).toByte
    out(1) = (exp & 0xff).toByte
    var k = 0
    while (k < 8) { out(2 + k) = ((mant >>> (56 - 8 * k)) & 0xff).toByte; k += 1 }
    out
  }

  /** Parse FORM/AIFF or FORM/AIFC down to (info, ssndDataOffset,
    * ssndDataSize). AIFC compression types: NONE (PCM BE), ulaw/ULAW,
    * alaw/ALAW; anything else → None (sowt etc. out of the rung).
    */
  def parseAiff(b: Array[Byte]): Option[(AudioInfo, Int, Int)] = {
    if (b.length < 12 || b(0) != 'F' || b(1) != 'O' || b(2) != 'R' ||
      b(3) != 'M') return None
    val kind = new String(b, 8, 4, "US-ASCII")
    val aifc = kind == "AIFC"
    if (!aifc && kind != "AIFF") return None
    var channels = 0; var frames = 0; var bits = 0; var rate = 0
    var fmt: String = null
    var ssndOff = -1; var ssndSize = 0
    var i = 12
    while (i + 8 <= b.length) {
      val cid = new String(b, i, 4, "US-ASCII")
      val sz = be32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      cid match {
        case "COMM" =>
          if (sz < 18) return None
          channels = be16(b, i + 8)
          frames = be32(b, i + 10)
          bits = be16(b, i + 14)
          rate = readExtended(b, i + 16)
          fmt =
            if (!aifc) { if (bits == 16) "pcm16" else if (bits == 8) "pcm8" else null }
            else {
              if (sz < 22) return None
              new String(b, i + 26, 4, "US-ASCII") match {
                case "NONE" =>
                  if (bits == 16) "pcm16" else if (bits == 8) "pcm8" else null
                case "ulaw" | "ULAW" => "ulaw"
                case "alaw" | "ALAW" => "alaw"
                case _ => null
              }
            }
        case "SSND" =>
          if (sz < 8) return None
          val offset = be32(b, i + 8) // alignment offset inside the chunk
          ssndOff = i + 16 + offset
          ssndSize = sz - 8 - offset
        case _ => // FVER / MARK / annotations
      }
      i += 8 + sz + (sz & 1) // chunks pad to even
    }
    // ssndSize < 0 when the SSND alignment offset exceeds sz-8: malformed,
    // survives as undecodable data rather than a NegativeArraySizeException
    if (fmt == null || channels <= 0 || channels > 16 || rate <= 0 ||
      ssndOff < 0 || ssndSize < 0 || ssndOff + ssndSize > b.length) None
    else Some((AudioInfo(fmt, rate, channels, frames), ssndOff, ssndSize))
  }

  def decodeAiff(b: Array[Byte]): Option[DecodedPcm] =
    parseAiff(b).map { case (info, off, size) =>
      DecodedPcm(info, decodeBody(info.format, b, off, size,
        littleEndianPcm = false))
    }

  /** Minimal AIFF (format "pcm16"/"pcm8") or AIFF-C (G.711) writer.
    * `frames` = per-channel sample count; pcm16 bodies big-endian.
    */
  def writeAiff(format: String, rate: Int, channels: Int, frames: Int,
      body: Array[Byte]): Array[Byte] = {
    val aifc = format == "ulaw" || format == "alaw"
    val commSz = if (aifc) 24 else 18 // +4cc compression +empty pstring
    val bits = if (format == "pcm16") 16 else if (format == "pcm8") 8 else 16
    val ssndSz = 8 + body.length
    val buf = java.nio.ByteBuffer.allocate(
      12 + (if (aifc) 12 else 0) + 8 + commSz + 8 + ssndSz + (ssndSz & 1))
    buf.put("FORM".getBytes("US-ASCII")).putInt(buf.capacity - 8)
    buf.put((if (aifc) "AIFC" else "AIFF").getBytes("US-ASCII"))
    if (aifc) { // FVER, required by the AIFC spec
      buf.put("FVER".getBytes("US-ASCII")).putInt(4)
      buf.putInt(0xA2805140) // AIFCVersion1 timestamp
    }
    buf.put("COMM".getBytes("US-ASCII")).putInt(commSz)
    buf.putShort(channels.toShort).putInt(frames).putShort(bits.toShort)
    buf.put(writeExtended(rate))
    if (aifc) {
      buf.put(format.getBytes("US-ASCII")) // "ulaw" | "alaw"
      buf.putShort(0) // empty pstring (length 0 + pad)
    }
    buf.put("SSND".getBytes("US-ASCII")).putInt(ssndSz)
    buf.putInt(0).putInt(0) // offset, blockSize
    buf.put(body)
    buf.array()
  }

  // ------------------------------------------------------------- RIFF/WAVE

  /** WAVE format tags: 1 PCM (8-bit unsigned / 16-bit LE), 6 A-law,
    * 7 µ-law.
    */
  def parseWav(b: Array[Byte]): Option[(AudioInfo, Int, Int)] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var fmt: String = null; var rate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataSize = 0
    var i = 12
    while (i + 8 <= b.length) {
      val cid = new String(b, i, 4, "US-ASCII")
      val sz = le32(b, i + 4)
      if (sz < 0 || i + 8 + sz > b.length) return None
      cid match {
        case "fmt " =>
          if (sz < 16) return None
          val tag = le16(b, i + 8)
          channels = le16(b, i + 10)
          rate = le32(b, i + 12)
          bits = le16(b, i + 22)
          fmt = tag match {
            case 1 => if (bits == 16) "pcm16" else if (bits == 8) "pcm8" else null
            case 6 => "alaw"
            case 7 => "ulaw"
            case _ => null
          }
        case "data" => dataOff = i + 8; dataSize = sz
        case _ =>
      }
      i += 8 + sz + (sz & 1)
    }
    if (fmt == null || rate <= 0 || channels <= 0 || channels > 16 ||
      dataOff < 0) None
    else {
      val bytesPer = if (fmt == "pcm16") 2 else 1
      Some((AudioInfo(fmt, rate, channels,
        dataSize / (bytesPer * channels)), dataOff, dataSize))
    }
  }

  def decodeWav(b: Array[Byte]): Option[DecodedPcm] =
    parseWav(b).map { case (info, off, size) =>
      DecodedPcm(info, decodeBody(info.format, b, off, size,
        littleEndianPcm = true))
    }

  /** Minimal WAVE writer; pcm16 bodies little-endian, G.711 bodies raw. */
  def writeWav(format: String, rate: Int, channels: Int,
      body: Array[Byte]): Array[Byte] = {
    val (tag, bits, bytesPer) = format match {
      case "pcm16" => (1, 16, 2)
      case "pcm8" => (1, 8, 1)
      case "alaw" => (6, 8, 1)
      case "ulaw" => (7, 8, 1)
      case other => throw new IllegalArgumentException(s"bad format $other")
    }
    val buf = java.nio.ByteBuffer.allocate(44 + body.length + (body.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(tag.toShort).putShort(channels.toShort).putInt(rate)
    buf.putInt(rate * channels * bytesPer)
    buf.putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(body.length)
    buf.put(body)
    buf.array()
  }

  // ----------------------------------------------------------- any-container

  /** Sniff by magic and decode: AU, AIFF/AIFC, or WAVE. */
  def decodeAny(b: Array[Byte]): Option[DecodedPcm] =
    if (b.length < 12) None
    else if (b(0) == '.' && b(1) == 's') decodeAu(b)
    else if (b(0) == 'F' && b(1) == 'O') decodeAiff(b)
    else if (b(0) == 'R' && b(1) == 'I') decodeWav(b)
    else None
}
