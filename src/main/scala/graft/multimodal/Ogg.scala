package graft.multimodal

/** Ogg/Opus PROBE tier (r12, the fourth compressed-audio rung — RFC
  * 3533 Ogg framing + RFC 7845 Opus-in-Ogg): page walking with the
  * Ogg CRC-32 verified (poly 0x04C11DB7, init 0, unreflected, no
  * xorout — computed over the page with its CRC field zeroed),
  * lacing-value packet reassembly (255-continuation chains, nil
  * packets), OpusHead/OpusTags parse, duration from the last page's
  * 48 kHz granule position minus pre-skip, and AUDIO-PACKET
  * extraction for retag-invariant dedup: the OpusTags packet (and
  * page-level re-framing — serials, sequence numbers, CRCs) carries
  * no audio identity; the concatenated audio packets do. Packet
  * payloads (SILK/CELT frames) stay opaque behind the injectable
  * decoder boundary, the MP3/AAC/FLAC posture. A writer builds
  * conformant streams for round-trip pins and the fixture corpus.
  */
object Ogg {

  final case class Page(headerType: Int, granule: Long, serial: Int,
      seq: Int, offset: Int, headerLen: Int, bodyLen: Int,
      lacing: Array[Int])

  final case class OpusInfo(channels: Int, preSkip: Int,
      inputSampleRate: Int, nAudioPackets: Int, durationMs: Long,
      vendorLen: Int)

  /** The Ogg CRC-32 over `b[from, until)`. */
  def crc(b: Array[Byte], from: Int, until: Int, init: Int = 0): Int = {
    var c = init
    var i = from
    while (i < until) {
      c ^= (b(i) & 0xff) << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      i += 1
    }
    c
  }

  @inline private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  @inline private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  @inline private def le64(b: Array[Byte], i: Int): Long =
    (le32(b, i + 4).toLong << 32) | (le32(b, i) & 0xffffffffL)

  /** Parse the page at `off` — CRC-verified; None on anything short,
    * non-'OggS', bad version, or a checksum mismatch.
    */
  def parsePage(b: Array[Byte], off: Int): Option[Page] = {
    if (off + 27 > b.length) return None
    if (b(off) != 'O' || b(off + 1) != 'g' || b(off + 2) != 'g' ||
      b(off + 3) != 'S' || b(off + 4) != 0) return None
    val headerType = b(off + 5) & 0xff
    val granule = le64(b, off + 6)
    val serial = le32(b, off + 14)
    val seq = le32(b, off + 18)
    val pageCrc = le32(b, off + 22)
    val nSegs = b(off + 26) & 0xff
    val headerLen = 27 + nSegs
    if (off + headerLen > b.length) return None
    val lacing = Array.tabulate(nSegs)(i => b(off + 27 + i) & 0xff)
    val bodyLen = lacing.sum
    if (off + headerLen + bodyLen > b.length) return None
    // CRC over the page with the crc field zeroed (RFC 3533 §6)
    var c = crc(b, off, off + 22)
    c = crc(Array[Byte](0, 0, 0, 0), 0, 4, c)
    c = crc(b, off + 26, off + headerLen + bodyLen, c)
    if (c != pageCrc) return None
    Some(Page(headerType, granule, serial, seq, off, headerLen, bodyLen,
      lacing))
  }

  /** Walk all pages from offset 0; stops at the first invalid page. */
  def pages(b: Array[Byte]): Seq[Page] = {
    val out = Seq.newBuilder[Page]
    var off = 0
    var done = false
    while (!done) {
      parsePage(b, off) match {
        case Some(p) =>
          out += p
          off += p.headerLen + p.bodyLen
        case None => done = true
      }
    }
    out.result()
  }

  /** Reassemble packets across the page sequence (lacing chains; a
    * 255 value continues the packet — possibly across pages).
    */
  def packets(b: Array[Byte], ps: Seq[Page]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    var open = false
    ps.foreach { p =>
      var bodyOff = p.offset + p.headerLen
      p.lacing.foreach { l =>
        cur.write(b, bodyOff, l)
        bodyOff += l
        open = true
        if (l < 255) { out += cur.toByteArray; cur.reset(); open = false }
      }
    }
    if (open) out += cur.toByteArray // truncated final packet
    out.result()
  }

  /** Probe an Ogg-Opus stream: OpusHead facts, audio-packet count and
    * duration (last granule − pre-skip, 48 kHz ticks). None unless
    * the first packet is a valid OpusHead.
    */
  def probeOpus(b: Array[Byte]): Option[OpusInfo] = {
    val ps = pages(b)
    if (ps.isEmpty) return None
    val pk = packets(b, ps)
    if (pk.size < 2) return None
    val head = pk.head
    if (head.length < 19 ||
      new String(head, 0, 8, "US-ASCII") != "OpusHead" ||
      (head(8) & 0xff) != 1) return None
    val channels = head(9) & 0xff
    val preSkip = le16(head, 10)
    val rate = le32(head, 12)
    val tags = pk(1)
    if (tags.length < 8 ||
      new String(tags, 0, 8, "US-ASCII") != "OpusTags") return None
    val vendorLen = if (tags.length >= 12) le32(tags, 8) else 0
    val granule = ps.last.granule
    val durMs = math.max(0L, granule - preSkip) * 1000 / 48000
    Some(OpusInfo(channels, preSkip, rate, pk.size - 2, durMs, vendorLen))
  }

  /** The concatenated AUDIO packets (everything after OpusHead and
    * OpusTags) — the retag/reframe-invariant identity. None unless
    * the stream probes as Ogg-Opus.
    */
  def audioPackets(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (probeOpus(b).isEmpty) return None
    Some(packets(b, pages(b)).drop(2))
  }

  /** Write one page (computes the CRC). `packetsInPage` become lacing
    * chains; each must be < 65025 bytes (255 segments) here.
    */
  def writePage(headerType: Int, granule: Long, serial: Int, seq: Int,
      packetsInPage: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = scala.collection.mutable.ArrayBuffer.empty[Int]
    packetsInPage.foreach { p =>
      var rem = p.length
      while (rem >= 255) { lacing += 255; rem -= 255 }
      lacing += rem // the terminating value (0 for exact multiples)
    }
    require(lacing.size <= 255, "too many lacing values for one page")
    val bodyLen = packetsInPage.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(27 + lacing.size + bodyLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("OggS".getBytes("US-ASCII")).put(0.toByte)
    out.put(headerType.toByte).putLong(granule).putInt(serial).putInt(seq)
    out.putInt(0) // crc placeholder
    out.put(lacing.size.toByte)
    lacing.foreach(l => out.put(l.toByte))
    packetsInPage.foreach(p => out.put(p))
    val page = out.array()
    val c = crc(page, 0, page.length)
    page(22) = (c & 0xff).toByte; page(23) = ((c >> 8) & 0xff).toByte
    page(24) = ((c >> 16) & 0xff).toByte; page(25) = ((c >> 24) & 0xff).toByte
    page
  }

  /** Build a conformant Ogg-Opus stream: OpusHead page (BOS), OpusTags
    * page, then one page per audio packet with a running 48 kHz
    * granule (960 ticks — 20 ms — per packet), EOS on the last.
    */
  def buildOpus(audio: Seq[Array[Byte]], channels: Int = 2,
      preSkip: Int = 312, inputRate: Int = 48000, serial: Int = 1,
      vendor: String = "graft", tags: Seq[String] = Nil): Array[Byte] = {
    val head = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    head.put("OpusHead".getBytes("US-ASCII")).put(1.toByte)
    head.put(channels.toByte).putShort(preSkip.toShort).putInt(inputRate)
    head.putShort(0).put(0.toByte) // gain 0, mapping family 0
    val vb = vendor.getBytes("UTF-8")
    val tagBufs = tags.map(_.getBytes("UTF-8"))
    // "OpusTags"(8) + vendorLen(4) + vendor + count(4) + Σ(4 + tag)
    val tagsBuf = java.nio.ByteBuffer.allocate(
      16 + vb.length + 4 * tagBufs.size + tagBufs.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tagsBuf.put("OpusTags".getBytes("US-ASCII"))
    tagsBuf.putInt(vb.length).put(vb)
    tagsBuf.putInt(tagBufs.size)
    tagBufs.foreach { t => tagsBuf.putInt(t.length).put(t) }
    val out = new java.io.ByteArrayOutputStream()
    out.writeBytes(writePage(0x02, 0L, serial, 0, Seq(head.array()))) // BOS
    out.writeBytes(writePage(0x00, 0L, serial, 1, Seq(tagsBuf.array())))
    var granule = preSkip.toLong
    audio.zipWithIndex.foreach { case (p, i) =>
      granule += 960 // 20 ms at 48 kHz
      val eos = if (i == audio.size - 1) 0x04 else 0x00
      out.writeBytes(writePage(eos, granule, serial, 2 + i, Seq(p)))
    }
    out.toByteArray
  }
}
