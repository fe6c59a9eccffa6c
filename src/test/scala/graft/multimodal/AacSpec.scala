package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ADTS AAC probe tier (r12). Pinning: hand-built header bytes with
  * independently computed field values (both CRC forms, MPEG-2/4 ids,
  * multi-raw-data-block frames), reserved-value rejects, frame-walk
  * arithmetic, duration math from first principles, payload identity
  * (mux-invariant, one-byte-sensitive), and truncation/garbage fuzz.
  * No external ADTS material exists in the container (the r12 sweep
  * found WAV/MP3/AIFF only) — the transcription caveat of the video
  * tiers applies until one appears.
  */
class AacSpec extends AnyFunSuite {

  test("hand-built ADTS headers parse field-exact (both CRC forms)") {
    // MPEG-4, no CRC, LC, 44100 (idx 4), stereo, frameLen 1031,
    // fullness 0x234, 1 rdb — bytes composed BY HAND:
    //   ff f1 | 01 010001 0 | 10 000000 11 | 00000111 | 111 01000 | 110100 00
    val b = Array[Byte](0xff.toByte, 0xf1.toByte, 0x50, 0x81.toByte,
      0x80.toByte, 0xe8.toByte, 0xd0.toByte, 0, 0, 0)
    val h = Aac.parseHeader(b, 0).get
    assert(!h.mpeg2 && !h.crc && h.profile == 1)
    assert(h.sampleRate == 44100 && h.srIndex == 4 && h.channels == 2)
    // the length as composed: (0x81 & 3) << 11 | 0x80 << 3 | (0xe8 >> 5)
    assert(h.frameLen == 2048 + 1024 + 7)
    assert(h.bufferFullness == ((0xe8 & 0x1f) << 6 | (0xd0 & 0xfc) >> 2))
    assert(h.rawDataBlocks == 1 && h.headerLen == 7 && h.samples == 1024)

    // MPEG-2, CRC present, Main profile, 8000 (idx 11), mono, 2 rdbs
    val c = Array[Byte](0xff.toByte, 0xf8.toByte, 0x2c, 0x40, 0x2e, 0x20,
      0x41, 0x12, 0x34, 0, 0, 0)
    val hc = Aac.parseHeader(c, 0).get
    assert(hc.mpeg2 && hc.crc && hc.profile == 0)
    assert(hc.sampleRate == 8000 && hc.channels == 1)
    assert(hc.headerLen == 9 && hc.rawDataBlocks == 2 && hc.samples == 2048)
  }

  test("reserved/invalid headers reject") {
    def hdr(b1: Int, b2: Int, b3: Int = 0x80, b4: Int = 0x20,
        b5: Int = 0xe8, b6: Int = 0xd0): Array[Byte] =
      Array(0xff.toByte, b1.toByte, b2.toByte, b3.toByte, b4.toByte,
        b5.toByte, b6.toByte, 0, 0, 0)
    assert(Aac.parseHeader(hdr(0xf3, 0x50), 0).isEmpty) // layer != 0
    assert(Aac.parseHeader(hdr(0xf1, 0x74), 0).isEmpty) // srIdx 13
    assert(Aac.parseHeader(hdr(0xf1, 0x7c), 0).isEmpty) // srIdx 15
    assert(Aac.parseHeader( // channel_configuration 0 (PCE) rejects
      Array[Byte](0xff.toByte, 0xf1.toByte, 0x50, 0x00, 0x40,
        0xe8.toByte, 0xd0.toByte, 0, 0, 0), 0).isEmpty)
    // frameLen smaller than its own header rejects
    assert(Aac.parseHeader(
      Array[Byte](0xff.toByte, 0xf1.toByte, 0x50, 0x80.toByte, 0x00,
        0x68, 0xd0.toByte, 0, 0, 0), 0).isEmpty)
    assert(Aac.parseHeader(Array[Byte](0xff.toByte, 0xe1.toByte), 0).isEmpty)
  }

  test("frame walk + probe arithmetic from first principles") {
    val rnd = new scala.util.Random(5)
    val payloads = Seq.fill(25)(Array.fill(300)(rnd.nextInt(256).toByte))
    val b = Aac.build(payloads, srIdx = 6, channels = 2) // 24000 Hz
    val fs = Aac.frames(b)
    assert(fs.size == 25)
    assert(fs.forall(_._2.frameLen == 307))
    assert(fs.map(_._1) == (0 until 25).map(_ * 307))
    val info = Aac.probe(b).get
    assert(info.sampleRate == 24000 && info.channels == 2 && info.profile == 1)
    assert(info.nFrames == 25)
    assert(info.durationMs == 25L * 1024 * 1000 / 24000)
    assert(info.avgBitrateKbps == (25L * 307 * 8 / info.durationMs).toInt)
    // ID3v2-wrapped stream walks identically
    val tagged = Aac.build(payloads, srIdx = 6, channels = 2,
      id3v2 = Some(Array.fill(77)(0x41.toByte)))
    assert(Aac.frames(tagged).size == 25)
    assert(Aac.probe(tagged).get.durationMs == info.durationMs)
    // truncation: the cut frame drops, earlier frames survive
    assert(Aac.frames(java.util.Arrays.copyOf(b, 307 * 10 + 100)).size == 10)
    assert(Aac.probe(Array.fill(500)(0x47.toByte)).isEmpty)
  }

  test("payload identity: mux-invariant, one-byte-sensitive") {
    val rnd = new scala.util.Random(9)
    val payloads = Seq.fill(8)(Array.fill(256)(rnd.nextInt(256).toByte))
    val a = Aac.build(payloads, srIdx = 4, channels = 2, fullness = 0x7ff)
    val b = Aac.build(payloads, srIdx = 4, channels = 2, fullness = 0x123,
      id3v2 = Some(Array.fill(40)(0x42.toByte)))
    assert(!java.util.Arrays.equals(a, b))
    assert(Aac.framePayloads(a).map(_.toSeq) == Aac.framePayloads(b).map(_.toSeq))
    val mutated = payloads.map(_.clone())
    mutated(3)(7) = (mutated(3)(7) ^ 1).toByte
    val c = Aac.build(mutated, srIdx = 4, channels = 2, fullness = 0x7ff)
    assert(Aac.framePayloads(a).map(_.toSeq) != Aac.framePayloads(c).map(_.toSeq))
  }

  test("MP3 and ADTS parsers are mutually exclusive on each other's streams") {
    val rnd = new scala.util.Random(13)
    val aac = Aac.build(Seq.fill(6)(Array.fill(200)(rnd.nextInt(256).toByte)))
    val mp3 = Mp3.build(Seq.fill(6)(Array.fill(413)(rnd.nextInt(256).toByte)))
    // each walker refuses the other's framing at offset 0 (layer bits)
    assert(Mp3.parseFrameHeader(aac, 0).isEmpty)
    assert(Aac.parseHeader(mp3, 0).isEmpty)
  }

  test("fuzz: truncations and corruptions never throw or hang") {
    val rnd = new scala.util.Random(21)
    val b = Aac.build(Seq.fill(10)(Array.fill(150)(rnd.nextInt(256).toByte)),
      id3v2 = Some(Array.fill(30)(1.toByte)))
    for (cut <- 0 to b.length by 11)
      Aac.frames(java.util.Arrays.copyOf(b, cut))
    for (_ <- 0 until 400) {
      val mut = b.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Aac.probe(mut)
      Aac.framePayloads(mut)
    }
  }
}
