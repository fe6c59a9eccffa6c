package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FLAC probe tier (r12). Pinning: hand-assembled STREAMINFO bit
  * layouts with independently computed field values, CRC-8 vectors
  * computed from the polynomial by hand, UTF-8 frame-number and
  * blocksize/rate code tables through hand-built headers, metadata
  * walking across block types, audio-section identity (retag-
  * invariant, one-byte-sensitive), and truncation/garbage fuzz. No
  * external FLAC material exists in the container (the r12 sweep) —
  * the transcription caveat applies until one appears.
  */
class FlacSpec extends AnyFunSuite {

  test("STREAMINFO bit layout parses field-exact (hand-assembled)") {
    // rate 44100 / 2ch / 16bps / 123456 samples packed BY HAND:
    // 44100 = 0xAC44 → 20 bits 0x0AC44; (2−1)=1 in 3 bits; (16−1)=15
    // in 5 bits; samples 36 bits. 64-bit tail =
    // 0x0AC44 << 44 | 1 << 41 | 15 << 36 | 123456
    val tail = (0x0AC44L << 44) | (1L << 41) | (15L << 36) | 123456L
    val si = new Array[Byte](34)
    si(0) = 0x10; si(2) = 0x10 // min/max block 4096
    for (k <- 0 until 8) si(10 + k) = ((tail >>> (56 - 8 * k)) & 0xff).toByte
    val file = "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
    val (info, end, types) = Flac.metadata(file).get
    assert(info == Flac.StreamInfo(4096, 4096, 44100, 2, 16, 123456L))
    assert(end == file.length && types == Set(0))
    // probe math: duration = samples · 1000 / rate
    // (no frame section here — probe only needs metadata)
    val p = Flac.probe(file).get
    assert(p.durationMs == 123456L * 1000 / 44100)
    assert(!p.hasVorbisComment && !p.hasPicture)
  }

  test("CRC-8 (poly 0x07) matches hand-computed vectors") {
    // crc8 of a single 0x00 byte is 0x00; of 0x01 is 0x07;
    // of "123456789" the standard CRC-8/SMBUS check value 0xF4
    assert(Flac.crc8(Array[Byte](0), 0, 1) == 0x00)
    assert(Flac.crc8(Array[Byte](1), 0, 1) == 0x07)
    assert(Flac.crc8("123456789".getBytes("US-ASCII"), 0, 9) == 0xf4)
  }

  test("frame headers: code tables, UTF-8 numbers, CRC-8 gate") {
    val si = Flac.StreamInfo(4096, 4096, 48000, 2, 16, 0)
    // variable blocking (bit 0 of byte 1); blocksize code 7 → 16-bit
    // follow-on; rate code 13 → Hz in 16 bits; sample number 300
    // (UTF-8: 2 bytes C4 AC)
    val h = Array[Byte](0xff.toByte, 0xf9.toByte, 0x7d, 0x10,
      0xc4.toByte, 0xac.toByte,
      0x0f, 0x9f.toByte, // blocksize − 1 = 3999 → 4000
      0xbb.toByte, 0x80.toByte, // rate 48000
      0)
    h(h.length - 1) = Flac.crc8(h, 0, h.length - 1).toByte
    val fh = Flac.parseFrameHeader(h, 0, si).get
    assert(fh.blockSize == 4000 && fh.sampleRate == 48000)
    assert(fh.channels == 2 && fh.bitsPerSample == 16)
    assert(fh.frameNumber == 300 && fh.blockingStrategy == 1)
    // a flipped CRC byte rejects
    val bad = h.clone(); bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    assert(Flac.parseFrameHeader(bad, 0, si).isEmpty)
    // fixed-table codes: bsCode 12 → 4096; srCode 9 → 44100
    val h2 = Array[Byte](0xff.toByte, 0xf8.toByte, 0xc9.toByte, 0x00, 0x00, 0)
    h2(5) = Flac.crc8(h2, 0, 5).toByte
    val fh2 = Flac.parseFrameHeader(h2, 0, si).get
    assert(fh2.blockSize == 4096 && fh2.sampleRate == 44100 &&
      fh2.channels == 1 && fh2.frameNumber == 0)
    // reserved values reject: bsCode 0, srCode 15, channel 11+, bps 3
    assert(Flac.parseFrameHeader(Array[Byte](0xff.toByte, 0xf8.toByte,
      0x09, 0x00, 0x00, 0x59), 0, si).isEmpty)
    assert(Flac.parseFrameHeader(Array[Byte](0xff.toByte, 0xf8.toByte,
      0xcf.toByte, 0x00, 0x00, 0x00), 0, si).isEmpty)
    assert(Flac.parseFrameHeader(Array[Byte](0xff.toByte, 0xf8.toByte,
      0xc9.toByte, 0xb0.toByte, 0x00, 0x00), 0, si).isEmpty)
  }

  test("build → metadata/probe/audioSection round-trip across tag shapes") {
    val rnd = new scala.util.Random(7)
    val payload = Array.fill(3000)(rnd.nextInt(256).toByte)
    val bare = Flac.build(44100, 2, 16, 44100L * 30, payload)
    val p = Flac.probe(bare).get
    assert(p.sampleRate == 44100 && p.channels == 2 && p.bitsPerSample == 16)
    assert(p.durationMs == 30000 && !p.hasVorbisComment)
    val tagged = Flac.build(44100, 2, 16, 44100L * 30, payload,
      vorbisComment = Some(Array.fill(64)(0x42.toByte)), paddingLen = 32)
    assert(Flac.probe(tagged).get.hasVorbisComment)
    // the audio section is tag-invariant and byte-sensitive
    assert(Flac.audioSection(bare).get.toSeq ==
      Flac.audioSection(tagged).get.toSeq)
    val mutated = payload.clone(); mutated(100) = (mutated(100) ^ 1).toByte
    val other = Flac.build(44100, 2, 16, 44100L * 30, mutated)
    assert(Flac.audioSection(bare).get.toSeq !=
      Flac.audioSection(other).get.toSeq)
    // a stream whose first frame header is corrupt yields no section
    val broken = tagged.clone()
    val secStart = Flac.metadata(tagged).get._2
    broken(secStart) = 0x00
    assert(Flac.audioSection(broken).isEmpty)
  }

  test("fuzz: truncations and corruptions never throw or hang") {
    val rnd = new scala.util.Random(23)
    val b = Flac.build(48000, 1, 24, 48000L * 10,
      Array.fill(2000)(rnd.nextInt(256).toByte),
      vorbisComment = Some(Array.fill(50)(9.toByte)), paddingLen = 20)
    for (cut <- 0 to b.length by 13)
      Flac.probe(java.util.Arrays.copyOf(b, cut))
    for (_ <- 0 until 400) {
      val mut = b.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Flac.probe(mut)
      Flac.audioSection(mut)
    }
  }
}
