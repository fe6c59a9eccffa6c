package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Ogg/Opus probe tier (r12). Pinning: the Ogg CRC-32 against its
  * hand-derived check value (and the CRC-32/POSIX xorout relation),
  * page-walk/lacing arithmetic incl. 255-continuation chains and
  * exact-multiple nil terminators, OpusHead/OpusTags field parses,
  * granule/duration math from first principles, CRC tamper
  * detection, audio-packet identity (re-mux-invariant, one-byte-
  * sensitive), and truncation/garbage fuzz. No external Ogg material
  * exists in the container — the transcription caveat applies.
  */
class OggSpec extends AnyFunSuite {

  test("Ogg CRC-32 matches the hand-derived check values") {
    // poly 0x04C11DB7, init 0, unreflected, no xorout:
    // check("123456789") = 0x89A1897F; equivalently CRC-32/POSIX's
    // catalog check 0x765E7680 XOR 0xFFFFFFFF (same core, xorout only)
    val d = "123456789".getBytes("US-ASCII")
    assert(Ogg.crc(d, 0, 9) == 0x89a1897f)
    assert((Ogg.crc(d, 0, 9) ^ 0xffffffff) == 0x765e7680)
    assert(Ogg.crc(Array[Byte](0), 0, 1) == 0)
    assert(Ogg.crc(Array[Byte](1), 0, 1) == 0x04c11db7)
  }

  test("page walk: lacing chains, continuation, nil terminators, CRC gate") {
    val rnd = new scala.util.Random(3)
    // packet sizes exercising every lacing shape: < 255, == 255
    // (needs a nil terminator), 255·2+7 (continuation), 0 (nil packet)
    val pk = Seq(100, 255, 517, 0, 42).map(n =>
      Array.fill(n)(rnd.nextInt(256).toByte))
    val page = Ogg.writePage(0x02, 1234567890123L, 0x7abc, 9, pk)
    val p = Ogg.parsePage(page, 0).get
    assert(p.headerType == 2 && p.granule == 1234567890123L)
    assert(p.serial == 0x7abc && p.seq == 9)
    // lacing: 100 | 255,0 | 255,255,7 | 0 | 42
    assert(p.lacing.toSeq == Seq(100, 255, 0, 255, 255, 7, 0, 42))
    assert(p.bodyLen == pk.map(_.length).sum)
    val back = Ogg.packets(page, Seq(p))
    assert(back.size == 5)
    back.zip(pk).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq == b.toSeq, s"packet $i")
    }
    // any flipped byte breaks the page CRC
    for (pos <- Seq(5, 14, 30, page.length - 1)) {
      val mut = page.clone()
      mut(pos) = (mut(pos) ^ 1).toByte
      assert(Ogg.parsePage(mut, 0).isEmpty, s"tamper at $pos")
    }
  }

  test("OpusHead/OpusTags probe + granule duration arithmetic") {
    val rnd = new scala.util.Random(7)
    val audio = Seq.fill(25)(Array.fill(120)(rnd.nextInt(256).toByte))
    val b = Ogg.buildOpus(audio, channels = 2, preSkip = 312,
      inputRate = 44100, serial = 5, vendor = "vendorX",
      tags = Seq("TITLE=x", "ARTIST=y"))
    val info = Ogg.probeOpus(b).get
    assert(info.channels == 2 && info.preSkip == 312)
    assert(info.inputSampleRate == 44100)
    assert(info.nAudioPackets == 25)
    assert(info.vendorLen == "vendorX".getBytes.length)
    // last granule = preSkip + 25·960; duration = 25·960/48 ms
    assert(info.durationMs == 25L * 960 * 1000 / 48000)
    val ps = Ogg.pages(b)
    assert(ps.size == 27) // BOS + tags + one page per audio packet
    assert((ps.head.headerType & 2) != 0, "BOS flag")
    assert((ps.last.headerType & 4) != 0, "EOS flag")
    assert(ps.map(_.seq) == (0 until 27))
  }

  test("audio-packet identity: re-mux-invariant, one-byte-sensitive") {
    val rnd = new scala.util.Random(11)
    val audio = Seq.fill(10)(Array.fill(200)(rnd.nextInt(256).toByte))
    val a = Ogg.buildOpus(audio, serial = 1, vendor = "a",
      tags = Seq("TITLE=one"))
    val b = Ogg.buildOpus(audio, serial = 99, vendor = "bbb",
      tags = Seq("TITLE=two", "ALBUM=z"))
    assert(!java.util.Arrays.equals(a, b))
    assert(Ogg.audioPackets(a).get.map(_.toSeq) ==
      Ogg.audioPackets(b).get.map(_.toSeq))
    val mutated = audio.map(_.clone())
    mutated(4)(9) = (mutated(4)(9) ^ 1).toByte
    val c = Ogg.buildOpus(mutated, serial = 1, vendor = "a",
      tags = Seq("TITLE=one"))
    assert(Ogg.audioPackets(a).get.map(_.toSeq) !=
      Ogg.audioPackets(c).get.map(_.toSeq))
    // a non-Opus Ogg stream (first packet isn't OpusHead) probes None
    val junk = Ogg.writePage(2, 0, 1, 0,
      Seq(Array.fill(30)(0x51.toByte)))
    assert(Ogg.probeOpus(junk).isEmpty)
  }

  test("fuzz: truncations and corruptions never throw or hang") {
    val rnd = new scala.util.Random(13)
    val b = Ogg.buildOpus(
      Seq.fill(8)(Array.fill(300)(rnd.nextInt(256).toByte)))
    for (cut <- 0 to b.length by 17)
      Ogg.probeOpus(java.util.Arrays.copyOf(b, cut))
    for (_ <- 0 until 400) {
      val mut = b.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      Ogg.probeOpus(mut)
      Ogg.audioPackets(mut)
    }
  }
}
