package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** r12 compressed-audio probe rung: MP3 framing. Header fields,
  * frame-length arithmetic and duration math are pinned against
  * INDEPENDENT in-test computations and HAND-built header bytes;
  * ID3v2 (syncsafe size, footer flag), ID3v1, CRC and padding
  * handling each get explicit cases; the payload identity used by
  * q162 is pinned tag-invariant and content-sensitive.
  */
class Mp3Spec extends AnyFunSuite {

  test("hand-built header bytes parse to the spec fields") {
    // 0xFF 0xFB 0x90 0x44: MPEG-1 Layer III, no CRC, 128 kbps, 44100,
    // no padding, joint stereo → frameLen 144·128000/44100 = 417
    val h = Mp3.parseFrameHeader(Array(0xff, 0xfb, 0x90, 0x44).map(_.toByte), 0)
    assert(h.nonEmpty)
    assert(h.get.bitrateKbps == 128 && h.get.sampleRate == 44100 &&
      !h.get.crc && !h.get.padding && h.get.channels == 2 &&
      h.get.frameLen == 417 && h.get.samples == 1152)
    // padding bit set → +1
    val hp = Mp3.parseFrameHeader(Array(0xff, 0xfb, 0x92, 0x44).map(_.toByte), 0)
    assert(hp.get.padding && hp.get.frameLen == 418)
    // protection bit 0 → CRC present
    val hc = Mp3.parseFrameHeader(Array(0xff, 0xfa, 0x90, 0x44).map(_.toByte), 0)
    assert(hc.get.crc)
    // mono: mode 3
    val hm = Mp3.parseFrameHeader(Array(0xff, 0xfb, 0x90, 0xc4).map(_.toByte), 0)
    assert(hm.get.channels == 1)
    // MPEG-2 Layer III at index 2 (16 kbps), 22050 Hz: 72·16000/22050 = 52
    val h2 = Mp3.parseFrameHeader(Array(0xff, 0xf3, 0x20, 0x44).map(_.toByte), 0)
    assert(h2.nonEmpty && h2.get.sampleRate == 22050 &&
      h2.get.samples == 576 && h2.get.frameLen == 52)
    // garbage, wrong sync, reserved bitrate/samplerate all reject
    assert(Mp3.parseFrameHeader(Array(0xfe, 0xfb, 0x90, 0x44).map(_.toByte), 0).isEmpty)
    assert(Mp3.parseFrameHeader(Array(0xff, 0xfb, 0xf0, 0x44).map(_.toByte), 0).isEmpty)
    assert(Mp3.parseFrameHeader(Array(0xff, 0xfb, 0x9c, 0x44).map(_.toByte), 0).isEmpty)
  }

  test("build → frames/probe round-trip with independent duration math") {
    val rnd = new scala.util.Random(3)
    for (brIdx <- Seq(5, 9, 14); srIdx <- 0 to 2) {
      val br = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320, 0)(brIdx)
      val sr = Array(44100, 48000, 32000)(srIdx)
      val fl = 144 * (br * 1000) / sr
      val n = 25
      val payloads = Seq.fill(n)(Array.fill(fl - 4)(rnd.nextInt(256).toByte))
      val bytes = Mp3.build(payloads, brIdx, srIdx)
      val fs = Mp3.frames(bytes)
      assert(fs.size == n, s"br $br sr $sr")
      assert(fs.forall(_._2.bitrateKbps == br))
      val info = Mp3.probe(bytes).get
      assert(info.sampleRate == sr && info.nFrames == n && !info.vbr)
      assert(info.durationMs == n.toLong * 1152 * 1000 / sr) // independent
      val back = Mp3.framePayloads(bytes)
      assert(back.size == n && back.zip(payloads).forall {
        case (a, b) => a.toSeq == b.toSeq
      })
    }
  }

  test("ID3v2 skipping: syncsafe size, footer flag; ID3v1 tail stops the walk") {
    val payloads = Seq.fill(6)(Array.fill(413)(7.toByte))
    val plain = Mp3.build(payloads)
    // syncsafe: a tag of 200 bytes encodes as (0,0,1,72)
    val tagged = Mp3.build(payloads, id3v2 = Some(new Array[Byte](200)),
      id3v1 = true)
    assert(Mp3.id3v2Size(tagged) == 210)
    assert(Mp3.frames(tagged).size == 6)
    assert(Mp3.framePayloads(tagged).map(_.toSeq) ==
      Mp3.framePayloads(plain).map(_.toSeq), "payload identity is tag-invariant")
    // footer flag adds 10
    val f = tagged.clone(); f(5) = 0x10.toByte
    assert(Mp3.id3v2Size(f) == 220)
    // truncated final frame: dropped, earlier frames kept
    val cut = java.util.Arrays.copyOfRange(plain, 0, plain.length - 200)
    assert(Mp3.frames(cut).size == 5)
    // pure garbage probes None
    assert(Mp3.probe(Array.fill(500)(0x33.toByte)).isEmpty)
  }

  test("EXTERNAL conformance vector: gsutil's test.mp3 probes exactly") {
    // The first externally-produced codec material found in this
    // container across 12 rounds of sweeps (r12): an MPEG-2 Layer III
    // stream with an ID3v2.4 tag and per-frame PADDING variation —
    // produced by a real encoder, not this repo. Expectations below
    // were derived by an INDEPENDENT Python frame walk of the file.
    val path = java.nio.file.Paths.get(
      "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(java.nio.file.Files.exists(path), "external vector absent in this image")
    val b = java.nio.file.Files.readAllBytes(path)
    assert(Mp3.id3v2Size(b) == 32)
    val fs = Mp3.frames(b)
    assert(fs.size == 45)
    val h0 = fs.head._2
    assert(h0.version == 2 && h0.sampleRate == 22050 &&
      h0.bitrateKbps == 64 && h0.samples == 576 && !h0.crc)
    // real-encoder padding variation: both 208- and 209-byte frames
    assert(fs.map(_._2.frameLen).distinct.sorted == Seq(208, 209))
    val info = Mp3.probe(b).get
    assert(info.durationMs == 45L * 576 * 1000 / 22050 && !info.vbr)
    // payloads exclude headers and padding bytes: every frame 204 bytes
    assert(Mp3.framePayloads(b).forall(_.length == 204))
  }

  test("EXTERNAL vector: side info + bit reservoir of all 45 frames audit clean") {
    // r13 deep probe: the LSF side-info layout and the §2.4.2.1 bit
    // reservoir are pure bit-layout facts — no Huffman table needed —
    // so every frame of the external encoder's output validates them.
    // Wrong field widths or a wrong reservoir model would desync
    // main_data_begin/part2_3_length within a frame or two, not pass
    // 45 in a row with every constrained field in range.
    val path = java.nio.file.Paths.get(
      "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(java.nio.file.Files.exists(path), "external vector absent in this image")
    val b = java.nio.file.Files.readAllBytes(path)
    val steps = Mp3.reservoirAudit(b)
    assert(steps.size == 45)
    // every frame: back-pointer resolves, declared bits fit, and no
    // forbidden values (Huffman tables 4/14, block_type 0 under window
    // switching, big_values > 288) anywhere
    steps.zipWithIndex.foreach { case (s, i) =>
      assert(s.feasible, s"frame $i reservoir: $s")
      assert(s.sideValid, s"frame $i side-info validity: $s")
    }
    // LSF mono at 64 kbps/22.05 kHz: 9 side-info bytes, 204-byte
    // payloads → ~195 main-data bytes per frame (padding varies)
    assert(steps.forall(s => s.mainDataBytes == 195 || s.mainDataBytes == 196))
    // the file is a SILENT encode: part2_3_length = 0 on every frame,
    // so the reservoir only ACCUMULATES — and the encoder's
    // back-pointers trace that accumulation exactly: frame 0 begins
    // at 0, frame 1's main_data_begin is precisely frame 0's 195
    // main-data bytes, and from frame 2 on the pointer saturates at
    // the LSF 8-bit cap (255). A mis-transcribed side-info layout
    // (wrong field width, wrong offset) could not reproduce this
    // exact externally-authored sequence.
    assert(steps.forall(_.part23Bits == 0))
    assert(steps(0).mainDataBegin == 0)
    assert(steps(1).mainDataBegin == steps(0).mainDataBytes) // = 195
    assert(steps.drop(2).forall(_.mainDataBegin == 255))
    // constant global_gain 210, long-block mono throughout — the
    // shape a real encoder gives digital silence
    val gis = Mp3.frames(b).flatMap { case (off, h) =>
      Mp3.parseSideInfo(b, off, h).get.granules.flatten
    }
    assert(gis.forall(g => g.globalGain == 210 && !g.windowSwitching))
  }

  test("side info: MPEG-1 stereo layout round-trips through the bit parse") {
    // hand-assemble one MPEG-1 stereo side-info block (32 bytes) and
    // check the parse recovers every field — layout pinned bit by bit
    val w = new H264.BitWriter
    w.u(257, 9) // main_data_begin
    w.u(0, 3)   // private_bits
    w.u(9, 4); w.u(6, 4) // scfsi
    // gr0 ch0: long blocks, tables 7/13/24, regions 5/2
    w.u(1234, 12); w.u(123, 9); w.u(200, 8); w.u(11, 4); w.u(0, 1)
    w.u(7, 5); w.u(13, 5); w.u(24, 5); w.u(5, 4); w.u(2, 3)
    w.u(1, 1); w.u(0, 1); w.u(1, 1)
    // gr0 ch1: window switching, block_type 2, mixed, tables 1/2,
    // subblock gains 3/0/7
    w.u(777, 12); w.u(288, 9); w.u(150, 8); w.u(3, 4); w.u(1, 1)
    w.u(2, 2); w.u(1, 1); w.u(1, 5); w.u(2, 5); w.u(3, 3); w.u(0, 3); w.u(7, 3)
    w.u(0, 1); w.u(1, 1); w.u(0, 1)
    // gr1 ch0 / ch1: minimal long-block entries
    for (_ <- 0 until 2) {
      w.u(0, 12); w.u(0, 9); w.u(0, 8); w.u(0, 4); w.u(0, 1)
      w.u(0, 5); w.u(0, 5); w.u(0, 5); w.u(0, 4); w.u(0, 3)
      w.u(0, 1); w.u(0, 1); w.u(0, 1)
    }
    // stop() appends the RBSP stop bit past the 256 data bits — the
    // side-info block is the first 32 bytes
    val side = w.stop().take(32)
    // wrap in a stereo MPEG-1 frame: header + side + zero main data
    val frameLen = 144 * 128000 / 44100 // brIdx 9, srIdx 0 → 417
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte
    frame(2) = (9 << 4).toByte; frame(3) = 0x44.toByte
    System.arraycopy(side, 0, frame, 4, 32)
    val h = Mp3.parseFrameHeader(frame, 0).get
    assert(h.channels == 2 && Mp3.sideInfoBytes(h) == 32)
    val si = Mp3.parseSideInfo(frame, 0, h).get
    assert(si.mainDataBegin == 257)
    assert(si.scfsi == Seq(9, 6))
    val g00 = si.granules(0)(0)
    assert(g00.part23Length == 1234 && g00.bigValues == 123 &&
      g00.globalGain == 200 && g00.scalefacCompress == 11 &&
      !g00.windowSwitching && g00.tableSelect == Seq(7, 13, 24) &&
      g00.region0 == 5 && g00.region1 == 2 && g00.preflag == 1 &&
      g00.scalefacScale == 0 && g00.count1Table == 1 && g00.valid)
    val g01 = si.granules(0)(1)
    assert(g01.windowSwitching && g01.blockType == 2 && g01.mixedBlock &&
      g01.tableSelect == Seq(1, 2) && g01.subblockGain == Seq(3, 0, 7) &&
      g01.bigValues == 288 && g01.valid)
    // validity rejections: table 4 / table 14 / block_type 0 under
    // window switching / big_values overflow
    assert(!g00.copy(tableSelect = Seq(7, 4, 24)).valid)
    assert(!g01.copy(tableSelect = Seq(14, 2)).valid)
    assert(!g01.copy(blockType = 0).valid)
    assert(!g00.copy(bigValues = 289).valid)
  }

  test("payload identity: sensitive to one byte, invariant to metadata") {
    val rnd = new scala.util.Random(9)
    val payloads = Seq.fill(8)(Array.fill(413)(rnd.nextInt(256).toByte))
    val a = Mp3.build(payloads)
    val changed = payloads.map(_.clone())
    changed(4)(100) = (changed(4)(100) ^ 1).toByte
    val b = Mp3.build(changed)
    def sig(x: Array[Byte]): Seq[Seq[Byte]] = Mp3.framePayloads(x).map(_.toSeq)
    assert(sig(a) != sig(b))
    val c = Mp3.build(payloads, id3v2 = Some(Array.fill(77)(1.toByte)))
    assert(sig(a) == sig(c))
    assert(a.toSeq != c.toSeq)
  }
}
