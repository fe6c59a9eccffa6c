package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** G.711 µ-law/A-law + AU/AIFF/AIFC/WAV containers (r12 audio decode
  * rung). Uniquely on the codec ladder, this rung has EXTERNAL
  * conformance vectors in the container: the CPython test-suite
  * "pluck" corpus — externally-produced µ-law AU, µ-law/A-law AIFC
  * and PCM WAV/AIFF/AU renditions of one recording, whose expected
  * decoded frames are published in CPython's test_sunau/test_aifc.
  * The spec pins (1) hard-coded per-code expansion/compression
  * values, (2) the decode∘encode identities, (3) byte-exact decode of
  * the external vectors against the published frames, (4) cross-
  * container sample identity of the three external PCM renditions,
  * (5) agreement with the JDK's independent javax.sound ULAW
  * converter, (6) container writer round-trips and fuzz.
  */
class G711AudioSpec extends AnyFunSuite {

  // ------------------------------------------------------------ code tables

  test("µ-law expansion matches hard-coded G.711 values") {
    val pins = Seq(0x00 -> -32124, 0x7f -> 0, 0x80 -> 32124, 0xff -> 0,
      0x55 -> -716, 0xaa -> 5372, 0x10 -> -15996, 0xe7 -> 260)
    pins.foreach { case (c, v) => assert(G711Audio.ulawToLinear(c) == v, s"code $c") }
  }

  test("A-law expansion matches hard-coded G.711 values") {
    val pins = Seq(0x00 -> -5504, 0x55 -> -8, 0xd5 -> 8, 0x7f -> -848,
      0xff -> 848, 0x2a -> -32256, 0x80 -> 5504)
    pins.foreach { case (c, v) => assert(G711Audio.alawToLinear(c) == v, s"code $c") }
  }

  test("compression matches hard-coded values at boundaries and extremes") {
    val uPins = Seq(0 -> 255, 1 -> 255, -1 -> 126, 100 -> 242, -100 -> 114,
      8031 -> 160, 32767 -> 128, -32768 -> 0, 558 -> 218, -22 -> 124)
    uPins.foreach { case (v, c) => assert(G711Audio.linearToUlaw(v) == c, s"u $v") }
    val aPins = Seq(0 -> 213, 1 -> 213, -1 -> 85, 100 -> 211, -100 -> 83,
      32767 -> 170, -32768 -> 42, 558 -> 244)
    aPins.foreach { case (v, c) => assert(G711Audio.linearToAlaw(v) == c, s"a $v") }
  }

  test("decode∘encode identities over all 256 codes") {
    // µ-law: exact except code 0x7F (negative zero re-encodes as 0xFF)
    for (c <- 0 until 256 if c != 0x7f)
      assert(G711Audio.linearToUlaw(G711Audio.ulawToLinear(c)) == c, s"u $c")
    assert(G711Audio.linearToUlaw(G711Audio.ulawToLinear(0x7f)) == 0xff)
    // A-law: exact on every code
    for (c <- 0 until 256)
      assert(G711Audio.linearToAlaw(G711Audio.alawToLinear(c)) == c, s"a $c")
  }

  test("compression is monotone non-decreasing in decoded magnitude") {
    // encode→decode must be idempotent quantization: decode(encode(x))
    // is within one segment step of x, and re-encoding is stable
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt(65536) - 32768
      val du = G711Audio.ulawToLinear(G711Audio.linearToUlaw(x))
      assert(math.abs(du - x) <= 1024, s"u err at $x")
      assert(G711Audio.linearToUlaw(du) == G711Audio.linearToUlaw(x) ||
        x < -32635, s"u stability at $x")
      val da = G711Audio.alawToLinear(G711Audio.linearToAlaw(x))
      assert(math.abs(da - x) <= 1024, s"a err at $x")
    }
  }

  // --------------------------------------------------------- external vectors

  private def vector(name: String): Option[Array[Byte]] = {
    val roots = Seq(
      "/root/.pyenv/versions/3.12.1/lib/python3.12/test/audiodata",
      "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata",
      "/root/.pyenv/versions/3.10.13/lib/python3.10/test/audiodata",
      "/root/.pyenv/versions/3.8.18/lib/python3.8/test/audiodata")
    roots.iterator.map(r => java.nio.file.Paths.get(r, name))
      .find(java.nio.file.Files.exists(_))
      .map(java.nio.file.Files.readAllBytes)
  }

  /** First 48 frames (96 bytes, big-endian int16) CPython's test_sunau
    * publishes as the expected µ-law decode of pluck-ulaw.au.
    */
  private val sunauUlawFrames: Array[Short] = hexFrames(
    """022CFFE8 497C00F4 307C04DC 8284083C CB84069C 497C03DC BE8401AC 036CFE74
       B684FA24 B684F344 2A7CEC04 19FCE704 EE04E504 C584E204 0E3CE104 EF04DF84
       557CE204 FB24E804 12FCEF04 D784F744 9684FB64 F5C4FC24 083CFBA4 DF84FB24
       11FCFA24 3E7CFB64 BA84FCB4 657CFF5C CF84041C 417C09BC C1840EBC 517C12FC
       EF0416FC 828415FC 7D7C13FC 828412FC 497C0EBC 517C0DBC F0040F3C CD840FFC
       E5040CBC 617C0A3C 08BC0A3C 2C7C0B3C 517C0E3C 8A8410FC B6840EBC 457C0A3C""")

  /** test_aifc's expected A-law decode of pluck-alaw.aifc (48 frames). */
  private val aifcAlawFrames: Array[Short] = hexFrames(
    """0230FFE8 4A0000F8 310004E0 82000840 CB0006A0 4A0003F0 BE0001A8 0370FE78
       BA00FA20 B600F340 2900EB80 1A80E680 ED80E480 C700E280 0E40E080 EF80E080
       5600E280 FB20E880 1380EF80 D900F740 9600FB60 F5C0FC10 0840FBA0 DF00FB20
       1180FA20 3F00FB60 BE00FCB0 6600FF58 CF000420 42000940 C1000EC0 52001280
       EE801780 82001680 7E001480 82001280 4A000EC0 52000DC0 EF800F40 CF000FC0
       E4800CC0 62000A40 08C00A40 2B000B40 52000E40 8A001180 B6000EC0 46000A40""")

  private def hexFrames(s: String): Array[Short] = {
    val hex = s.filterNot(_.isWhitespace)
    Array.tabulate(hex.length / 4)(i =>
      Integer.parseInt(hex.substring(4 * i, 4 * i + 4), 16).toShort)
  }

  test("EXTERNAL vector: pluck-ulaw.au header + decode match CPython's published frames") {
    val b = vector("pluck-ulaw.au")
    assume(b.isDefined, "external vector absent in this image")
    val (info, off, size) = G711Audio.parseAu(b.get).get
    assert(info == G711Audio.AudioInfo("ulaw", 11025, 2, 3307))
    assert(off == 24 && size == 6614)
    val dec = G711Audio.decodeAu(b.get).get
    assert(dec.samples.length == 6614)
    assert(dec.samples.take(96).toSeq == sunauUlawFrames.toSeq,
      "decoded frames must match test_sunau's expectations byte-exactly")
  }

  test("EXTERNAL vector: pluck-alaw.aifc header + decode match CPython's published frames") {
    val b = vector("pluck-alaw.aifc")
    assume(b.isDefined, "external vector absent in this image")
    val (info, _, size) = G711Audio.parseAiff(b.get).get
    assert(info == G711Audio.AudioInfo("alaw", 11025, 2, 3307))
    assert(size == 6614)
    val dec = G711Audio.decodeAiff(b.get).get
    assert(dec.samples.take(96).toSeq == aifcAlawFrames.toSeq,
      "decoded frames must match test_aifc's expectations byte-exactly")
  }

  test("EXTERNAL vectors: the three PCM16 renditions agree across containers") {
    val (wav, aiff, au) =
      (vector("pluck-pcm16.wav"), vector("pluck-pcm16.aiff"),
        vector("pluck-pcm16.au"))
    assume(wav.isDefined && aiff.isDefined && au.isDefined,
      "external vectors absent in this image")
    val dw = G711Audio.decodeWav(wav.get).get
    val df = G711Audio.decodeAiff(aiff.get).get
    val da = G711Audio.decodeAu(au.get).get
    assert(dw.info.sampleRate == 11025 && dw.info.channels == 2)
    assert(df.info == G711Audio.AudioInfo("pcm16", 11025, 2, 3307))
    assert(da.info == G711Audio.AudioInfo("pcm16", 11025, 2, 3307))
    // one recording, three containers, three endiannesses/headers.
    // The files are SEPARATE conversions from a higher-precision
    // master (they differ by up to ~11 LSBs among themselves), so the
    // pin is tight agreement through three independent parse paths —
    // any header/endianness/offset slip would blow the bound by
    // orders of magnitude.
    assert(dw.samples.length == 6614 && df.samples.length == 6614 &&
      da.samples.length == 6614)
    def maxDiff(a: Array[Short], b: Array[Short]): Int =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    assert(maxDiff(dw.samples, df.samples) <= 16, "WAV vs AIFF")
    assert(maxDiff(dw.samples, da.samples) <= 16, "WAV vs AU")
    assert(maxDiff(df.samples, da.samples) <= 16, "AIFF vs AU")
  }

  test("EXTERNAL vectors: µ-law decode error vs the PCM16 master is segment-bounded") {
    val (ul, pcm) = (vector("pluck-ulaw.au"), vector("pluck-pcm16.au"))
    assume(ul.isDefined && pcm.isDefined, "external vectors absent")
    val du = G711Audio.decodeAu(ul.get).get.samples
    val dp = G711Audio.decodeAu(pcm.get).get.samples
    assert(du.length == dp.length)
    val maxErr = du.zip(dp).map { case (a, b) => math.abs(a - b) }.max
    // the top µ-law segment steps by 1024; a correct decode can never
    // sit farther than one step from the companded master
    assert(maxErr <= 1024, s"max err $maxErr")
  }

  test("INDEPENDENT implementation: JDK javax.sound ULAW conversion agrees sample-exactly") {
    val b = vector("pluck-ulaw.au")
    assume(b.isDefined, "external vector absent in this image")
    val ours = G711Audio.decodeAu(b.get).get.samples
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b.get))
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      ais.getFormat.getSampleRate, 16, ais.getFormat.getChannels,
      2 * ais.getFormat.getChannels, ais.getFormat.getSampleRate, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
    val data = pcm.readAllBytes()
    assert(data.length == 2 * ours.length)
    var i = 0
    while (i < ours.length) {
      val jdk = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
      assert(jdk == ours(i), s"sample $i")
      i += 1
    }
  }

  // ------------------------------------------------------- writers / parsers

  test("80-bit extended sample-rate field round-trips common rates") {
    for (rate <- Seq(8000, 11025, 16000, 22050, 44100, 48000, 96000, 192000))
      assert(G711Audio.readExtended(G711Audio.writeExtended(rate), 0) == rate)
  }

  test("AU / AIFF / AIFC / WAV writers round-trip through the parsers") {
    val rnd = new scala.util.Random(11)
    val mono = Array.fill(500)(rnd.nextInt(256).toByte)
    // µ-law AU
    val au = G711Audio.writeAu("ulaw", 8000, 1, mono)
    val dau = G711Audio.decodeAu(au).get
    assert(dau.info == G711Audio.AudioInfo("ulaw", 8000, 1, 500))
    assert(dau.samples.toSeq ==
      mono.map(c => G711Audio.ulawToLinear(c & 0xff).toShort).toSeq)
    // A-law AIFC
    val aifc = G711Audio.writeAiff("alaw", 11025, 1, 500, mono)
    val daifc = G711Audio.decodeAiff(aifc).get
    assert(daifc.info == G711Audio.AudioInfo("alaw", 11025, 1, 500))
    assert(daifc.samples.toSeq ==
      mono.map(c => G711Audio.alawToLinear(c & 0xff).toShort).toSeq)
    // PCM16 everywhere: same samples through AU (BE), AIFF (BE), WAV (LE)
    val samples = Array.fill(300)((rnd.nextInt(65536) - 32768).toShort)
    val be = samples.flatMap(s => Array(((s >> 8) & 0xff).toByte, (s & 0xff).toByte))
    val le = samples.flatMap(s => Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    assert(G711Audio.decodeAu(G711Audio.writeAu("pcm16", 16000, 1, be))
      .get.samples.toSeq == samples.toSeq)
    assert(G711Audio.decodeAiff(G711Audio.writeAiff("pcm16", 16000, 1, 300, be))
      .get.samples.toSeq == samples.toSeq)
    assert(G711Audio.decodeWav(G711Audio.writeWav("pcm16", 16000, 1, le))
      .get.samples.toSeq == samples.toSeq)
    // decodeAny dispatches all three by magic
    assert(G711Audio.decodeAny(au).get.info.format == "ulaw")
    assert(G711Audio.decodeAny(aifc).get.info.format == "alaw")
    assert(G711Audio.decodeAny(
      G711Audio.writeWav("ulaw", 8000, 1, mono)).get.info.format == "ulaw")
  }

  test("malformed inputs never throw: fuzz over truncations and random bytes") {
    val rnd = new scala.util.Random(17)
    val au = G711Audio.writeAu("ulaw", 8000, 2,
      Array.fill(400)(rnd.nextInt(256).toByte))
    val aifc = G711Audio.writeAiff("ulaw", 8000, 1, 200,
      Array.fill(200)(rnd.nextInt(256).toByte))
    val wav = G711Audio.writeWav("alaw", 8000, 1,
      Array.fill(200)(rnd.nextInt(256).toByte))
    for (src <- Seq(au, aifc, wav); cut <- 0 to src.length by 7)
      G711Audio.decodeAny(java.util.Arrays.copyOf(src, cut)) // must not throw
    for (_ <- 0 until 500) {
      val junk = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      G711Audio.decodeAny(junk)
    }
    for (_ <- 0 until 300) { // structured header, corrupted tail
      val mut = au.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      G711Audio.decodeAny(mut)
    }
  }

  test("negative declared sizes survive as undecodable data, not exceptions") {
    val rnd = new scala.util.Random(23)
    val body = Array.fill(64)(rnd.nextInt(256).toByte)
    // AU: any negative be32 data-size (not just 0xffffffff) = unknown →
    // rest of file; 0x80000001 used to reach Array.tabulate(negative)
    val au = G711Audio.writeAu("ulaw", 8000, 1, body)
    val bb = java.nio.ByteBuffer.wrap(au)
    bb.putInt(8, 0x80000001)
    val dec = G711Audio.decodeAu(au)
    assert(dec.isDefined && dec.get.samples.length == body.length)
    // AIFF: SSND alignment offset exceeding sz-8 → negative ssndSize → None
    val aiff = G711Audio.writeAiff("ulaw", 8000, 1, body.length, body)
    val ssnd = {
      var i = 12; var at = -1
      while (at < 0 && i + 8 <= aiff.length) {
        if (new String(aiff, i, 4, "US-ASCII") == "SSND") at = i
        else i += 8 + ((aiff(i + 4) & 0xff) << 24 | (aiff(i + 5) & 0xff) << 16 |
          (aiff(i + 6) & 0xff) << 8 | (aiff(i + 7) & 0xff))
      }
      at
    }
    assert(ssnd > 0)
    java.nio.ByteBuffer.wrap(aiff).putInt(ssnd + 8, body.length + 1000)
    assert(G711Audio.decodeAiff(aiff).isEmpty) // None, no throw
  }
}
