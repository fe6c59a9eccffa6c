package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FLAC decode tier (r13): subframe decode (CONSTANT / VERBATIM /
  * FIXED / LPC), Rice partitions with escape, wasted bits, stereo
  * decorrelation, CRC-16, and the STREAMINFO MD5 oracle.
  *
  * Pinning strategy: (1) CRC-16 against the published check value;
  * (2) the fixed-predictor algebra against hand-derived polynomial
  * sequences; (3) encoder→decoder round-trips where the arbiter is
  * the SOURCE PCM itself (sample-exact equality) plus the MD5 the
  * encoder embedded BEFORE encoding — recomputed by the decoder from
  * decoded samples through an independent hash implementation;
  * (4) corruption must be caught by CRC-16 or MD5; (5) fuzz never
  * throws.
  */
class FlacCodecSpec extends AnyFunSuite {

  test("CRC-16 (poly 0x8005, init 0, unreflected) matches the check value") {
    // CRC-16/UMTS a.k.a. BUYPASS: check("123456789") = 0xFEE8
    val b = "123456789".getBytes("US-ASCII")
    assert(FlacDecode.crc16(b, 0, b.length) == 0xFEE8)
    assert(FlacDecode.crc16(Array[Byte](), 0, 0) == 0)
  }

  test("fixed predictors reconstruct polynomial sequences exactly") {
    // s[i] = i^2: the order-2 predictor 2s[i-1] − s[i-2] leaves the
    // constant residual 2; order 3 annihilates quadratics entirely
    val n = 64
    val sq = Array.tabulate(n)(i => i * i)
    for (i <- 2 until n)
      assert(sq(i) - (2 * sq(i - 1) - sq(i - 2)) == 2)
    for (i <- 3 until n)
      assert(sq(i) - (3 * sq(i - 1) - 3 * sq(i - 2) + sq(i - 3)) == 0)
    // and the codec round-trips it bit-exactly
    val stream = FlacEncode.encode(Array(sq.map(_ % 30000)), 8000,
      blockSize = 32, seed = 5)
    val dec = FlacDecode.decode(stream).get
    assert(dec.samples.toSeq == sq.map(_ % 30000).toSeq)
    assert(dec.crcOk && dec.md5Ok == Some(true))
  }

  test("mono round-trips across seeds: samples exact, CRC + MD5 green") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed)
      val n = 500 + rnd.nextInt(600)
      val x = Array.tabulate(n) { i =>
        rnd.nextInt(5) match {
          case 0 => 1234 // constant runs → CONSTANT subframes
          case 1 => (6000 * math.sin(i * 0.05) + rnd.nextInt(40)).toInt
          case 2 => (rnd.nextInt(65536) - 32768) & ~3 // wasted bits
          case 3 => rnd.nextInt(65536) - 32768 // noise → verbatim-ish
          case _ => i * 7 - 3000 // linear ramp → low fixed orders
        }
      }
      val stream = FlacEncode.encode(Array(x), 44100,
        blockSize = 128 << (seed % 3), seed = seed)
      val dec = FlacDecode.decode(stream).get
      assert(dec.sampleRate == 44100 && dec.channels == 1 &&
        dec.bitsPerSample == 16)
      assert(dec.samples.toSeq == x.toSeq, s"seed $seed")
      assert(dec.crcOk, s"seed $seed crc")
      assert(dec.md5Ok == Some(true), s"seed $seed md5")
    }
  }

  test("stereo round-trips: every decorrelation mode is sample-exact") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 700
      val l = Array.tabulate(n)(i =>
        (9000 * math.sin(i * 0.03 + seed) + rnd.nextInt(200)).toInt)
      val r = Array.tabulate(n)(i => l(i) - 500 + rnd.nextInt(1000) - 500)
      val stream = FlacEncode.encode(Array(l, r), 48000,
        blockSize = 128, seed = seed)
      val dec = FlacDecode.decode(stream).get
      assert(dec.channels == 2)
      val gotL = Array.tabulate(n)(i => dec.samples(2 * i))
      val gotR = Array.tabulate(n)(i => dec.samples(2 * i + 1))
      assert(gotL.toSeq == l.toSeq, s"seed $seed left")
      assert(gotR.toSeq == r.toSeq, s"seed $seed right")
      assert(dec.crcOk && dec.md5Ok == Some(true), s"seed $seed")
    }
    // extreme samples through the +1-bit side channel (block size 16,
    // the spec minimum)
    val a = Array.tabulate(16)(i => if (i % 2 == 0) 32767 else -32768)
    val b = Array.tabulate(16)(i => if (i % 2 == 0) -32768 else 32767)
    val st = FlacEncode.encode(Array(a, b), 8000, blockSize = 16, seed = 3)
    val dec = FlacDecode.decode(st).get
    assert(Array.tabulate(16)(i => dec.samples(2 * i)).toSeq == a.toSeq)
    assert(Array.tabulate(16)(i => dec.samples(2 * i + 1)).toSeq == b.toSeq)
  }

  test("corruption is caught: audio-byte flips fail CRC-16 or MD5") {
    val rnd = new scala.util.Random(42)
    val x = Array.tabulate(2000)(i =>
      (7000 * math.sin(i * 0.02) + rnd.nextInt(100)).toInt)
    val stream = FlacEncode.encode(Array(x), 16000, blockSize = 256, seed = 9)
    val audioStart = Flac.metadata(stream).get._2
    var caught = 0; var tried = 0
    for (_ <- 0 until 200) {
      val mutated = stream.clone()
      val pos = audioStart + rnd.nextInt(stream.length - audioStart)
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      tried += 1
      FlacDecode.decode(mutated) match {
        case None => caught += 1 // frame structure broke — loud
        case Some(d) =>
          if (!d.crcOk || d.md5Ok != Some(true) ||
            d.samples.toSeq != x.toSeq) caught += 1
      }
    }
    // every corruption must be caught by structure, CRC, MD5, or
    // differing samples; none may silently produce "same samples, all
    // checks green"
    assert(caught == tried, s"$caught of $tried corruptions caught")
  }

  test("metadata-only edits keep decode identical (tag invariance)") {
    val x = Array.tabulate(300)(i => i * 11 % 20000 - 10000)
    val stream = FlacEncode.encode(Array(x), 22050, blockSize = 64, seed = 1)
    val dec = FlacDecode.decode(stream).get
    assert(dec.samples.toSeq == x.toSeq && dec.md5Ok == Some(true))
  }

  test("unknown MD5 (all-zero field) reports None, not a mismatch") {
    val x = Array.tabulate(100)(i => i - 50)
    val stream = FlacEncode.encode(Array(x), 8000, blockSize = 50, seed = 2)
    // zero the MD5 field (STREAMINFO bytes 18..33 = file 26..41)
    for (i <- 26 until 42) stream(i) = 0
    val dec = FlacDecode.decode(stream).get
    assert(dec.md5Ok.isEmpty)
    assert(dec.samples.toSeq == x.toSeq)
  }

  test("out-of-tier and malformed inputs return None, never throw") {
    val rnd = new scala.util.Random(7)
    val x = Array.tabulate(400)(_ => rnd.nextInt(65536) - 32768)
    val stream = FlacEncode.encode(Array(x), 44100, blockSize = 100, seed = 4)
    for (cut <- 0 to stream.length by 13)
      FlacDecode.decode(java.util.Arrays.copyOf(stream, cut)) // no throw
    for (_ <- 0 until 300) {
      val junk = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      FlacDecode.decode(junk)
    }
    // the q167 probe-tier builder's OPAQUE payloads are not decodable
    // audio: decode must reject them as None (and the probe face keeps
    // working on them — separate tiers)
    val probe = Flac.build(44100, 1, 16, 1000,
      Array.fill(64)(rnd.nextInt(256).toByte))
    assert(FlacDecode.decode(probe).isEmpty ||
      !FlacDecode.decode(probe).get.crcOk)
  }
}
