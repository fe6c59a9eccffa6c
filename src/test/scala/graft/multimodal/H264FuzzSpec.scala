package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Mutation-fuzz suite over the CAVLC intra decoder (r7 verdict item 5's
  * fallback — no reference encoder exists in this container, so external
  * interop stays a documented caveat; what CAN be enforced is that a
  * corrupted real-world bitstream never crashes, never allocates
  * unboundedly, and decodes deterministically):
  *
  *  - every SINGLE-BIT flip of a self-encoded coded stream (headers,
  *    entropy-coded residuals, prediction modes — all positions) either
  *    decodes to a structurally valid frame or is rejected as None;
  *  - every TRUNCATION prefix likewise;
  *  - seeded random MULTI-BYTE corruption likewise;
  *  - mutated decode is DETERMINISTIC (two runs agree exactly), so a
  *    task retry over a corrupt video shard reproduces the same answer —
  *    the property the dedup pipeline's content signatures rely on.
  *
  * "Structurally valid" = dims match the (possibly mutated) SPS within
  * the decoder's 8192² level bound and all three planes have exactly
  * their declared sizes. Pixel VALUES under mutation are unspecified
  * (a flipped residual bit legitimately decodes to different pixels);
  * H264CodecSpec pins values on clean streams.
  */
class H264FuzzSpec extends AnyFunSuite {

  private def codedStream(): Array[Byte] = {
    // 4x3 macroblocks of I_16x16 DC + a second picture's worth of coded
    // content via I_4x4 modes appended as extra bits is NOT valid; keep
    // one clean coded stream with non-trivial residuals
    val mbMeans = Array.tabulate(3, 4)((r, c) => 40 + 23 * r + 31 * c)
    H264Encode.encodeI16x16Dc(mbMeans, qp = 24)._1
  }

  private def structurallyValid(f: H264Decode.Frame): Boolean = {
    val lumaOk = f.luma.length == f.mbW * 16 * f.mbH * 16
    val chromaOk = f.cb.length == f.mbW * 8 * f.mbH * 8 &&
      f.cr.length == f.mbW * 8 * f.mbH * 8
    val dimsOk = f.width > 0 && f.height > 0 &&
      f.width <= f.mbW * 16 && f.height <= f.mbH * 16
    lumaOk && chromaOk && dimsOk
  }

  test("the clean stream decodes (fuzz baseline sanity)") {
    val f = H264Decode.decodeIdrFrame(codedStream())
    assert(f.nonEmpty && structurallyValid(f.get))
  }

  test("every single-bit flip decodes to a valid frame or a clean None") {
    val base = codedStream()
    var decoded = 0; var rejected = 0
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      H264Decode.decodeIdrFrame(m) match {
        case Some(f) =>
          assert(structurallyValid(f), s"invalid frame at bit $bit")
          decoded += 1
        case None => rejected += 1
      }
    }
    // both outcomes must actually occur: all-None would mean the decoder
    // rejects everything (vacuous pass), all-Some that framing errors
    // are silently absorbed
    assert(decoded > 0 && rejected > 0, s"decoded=$decoded rejected=$rejected")
  }

  test("every truncation prefix decodes to a valid frame or a clean None") {
    val base = codedStream()
    for (len <- 0 until base.length) {
      H264Decode.decodeIdrFrame(java.util.Arrays.copyOf(base, len)) match {
        case Some(f) => assert(structurallyValid(f), s"invalid frame at len $len")
        case None    =>
      }
    }
  }

  test("CABAC: every single-bit flip and truncation decodes valid-or-None (r8 tier)") {
    // the same exhaustive discipline over the arithmetic-coded twin —
    // a desynchronized CABAC engine must surface as require-rejection
    // or a structurally valid (wrong-pixel) frame, never a crash/hang
    val base = H264Encode.encodeCabacI16x16Dc(
      Array.tabulate(3, 4)((r, c) => 40 + 23 * r + 31 * c), qp = 24)._1
    var decoded = 0; var rejected = 0
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      H264Decode.decodeIdrFrame(m) match {
        case Some(f) => assert(structurallyValid(f), s"invalid frame at bit $bit"); decoded += 1
        case None => rejected += 1
      }
    }
    assert(decoded > 0 && rejected > 0, s"decoded=$decoded rejected=$rejected")
    for (len <- 0 until base.length)
      H264Decode.decodeIdrFrame(java.util.Arrays.copyOf(base, len))
        .foreach(f => assert(structurallyValid(f), s"invalid frame at len $len"))
  }

  test("seeded multi-byte corruption: no crash, no unbounded allocation") {
    val base = codedStream()
    val rnd = new scala.util.Random(0x48264)
    for (_ <- 0 until 1000) {
      val m = base.clone()
      val nMut = 1 + rnd.nextInt(8)
      for (_ <- 0 until nMut)
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264Decode.decodeIdrFrame(m).foreach(f => assert(structurallyValid(f)))
    }
  }

  test("mutated decode is deterministic (retry-stable content signatures)") {
    val base = codedStream()
    val rnd = new scala.util.Random(0x264)
    for (_ <- 0 until 200) {
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val a = H264Decode.decodeIdrFrame(m)
      val b = H264Decode.decodeIdrFrame(m)
      (a, b) match {
        case (Some(x), Some(y)) =>
          assert(x.width == y.width && x.height == y.height &&
            java.util.Arrays.equals(x.luma, y.luma) &&
            java.util.Arrays.equals(x.cb, y.cb) &&
            java.util.Arrays.equals(x.cr, y.cr))
        case (None, None) =>
        case _ => fail("nondeterministic accept/reject")
      }
    }
  }

  test("P-stream mutation fuzz: picture sequences decode or reject, never crash") {
    val mvs = Array.tabulate(2, 3)((r, c) => ((c - 1) * 3, r * 5))
    val base = H264Encode.encodeI16x16Dc(
      Array.tabulate(2, 3)((r, c) => 50 + 30 * r + 20 * c))._1 ++
      H264Encode.annexB(Seq(
        (1, 3, H264Encode.encodeP16x16(mvs)),
        (1, 3, H264Encode.encodePSkipFrame(3, 2))))
    val clean = H264Decode.decodeAnnexBPictures(base, 8)
    assert(clean.size == 3)
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      val fs = H264Decode.decodeAnnexBPictures(m, 8) // must not throw
      fs.foreach(f => assert(structurallyValid(f), s"invalid frame at bit $bit"))
    }
    val rnd = new scala.util.Random(0x9264)
    for (_ <- 0 until 500) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264Decode.decodeAnnexBPictures(m, 8).foreach(f => assert(structurallyValid(f)))
    }
  }

  test("B-stream mutation fuzz: IPB sequences decode or reject, never crash (r9 tier)") {
    val mbs: Array[Array[(Int, (Int, Int), (Int, Int))]] =
      Array.tabulate(2, 3)((r, c) => ((r * 3 + c) % 3, ((c - 1) * 3, r * 4), ((1 - c) * 3, -r * 4)))
    val base = H264Encode.encodeI16x16Dc(
      Array.tabulate(2, 3)((r, c) => 50 + 30 * r + 20 * c))._1 ++
      H264Encode.annexB(Seq(
        (1, 3, H264Encode.encodeP16x16(Array.fill(2, 3)((6, 2)), poc = 4)),
        (1, 0, H264Encode.encodeB16x16(mbs, poc = 2))))
    val clean = H264Decode.decodeAnnexBPictures(base, 8)
    assert(clean.size == 3)
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      val fs = H264Decode.decodeAnnexBPictures(m, 8) // must not throw
      fs.foreach(f => assert(structurallyValid(f), s"invalid frame at bit $bit"))
    }
    val rnd = new scala.util.Random(0x9151)
    for (_ <- 0 until 500) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264Decode.decodeAnnexBPictures(m, 8).foreach(f => assert(structurallyValid(f)))
    }
  }

  test("B_8x8 mutation fuzz: sub-partitioned IPB sequences decode or reject, never crash (r10 tier)") {
    val subs: Array[Array[Seq[(Int, Seq[((Int, Int), (Int, Int))])]]] =
      Array.tabulate(2, 3) { (r, c) =>
        (0 until 4).map { si =>
          val t = 1 + (((r * 3 + c) * 4 + si) % 12)
          val (n, _, _, _) = H264Decode.bSubMbInfo(t)
          (t, (0 until n).map(j => ((4 * (j % 2), 4 * (si % 2)), (-4, 0))))
        }
      }
    val base = H264Encode.encodeI16x16Dc(
      Array.tabulate(2, 3)((r, c) => 50 + 30 * r + 20 * c))._1 ++
      H264Encode.annexB(Seq(
        (1, 3, H264Encode.encodeP16x16(Array.fill(2, 3)((6, 2)), poc = 4)),
        (1, 0, H264Encode.encodeB8x8(subs, poc = 2))))
    val clean = H264Decode.decodeAnnexBPictures(base, 8)
    assert(clean.size == 3)
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      val fs = H264Decode.decodeAnnexBPictures(m, 8) // must not throw
      fs.foreach(f => assert(structurallyValid(f), s"invalid frame at bit $bit"))
    }
    val rnd = new scala.util.Random(0x9153)
    for (_ <- 0 until 500) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264Decode.decodeAnnexBPictures(m, 8).foreach(f => assert(structurallyValid(f)))
    }
  }

  test("multi-ref mutation fuzz: ref_idx/DPB-3 sequences decode or reject, never crash (r11 tier)") {
    // the q156 GOP shape: IDR + P1 + multi-ref P2 (checkerboard
    // ref_idx) + multi-ref B (ref_idx_l0 alternating) — every flipped
    // bit can corrupt te(v) ref indices, the active-count override, or
    // the mvds they gate
    val p2Mbs = Array.tabulate(2, 3)((r, c) =>
      (if ((r + c) % 2 == 0) 0 else 1, (4 * ((c % 2) * 2 - 1), 0)))
    val bMbs: Array[Array[(Int, (Int, (Int, Int)), (Int, (Int, Int)))]] =
      Array.tabulate(2, 3) { (r, c) =>
        ((r * 3 + c) % 3, ((r + c) % 2, (4, 0)), (0, (0, -4)))
      }
    val base = H264Encode.encodeI16x16Dc(
      Array.tabulate(2, 3)((r, c) => 50 + 30 * r + 20 * c),
      numRefFrames = 3)._1 ++
      H264Encode.annexB(Seq(
        (1, 3, H264Encode.encodeP16x16(Array.fill(2, 3)((6, 2)), poc = 2)),
        (1, 3, H264Encode.encodeP16x16MultiRef(p2Mbs, 2, poc = 8)),
        (1, 0, H264Encode.encodeB16x16MultiRef(bMbs, 2, 1, poc = 4))))
    val clean = H264Decode.decodeAnnexBPictures(base, 8)
    assert(clean.size == 4)
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      val fs = H264Decode.decodeAnnexBPictures(m, 8) // must not throw
      fs.foreach(f => assert(structurallyValid(f), s"invalid frame at bit $bit"))
    }
    val rnd = new scala.util.Random(0x9156)
    for (_ <- 0 until 500) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264Decode.decodeAnnexBPictures(m, 8).foreach(f => assert(structurallyValid(f)))
    }
  }

  test("deblocking mutation fuzz: filtered IP sequences decode or reject, never crash (r11 tier)") {
    // flips can corrupt the disable idc, the alpha/beta offsets, the
    // per-MB qp deltas the filter reads, or any bS input
    val base = H264Encode.encodeI16x16Dc(
      Array.tabulate(2, 3)((r, c) => 80 + 2 * c + 8 * (r % 2)),
      qp = 16, deblock = true)._1 ++
      H264Encode.annexB(Seq((1, 3, H264Encode.encodeP16x16(
        Array.tabulate(2, 3)((r, c) => (4 * ((r + c) % 2), 0)),
        qp = 16, poc = 2, deblock = true))))
    val clean = H264Decode.decodeAnnexBPictures(base, 8)
    assert(clean.size == 2)
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      val fs = H264Decode.decodeAnnexBPictures(m, 8) // must not throw
      fs.foreach(f => assert(structurallyValid(f), s"invalid frame at bit $bit"))
    }
    val rnd = new scala.util.Random(0x9157)
    for (_ <- 0 until 500) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264Decode.decodeAnnexBPictures(m, 8).foreach(f => assert(structurallyValid(f)))
    }
  }

  test("weighted-prediction mutation fuzz: fade streams decode or reject, never crash (r10 tier)") {
    val weights = H264Encode.PredWeights(6, 5, Seq(
      H264Encode.ListWeights(44, 3, 28, -4, 36, 2)))
    val base = H264Encode.encodeI16x16Dc(
      Array.tabulate(2, 3)((r, c) => 50 + 30 * r + 20 * c),
      weightedPred = true)._1 ++
      H264Encode.annexB(Seq(
        (1, 3, H264Encode.encodeP16x16(Array.fill(2, 3)((0, 0)), poc = 2,
          weights = Some(weights))),
        (1, 3, H264Encode.encodeP16x16(Array.fill(2, 3)((0, 0)), poc = 4,
          weights = Some(weights)))))
    val clean = H264Decode.decodeAnnexBPictures(base, 8)
    assert(clean.size == 3)
    for (bit <- 0 until base.length * 8) {
      val m = base.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      val fs = H264Decode.decodeAnnexBPictures(m, 8) // must not throw
      fs.foreach(f => assert(structurallyValid(f), s"invalid frame at bit $bit"))
    }
    val rnd = new scala.util.Random(0x9154)
    for (_ <- 0 until 500) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264Decode.decodeAnnexBPictures(m, 8).foreach(f => assert(structurallyValid(f)))
    }
  }

  test("HEVC probe fuzz: SPS bit flips parse or reject, container mutations never crash (r10 tier)") {
    val sps = H265.writeSps(100, 58)
    for (bit <- 0 until sps.length * 8) {
      val m = sps.clone()
      m(bit / 8) = (m(bit / 8) ^ (1 << (7 - bit % 8))).toByte
      H265.parseSps(m) match { // must not throw
        case Some(i) => assert(i.width > 0 && i.height > 0, s"bit $bit")
        case None => // clean rejection
      }
    }
    def sample(t: Int, body: Array[Byte]): Array[Byte] = {
      val nal = H265.nalHeader(t) ++ body
      Array[Byte](0, 0, 0, nal.length.toByte) ++ nal
    }
    val mp4 = VideoContainers.buildMp4Hevc(
      Seq(sample(19, Array[Byte](1, 2, 3, 4)), sample(1, Array[Byte](7))),
      Seq(1), H265.writeVps(), sps, H265.writePps(), 100, 58)
    val rnd = new scala.util.Random(0x9155)
    for (_ <- 0 until 500) {
      val m = mp4.clone()
      for (_ <- 0 to rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      VideoContainers.probeHevcMp4(m) // must not throw
      VideoContainers.mp4HevcKeyframes(m).foreach(k => assert(k.length >= 0))
    }
  }

  test("multi-IDR stream returns the FIRST complete picture (r7 advice pin)") {
    val s1 = H264Encode.encodeI16x16Dc(Array.tabulate(2, 2)((r, c) => 60 + 40 * (r + c)))._1
    val s2 = H264Encode.encodeI16x16Dc(Array.tabulate(2, 2)((r, c) => 200 - 40 * (r + c)))._1
    val first = H264Decode.decodeIdrFrame(s1).get
    // concatenated Annex-B: SPS/PPS/IDR + SPS/PPS/IDR of a second picture
    val both = s1 ++ s2
    val got = H264Decode.decodeIdrFrame(both).get
    assert(java.util.Arrays.equals(got.luma, first.luma))
  }
}
