package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** CABAC intra tier: arithmetic-engine invariants, syntax-element
  * round-trips through a real bit stream, and full encode→decode
  * pipeline pins. Shares the H264CodecSpec philosophy: the encoder
  * replicates the decoder's reconstruction, so expected pixels are
  * computed, never assumed.
  */
class H264CabacSpec extends AnyFunSuite {

  // ---- engine-level: encode a known bin sequence, decode it back

  private def roundTripBins(qp: Int, bins: Seq[(String, Int, Int)]): Unit = {
    // bins: (kind, ctxIdx-or-ignored, value); kinds: d=decision, b=bypass
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, new H264Cabac.Contexts(qp))
    bins.foreach {
      case ("d", ctx, v) => e.decision(ctx, v)
      case ("b", _, v) => e.bypass(v)
      case (k, _, _) => fail(s"bad kind $k")
    }
    e.terminate(1)
    val bytes = w.stop()
    val d = new H264Cabac.Decoder(new H264.BitReader(bytes),
      new H264Cabac.Contexts(qp))
    bins.foreach {
      case ("d", ctx, v) => assert(d.decision(ctx) == v, s"decision ctx=$ctx")
      case ("b", _, v) => assert(d.bypass() == v, "bypass")
      case _ => ()
    }
    assert(d.terminate() == 1)
  }

  test("arithmetic engine: decision/bypass round-trip across contexts and QPs") {
    val rnd = new scala.util.Random(7)
    for (qp <- Seq(0, 10, 26, 40, 51)) {
      val bins = (0 until 600).map { _ =>
        if (rnd.nextBoolean()) ("d", rnd.nextInt(277), rnd.nextInt(2))
        else ("b", 0, rnd.nextInt(2))
      }
      roundTripBins(qp, bins)
    }
  }

  test("engine tables: rangeTabLPS shape and transIdx bounds") {
    assert(H264Cabac.rangeTabLps.length == 64)
    assert(H264Cabac.rangeTabLps.forall(_.length == 4))
    // LPS subranges shrink as the state (MPS confidence) grows, per column
    for (q <- 0 until 4; s <- 1 until 63)
      assert(H264Cabac.rangeTabLps(s)(q) <= H264Cabac.rangeTabLps(s - 1)(q),
        s"rangeTabLPS not monotone at state $s col $q")
    assert(H264Cabac.transIdxLps.length == 64)
    assert(H264Cabac.transIdxLps.zipWithIndex.forall { case (t, s) =>
      t >= 0 && t <= 63 && (s == 63 || t <= s) // LPS never increases confidence
    })
    assert(H264Cabac.transIdxMps(62) == 62 && H264Cabac.transIdxMps(63) == 63)
  }

  // ---- syntax-element round-trips over one shared engine stream

  test("syntax elements: mb_type/modes/cbp/qp_delta/residual round-trip") {
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, new H264Cabac.Contexts(26))
    H264Cabac.encodeMbTypeI(e, 0, 0)
    H264Cabac.encodeMbTypeI(e, 1, 3)
    H264Cabac.encodeMbTypeI(e, 2, 24)
    H264Cabac.encodeIntra4x4Mode(e, 2, 2) // prev flag hit
    H264Cabac.encodeIntra4x4Mode(e, 2, 7) // rem path
    H264Cabac.encodeChromaPredMode(e, 0, 1, 0)
    H264Cabac.encodeChromaPredMode(e, 1, 0, 3)
    H264Cabac.encodeCbp(e, -1, 47, 0x2f)
    H264Cabac.encodeQpDelta(e, prevNonZero = false, 0)
    H264Cabac.encodeQpDelta(e, prevNonZero = false, -3)
    H264Cabac.encodeQpDelta(e, prevNonZero = true, 5)
    val coeffs = Array(7, -2, 0, 1, 0, 0, -40, 0, 0, 0, 0, 0, 0, 0, 0, 1)
    H264Cabac.encodeResidual(e, 2, coeffs, 1)
    H264Cabac.encodeResidual(e, 2, new Array[Int](16), 2) // cbf = 0
    H264Cabac.encodeResidual(e, 3, Array(0, -1, 0, 0), 0) // chroma DC
    H264Cabac.encodeResidual(e, 0, Array.tabulate(16)(i => if (i == 0) 300 else 0), 3) // escape level
    e.terminate(1)
    val d = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
      new H264Cabac.Contexts(26))
    assert(H264Cabac.decodeMbTypeI(d, 0) == 0)
    assert(H264Cabac.decodeMbTypeI(d, 1) == 3)
    assert(H264Cabac.decodeMbTypeI(d, 2) == 24)
    assert(H264Cabac.decodeIntra4x4Mode(d, 2) == 2)
    assert(H264Cabac.decodeIntra4x4Mode(d, 2) == 7)
    assert(H264Cabac.decodeChromaPredMode(d, 0, 1) == 0)
    assert(H264Cabac.decodeChromaPredMode(d, 1, 0) == 3)
    assert(H264Cabac.decodeCbp(d, -1, 47) == 0x2f)
    assert(H264Cabac.decodeQpDelta(d, prevNonZero = false) == 0)
    assert(H264Cabac.decodeQpDelta(d, prevNonZero = false) == -3)
    assert(H264Cabac.decodeQpDelta(d, prevNonZero = true) == 5)
    val (r1, t1) = H264Cabac.decodeResidual(d, 2, 16, 1)
    assert(r1.toSeq == coeffs.toSeq && t1 == 5)
    val (r2, t2) = H264Cabac.decodeResidual(d, 2, 16, 2)
    assert(r2.forall(_ == 0) && t2 == 0)
    val (r3, t3) = H264Cabac.decodeResidual(d, 3, 4, 0)
    assert(r3.toSeq == Seq(0, -1, 0, 0) && t3 == 1)
    val (r4, t4) = H264Cabac.decodeResidual(d, 0, 16, 3)
    assert(r4(0) == 300 && t4 == 1)
    assert(d.terminate() == 1)
  }

  test("residual: randomized level/position round-trips per ctxBlockCat") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 250) {
      val (cat, n) = Seq((0, 16), (1, 15), (2, 16), (3, 4), (4, 15))(trial % 5)
      val cbfInc = rnd.nextInt(4)
      val coeffs = Array.fill(n)(
        if (rnd.nextInt(3) == 0) rnd.nextInt(4001) - 2000 else 0)
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w, new H264Cabac.Contexts(26))
      H264Cabac.encodeResidual(e, cat, coeffs, cbfInc)
      e.terminate(1)
      val d = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
        new H264Cabac.Contexts(26))
      val (got, tc) = H264Cabac.decodeResidual(d, cat, n, cbfInc)
      assert(got.toSeq == coeffs.toSeq, s"cat=$cat trial=$trial")
      assert(tc == coeffs.count(_ != 0))
      assert(d.terminate() == 1)
    }
  }

  // ---- full pipeline: encode → Annex-B → decodeIdrFrame → exact pixels

  test("CABAC I_16x16 DC frame: decode reproduces the encoder's computed reconstruction") {
    val mbMeans = Array(
      Array(30, 80, 130, 180), Array(205, 155, 105, 55),
      Array(16, 235, 64, 190))
    val (stream, expected) = H264Encode.encodeCabacI16x16Dc(mbMeans, qp = 26)
    val frame = H264Decode.decodeIdrFrame(stream).getOrElse(fail("CABAC decode failed"))
    assert(frame.width == 64 && frame.height == 48)
    val l = frame.croppedLuma
    for (mbY <- 0 until 3; mbX <- 0 until 4) {
      val got = l((mbY * 16 + 8) * 64 + mbX * 16 + 8) & 0xff
      assert(got == expected(mbY)(mbX),
        s"mb($mbX,$mbY): got $got want ${expected(mbY)(mbX)}")
      // whole MB is constant
      for (dy <- 0 until 16; dx <- 0 until 16)
        assert((l((mbY * 16 + dy) * 64 + mbX * 16 + dx) & 0xff) == expected(mbY)(mbX))
    }
  }

  test("CABAC I_16x16 at every QP: pixel-exact across the quantizer range") {
    for (qp <- Seq(0, 8, 17, 26, 35, 44, 51)) {
      val mbMeans = Array(Array(40, 200), Array(120, 90))
      val (stream, expected) = H264Encode.encodeCabacI16x16Dc(mbMeans, qp)
      val frame = H264Decode.decodeIdrFrame(stream).getOrElse(fail(s"decode failed qp=$qp"))
      val l = frame.croppedLuma
      for (mbY <- 0 until 2; mbX <- 0 until 2)
        assert((l((mbY * 16 + 8) * 32 + mbX * 16 + 8) & 0xff) == expected(mbY)(mbX),
          s"qp=$qp mb($mbX,$mbY)")
    }
  }

  test("CABAC I_4x4 modes frame: decodes and matches the CAVLC twin pixel-for-pixel") {
    // same mode pattern through both entropy tiers must reconstruct
    // identically (entropy is lossless; prediction is shared)
    val modes = Array.tabulate(2, 3) { (mbY, mbX) =>
      Array.tabulate(16) { b =>
        // mode 2 (DC) everywhere is always legal; vary with 0/1 where
        // neighbors exist
        val (x4r, y4r) = H264Decode.blockScan(b)
        val ax4 = mbX * 4 + x4r; val ay4 = mbY * 4 + y4r
        if (ay4 > 0 && ax4 > 0) Seq(0, 1, 2)(b % 3)
        else if (ay4 > 0) 0
        else if (ax4 > 0) 1
        else 2
      }
    }
    val cabac = H264Decode.decodeIdrFrame(H264Encode.encodeCabacI4x4Modes(modes))
      .getOrElse(fail("CABAC I_4x4 decode failed"))
    val cavlc = H264Decode.decodeIdrFrame(H264Encode.encodeI4x4Modes(modes))
      .getOrElse(fail("CAVLC I_4x4 decode failed"))
    assert(cabac.croppedLuma.toSeq == cavlc.croppedLuma.toSeq)
  }

  test("randomized dual-entropy differential: CAVLC and CABAC encodes of the same content decode pixel-equal") {
    // entropy coding is lossless: for ANY content, the two tiers must
    // reconstruct identical pixels (they share prediction/transform).
    // Randomized over patterns, sizes, and QPs.
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 12) {
      val mbW = 1 + rnd.nextInt(4); val mbH = 1 + rnd.nextInt(3)
      val qp = Seq(10, 22, 26, 30, 38)(trial % 5)
      val mbMeans = Array.fill(mbH, mbW)(rnd.nextInt(256))
      val (cavlcStream, expected) = H264Encode.encodeI16x16Dc(mbMeans, qp)
      val (cabacStream, expectedC) = H264Encode.encodeCabacI16x16Dc(mbMeans, qp)
      assert(expected.map(_.toSeq).toSeq == expectedC.map(_.toSeq).toSeq,
        s"trial $trial: encoder recon models diverged")
      val a = H264Decode.decodeIdrFrame(cavlcStream).getOrElse(fail(s"trial $trial cavlc"))
      val b = H264Decode.decodeIdrFrame(cabacStream).getOrElse(fail(s"trial $trial cabac"))
      assert(a.croppedLuma.toSeq == b.croppedLuma.toSeq, s"trial $trial pixels")
    }
  }

  test("full-residual dual-entropy differential: I_4x4 + luma/chroma residuals decode pixel-equal") {
    // Hand-build the SAME one-MB I_4x4 slice (all-DC modes, cbp 47 =
    // full luma + chroma DC+AC) through both entropy coders and assert
    // pixel-identical decode — this walks EVERY CABAC residual
    // category (cat2 luma, cat3 chroma DC, cat4 chroma AC) through the
    // real slice pipeline with the already-pixel-validated CAVLC tier
    // as ground truth.
    val rnd = new scala.util.Random(9)
    for (trial <- 0 until 6) {
      def sparse(n: Int, density: Int, mag: Int): Array[Int] =
        Array.tabulate(n)(_ => if (rnd.nextInt(density) == 0) rnd.nextInt(2 * mag + 1) - mag else 0)
      val luma = Array.fill(16)(sparse(16, 3, 6))
      val cbDc = sparse(4, 2, 4); val crDc = sparse(4, 2, 4)
      val cbAc = Array.fill(4)(sparse(15, 4, 3))
      val crAc = Array.fill(4)(sparse(15, 4, 3))
      val cbp = 47 // luma 15 | chroma 2

      // ---- CAVLC emission (with the decoder's nC bookkeeping)
      val wV = new H264.BitWriter
      H264Encode.sliceHeader(wV, 26)
      wV.ue(0) // mb_type I_4x4
      val modeOf = new Array[Int](16) // absolute per-block, single MB
      var b = 0
      while (b < 16) {
        val (x4, y4) = H264Decode.blockScan(b)
        val mA = if (x4 > 0) modeOf(y4 * 4 + x4 - 1) else -1
        val mB = if (y4 > 0) modeOf((y4 - 1) * 4 + x4) else -1
        val pred = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
        if (pred == 2) wV.flag(true)
        else { wV.flag(false); wV.u(if (2 < pred) 2 else 1, 3) }
        modeOf(y4 * 4 + x4) = 2
        b += 1
      }
      wV.ue(0) // chroma mode DC
      wV.ue(H264Decode.cbpIntraToCodeNum(cbp))
      wV.se(0) // mb_qp_delta
      val tcL = new Array[Int](16) // per-raster-4x4 totalCoeff, MB(0,0)
      b = 0
      while (b < 16) {
        val (x4, y4) = H264Decode.blockScan(b)
        val nA = if (x4 > 0) Some(tcL(y4 * 4 + x4 - 1)) else None
        val nB = if (y4 > 0) Some(tcL((y4 - 1) * 4 + x4)) else None
        val nC = (nA, nB) match {
          case (Some(a), Some(t)) => (a + t + 1) >> 1
          case (Some(a), None) => a
          case (None, Some(t)) => t
          case _ => 0
        }
        tcL(y4 * 4 + x4) = H264Cavlc.encodeResidualBlock(wV, luma(b), nC)
        b += 1
      }
      H264Cavlc.encodeResidualBlock(wV, cbDc, -1)
      H264Cavlc.encodeResidualBlock(wV, crDc, -1)
      val tcC = Array.ofDim[Int](2, 4)
      for (c <- 0 until 2; blk <- 0 until 4) {
        val x2 = blk % 2; val y2 = blk / 2
        val nA = if (x2 > 0) Some(tcC(c)(y2 * 2 + x2 - 1)) else None
        val nB = if (y2 > 0) Some(tcC(c)((y2 - 1) * 2 + x2)) else None
        val nC = (nA, nB) match {
          case (Some(a), Some(t)) => (a + t + 1) >> 1
          case (Some(a), None) => a
          case (None, Some(t)) => t
          case _ => 0
        }
        tcC(c)(y2 * 2 + x2) = H264Cavlc.encodeResidualBlock(
          wV, if (c == 0) cbAc(blk) else crAc(blk), nC)
      }
      val cavlcStream = H264Encode.annexB(Seq(
        (7, 3, H264.writeSps(16, 16)),
        (8, 3, H264.writePps()),
        (5, 3, H264.ebsp(wV.stop()))))

      // ---- CABAC emission (same syntax through the arithmetic coder)
      val wC = new H264.BitWriter
      H264Encode.sliceHeader(wC, 26)
      wC.alignOne()
      val e = new H264Cabac.Encoder(wC, new H264Cabac.Contexts(26))
      val cc = new H264Cabac.IntraCtxTrack(1, 1)
      H264Cabac.encodeMbTypeI(e, cc.mbTypeCond(0, 0), 0)
      cc.markI4(0)
      b = 0
      while (b < 16) {
        val (x4, y4) = H264Decode.blockScan(b)
        val mA = if (x4 > 0) modeOf(y4 * 4 + x4 - 1) else -1
        val mB = if (y4 > 0) modeOf((y4 - 1) * 4 + x4) else -1
        val pred = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
        H264Cabac.encodeIntra4x4Mode(e, pred, 2)
        b += 1
      }
      H264Cabac.encodeChromaPredMode(e,
        cc.chromaModeCondA(0, 0), cc.chromaModeCondB(0, 0), 0)
      cc.chromaNZ(0) = false
      H264Cabac.encodeCbp(e, cc.cbpOf(-1, 0), cc.cbpOf(0, -1), cbp)
      cc.cbp(0) = cbp
      H264Cabac.encodeQpDelta(e, cc.prevQpDeltaNZ, 0)
      cc.prevQpDeltaNZ = false
      b = 0
      while (b < 16) {
        val (x4, y4) = H264Decode.blockScan(b)
        val tc = H264Cabac.encodeResidual(e, 2, luma(b), cc.lumaAcInc(x4, y4))
        cc.cbfLAc(y4 * 4 + x4) = tc > 0
        b += 1
      }
      val t0 = H264Cabac.encodeResidual(e, 3, cbDc, cc.chromaDcInc(0, 0, 0))
      cc.cbfCbDc(0) = t0 > 0
      val t1 = H264Cabac.encodeResidual(e, 3, crDc, cc.chromaDcInc(1, 0, 0))
      cc.cbfCrDc(0) = t1 > 0
      for (c <- 0 until 2; blk <- 0 until 4) {
        val x2 = blk % 2; val y2 = blk / 2
        val tc = H264Cabac.encodeResidual(e, 4,
          if (c == 0) cbAc(blk) else crAc(blk), cc.chromaAcInc(c, x2, y2))
        (if (c == 0) cc.cbfCbAc else cc.cbfCrAc)(y2 * 2 + x2) = tc > 0
      }
      e.terminate(1)
      val cabacStream = H264Encode.annexB(Seq(
        (7, 3, H264.writeSps(16, 16)),
        (8, 3, H264.writePps(cabac = true)),
        (5, 3, H264.ebsp(wC.stop()))))

      val a = H264Decode.decodeIdrFrame(cavlcStream)
        .getOrElse(fail(s"trial $trial: CAVLC decode failed"))
      val c2 = H264Decode.decodeIdrFrame(cabacStream)
        .getOrElse(fail(s"trial $trial: CABAC decode failed"))
      assert(a.luma.toSeq == c2.luma.toSeq, s"trial $trial luma")
      assert(a.cb.toSeq == c2.cb.toSeq, s"trial $trial cb")
      assert(a.cr.toSeq == c2.cr.toSeq, s"trial $trial cr")
    }
  }

  // ---- P slices (r9 inter entropy tier) ----------------------------

  private def cavlcPChain(mbMeans: Array[Array[Int]],
      p: Array[Byte]): Array[Byte] = {
    val (idr, _) = H264Encode.encodeI16x16Dc(mbMeans)
    idr ++ H264Encode.annexB(Seq((1, 3, p)))
  }
  private def cabacPChain(mbMeans: Array[Array[Int]],
      p: Array[Byte]): Array[Byte] = {
    val (idr, _) = H264Encode.encodeCabacI16x16Dc(mbMeans)
    idr ++ H264Encode.annexB(Seq((1, 3, p)))
  }

  test("mvd UEG3: round-trips across magnitudes, components and init idcs") {
    val vals = Seq(0, 1, -1, 2, -3, 7, 8, -8, 9, -9, 10, 16, -17, 40,
      -100, 511, -512, 3000)
    for (idc <- 0 to 2; comp <- 0 to 1) {
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w,
        new H264Cabac.Contexts(26, H264Cabac.ctxInitP(idc)))
      vals.zipWithIndex.foreach { case (v, i) =>
        H264Cabac.encodeMvd(e, comp, i % 3, v)
      }
      e.terminate(1)
      val d = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
        new H264Cabac.Contexts(26, H264Cabac.ctxInitP(idc)))
      vals.zipWithIndex.foreach { case (v, i) =>
        assert(H264Cabac.decodeMvd(d, comp, i % 3) == v,
          s"idc=$idc comp=$comp v=$v")
      }
      assert(d.terminate() == 1)
    }
  }

  test("P mb_type binarization: inter shapes and intra remaps round-trip") {
    for (idc <- 0 to 2) {
      val types = Seq(0, 1, 2, 3, 5, 6, 17, 29)
      val w = new H264.BitWriter
      val e = new H264Cabac.Encoder(w,
        new H264Cabac.Contexts(30, H264Cabac.ctxInitP(idc)))
      types.foreach(t => H264Cabac.encodeMbTypeP(e, t))
      e.terminate(1)
      val d = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
        new H264Cabac.Contexts(30, H264Cabac.ctxInitP(idc)))
      types.foreach(t => assert(H264Cabac.decodeMbTypeP(d) == t, s"idc=$idc t=$t"))
    }
  }

  test("CABAC P_Skip frame reproduces the reference exactly, all init idcs") {
    val means = Array(Array(30, 80, 130), Array(205, 155, 105))
    for (idc <- 0 to 2) {
      val chain = cabacPChain(means, H264Encode.encodeCabacPSkipFrame(3, 2,
        initIdc = idc))
      val fs = H264Decode.decodeAnnexBPictures(chain, maxFrames = 4)
      assert(fs.size == 2, s"idc=$idc: got ${fs.size} pictures")
      assert(fs(0).luma.toSeq == fs(1).luma.toSeq, s"idc=$idc luma")
      assert(fs(0).cb.toSeq == fs(1).cb.toSeq, s"idc=$idc cb")
    }
  }

  test("dual-entropy P differential: CAVLC and CABAC P_L0_16x16 motion decodes pixel-equal") {
    val means = Array(Array(30, 80, 130), Array(205, 155, 105),
      Array(16, 235, 64))
    // mixed integer/half/quarter-pel vectors, including |mvd| > 9 (the
    // EG3 escape) and a negative large component
    val mvs = Array(
      Array((0, 0), (4, -8), (7, 3)),
      Array((-2, 5), (13, -1), (40, 22)),
      Array((-45, -30), (1, 1), (6, -54)))
    val cavlcFs = H264Decode.decodeAnnexBPictures(
      cavlcPChain(means, H264Encode.encodeP16x16(mvs)), maxFrames = 4)
    assert(cavlcFs.size == 2)
    for (idc <- 0 to 2) {
      val fs = H264Decode.decodeAnnexBPictures(
        cabacPChain(means, H264Encode.encodeCabacP16x16(mvs, initIdc = idc)),
        maxFrames = 4)
      assert(fs.size == 2, s"idc=$idc")
      assert(fs(1).luma.toSeq == cavlcFs(1).luma.toSeq, s"idc=$idc luma")
      assert(fs(1).cb.toSeq == cavlcFs(1).cb.toSeq, s"idc=$idc cb")
      assert(fs(1).cr.toSeq == cavlcFs(1).cr.toSeq, s"idc=$idc cr")
    }
  }

  test("CABAC P corruption: bit flips and truncations reject or yield structurally valid pictures") {
    val means = Array(Array(30, 200), Array(100, 60))
    val mvs = Array(Array((4, -8), (13, 3)), Array((-2, 5), (0, 0)))
    val chain = cabacPChain(means, H264Encode.encodeCabacP16x16(mvs, initIdc = 1))
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 200) {
      val m = chain.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      H264Decode.decodeAnnexBPictures(m, maxFrames = 4).foreach { f =>
        assert(f.width > 0 && f.height > 0)
        assert(f.croppedLuma.length == f.width * f.height)
      }
    }
    for (len <- 0 until chain.length by 7)
      H264Decode.decodeAnnexBPictures(
        java.util.Arrays.copyOf(chain, len), maxFrames = 4)
        .foreach(f => assert(f.width > 0))
  }

  test("CABAC stream corruption: decode returns None or a structurally valid frame, never throws") {
    val (stream, _) = H264Encode.encodeCabacI16x16Dc(
      Array(Array(30, 200), Array(100, 60)), qp = 26)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val m = stream.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      H264Decode.decodeIdrFrame(m).foreach { f =>
        assert(f.width > 0 && f.height > 0)
        assert(f.croppedLuma.length == f.width * f.height)
      }
    }
    for (len <- 0 until math.min(stream.length, 80)) {
      H264Decode.decodeIdrFrame(java.util.Arrays.copyOf(stream, len)) match {
        case Some(f) => assert(f.width > 0)
        case None => ()
      }
    }
  }
}
