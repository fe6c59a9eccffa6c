package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** HEVC SAO (r12): §7.3.8.3 syntax + §8.7.3 band/edge filtering.
  * Pinning: hand-computed band-index and edge-category expectations
  * on synthetic planes (incl. the normative edgeIdx remap and the
  * pre-SAO-classification property), CABAC syntax round-trips across
  * types/merges/offset extremes, whole-picture encoder↔decoder
  * round-trips with SAO alone and stacked on deblocking, a
  * SAO-is-load-bearing divergence pin, and mutation fuzz.
  */
class H265SaoSpec extends AnyFunSuite {

  private def params(tpe: Int, offs: Seq[Int], band: Int = 0,
      eo: Int = 0): H265Sao.Params = {
    val p = new H265Sao.Params
    for (c <- 0 until 3) {
      p.typeIdx(c) = tpe
      offs.zipWithIndex.foreach { case (o, i) => p.offsets(c)(i) = o }
      p.bandPos(c) = band
      p.eoClass(c) = eo
    }
    p
  }

  test("band offset: 32 8-value bands, position wrap, sign application") {
    // one 16x16 CTB; samples laid out so each row sits in one band
    val w = 16; val h = 16
    val plane = Array.tabulate[Byte](w * h)(i => (8 * (i / w) + 3).toByte)
    // bands 30,31,0,1 via wrap from position 30; offsets +5 −6 +7 −3
    val p = params(1, Seq(5, -6, 7, -3), band = 30)
    H265Sao.applyPlane(plane, plane.clone(), w, h, Array(p), 0, 1, 1, 4, 0,
      (_, _) => false)
    for (y <- 0 until 16; x <- 0 until 16) {
      val orig = 8 * y + 3
      val bandIdx = orig >> 3 // == y
      val expect = bandIdx match {
        case 30 => orig + 5
        case 31 => orig - 6
        case 0 => orig + 7
        case 1 => orig - 3
        case _ => orig
      }
      assert((plane(y * w + x) & 0xff) == expect, s"row $y")
    }
  }

  test("edge offset: per-class categories and the edgeIdx remap") {
    // class 0 (horizontal neighbors) on a 16-wide plane: construct a
    // row ... 50 40 50 ... (valley at x), ... 50 60 50 ... (peak),
    // 50 50 50 (flat), and half-edges
    val w = 16; val h = 16
    val base = Array.fill[Byte](w * h)(50.toByte)
    base(3 * w + 5) = 40 // valley → edgeIdx raw 0 → remap 1 → +off(0)
    base(5 * w + 5) = 60 // peak   → raw 4 → 4 → +off(3)
    base(7 * w + 5) = 45; base(7 * w + 6) = 45 // x=6: left equal, right
    // greater → raw 2 + 0 + (−1) = 1 → remap 2 → +off(1)
    val p = params(2, Seq(3, 2, -2, -4), eo = 0)
    val plane = base.clone()
    H265Sao.applyPlane(plane, base.clone(), w, h, Array(p), 0, 1, 1, 4, 0,
      (_, _) => false)
    assert((plane(3 * w + 5) & 0xff) == 43, "valley +3")
    assert((plane(5 * w + 5) & 0xff) == 56, "peak -4")
    assert((plane(7 * w + 6) & 0xff) == 47, "half-valley +2")
    // the valley's NEIGHBOR x=4: c=50, a=50 (x=3), b=40 (x=5): raw
    // 2+0+1 = 3 → off(2) = −2
    assert((plane(3 * w + 4) & 0xff) == 48, "half-peak -2")
    // flat samples (category 0 after remap) untouched
    assert((plane(9 * w + 5) & 0xff) == 50, "flat unchanged")
    // picture-border samples skip (neighbor outside)
    assert((plane(3 * w + 0) & 0xff) == 50 &&
      (plane(3 * w + 15) & 0xff) == 50, "border skipped")
  }

  test("classification reads PRE-SAO samples (no cascade)") {
    // a descending staircase 52 50 48 with offsets that, if applied
    // cascading, would flip later categories: src snapshot prevents it
    val w = 16; val h = 4
    val base = Array.tabulate[Byte](w * h)(i => (60 - 2 * (i % w)).toByte)
    val p = params(2, Seq(7, 7, -7, -7), eo = 0)
    val plane = base.clone()
    H265Sao.applyPlane(plane, base.clone(), w, h, Array(p), 0, 1, 1, 4, 0,
      (_, _) => false)
    // strictly monotone row: every interior sample has one smaller and
    // one larger neighbor → raw 2 + 1 − 1 = 2 → remap 0 → NO change
    for (x <- 1 until w - 1)
      assert((plane(x) & 0xff) == (base(x) & 0xff), s"x=$x")
  }

  test("sao() syntax round-trips: types, merges, chroma inheritance, extremes") {
    val ctbW = 3; val n = 6
    val w = new H264.BitWriter
    val e = new H264Cabac.Encoder(w, H265Cabac.contexts(30))
    val encParams = new Array[H265Sao.Params](n)
    val p0 = params(1, Seq(7, -7, 0, 1), band = 31)
    val p2 = params(2, Seq(0, 7, -1, 0), eo = 3)
    val p3 = params(0, Seq(0, 0, 0, 0))
    // distinct Cr offsets/band from Cb (type/eo inherited)
    p2.offsets(2) = Array(1, 2, -3, -4)
    p0.bandPos(2) = 7
    H265Sao.encode(e, encParams, 0, ctbW, saoLuma = true, saoChroma = true, p0)
    H265Sao.encode(e, encParams, 1, ctbW, saoLuma = true, saoChroma = true,
      p0, mergeLeft = true)
    H265Sao.encode(e, encParams, 2, ctbW, saoLuma = true, saoChroma = true, p2)
    H265Sao.encode(e, encParams, 3, ctbW, saoLuma = true, saoChroma = true,
      p0, mergeUp = true)
    H265Sao.encode(e, encParams, 4, ctbW, saoLuma = true, saoChroma = true, p3)
    H265Sao.encode(e, encParams, 5, ctbW, saoLuma = true, saoChroma = true,
      p2, mergeUp = true)
    e.terminate(1)
    val d = new H264Cabac.Decoder(new H264.BitReader(w.stop()),
      H265Cabac.contexts(30))
    val decParams = new Array[H265Sao.Params](n)
    for (ctb <- 0 until n)
      H265Sao.decode(d, decParams, ctb, ctbW, saoLuma = true,
        saoChroma = true)
    for (ctb <- 0 until n; c <- 0 until 3) {
      assert(decParams(ctb).typeIdx(c) == encParams(ctb).typeIdx(c),
        s"ctb $ctb c $c type")
      assert(decParams(ctb).offsets(c).toSeq == encParams(ctb).offsets(c).toSeq,
        s"ctb $ctb c $c offsets")
      assert(decParams(ctb).bandPos(c) == encParams(ctb).bandPos(c) ||
        decParams(ctb).typeIdx(c) != 1, s"ctb $ctb c $c band")
      assert(decParams(ctb).eoClass(c) == encParams(ctb).eoClass(c) ||
        decParams(ctb).typeIdx(c) != 2, s"ctb $ctb c $c eo")
    }
  }

  private def textured(w: Int, h: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (Array.tabulate(w * h)(i =>
       (40 + ((i % w) * 3 + (i / w) * 2 + rnd.nextInt(37)) % 180).toByte),
     Array.tabulate((w / 2) * (h / 2))(i =>
       (90 + (i % (w / 2)) + rnd.nextInt(11)).toByte),
     Array.tabulate((w / 2) * (h / 2))(_ => (120 + rnd.nextInt(19)).toByte))
  }

  private def rndParams(rnd: scala.util.Random): H265Sao.Params = {
    val p = new H265Sao.Params
    for (c <- 0 until 3) {
      val t = if (c == 2) p.typeIdx(1) else rnd.nextInt(3)
      p.typeIdx(c) = t
      if (t == 1) {
        for (k <- 0 until 4) p.offsets(c)(k) = rnd.nextInt(15) - 7
        p.bandPos(c) = rnd.nextInt(32)
      } else if (t == 2) {
        p.offsets(c)(0) = rnd.nextInt(8); p.offsets(c)(1) = rnd.nextInt(8)
        p.offsets(c)(2) = -rnd.nextInt(8); p.offsets(c)(3) = -rnd.nextInt(8)
        p.eoClass(c) = if (c == 2) p.eoClass(1) else rnd.nextInt(4)
      }
    }
    p
  }

  test("whole-picture round-trips: SAO alone, SAO over deblocking, merges") {
    import H265Encode.{CuLeaf, CuSplit, CuTree}
    val w = 64; val h = 64
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val (sy, scb, scr) = textured(w, h, seed)
      val layout: Seq[CuTree] = Seq.fill(4)(
        if (rnd.nextInt(2) == 0) CuLeaf(Seq(rnd.nextInt(35)))
        else CuSplit(CuLeaf(Seq(rnd.nextInt(35))), CuLeaf(Seq(1)),
          CuLeaf(Seq(26)), CuLeaf(Seq(rnd.nextInt(35)))))
      val shared = rndParams(rnd)
      val sao = Seq(rndParams(rnd), shared, rndParams(rnd), shared)
      val deblock = seed % 2 == 0
      val (stream, recon) = H265Encode.encodeIntraPicture2(sy, scb, scr,
        w, h, layout, qp = 26 + seed, deblock = deblock, sao = sao)
      val frames = H265Decode.decodeAnnexBPictures(stream, 2)
      assert(frames.size == 1, s"seed $seed decode")
      assert(frames.head.luma.toSeq == recon.luma.toSeq, s"seed $seed luma")
      assert(frames.head.cb.toSeq == recon.cb.toSeq, s"seed $seed cb")
      assert(frames.head.cr.toSeq == recon.cr.toSeq, s"seed $seed cr")
    }
  }

  test("SAO is load-bearing: the same coded content decodes differently with it") {
    import H265Encode.CuLeaf
    val w = 64; val h = 64
    val (sy, scb, scr) = textured(w, h, 9)
    val layout = Seq.fill(4)(CuLeaf(Seq(26)): H265Encode.CuTree)
    val p = params(2, Seq(4, 2, -2, -4), eo = 0)
    val (withSao, reconSao) = H265Encode.encodeIntraPicture2(sy, scb, scr,
      w, h, layout, qp = 28, sao = Seq(p, p, p, p))
    val (without, reconPlain) = H265Encode.encodeIntraPicture2(sy, scb, scr,
      w, h, layout, qp = 28)
    // identical prediction/residual path → pre-SAO recon identical;
    // the offsets must move real samples
    assert(reconSao.luma.toSeq != reconPlain.luma.toSeq)
    val a = H265Decode.decodeAnnexBPictures(withSao, 2).head
    val b = H265Decode.decodeAnnexBPictures(without, 2).head
    assert(a.luma.toSeq == reconSao.luma.toSeq)
    assert(b.luma.toSeq == reconPlain.luma.toSeq)
    assert(a.luma.toSeq != b.luma.toSeq)
  }

  test("mutation fuzz over SAO streams never hangs or escapes") {
    import H265Encode.CuLeaf
    val (sy, scb, scr) = textured(64, 64, 17)
    val p = params(1, Seq(7, -7, 3, -3), band = 12)
    val (stream, _) = H265Encode.encodeIntraPicture2(sy, scb, scr, 64, 64,
      Seq.fill(4)(CuLeaf(Seq(10))), qp = 30, sao = Seq(p, p, p, p))
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 250) {
      val mut = stream.clone()
      mut(rnd.nextInt(mut.length)) = (mut(rnd.nextInt(mut.length)) ^
        (1 << rnd.nextInt(8))).toByte
      val out = H265Decode.decodeAnnexBPictures(mut, 2)
      assert(out.size <= 2)
    }
  }
}
