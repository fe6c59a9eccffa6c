package graft.multimodal


import H265Encode.{BiLeaf, CuLeaf, CuSplit, CuTree, GopPic, InterLeaf, Recon}
import H265Inter.{PredWeights, Wp}

/** OWN-ENCODER vectors for the libde265 external-conformance rung
  * (r15): r14's x265 vectors pin our DECODER against an independently-
  * authored encoder; these pin our ENCODER against an independently-
  * authored decoder (the system libde265.so.0 — see
  * tools/de265_vector.c). A conformant encoder is DEFINED by "the
  * normative decode of its stream equals its own reconstruction", so
  * De265VectorSpec asserts, per vector, byte-equality between the
  * encoder's recon frames and libde265's decoded planes (committed as
  * fixtures/de265/<name>_de265.yuv by tools/regen_de265_vectors.sh).
  *
  * Everything is DETERMINISTIC (fixed seeds), so the spec regenerates
  * each stream and checks it byte-identical to the committed .265 —
  * the provenance pin that the committed external decode really is of
  * THIS encoder's output.
  *
  * The five vectors cover the encoder tiers: intra (+deblock+SAO), a
  * P GOP (merge + explicit MVs), a reordered B GOP (bi prediction),
  * weighted prediction (fade), and multi-reference P lists. The
  * remux triples (flavors of the P vector via
  * [[Multimodal.remuxHevcAnnexB]]) externally witness q175's
  * decode-invariance claim: libde265 must decode each remux to the
  * same pixels as the original.
  */
object De265Vectors {

  final case class Vec(name: String, w: Int, h: Int,
      stream: Array[Byte], recons: Seq[Recon])

  private[multimodal] def planes(w: Int, h: Int, rnd: scala.util.Random,
      shift: Int, dx: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val sy = Array.tabulate(w * h) { i =>
      val x = (i % w - shift * dx + 4 * w) % w
      (30 + ((x * 7 + (i / w) * 3) % 185) + rnd.nextInt(23)).toByte
    }
    val scb = Array.tabulate((w / 2) * (h / 2))(i =>
      (96 + ((i % (w / 2)) + shift) % 37).toByte)
    val scr = Array.tabulate((w / 2) * (h / 2))(i =>
      (118 + (i / (w / 2) + 2 * shift) % 11).toByte)
    (sy, scb, scr)
  }

  private def intraSao: Vec = {
    val w = 64; val h = 64
    val rnd = new scala.util.Random(4101)
    val sy = Array.tabulate(w * h)(i =>
      (36 + (((i % w) * 5 + (i / w) * 3 + rnd.nextInt(41)) % 190)).toByte)
    val scb = Array.tabulate((w / 2) * (h / 2))(i =>
      (92 + (i % (w / 2)) / 2 + rnd.nextInt(13)).toByte)
    val scr = Array.tabulate((w / 2) * (h / 2))(_ =>
      (116 + rnd.nextInt(21)).toByte)
    def node(): CuTree =
      if (rnd.nextInt(3) == 0) CuSplit(CuLeaf(Seq(rnd.nextInt(35))),
        CuLeaf(Seq(rnd.nextInt(35))), CuLeaf(Seq(1)),
        CuLeaf(Seq(rnd.nextInt(35)), splitTu = true))
      else CuLeaf(Seq(rnd.nextInt(35)))
    val layout = Seq(node(), node(), node(), node())
    def saoParam(): H265Sao.Params = {
      val p = new H265Sao.Params
      var c = 0
      while (c < 3) {
        val t = if (c == 2) p.typeIdx(1) else rnd.nextInt(3)
        p.typeIdx(c) = t
        if (t == 1) {
          var k = 0
          while (k < 4) { p.offsets(c)(k) = rnd.nextInt(15) - 7; k += 1 }
          p.bandPos(c) = rnd.nextInt(32)
        } else if (t == 2) {
          p.offsets(c)(0) = 1 + rnd.nextInt(7)
          p.offsets(c)(1) = rnd.nextInt(8)
          p.offsets(c)(2) = -rnd.nextInt(8)
          p.offsets(c)(3) = -(1 + rnd.nextInt(7))
          p.eoClass(c) = if (c == 2) p.eoClass(1) else rnd.nextInt(4)
        }
        c += 1
      }
      p
    }
    val shared = saoParam()
    shared.typeIdx(0) = 2
    shared.offsets(0) = Array(3, 1, -1, -3)
    shared.eoClass(0) = 0
    val sao = Seq(saoParam(), shared, saoParam(), shared)
    val (stream, recon) = H265Encode.encodeIntraPicture2(sy, scb, scr,
      w, h, layout, qp = 30, deblock = true, sao = sao)
    Vec("own_intra_sao_64x64", w, h, stream, Seq(recon))
  }

  private def pGop: Vec = {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(4102)
    val dx = 2
    val iLayout: Seq[CuTree] = Seq.fill(8)(CuLeaf(Seq(rnd.nextInt(35))))
    def pLayout(): Seq[CuTree] = Seq.fill(8) {
      if (rnd.nextInt(4) == 0) CuLeaf(Seq(rnd.nextInt(35)))
      else InterLeaf(4 * dx, 0): CuTree
    }
    val frames = (0 to 2).map(k => planes(w, h, new scala.util.Random(77), k, dx))
    val (stream, recons) = H265Encode.encodeGop(frames, w, h, iLayout,
      Seq(pLayout(), pLayout()), qp = 27)
    Vec("own_p_128x64", w, h, stream, recons)
  }

  private def bGop: Vec = {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(4103)
    val dx = 1
    val iLayout: Seq[CuTree] = Seq.fill(8)(CuLeaf(Seq(rnd.nextInt(35))))
    val pLayout: Seq[CuTree] = Seq.fill(8) {
      if (rnd.nextInt(3) == 0) CuLeaf(Seq(rnd.nextInt(35)))
      else InterLeaf(8 * dx, 0)
    }
    val f0x = 4 * dx
    val bLayout: Seq[CuTree] =
      (BiLeaf(3, f0x, 0, -f0x, 0): CuTree) +: Seq.fill(7) {
        rnd.nextInt(4) match {
          case 0 => BiLeaf(3, f0x, 0, -f0x, 0)
          case 1 => BiLeaf(1, f0x, 0)
          case 2 => BiLeaf(2, 0, 0, -f0x, 0)
          case _ => CuSplit(BiLeaf(3, f0x, 0, -f0x, 0),
            CuLeaf(Seq(rnd.nextInt(35))),
            BiLeaf(3, f0x, 0, -f0x, 0, dropResidual = true),
            BiLeaf(1, f0x, 0))
        }
      }
    // decode order I0, P2, B1 — source frames follow decode order
    val frames = Seq(0, 2, 1).map(k => planes(w, h, new scala.util.Random(78), k, dx))
    val (stream, recons) = H265Encode.encodeGopB(frames, w, h, iLayout,
      Seq(GopPic(2, 1, pLayout, negDelta = 2),
        GopPic(1, 0, bLayout, isRef = false)), qp = 27)
    Vec("own_b_128x64", w, h, stream, recons)
  }

  private def wpGop: Vec = {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(4104)
    val defC = Wp(64, 0)
    // P predicts a half-brightness fade via explicit weight; the B
    // mixes both lists with per-list weights
    val pwP = PredWeights(6, 6, Wp(32, 8), defC, defC, defC, defC, defC)
    val pwB = PredWeights(6, 6, Wp(48, 4), defC, defC, Wp(80, -4), defC, defC)
    val iLayout: Seq[CuTree] = Seq.fill(8)(CuLeaf(Seq(rnd.nextInt(35))))
    val pLayout: Seq[CuTree] = Seq.fill(8)(InterLeaf(0, 0): CuTree)
    def mix(): Seq[CuTree] = Seq.fill(8) {
      rnd.nextInt(4) match {
        case 0 => CuLeaf(Seq(rnd.nextInt(35)))
        case 1 => BiLeaf(1, 0, 0)
        case 2 => BiLeaf(3, 0, 0, 0, 0)
        case _ => BiLeaf(2, 0, 0, 0, 0)
      }
    }
    def faded(num: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
      val (sy, scb, scr) = planes(w, h, new scala.util.Random(79), 0, 0)
      (sy.map(b => ((b & 0xff) * num / 64).min(255).toByte), scb, scr)
    }
    val (stream, recons) = H265Encode.encodeGopB(
      Seq(faded(64), faded(32), faded(48)), w, h, iLayout,
      Seq(GopPic(2, 1, pLayout, negDelta = 2, weights = Some(pwP)),
        GopPic(1, 0, mix(), isRef = false, weights = Some(pwB))), qp = 27)
    Vec("own_wp_128x64", w, h, stream, recons)
  }

  private def mrGop: Vec = {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(4105)
    val iLayout: Seq[CuTree] = Seq.fill(8)(CuLeaf(Seq(rnd.nextInt(35))))
    val p1Layout: Seq[CuTree] = Seq.fill(8) {
      if (rnd.nextInt(3) == 0) CuLeaf(Seq(rnd.nextInt(35)))
      else InterLeaf(rnd.nextInt(5) - 2, 0)
    }
    // P2 references BOTH P1 (delta 1) and I0 (delta 2); refIdx 1 picks
    // the second list entry, exercising multi-entry L0 construction
    val p2Layout: Seq[CuTree] = Seq.fill(8) {
      rnd.nextInt(3) match {
        case 0 => InterLeaf(1, 0, refIdx = 1)
        case 1 => InterLeaf(rnd.nextInt(5) - 2, 0)
        case _ => CuSplit(InterLeaf(1, 0, refIdx = 1),
          CuLeaf(Seq(rnd.nextInt(35))),
          InterLeaf(rnd.nextInt(5) - 2, 0),
          InterLeaf(1, 0, refIdx = 1))
      }
    }
    val fA = planes(w, h, new scala.util.Random(80), 0, 1)
    val fB = planes(w, h, new scala.util.Random(80), 1, 1)
    val (stream, recons) = H265Encode.encodeGopB(
      Seq(fA, fB, fA), w, h, iLayout,
      Seq(GopPic(1, 1, p1Layout),
        GopPic(2, 1, p2Layout, negDelta = 1, moreNegDeltas = Seq(2))),
      qp = 27)
    Vec("own_mr_128x64", w, h, stream, recons)
  }

  /** r15 signhide: the P-GOP shape re-encoded with sign_data_hiding
    * live — the encoder's §7.4.9.11 parity repair (and the hidden-sign
    * bins it elides) must survive an independent decoder. Distinct
    * seed/deltas from [[pGop]] so the two streams stay byte-disjoint.
    */
  private def shGop: Vec = {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(4106)
    val dx = 1
    val iLayout: Seq[CuTree] = Seq.fill(8)(CuLeaf(Seq(rnd.nextInt(35))))
    def pLayout(): Seq[CuTree] = Seq.fill(8) {
      if (rnd.nextInt(3) == 0) CuLeaf(Seq(rnd.nextInt(35)))
      else InterLeaf(4 * dx, 0): CuTree
    }
    val frames = (0 to 2).map(k => planes(w, h, new scala.util.Random(81), k, dx))
    val (stream, recons) = H265Encode.encodeGop(frames, w, h, iLayout,
      Seq(pLayout(), pLayout()), qp = 27, signHide = true)
    Vec("own_sh_128x64", w, h, stream, recons)
  }

  /** r15 temporal MVP: a reordered-B GOP with sps_temporal_mvp
    * enabled — slice TMVP flags, collocated_* syntax, and §8.5.3.2.8/9
    * temporal merge/AMVP candidates must all survive an independent
    * decoder (libde265 derives the same candidate lists, or pixels
    * diverge). Distinct seed from [[bGop]] keeps the streams disjoint.
    */
  private def tmvpGop: Vec = {
    val w = 128; val h = 64
    val rnd = new scala.util.Random(4107)
    val dx = 1
    val iLayout: Seq[CuTree] = Seq.fill(8)(CuLeaf(Seq(rnd.nextInt(35))))
    val pLayout: Seq[CuTree] = Seq.fill(8) {
      if (rnd.nextInt(3) == 0) CuLeaf(Seq(rnd.nextInt(35)))
      else InterLeaf(8 * dx, 0)
    }
    val f0x = 4 * dx
    val bLayout: Seq[CuTree] = Seq.fill(8) {
      rnd.nextInt(4) match {
        case 0 => BiLeaf(3, f0x, 0, -f0x, 0)
        case 1 => BiLeaf(1, f0x, 0)
        case 2 => CuLeaf(Seq(rnd.nextInt(35)))
        case _ => BiLeaf(2, 0, 0, -f0x, 0)
      }
    }
    val frames = Seq(0, 2, 1).map(k => planes(w, h, new scala.util.Random(82), k, dx))
    val (stream, recons) = H265Encode.encodeGopB(frames, w, h, iLayout,
      Seq(GopPic(2, 1, pLayout, negDelta = 2),
        GopPic(1, 0, bLayout, isRef = false)), qp = 27,
      temporalMvp = true)
    Vec("own_tmvp_128x64", w, h, stream, recons)
  }

  /** All vectors, deterministic. encodeGopB recons come back in
    * DISPLAY order — the order libde265 emits pictures — and
    * encodeGop/intra decode order equals display order, so a straight
    * zip against the external YUV is valid everywhere.
    */
  def vectors: Seq[Vec] =
    Seq(intraSao, pGop, bGop, wpGop, mrGop, shGop, tmvpGop)

  /** Remux triple of the P vector (q175's three flavors): byte-level
    * re-wraps whose normative decode must be pixel-identical.
    */
  def remuxes: Seq[(String, Array[Byte])] = {
    val p = pGop
    (0 to 2).map(f => (s"own_p_128x64_remux$f",
      Multimodal.remuxHevcAnnexB(p.stream, f)))
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      args.headOption.getOrElse("fixtures/de265"))
    java.nio.file.Files.createDirectories(out)
    vectors.foreach { v =>
      java.nio.file.Files.write(out.resolve(v.name + ".265"), v.stream)
      val yuv = new java.io.ByteArrayOutputStream()
      v.recons.foreach { r =>
        yuv.write(r.luma); yuv.write(r.cb); yuv.write(r.cr)
      }
      java.nio.file.Files.write(out.resolve(v.name + "_recon.yuv"),
        yuv.toByteArray)
      println(s"${v.name}: ${v.stream.length} B stream, " +
        s"${v.recons.size} frames")
    }
    remuxes.foreach { case (name, bytes) =>
      java.nio.file.Files.write(out.resolve(name + ".265"), bytes)
      println(s"$name: ${bytes.length} B stream")
    }
  }
}
