package graft.multimodal

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite



/** EXTERNAL-decoder validation of the HEVC ENCODER tier (r15): the
  * YUVs under fixtures/de265 were produced by the SYSTEM libde265.so.0
  * (libde265 1.0.11 — an independently-authored HEVC decoder; see
  * tools/de265_vector.c and tools/regen_de265_vectors.sh for
  * provenance) decoding THIS repo's encoder output. A conformant
  * encoder is defined by "the normative decode of its stream equals
  * its own reconstruction", so each vector asserts:
  *
  *   1. PROVENANCE — the deterministic generator reproduces the
  *      committed .265 byte-identically (the external decode really is
  *      of this encoder's output);
  *   2. CONFORMANCE — the encoder's recon frames equal libde265's
  *      decoded planes bit-exactly;
  *   3. TRIANGLE — our own decoder also reproduces the same pixels
  *      (decoder ≡ external decoder ≡ encoder recon).
  *
  * Together with X265VectorSpec (external ENCODER → our decoder) this
  * closes both provenance directions: neither the encoder nor the
  * decoder tier is validated only against its in-repo twin.
  *
  * The remux triple additionally pins q175's decode-invariance claim
  * to regenerable bytes whose EXTERNAL pixel-identity was verified at
  * regen time (tools/regen_de265_vectors.sh step (b)).
  */
class De265VectorSpec extends AnyFunSuite {

  private val dir = "fixtures/de265"

  private def yuvOf(recons: Seq[H265Encode.Recon]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recons.foreach { r => out.write(r.luma); out.write(r.cb); out.write(r.cr) }
    out.toByteArray
  }

  for (v <- De265Vectors.vectors) {
    test(s"${v.name}: committed stream provenance + encoder recon == libde265") {
      val committed = Files.readAllBytes(Paths.get(dir, v.name + ".265"))
      assert(java.util.Arrays.equals(v.stream, committed),
        s"${v.name}: generator no longer reproduces the committed stream")
      val external = Files.readAllBytes(Paths.get(dir, v.name + "_de265.yuv"))
      assert(java.util.Arrays.equals(yuvOf(v.recons), external),
        s"${v.name}: encoder recon diverges from the external decode")
      // triangle: our decoder (display order, like libde265) agrees too
      val ours = H265Decode.decodeAnnexBPictures(v.stream,
        maxFrames = v.recons.size + 8, displayOrder = true)
      assert(ours.size == v.recons.size)
      assert(java.util.Arrays.equals(
        yuvOf(ours.map(f => H265Encode.Recon(f.luma, f.cb, f.cr))), external),
        s"${v.name}: own decoder diverges from the external decode")
    }
  }

  test("own_sh vector really exercises sign_data_hiding") {
    val pps = H265.nalUnitsAnnexB(
      Files.readAllBytes(Paths.get(dir, "own_sh_128x64.265")))
      .find(_.nalType == H265.NalPps).get.payload
    assert(H265.parsePps(pps).exists(_.signDataHiding))
  }

  test("own_tmvp vector really exercises temporal MVP") {
    val sps = H265.nalUnitsAnnexB(
      Files.readAllBytes(Paths.get(dir, "own_tmvp_128x64.265")))
      .find(_.nalType == H265.NalSps).get.payload
    assert(H265.parseSps(sps).exists(_.temporalMvp))
  }

  test("remux triple: committed bytes regenerate; all flavors byte-disjoint") {
    val base = Files.readAllBytes(Paths.get(dir, "own_p_128x64.265"))
    val streams = De265Vectors.remuxes.map { case (name, bytes) =>
      val committed = Files.readAllBytes(Paths.get(dir, name + ".265"))
      assert(java.util.Arrays.equals(bytes, committed),
        s"$name: remux no longer reproduces the committed bytes")
      bytes
    }
    // byte-disjoint from the original and from each other (the q175
    // premise); their EXTERNAL pixel-identity to the original was
    // verified by libde265 at regen time (regen_de265_vectors.sh)
    val all = base +: streams
    for (i <- all.indices; j <- all.indices if i < j)
      assert(!java.util.Arrays.equals(all(i), all(j)), s"$i/$j not disjoint")
    // and our own decoder sees identical pixels across all four forms
    val pix = all.map(s => H265Decode.decodeAnnexBPictures(s,
      maxFrames = 11, displayOrder = true))
    for (p <- pix.tail) {
      assert(p.size == pix.head.size)
      p.zip(pix.head).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a.luma, b.luma) &&
          java.util.Arrays.equals(a.cb, b.cb) &&
          java.util.Arrays.equals(a.cr, b.cr))
      }
    }
  }
}
