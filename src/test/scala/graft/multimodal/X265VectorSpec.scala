package graft.multimodal

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** EXTERNAL-vector validation of the HEVC pixel tier (r14): the
  * fixtures under fixtures/x265 were produced by the SYSTEM
  * libx265.so.199 (x265 3.5 — an independently-authored encoder; see
  * tools/x265_vector.c and tools/regen_x265_vectors.sh for
  * provenance), each pairing an Annex-B stream with the encoder's own
  * per-frame reconstruction. Decoding each stream bit-exact to that
  * recon is the externally-authored conformance evidence the r7→r13
  * vector hunt was after: a transcription error anywhere on the
  * exercised path — CABAC, intra prediction (incl. the explicit
  * chroma modes these vectors unlocked), subpel MC, merge/AMVP,
  * multi-entry RPS with unused entries, weighted prediction,
  * multi-reference lists, residual transforms, SAO, and the §8.7.2.4
  * inter-bS deblocking landed this round — could not reproduce
  * libx265's reconstruction.
  *
  * Recon files are in DECODE order (the order frames leave the
  * encoder), hence displayOrder = false.
  */
class X265VectorSpec extends AnyFunSuite {

  private val dir = "fixtures/x265"

  private def check(stream: String, recon: String, w: Int, h: Int,
      frames: Int): Unit = {
    val bytes = Files.readAllBytes(Paths.get(dir, stream))
    val want = Files.readAllBytes(Paths.get(dir, recon))
    val decoded = H265Decode.decodeAnnexBPictures(bytes,
      maxFrames = frames + 8, displayOrder = false)
    assert(decoded.size == frames, s"$stream decoded ${decoded.size}")
    val lsz = w * h; val csz = lsz / 4
    for (i <- 0 until frames) {
      val base = i * (lsz + 2 * csz)
      def slice(off: Int, len: Int): Array[Byte] =
        java.util.Arrays.copyOfRange(want, base + off, base + off + len)
      assert(java.util.Arrays.equals(decoded(i).luma, slice(0, lsz)),
        s"$stream frame $i luma")
      assert(java.util.Arrays.equals(decoded(i).cb, slice(lsz, csz)),
        s"$stream frame $i cb")
      assert(java.util.Arrays.equals(decoded(i).cr, slice(lsz + csz, csz)),
        s"$stream frame $i cr")
    }
  }

  test("x265 intra vector (64x64, deblock+SAO): bit-exact") {
    check("intra_64x64.265", "intra_64x64_recon.yuv", 64, 64, 5)
  }

  test("x265 P vector (128x64, subpel ME, deblock+SAO): bit-exact") {
    check("p_128x64.265", "p_128x64_recon.yuv", 128, 64, 6)
  }

  test("x265 B vector (128x64, B GOP, deblock+SAO): bit-exact") {
    check("b_128x64.265", "b_128x64_recon.yuv", 128, 64, 6)
  }

  test("x265 weighted-prediction vector (128x64, weightp): bit-exact") {
    check("wp_128x64.265", "wp_128x64_recon.yuv", 128, 64, 6)
  }

  test("x265 multi-reference vector (128x64, ref=3): bit-exact") {
    check("mr_128x64.265", "mr_128x64_recon.yuv", 128, 64, 6)
  }

  test("x265 sign-data-hiding vector (128x64, signhide=1): bit-exact") {
    // r15: the P config with sign_data_hiding LIVE — one of the two
    // named gaps the r14 vectors disabled by param; §7.4.9.11 decode
    // landed this round. The PPS must actually declare the flag.
    val pps = H265.nalUnitsAnnexB(
      Files.readAllBytes(Paths.get(dir, "sh_128x64.265")))
      .find(_.nalType == H265.NalPps).get.payload
    assert(H265.parsePps(pps).exists(_.signDataHiding),
      "vector must exercise sign_data_hiding")
    check("sh_128x64.265", "sh_128x64_recon.yuv", 128, 64, 6)
  }

  private def assertTmvp(stream: String): Unit = {
    val sps = H265.nalUnitsAnnexB(
      Files.readAllBytes(Paths.get(dir, stream)))
      .find(_.nalType == H265.NalSps).get.payload
    assert(H265.parseSps(sps).exists(_.temporalMvp),
      "vector must exercise temporal MVP")
  }

  test("x265 temporal-MVP P vector (128x64, temporal-mvp=1): bit-exact") {
    // r15: the OTHER named gap live — temporal merge/AMVP candidates
    // (§8.5.3.2.8/9) from the collocated picture's stored MV field,
    // POC-scaled; P slices infer collocated_from_l0
    assertTmvp("tmvp_p_128x64.265")
    check("tmvp_p_128x64.265", "tmvp_p_128x64_recon.yuv", 128, 64, 6)
  }

  test("x265 temporal-MVP B vector (128x64, B GOP): bit-exact") {
    // B slices carry collocated_from_l0 and exercise the §8.5.3.2.9
    // both-list selection (NoBackwardPredFlag) plus bi temporal merge
    assertTmvp("tmvp_b_128x64.265")
    check("tmvp_b_128x64.265", "tmvp_b_128x64_recon.yuv", 128, 64, 6)
  }
}
