package graft.tools

import java.nio.file.{Files, Paths}

import graft.multimodal.{H265, H265Decode}

/** Check an EXTERNALLY-encoded Annex-B HEVC stream (tools/x265_vector.c
  * drives the system libx265) against the encoder's own reconstruction:
  * prints the probe view (SPS/PPS fields as our parser sees them), then
  * decodes with the in-repo decoder and diffs every plane byte against
  * the recon YUV. Exit 0 = bit-exact. This is the external-vector
  * validation the r7→r13 hunt was after.
  *
  * Usage: runMain graft.tools.ExternalVectorCheck <stream.265>
  *        <recon.yuv> <w> <h> <frames>
  */
object ExternalVectorCheck {
  def main(args: Array[String]): Unit = {
    val Array(sp, rp, ws, hs, fs) = args.take(5)
    val (w, h, frames) = (ws.toInt, hs.toInt, fs.toInt)
    val stream = Files.readAllBytes(Paths.get(sp))
    val recon = Files.readAllBytes(Paths.get(rp))
    val nals = H265.nalUnitsAnnexB(stream)
    println(s"[xvec] ${nals.size} NALs: " +
      nals.map(_.nalType).mkString(","))
    nals.filter(_.nalType == H265.NalSps).take(1).foreach { n =>
      println(s"[xvec] SPS: ${H265.parseSps(n.payload)}")
    }
    nals.filter(_.nalType == H265.NalPps).take(1).foreach { n =>
      println(s"[xvec] PPS: ${H265.parsePps(n.payload)}")
    }
    val t0 = System.nanoTime()
    // decode order: the x265 recon file is written as frames come out
    // of the encoder, which is decode order for B GOPs
    val decoded = H265Decode.decodeAnnexBPictures(stream,
      maxFrames = frames + 8, displayOrder = false)
    println(f"[xvec] decoded ${decoded.size} pictures in ${(System.nanoTime()-t0)/1e6}%.1f ms")
    if (decoded.size != frames) {
      println(s"[xvec] FAIL: expected $frames pictures")
      sys.exit(2)
    }
    val lsz = w * h; val csz = lsz / 4
    var bad = 0
    for (i <- 0 until frames) {
      val base = i * (lsz + 2 * csz)
      val f = decoded(i)
      def diff(name: String, got: Array[Byte], off: Int, len: Int,
          pw: Int): Unit = {
        val want = java.util.Arrays.copyOfRange(recon, base + off, base + off + len)
        if (!java.util.Arrays.equals(got, want)) {
          val badIdx = got.indices.filter(j => got(j) != want(j))
          val (xs, ys) = (badIdx.map(_ % pw), badIdx.map(_ / pw))
          println(s"[xvec] frame $i $name: ${badIdx.size} bad px, " +
            s"bbox x[${xs.min}..${xs.max}] y[${ys.min}..${ys.max}], " +
            s"first=(${xs.head},${ys.head}) got ${got(badIdx.head)} want ${want(badIdx.head)}")
          bad += 1
        }
      }
      diff("luma", f.luma, 0, lsz, w)
      diff("cb", f.cb, lsz, csz, w / 2)
      diff("cr", f.cr, lsz + csz, csz, w / 2)
    }
    if (bad == 0) println(s"[xvec] PASS: $frames frames bit-exact vs libx265 recon")
    sys.exit(if (bad == 0) 0 else 1)
  }
}
