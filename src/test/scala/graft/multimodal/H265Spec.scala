package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** H.265/HEVC probe-tier pins (r10): NAL framing (Annex-B + length-
  * prefixed), SPS writer↔parser round-trips incl. the conformance-
  * window crop, hvcC round-trip, container probe down to the
  * bitstream, IRAP keyframe extraction, and malformed-input posture.
  * Pixel decode is out of scope (FrameDecoder boundary) — these pins
  * cover exactly the probe/keyframe surface the q155 face uses.
  */
class H265Spec extends AnyFunSuite with graft.SparkSpec {

  test("SPS round-trip: aligned dims, no conformance window") {
    val info = H265.parseSps(H265.writeSps(64, 48)).get
    assert(info.width === 64 && info.height === 48)
    assert(info.chromaFormatIdc === 1 && info.bitDepthLuma === 8 &&
      info.bitDepthChroma === 8)
    assert(info.profileIdc === 1 && !info.tierFlag && info.levelIdc === 93)
    assert(info.log2MaxPocLsb === 4)
  }

  test("SPS round-trip: non-multiple-of-8 dims crop through the conformance window") {
    for ((w, h) <- Seq((100, 58), (66, 44), (1920, 1080), (2, 2))) {
      val info = H265.parseSps(H265.writeSps(w, h)).get
      assert(info.width === w && info.height === h, s"${w}x$h")
    }
  }

  test("Annex-B NAL scan: 2-byte headers, types/layer/tid decode; garbage tolerated") {
    val stream =
      Array[Byte](9, 9) ++ // leading garbage
        Array[Byte](0, 0, 0, 1) ++ H265.nalHeader(H265.NalVps) ++ H265.writeVps() ++
        Array[Byte](0, 0, 1) ++ H265.nalHeader(H265.NalSps) ++ H265.writeSps(64, 48) ++
        Array[Byte](0, 0, 1) ++ H265.nalHeader(H265.NalIdrWRadl) ++ Array[Byte](5, 6, 7)
    val nals = H265.nalUnitsAnnexB(stream)
    assert(nals.map(_.nalType) === Seq(32, 33, 19))
    assert(nals.forall(n => n.layerId == 0 && n.tidPlus1 == 1))
    assert(nals(2).payload.toSeq === Seq[Byte](5, 6, 7))
    assert(H265.nalUnitsAnnexB(Array[Byte](1, 2, 3)) === Nil)
  }

  test("hvcC round-trip: parameter sets and lengthSize survive") {
    val (vps, sps, pps) = (H265.writeVps(), H265.writeSps(80, 46), H265.writePps())
    val (lengthSize, arrays) = H265.parseHvcC(H265.writeHvcC(vps, sps, pps)).get
    assert(lengthSize === 4)
    assert(arrays.map(_._1) === Seq(H265.NalVps, H265.NalSps, H265.NalPps))
    // each NAL carries its 2-byte header; payload beyond it matches
    assert(arrays(1)._2.drop(2).toSeq === sps.toSeq)
    assert(H265.parseSps(arrays(1)._2.drop(2)).get.width === 80)
    assert(H265.parseHvcC(Array[Byte](2, 0, 0)) === None)
  }

  test("hvc1 mp4 probe reaches the BITSTREAM dims, not the container's") {
    def sample(t: Int, body: Array[Byte]): Array[Byte] = {
      val nal = H265.nalHeader(t) ++ body
      Array[Byte](0, 0, 0, nal.length.toByte) ++ nal
    }
    val mp4 = VideoContainers.buildMp4Hevc(
      Seq(sample(19, Array[Byte](1, 2, 3, 4))), Seq(1),
      H265.writeVps(), H265.writeSps(100, 58), H265.writePps(),
      // container LIES about the dims — remuxers routinely do
      width = 640, height = 480)
    val info = VideoContainers.probeHevcMp4(mp4).get
    assert(info.width === 100 && info.height === 58)
    assert(VideoContainers.probeHevcMp4(Array[Byte](0, 0, 0, 0)) === None)
  }

  test("IRAP keyframe extraction: mp4 sync samples and Annex-B runs") {
    def sample(t: Int, body: Array[Byte]): Array[Byte] = {
      val nal = H265.nalHeader(t) ++ body
      Array[Byte](0, 0, 0, nal.length.toByte) ++ nal
    }
    val idrBody = Array[Byte](10, 20, 30, 40)
    val mp4 = VideoContainers.buildMp4Hevc(
      Seq(sample(19, idrBody), sample(1, Array[Byte](7, 7)),
        sample(21, Array[Byte](9, 9, 9))),
      syncSamples = Seq(1, 3),
      H265.writeVps(), H265.writeSps(64, 48), H265.writePps(), 64, 48)
    val keys = VideoContainers.mp4HevcKeyframes(mp4)
    assert(keys.size === 2)
    assert(keys(0).toSeq === idrBody.toSeq)
    assert(keys(1).toSeq === Seq[Byte](9, 9, 9)) // CRA (21) is IRAP too
    // Annex-B: consecutive IRAP NALs form ONE keyframe payload
    val annexB =
      Array[Byte](0, 0, 1) ++ H265.nalHeader(19) ++ Array[Byte](1, 2) ++
        Array[Byte](0, 0, 1) ++ H265.nalHeader(19) ++ Array[Byte](3) ++
        Array[Byte](0, 0, 1) ++ H265.nalHeader(1) ++ Array[Byte](9) ++
        Array[Byte](0, 0, 1) ++ H265.nalHeader(21) ++ Array[Byte](4, 5)
    val runs = H265.irapPayloads(annexB)
    assert(runs.size === 2)
    assert(runs(0).toSeq === Seq[Byte](1, 2, 3) && runs(1).toSeq === Seq[Byte](4, 5))
  }

  test("q155 corpus: keyframe-hash dedup collapses planted IRAP-sharing pairs; byte hash cannot") {
    import spark.implicits._
    val media = Multimodal.syntheticHevcMp4s(spark, 40).persist()
    val byId = media.collect().map(m => m.media_id -> m.content).toMap
    val dups = (0L until 40L).filter(id => id % 10 == 0 && id > 0)
    dups.foreach { id =>
      assert(byId(id).toSeq != byId(id - 1).toSeq, s"pair $id whole-file bytes")
      assert(VideoContainers.mp4HevcKeyframes(byId(id)).map(_.toSeq) ===
        VideoContainers.mp4HevcKeyframes(byId(id - 1)).map(_.toSeq),
        s"pair $id keyframes")
    }
    // every stream probes to its declared bitstream dims
    byId.foreach { case (id, bytes) =>
      val seed = if (id % 10 == 0 && id > 0) id - 1 else id
      val info = VideoContainers.probeHevcMp4(bytes).get
      assert(info.width === 64 + 8 * (seed % 5).toInt &&
        info.height === 44 + 2 * (seed % 7).toInt, s"video $id")
    }
    val survivors = Multimodal.videoDedupByKeyframeHash(media)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(survivors == (0L until 40L).filterNot(id => id % 10 == 0 && id > 0))
    media.unpersist()
  }
}
