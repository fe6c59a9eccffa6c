package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(spark, 60, partitions = 4).cache()
  lazy val pngs = Multimodal.syntheticImages(spark, 50, size = 32, dupEvery = 10).cache()

  test("REAL codec: ImageIO decodes the synthetic PNGs to exact pixels") {
    // hand-build one PNG with a known pixel and round-trip it through the
    // distributed decode path
    val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 3, 0xFF8040)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val one = Seq(Multimodal.Media(7L, "image", bos.toByteArray,
      Multimodal.MediaMeta("png", Some(8), Some(6), None, None))).toDS()
    val d = Multimodal.decodeImagesIO(one).collect().head
    assert(d.width == 8 && d.height == 6 && d.channels == 3)
    val i = (3 * 8 + 2) * 3
    assert((d.pixels(i) & 0xff) == 0xFF && (d.pixels(i + 1) & 0xff) == 0x80 &&
      (d.pixels(i + 2) & 0xff) == 0x40)
    // undecodable payloads are dropped, not fatal
    val junk = Seq(Multimodal.Media(8L, "image", Array[Byte](1, 2, 3), null)).toDS()
    assert(Multimodal.decodeImagesIO(junk).count() == 0)
  }

  test("REAL codec: average-hash — identical pixels identical hash, noise stays near") {
    val hashes = Multimodal.imageAHash(pngs).collect().map(h => h.media_id -> h.ahash).toMap
    assert(hashes.size == 50)
    // planted duplicates (id % 10 == 0 duplicates id-1) hash identically
    for (id <- Seq(10L, 20L, 30L, 40L))
      assert(hashes(id) == hashes(id - 1), s"dup $id")
    // distinct random patterns are far apart (expected Hamming ~32)
    val d01 = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(d01 > 8, s"independent images too close: $d01")
  }

  test("REAL codec: image near-dup dedup drops planted duplicates, keeps min id") {
    val out = Multimodal.imageDedupByAHash(pngs, maxDist = 3)
      .select("media_id").as[Long].collect().toSet
    for (id <- Seq(10L, 20L, 30L, 40L)) {
      assert(!out.contains(id), s"duplicate $id survived")
      assert(out.contains(id - 1), s"cluster representative ${id - 1} missing")
    }
    assert(out.size == 46) // 50 - 4 planted duplicates
  }

  lazy val wavs = Multimodal.syntheticWavs(spark, 50, dupEvery = 10).cache()

  test("REAL codec: javax.sound decodes the synthetic WAVs sample-exactly") {
    val d = Multimodal.decodeAudioIO(wavs.filter(_.media_id == 3L)).collect().head
    assert(d.sample_rate == 8000 && d.n_samples == 1600)
    // re-synthesize sample 100 from the id-3 seed and compare
    val rnd = new scala.util.Random(3L)
    val nTones = 1 + rnd.nextInt(3)
    val tones = Seq.fill(nTones)((220.0 + rnd.nextInt(1200), 0.2 + rnd.nextDouble() * 0.5))
    val t = 100.0 / 8000
    val expected = ((tones.map { case (f, a) => a * math.sin(2 * math.Pi * f * t) }.sum / nTones)
      * 28000).toShort / 32768.0f
    assert(math.abs(d.samples(100) - expected) < 1e-6, s"${d.samples(100)} vs $expected")
    // junk payloads are dropped, not fatal
    val junk = Seq(Multimodal.Media(9L, "audio", Array[Byte](9, 9), null)).toDS()
    assert(Multimodal.decodeAudioIO(junk).count() == 0)
  }

  test("REAL codec: audio fingerprint dedup drops planted duplicates") {
    val fps = Multimodal.audioFingerprint(wavs).collect().map(h => h.media_id -> h.fp).toMap
    for (id <- Seq(10L, 20L, 30L, 40L)) assert(fps(id) == fps(id - 1), s"dup $id")
    val out = Multimodal.audioDedupByFingerprint(wavs, maxDist = 3)
      .select("media_id").as[Long].collect().toSet
    for (id <- Seq(10L, 20L, 30L, 40L)) assert(!out.contains(id) && out.contains(id - 1))
    // energy features are unit-norm and ANN-compatible
    val feats = Multimodal.audioEnergyFeatures(wavs).toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val knn = Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") === 19L),
      "vec_id", "embedding", 1)
    assert(knn.select("neighbor_id").as[Long].head() == 20L) // its planted twin
  }

  test("REAL codec: GIF frame sampling extracts decodable frames; video dedup works") {
    val gifs = Multimodal.syntheticGifs(spark, 40, dupEvery = 10).cache()
    val frames = Multimodal.sampleFramesIO(gifs, maxFrames = 3)
    // every gif yields 3 frames, each a decodable PNG of the right size
    assert(frames.count() == 120)
    val asImages = frames.filter(_.frame_idx == 0)
      .map(f => Multimodal.Media(f.media_id, "image", f.frame, null))
    val decoded = Multimodal.decodeImagesIO(asImages)
    assert(decoded.count() == 40)
    assert(decoded.collect().forall(d => d.width == 16 && d.height == 16))
    // planted frame-identical duplicates dedup away, min id kept
    val out = Multimodal.videoDedupByFrameHash(gifs, maxDist = 3)
      .select("media_id").as[Long].collect().toSet
    for (id <- Seq(10L, 20L, 30L)) {
      assert(!out.contains(id), s"duplicate video $id survived")
      assert(out.contains(id - 1), s"representative ${id - 1} missing")
    }
  }

  test("FrameDecoder hook: an injected codec drives sampleFramesIO; GIF is the shipped instance") {
    // a fake "codec" standing in for an mp4/avi decoder: deterministic
    // frames derived from the payload — proves the pipeline is decoder-
    // agnostic (schema, frame indexing, drop-on-unreadable all unchanged)
    class FakeMp4Decoder extends Multimodal.FrameDecoder {
      override def sampleFrames(content: Array[Byte], maxFrames: Int): Seq[Array[Byte]] =
        if (content.isEmpty) Nil // "unreadable" payload
        else (0 until math.min(maxFrames, 2)).map(i => content.take(8) :+ i.toByte)
    }
    val media = Seq(
      Multimodal.Media(0L, "video", Array.tabulate(32)(_.toByte), null),
      Multimodal.Media(1L, "video", Array.emptyByteArray, null), // dropped
      Multimodal.Media(2L, "image", Array.tabulate(8)(_.toByte), null)) // not video
      .toDS()
    val frames = Multimodal.sampleFramesIO(media, maxFrames = 4, new FakeMp4Decoder)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.map(_.media_id).toSeq == Seq(0L, 0L))
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1))
    assert(frames(0).frame.last == 0.toByte && frames(1).frame.last == 1.toByte)

    // the shipped GIF decoder through the same hook: explicit == default
    val gifs = Multimodal.syntheticGifs(spark, 6, dupEvery = 0)
    val viaHook = Multimodal.sampleFramesIO(gifs, 3, new Multimodal.GifFrameDecoder)
      .collect().map(f => (f.media_id, f.frame_idx, f.frame.toSeq)).toSet
    val viaDefault = Multimodal.sampleFramesIO(gifs, 3)
      .collect().map(f => (f.media_id, f.frame_idx, f.frame.toSeq)).toSet
    assert(viaHook == viaDefault && viaHook.size == 18)
  }

  test("REAL container: MP4 build → probe → MJPEG frame decode round-trip") {
    // hand-build one MJPEG mp4 with a known block pattern and round-trip
    // it through the container parser — no Spark, pure byte work
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val mp4 = VideoContainers.buildMp4Mjpeg(Seq(jpeg, jpeg, jpeg), 16, 16, fps = 10)

    assert(VideoContainers.sniff(mp4) == "mp4")
    val info = VideoContainers.probeMp4(mp4).get
    assert(info.container == "mp4" && info.codec == "jpeg")
    assert(info.width == 16 && info.height == 16)
    assert(info.nFrames == 3 && info.durationMs == 300L)
    // sample table reconstruction: 3 samples of identical size, contiguous
    val ranges = VideoContainers.mp4SampleRanges(mp4)
    assert(ranges.length == 3 && ranges.forall(_._2 == jpeg.length))
    assert(ranges(1)._1 == ranges(0)._1 + jpeg.length)
    // frames decode to real pixels: left half bright, right half dark
    val frames = VideoContainers.mp4Frames(mp4)
    assert(frames.length == 3)
    val f = frames.head
    assert(f.getWidth == 16 && f.getHeight == 16)
    assert((f.getRGB(2, 8) & 0xff) > 200 && (f.getRGB(13, 8) & 0xff) < 60)
    // junk and truncated payloads are data, not errors
    assert(VideoContainers.probeMp4(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoContainers.mp4Frames(mp4.take(40)).isEmpty)
  }

  test("REAL container: AVI build → probe → MJPEG frame decode round-trip") {
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (y < 8) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val avi = VideoContainers.buildAviMjpeg(Seq(jpeg, jpeg), 16, 16, fps = 10)

    assert(VideoContainers.sniff(avi) == "avi")
    val info = VideoContainers.probeAvi(avi).get
    assert(info.container == "avi" && info.codec == "MJPG")
    assert(info.width == 16 && info.height == 16 && info.nFrames == 2)
    val frames = VideoContainers.aviFrames(avi)
    assert(frames.length == 2)
    val f = frames.head
    assert((f.getRGB(8, 2) & 0xff) > 200 && (f.getRGB(8, 13) & 0xff) < 60)
    assert(VideoContainers.probeAvi(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("REAL container: mixed GIF+AVI+MP4 corpus — one decoder, one dedup, one probe") {
    // 20 of each container, duplicates planted every 10th id within each;
    // ids offset so the three sub-corpora don't collide
    val gifs = Multimodal.syntheticGifs(spark, 20, dupEvery = 10)
    val avis = Multimodal.syntheticAvis(spark, 20, dupEvery = 10)
      .map(m => m.copy(media_id = m.media_id + 100))
    val mp4s = Multimodal.syntheticMp4s(spark, 20, dupEvery = 10)
      .map(m => m.copy(media_id = m.media_id + 200))
    val mixed = gifs.unionByName(avis).unionByName(mp4s).cache()

    // the default decoder handles all three containers
    val frames = Multimodal.sampleFramesIO(mixed, maxFrames = 3)
    assert(frames.count() == 180, "3 frames from each of 60 videos")
    // every sampled frame is a decodable PNG
    val asImages = frames.map(f => Multimodal.Media(f.media_id, "image", f.frame, null))
    assert(Multimodal.decodeImagesIO(asImages).count() == 180)

    // cross-container collapse: the generators share seed → pattern, so
    // gif/avi/mp4 triples with the same seed are pixel-near-identical
    // (JPEG loss moves few aHash bits on block patterns) and
    // keep-smallest-id keeps only the GIF instance — the frame hash sees
    // CONTENT, not container bytes. Survivors of the mixed corpus ==
    // survivors of the gif corpus alone.
    val out = Multimodal.videoDedupByFrameHash(mixed, maxDist = 3)
      .select("media_id").as[Long].collect().toSet
    val gifOnly = Multimodal.videoDedupByFrameHash(gifs, maxDist = 3)
      .select("media_id").as[Long].collect().toSet
    assert(out == gifOnly, s"mixed survivors $out != gif-only survivors $gifOnly")
    // within a single container, planted every-10th duplicates collapse
    val aviOnly = Multimodal.videoDedupByFrameHash(avis, maxDist = 3)
      .select("media_id").as[Long].collect().toSet
    assert(!aviOnly.contains(110L) && aviOnly.contains(109L))
    val mp4Only = Multimodal.videoDedupByFrameHash(mp4s, maxDist = 3)
      .select("media_id").as[Long].collect().toSet
    assert(!mp4Only.contains(210L) && mp4Only.contains(209L))

    // container metadata probe, no frame decode: avi + mp4 rows
    val metas = Multimodal.probeVideosIO(mixed).collect()
    assert(metas.length == 40, "20 avi + 20 mp4 (gif has no container probe)")
    assert(metas.filter(_.container == "avi").forall(m =>
      m.codec == "MJPG" && m.width == 16 && m.n_frames == 6))
    assert(metas.filter(_.container == "mp4").forall(m =>
      m.codec == "jpeg" && m.width == 16 && m.n_frames == 6))
  }

  test("REAL codec: grid features are unit-norm and feed ANN") {
    val feats = Multimodal.imageGridFeatures(pngs, grid = 8).toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val norms = feats.select(
      sqrt(aggregate(col("embedding"), lit(0.0d), (a, x) => a + x * x)).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    val knn = Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") === 9L),
      "vec_id", "embedding", 1)
    // image 10 is a pixel-identical copy of image 9 → nearest neighbor
    assert(knn.select("neighbor_id").as[Long].head() == 10L)
  }

  test("synthetic corpus: schema contract and determinism") {
    val df = media.toDF()
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    // regenerating yields byte-identical payloads (seeded by media_id)
    val again = Multimodal.syntheticMedia(spark, 60, partitions = 2)
    val a = media.map(m => (m.media_id, m.content.toSeq.hashCode)).collect().toSet
    val b = again.map(m => (m.media_id, m.content.toSeq.hashCode)).collect().toSet
    assert(a == b) // partitioning does not affect content
  }

  test("decodeImages: only images, dimensions from metadata, deterministic") {
    val decoded = Multimodal.decodeImages(media)
    val kinds = media.filter(_.kind == "image").count()
    assert(decoded.count() == kinds)
    val d = decoded.head()
    assert(d.pixels.nonEmpty && d.channels == 3 && d.width >= 64)
  }

  test("decodeImages survives hostile rows: null meta, empty payload, huge dims") {
    // the declared schema permits all three — none may crash the job
    val hostile = Seq(
      Multimodal.Media(900L, "image", Array[Byte](1, 2, 3), null),
      Multimodal.Media(901L, "image", Array.empty[Byte],
        Multimodal.MediaMeta("png", Some(8), Some(8), None, None)),
      Multimodal.Media(902L, "image", Array[Byte](9),
        Multimodal.MediaMeta("png", Some(50000), Some(50000), None, None)))
      .toDS()
    val out = Multimodal.decodeImages(hostile).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out(0).width == 64 && out(0).pixels.nonEmpty)  // null meta → defaults
    assert(out(1).pixels.isEmpty)                          // empty payload → empty
    assert(out(2).pixels.length == 4096)                   // capped, no overflow
  }

  test("extractFeatures: unit-norm 64-dim vectors for every row") {
    val feats = Multimodal.extractFeatures(media, dim = 64)
    assert(feats.count() == 60)
    val norms = feats.map(f => math.sqrt(f.feature.map(x => x.toDouble * x).sum)).collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
  }

  test("features flow into ANN search (Similarity integration)") {
    val feats = Multimodal.extractFeatures(media, dim = 64)
      .toDF().withColumnRenamed("feature", "embedding")
    val top = Similarity.bruteForceTopK(
      feats, feats.filter(col("media_id") === 0), "media_id", "embedding", 3)
    assert(top.count() == 3)
  }

  test("sampleFrames: N frames per video, indexed") {
    val frames = Multimodal.sampleFrames(media, maxFrames = 4)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    assert(perVideo.nonEmpty && perVideo.values.forall(n => n >= 1 && n <= 4))
    val idxs = frames.filter(_.media_id == perVideo.keys.head)
      .map(_.frame_idx).collect().sorted
    assert(idxs.headOption.contains(0))
  }

  test("partitionByKind co-locates modalities") {
    val parted = Multimodal.partitionByKind(media, partitionsPerKind = 2)
    val kindsPerPartition = parted.mapPartitions(it => Iterator(it.map(_.kind).toSet.size))
      .collect()
    assert(kindsPerPartition.forall(_ <= 1)) // each partition holds one modality (or none)
  }

  test("H.264 BITSTREAM: SPS writer/parser round-trip incl. frame cropping") {
    for ((w, h) <- Seq((320, 240), (1920, 1080), (640, 360), (354, 288))) {
      val sps = H264.parseSps(H264.writeSps(w, h))
      assert(sps.isDefined, s"${w}x$h did not parse")
      assert(sps.get.width == w && sps.get.height == h,
        s"got ${sps.get.width}x${sps.get.height}, wanted ${w}x$h")
      assert(sps.get.profileIdc == 66 && sps.get.frameMbsOnly)
    }
    // 1080 = 68 map units * 16 - 8 → cropping is actually exercised
    assert(H264.parseSps(H264.writeSps(1920, 1080)).get.height == 1080)
    // truncated payloads probe to None; arbitrary bytes may parse as a
    // syntactically-valid SPS (all-ones does) — the contract is only
    // "never throw"
    assert(H264.parseSps(Array[Byte](1, 2)).isEmpty)
    H264.parseSps(Array.fill[Byte](8)(-1)) // must not throw
    H264.parseSps(Array.emptyByteArray)    // must not throw
  }

  test("H.264 BITSTREAM: Annex-B and AVCC NAL scanning, EP-byte round-trip") {
    val sps = H264.writeSps(320, 240)
    val slice = Array.tabulate[Byte](300)(i => (i * 7 + 1).toByte)
    // Annex-B: [00 00 00 01] SPS [00 00 01] IDR [00 00 01] non-IDR
    val bos = new java.io.ByteArrayOutputStream()
    def put(sc: Array[Byte], hdr: Int, p: Array[Byte]): Unit = {
      bos.write(sc, 0, sc.length); bos.write(hdr); bos.write(p, 0, p.length)
    }
    put(Array[Byte](0, 0, 0, 1), 0x67, sps)
    put(Array[Byte](0, 0, 1), 0x65, slice)
    put(Array[Byte](0, 0, 1), 0x41, slice)
    val nals = H264.nalUnitsAnnexB(bos.toByteArray)
    assert(nals.map(_.nalType) == Seq(7, 5, 1))
    assert(H264.probeAnnexB(bos.toByteArray).map(i => (i.width, i.height))
      .contains((320, 240)))
    assert(H264.idrPayloads(bos.toByteArray).map(_.toSeq) == Seq(slice.toSeq))
    // EBSP round-trip: a payload full of 00 00 0x runs survives
    val nasty = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 7, 0, 0)
    assert(H264.rbsp(H264.ebsp(nasty)).toSeq == nasty.toSeq)
    // AVCC framing
    val avcc = {
      val b = new java.io.ByteArrayOutputStream()
      val len = slice.length + 1
      b.write(0); b.write(0); b.write(len >> 8); b.write(len & 0xff)
      b.write(0x65); b.write(slice, 0, slice.length)
      b.toByteArray
    }
    val avccNals = H264.nalUnitsAvcc(avcc, 4)
    assert(avccNals.map(_.nalType) == Seq(5))
    assert(avccNals.head.payload.toSeq == slice.toSeq)
  }

  test("REAL container: avc1 mp4 build → avcC/SPS probe → keyframe extraction") {
    val one = Multimodal.syntheticAvcMp4s(spark, 1, dupEvery = 0).collect().head
    // container probe sees the avc1 codec and declared dims
    val info = VideoContainers.probeMp4(one.content)
    assert(info.exists(_.codec == "avc1"), s"probe: $info")
    // bitstream probe recovers the SPS dims (= declared dims here)
    val spsInfo = VideoContainers.probeAvcMp4(one.content)
    assert(spsInfo.map(i => (i.width, i.height))
      .contains((one.meta.width.get, one.meta.height.get)), s"sps: $spsInfo")
    // 8 samples, sync at 1 and 5 → exactly 2 compressed keyframes
    val keys = VideoContainers.mp4AvcKeyframes(one.content)
    assert(keys.length == 2, s"got ${keys.length} keyframes")
    assert(keys.forall(_.length > 32))
    // non-avc payloads yield Nil, not an error
    assert(VideoContainers.mp4AvcKeyframes(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("H.264 keyframe-hash dedup: planted duplicates collapse, unique ids survive") {
    val corpus = Multimodal.syntheticAvcMp4s(spark, 40, dupEvery = 10)
    val survivors = Multimodal.videoDedupByKeyframeHash(corpus)
      .map(_.media_id).collect().toSet
    // ids 10, 20, 30 are byte-identical to 9, 19, 29 → dropped
    assert(survivors == (0L until 40L).toSet -- Set(10L, 20L, 30L))
    // an undecodable video survives unconditionally
    import spark.implicits._
    val withJunk = corpus.union(spark.createDataset(Seq(
      Multimodal.Media(999L, "video", Array[Byte](9, 9, 9), null))))
    val survivors2 = Multimodal.videoDedupByKeyframeHash(withJunk)
      .map(_.media_id).collect().toSet
    assert(survivors2.contains(999L))
  }

  test("AVC coding-structure census: progressive/paff/mbaff classified; field decode rejects") {
    // SPS writer ↔ parser round-trip of the frame/field structure
    for ((fmo, aff, want) <- Seq((true, false, "progressive"),
        (false, false, "paff"), (false, true, "mbaff"))) {
      val sps = H264.parseSps(
        H264.writeSps(64, 64, frameMbsOnly = fmo, mbAff = aff)).get
      assert(sps.codingStructure == want, want)
      assert(sps.width == 64 && sps.height == 64, s"$want dims")
    }
    // the census counts all three; decodable_tier only for progressive
    val media = Multimodal.syntheticAvcFieldMixStreams(spark, 30)
    val facts = Multimodal.avcCodingCensus(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(facts.size == 30)
    for (id <- 0L until 30L) {
      val want = (id % 3) match {
        case 0 => "progressive"; case 1 => "paff"; case _ => "mbaff"
      }
      assert(facts(id).coding == want, s"id $id")
      assert(facts(id).decodable_tier == (id % 3 == 0), s"id $id tier")
    }
    // field-coded slice data stays a LOUD reject in the pixel tier:
    // no frames, never a wrong decode
    val byId = media.collect().map(m => m.media_id -> m.content).toMap
    assert(H264Decode.decodeAnnexBPictures(byId(1), 4).isEmpty)
    assert(H264Decode.decodeAnnexBPictures(byId(2), 4).isEmpty)
    assert(H264Decode.decodeAnnexBPictures(byId(0), 4).nonEmpty)
  }
}
