package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * carried as opaque `binary` columns with typed metadata structs, processed
  * by per-partition batch operators.
  *
  * The IMAGE, AUDIO and VIDEO paths are REAL: the JDK ships
  * PNG/BMP/GIF/JPEG readers (javax.imageio, headless-safe) and PCM-WAV
  * readers (javax.sound.sampled) in `java.desktop`, so
  * [[decodeImagesIO]]/[[imageAHash]]/[[imageDedupByAHash]],
  * [[decodeAudioIO]]/[[audioFingerprint]]/[[audioDedupByFingerprint]] and
  * [[sampleFramesIO]]/[[videoDedupByFrameHash]] decode actual
  * pixels/samples/frames with no external codec libraries. Video covers
  * GIF plus mp4 and avi CONTAINERS parsed from the public specs
  * ([[VideoContainers]]) with real frame decode for Motion-JPEG payloads
  * AND (r7) H.264 INTRA keyframes — CAVLC or (r8) CABAC entropy
  * decode, inverse transform, full spatial prediction ([[H264Decode]],
  * [[H264Cabac]]) — so avc1 keyframes reconstruct to pixels, plus (r8)
  * P-slice motion compensation for CAVLC streams. The remaining codec
  * tier (CABAC inter, B-slices, H.265)
  * enters through the injectable [[FrameDecoder]] hook, plus the
  * clearly-marked deterministic stubs below for the generic-payload
  * pipeline shape.
  * Everything else is real and tested: the schema contract, the
  * `mapPartitions` batch shape (one codec init per partition, not per
  * row), the partition-preserving plumbing, and the hand-off of extracted
  * features into the ANN operators ([[graft.operators.Similarity]]).
  */
object Multimodal {

  /** Media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),       // image/video
      StructField("height", IntegerType),      // image/video
      StructField("sample_rate", IntegerType), // audio
      StructField("duration_ms", LongType))),  // audio/video
      nullable = true)))

  case class MediaMeta(format: String, width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], duration_ms: Option[Long])
  case class Media(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class DecodedImage(media_id: Long, width: Int, height: Int, channels: Int,
      pixels: Array[Byte])
  case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])
  case class VideoFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Read a media corpus from an on-disk parquet fixture if present, else
    * fall back to the in-memory generator. The synthetic generators are
    * seeded-deterministic, so a fixture written once by
    * `tools.GenMediaFixtures` is byte-identical to what `gen` would
    * produce — committing the parquet just stops every query run from
    * re-paying ~2k ImageIO/container encodes, and makes the media
    * queries read an opaque-binary-column table exactly the way a
    * production pipeline reads a media lakehouse table. The read is
    * repartitioned so the downstream mapPartitions codec work fans out
    * instead of serializing on the single small-file scan partition.
    */
  def fromFixtureOr(spark: SparkSession, path: String, partitions: Int = 8)(
      gen: => Dataset[Media]): Dataset[Media] = {
    import spark.implicits._
    if (new java.io.File(path).isDirectory)
      spark.read.schema(implicitly[org.apache.spark.sql.Encoder[Media]].schema)
        .parquet(path).as[Media].repartition(partitions, col("media_id"))
    else gen
  }

  /** Deterministic synthetic media corpus (seeded by media_id) for testing
    * the plumbing at any scale — generated distributed, not on the driver.
    */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val rnd = new scala.util.Random(id) // deterministic per id
      val kind = Seq("image", "audio", "video")((((id % 3) + 3) % 3).toInt)
      val size = 256 + rnd.nextInt(1024)
      val bytes = new Array[Byte](size)
      rnd.nextBytes(bytes)
      val meta = kind match {
        case "image" => MediaMeta("png", Some(64 + rnd.nextInt(192)), Some(64 + rnd.nextInt(192)), None, None)
        case "audio" => MediaMeta("wav", None, None, Some(16000), Some(1000L + rnd.nextInt(60000)))
        case _       => MediaMeta("mp4", Some(320), Some(240), None, Some(1000L + rnd.nextInt(60000)))
      }
      Media(id, kind, bytes, meta)
    }
  }

  // ------------------------------------------------------------------ stubs

  /** STUB image decode: a real implementation would initialize a codec per
    * partition and decode each payload; this fake derives deterministic
    * "pixels" from the payload bytes so the pipeline shape is testable.
    */
  private def stubDecode(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    // long math: width*height overflows Int for large (schema-unbounded)
    // dimensions; empty payloads decode to an empty buffer, not a crash
    val n = math.min(math.max(width.toLong, 0L) * math.max(height.toLong, 0L), 4096L).toInt
    if (content.isEmpty) return new Array[Byte](0)
    val out = new Array[Byte](n)
    var i = 0
    while (i < out.length) {
      out(i) = (content(i % content.length) ^ (i & 0x7f)).toByte
      i += 1
    }
    out
  }

  /** STUB feature extraction: derives a deterministic unit-normalized
    * 64-dim float vector from payload bytes (a real impl would run a model
    * forward pass per batch).
    */
  private def stubFeature(content: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var h = 1125899906842597L
      var j = i
      while (j < content.length) { h = h * 31 + content(j); j += dim }
      v(i) = ((h % 2048) / 1024.0f) - 1.0f
      i += 1
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) v.map(_ / n) else v
  }

  // ----------------------------------------------------------- operators

  /** Decode image payloads → pixel buffers. mapPartitions so codec init
    * happens once per partition (the real-world constraint this plumbing
    * must preserve); non-images pass through as empty iterators.
    */
  def decodeImages(media: Dataset[Media]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.acquire() — once per partition
      rows.collect {
        case m if m.kind == "image" =>
          // meta is nullable in the declared schema — treat a missing
          // struct like missing dimensions
          val meta = Option(m.meta)
          val w = meta.flatMap(_.width).getOrElse(64)
          val h = meta.flatMap(_.height).getOrElse(64)
          DecodedImage(m.media_id, w, h, 3, stubDecode(m.content, w, h))
      }
    }
  }

  /** Extract a fixed-dim feature vector per media row (any kind). Output
    * feeds directly into [[graft.operators.Similarity]] ANN / dedup.
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(m => MediaFeature(m.media_id, m.kind, stubFeature(m.content, dim)))
    }
  }

  /** Sample up to `maxFrames` evenly-spaced frames per video. STUB slices
    * the payload; the real path is [[sampleFramesIO]], whose injectable
    * [[FrameDecoder]] is where a real mp4/avi codec plugs in (the GIF
    * decoder ships as the working instance). One row in, N rows out —
    * the generator (flatMap) shape.
    */
  def sampleFrames(media: Dataset[Media], maxFrames: Int = 4): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.min(maxFrames, math.max(1, m.content.length / 256))
      (0 until n).map { i =>
        val start = i * (m.content.length / n)
        VideoFrame(m.media_id, i, m.content.slice(start, math.min(start + 256, m.content.length)))
      }
    }
  }

  // ------------------------------------------------- real image codec path

  case class ImageHash(media_id: Long, ahash: Long)

  /** Deterministic synthetic PNG corpus: real, decodable PNG payloads
    * (patterned from a per-image seed). `dupEvery` makes image i a pixel-
    * identical duplicate of image i−1 when i % dupEvery == 0 — planted
    * clusters for the image-dedup tests. Generated distributed.
    */
  def syntheticImages(spark: SparkSession, n: Int, size: Int = 32,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val seed: Long = if (dupEvery > 0 && id % dupEvery == 0 && id > 0) id - 1 else id
      val rnd = new scala.util.Random(seed)
      val img = new java.awt.image.BufferedImage(
        size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) { img.setRGB(x, y, rnd.nextInt() & 0xffffff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Media(id, "image", bos.toByteArray,
        MediaMeta("png", Some(size), Some(size), None, None))
    }
  }

  /** REAL image decode via the JDK's ImageIO readers: payload bytes →
    * packed RGB (3 bytes/pixel, row-major). Rows no reader accepts are
    * dropped rather than failing the job — at corpus scale undecodable
    * blobs are data, not errors. mapPartitions keeps the one-reader-
    * spin-up-per-partition batch shape.
    */
  def decodeImagesIO(media: Dataset[Media]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        if (m.kind != "image") None
        else decodeBuffered(m.content).map { img =>
          val w = img.getWidth; val h = img.getHeight
          val px = new Array[Byte](w * h * 3)
          var i = 0; var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              px(i) = ((rgb >> 16) & 0xff).toByte
              px(i + 1) = ((rgb >> 8) & 0xff).toByte
              px(i + 2) = (rgb & 0xff).toByte
              i += 3; x += 1
            }
            y += 1
          }
          DecodedImage(m.media_id, w, h, 3, px)
        }
      }
    }
  }

  private def decodeBuffered(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  /** g×g mean-luma grid of a decoded image (box-averaged, integer cell
    * assignment — deterministic, no interpolation variance). The shared
    * kernel under [[imageAHash]] and [[imageGridFeatures]].
    */
  private def lumaGrid(img: java.awt.image.BufferedImage, g: Int): Array[Double] = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](g * g)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val gy = y * g / h
      var x = 0
      while (x < w) {
        val gx = x * g / w
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val c = gy * g + gx
        sums(c) += lum; counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(g * g)(i => if (counts(i) > 0) sums(i) / counts(i) else 0.0)
  }

  /** 64-bit perceptual average-hash: 8×8 mean-luma grid, bit i set iff
    * cell i is brighter than the grid mean. Pixel-identical images hash
    * identically; small perturbations move few bits — so Hamming distance
    * is a near-duplicate metric, exactly the contract
    * [[graft.operators.Dedup.signatureLosers]] needs. Undecodable rows
    * are dropped.
    */
  def imageAHash(media: Dataset[Media]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        if (m.kind != "image") None
        else decodeBuffered(m.content).map { img =>
          val grid = lumaGrid(img, 8)
          val mean = grid.sum / grid.length
          var bits = 0L; var i = 0
          while (i < 64) { if (grid(i) > mean) bits |= (1L << i); i += 1 }
          ImageHash(m.media_id, bits)
        }
      }
    }
  }

  /** Real image embedding: unit-normalized g×g mean-luma grid (the
    * classic pre-neural perceptual feature) — feeds the ANN operators
    * like any other embedding column.
    */
  def imageGridFeatures(media: Dataset[Media], grid: Int = 8): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        if (m.kind != "image") None
        else decodeBuffered(m.content).map { img =>
          val g = lumaGrid(img, grid).map(_.toFloat)
          val n = math.sqrt(g.map(x => x.toDouble * x).sum).toFloat
          MediaFeature(m.media_id, "image", if (n > 0) g.map(_ / n) else g)
        }
      }
    }
  }

  /** Near-duplicate IMAGE dedup, keep-smallest-id: decode → average-hash →
    * [[graft.operators.Dedup.signatureLosers]] (exact-hash collapse +
    * pigeonhole-chunk Hamming ≤ maxDist) → anti-join. The whole pipeline
    * runs on real pixels; undecodable rows are never losers (they carry
    * no signature) and survive.
    */
  def imageDedupByAHash(media: Dataset[Media], maxDist: Int = 3): Dataset[Media] = {
    import media.sparkSession.implicits._
    val sigs = imageAHash(media).toDF()
      .select(col("media_id").as("_id"), col("ahash").as("_sig"))
    val losers = graft.operators.Dedup.signatureLosers(sigs, maxDist)
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  // -------------------------------------------------- real audio codec path

  case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Int,
      samples: Array[Float])
  case class AudioHash(media_id: Long, fp: Long)

  /** Deterministic synthetic PCM-WAV corpus: real, decodable WAV payloads
    * (a seeded mixture of 1–3 sine tones, 16-bit mono). `dupEvery` plants
    * sample-identical duplicates like [[syntheticImages]].
    */
  def syntheticWavs(spark: SparkSession, n: Int, sampleRate: Int = 8000,
      durationMs: Int = 200, dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val seed: Long = if (dupEvery > 0 && id % dupEvery == 0 && id > 0) id - 1 else id
      val rnd = new scala.util.Random(seed)
      val nTones = 1 + rnd.nextInt(3)
      val tones = Seq.fill(nTones)((220.0 + rnd.nextInt(1200), 0.2 + rnd.nextDouble() * 0.5))
      val nSamp = sampleRate * durationMs / 1000
      val pcm = new Array[Byte](nSamp * 2)
      var i = 0
      while (i < nSamp) {
        val t = i.toDouble / sampleRate
        val x = tones.map { case (f, a) => a * math.sin(2 * math.Pi * f * t) }.sum / nTones
        val s = (x * 28000).toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamp.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      Media(id, "audio", bos.toByteArray,
        MediaMeta("wav", None, None, Some(sampleRate), Some(durationMs.toLong)))
    }
  }

  /** REAL audio decode via the JDK's javax.sound.sampled (WAV/PCM readers
    * ship with java.desktop): payload → float samples in [−1, 1].
    * 16-bit little-endian mono PCM supported (the synthetic corpus shape);
    * anything the reader rejects is dropped, not fatal.
    */
  def decodeAudioIO(media: Dataset[Media]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        if (m.kind != "audio") None
        else decodePcm(m.content).map { case (rate, samples) =>
          DecodedAudio(m.media_id, rate, samples.length, samples)
        }
      }
    }
  }

  private def decodePcm(bytes: Array[Byte]): Option[(Int, Array[Float])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian) None
      else {
        val data = ais.readAllBytes()
        val out = new Array[Float](data.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = (((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort / 32768.0f)
          i += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch { case _: Exception => None }

  /** Per-frame RMS energies over `nFrames` equal slices — the shared
    * kernel under the fingerprint and the feature vector.
    */
  private def frameEnergies(samples: Array[Float], nFrames: Int): Array[Double] = {
    val out = new Array[Double](nFrames)
    if (samples.isEmpty) return out
    var f = 0
    while (f < nFrames) {
      val lo = (f.toLong * samples.length / nFrames).toInt
      val hi = ((f + 1).toLong * samples.length / nFrames).toInt
      var s = 0.0; var i = lo
      while (i < hi) { s += samples(i).toDouble * samples(i); i += 1 }
      out(f) = if (hi > lo) math.sqrt(s / (hi - lo)) else 0.0
      f += 1
    }
    out
  }

  /** 64-bit audio fingerprint: bit i = energy(frame i+1) > energy(frame i)
    * over 65 frames (the classic energy-delta sign hash). Sample-identical
    * clips fingerprint identically; small perturbations flip few bits —
    * Hamming distance is the near-dup metric for
    * [[graft.operators.Dedup.signatureLosers]], exactly like the image
    * average-hash.
    */
  def audioFingerprint(media: Dataset[Media]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        if (m.kind != "audio") None
        else decodePcm(m.content).map { case (_, samples) =>
          val e = frameEnergies(samples, 65)
          var bits = 0L; var i = 0
          while (i < 64) { if (e(i + 1) > e(i)) bits |= (1L << i); i += 1 }
          AudioHash(m.media_id, bits)
        }
      }
    }
  }

  /** Real audio embedding: unit-normalized per-frame RMS energy profile
    * (`dim` frames) — ANN-ready like the image luma grid.
    */
  def audioEnergyFeatures(media: Dataset[Media], dim: Int = 32): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        if (m.kind != "audio") None
        else decodePcm(m.content).map { case (_, samples) =>
          val e = frameEnergies(samples, dim).map(_.toFloat)
          val n = math.sqrt(e.map(x => x.toDouble * x).sum).toFloat
          MediaFeature(m.media_id, "audio", if (n > 0) e.map(_ / n) else e)
        }
      }
    }
  }

  /** Near-duplicate AUDIO dedup, keep-smallest-id, on real decoded
    * samples — same staging as [[imageDedupByAHash]].
    */
  def audioDedupByFingerprint(media: Dataset[Media], maxDist: Int = 3): Dataset[Media] = {
    import media.sparkSession.implicits._
    val sigs = audioFingerprint(media).toDF()
      .select(col("media_id").as("_id"), col("fp").as("_sig"))
    val losers = graft.operators.Dedup.signatureLosers(sigs, maxDist)
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  // -------------------------------------------------- real video (GIF) path

  /** Deterministic synthetic animated-GIF corpus: real multi-frame GIF
    * payloads (seeded block patterns per frame) written with the JDK's
    * ImageIO sequence writer. `dupEvery` plants frame-identical
    * duplicates like the image/audio generators.
    */
  def syntheticGifs(spark: SparkSession, n: Int, size: Int = 16, frames: Int = 6,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val seed: Long = if (dupEvery > 0 && id % dupEvery == 0 && id > 0) id - 1 else id
      val rnd = new scala.util.Random(seed)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val w = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // 4×4 black/white blocks: GIF is palette-quantized, so block
        // patterns (not per-pixel noise) survive the encode bit-exactly
        var by = 0
        while (by < size) {
          var bx = 0
          while (bx < size) {
            val c = if (rnd.nextBoolean()) 0xffffff else 0x000000
            var y = by
            while (y < math.min(by + 4, size)) {
              var x = bx
              while (x < math.min(bx + 4, size)) { img.setRGB(x, y, c); x += 1 }
              y += 1
            }
            bx += 4
          }
          by += 4
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      w.endWriteSequence(); ios.close(); w.dispose()
      Media(id, "video", bos.toByteArray,
        MediaMeta("gif", Some(size), Some(size), None, Some(frames * 100L)))
    }
  }

  /** Deterministic synthetic MJPEG-AVI corpus: real, decodable AVI
    * payloads ([[VideoContainers.buildAviMjpeg]] containers holding
    * ImageIO-encoded JPEG frames with seeded block patterns). `dupEvery`
    * plants byte-identical duplicates like the other generators; JPEG is
    * lossy, but identical inputs encode identically, so planted dups
    * decode pixel-identical and collapse under the frame hash.
    */
  def syntheticAvis(spark: SparkSession, n: Int, size: Int = 16, frames: Int = 6,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val seed: Long = if (dupEvery > 0 && id % dupEvery == 0 && id > 0) id - 1 else id
      val content = VideoContainers.buildAviMjpeg(jpegBlockFrames(seed, size, frames), size, size)
      Media(id, "video", content,
        MediaMeta("avi", Some(size), Some(size), None, Some(frames * 100L)))
    }
  }

  /** Deterministic synthetic MJPEG-mp4 corpus —
    * [[VideoContainers.buildMp4Mjpeg]] form of [[syntheticAvis]]. */
  def syntheticMp4s(spark: SparkSession, n: Int, size: Int = 16, frames: Int = 6,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val seed: Long = if (dupEvery > 0 && id % dupEvery == 0 && id > 0) id - 1 else id
      val content = VideoContainers.buildMp4Mjpeg(jpegBlockFrames(seed, size, frames), size, size)
      Media(id, "video", content,
        MediaMeta("mp4", Some(size), Some(size), None, Some(frames * 100L)))
    }
  }

  /** Deterministic synthetic H.264 mp4 corpus (`avc1`): a REAL container
    * with a REAL avcC/SPS/PPS ([[H264.writeSps]] — parseable back to the
    * declared dimensions) and AVCC-framed access units whose SLICE bytes
    * are seeded pseudo-entropy (actual CABAC payload generation would
    * need an encoder — and the operators under test never entropy-decode
    * slices, by design). Structure per video: `frames` samples, IDR sync
    * samples every 4 starting at 1 (SPS/PPS prepended in-band like real
    * encoders emit), non-IDR type-1 slices between. `dupEvery` plants
    * byte-identical duplicates for the keyframe-hash dedup tests.
    */
  def syntheticAvcMp4s(spark: SparkSession, n: Int, frames: Int = 8,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val seed: Long = if (dupEvery > 0 && id % dupEvery == 0 && id > 0) id - 1 else id
      val rnd = new scala.util.Random(seed)
      val width = 320 + 16 * (seed % 4).toInt
      val height = 240 + 16 * (seed % 3).toInt
      val sps = H264.writeSps(width, height)
      val pps = H264.writePps()
      def avccNal(header: Int, payload: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream(payload.length + 5)
        val len = payload.length + 1
        b.write(len >> 24); b.write((len >> 16) & 0xff)
        b.write((len >> 8) & 0xff); b.write(len & 0xff)
        b.write(header)
        b.write(payload, 0, payload.length)
        b.toByteArray
      }
      def sliceBytes(): Array[Byte] = {
        val p = new Array[Byte](64 + rnd.nextInt(192))
        rnd.nextBytes(p)
        p
      }
      val syncSamples = (1 to frames by 4).toSeq
      val samples = (1 to frames).map { s =>
        val b = new java.io.ByteArrayOutputStream()
        def add(a: Array[Byte]): Unit = b.write(a, 0, a.length)
        if (syncSamples.contains(s)) {
          add(avccNal(0x67, sps)); add(avccNal(0x68, pps))
          add(avccNal(0x65, sliceBytes())) // IDR slice, nal_ref_idc=3
        } else add(avccNal(0x41, sliceBytes())) // non-IDR slice
        b.toByteArray
      }
      val content = VideoContainers.buildMp4Avc(
        samples, syncSamples, sps, pps, width, height)
      Media(id, "video", content,
        MediaMeta("mp4", Some(width), Some(height), None, Some(frames * 100L)))
    }
  }

  /** Synthetic avc1 mp4s whose keyframes are REAL decodable H.264 CAVLC
    * I_16x16 pictures ([[H264Encode.encodeI16x16Dc]]) — 3 IDR sync
    * samples of a 64×64 per-seed brightness pattern. Every `dupEvery`-th
    * video is a PIXEL near-duplicate of its predecessor: per-MB ±2
    * brightness jitter re-encodes to DIFFERENT bytes (so compressed-
    * domain keyframe-hash dedup cannot collapse it) while the decoded
    * frames aHash within a couple of bits. Distinct seeds differ in at
    * least one 130-level cell (the pattern embeds the seed's bits), so
    * non-dup videos are ≥4 aHash bits apart by construction.
    */
  def syntheticAvcPixelMp4s(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(id) // jitter keyed by id, not seed
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup) rnd.nextInt(5) - 2 else 0)
      }
      val annexB = H264Encode.encodeI16x16Dc(mbMeans)._1
      val nals = H264.nalUnitsAnnexB(annexB)
      val sps = nals.find(_.nalType == 7).get.payload
      val pps = nals.find(_.nalType == 8).get.payload
      val idr = nals.find(_.nalType == 5).get.payload
      val sample = {
        val b = new java.io.ByteArrayOutputStream(idr.length + 5)
        val len = idr.length + 1
        b.write(len >> 24); b.write((len >> 16) & 0xff)
        b.write((len >> 8) & 0xff); b.write(len & 0xff)
        b.write(0x65) // IDR, nal_ref_idc 3
        b.write(idr, 0, idr.length)
        b.toByteArray
      }
      val content = VideoContainers.buildMp4Avc(
        Seq(sample, sample, sample), Seq(1, 2, 3), sps, pps, 64, 64)
      Media(id, "video", content, MediaMeta("mp4", Some(64), Some(64), None, Some(300L)))
    }
  }

  /** Synthetic avc1 mp4 corpus where the ENTROPY CODING alternates:
    * even ids CAVLC, odd ids CABAC (same I_16x16-DC content machinery,
    * [[H264Encode.encodeI16x16Dc]] vs [[H264Encode.encodeCabacI16x16Dc]]
    * — the r8 CABAC intra tier's corpus face). Planted structure: every
    * `dupEvery`-th video (id > 0) is a pixel near-dup of its
    * predecessor, and because coding parity alternates, every planted
    * pair is CROSS-ENTROPY — one side CAVLC, one CABAC. Byte- and
    * keyframe-hash dedup can NEVER collapse such a pair (different
    * entropy coder ⇒ different bytes), even for the ids ≡ 0 (mod
    * 2·dupEvery) pairs whose pixels are IDENTICAL (zero jitter); the
    * pixel-decode path must collapse them all. That asymmetry is the
    * whole point of decoding past the entropy layer.
    */
  def syntheticAvcEntropyMp4s(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val exact = isDup && id % (2L * dupEvery) == 0 // pixel-IDENTICAL dup
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(id)
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup && !exact) rnd.nextInt(5) - 2 else 0)
      }
      val annexB =
        if (id % 2 == 1) H264Encode.encodeCabacI16x16Dc(mbMeans)._1
        else H264Encode.encodeI16x16Dc(mbMeans)._1
      val nals = H264.nalUnitsAnnexB(annexB)
      val sps = nals.find(_.nalType == 7).get.payload
      val pps = nals.find(_.nalType == 8).get.payload
      val idr = nals.find(_.nalType == 5).get.payload
      val sample = {
        val b = new java.io.ByteArrayOutputStream(idr.length + 5)
        val len = idr.length + 1
        b.write(len >> 24); b.write((len >> 16) & 0xff)
        b.write((len >> 8) & 0xff); b.write(len & 0xff)
        b.write(0x65)
        b.write(idr, 0, idr.length)
        b.toByteArray
      }
      val content = VideoContainers.buildMp4Avc(
        Seq(sample, sample, sample), Seq(1, 2, 3), sps, pps, 64, 64)
      Media(id, "video", content, MediaMeta("mp4", Some(64), Some(64), None, Some(300L)))
    }
  }

  /** Synthetic raw Annex-B H.264 streams with MOTION: an I_16x16 IDR
    * picture plus two P_L0_16x16 pictures panning by a per-video
    * quarter-pel vector — the corpus the r8 inter-decode tier exists
    * for. Two planted structures (both deterministic):
    *
    *  - every `dupEvery`-th video is a PIXEL near-duplicate of its
    *    predecessor: per-MB ±2 jitter + a different qp re-encode the
    *    SAME content (same pattern, same motion) to different bytes;
    *  - every id ≡ 3 (mod `kfCloneEvery`) video shares its
    *    predecessor's IDR content BYTE-FOR-BYTE but pans differently
    *    (≥8 px/frame vs ≤2.5 px) — keyframe-only dedup WRONGLY
    *    collapses these; frame-sequence dedup must keep them.
    */
  def syntheticAvcMotionStreams(spark: SparkSession, n: Int,
      dupEvery: Int = 10, kfCloneEvery: Int = 7,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      // a clone must share its predecessor's EXACT keyframe encode, so
      // predecessors that are themselves jittered dups are excluded
      val isKfClone = !isDup && kfCloneEvery > 0 && id % kfCloneEvery == 3 &&
        id > 0 && !(dupEvery > 0 && (id - 1) % dupEvery == 0 && id - 1 > 0)
      val seed: Long = if (isDup || isKfClone) id - 1 else id
      val rnd = new scala.util.Random(id)
      val qp = if (isDup) 24 else 26
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup) rnd.nextInt(5) - 2 else 0)
      }
      val idr = H264Encode.encodeI16x16Dc(mbMeans, qp)._1
      // motion: dups reuse the ORIGINAL's pan (same content in motion);
      // keyframe clones get a large distinct pan (≥ 8 px/frame)
      val panId: Long = if (isDup) id - 1 else id
      val panRnd = new scala.util.Random(panId * 31 + 7)
      val (mvx, mvy) =
        if (isKfClone) (32 + 8 * (id % 3).toInt, if (id % 2 == 0) 40 else -40)
        else (panRnd.nextInt(21) - 10, panRnd.nextInt(21) - 10)
      val mvs = Array.fill(4, 4)((mvx, mvy))
      val content = idr ++ H264Encode.annexB(Seq(
        (1, 3, H264Encode.encodeP16x16(mvs, qp)),
        (1, 3, H264Encode.encodeP16x16(mvs, qp))))
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(300L)))
    }
  }

  /** Motion corpus where the ENTROPY CODING alternates per id (even
    * CAVLC, odd CABAC with cabac_init_idc cycling (id/2) % 3 — all
    * three P init columns are live in the corpus): an I_16x16 IDR plus
    * two P_L0_16x16 pans, the r9 CABAC inter tier's corpus face.
    * Every `dupEvery`-th video (id > 0) re-encodes its PREDECESSOR's
    * content and motion (±2 jitter, different qp; ids ≡ 0 mod
    * 2·dupEvery re-encode exactly — pixel-IDENTICAL), and because the
    * coding parity alternates, every planted pair is CROSS-ENTROPY
    * CODED MOTION: one side's pan lives in CAVLC se(v) mvds, the
    * other's in CABAC UEG3 bins, so compressed-domain (byte /
    * keyframe-hash) dedup can never collapse a pair — only decoding
    * BOTH entropy tiers through motion compensation to pixels can
    * (H264PipelineSpec pins both halves of the asymmetry).
    */
  def syntheticAvcMotionEntropyStreams(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val exact = isDup && id % (2L * dupEvery) == 0 // pixel-IDENTICAL dup
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(id)
      val qp = if (isDup && !exact) 24 else 26
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup && !exact) rnd.nextInt(5) - 2 else 0)
      }
      val panRnd = new scala.util.Random(seed * 31 + 7)
      val mv = (panRnd.nextInt(21) - 10, panRnd.nextInt(21) - 10)
      val mvs = Array.fill(4, 4)(mv)
      val cabac = id % 2 == 1
      val content =
        if (cabac) {
          val idc = ((id / 2) % 3).toInt
          H264Encode.encodeCabacI16x16Dc(mbMeans, qp)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeCabacP16x16(mvs, qp, idc)),
              (1, 3, H264Encode.encodeCabacP16x16(mvs, qp, idc))))
        } else {
          H264Encode.encodeI16x16Dc(mbMeans, qp)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeP16x16(mvs, qp)),
              (1, 3, H264Encode.encodeP16x16(mvs, qp))))
        }
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(300L)))
    }
  }

  /** Synthetic raw Annex-B H.264 streams with a BI-PREDICTIVE GOP —
    * IDR(poc 0, display first) + P(poc 4, reference) + B(poc 2,
    * NON-reference, between them in display order) — the r9 B tier's
    * corpus face. Each B macroblock cycles direction L0 / L1 / BiPred
    * (seed-keyed), so the middle display frame exists only through
    * list-resolved, possibly-averaged motion compensation against BOTH
    * neighbors; decode order (I, P, B) differs from display order
    * (I, B, P), exercising the POC-based reordering. Coding parity
    * alternates CAVLC / CABAC (cabac_init_idc cycling all three
    * columns), and every `dupEvery`-th video re-encodes its
    * predecessor's content/motion (±2 jitter, different qp; ids ≡ 0
    * mod 2·dupEvery exactly — pixel-IDENTICAL), making every planted
    * pair CROSS-ENTROPY: byte / keyframe-hash dedup collapses none;
    * only frame-SEQUENCE pixel decode through the B machinery can.
    */
  def syntheticAvcBidirStreams(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val exact = isDup && id % (2L * dupEvery) == 0 // pixel-IDENTICAL dup
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(id)
      val qp = if (isDup && !exact) 24 else 26
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup && !exact) rnd.nextInt(5) - 2 else 0)
      }
      val panRnd = new scala.util.Random(seed * 37 + 11)
      val mv = (panRnd.nextInt(17) - 8, panRnd.nextInt(17) - 8)
      val pMvs = Array.fill(4, 4)((mv._1 * 2, mv._2 * 2))
      // the B picture sits halfway along the pan: L0 (past) partitions
      // carry +mv, L1 (future) partitions −mv, BiPred averages both
      val bMbs: Array[Array[(Int, (Int, Int), (Int, Int))]] =
        Array.tabulate(4, 4) { (my, mx) =>
          val dir = ((mx + 2 * my + seed) % 3).toInt
          (dir, mv, (-mv._1, -mv._2))
        }
      val cabac = id % 2 == 1
      // every 4th SEED's B picture is all-B_Skip — keyed on the seed,
      // not the id, so a planted cross-entropy pair keeps identical B
      // content; the skip group alternates SPATIAL direct (colZeroFlag
      // live) and TEMPORAL direct (DistScaleFactor mv scaling)
      val bSkip = seed % 4 == 3
      val bSpatial = seed % 8 == 3
      val content =
        if (cabac) {
          val idc = ((id / 2) % 3).toInt
          H264Encode.encodeCabacI16x16Dc(mbMeans, qp)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeCabacP16x16(pMvs, qp, idc, poc = 4)),
              (1, 0,
                if (bSkip) H264Encode.encodeCabacBSkipFrame(4, 4, qp,
                  poc = 2, initIdc = idc, spatial = bSpatial)
                else H264Encode.encodeCabacB16x16(bMbs, qp, poc = 2,
                  initIdc = idc))))
        } else {
          H264Encode.encodeI16x16Dc(mbMeans, qp)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeP16x16(pMvs, qp, poc = 4)),
              (1, 0,
                if (bSkip) H264Encode.encodeBSkipFrame(4, 4, qp, poc = 2,
                  spatial = bSpatial)
                else H264Encode.encodeB16x16(bMbs, qp, poc = 2))))
        }
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(300L)))
    }
  }

  /** Synthetic raw Annex-B H.264 streams whose B picture is built
    * ENTIRELY of B_8x8 macroblocks (the r10 sub-partition tier): every
    * MB carries four sub_mb_types cycling all 12 non-direct Table 7-18
    * entries (8x8 / 8x4 / 4x8 / 4x4 × L0 / L1 / Bi), with whole-pel
    * per-sub-partition motion offsets on top of the seed-keyed pan —
    * the middle display frame is wrong unless sub-partition mv
    * prediction (plain medians, mid-MB C→D availability), per-list
    * resolution AND bi-prediction are right at 4x4 granularity. GOP
    * and dup-planting structure mirror [[syntheticAvcBidirStreams]]:
    * IDR(poc 0) + P(poc 4, ref) + B(poc 2, non-ref), parity
    * alternating CAVLC / CABAC (sub_mb_type rides ctx 36..39 on the
    * CABAC side), every planted near-dup pair cross-entropy.
    */
  def syntheticAvcB8x8Streams(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val exact = isDup && id % (2L * dupEvery) == 0 // pixel-IDENTICAL dup
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(id)
      val qp = if (isDup && !exact) 24 else 26
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup && !exact) rnd.nextInt(5) - 2 else 0)
      }
      val panRnd = new scala.util.Random(seed * 41 + 7)
      val mv = (panRnd.nextInt(17) - 8, panRnd.nextInt(17) - 8)
      val pMvs = Array.fill(4, 4)((mv._1 * 2, mv._2 * 2))
      // B sits halfway along the pan; each sub-partition adds a small
      // whole-pel offset so adjacent sub-partitions carry DISTINCT
      // motion (a sub-partition-collapse bug changes pixels)
      val bMbs: Array[Array[Seq[(Int, Seq[((Int, Int), (Int, Int))])]]] =
        Array.tabulate(4, 4) { (my, mx) =>
          (0 until 4).map { si =>
            val t = 1 + (((mx + 4 * my) * 4 + si + seed) % 12).toInt
            val (nParts, _, _, _) = H264Decode.bSubMbInfo(t)
            val mvs = (0 until nParts).map { j =>
              val dx = 4 * ((j + si) % 2)
              ((mv._1 + dx, mv._2), (-mv._1 + dx, -mv._2))
            }
            (t, mvs)
          }
        }
      val cabac = id % 2 == 1
      val content =
        if (cabac) {
          val idc = ((id / 2) % 3).toInt
          H264Encode.encodeCabacI16x16Dc(mbMeans, qp)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeCabacP16x16(pMvs, qp, idc, poc = 4)),
              (1, 0, H264Encode.encodeCabacB8x8(bMbs, qp, poc = 2,
                initIdc = idc))))
        } else {
          H264Encode.encodeI16x16Dc(mbMeans, qp)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeP16x16(pMvs, qp, poc = 4)),
              (1, 0, H264Encode.encodeB8x8(bMbs, qp, poc = 2))))
        }
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(300L)))
    }
  }

  /** Synthetic raw Annex-B H.264 streams exercising MULTI-REFERENCE
    * lists (the r11 ref_idx tier): SPS max_num_ref_frames = 3, decode
    * order IDR(poc 0) + P1(poc 2, single-ref pan) + P2(poc 8,
    * num_ref_idx_l0_active = 2, checkerboard ref_idx — half the MBs
    * continue the pan from P1 (ref 0), half CUT BACK to the IDR
    * (ref 1, zero motion: the flicker/loop pattern real encoders use
    * long-term style back-references for) + B(poc 4, L0 = [P1, IDR],
    * ref_idx_l0 alternating). Every 4th seed's B is all-B_Skip with
    * num_ref_idx_l0_active = 2 — alternating TEMPORAL direct (whose
    * §8.4.1.2.3 refIdxL0 must map each co-located P2 block's reference
    * through P2's OWN list: blocks that referenced the IDR scale by
    * td = 8, blocks that referenced P1 by td = 6) and SPATIAL direct.
    * The 4-frame display sequence is wrong unless te(v)/CABAC ref_idx
    * parsing, ref-MATCHED mv prediction, DPB > 2 retention and the
    * col-reference mapping all hold. Dup planting and entropy parity
    * mirror [[syntheticAvcBidirStreams]]: every planted near-dup pair
    * is cross-entropy, so byte/keyframe hashing collapses none.
    */
  def syntheticAvcMultiRefStreams(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val exact = isDup && id % (2L * dupEvery) == 0 // pixel-IDENTICAL dup
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(id)
      val qp = if (isDup && !exact) 24 else 26
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup && !exact) rnd.nextInt(5) - 2 else 0)
      }
      val panRnd = new scala.util.Random(seed * 53 + 19)
      val mv = (panRnd.nextInt(17) - 8, panRnd.nextInt(17) - 8)
      val p1Mvs = Array.fill(4, 4)((mv._1 * 2, mv._2 * 2))
      // P2: seed-keyed checkerboard phase — ref 0 = P1 (pan continues),
      // ref 1 = the IDR (cut back, zero motion)
      val p2Mbs: Array[Array[(Int, (Int, Int))]] =
        Array.tabulate(4, 4) { (my, mx) =>
          if ((mx + my + seed) % 2 == 0) (0, (mv._1 * 2, mv._2 * 2))
          else (1, (0, 0))
        }
      val bSkip = seed % 4 == 3
      val bSpatial = seed % 8 == 3
      // non-skip B: dir cycles L0/L1/Bi, ref_idx_l0 alternates P1/IDR
      val bMbs: Array[Array[(Int, (Int, (Int, Int)), (Int, (Int, Int)))]] =
        Array.tabulate(4, 4) { (my, mx) =>
          val dir = ((mx + 2 * my + seed) % 3).toInt
          val r0 = ((mx + my + seed) % 2).toInt
          (dir, (r0, mv), (0, (-mv._1, -mv._2)))
        }
      val cabac = id % 2 == 1
      val content =
        if (cabac) {
          val idc = ((id / 2) % 3).toInt
          H264Encode.encodeCabacI16x16Dc(mbMeans, qp, numRefFrames = 3)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeCabacP16x16(p1Mvs, qp, idc, poc = 2)),
              (1, 3, H264Encode.encodeCabacP16x16MultiRef(p2Mbs, 2, qp,
                initIdc = idc, poc = 8)),
              (1, 0,
                if (bSkip) H264Encode.encodeCabacBSkipFrame(4, 4, qp,
                  poc = 4, initIdc = idc, spatial = bSpatial, numRef0 = 2)
                else H264Encode.encodeCabacB16x16MultiRef(bMbs, 2, 1, qp,
                  poc = 4, initIdc = idc))))
        } else {
          H264Encode.encodeI16x16Dc(mbMeans, qp, numRefFrames = 3)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeP16x16(p1Mvs, qp, poc = 2)),
              (1, 3, H264Encode.encodeP16x16MultiRef(p2Mbs, 2, qp, poc = 8)),
              (1, 0,
                if (bSkip) H264Encode.encodeBSkipFrame(4, 4, qp, poc = 4,
                  spatial = bSpatial, numRef0 = 2)
                else H264Encode.encodeB16x16MultiRef(bMbs, 2, 1, qp,
                  poc = 4))))
        }
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(400L)))
    }
  }

  /** Synthetic raw Annex-B H.264 streams encoding a FADE — IDR + two
    * explicit-weighted P pictures (zero motion, §8.4.2.3.3 luma
    * scale/offset per step, `weighted_pred_flag` PPS) — the r10
    * weighted-prediction tier's corpus face. A fade is pure weighting:
    * frames 2-3 carry NO residual and NO motion, so their pixels exist
    * only through the pred_weight_table transform; a decoder that
    * ignores the table reproduces frame 1 three times and near-dups
    * every fade to every other fade of the same base content. Parity
    * alternates CAVLC / CABAC (the table itself is slice-header
    * Exp-Golomb — shared — so the differential certifies the weighted
    * MC composition, while the planted pairs stay CROSS-ENTROPY at the
    * byte level: hashing collapses none).
    */
  def syntheticAvcFadeStreams(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val exact = isDup && id % (2L * dupEvery) == 0 // pixel-IDENTICAL dup
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(id)
      val qp = if (isDup && !exact) 24 else 26
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        val c = my * 4 + mx
        val base = 60 + (if (((seed >> c) & 1L) == 1L) 130 else 0)
        base + (if (isDup && !exact) rnd.nextInt(5) - 2 else 0)
      }
      // seed-keyed fade step: luma scale 40..48 of 64 plus a small
      // offset — two steps compound (frame3 ≈ scale² of the IDR)
      val fw = 40 + (seed % 3).toInt * 4
      val fo = (seed % 5).toInt - 2
      val weights = H264Encode.PredWeights(6, 5, Seq(
        H264Encode.ListWeights(fw, fo, 32, 0, 32, 0)))
      val zeroMv = Array.fill(4, 4)((0, 0))
      val cabac = id % 2 == 1
      val content =
        if (cabac) {
          val idc = ((id / 2) % 3).toInt
          H264Encode.encodeCabacI16x16Dc(mbMeans, qp, weightedPred = true)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeCabacP16x16(zeroMv, qp, idc, poc = 2,
                weights = Some(weights))),
              (1, 3, H264Encode.encodeCabacP16x16(zeroMv, qp, idc, poc = 4,
                weights = Some(weights)))))
        } else {
          H264Encode.encodeI16x16Dc(mbMeans, qp, weightedPred = true)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeP16x16(zeroMv, qp, poc = 2,
                weights = Some(weights))),
              (1, 3, H264Encode.encodeP16x16(zeroMv, qp, poc = 4,
                weights = Some(weights)))))
        }
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(300L)))
    }
  }

  /** Synthetic hvc1 (H.265/HEVC) mp4s for the r10 HEVC PROBE tier:
    * real VPS/SPS/PPS from [[H265]]'s writers (seed-keyed coded
    * dimensions, conformance-window cropping exercised), one IRAP sync
    * sample plus two TRAIL samples per stream (length-prefixed
    * framing). Slice payloads are deterministic opaque bytes — HEVC
    * pixel decode is out of scope (FrameDecoder boundary), and the
    * KEYFRAME-hash dedup face never needs it: every `dupEvery`-th
    * video shares its predecessor's IRAP payload byte-for-byte while
    * its TRAIL samples differ, so whole-file byte hashing collapses
    * none of the planted pairs and keyframe extraction collapses all.
    */
  def syntheticHevcMp4s(spark: SparkSession, n: Int,
      dupEvery: Int = 10, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = dupEvery > 0 && id % dupEvery == 0 && id > 0
      val seed: Long = if (isDup) id - 1 else id
      // seed-keyed dims with a non-multiple-of-8 height: the SPS writes
      // a conformance window, so the probe path exercises the crop
      val width = 64 + 8 * (seed % 5).toInt
      val height = 44 + 2 * (seed % 7).toInt
      def payload(tag: Long, len: Int): Array[Byte] = {
        val rnd = new scala.util.Random(tag)
        Array.fill(len)(rnd.nextInt(256).toByte)
      }
      def sample(nalType: Int, body: Array[Byte]): Array[Byte] = {
        val nal = H265.nalHeader(nalType) ++ body
        Array[Byte]((nal.length >> 24).toByte, (nal.length >> 16).toByte,
          (nal.length >> 8).toByte, nal.length.toByte) ++ nal
      }
      val idr = sample(H265.NalIdrWRadl, payload(seed * 131 + 7, 96))
      val t1 = sample(H265.NalTrailR, payload(id * 977 + 13, 64))
      val t2 = sample(H265.NalTrailR, payload(id * 977 + 14, 64))
      val content = VideoContainers.buildMp4Hevc(
        Seq(idr, t1, t2), syncSamples = Seq(1),
        H265.writeVps(), H265.writeSps(width, height), H265.writePps(),
        width, height)
      Media(id, "video", content,
        MediaMeta("hevc", Some(width), Some(height), None, Some(300L)))
    }
  }

  /** 8×8 average hash straight from a decoded luma plane (no PNG round
    * trip): cell means over an 8×8 grid, bit = cell ≥ global mean.
    */
  def aHash64OfLuma(luma: Array[Byte], stride: Int, w: Int, h: Int): Long = {
    val cells = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
        val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
        var s = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += luma(y * stride + x) & 0xff; x += 1 }
          y += 1
        }
        cells(cy * 8 + cx) = s / math.max(1, (x1 - x0) * (y1 - y0))
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / 64
    var bits = 0L; var i = 0
    while (i < 64) { if (cells(i) >= mean) bits |= (1L << i); i += 1 }
    bits
  }

  case class FrameSeqSig(media_id: Long, hs: Array[Long])

  /** Near-duplicate video dedup over the FULL decoded frame sequence
    * (IDR + inter pictures via [[H264Decode.decodeAnnexBPictures]] — the
    * r8 P-slice tier): two videos are near-dups iff EVERY aligned frame
    * pair aHashes within `maxDist` bits. Keyframe-only hashing cannot
    * express this — videos sharing a first frame but diverging in
    * motion collapse there and must NOT here (the generator plants
    * exactly that case). Scale shape: per-video signatures are `frames`
    * longs computed in one mapPartitions decode pass; candidates come from
    * the pigeonhole chunk equi-join on the FIRST frame's hash (any pair
    * within maxDist shares one of maxDist+1 chunks) against per-bucket
    * min ids; verification checks all frames. Videos with fewer than
    * `frames` decodable pictures survive unconditionally (undecodable
    * content is data, not an error).
    */
  def videoDedupByFrameSeqHash(media: Dataset[Media], frames: Int = 3,
      maxDist: Int = 3): Dataset[Media] = {
    import media.sparkSession.implicits._
    require(frames >= 1 && frames <= 16, s"bad frame count $frames")
    val sigs = media.mapPartitions { it =>
      it.filter(_.kind == "video").flatMap { m =>
        val fs = H264Decode.decodeAnnexBPictures(m.content, frames)
        if (fs.size < frames) None
        else Some(FrameSeqSig(m.media_id, fs.take(frames).map(f =>
          aHash64OfLuma(f.luma, f.lumaStride, f.width, f.height)).toArray))
      }
    }.toDF()
    val chunks = maxDist + 1
    val width = 64 / chunks
    val banded = sigs.select(col("media_id"), col("hs"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftrightunsigned", element_at(col("hs"), 1),
          c * width).bitwiseAND(lit((1L << width) - 1)))))
      .withColumnsRenamed(Map("pos" -> "_chunk", "col" -> "_ckey"))
    // COMPLETE in-bucket pair generation (not the bucket-min shortcut:
    // an unrelated smaller id sharing one 16-bit chunk would steal the
    // candidate slot and a true near-dup pair would go unverified);
    // in-bucket fan-out is quadratic only within chunk buckets, which a
    // 100 TB deployment df-caps exactly like ngramJaccardPairs.
    // Verification compares EVERY aligned frame pair (zip_with over the
    // signature arrays — r11 generalized the 3-long schema to N frames).
    val losers = banded
      .join(banded.select(col("_chunk"), col("_ckey"),
        col("media_id").as("_w"), col("hs").as("_whs")), Seq("_chunk", "_ckey"))
      .filter(col("_w") < col("media_id"))
      .filter(forall(zip_with(col("hs"), col("_whs"),
        (a, b) => bit_count(a.bitwiseXOR(b)) <= maxDist), p => p))
      .select(col("media_id").as("_loser"))
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  case class KeyframeSig(media_id: Long, sig: Array[Byte])

  /** EXACT compressed-domain video dedup for H.264 AND H.265 mp4s:
    * hash the concatenated keyframe payloads ([[VideoContainers
    * .mp4AvcKeyframes]] for avc1, [[VideoContainers.mp4HevcKeyframes]]
    * for hvc1/hev1 — container + NAL parsing, NO entropy decode) and
    * collapse byte-identical keyframe streams, keep-smallest-id.
    * This is the 100 TB-shape for video exact-dedup: the signature is
    * SHA-256 over ~keyframe bytes, computed in one mapPartitions pass
    * (one digest instance per partition), and only (id, 32-byte sig)
    * rows ever shuffle. Videos with no parsable keyframes can't claim
    * duplicates and survive unconditionally.
    */
  def videoDedupByKeyframeHash(media: Dataset[Media]): Dataset[Media] = {
    import media.sparkSession.implicits._
    val sigs: Dataset[KeyframeSig] = media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { m =>
        if (m.kind != "video") None
        else {
          val avc = VideoContainers.mp4AvcKeyframes(m.content)
          val keys =
            if (avc.nonEmpty) avc
            else VideoContainers.mp4HevcKeyframes(m.content)
          if (keys.isEmpty) None
          else {
            digest.reset()
            keys.foreach(digest.update)
            Some(KeyframeSig(m.media_id, digest.digest()))
          }
        }
      }
    }
    val losers = sigs.toDF()
      .groupBy(col("sig"))
      .agg(min(col("media_id")).as("_winner"),
        collect_list(col("media_id")).as("_ids"))
      .select(explode(col("_ids")).as("_loser"), col("_winner"))
      .filter(col("_loser") =!= col("_winner"))
      .select(col("_loser"))
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  case class PixSeqSig(media_id: Long, sig: Array[Byte])

  /** EXACT pixel-domain video dedup (r11, the deblocking tier's query
    * face): SHA-256 over the decoded CROPPED planes of the first
    * `frames` display pictures, collapse byte-identical pixel
    * sequences, keep-smallest-id. Stricter than every aHash face: a
    * single-sample difference anywhere — e.g. an in-loop deblocking
    * filter applied vs skipped — separates two videos, which is
    * exactly what makes the filter arithmetic load-bearing here.
    * Scale shape: q84's — one mapPartitions decode pass, only
    * (id, 32-byte sig) rows shuffle, one hash agg.
    */
  def videoDedupByExactPixels(media: Dataset[Media],
      frames: Int = 2): Dataset[Media] = {
    import media.sparkSession.implicits._
    val sigs = media.mapPartitions { it =>
      it.filter(_.kind == "video").flatMap { m =>
        // Dispatch on the declared codec when metadata carries one — an
        // HEVC stream that HAPPENS to parse as >=frames AVC pictures
        // must not hash the wrong decoder's pixels. Try-both (AVC
        // first) only when the metadata names neither codec (r12,
        // was unconditional try-AVC-first).
        val fs = m.meta.format match {
          case "h264" | "avc" | "avc1" =>
            H264Decode.decodeAnnexBPictures(m.content, frames)
          case "hevc" | "h265" | "hvc1" | "hev1" =>
            H265Decode.decodeAnnexBPictures(m.content, frames)
          case _ =>
            val avc = H264Decode.decodeAnnexBPictures(m.content, frames)
            if (avc.nonEmpty) avc
            else H265Decode.decodeAnnexBPictures(m.content, frames)
        }
        if (fs.size < frames) None // undecodable = survives, as data
        else {
          val md = java.security.MessageDigest.getInstance("SHA-256")
          fs.take(frames).foreach { f =>
            md.update(f.croppedLuma); md.update(f.cb); md.update(f.cr)
          }
          Some(PixSeqSig(m.media_id, md.digest()))
        }
      }
    }
    val losers = sigs.toDF()
      .groupBy(col("sig"))
      .agg(min(col("media_id")).as("_winner"),
        collect_list(col("media_id")).as("_ids"))
      .select(explode(col("_ids")).as("_loser"), col("_winner"))
      .filter(col("_loser") =!= col("_winner"))
      .select(col("_loser"))
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  /** Synthetic raw Annex-B H.264 streams exercising the §8.7 IN-LOOP
    * DEBLOCKING filter (r11): IDR + P GOPs of flat 16x16 blocks whose
    * edge differences sit INSIDE the filter's alpha/beta thresholds, so
    * every displayed pixel near a block edge exists only through the
    * filter arithmetic (strong bS-4 intra edges, bS-1 motion edges on
    * the P side, in-loop filtered-reference propagation through the P
    * prediction). Three planted relations per decade of ids:
    *   - id % 10 == 0 (id > 0): EXACT cross-entropy dup of id-1 — same
    *     qp, same content, other entropy tier: pixels (filtered)
    *     byte-identical, stream bytes disjoint;
    *   - id % 10 == 5: an UNFILTERED TWIN of id-4 — identical content
    *     and entropy tier with disable_deblocking_filter_idc = 1: a
    *     decoder that skips (or misimplements) the filter sees it as a
    *     pixel-exact dup of id-4; a correct one keeps both.
    * Byte/keyframe hashing collapses nothing.
    */
  def syntheticAvcDeblockStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val unfTwin = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (unfTwin) id - 4 else id
      val deblock = !unfTwin
      val qp = 16 // alpha 4, beta 2: diffs 2/3 filter, >= 4 pass through
      val rnd = new scala.util.Random(seed * 67 + 29)
      // flat 16x16 blocks stepping by -3..3 per block: every MB edge is
      // a bS-4 (IDR) / bS-1-or-0 (P) candidate inside or outside alpha
      val mbMeans = Array.tabulate(4, 4) { (my, mx) =>
        80 + 8 * ((mx + my + seed) % 3).toInt + rnd.nextInt(3) - 1 +
          (if (((seed >> (my * 4 + mx)) & 1L) == 1L) 2 else 0)
      }
      // one guaranteed in-alpha edge (diff 2, full-strong branch): at
      // qp 16 the I16 DC recon is exact (1/64-pixel level grid), so the
      // filter provably moves at least this edge's pixels — the
      // unfiltered twin can never be pixel-identical to its original
      mbMeans(0)(1) = mbMeans(0)(0) + 2
      val panRnd = new scala.util.Random(seed * 71 + 13)
      // per-MB mv: alternating 0 / 1 whole-pel -> bS 1 on half the P
      // edges (|mv diff| = 4 quarter-pel), bS 0 on the rest
      val pMvs = Array.tabulate(4, 4) { (my, mx) =>
        if ((mx + my) % 2 == 0) (0, 0)
        else (4 * (1 + panRnd.nextInt(2)), 0)
      }
      val cabac = id % 2 == 1
      val content =
        if (cabac) {
          val idc = ((id / 2) % 3).toInt
          H264Encode.encodeCabacI16x16Dc(mbMeans, qp, deblock = deblock)._1 ++
            H264Encode.annexB(Seq((1, 3, H264Encode.encodeCabacP16x16(
              pMvs, qp, idc, poc = 2, deblock = deblock))))
        } else {
          H264Encode.encodeI16x16Dc(mbMeans, qp, deblock = deblock)._1 ++
            H264Encode.annexB(Seq((1, 3, H264Encode.encodeP16x16(
              pMvs, qp, poc = 2, deblock = deblock))))
        }
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(200L)))
    }
  }

  /** Synthetic raw Annex-B HEVC streams for the r11 PIXEL tier-1: one
    * IDR picture of vertical-stripe content (per-column constant luma,
    * flat chroma) carried in one of two REPRESENTATIONS per id parity:
    *   even — every CTU PCM (raw samples);
    *   odd  — PCM only on the top CTU row; every lower CTU is an
    *     Intra(26) (pure vertical) prediction, which reproduces the
    *     stripes EXACTLY (mode 26 copies the top references down
    *     unsmoothed, and its column-0 edge filter is a no-op on
    *     per-column-constant content: the left reference equals the
    *     corner). The bytes of the two representations are wildly
    *     different; the PIXELS are identical — only a decoder that
    *     walks CTUs, restarts CABAC around PCM, derives MPMs and runs
    *     the §8.4.4.2 angular machinery sees it. Planted pairs
    *     (id % 10 == 0 with id−1) share the stripe seed ACROSS
    *     representations; all other ids are unique.
    */
  def syntheticHevcPixelStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val seed: Long = if (isDup) id - 1 else id
      val rnd = new scala.util.Random(seed * 83 + 31)
      val cols = Array.fill(64)(40 + rnd.nextInt(176)) // per-column luma
      val ctbW = 4; val ctbH = 4
      def pcmCtu(cx: Int): H265Encode.Pcm = {
        val l = Array.tabulate(256)(i => cols(cx * 16 + i % 16).toByte)
        H265Encode.Pcm(l, Array.fill(64)(128.toByte), Array.fill(64)(128.toByte))
      }
      val pcmAll = id % 2 == 0
      val ctus: Array[Array[H265Encode.Ctu]] =
        Array.tabulate(ctbH, ctbW) { (cy, cx) =>
          if (pcmAll || cy == 0) pcmCtu(cx)
          else H265Encode.Intra(26)
        }
      val content = H265Encode.encodeIntraPicture(ctus)
      Media(id, "video", content,
        MediaMeta("h265", Some(64), Some(64), None, Some(100L)))
    }
  }

  /** Synthetic raw Annex-B HEVC streams for the r12 PIXEL tier-2
    * (residual coding + coding-quadtree splits): 64x64 TEXTURED
    * pictures (gradient + seeded noise) encoded at qp 28 with a
    * per-seed random coding quadtree over 32x32 CTBs — NxN 8x8 CUs,
    * TU splits, whole-CTB 32x32 CUs — so nearly every TB carries
    * nonzero coefficients through the §7.3.8.11 syntax and the
    * §8.6 dequant + inverse DCT/DST. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): a tier-1 ALL-PCM stream (CTB 16)
    *     carrying id−1's tier-2 RECON pixels raw — byte-disjoint
    *     representations, identical pixels; collapsing the pair
    *     requires the residual decode to be sample-exact;
    *   - id % 10 == 5: id−4's source re-encoded at qp 29 — a
    *     near-duplicate whose recon differs in quantization error
    *     only; EXACT-pixel dedup must keep both.
    */
  def syntheticHevcResidualStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val qpDecoy = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (qpDecoy) id - 4 else id
      val qp = if (qpDecoy) 29 else 28
      val w = 64; val h = 64
      val rnd = new scala.util.Random(seed * 97 + 41)
      val sy = Array.tabulate(w * h)(i =>
        (28 + (((i % w) * 3 + (i / w) * 2 + rnd.nextInt(49)) % 200)).toByte)
      val scb = Array.tabulate((w / 2) * (h / 2))(i =>
        (96 + (i % (w / 2)) / 2 + rnd.nextInt(9)).toByte)
      val scr = Array.tabulate((w / 2) * (h / 2))(_ =>
        (110 + rnd.nextInt(33)).toByte)
      import H265Encode.{CuLeaf, CuSplit, CuTree}
      def leaf8(): CuTree =
        if (rnd.nextInt(3) == 0) CuLeaf(Seq.fill(4)(rnd.nextInt(35)))
        else CuLeaf(Seq(rnd.nextInt(35)), splitTu = rnd.nextInt(2) == 0)
      def node16(): CuTree =
        if (rnd.nextInt(2) == 0) CuSplit(leaf8(), leaf8(), leaf8(), leaf8())
        else CuLeaf(Seq(rnd.nextInt(35)), splitTu = rnd.nextInt(2) == 0)
      def ctb32(): CuTree =
        if (rnd.nextInt(4) == 0) CuLeaf(Seq(rnd.nextInt(35)))
        else CuSplit(node16(), node16(), node16(), node16())
      val layout = Seq(ctb32(), ctb32(), ctb32(), ctb32())
      val (stream, recon) =
        H265Encode.encodeIntraPicture2(sy, scb, scr, w, h, layout, qp)
      val content =
        if (isDup) {
          // tier-1 twin: PCM CTUs carrying the tier-2 recon verbatim
          val ctus: Array[Array[H265Encode.Ctu]] =
            Array.tabulate(4, 4) { (cy, cx) =>
              val l = Array.tabulate(256)(i =>
                recon.luma((cy * 16 + i / 16) * w + cx * 16 + i % 16))
              val cbP = Array.tabulate(64)(i =>
                recon.cb((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              val crP = Array.tabulate(64)(i =>
                recon.cr((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              H265Encode.Pcm(l, cbP, crP)
            }
          H265Encode.encodeIntraPicture(ctus, qp = 30)
        } else stream
      Media(id, "video", content,
        MediaMeta("h265", Some(64), Some(64), None, Some(100L)))
    }
  }

  /** Synthetic HEVC streams for the r12 DEBLOCKING rung: the
    * tier-2 residual corpus shape with the §8.7.2 in-loop filter LIVE
    * (PPS enables it; mild texture at qp 32 keeps luma edge segments
    * inside the d < β gate, and the bS-2 chroma Δ filter applies at
    * every 16-grid edge). Planted relations per decade:
    *   - id % 10 == 0 (id > 0): an all-PCM tier-1 stream carrying
    *     id−1's FILTERED recon raw — collapses iff decode AND the
    *     deblocking arithmetic are both sample-exact;
    *   - id % 10 == 5: an UNFILTERED TWIN of id−4 — the identical
    *     coded payload with the PPS filter off: a decoder that skips
    *     (or misimplements) the filter sees an exact dup; a correct
    *     one keeps both.
    */
  def syntheticHevcDeblockStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val unfTwin = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (unfTwin) id - 4 else id
      val qp = 32
      val w = 64; val h = 64
      val rnd = new scala.util.Random(seed * 101 + 47)
      val sy = Array.tabulate(w * h)(i =>
        (70 + (i % w) + (i / w) / 2 + rnd.nextInt(9)).min(235).toByte)
      val scb = Array.tabulate((w / 2) * (h / 2))(i =>
        (100 + (i % (w / 2)) / 4 + rnd.nextInt(13)).toByte)
      val scr = Array.tabulate((w / 2) * (h / 2))(_ =>
        (118 + rnd.nextInt(17)).toByte)
      import H265Encode.{CuLeaf, CuSplit, CuTree}
      def leaf16(): CuTree =
        if (rnd.nextInt(3) == 0) CuLeaf(Seq(rnd.nextInt(35)), splitTu = true)
        else CuLeaf(Seq(rnd.nextInt(35)))
      def ctb32(): CuTree =
        if (rnd.nextInt(3) == 0) CuLeaf(Seq(rnd.nextInt(35)))
        else CuSplit(leaf16(), leaf16(), leaf16(), leaf16())
      val layout = Seq(ctb32(), ctb32(), ctb32(), ctb32())
      val (stream, recon) = H265Encode.encodeIntraPicture2(
        sy, scb, scr, w, h, layout, qp, deblock = !unfTwin)
      val content =
        if (isDup) {
          val ctus: Array[Array[H265Encode.Ctu]] =
            Array.tabulate(4, 4) { (cy, cx) =>
              val l = Array.tabulate(256)(i =>
                recon.luma((cy * 16 + i / 16) * w + cx * 16 + i % 16))
              val cbP = Array.tabulate(64)(i =>
                recon.cb((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              val crP = Array.tabulate(64)(i =>
                recon.cr((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              H265Encode.Pcm(l, cbP, crP)
            }
          H265Encode.encodeIntraPicture(ctus, qp = 30)
        } else stream
      Media(id, "video", content,
        MediaMeta("h265", Some(64), Some(64), None, Some(100L)))
    }
  }

  /** Synthetic raw Annex-B HEVC streams for the r12 INTER tier 3
    * (P slices, single-reference GOPs): 64x64 textured content
    * translating by a per-seed integer delta across an IDR + 2 P
    * pictures, the P CTBs a per-seed mix of whole-CTB inter CUs at the
    * true motion, split CTBs with intra islands, and dropped-residual
    * (skip-signalled) regions — so decoded content flows through
    * merge, AMVP, quarter-pel DCT-IF interpolation AND inter residual
    * coding. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): an ALL-INTRA PCM twin (three tier-1
    *     IDR pictures carrying id−1's decoded GOP pixels raw) —
    *     byte-disjoint representations, identical pixels iff the whole
    *     inter decode chain is sample-exact;
    *   - id % 10 == 5: id−4's GOP with every P MV nudged one
    *     quarter-pel — a near-duplicate whose prediction (and hence
    *     recon) differs; exact-pixel dedup must keep both.
    */
  def syntheticHevcInterStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val nudge = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (nudge) id - 4 else id
      val w = 64; val h = 64
      val rnd = new scala.util.Random(seed * 131 + 29)
      val qp = 27
      val dx = 1 + rnd.nextInt(3); val dy = rnd.nextInt(2)
      val base = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (32 + ((x * 7 + y * 5) % 180) + rnd.nextInt(25)).toByte
      }
      def shifted(k: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
        val sy = Array.tabulate(w * h) { i =>
          val x = (i % w - k * dx + 4 * w) % w
          val y = (i / w - k * dy + 4 * h) % h
          base(y * w + x)
        }
        val scb = Array.tabulate((w / 2) * (h / 2))(i =>
          (96 + ((i % (w / 2)) + k) / 2).toByte)
        val scr = Array.tabulate((w / 2) * (h / 2))(i =>
          (118 + (i / (w / 2) + k) % 9).toByte)
        (sy, scb, scr)
      }
      val frames = (0 to 2).map(shifted)
      import H265Encode.{CuLeaf, CuSplit, CuTree, InterLeaf, Pcm, Ctu}
      val iLayout: Seq[CuTree] = Seq.fill(4)(CuLeaf(Seq(rnd.nextInt(35))))
      val bump = if (nudge) 1 else 0
      def pLayout(): Seq[CuTree] = {
        val mvx = 4 * dx + bump; val mvy = 4 * dy
        Seq.fill(4) {
          rnd.nextInt(4) match {
            case 0 => InterLeaf(mvx, mvy)
            case 1 => CuSplit(InterLeaf(mvx, mvy), InterLeaf(mvx, mvy),
              CuLeaf(Seq(rnd.nextInt(35))),
              InterLeaf(mvx, mvy, dropResidual = rnd.nextInt(2) == 0))
            case 2 => CuLeaf(Seq(rnd.nextInt(35)))
            case _ => InterLeaf(mvx, mvy)
          }
        }
      }
      val (stream, recons) = H265Encode.encodeGop(frames, w, h, iLayout,
        Seq(pLayout(), pLayout()), qp)
      val content =
        if (isDup) {
          // all-intra PCM twin: one tier-1 IDR per decoded picture
          recons.map { r =>
            val ctus: Array[Array[Ctu]] = Array.tabulate(4, 4) { (cy, cx) =>
              val l = Array.tabulate(256)(i =>
                r.luma((cy * 16 + i / 16) * w + cx * 16 + i % 16))
              val cbP = Array.tabulate(64)(i =>
                r.cb((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              val crP = Array.tabulate(64)(i =>
                r.cr((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              Pcm(l, cbP, crP)
            }
            H265Encode.encodeIntraPicture(ctus, qp = 30)
          }.reduce(_ ++ _)
        } else stream
      Media(id, "video", content,
        MediaMeta("h265", Some(64), Some(64), None, Some(120L)))
    }
  }

  /** Synthetic reordered HEVC GOPs for the r13 tier-4 (B slice) rung:
    * each stream an IDR + reference P + non-reference B in I0-P2-B1
    * DECODE order (display I-B-P) — content that exists only through
    * TWO reference lists: inter_pred_idc signalling, per-list
    * merge/AMVP (combined bi-predictive candidates included), the
    * 14-bit-intermediate bi-prediction combine, and TRAIL_N handling
    * (the B must never enter the DPB). Planted relations per decade:
    *   - id % 10 == 0 (id > 0): an EXACT all-intra PCM twin of id−1's
    *     DISPLAY-ORDER decoded pictures — pixels byte-identical,
    *     stream bytes disjoint; collapse ⇔ the bi-pred sample
    *     arithmetic AND the decode→display reordering are both exact;
    *   - id % 10 == 5: id−4's content with the B picture's list-0 MVs
    *     nudged one quarter-pel — a near-dup exact dedup must keep.
    */
  def syntheticHevcBidirStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val nudge = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (nudge) id - 4 else id
      val w = 64; val h = 64
      val rnd = new scala.util.Random(seed * 157 + 43)
      val qp = 27
      val dx = 1 + rnd.nextInt(3); val dy = rnd.nextInt(2)
      val base = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (32 + ((x * 7 + y * 5) % 180) + rnd.nextInt(25)).toByte
      }
      def shifted(k: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
        val sy = Array.tabulate(w * h) { i =>
          val x = (i % w - k * dx + 4 * w) % w
          val y = (i / w - k * dy + 4 * h) % h
          base(y * w + x)
        }
        val scb = Array.tabulate((w / 2) * (h / 2))(i =>
          (96 + ((i % (w / 2)) + k) / 2).toByte)
        val scr = Array.tabulate((w / 2) * (h / 2))(i =>
          (118 + (i / (w / 2) + k) % 9).toByte)
        (sy, scb, scr)
      }
      // decode order I0, P2, B1 — source frames follow decode order
      val frames = Seq(shifted(0), shifted(2), shifted(1))
      import H265Encode.{BiLeaf, CuLeaf, CuSplit, CuTree, GopPic,
        InterLeaf, Pcm, Ctu}
      val iLayout: Seq[CuTree] = Seq.fill(4)(CuLeaf(Seq(rnd.nextInt(35))))
      val bump = if (nudge) 1 else 0
      // true motion: content shifts (dx, dy) per DISPLAY frame, so P2
      // (2 frames from I0) carries 8dx and B1 ±4dx toward each list
      val pLayout: Seq[CuTree] = Seq.fill(4) {
        val mvx = 8 * dx; val mvy = 8 * dy
        if (rnd.nextInt(3) == 0) CuLeaf(Seq(rnd.nextInt(35)))
        else InterLeaf(mvx, mvy)
      }
      val bLayout: Seq[CuTree] = {
        val f0x = 4 * dx + bump; val f0y = 4 * dy
        val f1x = -4 * dx; val f1y = -4 * dy
        // CTU 0 is always a bi CU: the quarter-pel nudge rides list-0
        // MVs, so at least one L0-carrying CU must exist for the
        // planted near-dups to actually differ
        (BiLeaf(3, f0x, f0y, f1x, f1y): CuTree) +: Seq.fill(3) {
          rnd.nextInt(5) match {
            case 0 => BiLeaf(3, f0x, f0y, f1x, f1y)
            case 1 => BiLeaf(1, f0x, f0y)
            case 2 => BiLeaf(2, 0, 0, f1x, f1y)
            case 3 => CuSplit(BiLeaf(3, f0x, f0y, f1x, f1y),
              CuLeaf(Seq(rnd.nextInt(35))),
              BiLeaf(3, f0x, f0y, f1x, f1y,
                dropResidual = rnd.nextInt(2) == 0),
              BiLeaf(1, f0x, f0y))
            case _ => BiLeaf(3, f0x, f0y, f1x, f1y)
          }
        }
      }
      val (stream, recons) = H265Encode.encodeGopB(frames, w, h, iLayout,
        Seq(GopPic(2, 1, pLayout, negDelta = 2),
          GopPic(1, 0, bLayout, isRef = false)), qp)
      val content =
        if (isDup) {
          // all-intra PCM twin in DISPLAY order (recons are display
          // order): one tier-1 IDR per decoded picture
          recons.map { r =>
            val ctus: Array[Array[Ctu]] = Array.tabulate(4, 4) { (cy, cx) =>
              val l = Array.tabulate(256)(i =>
                r.luma((cy * 16 + i / 16) * w + cx * 16 + i % 16))
              val cbP = Array.tabulate(64)(i =>
                r.cb((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              val crP = Array.tabulate(64)(i =>
                r.cr((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              Pcm(l, cbP, crP)
            }
            H265Encode.encodeIntraPicture(ctus, qp = 30)
          }.reduce(_ ++ _)
        } else stream
      Media(id, "video", content,
        MediaMeta("h265", Some(64), Some(64), None, Some(120L)))
    }
  }

  /** Synthetic weighted-prediction HEVC GOPs for the r13 fade rung
    * (the q154 posture on the second codec family): reordered
    * I0-P2-B1 GOPs over FADING content — the P picture predicts its
    * fade through an explicit §8.5.4.2.3 luma weight/offset, the
    * non-reference B through per-list weighted BI mixing — so the
    * middle pictures exist only through the weighted sample
    * arithmetic. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): an all-intra PCM twin of id−1's
    *     DISPLAY-order recon — collapse ⇔ the weighted uni AND bi
    *     formulas (rounding terms, offset scaling, chroma-offset
    *     prediction) are sample-exact;
    *   - id % 10 == 5: id−4 with the P slice's luma weight nudged by
    *     one step — a near-dup exact dedup must keep.
    */
  def syntheticHevcWpStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val nudge = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (nudge) id - 4 else id
      val w = 64; val h = 64
      val rnd = new scala.util.Random(seed * 211 + 97)
      val qp = 26
      val base = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (48 + ((x * 7 + y * 5) % 170) + rnd.nextInt(21))
      }
      def faded(scaleQ6: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
        val sy = base.map(v => math.min(255, (v * scaleQ6) >> 6).toByte)
        val scb = Array.tabulate((w / 2) * (h / 2))(i =>
          (96 + (i % (w / 2)) / 2).toByte)
        val scr = Array.tabulate((w / 2) * (h / 2))(i =>
          (118 + (i / (w / 2)) % 9).toByte)
        (sy, scb, scr)
      }
      // fade factors in 1/64 units; the weights predict them exactly
      val s1 = 44 + rnd.nextInt(12) // B1's fade
      val s2 = 28 + rnd.nextInt(12) // P2's deeper fade
      val bump = if (nudge) 1 else 0
      import H265Encode.{BiLeaf, CuLeaf, CuTree, GopPic, InterLeaf}
      import H265Inter.{PredWeights, Wp}
      val defC = Wp(64, 0)
      val pwP = PredWeights(6, 6, Wp(s2 + bump, rnd.nextInt(5) - 2),
        defC, defC, Wp(64, 0), defC, defC)
      // B mixes I0 (weight toward s1) and P2 (scaled back up): rough
      // per-list weights, residual closes the gap
      val pwB = PredWeights(6, 6, Wp(s1, 0), defC, defC,
        Wp(math.min(127, s1 * 64 / math.max(1, s2)), 0), defC, defC)
      val iLayout: Seq[CuTree] = Seq.fill(4)(CuLeaf(Seq(rnd.nextInt(35))))
      def mix(f0x: Int): Seq[CuTree] = Seq.fill(4) {
        rnd.nextInt(4) match {
          case 0 => CuLeaf(Seq(rnd.nextInt(35)))
          case 1 => BiLeaf(1, f0x, 0)
          case 2 => BiLeaf(3, f0x, 0, 0, 0)
          case _ => BiLeaf(2, 0, 0, 0, 0)
        }
      }
      val pLayout: Seq[CuTree] = Seq.fill(4)(InterLeaf(0, 0): CuTree)
      val (stream, recons) = H265Encode.encodeGopB(
        Seq(faded(64), faded(s2), faded(s1)), w, h, iLayout,
        Seq(GopPic(2, 1, pLayout, negDelta = 2, weights = Some(pwP)),
          GopPic(1, 0, mix(0), isRef = false, weights = Some(pwB))), qp)
      val content =
        if (isDup) {
          import H265Encode.{Ctu, Pcm}
          recons.map { r =>
            val ctus: Array[Array[Ctu]] = Array.tabulate(4, 4) { (cy, cx) =>
              val l = Array.tabulate(256)(i =>
                r.luma((cy * 16 + i / 16) * w + cx * 16 + i % 16))
              val cbP = Array.tabulate(64)(i =>
                r.cb((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              val crP = Array.tabulate(64)(i =>
                r.cr((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              Pcm(l, cbP, crP)
            }
            H265Encode.encodeIntraPicture(ctus, qp = 30)
          }.reduce(_ ++ _)
        } else stream
      Media(id, "video", content,
        MediaMeta("h265", Some(64), Some(64), None, Some(120L)))
    }
  }

  /** Synthetic multi-reference HEVC GOPs for the r13 ref_idx rung
    * (q156's posture on the second codec family): I0-P1-P2 chains
    * over content that alternates A-B-A, so P2's CUs split between
    * refIdx 0 (P1, content B) and refIdx 1 (the IDR, content A) —
    * decode is wrong unless the multi-entry RPS resolves, L0 builds
    * in RPS order, ref_idx parses, and per-refIdx AMVP scales.
    * Planted relations per decade:
    *   - id % 10 == 0 (id > 0): an all-intra PCM twin of id−1's
    *     decoded pictures — collapse ⇔ the farther-reference
    *     prediction is sample-exact;
    *   - id % 10 == 5: id−4 with one refIdx-1 CU's MV nudged a
    *     quarter-pel — a near-dup exact dedup must keep.
    */
  def syntheticHevcMultiRefStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val nudge = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (nudge) id - 4 else id
      val w = 64; val h = 64
      val rnd = new scala.util.Random(seed * 227 + 13)
      val qp = 26
      def content(k: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
        val r2 = new scala.util.Random(seed * 1000 + k)
        (Array.tabulate(w * h) { i =>
          val x = i % w; val y = i / w
          (40 + ((x * (5 + k) + y * 3) % 160) + r2.nextInt(17)).toByte
        },
          Array.tabulate((w / 2) * (h / 2))(i =>
            (90 + ((i % (w / 2)) + k)).toByte),
          Array.tabulate((w / 2) * (h / 2))(_ => (120 + k * 7).toByte))
      }
      val fA = content(0); val fB = content(1)
      import H265Encode.{CuLeaf, CuSplit, CuTree, GopPic, InterLeaf}
      val iLayout: Seq[CuTree] = Seq.fill(4)(CuLeaf(Seq(rnd.nextInt(35))))
      val bump = if (nudge) 1 else 0
      val p1Layout: Seq[CuTree] =
        Seq.fill(4)(InterLeaf(rnd.nextInt(9) - 4, rnd.nextInt(5) - 2): CuTree)
      // P2 (content ≈ A again): refIdx 1 reaches the IDR
      val p2Layout: Seq[CuTree] = Seq.fill(4) {
        rnd.nextInt(4) match {
          case 0 => InterLeaf(bump, 0, dropResidual = true, refIdx = 1)
          case 1 => CuSplit(InterLeaf(bump, 0, refIdx = 1),
            CuLeaf(Seq(rnd.nextInt(35))),
            InterLeaf(rnd.nextInt(5) - 2, 0),
            InterLeaf(bump, 0, refIdx = 1))
          case 2 => InterLeaf(rnd.nextInt(5) - 2, rnd.nextInt(5) - 2)
          case _ => InterLeaf(bump, 0, refIdx = 1)
        }
      }
      val (stream, recons) = H265Encode.encodeGopB(
        Seq(fA, fB, fA), w, h, iLayout,
        Seq(GopPic(1, 1, p1Layout),
          GopPic(2, 1, p2Layout, negDelta = 1, moreNegDeltas = Seq(2))), qp)
      val out =
        if (isDup) {
          import H265Encode.{Ctu, Pcm}
          recons.map { r =>
            val ctus: Array[Array[Ctu]] = Array.tabulate(4, 4) { (cy, cx) =>
              val l = Array.tabulate(256)(i =>
                r.luma((cy * 16 + i / 16) * w + cx * 16 + i % 16))
              val cbP = Array.tabulate(64)(i =>
                r.cb((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              val crP = Array.tabulate(64)(i =>
                r.cr((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              Pcm(l, cbP, crP)
            }
            H265Encode.encodeIntraPicture(ctus, qp = 30)
          }.reduce(_ ++ _)
        } else stream
      Media(id, "video", out,
        MediaMeta("h265", Some(64), Some(64), None, Some(120L)))
    }
  }

  /** Decode-invariant Annex-B REMUX (r14 q175): the same coded HEVC
    * video re-wrapped at the byte level — the transforms streaming
    * remuxers apply without touching slice data. Flavor 0: 3-byte
    * start codes (the first NAL keeps 4 — both forms are legal
    * everywhere, mixed files exist in the wild); flavor 1: an
    * access-unit delimiter before every VCL NAL; flavor 2: parameter
    * sets repeated before every VCL NAL (the broadcast-robustness
    * pattern). Decoded pixels are identical by construction; bytes
    * are not — the exact phenomenon decoded-pixel dedup exists for.
    */
  def remuxHevcAnnexB(stream: Array[Byte], flavor: Int): Array[Byte] = {
    val nals = H265.nalUnitsAnnexB(stream)
    val out = new java.io.ByteArrayOutputStream()
    // Re-emit the ORIGINAL nuh_layer_id / nuh_temporal_id_plus1 —
    // TemporalId drives prevTid0Pic POC derivation and sub-layer
    // reference marking (§8.3.1 / §8.3.2), so rewriting them would
    // break decode-invariance for temporal-sub-layer streams
    // (TSA/STSA, b-pyramid).
    def emit(t: Int, layerId: Int, tidPlus1: Int, payload: Array[Byte],
        short: Boolean): Unit = {
      out.write(if (short) Array[Byte](0, 0, 1) else Array[Byte](0, 0, 0, 1))
      out.write(((t & 0x3f) << 1) | ((layerId >> 5) & 1))
      out.write(((layerId & 0x1f) << 3) | (tidPlus1 & 7))
      out.write(payload, 0, payload.length)
    }
    def emitNal(nal: H265.Nal, short: Boolean): Unit =
      emit(nal.nalType, nal.layerId, nal.tidPlus1, nal.payload, short)
    val vcl = (t: Int) => t <= 31
    math.floorMod(flavor, 3) match {
      case 0 =>
        nals.zipWithIndex.foreach { case (nal, i) =>
          emitNal(nal, short = i > 0)
        }
      case 1 =>
        // AUD_NUT (35): pic_type 'any' + rbsp stop bit = 0x50.
        // A synthesized AUD sits in the base layer at TemporalId 0.
        nals.foreach { nal =>
          if (vcl(nal.nalType))
            emit(35, 0, 1, Array(0x50.toByte), short = false)
          emitNal(nal, short = false)
        }
      case _ =>
        val ps = nals.filter(n => n.nalType >= 32 && n.nalType <= 34)
        nals.foreach { nal =>
          if (vcl(nal.nalType)) ps.foreach(p => emitNal(p, short = false))
          emitNal(nal, short = false)
        }
    }
    out.toByteArray
  }

  /** q175 corpus: mixed-PROVENANCE HEVC streams for the remux-dedup
    * face. ids < n−10 are own-encoder P-GOP families: id%10==0 (id>0)
    * plants a REMUXED copy of id−1 ([[remuxHevcAnnexB]], flavor
    * rotating by family — byte-disjoint, decode-identical, must
    * collapse); id%10==5 plants a one-QP re-encode of id−4's content
    * (different reconstruction — a near-dup exact dedup must keep).
    * The LAST 10 ids are the external block: the five committed
    * libx265 vectors (fixtures/x265 — independently-authored encoder
    * output) verbatim, then each one's remux twin, so the face's
    * collapse semantics are exercised on streams this repo's encoder
    * never touched.
    */
  def syntheticHevcRemuxStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    require(n >= 20, s"remux corpus needs >= 20 rows, got $n")
    // Resolve the committed x265 vectors from the repo root (the
    // DuckDB oracle strings are absolute for the same reason) so the
    // q175 fallback/regeneration path does not depend on the driver's
    // cwd; GRAFT_REPO_ROOT overrides for non-standard checkouts.
    val xdir = {
      val rooted = java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_REPO_ROOT", "/root/repo"), "fixtures", "x265")
      if (java.nio.file.Files.isDirectory(rooted)) rooted
      else java.nio.file.Paths.get("fixtures/x265")
    }
    val xvecs: Seq[Array[Byte]] = Seq("intra_64x64.265", "p_128x64.265",
      "b_128x64.265", "wp_128x64.265", "mr_128x64.265")
      .map(f => java.nio.file.Files.readAllBytes(xdir.resolve(f)))
    val xBase = n - 10
    spark.range(0, n, 1, partitions).map { id =>
      val content: Array[Byte] =
        if (id >= xBase + 5) // remux twin of the vector 5 back
          remuxHevcAnnexB(xvecs((id - xBase - 5).toInt), (id % 3).toInt)
        else if (id >= xBase) xvecs((id - xBase).toInt)
        else {
          val isDup = id % 10 == 0 && id > 0
          val reenc = id % 10 == 5 && id >= 5
          val seed: Long = if (isDup) id - 1 else if (reenc) id - 4 else id
          val qp = if (reenc) 29 else 27
          val w = 64; val h = 64
          val rnd = new scala.util.Random(seed * 193 + 41)
          val dx = 1 + rnd.nextInt(3)
          val base = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            (28 + ((x * 7 + y * 3) % 190) + rnd.nextInt(21)).toByte
          }
          def shifted(k: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
            val sy = Array.tabulate(w * h) { i =>
              val x = (i % w - k * dx + 4 * w) % w
              base((i / w) * w + x)
            }
            val scb = Array.tabulate((w / 2) * (h / 2))(i =>
              (100 + ((i % (w / 2)) + k) % 40).toByte)
            val scr = Array.tabulate((w / 2) * (h / 2))(i =>
              (120 + (i / (w / 2) + 2 * k) % 11).toByte)
            (sy, scb, scr)
          }
          import H265Encode.{CuLeaf, CuTree, InterLeaf}
          val iLayout: Seq[CuTree] = Seq.fill(4)(CuLeaf(Seq(rnd.nextInt(35))))
          def pLayout(): Seq[CuTree] = Seq.fill(4) {
            if (rnd.nextInt(4) == 0) CuLeaf(Seq(rnd.nextInt(35)))
            else InterLeaf(4 * dx, 0): CuTree
          }
          val (stream, _) = H265Encode.encodeGop(
            (0 to 2).map(shifted), w, h, iLayout,
            Seq(pLayout(), pLayout()), qp)
          if (isDup) remuxHevcAnnexB(stream, (id / 10 % 3).toInt)
          else stream
        }
      Media(id, "video", content,
        MediaMeta("h265", None, None, None, Some(120L)))
    }
  }

  /** Synthetic raw Annex-B H.264 streams for the r12 MULTI-SLICE +
    * P_8x8 rung: each stream a GOP of one IDR and one P picture, BOTH
    * carved into two slices (the most common real-stream structure the
    * decoder previously dropped), the P picture all P_8x8 macroblocks
    * with per-seed Table 7-17 sub-partitions and quarter-pel motion.
    * Decoding demands slice-aware §6.4 availability (each slice's
    * first MBs predict from 128 / unavailable medians), per-slice
    * entropy restarts, and sub-partition MC at 4x4 granularity.
    * Planted relations per decade:
    *   - id % 10 == 0 (id > 0): an EXACT cross-entropy dup of id−1
    *     (same content, other entropy tier): pixels byte-identical,
    *     stream bytes disjoint;
    *   - id % 10 == 5: id−4's content with every P mv nudged one
    *     quarter-pel — a near-dup exact dedup must keep.
    */
  def syntheticAvcMultiSliceStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val nudge = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (nudge) id - 4 else id
      val cabac = id % 2 == 1
      val mbW = 4; val mbH = 4
      val rnd = new scala.util.Random(seed * 89 + 37)
      val means = Array.tabulate(mbH, mbW)((y, x) =>
        40 + 11 * x + 15 * y + rnd.nextInt(17))
      val mbs = Array.tabulate(mbH, mbW) { (_, _) =>
        val sub = Seq.fill(4)(rnd.nextInt(4))
        val nMv = sub.map(Seq(1, 2, 2, 4)).sum
        H264Encode.P8x8Mb(sub, Seq.fill(nMv)((
          rnd.nextInt(17) - 8 + (if (nudge) 1 else 0),
          rnd.nextInt(13) - 6)))
      }
      val iStarts = Seq(0, 4 + rnd.nextInt(8))
      val pStarts = Seq(0, 4 + rnd.nextInt(8))
      val (iStream, _) = H264Encode.encodeI16x16DcSlices(means, qp = 24,
        iStarts, cabac)
      val iNals = H264.nalUnitsAnnexB(iStream)
        .filter(_.nalType == 5).map(_.payload)
      val pNals = H264Encode.encodeP8x8Slices(mbs, qp = 26, poc = 2,
        sliceStarts = pStarts, cabac = cabac)
      val content = H264Encode.annexB(
        Seq((7, 3, H264.writeSps(mbW * 16, mbH * 16)),
          (8, 3, H264.writePps(cabac = cabac))) ++
          iNals.map(p => (5, 3, p)) ++ pNals.map(p => (1, 3, p)))
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(200L)))
    }
  }

  /** Synthetic MP3 streams for the r12 compressed-audio PROBE rung:
    * conformant MPEG-1 Layer-III frame sequences (seeded opaque
    * payloads — framing real, Huffman/MDCT opaque, the probe-tier
    * posture) under varying bitrates, ID3v2 headers and ID3v1 tails.
    * Planted relations per decade:
    *   - id % 10 == 0 (id > 0): the SAME audio frames as id−1 wrapped
    *     in different metadata (a distinct ID3v2 tag + an ID3v1 tail)
    *     — the classic same-song-different-tags duplicate: byte hashes
    *     differ, frame-payload identity collapses them;
    *   - id % 10 == 5: id−4's frames with ONE payload byte changed —
    *     a near-dup payload hashing must keep.
    */
  def syntheticMp3s(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val oneOff = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (oneOff) id - 4 else id
      val rnd = new scala.util.Random(seed * 131 + 17)
      val brIdx = 8 + rnd.nextInt(4) // 112..192 kbps
      val srIdx = rnd.nextInt(3)
      val frameLen = 144 * (Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320, 0)(brIdx) * 1000) /
        Array(44100, 48000, 32000)(srIdx)
      val nFrames = 20 + rnd.nextInt(20)
      val payloads = Seq.fill(nFrames) {
        val p = new Array[Byte](frameLen - 4)
        rnd.nextBytes(p)
        p
      }
      val withChange =
        if (oneOff) {
          val c = payloads.map(_.clone())
          c(nFrames / 2)(3) = (c(nFrames / 2)(3) ^ 0x5a).toByte
          c
        } else payloads
      val tag =
        if (isDup) {
          val t = new Array[Byte](64 + rnd.nextInt(64))
          new scala.util.Random(id).nextBytes(t) // the DUP's own tag
          Some(t)
        } else if (rnd.nextBoolean()) {
          val t = new Array[Byte](32 + rnd.nextInt(32))
          rnd.nextBytes(t)
          Some(t)
        } else None
      val content = Mp3.build(withChange, brIdx, srIdx, tag, id3v1 = isDup)
      Media(id, "audio", content,
        MediaMeta("mp3", None, None,
          Some(Array(44100, 48000, 32000)(srIdx)), None))
    }
  }

  /** Synthetic HEVC streams for the r12 SAO rung: tier-2 residual
    * pictures with Sample Adaptive Offset LIVE — per-seed per-CTB
    * band/edge parameters (some CTBs merged, some off) over textured
    * content at qp 30. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): an all-PCM tier-1 twin carrying id−1's
    *     SAO-FILTERED recon raw — collapses iff residual decode AND
    *     the §8.7.3 band/edge arithmetic are both sample-exact;
    *   - id % 10 == 5: a NO-SAO TWIN of id−4 — the same layout/source
    *     coded without SAO: a decoder that skips (or misimplements)
    *     the offsets sees an exact dup; a correct one keeps both.
    */
  def syntheticHevcSaoStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val noSao = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (noSao) id - 4 else id
      val qp = 30
      val w = 64; val h = 64
      val rnd = new scala.util.Random(seed * 191 + 53)
      val sy = Array.tabulate(w * h)(i =>
        (36 + (((i % w) * 5 + (i / w) * 3 + rnd.nextInt(41)) % 190)).toByte)
      val scb = Array.tabulate((w / 2) * (h / 2))(i =>
        (92 + (i % (w / 2)) / 2 + rnd.nextInt(13)).toByte)
      val scr = Array.tabulate((w / 2) * (h / 2))(_ =>
        (116 + rnd.nextInt(21)).toByte)
      import H265Encode.{CuLeaf, CuSplit, CuTree}
      def node(): CuTree =
        if (rnd.nextInt(3) == 0) CuSplit(CuLeaf(Seq(rnd.nextInt(35))),
          CuLeaf(Seq(rnd.nextInt(35))), CuLeaf(Seq(1)),
          CuLeaf(Seq(rnd.nextInt(35)), splitTu = true))
        else CuLeaf(Seq(rnd.nextInt(35)))
      val layout = Seq(node(), node(), node(), node())
      def saoParam(): graft.multimodal.H265Sao.Params = {
        val p = new graft.multimodal.H265Sao.Params
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
      // the shared param (CTBs 1 and 3) is pinned to a live luma edge
      // config so NO seed can degenerate into an all-no-op SAO picture
      // (which would make the no-SAO twin an exact dup)
      shared.typeIdx(0) = 2
      shared.offsets(0) = Array(3, 1, -1, -3)
      shared.eoClass(0) = 0
      val sao = Seq(saoParam(), shared, saoParam(), shared)
      val (stream, recon) = H265Encode.encodeIntraPicture2(sy, scb, scr,
        w, h, layout, qp, sao = if (noSao) Nil else sao)
      val content =
        if (isDup) {
          val ctus: Array[Array[H265Encode.Ctu]] =
            Array.tabulate(4, 4) { (cy, cx) =>
              val l = Array.tabulate(256)(i =>
                recon.luma((cy * 16 + i / 16) * w + cx * 16 + i % 16))
              val cbP = Array.tabulate(64)(i =>
                recon.cb((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              val crP = Array.tabulate(64)(i =>
                recon.cr((cy * 8 + i / 8) * (w / 2) + cx * 8 + i % 8))
              H265Encode.Pcm(l, cbP, crP)
            }
          H265Encode.encodeIntraPicture(ctus, qp = 30)
        } else stream
      Media(id, "video", content,
        MediaMeta("h265", Some(64), Some(64), None, Some(100L)))
    }
  }

  /** Synthetic raw Annex-B H.264 streams for the r12 LONG-TERM /
    * MMCO rung: each a 5-picture GOP whose IDR is marked a LONG-TERM
    * anchor (long_term_reference_flag), followed by panning P
    * pictures that exceed the declared max_num_ref_frames (the
    * sliding window alone would evict the anchor), a mid-GOP MMCO 1
    * (drop a short-term by picNum), and a final P whose upper half
    * re-anchors to the long-term picture at zero MV. Planted
    * relations per decade:
    *   - id % 10 == 0 (id > 0): an EXACT cross-entropy dup of id−1
    *     (same GOP, CAVLC ↔ CABAC) — collapses iff both entropy
    *     tiers AND the marking semantics decode identically;
    *   - id % 10 == 5: id−4's GOP with the long-term flag CLEARED —
    *     the final P then resolves ref 1 to a recent short-term
    *     instead of the anchor, so a decoder that implements marking
    *     keeps both, while one that ignores long-term state decodes
    *     the two variants identically and wrongly collapses them.
    */
  def syntheticAvcLongTermStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val noLt = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (noLt) id - 4 else id
      val rnd = new scala.util.Random(seed * 173 + 37)
      val qp = 26
      val mbMeans = Array.tabulate(4, 4)((my, mx) =>
        30 + rnd.nextInt(180) + ((mx + my) % 2) * 8)
      val mv = (4 * (1 + rnd.nextInt(3)), 4 * rnd.nextInt(2))
      val pan: Array[Array[(Int, Int)]] = Array.fill(4, 4)(mv)
      val checker: Array[Array[(Int, (Int, Int))]] =
        Array.tabulate(4, 4)((my, mx) =>
          if ((mx + my + seed) % 2 == 0) (0, mv) else (1, (0, 0)))
      val anchorMbs: Array[Array[(Int, (Int, Int))]] =
        Array.tabulate(4, 4)((my, _) =>
          if (my < 2) (1, (0, 0)) else (0, (0, 0)))
      val longTerm = !noLt
      // cross-entropy planting: the dup re-encodes id−1's GOP in the
      // OTHER entropy tier (base items alternate by their own parity)
      val cabac = if (isDup) (id - 1) % 2 == 0 else id % 2 == 1
      val content =
        if (cabac)
          H264Encode.encodeCabacI16x16Dc(mbMeans, qp, numRefFrames = 2,
            longTermRef = longTerm)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeCabacP16x16(pan, qp, poc = 2)),
              (1, 3, H264Encode.encodeCabacP16x16MultiRef(checker, 2, qp,
                poc = 4, frameNum = 2)),
              (1, 3, H264Encode.encodeCabacP16x16MultiRef(
                Array.fill(4, 4)((0, (0, 0))), 2, qp, poc = 6,
                frameNum = 3, mmco = Seq((1, 0, 0)))),
              (1, 3, H264Encode.encodeCabacP16x16MultiRef(anchorMbs, 2, qp,
                poc = 8, frameNum = 4))))
        else
          H264Encode.encodeI16x16Dc(mbMeans, qp, numRefFrames = 2,
            longTermRef = longTerm)._1 ++
            H264Encode.annexB(Seq(
              (1, 3, H264Encode.encodeP16x16(pan, qp, poc = 2)),
              (1, 3, H264Encode.encodeP16x16MultiRef(checker, 2, qp,
                poc = 4, frameNum = 2)),
              (1, 3, H264Encode.encodeP16x16MultiRef(
                Array.fill(4, 4)((0, (0, 0))), 2, qp, poc = 6,
                frameNum = 3, mmco = Seq((1, 0, 0)))),
              (1, 3, H264Encode.encodeP16x16MultiRef(anchorMbs, 2, qp,
                poc = 8, frameNum = 4))))
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(500L)))
    }
  }

  /** Synthetic Ogg-Opus corpus (r12, the fourth compressed-audio
    * rung): per-seed opaque Opus packet sequences behind real Ogg
    * framing — CRC-valid pages, BOS/EOS flags, running granules,
    * OpusHead/OpusTags packets. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): id−1's audio packets RE-MUXED — a new
    *     serial (which changes EVERY page's CRC), fresh OpusTags and a
    *     different vendor string (the canonical re-tagged/re-muxed
    *     Opus duplicate); byte hashes differ on every page, audio-
    *     packet hashes collapse;
    *   - id % 10 == 5: one audio byte changed in id−4's stream — a
    *     near-duplicate that must survive.
    */
  def syntheticOggOpus(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val oneOff = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (oneOff) id - 4 else id
      val rnd = new scala.util.Random(seed * 199 + 61)
      val channels = 1 + rnd.nextInt(2)
      val nPackets = 15 + rnd.nextInt(25)
      val audio = Seq.fill(nPackets) {
        val p = new Array[Byte](60 + rnd.nextInt(400))
        rnd.nextBytes(p)
        p
      }
      val withChange =
        if (oneOff) {
          val c = audio.map(_.clone())
          c(nPackets / 2)(7) = (c(nPackets / 2)(7) ^ 0x31).toByte
          c
        } else audio
      val muxRnd = if (isDup) new scala.util.Random(id) else rnd
      val serial = muxRnd.nextInt()
      val tags =
        Seq.fill(1 + muxRnd.nextInt(3))(
          s"TITLE=t${muxRnd.nextInt(100000)}")
      val vendor = s"enc${muxRnd.nextInt(1000)}"
      val content = Ogg.buildOpus(withChange, channels,
        preSkip = 312, inputRate = 48000, serial = serial,
        vendor = vendor, tags = tags)
      Media(id, "audio", content,
        MediaMeta("opus", None, None, Some(48000),
          Some(nPackets * 20L)))
    }
  }

  /** Synthetic FLAC corpus (r12, the third compressed-audio rung):
    * per-seed opaque compressed-audio sections behind real FLAC
    * metadata — STREAMINFO with exact stream facts, optional
    * VORBIS_COMMENT and PADDING blocks, a CRC-8-valid first frame
    * header. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): id−1's audio section RE-TAGGED — a
    *     different VORBIS_COMMENT plus fresh padding (the canonical
    *     lossless-audio duplicate: same FLAC frames, new tags/art);
    *     byte hashes differ, audio-section hashes collapse;
    *   - id % 10 == 5: one audio byte changed in id−4's section — a
    *     near-duplicate that must survive.
    */
  def syntheticFlacs(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val oneOff = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (oneOff) id - 4 else id
      val rnd = new scala.util.Random(seed * 179 + 41)
      val rate = Seq(44100, 48000, 96000, 22050)(rnd.nextInt(4))
      val channels = 1 + rnd.nextInt(2)
      val bps = Seq(16, 24)(rnd.nextInt(2))
      val totalSamples = 4096L * (4 + rnd.nextInt(60))
      val payload = new Array[Byte](2000 + rnd.nextInt(6000))
      rnd.nextBytes(payload)
      if (oneOff) {
        val pos = rnd.nextInt(payload.length)
        payload(pos) = (payload(pos) ^ 0x2d).toByte
      }
      val tagRnd = if (isDup) new scala.util.Random(id) else rnd
      val vc =
        if (isDup || rnd.nextBoolean()) {
          val t = new Array[Byte](40 + tagRnd.nextInt(80))
          tagRnd.nextBytes(t)
          Some(t)
        } else None
      val pad = if (isDup) 16 + tagRnd.nextInt(64)
        else if (rnd.nextBoolean()) rnd.nextInt(48) else 0
      val content = Flac.build(rate, channels, bps, totalSamples, payload,
        vc, pad)
      Media(id, "audio", content,
        MediaMeta("flac", None, None, Some(rate),
          Some(totalSamples * 1000 / rate)))
    }
  }

  /** Synthetic ADTS AAC corpus (r12, the second compressed-audio
    * rung): per-seed LC frame sequences under varying sample-rate
    * indices, channel configurations and buffer-fullness values,
    * optionally ID3v2-wrapped. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): id−1's frames RE-MUXED — different
    *     adts_buffer_fullness on every header plus a fresh ID3v2
    *     tag (the real-world same-audio-different-mux duplicate);
    *     byte hashes differ, payload hashes collapse;
    *   - id % 10 == 5: one payload byte changed in id−4's stream —
    *     a near-duplicate that must survive.
    */
  def syntheticAacAdts(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val oneOff = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (oneOff) id - 4 else id
      val rnd = new scala.util.Random(seed * 151 + 23)
      val srIdx = 3 + rnd.nextInt(6) // 48000 .. 16000
      val channels = 1 + rnd.nextInt(2)
      val nFrames = 20 + rnd.nextInt(20)
      val payloads = Seq.fill(nFrames) {
        val p = new Array[Byte](200 + rnd.nextInt(400))
        rnd.nextBytes(p)
        p
      }
      val withChange =
        if (oneOff) {
          val c = payloads.map(_.clone())
          c(nFrames / 2)(5) = (c(nFrames / 2)(5) ^ 0x5a).toByte
          c
        } else payloads
      val muxRnd = if (isDup) new scala.util.Random(id) else rnd
      val fullness = muxRnd.nextInt(0x800)
      val tag =
        if (isDup) {
          val t = new Array[Byte](64 + muxRnd.nextInt(64))
          muxRnd.nextBytes(t)
          Some(t)
        } else if (rnd.nextBoolean()) {
          val t = new Array[Byte](32 + rnd.nextInt(32))
          rnd.nextBytes(t)
          Some(t)
        } else None
      val content = Aac.build(withChange, srIdx, channels, fullness, tag)
      Media(id, "audio", content,
        MediaMeta("aac", None, None, Some(Aac.sampleRates(srIdx)), None))
    }
  }

  /** EXACT tag-invariant compressed-domain MP3 dedup (r12, the q155
    * keyframe-hash posture for audio): SHA-256 over the concatenated
    * FRAME PAYLOADS ([[Mp3.framePayloads]] — headers, CRCs, padding
    * and ID3 tags excluded), collapse identical payload sequences,
    * keep-smallest-id. One mapPartitions pass; only (id, 32-byte sig)
    * rows shuffle; unparsable audio survives as data.
    */
  def audioDedupByFramePayloadHash(media: Dataset[Media]): Dataset[Media] = {
    import media.sparkSession.implicits._
    val sigs: Dataset[KeyframeSig] = media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { m =>
        if (m.kind != "audio") None
        else {
          // Dispatch by the header AT the tag boundary: FLAC by magic;
          // MP3 and ADTS are mutually exclusive there (MP3 Layer III
          // carries nonzero layer bits exactly where ADTS requires
          // 00), and sniffing at the start — rather than try-walking
          // MP3 first — keeps MP3's lenient sync-scan from finding a
          // bogus header inside ADTS payload bytes.
          val flac = m.content.length > 4 && m.content(0) == 'f' &&
            m.content(1) == 'L' && m.content(2) == 'a' && m.content(3) == 'C'
          val ogg = m.content.length > 4 && m.content(0) == 'O' &&
            m.content(1) == 'g' && m.content(2) == 'g' && m.content(3) == 'S'
          val off = if (flac || ogg) 0 else Mp3.id3v2Size(m.content)
          val adts = !flac && !ogg && off >= 0 &&
            off + 7 <= m.content.length &&
            Aac.parseHeader(m.content, off).isDefined
          val ps =
            if (flac) Flac.audioSection(m.content).toSeq
            else if (ogg) Ogg.audioPackets(m.content).getOrElse(Nil)
            else if (adts) Aac.framePayloads(m.content)
            else Mp3.framePayloads(m.content)
          if (ps.isEmpty) None
          else {
            digest.reset()
            ps.foreach(digest.update)
            Some(KeyframeSig(m.media_id, digest.digest()))
          }
        }
      }
    }
    val losers = sigs.toDF()
      .groupBy(col("sig"))
      .agg(min(col("media_id")).as("_winner"),
        collect_list(col("media_id")).as("_ids"))
      .select(explode(col("_ids")).as("_loser"), col("_winner"))
      .filter(col("_loser") =!= col("_winner"))
      .select(col("_loser"))
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  /** DECODED-sample audio dedup (the r12 G.711 decode rung, the
    * exact-pixel posture for audio): decode AU / AIFF / AIFC / WAV —
    * PCM or G.711 µ-law/A-law — to linear 16-bit samples
    * ([[G711Audio.decodeAny]]) and SHA-256 over (rate, channels,
    * samples), collapse identical audio CONTENT across containers and
    * companding laws, keep-smallest-id. One mapPartitions pass; only
    * (id, 32-byte sig) rows shuffle; undecodable audio survives as
    * data.
    */
  def audioDedupByDecodedPcm(media: Dataset[Media]): Dataset[Media] = {
    import media.sparkSession.implicits._
    val sigs: Dataset[KeyframeSig] = media.mapPartitions { it =>
      it.flatMap { m =>
        // (rate, channels, interleaved 16-bit samples) — the format-
        // independent identity. FLAC joins the G.711 containers in
        // r13: a FLAC file and a WAV PCM16 of the same audio hash
        // identically (lossless ⇒ decoded == source). FLAC rows only
        // count when the frame CRC-16s pass and the STREAMINFO MD5
        // (when present) matches — a corrupt stream survives as data.
        // FLAC sniff AFTER skipping any leading ID3v2 tag (r14, advice
        // item: ID3-prefixed FLAC is common in real corpora and would
        // otherwise fall through to the G.711 parser and be silently
        // dropped from the face). The tag is identity-irrelevant here
        // by construction — the hash is over DECODED samples only, so
        // tagged and untagged copies of the same audio still collapse.
        val id3 = Mp3.id3v2Size(m.content)
        val c = if (id3 > 0 && id3 < m.content.length)
          java.util.Arrays.copyOfRange(m.content, id3, m.content.length)
        else m.content
        val pcm: Option[(Int, Int, Array[Short])] =
          if (m.kind != "audio") None
          else if (c.length > 4 && c(0) == 'f' && c(1) == 'L' &&
              c(2) == 'a' && c(3) == 'C')
            FlacDecode.decode(c).collect {
              case d if d.bitsPerSample == 16 && d.crcOk &&
                  d.md5Ok != Some(false) =>
                (d.sampleRate, d.channels, d.samples.map(_.toShort))
            }
          else G711Audio.decodeAny(m.content).map(dec =>
            (dec.info.sampleRate, dec.info.channels, dec.samples))
        pcm.map { case (rate, channels, samples) =>
          val digest = java.security.MessageDigest.getInstance("SHA-256")
          val head = java.nio.ByteBuffer.allocate(8)
            .putInt(rate).putInt(channels).array()
          digest.update(head)
          val body = java.nio.ByteBuffer.allocate(2 * samples.length)
          samples.foreach(body.putShort)
          digest.update(body.array())
          KeyframeSig(m.media_id, digest.digest())
        }
      }
    }
    val losers = sigs.toDF()
      .groupBy(col("sig"))
      .agg(min(col("media_id")).as("_winner"),
        collect_list(col("media_id")).as("_ids"))
      .select(explode(col("_ids")).as("_loser"), col("_winner"))
      .filter(col("_loser") =!= col("_winner"))
      .select(col("_loser"))
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  /** Synthetic G.711 corpus for the r12 audio DECODE rung: per-seed
    * waveforms companded to µ-law (even seeds) or A-law (odd seeds)
    * and carried in a rotating container — AU, AIFF-C, or WAV with
    * the matching G.711 format tag. Planted relations per decade:
    *   - id % 10 == 0 (id > 0): a WAV PCM16 twin holding id−1's
    *     companded bytes EXPANDED to linear — a byte-disjoint
    *     cross-container, cross-coding representation of identical
    *     content; collapsing the pair requires the G.711 expansion
    *     table and all container parses to be sample-exact;
    *   - id % 10 == 5: id−4's companded bytes with ONE code changed —
    *     a near-duplicate that must survive decoded-sample dedup.
    */
  def syntheticG711Audios(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val nudge = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (nudge) id - 4 else id
      val rnd = new scala.util.Random(seed * 163 + 31)
      val rate = 8000
      val nSamp = 1600 + rnd.nextInt(800)
      val law = if (seed % 2 == 0) "ulaw" else "alaw"
      // smooth two-tone waveform, companded through our own encoder
      val f1 = 110.0 + rnd.nextInt(500)
      val f2 = 700.0 + rnd.nextInt(1500)
      val companded = Array.tabulate(nSamp) { i =>
        val t = i.toDouble / rate
        val v = (9000 * math.sin(2 * math.Pi * f1 * t) +
          5000 * math.sin(2 * math.Pi * f2 * t + 1.3)).toInt
        (if (law == "ulaw") G711Audio.linearToUlaw(v)
         else G711Audio.linearToAlaw(v)).toByte
      }
      if (nudge) { // one companded code changed
        val pos = rnd.nextInt(nSamp)
        companded(pos) = (companded(pos) ^ 0x04).toByte
      }
      val (content, fmt) =
        if (isDup) {
          // WAV PCM16 twin of the EXPANDED samples
          val le = new Array[Byte](2 * nSamp)
          var i = 0
          while (i < nSamp) {
            val v = if (law == "ulaw") G711Audio.ulawToLinear(companded(i) & 0xff)
              else G711Audio.alawToLinear(companded(i) & 0xff)
            le(2 * i) = (v & 0xff).toByte
            le(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          (G711Audio.writeWav("pcm16", rate, 1, le), "wav")
        } else (seed % 3) match {
          case 0 => (G711Audio.writeAu(law, rate, 1, companded), "au")
          case 1 => (G711Audio.writeAiff(law, rate, 1, nSamp, companded), "aifc")
          case _ => (G711Audio.writeWav(law, rate, 1, companded), "wav")
        }
      Media(id, "audio", content,
        MediaMeta(fmt, None, None, Some(rate), Some(nSamp * 1000L / rate)))
    }
  }

  /** Synthetic FLAC corpus for the r13 audio DECODE rung 2
    * ([[FlacDecode]]): seeded mono/stereo 16-bit waveforms — tone
    * mixes, constant runs (CONSTANT subframes), 4x-scaled spans
    * (wasted bits), noise bursts (verbatim) — encoded to conformant
    * FLAC with per-frame subframe-type and stereo-decorrelation
    * choices and the STREAMINFO MD5 of the source PCM. Planted
    * relations per decade:
    *   - id % 10 == 0 (id > 0): a WAV PCM16 twin of id−1's SOURCE
    *     samples — byte-disjoint container AND codec (Rice/LPC vs raw
    *     LE) representations of identical audio; collapsing the pair
    *     under decoded-sample dedup requires every subframe type,
    *     Rice partition, and decorrelation mode to be sample-exact
    *     (FLAC is lossless: decoded ≡ source);
    *   - id % 10 == 5: id−4's waveform with ONE sample's LSB flipped —
    *     a near-duplicate that must survive.
    */
  def syntheticFlacDecodedAudios(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val isDup = id % 10 == 0 && id > 0
      val nudge = id % 10 == 5 && id >= 5
      val seed: Long = if (isDup) id - 1 else if (nudge) id - 4 else id
      val rnd = new scala.util.Random(seed * 181 + 53)
      val rate = 16000
      val stereo = seed % 2 == 1
      val nSamp = 1200 + rnd.nextInt(1000)
      def wave(phase: Double): Array[Int] = {
        val f1 = 100.0 + rnd.nextInt(600)
        val f2 = 900.0 + rnd.nextInt(2000)
        Array.tabulate(nSamp) { i =>
          val t = i.toDouble / rate
          val seg = (i / 160) % 4
          seg match {
            case 0 => (8000 * math.sin(2 * math.Pi * f1 * t + phase) +
              4000 * math.sin(2 * math.Pi * f2 * t)).toInt
            case 1 => 777 // constant run → CONSTANT subframes
            case 2 => ((3000 * math.sin(2 * math.Pi * f1 * t)).toInt / 4) * 4
              // shared trailing zeros → wasted bits
            case _ => rnd.nextInt(20000) - 10000 // noise → verbatim-ish
          }
        }
      }
      val channels =
        if (stereo) Array(wave(0.0), wave(0.7)) else Array(wave(0.3))
      if (nudge) { // one sample's LSB flipped: near-dup must survive
        val ch = rnd.nextInt(channels.length)
        val pos = rnd.nextInt(nSamp)
        channels(ch)(pos) ^= 1
      }
      val (content, fmt) =
        if (isDup) {
          // WAV PCM16 twin of the SOURCE samples (lossless ⇒ equals
          // the FLAC's decode), interleaved little-endian
          val le = new Array[Byte](2 * nSamp * channels.length)
          var i = 0
          while (i < nSamp) {
            var c = 0
            while (c < channels.length) {
              val v = channels(c)(i)
              val o = 2 * (i * channels.length + c)
              le(o) = (v & 0xff).toByte
              le(o + 1) = ((v >> 8) & 0xff).toByte
              c += 1
            }
            i += 1
          }
          (G711Audio.writeWav("pcm16", rate, channels.length, le), "wav")
        } else
          (FlacEncode.encode(channels, rate,
            blockSize = 128 << rnd.nextInt(3), seed = rnd.nextLong()), "flac")
      Media(id, "audio", content,
        MediaMeta(fmt, None, None, Some(rate), Some(nSamp * 1000L / rate)))
    }
  }

  /** Seeded 4×4-block-pattern JPEG frames — same pattern family as the
    * GIF generator (block structure survives lossy encode far better
    * than per-pixel noise, keeping frame hashes stable).
    */
  private def jpegBlockFrames(seed: Long, size: Int, frames: Int): Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    (0 until frames).map { _ =>
      val img = new java.awt.image.BufferedImage(
        size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var by = 0
      while (by < size) {
        var bx = 0
        while (bx < size) {
          val c = if (rnd.nextBoolean()) 0xffffff else 0x000000
          var y = by
          while (y < math.min(by + 4, size)) {
            var x = bx
            while (x < math.min(bx + 4, size)) { img.setRGB(x, y, c); x += 1 }
            y += 1
          }
          bx += 4
        }
        by += 4
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
  }

  case class VideoMeta(media_id: Long, container: String, codec: String,
      width: Int, height: Int, duration_ms: Long, n_frames: Int)

  case class AvcCodingFacts(media_id: Long, coding: String, width: Int,
      height: Int, profile_idc: Int, decodable_tier: Boolean)

  /** H.264 coding-structure census (r13): per-stream classification of
    * the SPS's frame/field structure — `progressive`
    * (frame_mbs_only), `paff` (field pictures may occur), `mbaff`
    * (per-MB-pair adaptive) — from Annex-B or mp4 `avcC` parameter
    * sets, no slice decode. PAFF/MBAFF DECODE remains a loud reject
    * (`decodable_tier` = false rows); this face exists so corpus
    * stats COUNT field-coded material instead of silently dropping
    * it. Streams without a parseable SPS are dropped (undecodable
    * blobs are data elsewhere; a census reports what it can see).
    */
  def avcCodingCensus(media: Dataset[Media]): Dataset[AvcCodingFacts] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "video").flatMap { m =>
        val sps: Option[H264.SpsInfo] =
          H264.probeAnnexB(m.content).orElse {
            for {
              avcc <- VideoContainers.mp4AvcC(m.content)
              (_, spss, _) <- H264.parseAvcC(avcc)
              s <- spss.iterator.flatMap(H264.parseSps(_)).nextOption()
            } yield s
          }
        sps.map(s => AvcCodingFacts(m.media_id, s.codingStructure,
          s.width, s.height, s.profileIdc,
          s.frameMbsOnly && s.chromaFormatIdc == 1))
      }
    }
  }

  /** Synthetic corpus for the r13 coding-structure census: one third
    * each REAL progressive IDR streams (decodable through the CAVLC
    * baseline), PAFF-capable field-coded streams, and MBAFF streams —
    * the latter two carrying conformant SPS/PPS parameter sets ahead
    * of opaque slice payloads (their slice decode is out of every
    * tier; the probe must still classify and count them).
    */
  def syntheticAvcFieldMixStreams(spark: SparkSession, n: Int,
      partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val rnd = new scala.util.Random(id * 193 + 71)
      val content = (id % 3) match {
        case 0 => // real decodable progressive IDR
          val means = Array.tabulate(2, 2)((y, x) =>
            40 + 20 * x + 30 * y + rnd.nextInt(17))
          H264Encode.encodeI16x16Dc(means, qp = 26)._1
        case k => // field-coded: PAFF (k = 1) or MBAFF (k = 2) SPS +
          // PPS + an opaque non-IDR slice payload
          val sps = H264.writeSps(64, 64, frameMbsOnly = false,
            mbAff = k == 2)
          val body = Array.fill(48 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
          H264Encode.annexB(Seq((7, 3, sps), (8, 3, H264.writePps()),
            (1, 2, body)))
      }
      Media(id, "video", content,
        MediaMeta("h264", Some(64), Some(64), None, Some(40L)))
    }
  }

  /** Container-level video metadata probe — codec fourcc, dimensions,
    * duration, frame count straight from the mp4 moov / avi hdrl headers,
    * NO frame decode (so it runs on any codec, including H.264 payloads
    * whose bitstreams this library can't decompress). The real form of
    * "typed metadata for an opaque binary column". Unparseable payloads
    * are dropped.
    */
  def probeVideosIO(media: Dataset[Media]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "video").flatMap { m =>
        (VideoContainers.sniff(m.content) match {
          case "mp4" => VideoContainers.probeMp4(m.content)
          case "avi" => VideoContainers.probeAvi(m.content)
          case _     => None
        }).map(i => VideoMeta(m.media_id, i.container, i.codec,
          i.width, i.height, i.durationMs, i.nFrames))
      }
    }
  }

  /** Injectable video-container decoder — the plug-in point for the
    * remaining codec tier (CABAC inter, B-slices, H.265: an
    * ffmpeg-class library's implementation drops in here with no change
    * to the pipeline — GIF, AVI/MJPEG, MP4/MJPEG, H.264 intra keyframes
    * in BOTH entropy codings, and CAVLC P-slice sequences already
    * decode for real via [[ContainerFrameDecoder]]).
    * Contract:
    *
    *  - `sampleFrames(content, maxFrames)` returns up to `maxFrames`
    *    evenly-spaced frames as PNG-encoded byte arrays (so sampled
    *    frames feed the real image path — [[imageAHash]] etc. — whatever
    *    the source container was), or Nil for payloads it can't read
    *    (undecodable blobs are data, not errors, at corpus scale).
    *  - implementations are `Serializable` and are serialized INTO the
    *    task closure: each task deserializes its own instance, so
    *    `@transient lazy` codec state initializes once per task and is
    *    never shared across threads — the one-codec-init-per-partition
    *    discipline without any thread-safety burden on the codec.
    */
  trait FrameDecoder extends Serializable {
    def sampleFrames(content: Array[Byte], maxFrames: Int): Seq[Array[Byte]]
  }

  /** The shipped default [[FrameDecoder]]: sniffs the container by magic
    * bytes and decodes GIF (ImageIO multi-frame reader), AVI/MJPEG and
    * MP4/MJPEG (pure-JDK container parsing, [[VideoContainers]] — each
    * sample is a complete JPEG decoded by the JDK reader), plus
    * H.264/AVC INTRA keyframes — both raw Annex-B payloads and avc1 mp4
    * sync samples — via the pure-Scala CAVLC baseline decoder
    * ([[H264Decode]], r7). Frames are evenly sampled and re-encoded PNG
    * so every container feeds the same image path. Still-undecodable
    * codecs (CABAC-inter H.264, B-slices, H.265, VP9, …) yield Nil —
    * that tier remains the injectable boundary.
    */
  class ContainerFrameDecoder extends FrameDecoder {
    private val gif = new GifFrameDecoder

    private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    private def sampleEven[T](all: Seq[T], maxFrames: Int): Seq[T] = {
      val n = all.length
      if (n == 0) Nil
      else {
        val take = math.min(maxFrames, n)
        (0 until take).map(i => all(if (take == 1) 0 else i * (n - 1) / (take - 1)))
      }
    }

    override def sampleFrames(content: Array[Byte], maxFrames: Int): Seq[Array[Byte]] =
      VideoContainers.sniff(content) match {
        case "gif" => gif.sampleFrames(content, maxFrames)
        case "avi" => sampleEven(VideoContainers.aviFrames(content), maxFrames).map(pngBytes)
        case "mp4" =>
          val mjpeg = sampleEven(VideoContainers.mp4Frames(content), maxFrames).map(pngBytes)
          if (mjpeg.nonEmpty) mjpeg
          else H264Decode.decodeMp4AvcKeyframes(content, maxFrames)
            .map(f => pngBytes(H264Decode.toGrayImage(f)))
        case "h264" =>
          // r8: picture SEQUENCES — the IDR plus following P pictures
          // (first maxFrames in decode order; inter pictures need their
          // reference, so "even sampling" would still decode them all)
          H264Decode.decodeAnnexBPictures(content, maxFrames)
            .map(f => pngBytes(H264Decode.toGrayImage(f)))
        case _ => Nil
      }
  }

  /** GIF-only [[FrameDecoder]]: JDK ImageIO multi-frame reader. The reader
    * is `@transient lazy`: created once per deserialized instance (= once
    * per task), re-bound per payload via `setInput`, never recreated
    * per row.
    */
  class GifFrameDecoder extends FrameDecoder {
    @transient private lazy val reader: Option[javax.imageio.ImageReader] = {
      val it = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
      if (it.hasNext) Some(it.next()) else None
    }

    override def sampleFrames(content: Array[Byte], maxFrames: Int): Seq[Array[Byte]] =
      reader match {
        case None => Nil
        case Some(r) =>
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(content))
            try {
              r.setInput(iis)
              val n = r.getNumImages(true)
              if (n < 1) Nil
              else {
                val take = math.min(maxFrames, n)
                (0 until take).map { i =>
                  val idx = if (take == 1) 0 else i * (n - 1) / (take - 1)
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(r.read(idx), "png", bos)
                  bos.toByteArray
                }
              }
            } finally iis.close()
          } catch { case _: Exception => Nil }
      }
  }

  /** REAL frame sampling for video payloads via a pluggable
    * [[FrameDecoder]] (default: the container-sniffing decoder — GIF,
    * AVI/MJPEG and MP4/MJPEG all decode; other codecs arrive by
    * injecting a codec-backed decoder, see the trait scaladoc).
    * mapPartitions keeps the batch shape; the decoder instance is task-
    * local, so its lazy codec state amortizes across the partition.
    * One row in, N frame rows out; unreadable payloads are dropped.
    */
  def sampleFramesIO(media: Dataset[Media], maxFrames: Int = 4,
      decoder: FrameDecoder = new ContainerFrameDecoder): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "video").flatMap { m =>
        decoder.sampleFrames(m.content, maxFrames).zipWithIndex.map {
          case (png, i) => VideoFrame(m.media_id, i, png)
        }
      }
    }
  }

  /** Near-duplicate VIDEO dedup on real decoded content: average-hash the
    * middle sampled frame of each GIF and run the shared signature dedup
    * — frame-identical re-encodes collapse, keep-smallest-id.
    */
  def videoDedupByFrameHash(media: Dataset[Media], maxDist: Int = 3): Dataset[Media] = {
    import media.sparkSession.implicits._
    val midFrames = sampleFramesIO(media, maxFrames = 3)
      .filter(_.frame_idx == 1)
      .map(f => Media(f.media_id, "image", f.frame, null))
    val sigs = imageAHash(midFrames).toDF()
      .select(col("media_id").as("_id"), col("ahash").as("_sig"))
    val losers = graft.operators.Dedup.signatureLosers(sigs, maxDist)
    media.join(losers, media("media_id") === losers("_loser"), "left_anti")
      .as[Media]
  }

  /** Deterministic (kind, id-bucket) partitioner: partition =
    * kindIndex * partitionsPerKind + media_id % partitionsPerKind, so every
    * partition holds exactly one modality — hash repartitioning can't
    * guarantee that (two (kind, bucket) combos may collide).
    */
  private class KindPartitioner(partitionsPerKind: Int, kinds: Seq[String])
      extends org.apache.spark.Partitioner {
    private val kindIdx = kinds.zipWithIndex.toMap
    override def numPartitions: Int = partitionsPerKind * kinds.size
    override def getPartition(key: Any): Int = key match {
      case (kind: String, id: Long) =>
        // fail loudly on a kind outside the declared set — silently mapping
        // it into another modality's partitions would defeat the
        // one-modality-per-partition guarantee this partitioner exists for
        val idx = kindIdx.getOrElse(kind,
          throw new IllegalArgumentException(
            s"unknown media kind '$kind'; declared kinds: ${kinds.mkString(",")}"))
        idx * partitionsPerKind +
          (((id % partitionsPerKind) + partitionsPerKind) % partitionsPerKind).toInt
    }
  }

  /** Partition-by-kind layout: co-locates each modality so per-partition
    * codec init is amortized partition-wide (images decode with the image
    * codec only, etc.) — the layout step before heavy decode at scale.
    * Uses an explicit Partitioner for a hard one-modality-per-partition
    * guarantee; this is genuine per-partition physical-layout logic, the
    * one place the RDD layer is the right tool.
    */
  def partitionByKind(media: Dataset[Media], partitionsPerKind: Int = 8,
      kinds: Seq[String] = Seq("audio", "image", "video")): Dataset[Media] = {
    import media.sparkSession.implicits._
    val parted = media.rdd
      .keyBy(m => (m.kind, m.media_id))
      .partitionBy(new KindPartitioner(partitionsPerKind, kinds))
      .values
    media.sparkSession.createDataset(parted)
  }
}
