package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * carried as opaque `binary` columns with typed metadata structs, processed
  * by per-partition batch operators.
  *
  * The decode/resize/frame-sample kernels are STUBS — deterministic fakes
  * clearly marked below, because no image/audio codec libraries exist in
  * this container. Everything around them is real and tested: the schema
  * contract, the `mapPartitions` batch shape (one codec init per partition,
  * not per row), the partition-preserving plumbing, and the hand-off of
  * extracted features into the ANN operators ([[graft.operators.Similarity]]).
  * Swapping a stub for a real codec changes only the function body.
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
    * the payload; the real impl would seek+decode. One row in, N rows out —
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
