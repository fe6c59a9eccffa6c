package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(spark, 60, partitions = 4).cache()

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
}
