package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Media

/** Write the synthetic media corpora used by q56/q57/q58/q66 to parquet
  * input fixtures under fixtures/, and verify the round-trip is
  * byte-identical to the generators. The query paths read these via
  * [[Multimodal.fromFixtureOr]] (falling back to in-memory generation
  * when absent), so each bench/verify run skips the ~2k deterministic
  * ImageIO/container encodes that only exist to build the corpus.
  *
  * Usage: sbt "runMain graft.tools.GenMediaFixtures"
  */
object GenMediaFixtures {

  /** Corpus name → generator; the single definition both this tool and
    * the query paths rely on (via [[paths]]).
    */
  def corpora(spark: SparkSession): Seq[(String, Dataset[Media])] = Seq(
    "images_300" -> Multimodal.syntheticImages(spark, 300),
    "wavs_300" -> Multimodal.syntheticWavs(spark, 300),
    "gifs_200" -> Multimodal.syntheticGifs(spark, 200),
    "mp4avi_200" -> {
      import spark.implicits._
      Multimodal.syntheticAvis(spark, 100).unionByName(
        Multimodal.syntheticMp4s(spark, 200).filter(_.media_id >= 100))
    },
    "avc_200" -> Multimodal.syntheticAvcMp4s(spark, 200),
    "avcpix_200" -> Multimodal.syntheticAvcPixelMp4s(spark, 200),
    "avcmot_200" -> Multimodal.syntheticAvcMotionStreams(spark, 200),
    "avcent_200" -> Multimodal.syntheticAvcEntropyMp4s(spark, 200),
    "avcme_200" -> Multimodal.syntheticAvcMotionEntropyStreams(spark, 200),
    "avcb_200" -> Multimodal.syntheticAvcBidirStreams(spark, 200),
    "avcb8_200" -> Multimodal.syntheticAvcB8x8Streams(spark, 200),
    "avcw_200" -> Multimodal.syntheticAvcFadeStreams(spark, 200),
    "avcmr_200" -> Multimodal.syntheticAvcMultiRefStreams(spark, 200),
    "avcdb_200" -> Multimodal.syntheticAvcDeblockStreams(spark, 200),
    "hevcpix_200" -> Multimodal.syntheticHevcPixelStreams(spark, 200),
    "hevcres_200" -> Multimodal.syntheticHevcResidualStreams(spark, 200),
    "hevcdb_200" -> Multimodal.syntheticHevcDeblockStreams(spark, 200),
    "avcms_200" -> Multimodal.syntheticAvcMultiSliceStreams(spark, 200),
    "hevcp_200" -> Multimodal.syntheticHevcInterStreams(spark, 200),
    "g711_200" -> Multimodal.syntheticG711Audios(spark, 200),
    "aac_200" -> Multimodal.syntheticAacAdts(spark, 200),
    "avclt_200" -> Multimodal.syntheticAvcLongTermStreams(spark, 200),
    "flac_200" -> Multimodal.syntheticFlacs(spark, 200),
    "hevcsao_200" -> Multimodal.syntheticHevcSaoStreams(spark, 200),
    "hevcbi_200" -> Multimodal.syntheticHevcBidirStreams(spark, 200),
    "flacdec_200" -> Multimodal.syntheticFlacDecodedAudios(spark, 200),
    "avcfield_120" -> Multimodal.syntheticAvcFieldMixStreams(spark, 120),
    "hevcwp_200" -> Multimodal.syntheticHevcWpStreams(spark, 200),
    "hevcmr_200" -> Multimodal.syntheticHevcMultiRefStreams(spark, 200),
    "hevcremux_200" -> Multimodal.syntheticHevcRemuxStreams(spark, 200),
    "opus_200" -> Multimodal.syntheticOggOpus(spark, 200),
    "mp3_200" -> Multimodal.syntheticMp3s(spark, 200),
    "hevc_200" -> Multimodal.syntheticHevcMp4s(spark, 200),
  )

  def path(name: String): String = s"/root/repo/fixtures/media_$name.parquet"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // optional name filter: regenerate only the listed corpora
    val pick = args.headOption.map(_.split(",").toSet)
    corpora(spark).filter(c => pick.forall(_.contains(c._1)))
      .foreach { case (name, gen) =>
      val p = path(name)
      gen.write.mode("overwrite").parquet(p)
      // round-trip audit: every (id, content) pair byte-identical
      val back = spark.read.parquet(p).as[Media]
        .map(m => (m.media_id, m.content.toSeq)).collect().toMap
      val src = gen.map(m => (m.media_id, m.content.toSeq)).collect().toMap
      require(back == src, s"fixture $name round-trip mismatch")
      println(s"$name: ${back.size} rows -> $p (byte-identical)")
    }
    spark.stop()
  }
}
