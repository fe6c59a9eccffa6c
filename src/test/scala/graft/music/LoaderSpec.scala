package graft.music

import graft.SparkSpec

class LoaderSpec extends SparkSpec {
  import spark.implicits._

  test("A3: surrogate ids are dense, ordered, reproducible, honor high-water mark") {
    val df = Seq("b", "a", "c").toDF("name")
    val ids = Loader.withSurrogateIds(df, "id", Seq("name"), startAt = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ids == Set(("a", 5L), ("b", 6L), ("c", 7L)))
    // reproducible across repartitioning (monotonically_increasing_id is not)
    val again = Loader.withSurrogateIds(df.repartition(3), "id", Seq("name"), startAt = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == ids)
  }

  test("A1: createOrReplaceAll validates schemas and registers views") {
    val tables = SeedData.registerAll(spark)
    Loader.createOrReplaceAll(spark, tables) // idempotent re-registration
    assert(spark.sql("SELECT count(*) FROM Artist").head.getLong(0) == 2L)
    // schema mismatch rejected
    val bad = tables("Artist").withColumnRenamed("name", "artist_name")
    intercept[IllegalArgumentException] {
      Loader.createOrReplaceAll(spark, Map("Artist" -> bad))
    }
  }

  test("A1: file-loaded tables register (file sources force nullable=true)") {
    // regression: a nullable-strict schema check rejected EVERY
    // parquet/CSV round-trip, making the documented any-row-source path
    // unusable; NOT NULL belongs to the C1 audit, not the loader
    val dir = java.nio.file.Files.createTempDirectory("graft-loader").toString
    SeedData.load(spark, "Artist").write.mode("overwrite").parquet(s"$dir/a")
    val fromFile = spark.read.parquet(s"$dir/a")
    Loader.createOrReplaceAll(spark, Map("Artist" -> fromFile))
    assert(spark.sql("SELECT count(*) FROM Artist").head.getLong(0) == 2L)
    // type mismatch is still rejected
    import org.apache.spark.sql.functions.col
    val wrongType = fromFile.withColumn("artist_id", col("artist_id").cast("string"))
    intercept[IllegalArgumentException] {
      Loader.createOrReplaceAll(spark, Map("Artist" -> wrongType))
    }
    // restore the seed view for suites sharing the session
    Loader.createOrReplaceAll(spark, Map("Artist" -> SeedData.load(spark, "Artist")))
  }
}
