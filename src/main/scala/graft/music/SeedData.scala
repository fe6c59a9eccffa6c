package graft.music

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The reference dump's 13 seed rows as Scala literals
  * (/root/reference/music_db.sql:14–110; FIXTURES.md §2), loaded as
  * DataFrames with the explicit [[MusicSchema]] StructTypes — never inferred.
  *
  * The dump's `SET FOREIGN_KEY_CHECKS = 0/1` bulk-load mode (sql:2,113) maps
  * to Spark's naturally constraint-free load; referential integrity is
  * re-established by the post-load [[Constraints]] audits (SURVEY.md A4).
  */
object SeedData {

  private def d(s: String): Date = Date.valueOf(s)
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** table name → seed rows (verbatim from the dump). */
  val rows: Map[String, Seq[Row]] = Map(
    "Artist" -> Seq( // music_db.sql:14–16
      Row(1, "A1", 0.toByte),
      Row(2, "Band1", 1.toByte)),
    "Genre" -> Seq( // sql:27–29
      Row(1.toShort, "Pop"),
      Row(2.toShort, "Rock")),
    "Album" -> Seq( // sql:46–47
      Row(1, 2, "Album1", d("2020-01-01"), 1.toShort)),
    "User" -> Seq( // sql:57–59
      Row("user1", ts("2025-11-23 20:55:24")),
      Row("user2", ts("2025-11-23 20:55:24"))),
    "Song" -> Seq( // sql:76–78 — both songs are singles (album_id NULL)
      Row(1, 1, "Song1", null, d("2021-01-01")),
      Row(2, 2, "Song2", null, d("2020-06-15"))),
    "Song_genre" -> Seq( // sql:91–93
      Row(1, 1.toShort),
      Row(2, 2.toShort)),
    "Rating" -> Seq( // sql:108–110
      Row("user1", 1, d("2021-05-01"), 5.toByte),
      Row("user2", 2, d("2020-07-01"), 4.toByte)))

  def load(spark: SparkSession, table: String): DataFrame = {
    val t = MusicSchema.byName(table)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows(table), numSlices = 1), t.schema)
  }

  /** Load every table and register it as a temp view under its DDL name. */
  def registerAll(spark: SparkSession): Map[String, DataFrame] =
    MusicSchema.all.map { t =>
      val df = load(spark, t.name)
      df.createOrReplaceTempView(t.name)
      t.name -> df
    }.toMap
}
