package graft.music

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's 6 analytical queries (RQ1–RQ6, /root/reference/Queries:1–57)
  * as DataFrame pipelines, re-expressed Spark-first.
  *
  * MySQL's functional-dependency GROUP BY (selecting `a.name` while grouping
  * by the PK `a.artist_id`, e.g. Queries:3+9) is illegal in Spark/standard
  * SQL; per SURVEY.md §7.5 the rewrite groups by PK **plus** the FD columns —
  * exact, since the extra columns are functionally dependent on the key.
  *
  * Scale notes: Artist/Genre/User are dimension tables → Catalyst broadcasts
  * them; the fact side (Song/Rating at reference scale, or far larger in an
  * extended deployment) shuffles only for the final aggregate, with map-side
  * partial aggregation. Filters (`is_group`, `album_id IS NULL`, year ranges)
  * sit before the joins so they push into the scan.
  */
object MusicQueries {

  /** RQ1 (Queries:1–10) — individual artists with most singles 2015–2020. */
  def rq1MostSingles(artist: DataFrame, song: DataFrame): DataFrame =
    artist.filter(col("is_group") === 0)
      .join(
        song.filter(col("album_id").isNull &&
          year(col("single_release_date")).between(2015, 2020)),
        Seq("artist_id"))
      .groupBy(col("artist_id"), col("name")) // FD rewrite: PK + dependent col
      .agg(count(col("song_id")).as("num_singles"))
      .select(col("name"), col("num_singles"))
      .orderBy(col("num_singles").desc, col("name").asc)

  /** RQ2 (Queries:12–19) — artists whose last single was released in 2020. */
  def rq2LastSingle2020(artist: DataFrame, song: DataFrame): DataFrame =
    artist
      .join(song.filter(col("album_id").isNull), Seq("artist_id"))
      .groupBy(col("artist_id"), col("name"))
      .agg(max(year(col("single_release_date"))).as("last_y"))
      .filter(col("last_y") === 2020)
      .select(col("name"))

  /** RQ3 (Queries:21–27) — genres with the most songs. */
  def rq3GenresMostSongs(genre: DataFrame, songGenre: DataFrame): DataFrame =
    genre
      .join(songGenre, Seq("genre_id"))
      .groupBy(col("genre_id"), col("name"))
      .agg(count(col("song_id")).as("num_songs"))
      .select(col("name").as("genre"), col("num_songs"))
      .orderBy(col("num_songs").desc, col("genre").asc)

  /** RQ4 (Queries:29–38) — artists with both albums and singles; the two
    * IN-subqueries become chained left-semi joins (what Catalyst's
    * RewritePredicateSubquery would emit).
    */
  def rq4AlbumsAndSingles(artist: DataFrame, album: DataFrame, song: DataFrame): DataFrame =
    artist
      .join(album.select(col("artist_id")).distinct(), Seq("artist_id"), "left_semi")
      .join(
        song.filter(col("album_id").isNull).select(col("artist_id")).distinct(),
        Seq("artist_id"), "left_semi")
      .select(col("name"))

  /** RQ5 (Queries:40–48) — songs with the most ratings 2020–2021.
    * 3-way join; COUNT(r.rating) keeps null-skip semantics (A20).
    */
  def rq5MostRatedSongs(rating: DataFrame, song: DataFrame, artist: DataFrame): DataFrame =
    rating.filter(year(col("rating_date")).between(2020, 2021))
      .join(song, Seq("song_id"))
      .join(artist.withColumnRenamed("name", "artist_name"), Seq("artist_id"))
      .groupBy(col("song_id"), col("title"), col("artist_name"))
      .agg(count(col("rating")).as("num_ratings"))
      .select(col("title"), col("artist_name").as("artist"), col("num_ratings"))
      .orderBy(col("num_ratings").desc, col("title").asc)

  /** RQ6 (Queries:50–57) — users who rated the most songs 2020–2021. */
  def rq6TopRaters(user: DataFrame, rating: DataFrame): DataFrame =
    user
      .join(rating.filter(year(col("rating_date")).between(2020, 2021)), Seq("username"))
      .groupBy(col("username"))
      .agg(count(col("song_id")).as("num_ratings"))
      .orderBy(col("num_ratings").desc, col("username").asc)

  /** RQ1 under MySQL's default utf8mb4 case-insensitive collation.
    *
    * The reference runs on MySQL, whose default collation makes `ORDER BY
    * name` compare case-insensitively; the repo's canonical rq1/rq3
    * standardize on binary collation for cross-engine determinism
    * (documented divergence, SURVEY §1.4). This variant closes that last
    * dialect gap: name tie-breaks go through Spark 4's `UNICODE_CI`
    * collation, reproducing MySQL's ordering of case-mixed names. A
    * trailing binary key keeps names EQUAL under CI ('Drake'/'drake')
    * deterministically ordered — MySQL leaves those implementation-
    * ordered, so any such order is reference-compatible.
    */
  def rq1MostSinglesCI(artist: DataFrame, song: DataFrame): DataFrame =
    rq1MostSingles(artist, song) // outer Sort supersedes the inner one
      .orderBy(col("num_singles").desc,
        collate(col("name"), "UNICODE_CI").asc, col("name").asc)

  /** RQ3 under MySQL's case-insensitive collation — see [[rq1MostSinglesCI]]. */
  def rq3GenresMostSongsCI(genre: DataFrame, songGenre: DataFrame): DataFrame =
    rq3GenresMostSongs(genre, songGenre)
      .orderBy(col("num_songs").desc,
        collate(col("genre"), "UNICODE_CI").asc, col("genre").asc)

  /** All six, bound to a loaded table set (e.g. [[SeedData.registerAll]]). */
  def all(t: Map[String, DataFrame]): Map[String, DataFrame] = Map(
    "rq1" -> rq1MostSingles(t("Artist"), t("Song")),
    "rq2" -> rq2LastSingle2020(t("Artist"), t("Song")),
    "rq3" -> rq3GenresMostSongs(t("Genre"), t("Song_genre")),
    "rq4" -> rq4AlbumsAndSingles(t("Artist"), t("Album"), t("Song")),
    "rq5" -> rq5MostRatedSongs(t("Rating"), t("Song"), t("Artist")),
    "rq6" -> rq6TopRaters(t("User"), t("Rating")))
}
