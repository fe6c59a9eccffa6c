package graft.music

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Golden end-to-end tests: RQ1–RQ6 on the reference's shipped 13-row seed.
  * Expected outputs hand-derived in FIXTURES.md §3 (notably RQ1 = empty:
  * the only individual artist's single is dated 2021-01-01, outside
  * 2015–2020).
  */
class MusicGoldenSpec extends SparkSpec {

  lazy val tables = SeedData.registerAll(spark)
  lazy val queries = MusicQueries.all(tables)

  test("RQ1: individual artists with most singles 2015–2020 — empty on seed") {
    assert(queries("rq1").collect().isEmpty)
  }

  test("RQ2: artists whose last single was in 2020 — Band1") {
    assert(queries("rq2").collect().toSeq == Seq(Row("Band1")))
  }

  test("RQ3: genres with most songs — Pop/Rock tie, name ASC tie-break") {
    assert(queries("rq3").collect().toSeq ==
      Seq(Row("Pop", 1L), Row("Rock", 1L)))
  }

  test("RQ4: artists with both albums and singles — Band1") {
    assert(queries("rq4").collect().toSeq == Seq(Row("Band1")))
  }

  test("RQ5: most-rated songs 2020–2021 — both songs, title ASC tie-break") {
    assert(queries("rq5").collect().toSeq ==
      Seq(Row("Song1", "A1", 1L), Row("Song2", "Band1", 1L)))
  }

  test("RQ6: users who rated most songs 2020–2021 — tie, username ASC") {
    assert(queries("rq6").collect().toSeq ==
      Seq(Row("user1", 1L), Row("user2", 1L)))
  }

  test("seed data passes every C1–C3 constraint audit") {
    assert(Constraints.violatedConstraints(tables).isEmpty)
  }

  test("audits catch injected violations (corrupted data)") {
    import org.apache.spark.sql.functions._
    val t = tables
    // C2: duplicate a PK value
    val dupArtist = t("Artist").union(t("Artist").limit(1))
    assert(!Constraints.keyViolations(dupArtist, Seq("artist_id")).isEmpty)
    // C3: orphan FK — rating pointing at a song that doesn't exist
    val badRating = t("Rating").withColumn("song_id", lit(999))
    assert(!Constraints
      .orphanViolations(badRating, Seq("song_id"), t("Song"), Seq("song_id"))
      .isEmpty)
    // C3 null-skip: a NULL album_id (single) is NOT an orphan
    assert(Constraints
      .orphanViolations(t("Song"), Seq("album_id"), t("Album"), Seq("album_id"))
      .isEmpty)
  }

  test("varchar length audit: over-limit strings flagged, seed passes, nulls skipped") {
    import org.apache.spark.sql.functions._
    val t = tables
    // seed respects every DDL varchar(n) limit — auditAll now includes C5
    val c5Keys = Constraints.auditAll(t).keySet.filter(_.contains("varchar"))
    assert(c5Keys == Set(
      "Artist.varchar(name≤200)", "Genre.varchar(name≤100)",
      "Album.varchar(title≤200)", "User.varchar(username≤50)",
      "Song.varchar(title≤200)", "Rating.varchar(username≤50)"))
    assert(Constraints.violatedConstraints(t).isEmpty)
    // corrupt: a 201-char artist name violates varchar(200)
    val longName = t("Artist").withColumn("name",
      when(col("artist_id") === 1, lit("x" * 201)).otherwise(col("name")))
    assert(Constraints.lengthViolations(longName, "name", 200).count() == 1)
    // boundary: exactly 200 CHARACTERS passes even when multi-byte in UTF-8
    // (MySQL varchar(n) counts characters, not bytes)
    val atLimit = t("Artist").withColumn("name",
      when(col("artist_id") === 1, lit("é" * 200)).otherwise(col("name")))
    assert(Constraints.lengthViolations(atLimit, "name", 200).isEmpty)
    // nulls are C1's concern, not C5's
    val withNull = t("Song").withColumn("title",
      when(col("song_id") === 1, lit(null: String)).otherwise(col("title")))
    assert(Constraints.lengthViolations(withNull, "title", 200).isEmpty)
  }

  test("domain audit: rating outside 1..5 is flagged, in-range is not") {
    import org.apache.spark.sql.functions._
    val t = tables
    assert(Constraints.domainViolations(t("Rating"), "rating", 1L, 5L).isEmpty)
    val bad = t("Rating").withColumn("rating", lit(9).cast("byte"))
    assert(Constraints.domainViolations(bad, "rating", 1L, 5L).count() == 2)
    // set-valued form agrees
    assert(Constraints.domainViolations(t("Rating"), "rating",
      Seq(1, 2, 3, 4, 5).map(_.toByte)).isEmpty)
  }

  test("invariant audits: song-has-genre and album-track-genre consistency") {
    import org.apache.spark.sql.functions._
    val t = tables
    // seed satisfies both (pdf p.5)
    assert(Constraints.songsWithoutGenre(t("Song"), t("Song_genre")).isEmpty)
    assert(Constraints.albumTrackGenreMismatches(
      t("Song"), t("Song_genre"), t("Album")).isEmpty)
    // corrupt 1: a song with no genre link
    val noLink = t("Song_genre").filter(col("song_id") =!= 1)
    assert(Constraints.songsWithoutGenre(t("Song"), noLink).count() == 1)
    // corrupt 2: put song 1 on Album1 (genre Pop=1) but with only a Rock
    // link -> inconsistent; song 2 on the album with its matching genre is
    // NOT flagged
    val onAlbum = t("Song").withColumn("album_id",
      when(col("song_id") === 1, lit(1)).otherwise(col("album_id")))
    val rockOnly = t("Song_genre").withColumn("genre_id",
      when(col("song_id") === 1, lit(2).cast("short")).otherwise(col("genre_id")))
    assert(Constraints.albumTrackGenreMismatches(onAlbum, rockOnly, t("Album"))
      .count() == 1)
  }

  test("case-insensitive unique audit: 'Drake'/'drake' collide only under CI") {
    import spark.implicits._
    val artists = Seq((1, "Drake", 0), (2, "drake", 0))
      .toDF("artist_id", "name", "is_group")
    assert(Constraints.keyViolations(artists, Seq("name")).isEmpty)
    assert(Constraints.keyViolationsCI(artists, Seq("name")).count() == 1)
    // composite mixed-type keys still work (string part CI, int part exact)
    val mixed = Seq((1, "A", 10), (1, "a", 10), (2, "a", 10))
      .toDF("k1", "name", "v")
    assert(Constraints.keyViolationsCI(mixed, Seq("k1", "name")).count() == 1)
  }

  test("CI-collation query variants: MySQL-style name tie-breaks on a case-mixed fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // three artists, one 2016 single each → rq1 ties entirely on name.
    // Binary order: ALPHA < Zeta < beta (uppercase sorts before lowercase);
    // MySQL's utf8mb4 CI order: ALPHA < beta < Zeta.
    val artist = Seq((1, "beta", 0), (2, "ALPHA", 0), (3, "Zeta", 0))
      .toDF("artist_id", "name", "is_group")
    val song = Seq(
      (10, 1, "s1"), (11, 2, "s2"), (12, 3, "s3"))
      .map { case (sid, aid, t) => (sid, aid, t, null.asInstanceOf[Integer],
        java.sql.Date.valueOf("2016-06-01")) }
      .toDF("song_id", "artist_id", "title", "album_id", "single_release_date")

    val binary = MusicQueries.rq1MostSingles(artist, song)
      .select("name").as[String].collect().toSeq
    val ci = MusicQueries.rq1MostSinglesCI(artist, song)
      .select("name").as[String].collect().toSeq
    assert(binary == Seq("ALPHA", "Zeta", "beta"))
    assert(ci == Seq("ALPHA", "beta", "Zeta"))

    // CI-EQUAL names ('Drake'/'drake') stay adjacent and deterministic
    // (trailing binary key): MySQL's order among them is undefined, so
    // this specific order is reference-compatible.
    val dupArtist = artist.union(Seq((4, "Drake", 0), (5, "drake", 0))
      .toDF("artist_id", "name", "is_group"))
    val dupSong = song.union(Seq(
      (13, 4, "s4", null.asInstanceOf[Integer], java.sql.Date.valueOf("2016-06-01")),
      (14, 5, "s5", null.asInstanceOf[Integer], java.sql.Date.valueOf("2016-06-01")))
      .toDF("song_id", "artist_id", "title", "album_id", "single_release_date"))
    val ciDup = MusicQueries.rq1MostSinglesCI(dupArtist, dupSong)
      .select("name").as[String].collect().toSeq
    assert(ciDup == Seq("ALPHA", "beta", "Drake", "drake", "Zeta"))

    // rq3: same dialect difference through the genre name
    val genre = Seq((1, "beta"), (2, "ALPHA"), (3, "Zeta")).toDF("genre_id", "name")
    val sg = Seq((10, 1), (11, 2), (12, 3)).toDF("song_id", "genre_id")
    assert(MusicQueries.rq3GenresMostSongs(genre, sg)
      .select("genre").as[String].collect().toSeq == Seq("ALPHA", "Zeta", "beta"))
    assert(MusicQueries.rq3GenresMostSongsCI(genre, sg)
      .select("genre").as[String].collect().toSeq == Seq("ALPHA", "beta", "Zeta"))
  }

  test("full audit run on seed includes the semantic audits and stays clean") {
    assert(Constraints.violatedConstraints(tables).isEmpty)
    assert(Constraints.auditAll(tables).keySet.exists(_.contains("Rating.domain")))
    assert(Constraints.auditAll(tables).contains("Song.has_genre"))
    assert(Constraints.auditAll(tables).contains("Song.album_genre_consistency"))
  }
}
