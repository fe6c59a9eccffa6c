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
}
