package graft.music

import org.apache.spark.sql.Row

import graft.SparkSpec

/** RQ1–RQ6 on the generated reference-scale dataset (500 songs / 100
  * users), differentially checked against an independent in-memory
  * implementation over the same generated collections (SURVEY.md §5.2
  * layer 2). Also re-runs the constraint audits at this scale.
  */
class MusicScaleSpec extends SparkSpec {

  lazy val data = MusicGen.generate(42L)
  lazy val tables = MusicGen.load(spark, data)
  lazy val queries = MusicQueries.all(tables)

  private def yearOf(d: java.sql.Date): Int = d.toLocalDate.getYear

  test("generated data passes every C1–C3 constraint audit") {
    assert(Constraints.violatedConstraints(tables).isEmpty)
  }

  test("RQ1 differential: individual artists' singles 2015–2020") {
    val singlesByArtist = data.songs
      .filter(s => s._4.isEmpty && s._5.exists(d => (2015 to 2020).contains(yearOf(d))))
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = data.artists
      .filter(_._3 == 0)
      .flatMap(a => singlesByArtist.get(a._1).map(n => (a._2, n)))
      .sortBy { case (name, n) => (-n, name) }
    val got = queries("rq1").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("RQ2 differential: artists whose last single was in 2020") {
    val expected = data.songs
      .filter(s => s._4.isEmpty && s._5.isDefined)
      .groupBy(_._2).view
      .mapValues(ss => ss.flatMap(_._5).map(yearOf).max)
      .filter(_._2 == 2020).keys
      .map(id => data.artists.find(_._1 == id).get._2).toSet
    val got = queries("rq2").collect().map(_.getString(0)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("RQ3 differential: genres by song count") {
    val counts = data.songGenres.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = data.genres
      .map(g => (g._2, counts.getOrElse(g._1, 0L)))
      .filter(_._2 > 0)
      .sortBy { case (name, n) => (-n, name) }
    val got = queries("rq3").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("RQ4 differential: artists with both albums and singles") {
    val albumOwners = data.albums.map(_._2).toSet
    val singleOwners = data.songs.filter(_._4.isEmpty).map(_._2).toSet
    val expected = data.artists
      .filter(a => albumOwners(a._1) && singleOwners(a._1)).map(_._2).toSet
    val got = queries("rq4").collect().map(_.getString(0)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("RQ5 differential: most-rated songs 2020–2021") {
    val inRange = data.ratings.filter(r => (2020 to 2021).contains(yearOf(r._3)))
    val bySong = inRange.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = bySong.toSeq.map { case (songId, n) =>
      val s = data.songs.find(_._1 == songId).get
      val artist = data.artists.find(_._1 == s._2).get._2
      (s._3, artist, n)
    }.sortBy { case (title, _, n) => (-n, title) }
    val got = queries("rq5").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("RQ6 differential: users who rated most songs 2020–2021") {
    val inRange = data.ratings.filter(r => (2020 to 2021).contains(yearOf(r._3)))
    val expected = inRange.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (u, n) => (-n, u) }
    val got = queries("rq6").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("SQL text agrees with DataFrame pipelines at scale") {
    tables
    for (name <- Seq("rq1", "rq3", "rq5", "rq6")) {
      assert(spark.sql(MusicSql.all(name)).collect().toSeq ==
        queries(name).collect().toSeq, s"disagreement in $name")
    }
    for (name <- Seq("rq2", "rq4")) {
      assert(spark.sql(MusicSql.all(name)).collect().toSet ==
        queries(name).collect().toSet, s"disagreement in $name")
    }
  }
}
