package graft.music

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic generator for a reference-scale music dataset: 500 songs,
  * 100 users (the scale README.md:5 claims; the shipped dump is truncated
  * to 13 rows — SURVEY.md §1.3). Seed-fixed, FK-consistent, and exercising
  * every semantic the schema encodes: groups vs individuals, singles vs
  * album tracks (album_id/single_release_date complementary nullability,
  * pdf p.4), multi-genre songs, re-ratings on different days, users with
  * zero ratings (pdf p.5).
  *
  * Also exposes [[rows]] as plain Scala collections so tests can compute
  * expected query results independently of Spark (in-memory differential
  * oracle, SURVEY.md §5.2 layer 2).
  */
object MusicGen {

  final case class Data(
      artists: Seq[(Int, String, Byte)],
      genres: Seq[(Short, String)],
      albums: Seq[(Int, Int, String, Date, Short)],
      users: Seq[(String, Timestamp)],
      songs: Seq[(Int, Int, String, Option[Int], Option[Date])],
      songGenres: Seq[(Int, Short)],
      ratings: Seq[(String, Int, Date, Byte)])

  /** `scale` multiplies every collection's cardinality (genres stay 8 —
    * genre count is a domain constant, so genre GROUPS grow in size, the
    * audit-relevant direction). scale = 1 reproduces the historical draw
    * sequence byte-for-byte (the golden fixtures depend on it); the
    * expressions below keep the same random-call order at any scale.
    */
  def generate(seed: Long = 42L, scale: Int = 1): Data = {
    val rnd = new scala.util.Random(seed)
    def date(y: Int, m: Int, d: Int) = Date.valueOf(f"$y-$m%02d-$d%02d")

    val nArtists = 20 * scale
    val artists = (1 to nArtists).map { i =>
      (i, s"Artist$i", (if (i % 4 == 0) 1 else 0).toByte) // every 4th is a group
    }
    val genres = (1 to 8).map(i => (i.toShort, s"Genre$i"))

    // 60·scale albums over 2010–2022, ≤1 per (artist, title) by construction
    val albums = (1 to 60 * scale).map { i =>
      val artist = 1 + rnd.nextInt(nArtists)
      (i, artist, s"Album$i", date(2010 + rnd.nextInt(13), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28)),
        (1 + rnd.nextInt(8)).toShort)
    }
    val users = (1 to 100 * scale).map { i =>
      (s"user$i", Timestamp.valueOf(f"20${10 + i % 15}%02d-01-01 00:00:00"))
    }
    // 500 songs: ~40% singles (album_id NULL + single date), 60% album
    // tracks (album_id set, single date NULL — date inherited from album)
    // grouped once instead of filtered per song (O(songs·albums) at
    // scale 100 otherwise); Seq#groupBy preserves in-group order, so the
    // selected album — and every random draw — matches the filter form
    val albumsByArtist = albums.groupBy(_._2)
    val songs = (1 to 500 * scale).map { i =>
      val artist = 1 + rnd.nextInt(nArtists)
      if (rnd.nextDouble() < 0.4) {
        (i, artist, s"Song$i", Option.empty[Int],
          Some(date(2010 + rnd.nextInt(13), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28))))
      } else {
        // album track: pick an album of the SAME artist when one exists
        val owned = albumsByArtist.getOrElse(artist, Seq.empty)
        val album = if (owned.nonEmpty) owned(rnd.nextInt(owned.size))
                    else albums(rnd.nextInt(albums.size))
        (i, album._2, s"Song$i", Some(album._1), Option.empty[Date])
      }
    }
    // every song gets 1–3 distinct genres, and album tracks ALWAYS carry
    // their album's genre first (both app-enforced invariants, pdf p.5 —
    // audited by Constraints.songsWithoutGenre /
    // albumTrackGenreMismatches)
    val songGenres = songs.flatMap { s =>
      val albumGenre = s._4.map(aid => albums(aid - 1)._5) // album ids are 1..60 in order
      val n = 1 + rnd.nextInt(3)
      val extra = rnd.shuffle((1 to 8).toList).map(_.toShort)
        .filterNot(albumGenre.contains)
      (albumGenre.toList ++ extra).take(n).map(g => (s._1, g))
    }
    // ~2000 ratings 2019–2022; composite PK (user, song, date) kept unique;
    // users 95–100 never rate (zero-rating users must survive outer joins)
    val ratings = {
      val seen = scala.collection.mutable.Set[(String, Int, Date)]()
      (1 to 2200 * scale).flatMap { _ =>
        val u = s"user${1 + rnd.nextInt(94 * scale)}"
        val s = 1 + rnd.nextInt(500 * scale)
        val d = date(2019 + rnd.nextInt(4), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28))
        if (seen.add((u, s, d))) Some((u, s, d, (1 + rnd.nextInt(5)).toByte)) else None
      }
    }
    Data(artists, genres, albums, users, songs, songGenres, ratings)
  }

  /** Load as DataFrames with the declared schemas, registered as views. */
  def load(spark: SparkSession, data: Data): Map[String, DataFrame] = {
    def df(name: String, rows: Seq[Row]): DataFrame = {
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), MusicSchema.byName(name).schema)
      d.createOrReplaceTempView(name)
      d
    }
    Map(
      "Artist" -> df("Artist", data.artists.map(a => Row(a._1, a._2, a._3))),
      "Genre" -> df("Genre", data.genres.map(g => Row(g._1, g._2))),
      "Album" -> df("Album", data.albums.map(a => Row(a._1, a._2, a._3, a._4, a._5))),
      "User" -> df("User", data.users.map(u => Row(u._1, u._2))),
      "Song" -> df("Song", data.songs.map(s => Row(s._1, s._2, s._3, s._4.orNull, s._5.orNull))),
      "Song_genre" -> df("Song_genre", data.songGenres.map(sg => Row(sg._1, sg._2))),
      "Rating" -> df("Rating", data.ratings.map(r => Row(r._1, r._2, r._3, r._4))))
  }
}
