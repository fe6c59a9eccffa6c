package graft.music

/** RQ1–RQ6 as Spark SQL text (the second entry path of SURVEY.md §3.2;
  * §7.1 step 4 requires the SQL and DataFrame forms to agree).
  *
  * These are NOT copies of the reference SQL: MySQL's functional-dependency
  * GROUP BY (grouping by a PK while selecting dependent columns,
  * Queries:9, 18, 26, 47) is illegal in Spark, so the groupings add the
  * dependent columns explicitly (§7.5) — exact, because they are
  * functionally dependent on the grouped key. Queries run against the
  * views registered by [[SeedData.registerAll]] / [[Loader.createOrReplaceAll]].
  */
object MusicSql {

  val rq1: String =
    """SELECT a.name, COUNT(s.song_id) AS num_singles
      |FROM Artist a JOIN Song s ON a.artist_id = s.artist_id
      |WHERE a.is_group = 0 AND s.album_id IS NULL
      |  AND YEAR(s.single_release_date) BETWEEN 2015 AND 2020
      |GROUP BY a.artist_id, a.name
      |ORDER BY num_singles DESC, a.name ASC""".stripMargin

  val rq2: String =
    """SELECT name FROM (
      |  SELECT a.artist_id, a.name,
      |         MAX(YEAR(s.single_release_date)) AS last_y
      |  FROM Artist a JOIN Song s ON a.artist_id = s.artist_id
      |  WHERE s.album_id IS NULL
      |  GROUP BY a.artist_id, a.name) t
      |WHERE last_y = 2020""".stripMargin

  val rq3: String =
    """SELECT g.name AS genre, COUNT(sg.song_id) AS num_songs
      |FROM Genre g JOIN Song_genre sg ON g.genre_id = sg.genre_id
      |GROUP BY g.genre_id, g.name
      |ORDER BY num_songs DESC, genre ASC""".stripMargin

  val rq4: String =
    """SELECT a.name FROM Artist a
      |WHERE a.artist_id IN (SELECT DISTINCT artist_id FROM Album)
      |  AND a.artist_id IN (SELECT DISTINCT artist_id FROM Song WHERE album_id IS NULL)""".stripMargin

  val rq5: String =
    """SELECT s.title, ar.name AS artist, COUNT(r.rating) AS num_ratings
      |FROM Rating r
      |JOIN Song s ON r.song_id = s.song_id
      |JOIN Artist ar ON s.artist_id = ar.artist_id
      |WHERE YEAR(r.rating_date) BETWEEN 2020 AND 2021
      |GROUP BY s.song_id, s.title, ar.name
      |ORDER BY num_ratings DESC, s.title ASC""".stripMargin

  val rq6: String =
    """SELECT u.username, COUNT(r.song_id) AS num_ratings
      |FROM User u JOIN Rating r ON u.username = r.username
      |WHERE YEAR(r.rating_date) BETWEEN 2020 AND 2021
      |GROUP BY u.username
      |ORDER BY num_ratings DESC, u.username ASC""".stripMargin

  val all: Map[String, String] = Map(
    "rq1" -> rq1, "rq2" -> rq2, "rq3" -> rq3,
    "rq4" -> rq4, "rq5" -> rq5, "rq6" -> rq6)
}
