package graft.music

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constraint audits replacing MySQL's enforced DDL constraints
  * (SURVEY.md §2.1 rows C1–C3). Spark enforces nothing on read; these jobs
  * return the VIOLATING rows, so "constraint holds" ⇔ returned frame is
  * empty. Every audit is a distributed plan — no collect-to-driver — so the
  * same audits run unchanged over 100 TB: C1 is a scan with a pushed-down
  * null filter, C2 a partial+final hash aggregate, C3 a (broadcastable)
  * left-anti join on the FK key.
  */
object Constraints {

  import MusicSchema.TableDef

  /** C1 — NOT NULL: rows with a null in any non-nullable column. */
  def notNullViolations(df: DataFrame, t: TableDef): DataFrame = {
    val required = t.schema.fields.filterNot(_.nullable).map(_.name)
    if (required.isEmpty) df.limit(0)
    else df.filter(required.map(col(_).isNull).reduce(_ || _))
  }

  /** C2 — PK/UNIQUE: duplicated key tuples (incl. composite keys,
    * music_db.sql:40, 70, 85, 102). Returns (keyCols…, dup_count) per
    * violated key value.
    */
  def keyViolations(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** C3 — FOREIGN KEY: child rows whose FK value has no parent. Null FK
    * values are skipped (nullable FK `Song.album_id`, music_db.sql:67,73 —
    * singles are not orphans by design, pdf p.4; SURVEY.md §7.4).
    */
  def orphanViolations(
      child: DataFrame, childCols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]): DataFrame = {
    val nonNull = child.filter(childCols.map(col(_).isNotNull).reduce(_ && _))
    val cond = childCols.zip(parentCols)
      .map { case (c, p) => nonNull(c) === parent(p) }
      .reduce(_ && _)
    nonNull.join(parent, cond, "left_anti")
  }

  /** C4 — domain check: rows whose `colName` falls outside [lo, hi]
    * (inclusive). The reference documents `Rating.rating ∈ {1..5}` as a
    * domain restriction that its MySQL DDL does NOT enforce (music_db.pdf
    * p.6) — this audit completes the constraint story. Nulls are C1's
    * concern and are skipped here. Pure pushed-down scan filter.
    */
  def domainViolations(df: DataFrame, colName: String, lo: Long, hi: Long): DataFrame =
    df.filter(col(colName).isNotNull && !col(colName).between(lo, hi))

  /** C4 — set-valued domain check: rows whose `colName` is outside the
    * allowed value set. Small literal set → codegen'd IN-list, no shuffle.
    */
  def domainViolations(df: DataFrame, colName: String, allowed: Seq[Any]): DataFrame =
    df.filter(col(colName).isNotNull && !col(colName).isin(allowed: _*))

  /** C5 — varchar(n) length audit: rows whose string column exceeds the
    * DDL-declared length. SURVEY §1.4 maps MySQL `varchar(n)` to
    * StringType + load-time validation — this is that validator. Length is
    * measured in CHARACTERS (`char_length`), matching MySQL's varchar(n)
    * semantics, not bytes. Nulls are C1's concern and are skipped. Pure
    * pushed-down scan filter, no shuffle.
    */
  def lengthViolations(df: DataFrame, colName: String, maxLen: Int): DataFrame =
    df.filter(col(colName).isNotNull && char_length(col(colName)) > maxLen)

  /** I1 — every song carries at least one genre (music_db.pdf p.5:
    * application-enforced, stated in SURVEY §1.3 as must-preserve
    * behavior). Violations = songs with no Song_genre row; left-anti join
    * on the (broadcastable) genre-link key.
    */
  def songsWithoutGenre(song: DataFrame, songGenre: DataFrame): DataFrame =
    song.join(songGenre.select(col("song_id")),
      song("song_id") === songGenre("song_id"), "left_anti")

  /** I2 — album tracks' genres are consistent with the album's genre
    * (music_db.pdf p.5): every song with a non-null album_id must have a
    * Song_genre row equal to its album's genre_id. Violations = (song_id,
    * album_id, genre_id-expected) triples with no matching link row.
    * Singles (null album_id) are exempt by construction.
    */
  def albumTrackGenreMismatches(
      song: DataFrame, songGenre: DataFrame, album: DataFrame): DataFrame = {
    val expected = song.filter(col("album_id").isNotNull)
      .join(album, song("album_id") === album("album_id"))
      .select(song("song_id"), song("album_id"), album("genre_id"))
    expected.join(songGenre,
      expected("song_id") === songGenre("song_id") &&
        expected("genre_id") === songGenre("genre_id"),
      "left_anti")
  }

  /** C2 variant — case-insensitive UNIQUE audit. MySQL's default utf8mb4
    * collation makes the reference's `UNIQUE(name)` (music_db.sql:11)
    * case-insensitive; the engine standardizes on binary comparison
    * (SURVEY §1.4) and offers this opt-in audit for exact MySQL parity:
    * string key columns compare under Spark 4's UNICODE_CI collation
    * ('Drake' and 'drake' collide here, not under [[keyViolations]]).
    * Non-string key columns participate unchanged.
    */
  def keyViolationsCI(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val stringCols = df.schema.fields
      .filter(f => f.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSet
    val groupKeys = keyCols.map { c =>
      if (stringCols(c)) collate(col(c), "UNICODE_CI").as(c) else col(c)
    }
    df.groupBy(groupKeys: _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  /** Run every declared audit for the given loaded tables.
    * Returns (auditName → violations DataFrame); all must be empty.
    */
  def auditAll(tables: Map[String, DataFrame]): Map[String, DataFrame] = {
    val audits = MusicSchema.all.flatMap { t =>
      val df = tables(t.name)
      val c1 = Seq(s"${t.name}.not_null" -> notNullViolations(df, t))
      val c2 = t.unique.map(k =>
        s"${t.name}.unique(${k.mkString(",")})" -> keyViolations(df, k))
      val c3 = t.fks.map { case (cc, (pName, pc)) =>
        s"${t.name}.fk(${cc.mkString(",")}→$pName)" ->
          orphanViolations(df, cc, tables(pName), pc)
      }
      val c5 = t.varcharLimits.map { case (c, n) =>
        s"${t.name}.varchar($c≤$n)" -> lengthViolations(df, c, n)
      }
      c1 ++ c2 ++ c3 ++ c5
    }
    // reference-documented domain + application-level invariants
    // (music_db.pdf p.5–6)
    val semantic = Seq(
      "Rating.domain(rating∈1..5)" ->
        domainViolations(tables("Rating"), "rating", 1L, 5L),
      "Song.has_genre" ->
        songsWithoutGenre(tables("Song"), tables("Song_genre")),
      "Song.album_genre_consistency" ->
        albumTrackGenreMismatches(
          tables("Song"), tables("Song_genre"), tables("Album")))
    (audits ++ semantic).toMap
  }

  /** Convenience: audit the seed (or any registered load) and return the
    * names of violated constraints.
    */
  def violatedConstraints(tables: Map[String, DataFrame]): Seq[String] =
    auditAll(tables).collect {
      case (name, df) if !df.isEmpty => name
    }.toSeq.sorted
}
