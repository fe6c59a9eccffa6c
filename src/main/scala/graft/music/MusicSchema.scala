package graft.music

import org.apache.spark.sql.types._

/** The reference's 7-table relational model as explicit Spark StructTypes
  * plus declarative constraint metadata.
  *
  * Field-for-field from the reference DDL (/root/reference/music_db.sql:6–106;
  * SURVEY.md §1.2 has per-column citations). Spark enforces none of
  * PK/UNIQUE/FK/NOT NULL on read, so constraints are carried as metadata and
  * checked by the audit jobs in [[Constraints]] (SURVEY.md §2.1 rows C1–C3).
  */
object MusicSchema {

  /** A table's declarative constraints. `unique` includes the primary key
    * (first entry). `fks`: (childCols → (parentTable, parentCols)); a
    * nullable FK column (Song.album_id, music_db.sql:67,73) is skipped for
    * null values by the orphan audit.
    */
  final case class TableDef(
      name: String,
      schema: StructType,
      primaryKey: Seq[String],
      unique: Seq[Seq[String]],
      fks: Seq[(Seq[String], (String, Seq[String]))],
      varcharLimits: Seq[(String, Int)] = Nil)

  val artist: TableDef = TableDef(
    "Artist",
    StructType(Seq(
      StructField("artist_id", IntegerType, nullable = false), // PK (music_db.sql:10)
      StructField("name", StringType, nullable = false),       // UNIQUE (sql:11)
      StructField("is_group", ByteType, nullable = false))),   // tinyint(1): 1=group, 0=individual (sql:9)
    primaryKey = Seq("artist_id"),
    unique = Seq(Seq("artist_id"), Seq("name")),
    fks = Nil,
    varcharLimits = Seq("name" -> 200)) // varchar(200), music_db.sql:8

  val genre: TableDef = TableDef(
    "Genre",
    StructType(Seq(
      StructField("genre_id", ShortType, nullable = false), // PK (sql:23)
      StructField("name", StringType, nullable = false))),  // UNIQUE (sql:24)
    primaryKey = Seq("genre_id"),
    unique = Seq(Seq("genre_id"), Seq("name")),
    fks = Nil,
    varcharLimits = Seq("name" -> 100)) // varchar(100), music_db.sql:22

  val album: TableDef = TableDef(
    "Album",
    StructType(Seq(
      StructField("album_id", IntegerType, nullable = false),    // PK (sql:39)
      StructField("artist_id", IntegerType, nullable = false),   // FK → Artist (sql:42)
      StructField("title", StringType, nullable = false),
      StructField("release_date", DateType, nullable = false),
      StructField("genre_id", ShortType, nullable = false))),    // FK → Genre (sql:43)
    primaryKey = Seq("album_id"),
    unique = Seq(Seq("album_id"), Seq("artist_id", "title")),    // UNIQUE (sql:40)
    fks = Seq(
      Seq("artist_id") -> ("Artist", Seq("artist_id")),
      Seq("genre_id") -> ("Genre", Seq("genre_id"))),
    varcharLimits = Seq("title" -> 200)) // varchar(200), music_db.sql:36

  val user: TableDef = TableDef(
    "User",
    StructType(Seq(
      StructField("username", StringType, nullable = false),       // natural PK (sql:54)
      StructField("created_at", TimestampType, nullable = false))),
    primaryKey = Seq("username"),
    unique = Seq(Seq("username")),
    fks = Nil,
    varcharLimits = Seq("username" -> 50)) // varchar(50), music_db.sql:52

  val song: TableDef = TableDef(
    "Song",
    StructType(Seq(
      StructField("song_id", IntegerType, nullable = false),   // PK (sql:69)
      StructField("artist_id", IntegerType, nullable = false), // FK → Artist (sql:72)
      StructField("title", StringType, nullable = false),
      StructField("album_id", IntegerType, nullable = true),   // nullable FK → Album; NULL ⇒ single (sql:67,73)
      StructField("single_release_date", DateType, nullable = true))), // non-NULL iff single (pdf p.4)
    primaryKey = Seq("song_id"),
    unique = Seq(Seq("song_id"), Seq("artist_id", "title")),   // UNIQUE (sql:70)
    fks = Seq(
      Seq("artist_id") -> ("Artist", Seq("artist_id")),
      Seq("album_id") -> ("Album", Seq("album_id"))),
    varcharLimits = Seq("title" -> 200)) // varchar(200), music_db.sql:66

  val songGenre: TableDef = TableDef(
    "Song_genre",
    StructType(Seq(
      StructField("song_id", IntegerType, nullable = false),  // composite PK (sql:85); FK → Song (sql:87)
      StructField("genre_id", ShortType, nullable = false))), // composite PK; FK → Genre (sql:88)
    primaryKey = Seq("song_id", "genre_id"),
    unique = Seq(Seq("song_id", "genre_id")),
    fks = Seq(
      Seq("song_id") -> ("Song", Seq("song_id")),
      Seq("genre_id") -> ("Genre", Seq("genre_id"))))

  val rating: TableDef = TableDef(
    "Rating",
    StructType(Seq(
      StructField("username", StringType, nullable = false),   // composite PK (sql:102); FK → User (sql:104)
      StructField("song_id", IntegerType, nullable = false),   // composite PK; FK → Song (sql:105)
      StructField("rating_date", DateType, nullable = false),  // composite PK: one rating per user/song/day (pdf p.6)
      StructField("rating", ByteType, nullable = false))),     // domain 1–5, documented not DDL-enforced (pdf p.6)
    primaryKey = Seq("username", "song_id", "rating_date"),
    unique = Seq(Seq("username", "song_id", "rating_date")),
    fks = Seq(
      Seq("username") -> ("User", Seq("username")),
      Seq("song_id") -> ("Song", Seq("song_id"))),
    varcharLimits = Seq("username" -> 50)) // varchar(50), music_db.sql:98

  val all: Seq[TableDef] = Seq(artist, genre, album, user, song, songGenre, rating)

  val byName: Map[String, TableDef] = all.map(t => t.name -> t).toMap
}
