package graft.music

import graft.SparkSpec

/** SURVEY.md §7.1 step 4: the SQL and DataFrame forms of RQ1–RQ6 must
  * agree. RQ2/RQ4 have no ORDER BY in the reference → compare as sets;
  * the rest compare ordered.
  */
class MusicSqlSpec extends SparkSpec {

  lazy val tables = SeedData.registerAll(spark)
  lazy val dfQueries = MusicQueries.all(tables)

  for (name <- Seq("rq1", "rq3", "rq5", "rq6")) {
    test(s"$name: SQL text and DataFrame pipeline agree (ordered)") {
      tables // force registration
      val sql = spark.sql(MusicSql.all(name)).collect().toSeq
      val df = dfQueries(name).collect().toSeq
      assert(sql == df)
    }
  }

  for (name <- Seq("rq2", "rq4")) {
    test(s"$name: SQL text and DataFrame pipeline agree (as sets)") {
      tables
      val sql = spark.sql(MusicSql.all(name)).collect().toSet
      val df = dfQueries(name).collect().toSet
      assert(sql == df)
    }
  }
}
