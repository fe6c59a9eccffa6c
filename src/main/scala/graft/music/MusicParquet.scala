package graft.music

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materializes the deterministic [[MusicGen]] dataset as parquet at a
  * FIXED path, so the reference's own six queries (RQ1–RQ6) can run
  * through the driver's dual-engine harness: Spark and the DuckDB oracle
  * read the identical parquet bytes (the oracle SQL references the same
  * absolute paths via read_parquet).
  *
  * Write-once per JVM (synchronized, overwrite mode — the generator is
  * seed-fixed, so re-writing is byte-stable in content); reads are served
  * from a cached map of resolved DataFrames. Safe under Bench's concurrent
  * query submission.
  */
object MusicParquet {

  /** Fixed absolute location — baked into the static oracle SQL. */
  val dir = "/root/repo/target/musicdata"

  // keyed by session identity (like Tables.relCache): a cached DataFrame
  // is bound to its session's queryExecution, so serving it to a later /
  // different session would fail on a stopped SparkContext
  @volatile private var cache: (SparkSession, Map[String, DataFrame]) = null

  def ensure(spark: SparkSession): Map[String, DataFrame] = {
    val c = cache
    if (c != null && (c._1 eq spark)) return c._2
    synchronized {
      val c2 = cache
      if (c2 != null && (c2._1 eq spark)) return c2._2
      val tables = MusicGen.load(spark, MusicGen.generate())
      tables.foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
      }
      val resolved = tables.keys.map { name =>
        name -> spark.read.parquet(s"$dir/$name.parquet")
      }.toMap
      cache = (spark, resolved)
      resolved
    }
  }

  /** DuckDB FROM-clause prelude: one CTE per table over the written files.
    * "User" needs quoting either way; quote every name for uniformity.
    */
  def duckPrelude(names: Seq[String]): String =
    names.map(n =>
      s""""$n" AS (SELECT * FROM read_parquet('$dir/$n.parquet/*.parquet'))""")
      .mkString("WITH ", ", ", "")
}
