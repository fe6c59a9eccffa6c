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

  // Per-session resolved-DataFrame map (a cached DataFrame is bound to
  // its session's queryExecution — serving it to another session fails
  // on a stopped SparkContext), but the FILES are written at most once
  // per JVM: the generator is seed-fixed, so a second session re-writing
  // identical bytes would only risk yanking part files out from under
  // the first session's still-running readers.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Map[String, DataFrame]]()
  private var written = false

  def ensure(spark: SparkSession): Map[String, DataFrame] = {
    val hit = cache.get(spark)
    if (hit != null) return hit
    synchronized {
      // bounded growth: entries for stopped sessions are dead weight
      // (strong refs to the whole sessionState) — evict them on miss
      cache.keySet.removeIf(s => s.sparkContext.isStopped)
      val again = cache.get(spark)
      if (again != null) return again
      val tables = MusicGen.load(spark, MusicGen.generate())
      if (!written) {
        tables.foreach { case (name, df) =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
        }
        written = true
      }
      val resolved = tables.keys.map { name =>
        name -> spark.read.parquet(s"$dir/$name.parquet")
      }.toMap
      cache.put(spark, resolved)
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
