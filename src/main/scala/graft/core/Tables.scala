package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet; schemas come from the files themselves
  * (driver-generated, deterministic — see FIXTURES.md §4). `events` needs the
  * nanosecond-timestamp workaround: Spark 4 refuses `timestamp[ns]` parquet,
  * so it is read with `spark.sql.legacy.parquet.nanosAsLong=true` and the
  * event-time column is recovered as microsecond timestamps.
  */
object Tables {

  /** TPC-H-ish relational tables usable in dual-engine (DuckDB) oracles. */
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** LLM-pipeline tables (Tier B operators — SURVEY.md §2.4). */
  val pipeline: Seq[String] = Seq("documents", "embeddings")

  // Resolved-relation cache (a lightweight catalog): `spark.read.parquet`
  // pays file listing + footer/schema reads at plan time on EVERY call —
  // ~100 ms per table per query. Caching the resolved DataFrame reuses the
  // file index and schema across queries, exactly what a real catalog
  // (metastore) provides on a cluster. Keyed weakly by session so stopped
  // sessions don't pin entries.
  private val relCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    relCache.synchronized {
      val perSession = relCache.computeIfAbsent(
        spark, _ => scala.collection.mutable.Map.empty[String, DataFrame])
      perSession.getOrElseUpdate(
        s"$sfDir/$name", spark.read.parquet(s"$sfDir/$name.parquet"))
    }

  /** events.ts is INT64 TIMESTAMP(NANOS) — illegal for Spark 4's reader.
    * Read it as raw nanos (bigint) and add `event_time` (timestamp, µs
    * precision) for windowing. FIXTURES.md §4 documents the verified
    * workaround.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("event_time", timestamp_micros(col("ts") / 1000 cast "long"))
  }

  /** Register every batch table as a temp view named after the file. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    (relational ++ pipeline).foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
