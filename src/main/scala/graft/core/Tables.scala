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
  // (metastore) provides on a cluster.
  //
  // Keyed by session identity + path, bounded LRU-ish (eldest-out): a
  // WeakHashMap keyed by session would never evict, because the cached
  // DataFrame strongly references its session through queryExecution.
  // Caveat (shared with real catalogs): if the files under a cached path
  // are rewritten in-session, the stale file index is served — the test
  // data here is read-only by contract (TESTDATA.md).
  private val MaxCached = 64
  // key = (session reference, path): SparkSession uses identity equals, so
  // no cross-session collisions (identityHashCode alone could collide)
  private val relCache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](MaxCached, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > MaxCached
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cached(spark, s"$sfDir/$name") {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Look up / populate the cache WITHOUT holding the lock across the
    * resolution I/O (file listing + footers, ~100 ms) — concurrent misses
    * may resolve the same path twice and one result wins, which is
    * harmless; blocking every other caller on one miss is not.
    */
  private def cached(spark: SparkSession, key: String)(resolve: => DataFrame): DataFrame = {
    val k = (spark, key)
    val hit = relCache.synchronized(Option(relCache.get(k)))
    hit.getOrElse {
      val df = resolve
      relCache.synchronized {
        // entries of stopped sessions pin their whole session graph —
        // evict on the miss path (same policy as MusicParquet.ensure)
        relCache.keySet.removeIf(e => e._1.sparkContext.isStopped)
        Option(relCache.get(k)).getOrElse { relCache.put(k, df); df }
      }
    }
  }

  /** events.ts is INT64 TIMESTAMP(NANOS) — illegal for Spark 4's reader.
    * Read it as raw nanos (bigint) and add `event_time` (timestamp, µs
    * precision) for windowing. FIXTURES.md §4 documents the verified
    * workaround.
    *
    * ns→µs must be integer division (`DIV`): `/` promotes the int64 nanos
    * (~1.7e18, above 2^53) to double first, which is lossy at ±512 ns —
    * enough to flip window membership at boundaries.
    *
    * The legacy flag is a session-wide conf; it is flipped only around the
    * (one-time, locked) schema resolution and RESTORED afterwards, so a
    * later read of some other TIMESTAMP(NANOS) parquet in the session is
    * not silently re-typed to bigint. The flag affects only ns-typed
    * columns, so concurrent resolutions of the µs-typed tables during the
    * window are unaffected.
    */
  private val nanosFlagLock = new Object
  private val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
  // sessions where the flag must stay set for the session's lifetime:
  // STREAMING scans over ns-parquet re-plan per microbatch and read the
  // conf each time, so a restore mid-stream would fail the next batch
  // with PARQUET_TYPE_ILLEGAL. Weak keys: entries die with the session.
  private val nanosPinned =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Pin the nanos flag ON for this session (streaming callers — see
    * [[graft.streaming.EventStreams.readStream]]); batch loads will no
    * longer restore it. Takes the shared lock so it cannot interleave
    * with a batch load's save/restore window.
    */
  private[graft] def pinNanosFlag(spark: SparkSession): Unit =
    nanosFlagLock.synchronized {
      nanosPinned.add(spark)
      spark.conf.set(nanosKey, "true")
    }

  /** Adds `event_time` (µs-precision TimestampType), adapting to how the
    * file delivers `ts`: bigint NANOS (timestamp[ns] parquet read under
    * nanosAsLong — integer `DIV 1000`, since double promotion of int64
    * nanos is lossy ±512 ns) or a real timestamp column (timestamp[us]
    * parquet, the regenerated round-5 testdata — plain cast; the session
    * time zone is pinned UTC everywhere, so the NTZ→LTZ cast is
    * value-preserving on the underlying micros).
    */
  private[graft] def withEventTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts DIV 1000"))
      case _ => df.col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    df.withColumn("event_time", ev)
  }

  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    cached(spark, s"$sfDir/events+nanos") {
      nanosFlagLock.synchronized {
        val prev = spark.conf.getOption(nanosKey)
        spark.conf.set(nanosKey, "true")
        try withEventTime(spark.read.parquet(s"$sfDir/events.parquet"))
        finally if (!nanosPinned.contains(spark)) prev match {
          case Some(v) => spark.conf.set(nanosKey, v)
          case None => spark.conf.unset(nanosKey)
        }
      }
    }
  }

  /** Fan a narrow scan out to the session's parallelism before heavy
    * per-row work. A small parquet file (single row group) plans as ONE
    * scan partition no matter how `maxPartitionBytes` is tuned, so
    * per-row-expensive operators downstream (shingling, signatures,
    * per-doc annotation, per-vector banding) would serialize on one core.
    * A round-robin `repartition(n)` unlocks the cluster: its
    * REPARTITION_BY_NUM shuffle is exempt from AQE coalescing, the
    * shuffled data is by definition small (that's why it was one
    * partition), and every operator in this repo is partition-layout-
    * independent (content-derived hashes/salts, total orderings) by
    * design. No-op when the input already has enough partitions — the
    * 100 TB case, where the scan itself provides the parallelism and an
    * extra full-corpus shuffle would be the bug.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // Intra-query DOP is a deployment-mode decision: a lone query wants
    // the whole machine (default = defaultParallelism); a session running
    // many queries concurrently already has every core busy with
    // inter-query parallelism, so per-query fan-out only adds an exchange
    // — `spark.graft.fanout.width` lets that deployment bound or disable
    // it (≤1 = off). Runtime conf, so one long-lived session can adjust
    // as its workload shape changes.
    val target = spark.conf.getOption(fanoutKey).map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    if (target <= 1) df
    else if (df.rdd.getNumPartitions >= math.min(8, target)) df
    else df.repartition(target)
  }

  /** Session conf bounding [[fanOut]]'s target width; ≤1 disables. */
  val fanoutKey = "spark.graft.fanout.width"

  /** Register every batch table as a temp view named after the file. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    (relational ++ pipeline).foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }

  /** Register the batch tables as EXTERNAL parquet tables in the session
    * CATALOG — the real metastore path, vs [[registerAll]]'s session-local
    * temp views and the resolved-relation cache above (which this
    * complements, not replaces: the catalog persists table → location
    * mappings; the cache skips re-listing files within a session).
    *
    * Catalog entries live in the SharedState external catalog: visible to
    * every session on the SparkContext (`newSession()` included, unlike
    * temp views), and — when the session is built with
    * `enableHiveSupport()` (hive + derby ship on the classpath) — persisted
    * in the warehouse metastore across application restarts, exactly how a
    * production deployment resolves `db.table` names. Tables are EXTERNAL
    * (explicit LOCATION): dropping them never deletes data.
    *
    * Re-registering with a DIFFERENT sfDir re-points the table (drop +
    * recreate); with the same location it is a no-op. `events` is not
    * registered: its TIMESTAMP(NANOS) column needs the [[loadEvents]]
    * session-flag workaround, which a bare catalog lookup cannot apply.
    */
  def registerCatalog(spark: SparkSession, sfDir: String,
      database: String = "graft"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    (relational ++ pipeline).foreach { n =>
      val location = s"$sfDir/$n.parquet"
      val stale = spark.catalog.tableExists(s"`$database`.`$n`") && {
        val meta = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(n, Some(database)))
        new org.apache.hadoop.fs.Path(meta.location).toUri.getPath !=
          new org.apache.hadoop.fs.Path(location).toUri.getPath
      }
      if (stale) spark.sql(s"DROP TABLE `$database`.`$n`")
      spark.sql(s"CREATE TABLE IF NOT EXISTS `$database`.`$n` " +
        s"USING parquet LOCATION '$location'")
    }
  }
}
