package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export utilities: the last mile of a corpus pipeline.
  * Everything is deterministic given (data, seed) — training runs must be
  * reproducible — and expressed as plain shuffles/sorts that scale
  * linearly.
  */
object Export {

  /** Deterministic global shuffle: orders rows by a seeded hash of the id.
    * Same (data, seed) → same order on any cluster layout; different seeds
    * → independent permutations. Range-partitioned sort — the standard
    * scalable total order.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.withColumn("_shuffle_key", xxhash64(col(idCol), lit(seed)))
      .orderBy(col("_shuffle_key"), col(idCol))
      .drop("_shuffle_key")

  /** Assign every row to one of `nShards` stable shards by seeded id hash.
    * Shard membership is a pure row function — independent of
    * partitioning, executor count, or input order.
    */
  def withShard(df: DataFrame, idCol: String, nShards: Int, seed: Long = 0L): DataFrame =
    df.withColumn("shard", pmod(xxhash64(col(idCol), lit(seed)), lit(nShards)).cast("int"))

  /** Write `nShards` shard directories (shard=K/...) with exactly one file
    * per shard, each internally ordered by the deterministic shuffle key —
    * the stable fixed-shard layout training loaders expect. A manifest
    * (`_manifest/`, JSON: shard → rows) is written alongside so loaders
    * can verify integrity (a lost or truncated shard is detectable
    * without scanning the corpus).
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      seed: Long = 0L): Unit = {
    withShard(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), xxhash64(col(idCol), lit(seed + 1)), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    // manifest counts come from the files JUST WRITTEN, not from
    // re-evaluating the input lineage: a second evaluation could disagree
    // with the bytes on disk (nondeterministic upstream) and costs a full
    // re-run of the pipeline either way
    df.sparkSession.read.parquet(path)
      .groupBy(col("shard")).agg(count(lit(1)).as("rows"))
      .coalesce(1).write.mode("overwrite").json(s"$path/_manifest")
  }

  /** Read a [[writeShards]] manifest and compare against the shard
    * directories actually present: returns the mismatches (missing or
    * row-count-drifted shards) — empty ⇔ the export is intact.
    */
  def verifyShards(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val manifest = spark.read.json(s"$path/_manifest")
      .select(col("shard").cast("int").as("shard"), col("rows").as("expected"))
    // total loss (every shard directory gone, manifest surviving) must
    // REPORT, not crash the integrity check on schema inference
    val actual = scala.util.Try(
      spark.read.parquet(path)
        .groupBy(col("shard")).agg(count(lit(1)).as("actual")))
      .getOrElse(Seq.empty[(Int, Long)].toDF("shard", "actual"))
    manifest.join(actual, Seq("shard"), "full")
      .filter(col("expected").isNull || col("actual").isNull ||
        col("expected") =!= col("actual"))
  }

  /** Greedy sequence packing: group documents into training sequences of
    * at most `maxTokens` tokens (the batch-construction step of an LLM
    * data pipeline). Documents are walked in id order; a document that
    * would overflow the current sequence starts a new one whose `seq_id`
    * is that document's id — globally unique with no coordination, and
    * deterministic given (data, numPartitions).
    *
    * Distribution: ids are hash-partitioned (deterministically) and
    * packing is PARTITION-LOCAL (`mapPartitions` — the one operator class
    * where imperative per-partition logic is the right Spark tool:
    * packing is inherently sequential state). The approximation vs a
    * global pack is at most one under-filled sequence per partition —
    * negligible waste at any real corpus/partition ratio, and the price
    * of linear scaling.
    * Documents individually longer than `maxTokens` get a singleton
    * sequence flagged `overflow = true` (caller chooses truncate/split).
    *
    * Returns the input plus (`seq_id`, `overflow`).
    */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: String,
      maxTokens: Int, numPartitions: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    // fail fast when ids cannot carry the operator: numeric ids pass
    // through, digit-string ids are probed (one early-out scan) so a
    // non-numeric string column raises instead of silently nulling every
    // id and returning an empty frame; other types are rejected outright
    // INTEGRAL ids only: a fractional id (10.5) would be packed under its
    // truncated identity and then fail the join-back. String ids must be
    // CANONICAL decimal longs — round-tripping the cast rejects both
    // non-numeric values and the aliasing forms Spark's truncating cast
    // would otherwise admit ('007' and '7' collide on identity 7;
    // '10.5' truncates to 10). Scale-0 decimals within long precision
    // are integral and pass.
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case d: DecimalType if d.scale == 0 && d.precision <= 18 => ()
      case StringType =>
        val bad = df.filter(col(idCol).isNotNull &&
            (col(idCol).cast("long").isNull ||
              col(idCol).cast("long").cast("string") =!= col(idCol)))
          .limit(1).count()
        require(bad == 0,
          s"packSequences: string id column $idCol contains values that are not canonical decimal longs")
      case other => throw new IllegalArgumentException(
        s"packSequences needs an integral (or canonical digit-string) id column; $idCol is ${other.catalogString}")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // null token counts pack as 0 (the Tuple2-of-Long encoder would
    // otherwise throw on the null); null ids cannot open or join back to
    // a sequence — excluded here and absent from the output (the join
    // below would drop them anyway, this just makes it explicit)
    val slim = df
      .select(col(idCol).cast("long").as("_id"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("_n"))
      .filter(col("_id").isNotNull)
    // DETERMINISTIC partitioning: hash-partition directly on the id
    // (murmur3 of the value — a pure function, stable across runs and
    // layouts), then sort each partition by id and pack greedily.
    // repartitionByRange would sample with a run-dependent seed (rdd.id);
    // arithmetic range buckets would overflow Long for hash-derived id
    // spans and leave ~1/e of partitions empty after re-hashing the
    // bucket values. Packing does not need id-contiguity — any stable
    // per-partition grouping walked in sorted order yields deterministic,
    // well-filled sequences.
    val packed = slim
      .repartition(parts, col("_id"))
      .sortWithinPartitions(col("_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        var seqId = Long.MinValue
        var used = maxTokens.toLong + 1 // force a new sequence at the first row
        it.map { case (id, n) =>
          val need = math.max(n, 0L)
          if (used + need > maxTokens) { seqId = id; used = 0L }
          used += need
          (id, seqId, need > maxTokens)
        }
      }
      .toDF("_pack_id", "seq_id", "overflow")
    // join on the SAME cast the packing used: joining raw-vs-long would
    // coerce digit strings through double ('7'/'007' mis-joins, ids past
    // 2^53 lose precision)
    df.join(packed, df(idCol).cast("long") === packed("_pack_id"))
      .drop("_pack_id")
  }

  /** Weighted corpus mixture: sample each source at its weight and tag
    * rows with provenance. Weights are sampling fractions in [0, 1]
    * (upsampling beyond 1.0 needs explicit replication — kept out of
    * scope to keep sampling exact-Bernoulli and cheap).
    *
    * Sampling is a seeded CONTENT-hash Bernoulli, not `df.sample`:
    * Spark's sampler is seeded per partition, so its output changes
    * under repartition — breaking reproducible-training mixes — and one
    * shared seed would fully correlate the draws of overlapping sources.
    * Here each row's fate is a pure function of (row content, seed,
    * source index): layout-independent, and independent across sources.
    * The corollary: IDENTICAL rows share a fate (all-in or all-out), so
    * realized fractions are only exact on distinct rows — mix AFTER
    * dedup (this pipeline's order anyway), or give rows a distinguishing
    * id column first.
    */
  /** Write a bucketed + sorted catalog table: rows hash-clustered into
    * `buckets` files per partition on `keys` and sorted within each. Two
    * tables bucketed the same way join WITHOUT a shuffle (the planner
    * reuses the on-disk clustering — verified by ExportSpec's
    * exchange-free join plan), and point lookups prune to one bucket.
    * This is the persistent-layout face of repartition(): pay the
    * cluster-by once at write, skip it on every subsequent join/agg over
    * the key — at 100 TB the dominant join cost is exactly that shuffle.
    */
  def writeBucketed(
      df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  def mixCorpora(
      spark: SparkSession,
      sources: Seq[(String, DataFrame, Double)], // (name, data, fraction)
      seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(sources.forall { case (_, _, w) => w >= 0.0 && w <= 1.0 },
      "fractions must be in [0,1]")
    val denom = 1L << 20
    sources.zipWithIndex.map { case ((name, df, frac), i) =>
      val u = pmod(
        xxhash64(lit(seed), lit(i),
          struct(Relational.hashableCols(df): _*)),
        lit(denom))
      df.filter(u < lit((frac * denom).toLong))
        .withColumn("mix_source", lit(name))
    }.reduce(_.unionByName(_))
  }
}
