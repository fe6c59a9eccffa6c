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
    * the stable fixed-shard layout training loaders expect.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      seed: Long = 0L): Unit =
    withShard(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), xxhash64(col(idCol), lit(seed + 1)), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Weighted corpus mixture: sample each source at its weight and tag
    * rows with provenance. Weights are sampling fractions in [0, 1]
    * (upsampling beyond 1.0 needs explicit replication — kept out of
    * scope to keep sampling exact-Bernoulli and cheap). Deterministic
    * per seed.
    */
  def mixCorpora(
      spark: SparkSession,
      sources: Seq[(String, DataFrame, Double)], // (name, data, fraction)
      seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(sources.forall { case (_, _, w) => w >= 0.0 && w <= 1.0 },
      "fractions must be in [0,1]")
    sources.map { case (name, df, frac) =>
      df.sample(withReplacement = false, frac, seed)
        .withColumn("mix_source", lit(name))
    }.reduce(_.unionByName(_))
  }
}
