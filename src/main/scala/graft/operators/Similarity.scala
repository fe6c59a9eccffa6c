package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.4 B18): brute-force cosine top-k as the exact baseline,
  * random-hyperplane LSH bucketing as the scale path.
  *
  * Vector math is done with higher-order functions (`zip_with` +
  * `aggregate`) over `array<float>` promoted to double — codegen'd,
  * UDF-free. The LSH path turns the O(N·Q) cross join into equi-joins on
  * bucket signatures, which shuffle-partition cleanly at 100 TB; recall is
  * tunable via `planes` (fewer planes → bigger buckets → higher recall,
  * more verification work).
  */
object Similarity {

  /** Dot product of two numeric arrays (element-wise, double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector is all-zero. Composable
    * higher-order-function form — correct anywhere, but allocates
    * intermediates per row. The operators below switch to the fused native
    * expression [[graft.functions.CosineSimilarity]] (same semantics,
    * codegen'd single loop) on their hot paths.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Fast cosine: native expression, registering it on first use. */
  private def fastCosine(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column): Column = {
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.CosineSimilarity.cosineSim(a, b)
  }

  /** Random-hyperplane signature: `planes` sign bits packed into a long.
    * Plane p's component for dimension i is a deterministic pseudo-random
    * ±1 derived from xxhash64(p, i) — reproducible across executors with
    * no broadcast state, and cheap enough to recompute per row (64 × planes
    * hash calls inside codegen).
    */
  def hyperplaneSignature(vec: Column, planes: Int = 16): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast("double") *
              when(xxhash64(p, i).bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Exact brute-force top-k: for every query row, the k nearest corpus
    * rows by cosine. The corpus side is broadcast when small; otherwise
    * this is the O(N·Q) reference path used to measure ANN recall.
    * Returns (queryIdCol, corpus idCol, cosine, rank 1..k).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
    val q = queries.select(col(idCol).as("_qid"), col(vecCol).as("_qv"))
    val scored = q.crossJoin(c)
      .filter(col("_qid") =!= col("_cid"))
      .withColumn("cosine", fastCosine(corpus.sparkSession, col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("cosine").desc, col("_cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing ≥1 of
    * the query's band signatures (multi-probe via `bands` independent
    * signatures of `planesPerBand` bits each), re-ranked by exact cosine.
    * All joins are equi-joins on (band, signature).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bands: Int = 8, planesPerBand: Int = 8): DataFrame = {

    def banded(df: DataFrame, id: String, v: String): DataFrame =
      // two-step select: the banding expression must not reference a column
      // aliased in the same projection (lateral column alias)
      df.select(col(idCol).as(id), col(vecCol).as(v))
        .select(col(id), col(v),
        posexplode(
          transform(sequence(lit(0), lit(bands - 1)), b =>
            // distinct plane family per band: offset plane index by band*planesPerBand
            aggregate(
              transform(sequence(lit(0), lit(planesPerBand - 1)), p => {
                val plane = b * planesPerBand + p
                val proj = aggregate(
                  zip_with(col(v), sequence(lit(0), size(col(v)) - 1),
                    (x, i) => x.cast("double") *
                      when(xxhash64(plane, i).bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)),
                  lit(0.0), (acc, x) => acc + x)
                when(proj >= 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
              }),
              lit(0L), (acc, x) => acc.bitwiseOR(x)))))
        .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bsig"))

    val c = banded(corpus, "_cid", "_cv")
    val q = banded(queries, "_qid", "_qv")

    val candidates = q.join(c, Seq("_band", "_bsig"))
      .filter(col("_qid") =!= col("_cid"))
      .select(col("_qid"), col("_qv"), col("_cid"), col("_cv"))
      .distinct() // collapse multi-band matches

    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("cosine").desc, col("_cid").asc)
    candidates
      .withColumn("cosine", fastCosine(corpus.sparkSession, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** IVF-style coarse quantization: assign every vector to its nearest of
    * `nCells` deterministic pseudo-random centroid directions (same
    * hash-derived ±1 construction as the hyperplanes), so ANN probes only
    * matching cells. Returns df + `ivf_cell`.
    */
  def ivfAssign(df: DataFrame, vecCol: String, nCells: Int = 16): DataFrame = {
    val scored = transform(sequence(lit(0), lit(nCells - 1)), c => {
      val proj = aggregate(
        zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
          (x, i) => x.cast("double") *
            when(xxhash64(c + 1000, i).bitwiseAND(1L) === 1L, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      struct(proj.as("score"), c.as("cell"))
    })
    df.withColumn("ivf_cell", array_max(scored).getField("cell"))
  }
}
