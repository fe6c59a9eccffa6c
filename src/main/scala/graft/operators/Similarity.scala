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
  private[graft] def fastCosine(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column): Column = {
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.CosineSimilarity.cosineSim(a, b)
  }

  /** Deterministic ±1 hyperplane components, fixed at plan time as literal
    * arrays (seeded Random) — the per-row cost is pure multiply-add inside
    * codegen, no hashing. `dim` must cover the vector length; planes are
    * reproducible across executors because they are plan constants.
    */
  private[graft] def literalPlane(plane: Int, dim: Int): Column = {
    val rnd = new scala.util.Random(0x5eed0000L + plane)
    typedlit(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Signed projection of `vec` onto a literal plane. zip_with null-pads
    * the shorter side; coalesce treats missing dims as 0 (implicit
    * zero-padding), so any vector length ≤/≥ dim stays well-defined.
    * Single source of truth — band signatures and IVF assignment build on
    * this same expression.
    */
  private[graft] def planeProj(vec: Column, plane: Int, dim: Int): Column =
    aggregate(
      zip_with(vec, literalPlane(plane, dim),
        (x, w) => coalesce(x.cast("double") * w, lit(0.0))),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane signature: `planes` sign bits packed into a long.
    * Plane components are plan-time literal constants (see
    * [[literalPlane]]); the loop is unrolled in Scala so shift amounts are
    * literal ints.
    */
  def hyperplaneSignature(vec: Column, planes: Int = 16, dim: Int = 64): Column =
    (0 until planes)
      .map(p => when(planeProj(vec, p, dim) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))

  /** Exact brute-force top-k: for every query row, the k nearest corpus
    * rows by cosine. The corpus side is broadcast when small; otherwise
    * this is the O(N·Q) reference path used to measure ANN recall.
    * Returns (queryIdCol, corpus idCol, cosine, rank 1..k).
    *
    * `excludeSelf` (default true) drops corpus rows whose id equals the
    * query id — right for self-KNN over one dataset; set false when
    * corpus and queries are DIFFERENT datasets whose id spaces happen to
    * overlap (an id-equal corpus row is then a legitimate neighbor).
    * Null-vector rows on either side are excluded (matching the LSH
    * path, where a null vector produces no band rows).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_qid"), col(vecCol).as("_qv"))
    val scored = q.crossJoin(c)
      .filter(if (excludeSelf) col("_qid") =!= col("_cid") else lit(true))
      .withColumn("cosine", fastCosine(corpus.sparkSession, col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("cosine").desc, col("_cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Leading-component sign bucket: `bits` high-order sign bits of the
    * vector packed into an int — the simplest deterministic, SQL-
    * expressible coarse retriever (so a dual-engine oracle can replay
    * it exactly; the production retrievers are the hyperplane-LSH / IVF
    * paths below). Pure comparisons, no arithmetic: identical across
    * engines on float inputs.
    */
  def signBucket(vec: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    (0 until bits).map(i =>
      when(element_at(vec, i + 1) >= 0, lit(1 << (bits - 1 - i))).otherwise(lit(0)))
      .reduce(_ + _)
  }

  /** nDCG position weights 1/log2(pos+1), snapped to the 6-decimal grid
    * as plan-time DECIMAL literals (and mirrored verbatim in the SQL
    * oracle): per-query DCG sums become EXACT decimal sums, so the
    * engine-order-dependent double-summation trap (PERF/oracle notes)
    * cannot flip a display round. Ideal@10 = their exact sum.
    */
  private[graft] val ndcgWeights6: Seq[String] = Seq(
    "1.000000", "0.630930", "0.500000", "0.430677", "0.386853",
    "0.356207", "0.333333", "0.315465", "0.301030", "0.289065")
  private[graft] val ndcgIdeal10 = 4.54356

  /** Retrieval-quality evaluation: recall@k, MRR@k and nDCG@k of the
    * [[signBucket]] coarse retriever against the exact cosine top-k
    * ground truth — the standard eval harness of an embedding-retrieval
    * stack (is the cheap index good enough?), expressed so BOTH sides
    * are dual-engine replayable (the q41 ranking discipline: ranks are
    * integer positions from (cosine DESC, id ASC) orderings that DuckDB
    * reproduces; every metric is integer arithmetic, an exact decimal
    * sum, or a single double division rounded once).
    *
    * Scale shape: ground truth is the declared exact baseline — a
    * broadcast of the (small) query set against the corpus scan, k rows
    * kept per query (the q28/q41 posture). The retriever side is an
    * equi-join on the bucket key. Metrics aggregate per query —
    * |queries| rows total. Queries whose bucket holds no other vector
    * produce no row (mirrored by the oracle's grouping).
    *
    * Returns (query_id, n_cand, hits, recall_at_k, mrr, ndcg),
    * one row per query.
    */
  def retrievalMetrics(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      bucketBits: Int = 4): DataFrame = {
    require(k == 10, "metric weights are pinned for k = 10")
    val spark = corpus.sparkSession
    val truth = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id").as("_qid"), col("neighbor_id").as("_cid"),
        lit(1).as("_hit"))
    val c = corpus.filter(col(vecCol).isNotNull).select(
      col(idCol).as("_cid"), col(vecCol).as("_cv"),
      signBucket(col(vecCol), bucketBits).as("_b"))
    val q = queries.filter(col(vecCol).isNotNull).select(
      col(idCol).as("_qid"), col(vecCol).as("_qv"),
      signBucket(col(vecCol), bucketBits).as("_b"))
    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("_cos").desc, col("_cid").asc)
    val retrieved = q.join(c, Seq("_b"))
      .filter(col("_qid") =!= col("_cid"))
      .withColumn("_cos", fastCosine(spark, col("_qv"), col("_cv")))
      .withColumn("_pos", row_number().over(w))
      .filter(col("_pos") <= k)
      .select(col("_qid"), col("_cid"), col("_pos"))
    val wDec = array(ndcgWeights6.map(s => lit(s).cast("decimal(8,6)")): _*)
    val zeroDec = lit("0.000000").cast("decimal(8,6)")
    retrieved
      .join(truth, Seq("_qid", "_cid"), "left")
      .groupBy(col("_qid"))
      .agg(
        count(lit(1)).as("n_cand"),
        coalesce(sum(col("_hit")), lit(0L)).cast("long").as("hits"),
        sum(when(col("_hit") === 1, element_at(wDec, col("_pos")))
          .otherwise(zeroDec)).as("_dcg"),
        min(when(col("_hit") === 1, col("_pos"))).as("_minpos"))
      .select(
        col("_qid").as("query_id"), col("n_cand"), col("hits"),
        round(col("hits") / lit(k.toDouble), 6).as("recall_at_k"),
        coalesce(round(lit(1.0) / col("_minpos"), 6), lit(0.0)).as("mrr"),
        round(col("_dcg").cast("double") / lit(ndcgIdeal10), 6).as("ndcg"))
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing ≥1 of
    * the query's band signatures (multi-probe via `bands` independent
    * signatures of `planesPerBand` bits each), re-ranked by exact cosine.
    * All joins are equi-joins on (band, signature).
    */
  /** One band's packed sign-bit signature: `planesPerBand` literal-plane
    * projections, plane family offset by `band * planesPerBand` so bands
    * are independent. The COMPOSABLE form of
    * [[graft.functions.BandSignatures]] — the operators use the native
    * expression; this stays as its differential-testing reference
    * (bit-for-bit parity pinned in SimilaritySpec).
    */
  def bandSignature(vec: Column, band: Int, planesPerBand: Int, dim: Int): Column =
    (0 until planesPerBand)
      .map(p => when(planeProj(vec, band * planesPerBand + p, dim) >= 0,
        lit(1L << p)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))

  /** One row per (id, band) with the hyperplane band signature — THE
    * single definition of embedding band bucketing (narrow: ids only,
    * never vectors; see the shuffle note in [[lshTopK]]). Shared by
    * [[lshTopK]], [[Dedup.embeddingNearDupPairs]] and
    * [[Dedup.embeddingDecontaminate]] — bucketing must be identical
    * across operators or their results drift.
    */
  private[operators] def hyperplaneBandKeys(
      df: DataFrame, idCol: String, vecCol: String, idAlias: String,
      bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    graft.functions.BandSignatures.register(df.sparkSession)
    // two-step select: the banding expression must not reference a column
    // aliased in the same projection (lateral column alias)
    df.select(col(idCol).as(idAlias), col(vecCol).as("_v"))
      .select(col(idAlias),
        posexplode(graft.functions.BandSignatures.bandSigs(
          col("_v"), bands, planesPerBand, dim)))
      .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bsig"))
  }

  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bands: Int = 8, planesPerBand: Int = 8, dim: Int = 64,
      excludeSelf: Boolean = true): DataFrame = {

    // corpus banding is the hot path: one fused native pass computes all
    // band signatures (vs bands × planesPerBand HOF array walks per row);
    // parity with the composable bandSignature is pinned in SimilaritySpec.
    // Band frames carry ONLY (id, band, key): the band join and the
    // multi-band-collapse distinct then shuffle 16-byte pairs, not
    // embedding vectors (a 768-dim float vector is ~3 KB per candidate —
    // at corpus scale the vector-wide distinct would dominate the
    // shuffle). Vectors join back once per side, by id, after the dedup.
    def banded(df: DataFrame, id: String): DataFrame =
      hyperplaneBandKeys(df, idCol, vecCol, id, bands, planesPerBand, dim)

    val candidateIds = banded(queries, "_qid")
      .join(banded(corpus, "_cid"), Seq("_band", "_bsig"))
      .filter(if (excludeSelf) col("_qid") =!= col("_cid") else lit(true))
      .select(col("_qid"), col("_cid"))
      .distinct() // collapse multi-band matches — narrow id pairs only

    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("cosine").desc, col("_cid").asc)
    // dropDuplicates on the join-back sides: a duplicate-id corpus row
    // would re-expand the id-level candidate pairs the distinct just
    // collapsed (the same neighbor at two ranks, squeezing real ones out
    // of top-k)
    candidateIds
      .join(corpus.select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
        .dropDuplicates("_cid"), "_cid")
      .join(queries.select(col(idCol).as("_qid"), col(vecCol).as("_qv"))
        .dropDuplicates("_qid"), "_qid")
      .withColumn("cosine", fastCosine(corpus.sparkSession, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * = max|x| / 127, elements rounded to [-127, 127] tinyints. 4× storage
    * reduction for float32 embeddings (the standard ANN memory play);
    * recall impact is bounded and measured in SimilaritySpec. Returns
    * struct(scale double, q array<tinyint>); all-zero vectors get
    * scale 0 and dequantize to all-zero.
    */
  def quantizeInt8(vec: Column): Column = {
    // NON-FINITE elements (NaN, ±Inf) are EXCLUDED from the scale and
    // quantize to 0, isolating the bad element: a NaN scale passes a
    // naive `scale > 0` guard (Spark orders NaN largest) and an Inf
    // scale makes the Inf element round(Inf/Inf)=NaN — either way the
    // whole vector silently corrupts (or trips the ANSI NaN→tinyint
    // cast).
    def finite(xd: Column): Column =
      !isnan(xd) && abs(xd) =!= lit(Double.PositiveInfinity)
    val absMax = aggregate(vec, lit(0.0),
      (acc, x) => greatest(acc,
        when(finite(x.cast("double")), abs(x.cast("double"))).otherwise(0.0)))
    // bindOnce-style: evaluate the scale once, not once per element
    graft.operators.TextAnalysis.bindOnce(absMax / 127.0, scale =>
      struct(
        scale.as("scale"),
        transform(vec, x =>
          when(scale > 0 && finite(x.cast("double")),
            round(x.cast("double") / scale).cast("tinyint"))
            .otherwise(lit(0).cast("tinyint"))).as("q")))
  }

  /** Dequantize [[quantizeInt8]] output back to double vectors. */
  def dequantizeInt8(quantized: Column): Column =
    graft.operators.TextAnalysis.bindOnce(quantized, s =>
      transform(s.getField("q"), q => q.cast("double") * s.getField("scale")))

  /** Per-cell centroid scores as an array<struct<score,cell>> — the shared
    * primitive of [[ivfAssign]] (argmax) and [[ivfTopK]] (top-nProbes).
    */
  private def cellScores(vec: Column, nCells: Int, dim: Int): Column =
    array((0 until nCells).map { c =>
      struct(planeProj(vec, 100000 + c, dim).as("score"), lit(c).as("cell"))
    }: _*)

  /** IVF-style coarse quantization: assign every vector to its nearest of
    * `nCells` deterministic pseudo-random centroid directions (same
    * hash-derived ±1 construction as the hyperplanes), so ANN probes only
    * matching cells. Returns df + `ivf_cell`.
    */
  def ivfAssign(df: DataFrame, vecCol: String, nCells: Int = 16, dim: Int = 64): DataFrame =
    df.withColumn("ivf_cell", array_max(cellScores(col(vecCol), nCells, dim)).getField("cell"))

  /** Per-vector scores against TRAINED centroids (plan-time literal
    * arrays, like [[literalPlane]]): struct(dot, cell) per centroid.
    * Ties resolve to the larger cell id under array_max's struct order —
    * the same deterministic policy as [[cellScores]].
    */
  private[graft] def trainedCellScores(vec: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (cv, i) =>
      struct(
        aggregate(
          zip_with(vec, typedlit(cv), (x, w) => coalesce(x.cast("double") * w, lit(0.0))),
          lit(0.0), (acc, x) => acc + x).as("score"),
        lit(i).as("cell"))
    }: _*)

  /** Train IVF centroids: Lloyd's k-means iterations on a deterministic
    * content-hash sample, maximizing dot(vec, centroid) with
    * unit-normalized centroids — spherical k-means, the right objective
    * for cosine ANN.
    *
    * 100 TB shape: training runs on a hash-derived Bernoulli sample
    * (layout/retry/cluster-size independent, the Export.mixCorpora
    * argument), each iteration is one assign-and-average pass —
    * posexplode to (cell, dim) pairs, partial+final AVG, `nCells × dim`
    * doubles back to the driver (bounded driver bytes, like the Bloom
    * build and Layout's quantile boundaries). The corpus itself is
    * assigned in ONE narrow pass afterwards; only the sample pays the
    * iteration cost. Empty cells keep their previous centroid (no NaN
    * poisoning). Fully deterministic: seeded hash init, literal-constant
    * centroids at every step.
    */
  def trainCentroids(
      df: DataFrame, idCol: String, vecCol: String, nCells: Int,
      iters: Int = 5, sampleFraction: Double = 1.0,
      seed: Long = 42L): Array[Array[Double]] = {
    require(nCells >= 1 && iters >= 0, "need nCells >= 1, iters >= 0")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0, "fraction in (0,1]")
    val denom = 1L << 20
    val base = if (sampleFraction >= 1.0) df
      else df.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(denom))
        < lit((sampleFraction * denom).toLong))
    val sample = base.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_id"),
        transform(col(vecCol), x => x.cast("double")).as("_v"))

    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    // init = the nCells sample rows with smallest seeded id-hash: a
    // deterministic uniform draw (k-means++ would need k sequential
    // passes; hash-init + iterations reaches the same place here)
    var centroids = sample
      .orderBy(xxhash64(col("_id"), lit(seed ^ 0x9e3779b97f4a7c15L)), col("_id"))
      .limit(nCells)
      .select("_v").collect().map(r => unit(r.getSeq[Double](0).toArray))
    require(centroids.length == nCells,
      s"sample has ${centroids.length} vectors < nCells=$nCells — lower nCells or raise sampleFraction")

    for (_ <- 1 to iters) {
      // exact-DECIMAL sums, not double avg: double addition is partition-
      // order dependent, so layout changes (repartition, task retries)
      // would drift the trained centroids in the last ulp — the decimal
      // sum is order-independent and the 1e-18 truncation is far below
      // float32 input precision (same determinism discipline as q42)
      val means = sample
        .withColumn("_cell",
          array_max(trainedCellScores(col("_v"), centroids)).getField("cell"))
        .select(col("_cell"), posexplode(col("_v")).as(Seq("_i", "_x")))
        .groupBy("_cell", "_i")
        .agg((sum(col("_x").cast("decimal(28,18)")).cast("double")
          / count(lit(1))).as("_m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next.map(unit)
    }
    centroids
  }

  /** Persist trained centroids as a tiny parquet table (cell, dim,
    * value) — the production IVF lifecycle trains the coarse quantizer
    * ONCE offline and loads it in every query job; shipping the
    * Array[Array[Double]] through a driver variable only works inside
    * one application. Deterministic layout (one file, cell-major rows)
    * so re-saves of identical centroids are byte-comparable.
    */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    val rows = for {
      (c, cell) <- centroids.zipWithIndex
      (v, dim) <- c.zipWithIndex
    } yield (cell, dim, v)
    rows.toSeq.toDF("cell", "dim", "value")
      .coalesce(1).sortWithinPartitions("cell", "dim")
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[saveCentroids]]; validates the (cell, dim) grid is
    * dense so a torn write surfaces as an error, not a skewed index.
    */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(path)
      .select("cell", "dim", "value")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    require(rows.nonEmpty, s"no centroid rows at $path")
    val nCells = rows.map(_._1).max + 1
    val dim = rows.map(_._2).max + 1
    require(rows.length == nCells * dim,
      s"sparse centroid grid at $path: ${rows.length} rows for ${nCells}x$dim")
    val out = Array.fill(nCells)(new Array[Double](dim))
    rows.foreach { case (c, d, v) => out(c)(d) = v }
    out
  }

  /** [[ivfAssign]] with trained centroids instead of hash directions. */
  def ivfAssignTrained(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("ivf_cell",
      array_max(trainedCellScores(col(vecCol), centroids)).getField("cell"))

  /** IVF probe top-k: the actual search path over the coarse quantization
    * (not just the cell label). Corpus rows live in exactly ONE cell
    * (argmax assignment); each query probes its `nProbes` best-scoring
    * cells; candidates = corpus rows in probed cells, re-ranked by the
    * fused native cosine; top-k per query.
    *
    * Scale shape: the only wide operation is the equi-join on `_cell`
    * (shuffle-partitionable; cells play the role of IVF inverted lists),
    * exactly like the LSH band join — never a cross join. Each corpus row
    * is shuffled once (one cell), each query `nProbes` times.
    * `nProbes = nCells` degenerates to exhaustive search and must equal
    * [[bruteForceTopK]] (pinned in SimilaritySpec); fewer probes trade
    * recall for a 1/nCells-ish candidate fraction.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbes: Int = 4, dim: Int = 64,
      excludeSelf: Boolean = true): DataFrame = {
    require(nProbes >= 1 && nProbes <= nCells, "need 1 <= nProbes <= nCells")
    // null-vector rows excluded on both sides — same policy as
    // bruteForceTopK and the LSH path, preserving full-probe ≡ brute force
    val c = ivfAssign(corpus.filter(col(vecCol).isNotNull), vecCol, nCells, dim)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"), col("ivf_cell").as("_cell"))
    // top-nProbes cells per query: sort struct(score, cell) desc, take heads
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_qid"), col(vecCol).as("_qv"),
        cellScores(col(vecCol), nCells, dim).as("_scored"))
      .select(col("_qid"), col("_qv"),
        explode(transform(
          slice(reverse(array_sort(col("_scored"))), 1, nProbes),
          s => s.getField("cell"))).as("_cell"))
    probeJoin(corpus.sparkSession, c, q, k, excludeSelf)
  }

  /** Shared IVF probe body: equi-join corpus cells with query probe
    * cells, re-rank candidates by the fused native cosine, top-k per
    * query. No distinct needed: a corpus row has exactly one cell and a
    * query probes distinct cells, so each (query, corpus) pair joins at
    * most once.
    */
  private def probeJoin(spark: org.apache.spark.sql.SparkSession,
      c: DataFrame, q: DataFrame, k: Int, excludeSelf: Boolean): DataFrame = {
    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("cosine").desc, col("_cid").asc)
    q.join(c, Seq("_cell"))
      .filter(if (excludeSelf) col("_qid") =!= col("_cid") else lit(true))
      .withColumn("cosine", fastCosine(spark, col("_qv"), col("_cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** [[ivfTopK]] over TRAINED centroids ([[trainCentroids]]) — the
    * classic two-phase IVF: train the coarse quantizer on a sample, then
    * search with cells aligned to the data's actual cluster structure
    * instead of arbitrary hash directions. Same scale shape as
    * [[ivfTopK]] (one narrow cell per corpus row, nProbes per query, one
    * equi-join); the payoff is recall per probe on clustered corpora —
    * hash-direction cells split real clusters across cell boundaries,
    * trained cells wrap them (recall gain pinned in SimilaritySpec).
    * `nProbes = centroids.length` still degenerates to exhaustive search.
    */
  def ivfTopKTrained(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nProbes: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(nProbes >= 1 && nProbes <= centroids.length,
      "need 1 <= nProbes <= centroids.length")
    val c = ivfAssignTrained(corpus.filter(col(vecCol).isNotNull), vecCol, centroids)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"), col("ivf_cell").as("_cell"))
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_qid"), col(vecCol).as("_qv"),
        trainedCellScores(col(vecCol), centroids).as("_scored"))
      .select(col("_qid"), col("_qv"),
        explode(transform(
          slice(reverse(array_sort(col("_scored"))), 1, nProbes),
          s => s.getField("cell"))).as("_cell"))
    probeJoin(corpus.sparkSession, c, q, k, excludeSelf)
  }

  // ------------------------------------------- product quantization (PQ)

  /** Unit-normalize a vector column to double elements (all-zero vectors
    * pass through unchanged). PQ for COSINE ranking quantizes normalized
    * vectors: on the unit sphere `‖a−b‖² = 2 − 2·cos(a,b)`, so ascending
    * ADC distance is exactly descending cosine — without this, L2 code
    * distances and cosine ranks disagree whenever norms vary.
    */
  private[graft] def unitNorm(vec: Column): Column = {
    val n = norm(vec)
    when(n > 0, transform(vec, x => x.cast("double") / n))
      .otherwise(transform(vec, x => x.cast("double")))
  }

  /** Squared-L2 distance of subvector `sv` (double elements, 1-based from
    * `offset+1`, length = codebook row width) against a centroid given as
    * a single ArrayType literal (or lambda variable).
    *
    * Plan-size discipline: the first implementation unrolled one
    * `element_at(sv, i) − lit(c)` pair PER DIMENSION, which copies the
    * `sv` subtree (often a whole [[unitNorm]] expression) dim × cells ×
    * subspaces times — ~10⁵ expression nodes for the default PQ shape,
    * and the optimizer's tree passes turned planning into ~40 s of driver
    * CPU (measured on q100). `slice`+`zip_with`+`aggregate` against ONE
    * array literal keeps the same left-fold float order in ~15 nodes.
    */
  private[graft] def subDist(sv: Column, offset: Int, centroid: Column, dsub: Int): Column =
    aggregate(
      zip_with(slice(sv, offset + 1, dsub), centroid, (a, c) => (a - c) * (a - c)),
      lit(0.0), (acc, x) => acc + x)

  /** argmin cell over one subspace codebook: array_min of
    * struct(dist, cell) — deterministic smallest-cell tiebreak. The
    * codebook is ONE nested-array literal; the index lambda supplies the
    * cell id.
    */
  private def subArgmin(sv: Column, offset: Int, codebook: Array[Array[Double]]): Column = {
    val dsub = codebook(0).length
    array_min(transform(typedlit(codebook.map(_.toSeq).toSeq), (c, i) =>
      struct(subDist(sv, offset, c, dsub).as("dist"), i.as("cell"))))
      .getField("cell")
  }

  /** Train product-quantization codebooks: the vector space is split into
    * `m` contiguous subspaces of `dim/m` dimensions; each subspace gets an
    * independent `ksub`-centroid k-means (plain L2, over unit-NORMALIZED
    * vectors — see [[unitNorm]]). Returns `codebooks(j)(cell)(d)`.
    *
    * Scale shape (mirrors [[trainCentroids]]): init = the `ksub`
    * smallest-seeded-hash sample rows, sliced into all m subspaces at
    * once (one bounded collect); then each iteration is ONE pass over the
    * sample — posexplode to (subspace, subvector-element) AFTER computing
    * all m assignments per row in a single fused projection, partial+final
    * AVG, `m × ksub × dim/m = ksub × dim` doubles back to the driver.
    * Deterministic end to end. Train once offline at 100 TB and persist
    * via [[savePqCodebooks]].
    */
  def trainPqCodebooks(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16, dim: Int = 64,
      iters: Int = 4, sampleFraction: Double = 1.0,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 1 && ksub <= 256, "need 1 <= ksub <= 256 (byte codes)")
    val dsub = dim / m
    val denom = 1L << 20
    val base = if (sampleFraction >= 1.0) df
      else df.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(denom))
        < lit((sampleFraction * denom).toLong))
    val sample = base.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_id"), unitNorm(col(vecCol)).as("_v"))

    val initRows = sample
      .orderBy(xxhash64(col("_id"), lit(seed ^ 0x9e3779b97f4a7c15L)), col("_id"))
      .limit(ksub)
      .select("_v").collect().map(_.getSeq[Double](0).toArray)
    require(initRows.length == ksub,
      s"sample has ${initRows.length} vectors < ksub=$ksub — lower ksub or raise sampleFraction")
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m) { j =>
        initRows.map(v => v.slice(j * dsub, (j + 1) * dsub)
          .padTo(dsub, 0.0))
      }

    for (_ <- 1 to iters) {
      // one fused projection computes every subspace's assignment, then
      // ONE posexplode/agg pass collects all m × ksub × dsub means
      val assigned = sample.select(
        array((0 until m).map(j =>
          subArgmin(col("_v"), j * dsub, codebooks(j))): _*).as("_cells"),
        col("_v"))
      val means = assigned
        .select(posexplode(col("_v")).as(Seq("_gd", "_x")), col("_cells"))
        .select((col("_gd") / dsub).cast("int").as("_j"),
          pmod(col("_gd"), lit(dsub)).cast("int").as("_d"),
          element_at(col("_cells"), (col("_gd") / dsub).cast("int") + 1).as("_cell"),
          col("_x"))
        .groupBy("_j", "_cell", "_d")
        // exact-DECIMAL sum for layout-independent means (see
        // trainCentroids — double sums drift with partition order)
        .agg((sum(col("_x").cast("decimal(28,18)")).cast("double")
          / count(lit(1))).as("_mn"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      codebooks = next // empty cells keep their previous centroid
    }
    codebooks
  }

  /** Persist PQ codebooks as a tiny dense parquet grid
    * (subspace, cell, dim, value) — same offline-train lifecycle as
    * [[saveCentroids]].
    */
  def savePqCodebooks(spark: org.apache.spark.sql.SparkSession,
      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    val rows = for {
      (cb, j) <- codebooks.zipWithIndex
      (c, cell) <- cb.zipWithIndex
      (v, d) <- c.zipWithIndex
    } yield (j, cell, d, v)
    rows.toSeq.toDF("subspace", "cell", "dim", "value")
      .coalesce(1).sortWithinPartitions("subspace", "cell", "dim")
      .write.mode("overwrite").parquet(path)
  }

  /** Inverse of [[savePqCodebooks]]; rejects sparse/torn grids. */
  def loadPqCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path)
      .select("subspace", "cell", "dim", "value")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    require(rows.nonEmpty, s"no codebook rows at $path")
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    val dsub = rows.map(_._3).max + 1
    require(rows.length == m * ksub * dsub,
      s"sparse codebook grid at $path: ${rows.length} rows for ${m}x${ksub}x$dsub")
    val out = Array.fill(m, ksub)(new Array[Double](dsub))
    rows.foreach { case (j, c, d, v) => out(j)(c)(d) = v }
    out
  }

  /** Encode vectors to PQ codes: `codeCol` = array<int> of length m, code
    * j = argmin-L2 cell of subspace j (over the unit-normalized vector).
    * One fused per-row projection, no shuffle — at 100 TB the persisted
    * index row is (id, coarse cell, m small ints) ≈ tens of bytes instead
    * of the 4·dim-byte raw vector: the ~30× footprint drop is the whole
    * point of PQ.
    */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]],
      codeCol: String = "pq_code"): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    // bindOnce: the normalized vector is a lambda variable, not a subtree
    // copied into every subspace argmin (see subDist's plan-size note)
    df.withColumn(codeCol,
      graft.operators.TextAnalysis.bindOnce(unitNorm(col(vecCol)), nv =>
        array((0 until m).map(j => subArgmin(nv, j * dsub, codebooks(j))): _*)))
  }

  /** IVF-PQ top-k — the 100 TB ANN search shape. Corpus rows are indexed
    * ONCE as (id, coarse cell, PQ codes); queries probe their `nProbes`
    * best coarse cells (trained centroids, as in [[ivfTopKTrained]]),
    * score every candidate with the asymmetric-distance (ADC) lookup —
    * `Σ_j lut(j)(code_j)`, where the per-QUERY lut holds the exact
    * subvector-to-centroid distances, computed once per query BEFORE the
    * join fan-out — keep the best `rerank` candidates per query by ADC,
    * and only those few rows join back to full vectors for the exact
    * native-cosine re-rank and final top-k.
    *
    * Scale shape: the wide candidate join ships only the compressed index
    * rows (never full vectors); the full-vector join-back touches
    * `rerank` rows per query. `nProbes = nCells` with
    * `rerank ≥ candidate count` degenerates to exhaustive exact search
    * (the q100 oracle pin); production settings trade recall for the
    * 1/nCells·compression candidate cost (recall pinned in
    * SimilaritySpec).
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      codebooks: Array[Array[Array[Double]]],
      coarse: Array[Array[Double]], nProbes: Int,
      rerank: Int, excludeSelf: Boolean = true): DataFrame = {
    require(nProbes >= 1 && nProbes <= coarse.length,
      "need 1 <= nProbes <= coarse.length")
    require(rerank >= k, "rerank depth must be >= k")
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val spark = corpus.sparkSession

    val full = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
    // the compressed index: id + coarse cell + m codes, no vectors.
    // r15: PERSISTED — an index is materialized state. Without the
    // barrier, column pruning defers `_codes` into the candidate join,
    // where the per-row argmin-over-ksub-centroids encode lambda tree
    // re-evaluates once per (query, corpus) CANDIDATE — measured
    // ~17 s of the face's 18.9 s at 100× (1 M candidates ≈ 5× the
    // corpus re-encoded, interpreted). Persisted, the encode runs once
    // per corpus row and probes read stored bytes; the frame is
    // (id, cell, m codes) ≈ tens of bytes per row — the ~30×
    // compression that makes a PQ index RAM-resident is exactly why
    // this persist is cheap at any scale.
    val compressed = pqEncode(
        ivfAssignTrained(corpus.filter(col(vecCol).isNotNull), vecCol, coarse),
        vecCol, codebooks, "_codes")
      .select(col(idCol).as("_cid"), col("ivf_cell").as("_cell"), col("_codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val lut = graft.operators.TextAnalysis.bindOnce(unitNorm(col(vecCol)), qn =>
      array((0 until m).map { j =>
        transform(typedlit(codebooks(j).map(_.toSeq).toSeq),
          c => subDist(qn, j * dsub, c, dsub))
      }: _*))
    // r15: persist the (|queries| × nProbes)-row frame so `_lut`
    // becomes STORED DATA at the join. Without the barrier,
    // CollapseProject folds this projection into the candidate join and
    // the ADC "table lookup" re-evaluates the full m×ksub subDist
    // lambda tree (unitNorm included) PER CANDIDATE ROW — measured
    // 11 µs/row ≈ 11 s over a 1 M-candidate probe at 100×, vs
    // nanoseconds for element_at on materialized arrays. Memory is
    // bounded by the query set (≈ m·ksub + dim doubles per row);
    // MEMORY_AND_DISK + CacheManager plan-dedupe per the
    // madOutlierStats persistence discipline.
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_qid"), col(vecCol).as("_qv"), lut.as("_lut"),
        trainedCellScores(col(vecCol), coarse).as("_scored"))
      .select(col("_qid"), col("_qv"), col("_lut"),
        explode(transform(
          slice(reverse(array_sort(col("_scored"))), 1, nProbes),
          s => s.getField("cell"))).as("_cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val adc = (0 until m).map(j =>
      element_at(element_at(col("_lut"), j + 1),
        element_at(col("_codes"), j + 1) + 1)).reduce(_ + _)
    val wAdc = Window.partitionBy(col("_qid"))
      .orderBy(col("_adc").asc, col("_cid").asc)
    // r15: compute _adc in the join projection and SHED the wide
    // per-query payload (_lut m×ksub doubles, _qv dim doubles) before
    // the per-query ranking sort — carrying them put ~1.5 KB on every
    // candidate row through the two windows (measured 17 s for a 1 M-
    // candidate probe at 100×, vs 1.4 s brute); the narrow
    // (_qid,_cid,_adc) rows sort at memory-bandwidth instead, and the
    // query vector rejoins via a |queries|-row broadcast for the exact
    // re-rank
    val candidates = q.join(compressed, Seq("_cell"))
      .filter(if (excludeSelf) col("_qid") =!= col("_cid") else lit(true))
      .select(col("_qid"), col("_cid"), adc.as("_adc"))
      .withColumn("_ar", row_number().over(wAdc))
      .filter(col("_ar") <= rerank)
      .select(col("_qid"), col("_cid"))

    val qv = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_qid"), col(vecCol).as("_qv"))
    val wk = Window.partitionBy(col("_qid"))
      .orderBy(col("cosine").desc, col("_cid").asc)
    candidates.join(full, Seq("_cid"))
      .join(broadcast(qv), Seq("_qid"))
      .select(col("_qid"), col("_cid"),
        fastCosine(spark, col("_qv"), col("_cv")).as("cosine"))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("_qid").as("query_id"), col("_cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Per-vector symmetric int8 quantization audit + matryoshka truncation
    * energy — the embedding-compression stats a vector store computes
    * before switching its index to 4×-smaller codes.
    *
    * For each vector x: scale s = max|xᵢ|/127, code qᵢ =
    * clamp(round(xᵢ/s), ±127), dequantized x̂ᵢ = qᵢ·s. Emits the L2 norm,
    * the scale, the worst absolute reconstruction error (≤ s/2 by
    * construction — pinned in SimilaritySpec), the full-vs-dequantized
    * cosine, and the fraction of L2 energy kept by the first `prefixDims`
    * dimensions (the matryoshka head strength). All-zero vectors get
    * scale 0 and pass through exactly (error 0, cosine 1 by convention).
    *
    * Scale shape: pure `transform`/`zip_with`/`aggregate` higher-order
    * expressions over the array column — map-only, codegen-friendly, no
    * shuffle, no UDF. At 100 TB this runs at scan speed and is the
    * pre-pass that feeds [[pqTopK]]'s code index.
    */
  def int8QuantStats(
      df: DataFrame, idCol: String, vecCol: String,
      prefixDims: Int = 16): DataFrame = {
    require(prefixDims > 0, "prefixDims must be positive")
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    // one quantization definition in the repo: this audit round-trips
    // [[quantizeInt8]] → [[dequantizeInt8]] rather than re-deriving codes
    val dv = transform(col(vecCol), x => x.cast("double"))
    val norm2 = dot(dv, dv)
    val head2 = dot(slice(dv, 1, prefixDims), slice(dv, 1, prefixDims))
    // zero-vector guards live INSIDE CaseWhen branches (lazily evaluated
    // per row) — under ANSI mode an unconditional x/0 throws even when a
    // later projection would discard it
    df.select(col(idCol), dv.as("_dv"), norm2.as("_n2"), head2.as("_h2"),
        dequantizeInt8(quantizeInt8(col(vecCol))).as("_dq"),
        (array_max(transform(dv, x => abs(x))) / 127.0).as("_s"))
      .select(col(idCol),
        round(sqrt(col("_n2")), 6).as("norm"),
        round(col("_s"), 9).as("scale"),
        when(col("_s") === 0, lit(0.0)).otherwise(
          round(array_max(zip_with(col("_dv"), col("_dq"),
            (a, b) => abs(a - b))), 9)).as("max_err"),
        when(col("_s") === 0, lit(1.0)).otherwise(
          round(dot(col("_dv"), col("_dq"))
            / (sqrt(col("_n2")) * sqrt(dot(col("_dq"), col("_dq")))), 6))
          .as("cos_dq"),
        when(col("_s") === 0, lit(1.0))
          .otherwise(round(col("_h2") / col("_n2"), 6)).as("head_energy"))
  }
}
