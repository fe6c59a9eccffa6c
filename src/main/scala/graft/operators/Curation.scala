package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the LLM-training-data pipeline (builder
  * prompt "beyond the reference" set, round 5): PII detection/redaction,
  * deterministic train/val/test split assignment, exact stratified
  * sampling with a hash-prefilter scale path, and chunk-level exact
  * dedup by ownership.
  *
  * Everything here is pure `org.apache.spark.sql.functions` — whole-stage
  * codegen'd, no UDFs — and every public surface is deterministic
  * (hash-derived, never `rand()`), so a re-run on a 1000-executor
  * cluster reproduces the sandbox bit-for-bit regardless of partitioning
  * or task retries.
  */
object Curation {

  // ---------------------------------------------------------------- PII

  /** PII patterns, deliberately restricted to the regex subset where
    * Java's engine (Spark) and RE2 (the DuckDB oracle) agree: character
    * classes, bounded repetition, `\b` — no backrefs, no lookaround.
    * Order matters for redaction: email first (its local part may
    * contain digits that the phone pattern could otherwise clip),
    * then IPv4, then phone.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d{1,2}-\\d{3}-\\d{4}", "<PHONE>"),
  )

  /** Per-category PII occurrence counts for one text column. Shuffle-free
    * per-row expressions; counts are computed on the ORIGINAL text (before
    * any redaction), so categories never mask each other.
    */
  def piiCounts(text: Column): Seq[(String, Column)] =
    PiiPatterns.map { case (name, pat, _) =>
      (s"n_$name", regexp_count(text, lit(pat)).cast("long"))
    }

  /** Redact all PII categories, applying the patterns in [[PiiPatterns]]
    * order. Sequential `regexp_replace` stays inside whole-stage codegen;
    * one pass per category over the row, no shuffle.
    */
  def piiRedact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Append detection counts + a redacted copy of `textCol`. */
  def piiScan(df: DataFrame, textCol: String,
              redactedCol: String = "redacted"): DataFrame = {
    val withCounts = piiCounts(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withCounts.withColumn(redactedCol, piiRedact(col(textCol)))
  }

  // ------------------------------------------------- split assignment

  /** Uniform 16-bit hash of a key: the first 4 hex chars of `md5(key)`
    * read as an integer in [0, 65536). String-cast first so integer and
    * string keys hash identically across engines ('42' == CAST(42)).
    */
  def hash16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Deterministic train/val/test (or any n-way) split assignment.
    * `weights` are (label, weight) pairs; rows land in the label whose
    * cumulative-weight bucket contains `hash16(key)`. Hash-derived, so:
    * stable under repartitioning/retries, consistent across runs and
    * clusters, and a *document* stays in the same split when the corpus
    * grows — the property `rand()`-based splitting cannot give. Per-row
    * expression, no shuffle.
    */
  def assignSplit(key: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cutoffs = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c / total * 65536).toInt)
    val h = hash16(key)
    // last bucket is the open-ended else: floating-point cutoff math can
    // never strand a row
    weights.init.zip(cutoffs).reverse.foldLeft(lit(weights.last._1)) {
      case (els, ((label, _), cut)) => when(h < cut, label).otherwise(els)
    }
  }

  // ---------------------------------------------- stratified sampling

  /** Exact deterministic stratified sample: the `k` rows of each stratum
    * with the smallest `(md5(key), key)` — a reproducible uniform draw
    * (md5 order is uncorrelated with any data order; `key` breaks the
    * astronomically-unlikely md5 tie deterministically).
    *
    * Scale shape: the naive form is one window over a shuffle by
    * `strataCol` — every row of a 100 TB stratum ships to its reducer
    * chain just to be discarded. Instead, a two-phase plan:
    *
    *   1. count each stratum (partial+final agg, tiny result);
    *   2. broadcast a per-stratum hash16 cutoff that keeps
    *      ~`overscan * k` EXPECTED rows; prefilter AT THE SCAN — only
    *      the ~overscan*k survivors per stratum enter the exchange;
    *   3. exact rank over the survivors; any stratum the prefilter left
    *      with < k survivors (possible: the cutoff is an expectation)
    *      falls back to ranking its full data, so the result is
    *      EXACTLY the naive answer, always.
    *
    * Correctness of the prefilter: survivors hold every row with
    * hash16 <= cutoff, and hash16 is a prefix of the md5 sort key, so if
    * >= k survive, the true top-k of the stratum are all survivors (an
    * excluded row's md5 is strictly greater than every survivor's in the
    * leading 4 hex chars).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       k: Int, overscan: Double = 4.0,
                       rankCol: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    require(overscan >= 1.0, "overscan must be >= 1")
    Seq("_h16", "_cut", "_n", rankCol).foreach { c =>
      require(!df.columns.contains(c), s"input already has a $c column")
    }
    val h = hash16(col(keyCol))
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_n"))
      // keep >= overscan*k rows in expectation; +64 absorbs small-stratum
      // variance so the fallback stays rare
      .select(col(strataCol),
        least(lit(65536),
          ceil(lit(65536.0) * (lit(overscan) * k + 64) / col("_n")))
          .cast("int").as("_cut"), col("_n"))
    val pre = df.withColumn("_h16", h)
      .join(broadcast(counts), Seq(strataCol))
      .filter(col("_h16") <= col("_cut") || col("_n") <= k)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val ranked = pre.withColumn(rankCol, row_number().over(w))
    // strata where the prefilter under-shot (survivors < k but stratum had
    // more rows): re-rank those strata over the full input. Derived from
    // `counts` (not `ranked`) so even a zero-survivor stratum — possible in
    // principle, the cutoff is an expectation — is caught, never dropped.
    val short = counts.join(
        ranked.groupBy(col(strataCol)).agg(max(col(rankCol)).as("_got")),
        Seq(strataCol), "left")
      .filter(coalesce(col("_got"), lit(0)) < lit(k) &&
        col("_n") > coalesce(col("_got"), lit(0)))
      .select(col(strataCol))
    val outCols = (df.columns.map(col) :+ col(rankCol)).toSeq
    val fallback = df.join(broadcast(short), Seq(strataCol), "left_semi")
      .withColumn(rankCol, row_number().over(w))
      .select(outCols: _*)
    val ok = ranked.join(broadcast(short), Seq(strataCol), "left_anti")
      .select(outCols: _*)
    ok.unionByName(fallback).filter(col(rankCol) <= k)
  }

  // -------------------------------------------- chunk-ownership dedup

  /** Chunk-level exact dedup ("paragraph dedup" for corpora whose unit is
    * a fixed token window): split every document into `chunkTokens`-token
    * chunks, assign each DISTINCT chunk text to its smallest-doc-id owner,
    * and report how many chunks each surviving owner keeps. The training
    * set then contains each repeated boilerplate block once — the
    * chunk-granular complement of [[Dedup.exactKeepMinId]].
    *
    * Scale shape: explode to chunks (linear fan-out, no shuffle), one
    * hash-agg by chunk text for ownership (map-side combine collapses
    * within-partition repeats of hot boilerplate before the exchange),
    * one hash-agg by owner. Two narrow shuffles total; no window, no
    * join back to the full text.
    */
  def chunkOwnershipStats(df: DataFrame, idCol: String, textCol: String,
                          chunkTokens: Int = 8): DataFrame = {
    val chunks = TextAnalysis.chunkDocuments(
      df, idCol, textCol, chunkTokens = chunkTokens, overlap = 0)
    chunks.groupBy(col("chunk_text"))
      .agg(min(col(idCol)).as(idCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("owned_chunks"))
  }
}
