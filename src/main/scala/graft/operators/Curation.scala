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

  // --------------------------------------- token-budget mixture sampling

  /** Deterministic token-budget mixture sampling: for each source, take
    * documents in `(md5(key), key)` order — the same reproducible uniform
    * draw as [[stratifiedSample]] — until that source's TOKEN budget is
    * reached. This is how training mixtures are actually specified
    * ("200 B tokens of web, 50 B of code"): the unit is tokens, not
    * documents, so a fixed-k sample under/overshoots by the doc-length
    * distribution while this hits the budget exactly. A document is kept
    * iff the total tokens of the documents BEFORE it in its source's
    * draw order is < the budget — i.e. the selection is a prefix of the
    * draw and the boundary document (the one that crosses the budget) is
    * included, so the kept total always reaches the budget when the
    * source has enough tokens.
    *
    * Scale shape — the naive form is one window (cumulative token sum)
    * over a shuffle by source: every row of a 100 TB source ships
    * through its reducer chain just to be discarded. Instead, the same
    * two-phase hash-prefilter as [[stratifiedSample]], exact because
    * `hash16` is a PREFIX of the md5 draw order:
    *
    *   1. per-(source, hash16-bucket) token totals (partial+final agg,
    *      ≤ 65536 rows per source);
    *   2. an exclusive running sum over that TINY table gives every
    *      bucket's start offset; buckets whose offset is < budget are
    *      exactly the buckets that can contain kept rows (the last of
    *      them is the boundary bucket b*);
    *   3. ONE corpus pass: an inner broadcast join on (source, bucket)
    *      drops buckets past b* AT THE SCAN and attaches each kept
    *      bucket's start offset; a per-(source, bucket) cumulative-sum
    *      window (every partition bounded at ~1/65536 of the source)
    *      finishes the exact offset, and `tok_start < budget` selects
    *      the kept prefix. No kept/boundary split: every row of a
    *      bucket before b* passes that filter by construction (its
    *      tok_start < the bucket-chain prefix < budget), so the one
    *      filter is a no-op there and exact on the boundary — the r10
    *      form's separate boundary scan and survivor re-aggregation
    *      (two more corpus passes + a second broadcast, profiled as a
    *      4-dependent-job launch floor at 100×) collapse away.
    *
    * Returns the kept rows plus `n_tok` (the doc's token count) and
    * `tok_start` (exclusive cumulative offset of the doc in its source's
    * draw: the kept set is exactly `tok_start < budget`).
    *
    * Rows with a NULL `keyCol` are dropped (both branches): a null key
    * has no position in the md5 draw order — `hash16(null)` is null, so
    * the scale path's bucket join could never carry it, and keeping it
    * only in the small path would make the branch choice observable.
    *
    * EAGER when `smallThreshold > 0` and `rowCountHint < 0`: picking the
    * branch runs a bounded count job (`limit(smallThreshold+1).count`,
    * so the scan stops once the threshold is exceeded) and re-evaluates
    * the upstream lineage once. Callers that know the corpus size — or
    * whose input is non-deterministic / expensive to recompute — should
    * pass `rowCountHint` (any value ≥ 0 suppresses the count job).
    */
  def tokenBudgetMixture(df: DataFrame, sourceCol: String, keyCol: String,
                         textCol: String, budget: Column,
                         smallThreshold: Long = 2000000L,
                         rowCountHint: Long = -1L): DataFrame = {
    Seq("_h16", "_ntok", "_boff", "_btok", "_budget", "n_tok", "tok_start")
      .foreach { c =>
        require(!df.columns.contains(c), s"input already has a $c column")
      }
    // Small-corpus fast path (the q75 driver-union-find precedent: an
    // explicit threshold picks the plan the data size makes optimal).
    // Below `smallThreshold` rows a per-source window partition cannot
    // overwhelm a reducer, and the definitional single-window plan — one
    // tokenize scan, one exchange, one sort — strictly beats the
    // prefilter's two corpus passes + coarse-table window (r11 100×
    // profile: the two-phase form's coarse agg alone costs more than the
    // whole naive plan when buckets average ~1 doc). The two-phase form
    // below is the 100 TB path: sources at billions of rows would
    // serialize through single window partitions, which the hash16
    // prefilter caps at 1/65536 of the source. Both branches are pinned
    // equal in CurationSpec (the naive form IS the spec's oracle;
    // smallThreshold = 0 forces the two-phase branch there).
    // Null keys have no draw position; drop them identically in both
    // branches so the branch choice can never change the result.
    val dfNn = df.filter(col(keyCol).isNotNull)
    val nRows =
      if (smallThreshold <= 0) Long.MaxValue
      else if (rowCountHint >= 0) rowCountHint
      else dfNn.limit(math.min(smallThreshold + 1, Int.MaxValue.toLong).toInt).count()
    if (smallThreshold > 0 && nRows <= smallThreshold) {
      val w = Window.partitionBy(col(sourceCol))
        .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      val outCols = (df.columns.map(col) :+
        col("_ntok").cast("long").as("n_tok") :+ col("tok_start")).toSeq
      return dfNn
        .withColumn("_ntok", graft.operators.TextAnalysis.tokenCount(col(textCol)))
        .withColumn("_budget", budget)
        .withColumn("tok_start", coalesce(sum(col("_ntok")).over(w), lit(0L)))
        .filter(col("tok_start") < col("_budget"))
        .select(outCols: _*)
    }
    val base = dfNn
      .withColumn("_h16", hash16(col(keyCol)))
      .withColumn("_budget", budget)
    // phase 1: coarse per-bucket totals — at most 65536 rows per source
    val coarse = base
      .withColumn("_ntok", graft.operators.TextAnalysis.tokenCount(col(textCol)))
      .groupBy(col(sourceCol), col("_h16"), col("_budget"))
      .agg(sum(col("_ntok")).as("_btok"))
    // phase 2: exclusive per-bucket start offsets over the tiny coarse
    // table (window partitions by source over ≤65536 rows — driver-free
    // and bounded regardless of corpus size); a bucket can contain kept
    // rows iff its start offset is still below the budget.
    val wc = Window.partitionBy(col(sourceCol)).orderBy(col("_h16"))
    val keepBuckets = coarse
      .withColumn("_boff", coalesce(sum(col("_btok")).over(
        wc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("_boff") < col("_budget"))
      .select(col(sourceCol), col("_h16"), col("_boff"))
    // phase 3 — the single corpus pass: the inner broadcast join drops
    // past-boundary buckets at the scan and attaches each surviving
    // bucket's start offset; the per-(source, bucket) window (each
    // partition ~1/65536 of the source) finishes the exact cumulative
    // offset. `tok_start < budget` is a no-op for buckets before the
    // boundary (their every tok_start is below the bucket-chain prefix,
    // which is below the budget) and exact on the boundary bucket.
    // Tokenization in this pass runs AFTER the bucket join: only
    // surviving-bucket rows (a budget-sized sliver of the corpus) pay
    // the second tokenCount — the full-corpus tokenize happens exactly
    // once, in the phase-1 agg, matching the one pass the definitional
    // single-window form cannot go below.
    val wkb = Window.partitionBy(col(sourceCol), col("_h16"))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val outCols = (df.columns.map(col) :+
      col("_ntok").cast("long").as("n_tok") :+ col("tok_start")).toSeq
    base.join(broadcast(keepBuckets), Seq(sourceCol, "_h16"))
      .withColumn("_ntok", graft.operators.TextAnalysis.tokenCount(col(textCol)))
      .withColumn("tok_start",
        col("_boff") + coalesce(
          sum(col("_ntok")).over(wkb.rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("tok_start") < col("_budget"))
      .select(outCols: _*)
  }

  /** Deterministic weighted sampling WITHOUT replacement (the
    * exponential-race form of Efraimidis–Spirakis A-ES): each row draws
    * E = −ln(u)/w, where u ∈ (0,1) is its first-8-hex md5 fraction and
    * `weight` w must be strictly positive; the k SMALLEST draws are a
    * weighted sample without replacement with inclusion ∝ w — the
    * mixture-construction primitive ("sample docs proportional to
    * quality"). Returns the selected rows plus `rankCol` (1-based draw
    * order).
    *
    * Deterministic like [[assignSplit]]/[[stratifiedSample]]: the draw
    * is a pure function of the row key, so the sample is identical
    * under repartitioning, task retries, and corpus reordering — and
    * scale-invariant in the weights (multiplying every w by a constant
    * divides every draw by it, preserving order). Scale shape: the cut
    * is orderBy+limit → TakeOrderedAndProject (per-partition top-k,
    * driver merges k·partitions candidates) — no global sort, no
    * corpus-wide window; the rank window runs AFTER the cut, over
    * exactly k rows.
    */
  /** Temperature-weighted mixture allocation (the multilingual-corpus
    * sampling rule of XLM-R / mT5: p_i ∝ n_i^α with α = 0.5 here):
    * given per-source token totals, allocate a global token `budget`
    * across sources by √n weights with LARGEST-REMAINDER integer
    * rounding, so allocations are integers that sum to the budget
    * EXACTLY. `epochs` = alloc/n (upsampled low-resource sources read
    * > 1 epoch — the formula's whole point).
    *
    * Cross-engine exactness (the reason α is pinned at 0.5): IEEE
    * `sqrt` is correctly rounded, so the integer score
    * s_i = round(√n_i · scale) is bit-identical on both engines
    * (a general `pow` is NOT — last-ulp libm differences could flip
    * the remainder ranking). Everything after is BIGINT arithmetic:
    * floor via integral `div`, remainders exact, leftover distributed
    * by (remainder DESC, source ASC) rank. `scale` bounds precision
    * vs overflow: budget · max(s) must fit a long (guarded).
    *
    * Shape at scale: one token-count aggregation over the corpus; the
    * allocation runs on the |sources|-row frame (unpartitioned windows
    * over a dimension-sized table — the q62-class scalar shape).
    */
  def temperatureMixture(df: DataFrame, sourceCol: String, textCol: String,
                         budget: Long, scale: Long = 1000000L): DataFrame = {
    require(budget > 0 && scale > 0, "budget and scale must be positive")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(TextAnalysis.tokenCount(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("_s",
        round(sqrt(col("n_tokens").cast("double")) * lit(scale)).cast("long"))
    val all = Window.partitionBy() // |sources| rows — dimension-sized
    val scored = totals
      .withColumn("_T", sum(col("_s")).over(all))
      // overflow guard folded into the product: abort loudly at
      // execution rather than allocate garbage (lower `scale` to fix)
      .withColumn("_prod",
        when(col("_s") > lit(Long.MaxValue / budget),
          raise_error(lit(
            "temperatureMixture: budget x score overflows Long; lower scale"))
            .cast("long"))
          .otherwise(col("_s") * lit(budget)))
      .withColumn("_fl", expr("_prod div _T"))
      .withColumn("_rem", col("_prod") - col("_fl") * col("_T"))
      .withColumn("_left", lit(budget) - sum(col("_fl")).over(all))
      .withColumn("_rk", rank().over(
        Window.orderBy(col("_rem").desc, col(sourceCol).asc)))
    scored.select(
      col(sourceCol), col("n_tokens"),
      round(col("_s").cast("double") / col("_T").cast("double"), 6).as("weight"),
      (col("_fl") + when(col("_rk") <= col("_left"), 1L).otherwise(0L))
        .cast("long").as("alloc_tokens"),
      round((col("_fl") + when(col("_rk") <= col("_left"), 1L).otherwise(0L))
        .cast("double") / col("n_tokens").cast("double"), 6).as("epochs"))
  }

  def weightedSample(df: DataFrame, keyCol: String, weight: Column, k: Int,
                     rankCol: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    Seq("_ws_key", rankCol).foreach { c =>
      require(!df.columns.contains(c), s"input already has a $c column")
    }
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val w = Window.orderBy(col("_ws_key"), col(keyCol))
    // a null/zero/negative weight would draw null or -Inf and silently WIN
    // the nulls-first ascending cut (r5 advisor) — fail loudly instead
    val checkedWeight = when(weight.isNull || weight <= 0.0,
      raise_error(concat(lit("weightedSample: weight must be strictly positive, got "),
        coalesce(weight.cast("string"), lit("null"))))).otherwise(weight)
    df.withColumn("_ws_key", -log(u) / checkedWeight)
      .orderBy(col("_ws_key"), col(keyCol)).limit(k)
      .withColumn(rankCol, row_number().over(w).cast("int"))
      .drop("_ws_key")
  }

  // -------------------------------------- sequence packing (prefix sums)

  /** Concatenation-style sequence packing for LLM training batches: lay
    * documents out in `idCol` order as one token stream and cut it into
    * `capacity`-token bins (the GPT-style pack-and-split). Adds
    *   `start`      — the document's exclusive global token offset,
    *   `bin_start`  — bin of its first token (start / capacity),
    *   `bin_end`    — bin of its last token,
    *   `spans`      — whether the document straddles a bin boundary.
    *
    * The global running sum is computed as a PARALLEL PREFIX SCAN, never
    * a single-task global window. Same fully-lazy shape as
    * [[Relational.distributionRanks]]: (1) `buckets−1` approximate id
    * quantiles make every row's bucket a PURE FUNCTION of its id (native
    * binary search; approximation only skews bucket sizes, never
    * results); (2) exact per-bucket token totals (a `buckets`-row frame)
    * turn into exclusive global offsets through a window over that tiny
    * frame; (3) one per-row window partitioned BY BUCKET (parallelism =
    * `buckets`) adds the local exclusive cumsum. No driver collect, no
    * `spark_partition_id()` — an earlier cut derived offsets from
    * `repartitionByRange` partition ids, but range boundaries are
    * re-SAMPLED per job (seeded by RDD id), so the totals job and the
    * main job could disagree on pid contents: offsets silently shifted
    * at sf0.1. A bucket derived only from the row's own id cannot drift
    * across jobs, retries, or layouts.
    *
    * Ids must be unique (the pack order is total); token counts are
    * exact integers, so the layout is bit-reproducible.
    */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    capacity: Long, buckets: Int = 0,
                    tieCols: Seq[String] = Nil): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    Seq("_pp_bnds", "_pp_b", "_pp_off", "start", "bin_start", "bin_end", "spans")
      .foreach { c =>
        require(!df.columns.contains(c), s"input already has a $c column")
      }
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val n = col(nTokensCol).cast("long")
    // `tieCols` extend the pack order when `idCol` alone is not unique
    // (e.g. a hash-derived shuffle key): buckets still come from idCol
    // quantiles (equal keys share a bucket, so bucket totals stay exact)
    // while the within-bucket window breaks ties deterministically.
    val id = col(idCol)
    val ord = id +: tieCols.map(col)

    val qs = (1 until nb).map(_.toDouble / nb)
    val bounds = df.agg(percentile_approx(id.cast("double"),
      lit(qs.toArray), lit(2500)).as("_pp_bnds"))
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn("_pp_b", graft.functions.UpperBoundCount.upperBoundCount(
        col("_pp_bnds"), id.cast("double")))
      .drop("_pp_bnds")

    val wOff = Window.orderBy(col("_pp_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = withB.groupBy(col("_pp_b"))
      .agg(sum(n).as("_t"))
      .select(col("_pp_b"),
        coalesce(sum(col("_t")).over(wOff), lit(0L)).as("_pp_off"))

    val wLoc = Window.partitionBy(col("_pp_b")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offDf), Seq("_pp_b"))
      .withColumn("start", col("_pp_off") + coalesce(sum(n).over(wLoc), lit(0L)))
      .withColumn("bin_start", floor(col("start") / capacity))
      // empty documents (n = 0) occupy no tokens: pin them to bin_start
      .withColumn("bin_end",
        floor((col("start") + greatest(n, lit(1L)) - 1) / capacity))
      .withColumn("spans", col("bin_end") =!= col("bin_start"))
      .drop("_pp_b", "_pp_off")
  }

  // ------------------------- DSIR-style importance scoring (selection)

  /** Unigram importance-weight table in the style of DSIR (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): for every token in the RAW corpus vocabulary, the
    * add-one-smoothed log-likelihood ratio
    * `ln((ct+1)/(Nt+V)) − ln((cr+1)/(Nr+V))` of the TARGET distribution
    * (the domain you want more of) against the raw distribution. Returns
    * (`token`, `weight`). Corpus constants (token totals, vocab size)
    * ride along as a 1-row broadcast (the q62 scalar shape) instead of
    * driver collects: the r7 collect form ran two extra tokenize-scan
    * jobs at PLAN-BUILD time (every census/explain paid them), and
    * ReuseExchange now serves each count aggregate to both its scalar
    * and its join consumer — one tokenize pass per corpus total.
    *
    * `hashBuckets > 0` switches to DSIR's hashed-feature form: tokens
    * collapse into `md5`-derived buckets (cross-engine-reproducible, like
    * [[hash16]]), bounding the weight table at `hashBuckets` rows — the
    * 100 TB setting, where the table stays broadcastable no matter how
    * large the open vocabulary grows.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
                        hashBuckets: Int = 0): DataFrame = {
    def tok(df: DataFrame): DataFrame = {
      val t = explode(TextAnalysis.tokens(col(textCol))).as("token")
      val keyed = df.select(t)
      if (hashBuckets > 0)
        keyed.select((conv(substring(md5(col("token")), 1, 8), 16, 10)
          .cast("long") % hashBuckets).cast("string").as("token"))
      else keyed
    }
    val rawCnt = tok(raw).groupBy(col("token"))
      .agg(count(lit(1)).as("_cr"))
    val tgtCnt = tok(target).groupBy(col("token"))
      .agg(count(lit(1)).as("_ct"))
    val stats = rawCnt.agg(sum(col("_cr")).as("_nr"), count(lit(1)).as("_v"))
      .crossJoin(tgtCnt.agg(coalesce(sum(col("_ct")), lit(0L)).as("_nt")))
    rawCnt.join(tgtCnt, Seq("token"), "left")
      .crossJoin(broadcast(stats)) // 1 row: corpus constants
      .select(col("token"),
        (log((coalesce(col("_ct"), lit(0L)) + lit(1.0)) /
            (col("_nt") + col("_v")).cast("double"))
          - log((col("_cr") + lit(1.0)) /
            (col("_nr") + col("_v")).cast("double"))).as("weight"))
  }

  /** Per-document DSIR importance score: the sum of [[importanceWeights]]
    * over the document's tokens (out-of-vocabulary tokens contribute 0,
    * exactly as in the hashed production form where OOV is impossible).
    * Scale shape: explode → one equi-join on token (broadcast when the
    * weight table is small or hashed; shuffle join otherwise — AQE
    * decides) → partial+final sum per id. Empty documents keep score 0
    * via the join-back.
    */
  /** Fused DSIR scoring when the target slice is a PREDICATE over the
    * scored corpus itself (the common in-pipeline case — "more like the
    * English slice"): tokenize ONCE, derive everything from one
    * stream of hashed token occurrences. The composed
    * [[importanceWeights]] → [[importanceScores]] pair tokenizes the
    * corpus three times (raw count, target count, scoring) and runs two
    * separate count aggs plus a join between them; this form's win is
    * (a) ONE dual-counter agg producing raw and target counts together
    * and (b) tokens hashed to 64-bit keys at the scan, so the weight
    * join ships longs, never strings. The weight join's probe side is
    * still every token OCCURRENCE — a per-(doc, token) pre-collapse was
    * A/B-measured SLOWER, see below (r10 q102 profile: identical
    * scores — CurationSpec pins the differential, and round-6 output
    * absorbs the double-sum order).
    *
    * Plan: tokens hash to 64-bit keys AT THE SCAN (xxhash64 — token
    * strings never reach an exchange; exact modulo an xxhash64 vocab
    * collision, the [[graft.operators.Dedup.ngramJaccardPairs]] trade,
    * certified per-corpus by the dual-engine oracle) → ONE dual-counter
    * hash agg produces raw AND target counts (the composed pair runs
    * two count aggs plus a left join between them) → 1-row stats
    * broadcast → weight join on the long key → per-doc sum → left
    * join-back for 0-score docs. The corpus tokenizes twice (count
    * pass, score pass) — measured cheaper at 100× than persisting the
    * 50 M-row token frame, and cheaper than a per-(doc, token)
    * pre-collapse whose wide string shuffle cost MORE than the three
    * tokenizes it saved (r10 interleaved A/B at the 100× corpus:
    * 10.2 s per-(doc,token) collapse vs ~5.1 s composed vs 3.4 s this
    * form; stage split: tokenize+hash 0.5 s, dual-count agg 0.8 s, the
    * rest is the two inherent exchanges — token join + per-doc sum).
    * At 100 TB every stage is a narrow hash agg or an equi-join AQE
    * can re-plan; nothing buffers per-group state. For vocabularies
    * too large even for the shuffled join, the composable
    * [[importanceWeights]] path's `hashBuckets` form bounds the weight
    * table and turns the join map-side — DSIR's own production trade.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, scoreCol: String = "score"): DataFrame = {
    require(!df.columns.contains(scoreCol), s"input already has $scoreCol")
    def toks = df.select(col(idCol), isTarget.as("_tgt"),
      explode(TextAnalysis.tokens(col(textCol))).as("_tok"))
      .select(col(idCol), col("_tgt"), xxhash64(col("_tok")).as("_th"))
    val tokCnt = toks.groupBy(col("_th"))
      .agg(count(lit(1)).as("_cr"),
        coalesce(sum(when(col("_tgt"), 1L)), lit(0L)).as("_ct"))
    val stats = tokCnt.agg(coalesce(sum(col("_cr")), lit(0L)).as("_nr"),
      coalesce(sum(col("_ct")), lit(0L)).as("_nt"), count(lit(1)).as("_v"))
    val weights = tokCnt.crossJoin(broadcast(stats))
      .select(col("_th"),
        (log((col("_ct") + lit(1.0)) / (col("_nt") + col("_v")).cast("double"))
          - log((col("_cr") + lit(1.0)) /
            (col("_nr") + col("_v")).cast("double"))).as("weight"))
    // shuffle-hash, not sort-merge: the probe side is every token
    // occurrence in the corpus — building a per-partition map of the
    // (bounded-by-vocab) weight rows beats sorting the occurrences
    val scores = toks.join(weights.hint("shuffle_hash"), Seq("_th"))
      .groupBy(col(idCol))
      .agg(sum(col("weight")).as(scoreCol))
    df.join(scores, Seq(idCol), "left")
      .withColumn(scoreCol, coalesce(col(scoreCol), lit(0.0)))
  }

  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       weights: DataFrame, scoreCol: String = "score",
                       hashBuckets: Int = 0): DataFrame = {
    require(!df.columns.contains(scoreCol), s"input already has $scoreCol")
    val t = explode(TextAnalysis.tokens(col(textCol))).as("token")
    val keyed0 = df.select(col(idCol), t)
    val keyed = if (hashBuckets > 0)
      keyed0.select(col(idCol),
        (conv(substring(md5(col("token")), 1, 8), 16, 10)
          .cast("long") % hashBuckets).cast("string").as("token"))
    else keyed0
    val scores = keyed.join(weights, Seq("token"))
      .groupBy(col(idCol)).agg(sum(col("weight")).as(scoreCol))
    df.join(scores, Seq(idCol), "left")
      .withColumn(scoreCol, coalesce(col(scoreCol), lit(0.0)))
  }
}
