package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 analytics extensions: time-decayed features, data-profiling
  * and privacy audits, robust statistics, n-gram language-model counts,
  * and contrastive-pair mining — the feature-engineering layer of a
  * training-data pipeline, each with a dual-engine DuckDB oracle shape.
  *
  * Scale discipline (SURVEY §6): every operator here either aggregates
  * before it windows (weightedMedian, bigramConditionalTop), windows
  * over high-cardinality partitions only (ewmaLast, runningDistinct), or
  * reduces to a constant-size frame (columnProfile, madOutlierStats) —
  * no full-table sort, no low-cardinality window partition, no driver
  * collect.
  */
object Analytics {

  /** Fused native cosine (codegen'd single loop) — same expression the
    * Similarity operators use on their hot paths.
    */
  private def cosineOf(df: DataFrame, a: Column, b: Column): Column = {
    graft.functions.CosineSimilarity.register(df.sparkSession)
    graft.functions.CosineSimilarity.cosineSim(a, b)
  }

  /** Exponentially-weighted moving average, last value per key.
    *
    * The recursive form s_i = α·x_i + (1−α)·s_{i−1} (s_1 = x_1) has the
    * closed form, at the final row n of each key:
    *
    *   s_n = (1−α)^(n−1)·x_1 + Σ_{i=2..n} α·(1−α)^(n−i)·x_i
    *
    * which is a plain aggregate once each row knows its position i and
    * its key's length n — one window pass (partition = `key`, a
    * high-cardinality column by contract) followed by a groupBy on the
    * SAME key, so Catalyst reuses the window's hash partitioning and the
    * whole operator is a single exchange.
    *
    * Float discipline (r8, learned at 10× data): each TERM
    * α·(1−α)^(n−i)·x_i is an identical double on both engines (pow is
    * IEEE-close on both), but a double SUM depends on addition order —
    * Spark's partial-agg order varies with file layout, and a group
    * whose true value sits near a display-round boundary flips
    * (observed at 10×: 225773.4886 vs .4887). So `ewma` is returned as
    * DECIMAL(38,10): each term snaps to the 1e-10 grid (round(·,10) —
    * both engines land within an ulp of the same grid point, and the
    * double→decimal cast then recovers the IDENTICAL decimal on both,
    * which a bare cast does not: Spark casts through the SHORTEST
    * string representation, DuckDB through the exact binary expansion),
    * and the decimal sum is EXACT and order-free. Callers doing display
    * rounding must round IN DECIMAL before casting to double: with
    * α = 3/10 the terms are exact short decimals (3·7^k·x / 10^(k+1)),
    * so group sums land exactly ON .xxxx5 midpoints often enough that
    * rounding the nearest-DOUBLE instead diverges per engine (Spark
    * HALF_UPs the shortest string; DuckDB sees a binary value one ulp
    * below the midpoint) — the q122 10× lesson.
    */
  def ewmaLast(
      df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    Seq("_ew_rn", "_ew_n").foreach(c =>
      require(!df.columns.contains(c), s"input already has column $c"))
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(col(key))
    val x = col(valueCol).cast("double")
    val decay = pow(lit(1.0 - alpha), col("_ew_n") - col("_ew_rn"))
    val term = when(col("_ew_rn") === 1, decay * x)
      .otherwise(lit(alpha) * decay * x)
    df.withColumn("_ew_rn", row_number().over(w))
      .withColumn("_ew_n", count(lit(1)).over(wAll))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(round(term, 10).cast("decimal(38,10)")).as("ewma"))
  }

  /** Exact per-column profile of numeric columns — the data-contract /
    * expectations primitive (count, nulls, exact distinct, min, max,
    * mean), histogram-first: posexplode fans each row into |cols|
    * (column-index, value) pairs map-side, a (column, value) count
    * aggregate (map-side combined — the shuffle carries unique values,
    * not rows) builds per-column histograms, and every stat falls out of
    * one tiny aggregate over the histogram (n = Σ counts, distinct =
    * #non-null groups, mean = Σ value·count / n). Two shuffles total.
    *
    * This replaces the obvious multi-COUNT(DISTINCT) single agg, whose
    * |cols|-way Expand re-hashes |cols|·N rows through one aggregate
    * (measured 2.2 s vs 1.0 s at 600k×4 on the same box; a union of
    * per-column pruned-scan histograms ties at 0.9 s but spends 8
    * shuffles and 4 scans for it). At 100 TB a
    * heavy-cardinality column can swap the exact distinct for B5's HLL
    * without changing this shape.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val pairs = df.select(posexplode(
      array(cols.map(c => col(c).cast("double")): _*)).as(Seq("_ci", "_v")))
    val hist = pairs.groupBy(col("_ci"), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val nonNull = sum(when(col("_v").isNotNull, col("_c")))
    val prof = hist.groupBy(col("_ci"))
      .agg(
        coalesce(nonNull, lit(0L)).as("n"),
        coalesce(sum(when(col("_v").isNull, col("_c"))), lit(0L)).as("n_null"),
        count(col("_v")).as("n_distinct"),
        min(col("_v")).as("min_v"), max(col("_v")).as("max_v"),
        round(sum(col("_v") * col("_c")) / nonNull, 6).as("avg_v"))
    // left join FROM the literal column list: an empty input still yields
    // one all-zero row per requested column, matching the oracle's
    // UNION-ALL-per-column shape (r6 advice — latent empty-table skew)
    val seed = df.sparkSession.range(cols.size)
      .select(col("id").cast("int").as("_ci"))
    seed.join(prof, Seq("_ci"), "left")
      .select(element_at(typedlit(cols), col("_ci") + 1).as("column"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_null"), lit(0L)).as("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_v"), col("max_v"), col("avg_v"))
  }

  /** Running COUNT(DISTINCT `valueCol`) per `key` in `orderCols` order —
    * the streaming-feature form of cumulative cardinality. Exact, no
    * distinct-over-window (which Spark does not support): a row is a
    * "first sight" when row_number over (key, value) is 1; the running
    * distinct count is the running sum of first-sight flags over (key).
    * Two window passes, both partitioned by the high-cardinality key
    * (the second re-shuffles from (key, value) to (key)).
    */
  def runningDistinct(
      df: DataFrame, key: String, orderCols: Seq[String],
      valueCol: String): DataFrame = {
    Seq("_rd_first", "rd").foreach(c =>
      require(!df.columns.contains(c), s"input already has column $c"))
    val wFirst = Window.partitionBy(col(key), col(valueCol))
      .orderBy(orderCols.map(col): _*)
    val wRun = Window.partitionBy(col(key))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_rd_first",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("rd", sum(col("_rd_first")).over(wRun))
      .drop("_rd_first")
  }

  /** k-anonymity audit: quasi-identifier groups with fewer than `k`
    * members — the rows a privacy review must generalize or suppress.
    * One hash aggregate over the QID tuple; output is the risky-group
    * listing (QIDs + group size), small by construction at any scale
    * (bounded by the number of distinct QID tuples under k members).
    */
  def kAnonymityRisk(df: DataFrame, qids: Seq[Column], names: Seq[String],
      k: Int): DataFrame = {
    require(qids.nonEmpty && qids.size == names.size && k >= 2)
    df.groupBy(qids.zip(names).map { case (c, n) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Exact weighted median over INTEGER weights, computed
    * aggregate-first: per-(group, value) weight sums shrink the frame to
    * |groups|·|distinct values| rows BEFORE any window runs, so the
    * cumulative-weight scan is over a tiny aggregated histogram — the
    * scale-safe shape for low-cardinality groups where a per-row window
    * would single-task each group (the q79 lesson). Integer weights keep
    * the cumulative sums and the 2·cum ≥ total boundary predicate exact
    * on both engines — no float discipline needed anywhere.
    *
    * Returns the lower weighted median: the smallest value v whose
    * cumulative weight W(≤v) satisfies 2·W ≥ total. NULL values are
    * excluded before the histogram (Spark orders NULLS FIRST ascending,
    * DuckDB NULLS LAST — an unfiltered null row would shift cumulative
    * weights on exactly one engine); a group whose values are all NULL
    * yields no row.
    */
  def weightedMedian(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      weightCol: Column): DataFrame = {
    Seq("_wm_w", "_wm_cum", "_wm_tot", "_wm_rn").foreach(c =>
      require(!df.columns.contains(c), s"input already has column $c"))
    val gs = groupCols.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(gs :+ col(valueCol): _*)
      .agg(sum(weightCol).as("_wm_w"))
    val wCum = Window.partitionBy(gs: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gs: _*)
    val ranked = hist
      .withColumn("_wm_cum", sum(col("_wm_w")).over(wCum))
      .withColumn("_wm_tot", sum(col("_wm_w")).over(wAll))
      .filter(col("_wm_cum") * 2 >= col("_wm_tot"))
    val wPick = Window.partitionBy(gs: _*).orderBy(col(valueCol))
    ranked.withColumn("_wm_rn", row_number().over(wPick))
      .filter(col("_wm_rn") === 1)
      .select(gs ++ Seq(col(valueCol).cast("double").as("wmedian"),
        col("_wm_tot").as("total_w")): _*)
  }

  /** Robust outlier statistics per group: median, MAD (median absolute
    * deviation), and the count of |x − med| > cutoff·1.4826·MAD rows —
    * the median/MAD z-score filter of a data-cleaning pass. Three
    * aggregate passes (median → MAD → outlier count); the per-group
    * interpolated medians use [[Relational.percentileContExact]]'s
    * bucketed two-pass — NOT the built-in `percentile_cont`, whose
    * sort-buffer aggregate holds every group value (the q92 scale-killer
    * shape, fixed here in the same r7 sweep). The two median frames ship
    * |groups| rows back as broadcast LEFT joins: an all-NULL group keeps
    * its row with NULL med/mad (percentileContExact emits no row for it,
    * matching the built-in's NULL).
    */
  def madOutlierStats(
      df: DataFrame, groupCol: String, valueCol: String,
      cutoff: Double): DataFrame = {
    val g = col(groupCol); val x = col(valueCol).cast("double")
    val raw = df.select(g, x.as("_mo_x"))
    // r16 key-encoding (the rankTargetedSelect lesson, applied to the
    // WHOLE chain): every med/MAD/census step re-probed a broadcast
    // hash relation on the raw group key — a string-keyed probe
    // measured ~14× slower than a long-keyed one (1.13 vs 0.17 s per
    // 15M-row pass at the 100× rung). The per-key (lo, hi) frame —
    // needed anyway as pass 1a — doubles as a dictionary: one
    // row_number over the |keys|-row frame assigns a dense long id,
    // ONE null-safe string probe attaches it, and the med attach, MAD
    // bucketize and mad attach all probe LongHashedRelations. Both the
    // dict and the (key, id, x) projection persist: the dict so the
    // three broadcast subtrees that reference it read |keys| cached
    // rows instead of re-running the n-row min/max aggregate, the base
    // because the chain scans it five times (r9 scan-sharing — at
    // cluster scale the difference between five passes over a 100 TB
    // table and one).
    // Deliberately NOT unpersisted: the returned frame is lazy, so the
    // cache must survive until the CALLER's action; CacheManager dedupes
    // identical plans (repeat calls don't stack) and MEMORY_AND_DISK
    // evicts under pressure. A long-lived service should wrap this call
    // and unpersist both frames after its terminal action.
    val dict = raw.groupBy(g)
      .agg(min(col("_mo_x")).as("_pc_lo"), max(col("_mo_x")).as("_pc_hi"))
      .withColumn("_mo_k",
        row_number().over(Window.orderBy(g)).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // probe on xxhash64(key) — a single non-null LONG equi-key
    // (LongHashedRelation); the null-safe key equality runs as a
    // post-join filter so the probe never pays the composite
    // (coalesce, isnull) generic-hash path (see rankTargetedSelect).
    // dict covers every key of raw by construction (same frame), so the
    // filter keeps exactly one row per input row.
    val base = raw
      .join(broadcast(dict.select(g.as("_mo_kk"), col("_mo_k"),
          xxhash64(g).as("_mo_kh"))),
        xxhash64(g) === col("_mo_kh"), "left")
      .filter(col("_mo_kk").isNull || (g <=> col("_mo_kk")))
      .select(g, col("_mo_k"), col("_mo_x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // r8: fixed-width bounds (sketch-free pass 1a) at the 256-bucket
    // default — more buckets shrink the kept-bucket sort slices
    // (measured q127 at 10×: 3.86 s sketch/64 → 1.9 s uniform/256);
    // r15: the ARITHMETIC (lo, hi) range form — bucket indices compute
    // inline, no per-row split-array search (q127 100×: 13.4 → see
    // PERF.md r15 for the measured delta)
    val boundsX = dict.select(col("_mo_k"), col("_pc_lo"), col("_pc_hi"))
    // med persists too (|keys| rows): its subtree — which embeds a full
    // bucketize+count pass as the kept-bucket broadcast — is referenced
    // by the MAD pass, its bounds AND the census; uncached, each
    // reference that the planner cannot ReuseExchange re-runs that full
    // pass (measured 2.5 s/reference at the 100× rung vs 0.2 s cached)
    val med = Relational.percentileContExact(
        base.select(col("_mo_k"), col("_mo_x")), "_mo_k", "_mo_x",
        Seq("_mo_med" -> 0.5), bounds = Some(boundsX))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the med-joined frame feeds the MAD percentile pass (2 reads) and
    // the final census. r16: NOT persisted — its recompute from the
    // cached base is one long-keyed broadcast probe + an abs(), cheaper
    // per consumer than materializing and re-scanning a second full
    // copy of the data (measured at the 100× rung: dropping this
    // persist was the single biggest q127 win of the round's A/B).
    val withMed = base.join(broadcast(med), Seq("_mo_k"), "left")
      .withColumn("_mo_ad", abs(col("_mo_x") - col("_mo_med")))
    // r8 shared-bucketization lever, r15 arithmetic form: the MAD
    // pass's RANGE derives from the x range (|x − med| spans
    // [0, max(med − lo, hi − med)]; range placement steers bucket
    // balance, never exactness) — no second per-row bounds scan.
    val boundsD = dict.join(med, Seq("_mo_k"))
      .select(col("_mo_k"), lit(0.0).as("_pc_lo"),
        greatest(col("_mo_med") - col("_pc_lo"),
          col("_pc_hi") - col("_mo_med")).as("_pc_hi"))
    val mad = Relational.percentileContExact(
      withMed.select(col("_mo_k"), col("_mo_ad")), "_mo_k", "_mo_ad",
      Seq("_mo_mad" -> 0.5), bounds = Some(boundsD))
    withMed.join(broadcast(mad), Seq("_mo_k"), "left")
      .groupBy(g)
      .agg(count(lit(1)).as("n"),
        round(first(col("_mo_med")), 6).as("med"),
        round(first(col("_mo_mad")), 6).as("mad"),
        // coalesce: an all-NULL group sums NULL comparisons to NULL in
        // Spark while the oracle's CASE WHEN ... ELSE 0 yields 0 — pin 0
        coalesce(sum((col("_mo_ad") > lit(cutoff * 1.4826) * col("_mo_mad"))
          .cast("long")), lit(0L)).as("n_outliers"))
  }

  /** Top-k bigrams per group with conditional probability — the n-gram
    * language-model count table (KenLM-style) over a corpus. Bigrams are
    * built map-side with arrays_zip over two token-array slices (no
    * self-join), counted by (group, w1, w2); P(w2|w1) divides by the
    * bigram-prefix count via a window over (group, w1) — which runs on
    * the AGGREGATED count frame, not per-token rows. The final top-k is
    * a ranking window per group over that same small frame.
    */
  def bigramConditionalTop(
      df: DataFrame, groupCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val ts = TextAnalysis.tokens(col(textCol))
    val bigrams = TextAnalysis.bindOnce(ts, t =>
      arrays_zip(slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0)))))
    val pairs = df
      .select(col(groupCol), explode(bigrams).as("_bg"))
      .select(col(groupCol), col("_bg").getField("0").as("w1"),
        col("_bg").getField("1").as("w2"))
    val counts = pairs.groupBy(col(groupCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    val wPrefix = Window.partitionBy(col(groupCol), col("w1"))
    val wTop = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
    counts
      .withColumn("cond_p",
        round(col("cnt").cast("double") / sum(col("cnt")).over(wPrefix), 6))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }

  /** Contrastive hard-negative mining: for each probe vector, the single
    * most-cosine-similar corpus vector with a DIFFERENT label — the
    * highest-loss negative for metric learning. This is the exact O(P·N)
    * baseline (probes broadcast against the corpus, same contract as
    * [[Similarity.bruteForceTopK]]); the 100 TB form swaps the candidate
    * generator for [[Similarity.lshTopK]]-style banding with a
    * label-inequality post-filter and is pinned against this one on
    * overlapping data in AnalyticsSpec.
    */
  def hardNegatives(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      probeFilter: Column): DataFrame = {
    val c = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"),
        col(labelCol).as("_cl"))
    val q = emb.filter(col(vecCol).isNotNull).filter(probeFilter)
      .select(col(idCol).as("_qid"), col(vecCol).as("_qv"),
        col(labelCol).as("_ql"))
    // argmax as an AGGREGATE, not a window: max over the orderable struct
    // (cos, -id, payload) is map-side combinable, so each scan partition
    // reduces its candidates to one row per probe before the (tiny)
    // shuffle — a window by probe would instead shuffle the full P·N
    // candidate frame and sort corpus-sized partitions.
    val best = c.crossJoin(broadcast(q))
      .filter(col("_ql") =!= col("_cl"))
      .withColumn("_cos", cosineOf(emb, col("_qv"), col("_cv")))
      .groupBy(col("_qid"), col("_ql"))
      .agg(max(struct(col("_cos"), (-col("_cid")).as("_negid"),
        col("_cl"))).as("_b"))
    best.select(col("_qid").as("query_id"), col("_ql").as("query_label"),
      (-col("_b._negid")).as("negative_id"),
      col("_b._cl").as("negative_label"),
      round(col("_b._cos"), 6).as("cosine"))
  }

  /** Cross-corpus n-gram overlap matrix: for every unordered pair of
    * groups (sources, shards, snapshots), the DISTINCT word-n-gram
    * overlap and Jaccard similarity — the corpus-level contamination /
    * drift matrix (which sources re-post which, how much a new crawl
    * shares with the last one).
    *
    * Scale shape: per-doc distinct grams (array_distinct map-side) →
    * 64-bit xxhash64 FINGERPRINTS (r8: the distinct/join shuffles carry
    * 8-byte keys, not ~40-byte gram strings — the B16/ngramJaccardPairs
    * discipline; a cross-gram collision, p ≈ |grams|²/2⁶⁵, would shift
    * one overlap count by one) → global distinct (group, fp) —
    * vocabulary-sized, not corpus-sized — → inverted-index equi-join on
    * the fp between groups (per-gram fan-out bounded by |groups|²,
    * never all-document-pairs) → map-side combinable overlap counts;
    * sizes join back as a |groups|-row broadcast. Jaccard =
    * ov/(|A|+|B|−ov) is an integer division, exact cross-engine.
    */
  def corpusOverlapMatrix(
      df: DataFrame, groupCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // r8: grams are never materialized as strings (ngramFingerprints —
    // fused single-pass tokenize + per-token hash + chained window
    // hash); the global distinct below is on (group, fp) either way, so
    // per-doc string-vs-fingerprint distinctness is semantically
    // identical here.
    val grams = df.select(col(groupCol).as("_co_grp"),
        explode(TextAnalysis.ngramFingerprints(col(textCol), n)).as("_co_gram"))
      .distinct()
    val sizes = grams.groupBy(col("_co_grp"))
      .agg(count(lit(1)).as("_co_sz"))
    grams.select(col("_co_grp").as("_co_a"), col("_co_gram"))
      .join(grams.select(col("_co_grp").as("_co_b"), col("_co_gram")),
        Seq("_co_gram"))
      .filter(col("_co_a") < col("_co_b"))
      .groupBy(col("_co_a"), col("_co_b"))
      .agg(count(lit(1)).as("overlap"))
      .join(broadcast(sizes.select(col("_co_grp").as("_co_a"),
        col("_co_sz").as("n_a"))), Seq("_co_a"))
      .join(broadcast(sizes.select(col("_co_grp").as("_co_b"),
        col("_co_sz").as("n_b"))), Seq("_co_b"))
      .select(col("_co_a").as("group_a"), col("_co_b").as("group_b"),
        col("n_a"), col("n_b"), col("overlap"),
        round(col("overlap") / (col("n_a") + col("n_b") - col("overlap"))
          .cast("double"), 6).as("jaccard"))
  }

  /** Zipf power-law fit per group: OLS slope and R² of log(frequency)
    * against log(rank) over the group's token frequency table — the
    * corpus-health fingerprint (natural text sits near slope −1;
    * templated/duplicated corpora flatten, degenerate generations
    * steepen). Token counting aggregates FIRST; the ranking window and
    * the regression run over the vocabulary frame (types, not tokens),
    * which is heavy-tail-bounded at any corpus size. Rank ties break
    * lexicographically so both engines rank identically.
    */
  def zipfFit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol))).as("_zf_t"))
      .groupBy(col(groupCol), col("_zf_t"))
      .agg(count(lit(1)).as("_zf_c"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_zf_c").desc, col("_zf_t").asc)
    counts
      .withColumn("_zf_r", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_types"),
        sum(col("_zf_c")).as("n_tokens"),
        round(expr("regr_slope(ln(_zf_c), ln(_zf_r))"), 6).as("slope"),
        round(expr("regr_r2(ln(_zf_c), ln(_zf_r))"), 6).as("r2"))
  }

  /** SemDeDup-style embedding pruning, exact form: drop every vector
    * that has a cosine-≥-tau neighbor with a SMALLER id (the greedy
    * min-id-wins rule — non-transitive, one pass, the pruning used on
    * embedding-deduped corpora). Pair generation here is the exact
    * all-pairs baseline; at scale the SAME keep rule runs over
    * [[Dedup.embeddingNearDupPairs]]'s banded LSH candidates (candidate
    * generation swaps, the keep rule does not — AnalyticsSpec pins the
    * rule itself on hand-planted pair sets).
    */
  def semDedupKeep(
      emb: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    val a = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_aid"), col(vecCol).as("_av"))
    val b = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("_bid"), col(vecCol).as("_bv"))
    val dominated = a.crossJoin(b)
      .filter(col("_bid") < col("_aid"))
      .filter(cosineOf(emb, col("_av"), col("_bv")) >= tau)
      .select(col("_aid")).distinct()
    emb.join(dominated, emb(idCol) === dominated("_aid"), "left_anti")
  }

  /** Population Stability Index between a reference and a current slice
    * of a numeric column — the distribution-drift monitor every
    * production data pipeline runs between snapshots. Fixed-width bins
    * over [lo, hi) (out-of-range values clamp into the edge bins, the
    * q98 histogram discipline), Laplace-smoothed bin probabilities
    * p = (n + ½)/(N + buckets·½) so empty bins never produce ln(0) and
    * both engines compute the identical closed form. Returns one row
    * per bin — (bucket, n_ref, n_cur, contrib) with
    * contrib = (p − q)·ln(p/q); Σ contrib is the PSI (>0.2 = actionable
    * drift by the usual rule of thumb).
    *
    * Scale shape: each side collapses to a `buckets`-row histogram
    * map-side before anything joins; the bin-list seed left-join (q123
    * discipline) keeps every requested bin present even when empty, and
    * the total counts come from a window over the `buckets`-row frame —
    * nothing beyond the two scans touches data-sized rows.
    */
  def populationStability(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets >= 2 && hi > lo, "need >= 2 buckets and hi > lo")
    val width = (hi - lo) / buckets
    def binned(df: DataFrame, out: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(least(greatest(
          floor((col(valueCol) - lit(lo)) / lit(width)), lit(0L)),
          lit((buckets - 1).toLong)).cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(out))
    val seed = ref.sparkSession.range(buckets).select(col("id").as("bucket"))
    val w = Window.partitionBy()
    val joined = seed
      .join(binned(ref, "n_ref"), Seq("bucket"), "left")
      .join(binned(cur, "n_cur"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("_ps_tr", sum(col("n_ref")).over(w))
      .withColumn("_ps_tc", sum(col("n_cur")).over(w))
    val p = (col("n_ref") + 0.5) / (col("_ps_tr") + buckets * 0.5)
    val q = (col("n_cur") + 0.5) / (col("_ps_tc") + buckets * 0.5)
    joined
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        ((p - q) * log(p / q)).as("contrib"))
  }

  /** Two-proportion A/B conversion test: variant assignment from a
    * deterministic user hash, conversion = at least one target event,
    * pooled-variance z statistic — the experiment-analysis primitive.
    * One distinct-user collapse and two tiny aggregates; the z formula
    * is a closed-form double expression over 4 integers, exact
    * cross-engine at round(6).
    *
    * Degenerate experiments SURFACE instead of vanishing (r7 advice):
    * an empty variant still yields the single result row (n=0, conv=0
    * on that side) with NULL p for the empty side and NULL z; a pooled
    * conversion of exactly 0 or 1 (zero variance) also yields NULL z.
    * The one no-row case is a fully empty input — there is no
    * experiment to report on.
    */
  def abTest(
      events: DataFrame, userCol: String, convertCond: Column): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(max(convertCond.cast("int")).as("_ab_conv"))
      .withColumn("_ab_variant", pmod(col(userCol), lit(2)).cast("int"))
    // one row per PRESENT variant collapses to ONE result row via
    // conditional sums — no per-variant filter + join, so an absent
    // variant degrades to n=0 instead of annihilating the row
    val joined = perUser.groupBy()
      .agg(
        coalesce(sum(when(col("_ab_variant") === 0, 1L)), lit(0L)).as("n0"),
        coalesce(sum(when(col("_ab_variant") === 0, col("_ab_conv")
          .cast("long"))), lit(0L)).as("c0"),
        coalesce(sum(when(col("_ab_variant") === 1, 1L)), lit(0L)).as("n1"),
        coalesce(sum(when(col("_ab_variant") === 1, col("_ab_conv")
          .cast("long"))), lit(0L)).as("c1"))
      .filter(col("n0") + col("n1") > 0)
    val p0 = when(col("n0") > 0, col("c0").cast("double") / col("n0"))
    val p1 = when(col("n1") > 0, col("c1").cast("double") / col("n1"))
    val pPool = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    joined.select(col("n0"), col("c0"), col("n1"), col("c1"),
      round(p0, 6).as("p0"), round(p1, 6).as("p1"),
      round(when(col("n0") > 0 && col("n1") > 0 && pPool > 0 && pPool < 1,
        (p1 - p0) / sqrt(pPool * (lit(1.0) - pPool) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1")))), 6).as("z"))
  }
}
