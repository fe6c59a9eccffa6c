package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines (SURVEY.md §2.4
  * B16/B17 + LLM-pipeline extensions): exact, MinHash+LSH, SimHash, and
  * n-gram Jaccard near-dup.
  *
  * Scale design. Exact dedup groups on a 64-bit content hash, not the text,
  * so the shuffle carries 8-byte keys (plus the chosen survivor id), never
  * document bodies. Near-dup follows the classic shingle → signature →
  * band-bucket → candidate-pair → verify pipeline: the only joins are
  * equi-joins on band hashes (shuffle-partitionable), candidate
  * verification is a narrow pairwise step, and nothing ever collects to
  * the driver. Dedup policy is "keep smallest id": a row is dropped iff it
  * has a verified near-duplicate with a smaller id — deterministic, local,
  * and transitive-closure-free (no iterative connected components, which
  * would be the scalability bottleneck).
  *
  * Non-transitivity caveat: in a similarity chain A~B~C where A≁C, C is
  * dropped because of B even though B itself is dropped because of A — the
  * drop decision looks at the ORIGINAL corpus, not at survivors. That is
  * the right semantics for crawl dedup (every member of a fuzzy cluster
  * except its smallest id goes, whether or not the cluster is a clique),
  * and it is deliberate: the alternative ("keep C because its only match
  * was itself dropped") is a sequential greedy over ids, inherently
  * iterative. [[iterateToFixpoint]] is the bounded opt-in for callers who
  * at least want a pass-stable result; the chain behavior is pinned in
  * DedupSpec.
  */
object Dedup {

  /** Inputs under this optimizer-estimated size skip the persist +
    * localCheckpoint barriers inside the staged dedup operators. The
    * barriers exist to stop Catalyst re-deriving the heavy shingle /
    * signature subtrees once per consumer — the right trade when a
    * re-derivation means re-scanning terabytes, but at small scale each
    * barrier costs more (an extra job + ~2 stage boundaries of fixed
    * scheduling latency) than the bounded 2-4× subtree re-computation it
    * avoids. 256 MB ≈ the point where one corpus re-shingle pass clearly
    * exceeds two stage floors on commodity executors.
    *
    * Volatile var (not val) so tests can force the barrier path on small
    * fixtures — DedupSpec pins small-path ≡ big-path results; production
    * code never mutates it.
    */
  @volatile private[operators] var barrierThresholdBytes: Long = 256L << 20

  /** Optimizer size estimate — driver-side only, no job. Unknown sizes
    * (e.g. opaque RDD-backed plans) report Long.MaxValue-ish defaults and
    * land on the barrier path, the safe side.
    */
  private[operators] def isSmallInput(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.stats.sizeInBytes < barrierThresholdBytes

  /** Materialize `df` behind an eager execution barrier.
    *
    * Default (`checkpointDir = None`): `localCheckpoint(eager = true)` —
    * blocks live on executors and the lineage is CUT, so losing an
    * executor after the barrier fails the job instead of recomputing.
    * Right for single-node and short-lived jobs (this sandbox).
    *
    * `Some(dir)`: RELIABLE `checkpoint` into `dir` — a fault-tolerant
    * filesystem path (HDFS/S3A) at cluster scale. Survives executor
    * churn: downstream stages re-read the checkpoint files, which is the
    * form a multi-hour 100 TB dedup needs. Costs one distributed write +
    * re-read of the (small: loser/dirty ids only) barrier set. Spark
    * stores data under `dir/<uuid>/rdd-N`; the dir is app-global on the
    * SparkContext, so concurrent calls with DIFFERENT dirs on one context
    * race on that setting — use one dir per context. Checkpoint files are
    * reclaimed by the context's normal cleanup policy
    * (`spark.cleaner.referenceTracking.cleanCheckpoints`), not by this
    * call.
    */
  private def materializeBarrier(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }

  // ---------------------------------------------------------------- exact

  /** Exact dedup on full row or a column subset — `dropDuplicates`. */
  def exact(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols)

  /** Exact content dedup with a deterministic survivor: keeps the row with
    * the smallest `idCol` per distinct `contentCol`. Grouping key is a
    * 128-bit content hash (two independent xxhash64 seeds) so the shuffle
    * is hash-wide, not text-wide, and collisions are negligible at any
    * realistic corpus size (a single 64-bit key would hit birthday
    * collisions — i.e. silently merge distinct documents — around 5e9
    * rows). The within-group winner is picked by min aggregation (single
    * partial+final agg, no window-sort).
    */
  def exactKeepMinId(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val winner = df
      .groupBy(
        xxhash64(col(contentCol)).as("_h1"),
        // salt FIRST: Spark's multi-arg xxhash64 chains the running hash
        // as the next argument's seed, so hash(content, salt) is a pure
        // function of hash(content) — NOT an independent second hash.
        // hash(salt, content) re-seeds before the content and is.
        xxhash64(lit(1), col(contentCol)).as("_h2"))
      .agg(min(col(idCol)).as("_keep"))
    df.join(winner, df(idCol) === winner("_keep"), "left_semi")
  }

  /** INCREMENTAL exact dedup — the daily-batch shape of corpus curation:
    * dedup `incoming` against an `existing` corpus SNAPSHOT without ever
    * re-deduping the snapshot. Returns the incoming survivors: rows whose
    * content matches nothing in `existing` and that are the min-id owner
    * of their content within `incoming`.
    *
    * Scale shape (existing is the 100 TB side, incoming the new batch):
    * a Bloom filter of the INCOMING content hashes (one small-side agg,
    * few-MB sketch) drops non-colliding existing rows AT THE MAP, so the
    * only thing shuffled from the snapshot is ≈ |true matches| +
    * fpp·|existing|; the exact anti-join on the full content string then
    * removes Bloom false positives — results are EXACT, identical to
    * `incoming.join(existing, content, "left_anti")` + within-batch
    * keep-min-id. The matched content set (≤ |incoming| rows) broadcasts.
    */
  def incrementalExactDedup(existing: DataFrame, incoming: DataFrame,
      idCol: String, contentCol: String,
      expectedIncoming: Long = 10000000L): DataFrame = {
    // Small snapshots (optimizer estimate, no job — same seam as the
    // barrier small/big split) take the plain lazy anti-join: the Bloom
    // prefilter exists to keep a 100 TB snapshot out of the shuffle, and
    // its eagerly-collected sketch job costs more than it saves below
    // the threshold. Results identical by construction (DedupSpec).
    if (isSmallInput(existing)) {
      val fresh = incoming.join(
        existing.select(col(contentCol).as("_ix_c")),
        incoming(contentCol) === col("_ix_c"), "left_anti")
      return exactKeepMinId(fresh, idCol, contentCol)
    }
    // stat.bloomFilter returns a null sketch for an EMPTY build side
    // (Spark reads no partial from zero partitions) — an empty batch
    // dedups to an empty result, skip the machinery
    val bloom =
      try incoming.stat.bloomFilter(contentCol, expectedIncoming, 0.01)
      catch { case _: NullPointerException =>
        return exactKeepMinId(incoming, idCol, contentCol) }
    val hit = existing
      .select(col(contentCol).as("_ix_c"))
      .filter(graft.functions.BloomMightContain.mightContain(col("_ix_c"), bloom))
    // exact match set, deduped to ≤ |incoming distinct contents| rows
    val matched = incoming.select(col(contentCol).as("_ix_c")).distinct()
      .join(hit, Seq("_ix_c"), "left_semi")
    val fresh = incoming
      .join(broadcast(matched), incoming(contentCol) === matched("_ix_c"), "left_anti")
    exactKeepMinId(fresh, idCol, contentCol)
  }

  // ------------------------------------------------------------- MinHash

  /** k MinHash values over token `n`-gram shingles. Each hash family member
    * j is xxhash64(shingle ⊕ j); the signature entry is the min over the
    * doc's shingle set. Pure higher-order expressions — per-row, codegen'd,
    * no shuffle, no MLlib Vector boxing.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int): Column =
    minhashSignatureFromShingles(TextAnalysis.shingles(text, shingleN), numHashes)

  /** Signature from an already-computed shingle array. Column-level form —
    * fine for ad-hoc use, but beware: if `shingles` is a derived expression,
    * CollapseProject will inline it into every one of the `numHashes`
    * branches (no CSE across lambda functions). The pair/dedup pipeline
    * below uses [[minhashSignatures]] (explode + min-aggregate) instead,
    * which computes shingling exactly once per document.
    */
  def minhashSignatureFromShingles(shingles: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      j => array_min(transform(shingles, s => xxhash64(s, j))))

  /** Scalable signature computation: explode shingles to narrow rows, then
    * one hash-aggregate with `numHashes` min(xxhash64(shingle, j)) slots.
    * Shingling runs once per doc; the aggregate is partial+final (map-side
    * combine), so the shuffle carries k longs per doc. Returns
    * (_id, _sig array<long>); docs with zero shingles are absent.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int): DataFrame =
    minhashSignaturesFromShingled(
      df.select(
        col(idCol).as("_id"),
        array_distinct(TextAnalysis.shingles(col(textCol), shingleN)).as("_sh")),
      numHashes)

  /** Signatures from a pre-shingled frame (_id, _sh) — lets callers that
    * already hold shingles (the verification path) avoid re-tokenizing
    * the corpus.
    */
  def minhashSignaturesFromShingled(shingled: DataFrame, numHashes: Int): DataFrame = {
    val exploded = shingled.select(col("_id"), explode(col("_sh")).as("_s"))
    val slots = (0 until numHashes).map(j => min(xxhash64(col("_s"), lit(j))).as(s"_m$j"))
    exploded.groupBy(col("_id"))
      .agg(slots.head, slots.tail: _*)
      .select(col("_id"), array((0 until numHashes).map(j => col(s"_m$j")): _*).as("_sig"))
  }

  /** One row per (doc, band) from a (_id, _sig) frame: band key = hash of
    * (band index, the band's signature slice). THE single definition of
    * minhash band bucketing — every operator (pairs, dedup,
    * decontaminate) must bucket identically or cross-operator results
    * drift.
    */
  private def minhashBandKeys(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
      col("_id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bkey"))

  /** Banded LSH candidate pairs from minhash signatures: split the
    * k-signature into `bands` bands of k/bands rows, bucket by
    * (band index, band hash), and emit verified candidate pairs
    * (idA < idB) whose exact shingle-Jaccard ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard).
    */
  def minhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    // hashed shingles: set semantics identical to string shingles modulo
    // 64-bit collisions, far cheaper to build, and the verification arrays
    // carry longs instead of strings
    val shingled = df.select(
      col(idCol).as("_id"),
      TextAnalysis.shingleHashesDistinct(col(textCol), shingleN).as("_sh"))

    // one row per (doc, band): band key = hash of (band idx, band's slice);
    // the banded frame carries only (id, band, 8-byte key) — never text or
    // shingles — so the LSH self-join shuffles narrow rows. Signatures
    // derive from the SAME shingled subtree used for verification (one
    // shingling definition in the plan; persist `shingled` upstream to
    // also share the computation across the two consumers at scale).
    val banded = minhashBandKeys(
      minhashSignaturesFromShingled(shingled, numHashes), bands, rowsPerBand)

    val a = banded.select(col("_band"), col("_bkey"), col("_id").as("id_a"))
    val b = banded.select(col("_band"), col("_bkey"), col("_id").as("id_b"))

    val pairs = a.join(b, Seq("_band", "_bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // same pair may collide in several bands

    // fetch shingles only for surviving candidates, then verify exactly
    pairs
      .join(shingled.withColumnsRenamed(Map("_id" -> "id_a", "_sh" -> "_sh_a")), "id_a")
      .join(shingled.withColumnsRenamed(Map("_id" -> "id_b", "_sh" -> "_sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash+LSH dedup: drop every row with a verified near-duplicate of
    * smaller id.
    *
    * Candidate generation is bucket-min, not pairwise: each doc verifies
    * against at most `bands` candidates — the smallest id among its
    * bucket-mates per band. A duplicate cluster of size k costs O(k·bands)
    * verifications instead of O(k²) pairs, which is the difference between
    * linear and quadratic on duplication-heavy corpora (web crawls: 30×
    * replication took 149 s pairwise, ~linear bucket-min). The trade:
    * a doc whose bucket-min candidate fails verification is kept even if
    * some other (non-min) bucket-mate would have verified — a small recall
    * haircut on top of LSH's own, acceptable for an approximate operator;
    * [[minhashNearDupPairs]] remains the exhaustive pair-listing API.
    */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.8,
      checkpointDir: Option[String] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // `shingled` feeds the exact stage, signature banding, and both
    // verification joins; `banded` feeds bucket-min AND the candidate
    // join. Without a barrier Catalyst re-derives each subtree per
    // consumer — shingling the corpus 4x. Persist both for the duration
    // of this call and eagerly reduce to the (small) loser-id set, after
    // which the heavy caches are dropped; the returned plan is a lazy
    // anti-join of `df` against the materialized losers. The barrier does
    // NOT register in the plan cache (so repeated calls re-run honestly);
    // `checkpointDir` selects the executor-churn-safe reliable form for
    // cluster scale — see [[materializeBarrier]].
    //
    // Below [[barrierThresholdBytes]] the whole pipeline instead runs as
    // ONE lazy job: the 2-4× subtree re-derivation is cheaper than the
    // barrier's extra job + stage boundaries at that scale (the bounded
    // re-computations: 2× shingling in the exact-key projection, 2× the
    // signature/banding chain — never k×, because the signature lambda
    // reads `_sh` as a join-output attribute, which CollapseProject
    // cannot inline a definition into).
    val small = isSmallInput(df)
    // small inputs are usually also FEW-PARTITION inputs (one row group →
    // one scan partition): fan out so shingling/signatures parallelize
    // instead of serializing on one core per re-derivation
    val input = if (small) graft.core.Tables.fanOut(df) else df
    val shingledBase = input.select(
      col(idCol).as("_id"),
      TextAnalysis.shingleHashesDistinct(col(textCol), shingleN).as("_sh"))
    val shingled =
      if (small) shingledBase else shingledBase.persist(StorageLevel.MEMORY_AND_DISK)

    // STAGE 1 — exact-duplicate collapse: identical shingle SETS (sorted
    // hashed shingles as the group key) keep only their smallest id. On
    // replica-heavy corpora (web crawls) this removes the bulk of the
    // duplication for one narrow shuffle, and — crucial for recall at
    // scale — exact replicas NEVER depend on LSH bucket crowding to be
    // found. Covers the zero-shingle (empty) docs too: they share the
    // empty set. 128-bit two-seed key, same as [[exactKeepMinId]] and for
    // the same reason: stage 1 deletes WITHOUT verification, and a single
    // 64-bit key hits birthday collisions (silently merging distinct
    // docs) around 5e9 rows.
    // salt-first second hash — see exactKeepMinId: hash(salt, x) is an
    // independent hash, hash(x, salt) is a function of hash(x)
    val sorted = array_sort(col("_sh"))
    val keyed = shingled.select(col("_id"),
      xxhash64(sorted).as("_ck1"), xxhash64(lit(1), sorted).as("_ck2"))
    // Two forms of "smallest id per group + who lost":
    //  - big path: partial+final AGG then join back — map-side combine
    //    collapses replica-heavy groups before the shuffle, so a hot
    //    group (a million-fold replica cluster) costs each mapper one
    //    row. The group-min window would instead shuffle EVERY member to
    //    one reducer — the skew bomb.
    //  - small path: group-min WINDOW — one exchange, reused by both
    //    consumers (losers + representatives) via ReuseExchange, where
    //    the agg form costs an extra join and a re-derivation of `keyed`
    //    per consumer. No skew concern below the threshold.
    val (exactLosers, repIds) =
      if (small) {
        val wk = Window.partitionBy(col("_ck1"), col("_ck2"))
        val marked = keyed.withColumn("_rep", min(col("_id")).over(wk))
        (marked.filter(col("_id") =!= col("_rep")).select(col("_id").as("_loser")),
          marked.filter(col("_id") === col("_rep")).select(col("_id")))
      } else {
        val repOf = keyed.groupBy(col("_ck1"), col("_ck2")).agg(min(col("_id")).as("_rep"))
        (keyed.join(repOf, Seq("_ck1", "_ck2"))
            .filter(col("_id") =!= col("_rep"))
            .select(col("_id").as("_loser")),
          repOf.select(col("_rep").as("_id")))
      }

    // STAGE 2 — near-dup LSH over the distinct representatives only.
    // Signatures in per-row column form over the CACHED `_sh` attribute:
    // zero shuffles (vs the explode + partial-agg path, which is the
    // right shape only when shingles are a derived expression that
    // CollapseProject would otherwise inline into all k hash branches).
    // Zero-shingle reps yield an all-null signature: they bucket only
    // with each other and verify at jaccard 0 — harmless.
    val reps = shingled.join(repIds, "_id")
    val bandedBase = minhashBandKeys(
      reps.select(col("_id"),
        minhashSignatureFromShingles(col("_sh"), numHashes).as("_sig")),
      bands, rowsPerBand)
    val banded =
      if (small) bandedBase else bandedBase.persist(StorageLevel.MEMORY_AND_DISK)

    // NO distinct on (id, cand): duplicates (same pair colliding in
    // several bands) only re-verify a pair — harmless to the anti-join —
    // and are bounded by `bands`; mostly TRUE near-dups (chance collisions
    // rarely repeat across independent bands), a small minority after the
    // stage-1 exact collapse. A distinct would spend a full extra shuffle
    // barrier at every scale to save that bounded re-verification.
    // Same agg-vs-window split as stage 1, same skew rationale: a hot LSH
    // bucket must map-side-combine at scale, not sort on one reducer.
    val candidates =
      if (small) {
        val wb = Window.partitionBy(col("_band"), col("_bkey"))
        banded.withColumn("_cand", min(col("_id")).over(wb))
          .filter(col("_cand") < col("_id"))
          .select(col("_id"), col("_cand"))
      } else {
        val bucketMin = banded.groupBy(col("_band"), col("_bkey"))
          .agg(min(col("_id")).as("_cand"))
        banded.join(bucketMin, Seq("_band", "_bkey"))
          .filter(col("_cand") < col("_id"))
          .select(col("_id"), col("_cand"))
      }

    val nearLosers = candidates
      .join(shingled.withColumnsRenamed(Map("_id" -> "_cand", "_sh" -> "_sh_c")), "_cand")
      .join(shingled, "_id")
      .filter(jaccard(col("_sh"), col("_sh_c")) >= threshold)
      .select(col("_id").as("_loser"))

    // no distinct: left-anti join semantics are insensitive to duplicate
    // build-side rows, so deduplicating the loser list would only add a
    // shuffle. try/finally: a failed materialization must not leave the
    // two heavy caches pinned in the block manager.
    val allLosers =
      if (small) exactLosers.union(nearLosers)
      else
        try materializeBarrier(exactLosers.union(nearLosers), checkpointDir)
        finally { shingled.unpersist(false); banded.unpersist(false) }
    df.join(allLosers, df(idCol) === allLosers("_loser"), "left_anti")
  }

  /** Cross-corpus decontamination: drop every `corpus` document with an
    * exact or near (shingle-Jaccard ≥ `threshold`) match in `reference` —
    * the standard "remove benchmark/eval contamination from training
    * data" operator. Unlike dedup there is no keep-smallest-id policy:
    * ANY reference match disqualifies the corpus doc, ids on the two
    * sides are unrelated.
    *
    * Shape: exact stage on the 128-bit sorted-shingle key (contaminated
    * regardless of LSH recall), then banded-signature equi-join corpus ×
    * reference for near matches, exact-Jaccard verified. All joins are
    * equi-joins on 8-byte band keys; shingle arrays travel only to the
    * candidate-pair verification. Same persist + localCheckpoint
    * discipline as [[minhashDedup]].
    */
  def minhashDecontaminate(
      corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.8,
      checkpointDir: Option[String] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    def shingle(df: DataFrame): DataFrame = df.select(
      col(idCol).as("_id"),
      TextAnalysis.shingleHashesDistinct(col(textCol), shingleN).as("_sh"))
    def keys(sh: DataFrame): DataFrame = {
      val sorted = array_sort(col("_sh"))
      sh.select(col("_id"),
        xxhash64(sorted).as("_ck1"), xxhash64(lit(1), sorted).as("_ck2"))
    }
    def band(sh: DataFrame): DataFrame = minhashBandKeys(
      sh.select(col("_id"),
        minhashSignatureFromShingles(col("_sh"), numHashes).as("_sig")),
      bands, rowsPerBand)

    // same adaptive-barrier policy as [[minhashDedup]]
    val small = isSmallInput(corpus) && isSmallInput(reference)
    val (cSh, rSh) =
      if (small) (shingle(corpus), shingle(reference))
      else (shingle(corpus).persist(StorageLevel.MEMORY_AND_DISK),
        shingle(reference).persist(StorageLevel.MEMORY_AND_DISK))

    val exactHits = keys(cSh)
      .join(keys(rSh).select(col("_ck1"), col("_ck2")), Seq("_ck1", "_ck2"), "left_semi")
      .select(col("_id").as("_dirty"))

    val candidates = band(cSh).select(col("_band"), col("_bkey"), col("_id"))
      .join(band(rSh).select(col("_band"), col("_bkey"), col("_id").as("_rid")),
        Seq("_band", "_bkey"))
      .select(col("_id"), col("_rid"))
      .distinct()
    val nearHits = candidates
      .join(cSh, "_id")
      .join(rSh.withColumnsRenamed(Map("_id" -> "_rid", "_sh" -> "_sh_r")), "_rid")
      .filter(jaccard(col("_sh"), col("_sh_r")) >= threshold)
      .select(col("_id").as("_dirty"))

    val dirty =
      if (small) exactHits.union(nearHits)
      else
        try materializeBarrier(exactHits.union(nearHits), checkpointDir)
        finally { cSh.unpersist(false); rSh.unpersist(false) }
    corpus.join(dirty, corpus(idCol) === dirty("_dirty"), "left_anti")
  }

  /** Iterate a row-dropping operator until its output stops shrinking —
    * the opt-in transitive-chain companion to the single-pass dedups: one
    * pass over A~B~C (A≁C) drops BOTH B and C (see the object scaladoc);
    * re-running on the survivors {A, C} finds no pair, so the fixpoint of
    * "drop only rows with a SURVIVING smaller near-dup" needs iteration.
    * Each round costs a full `count()` action, so this is for final-stage
    * cluster refinement at bounded size, not the 100 TB hot path — dedup
    * passes only remove rows, so the iteration count is bounded by
    * `maxRounds` and in practice converges in 2-3 rounds.
    *
    * NOTE: for keep-smallest-id operators this does NOT resurrect rows a
    * previous round dropped (C stays dropped once removed) — it only
    * guarantees the RESULT is a fixpoint of `op`, i.e. no further pass
    * changes it.
    */
  def iterateToFixpoint(
      df: DataFrame, op: DataFrame => DataFrame, maxRounds: Int = 5): DataFrame = {
    var cur = df
    var n = cur.count()
    var rounds = 0
    while (rounds < maxRounds) {
      val next = op(cur)
      val m = next.count()
      if (m == n) return cur
      cur = next; n = m; rounds += 1
    }
    cur
  }

  /** Exact Jaccard over two shingle arrays (treated as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    val union = (size(da) + size(db)).cast("double") - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over the token stream: per-token 64-bit hash votes ±1
    * on each bit position weighted by occurrence; bit i of the result is 1
    * iff the vote sum is positive. Expressed entirely with higher-order
    * functions (fold over tokens of a 64-long vote vector) — per-row,
    * no shuffle.
    */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1L) === 1L, lit(1L)).otherwise(lit(-1L)))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Scalable SimHash: explode tokens, hash each token once in a
    * projection, then one hash-aggregate with 64 bit-vote sum slots over
    * the materialized hash (bit tests are shift/mask on a long — no
    * re-hashing per slot). Docs with zero tokens get signature 0 (matching
    * the column form). Returns (_id, _sig long).
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explode_OUTER keeps one null-token row for empty/null-text docs, so
    // every doc survives into the aggregate and the former left-join-back
    // (a whole extra shuffle barrier) is unnecessary. The null token must
    // hash to NULL explicitly — Spark's xxhash64 IGNORES null inputs and
    // returns the seed (42), which would give empty docs a nonzero
    // signature; a null _h makes every bit-test condition null → the
    // otherwise(-1) branch → all-negative votes → signature 0, matching
    // the column-form [[simhash]] exactly.
    val hashed = df.select(
      col(idCol).as("_id"),
      explode_outer(TextAnalysis.tokens(col(textCol))).as("_t"))
      .select(col("_id"),
        when(col("_t").isNotNull, xxhash64(col("_t"))).as("_h"))
    val votes = (0 until 64).map(j =>
      sum(when(shiftright(col("_h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"_v$j"))
    val sig = (0 until 64)
      .map(j => when(col(s"_v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    hashed.groupBy(col("_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("_id"), sig.as("_sig"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist. Candidate
    * generation by the pigeonhole principle: fingerprints are split into
    * `maxDist + 1` chunks; any pair within distance maxDist must agree on
    * at least one full chunk, so an equi-join per chunk finds all
    * candidates without a cross join.
    */
  def simhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val withSig = simhashSignatures(df, idCol, textCol)

    val banded = withSig.select(
      col("_id"), col("_sig"),
      posexplode(
        transform(
          sequence(lit(0), lit(chunks - 1)),
          c => call_function("shiftrightunsigned", col("_sig"), c * width)
            .bitwiseAND(if (width >= 64) lit(-1L) else lit((1L << width) - 1)))))
      .withColumnsRenamed(Map("pos" -> "_chunk", "col" -> "_ckey"))

    val a = banded.select(col("_chunk"), col("_ckey"), col("_id").as("id_a"), col("_sig").as("_sig_a"))
    val b = banded.select(col("_chunk"), col("_ckey"), col("_id").as("id_b"), col("_sig").as("_sig_b"))

    a.join(b, Seq("_chunk", "_ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_sig_a"), col("_sig_b"))
      .distinct()
      .withColumn("dist", hamming(col("_sig_a"), col("_sig_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** SimHash dedup, keep-smallest-id, in two stages:
    *
    *  1. **Exact-signature collapse**: identical 64-bit fingerprints keep
    *     only their smallest id — one narrow shuffle. This is the recall
    *     backbone: exact replicas NEVER depend on LSH bucket luck.
    *  2. **Near-dup (Hamming 1..maxDist) among the distinct-signature
    *     representatives**, pigeonhole chunks + bucket-min candidates
    *     (each rep verifies against ≤ `maxDist + 1` candidates — the
    *     min-id chunk-mate per chunk).
    *
    * Why staging matters here and not just for speed: the pigeonhole
    * chunks are only 64/(maxDist+1) bits wide (16 for the default), so on
    * a large corpus many DISTINCT documents share a chunk bucket. A
    * single-stage bucket-min would then often pick a non-matching foreign
    * doc as the one candidate and keep a true duplicate (measured: 30×
    * replication of 5k docs kept 60k of 150k). Collapsing identical
    * signatures first makes buckets sparse again (one row per distinct
    * fingerprint) AND guarantees replica recall regardless of crowding.
    */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3,
      checkpointDir: Option[String] = None): DataFrame = {
    // signatures via the native codegen'd expression: one fused per-row
    // loop, NO shuffle — vs [[simhashSignatures]]'s explode + 64-slot
    // aggregate, which blows each doc up to one row per token and pays a full
    // exchange before the first dedup stage even starts. Bit-for-bit
    // equal for tokenizer output (SimHash64Spec pins parity with the HOF
    // form; [[TextAnalysis.tokens]] never emits null elements). The
    // coalesce maps null-text docs to signature 0, matching
    // simhashSignatures' explode_outer handling of empty docs.
    graft.functions.SimHash64.register(df.sparkSession)
    val sigs = df.select(
      col(idCol).as("_id"),
      coalesce(
        graft.functions.SimHash64.simhash64(TextAnalysis.tokens(col(textCol))),
        lit(0L)).as("_sig"))
    val losers = signatureLosers(sigs, maxDist, checkpointDir)
    df.join(losers, df(idCol) === losers("_loser"), "left_anti")
  }

  /** The signature-space core of [[simhashDedup]], reusable for ANY 64-bit
    * content signature (text SimHash here; image average-hash in
    * [[graft.multimodal.Multimodal.imageDedupByAHash]]): given (_id, _sig)
    * rows, return the `_loser` ids to drop under keep-smallest-id with
    * Hamming distance ≤ `maxDist` — exact-signature collapse first, then
    * pigeonhole-chunk near-dup among distinct-signature representatives
    * (same staging rationale as the scaladoc above). Above
    * [[barrierThresholdBytes]] the input subtree is persisted for the
    * duration of the call and the loser set is materialized behind a
    * localCheckpoint barrier; below it the whole pipeline stays lazy
    * (one job, no barriers).
    */
  def signatureLosers(sigs: DataFrame, maxDist: Int = 3,
      checkpointDir: Option[String] = None): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    // same persist-and-barrier discipline as [[minhashDedup]], including
    // the small-input bypass: below the threshold the loser set computes
    // in the final job (bounded re-derivation of the signature subtree —
    // 2×, one per direct consumer — instead of an extra job + barriers)
    val small = isSmallInput(sigs)
    val withSigBase = sigs.select(col("_id"), col("_sig"))
    val withSig =
      if (small) withSigBase else withSigBase.persist(StorageLevel.MEMORY_AND_DISK)

    // agg+join at scale (map-side combine absorbs replica-heavy groups
    // before the shuffle), group-min window below the threshold (one
    // exchange, reused by both consumers) — same split and skew
    // rationale as [[minhashDedup]]'s stage 1.
    val (exactLosers, reps) =
      if (small) {
        val wk = Window.partitionBy(col("_sig"))
        val marked = withSig.withColumn("_rep", min(col("_id")).over(wk))
        (marked.filter(col("_id") =!= col("_rep")).select(col("_id").as("_loser")),
          marked.filter(col("_id") === col("_rep")).select(col("_id"), col("_sig")))
      } else {
        val repOf = withSig.groupBy(col("_sig")).agg(min(col("_id")).as("_rep"))
        (withSig.join(repOf, "_sig")
            .filter(col("_id") =!= col("_rep"))
            .select(col("_id").as("_loser")),
          repOf.select(col("_rep").as("_id"), col("_sig")))
      }
    val bandedBase = reps.select(
      col("_id"), col("_sig"),
      posexplode(
        transform(
          sequence(lit(0), lit(chunks - 1)),
          c => call_function("shiftrightunsigned", col("_sig"), c * width)
            .bitwiseAND(if (width >= 64) lit(-1L) else lit((1L << width) - 1)))))
      .withColumnsRenamed(Map("pos" -> "_chunk", "col" -> "_ckey"))
    val banded =
      if (small) bandedBase else bandedBase.persist(StorageLevel.MEMORY_AND_DISK)

    // no distinct on candidates — same rationale as [[minhashDedup]]:
    // duplicate (id, cand) pairs only re-verify (bounded by chunks),
    // while a distinct costs a full shuffle barrier at every scale
    val candidates =
      if (small) {
        val wb = Window.partitionBy(col("_chunk"), col("_ckey"))
        banded.withColumn("_cand", min(col("_id")).over(wb))
          .filter(col("_cand") < col("_id"))
          .select(col("_id"), col("_sig"), col("_cand"))
      } else {
        val bucketMin = banded.groupBy(col("_chunk"), col("_ckey"))
          .agg(min(col("_id")).as("_cand"))
        banded.join(bucketMin, Seq("_chunk", "_ckey"))
          .filter(col("_cand") < col("_id"))
          .select(col("_id"), col("_sig"), col("_cand"))
      }

    // no distinct before the anti-join — duplicate loser ids are harmless
    // there and the dedup would cost a shuffle
    val nearLosers = candidates
      .join(reps.withColumnsRenamed(Map("_id" -> "_cand", "_sig" -> "_sig_c")), "_cand")
      .filter(hamming(col("_sig"), col("_sig_c")) <= maxDist)
      .select(col("_id").as("_loser"))

    if (small) exactLosers.union(nearLosers)
    else
      try materializeBarrier(exactLosers.union(nearLosers), checkpointDir)
      finally { withSig.unpersist(false); banded.unpersist(false) }
  }

  // -------------------------------------------------- n-gram Jaccard join

  /** Exact n-gram Jaccard similarity join via inverted index (no LSH
    * approximation): fingerprint each doc's distinct shingles to 64-bit
    * `xxhash64` keys in the scan, group the inverted index into per-key
    * buckets, generate in-bucket pairs with a codegen'd array-combination
    * expression, and compute Jaccard directly from the pair counts.
    * Quadratic only within shingle buckets — and the bucket size is
    * BOUNDED by `maxDf`: keys whose document frequency exceeds it are
    * dropped before bucket collection (one partial+final count pre-pass,
    * then a broadcastable anti-join against the small hot-key set — the
    * count pass also protects the bucket `collect_list` from a
    * boilerplate shingle appearing in d documents ("all rights reserved")
    * building a d-element list on one reducer: the classic
    * exact-similarity-join skew bomb). With the cap, no bucket exceeds
    * maxDf ids / maxDf² candidate rows.
    *
    * Plan shape (vs the naive string self-join, which was 7× slower at
    * sf0.1): every shuffle carries longs, never shingle strings; each
    * inverted row carries the doc's distinct-shingle count `_n`, so the
    * final Jaccard needs NO join back to per-doc sizes — the pair
    * generator emits (id_a, n_a, id_b, n_b) and one partial+final
    * count-agg finishes the job. Three shuffles total (df-count, bucket
    * group, pair count), all map-side combinable except the bounded
    * bucket collect.
    *
    * Semantics under the cap: results are exact whenever no shingle
    * exceeds `maxDf` (the default 1000 is far above any real corpus's
    * NEAR-DUP-discriminating shingles — at sf-scale test corpora nothing
    * is dropped at all). When the cap does bite, a dropped shingle no
    * longer counts toward the intersection, so reported `jaccard` is a
    * lower bound and pairs overlapping ONLY in ultra-common shingles are
    * not reported — the standard document-frequency-filter trade: such
    * pairs are boilerplate matches, not near-duplicates. Set sizes and
    * intersections are counted over 64-bit fingerprints, so "exact"
    * is modulo an xxhash64 collision between two distinct shingles of
    * the same document pair — vanishingly unlikely and deterministic
    * (the dual-engine oracle computes from raw strings; a green hash
    * match certifies no collision bit the corpus).
    * Returns (id_a, id_b, jaccard ≥ threshold).
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    // r8: fused token-slice fingerprints (ShingleHashes) instead of
    // hashing materialized gram strings — same window identity (tokens
    // contain no whitespace, so gram-string equality ⟺ token-tuple
    // equality), same whole-text fallback for < n-token docs, and the
    // collision argument below is unchanged
    val sh = df.select(
      col(idCol).as("_id"),
      TextAnalysis.shingleHashesDistinct(col(textCol), shingleN).as("_hs"))
    val inv = sh.select(
      col("_id"), size(col("_hs")).as("_n"), explode(col("_hs")).as("_h"))
    // hot-key set: tiny by construction (only keys in > maxDf docs), so
    // the anti-join broadcasts; the agg is partial+final
    val hot = inv.groupBy(col("_h"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDf)
      .select(col("_h"))
    val buckets = inv.join(hot, Seq("_h"), "left_anti")
      .groupBy(col("_h"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_n")))).as("_ds"))
    // in-bucket ordered pairs (id_a < id_b via the sort above), sizes
    // carried along; size-1 buckets are filtered first — `sequence(1, 0)`
    // would DESCEND in Spark, not return empty
    val ds = col("_ds")
    val pairs = buckets.filter(size(ds) >= 2).select(explode(flatten(
      transform(sequence(lit(1), size(ds) - 1), i =>
        transform(slice(ds, i + 1, size(ds) - i), d => struct(
          element_at(ds, i)("_id").as("id_a"),
          element_at(ds, i)("_n").as("_na"),
          d("_id").as("id_b"),
          d("_n").as("_nb"))))))
      .as("_p"))

    pairs
      .groupBy(
        col("_p.id_a").as("id_a"), col("_p.id_b").as("id_b"),
        col("_p._na").as("_na"), col("_p._nb").as("_nb"))
      .agg(count(lit(1)).as("_common"))
      .withColumn("jaccard",
        col("_common").cast("double") /
          (col("_na") + col("_nb") - col("_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // --------------------------------------- repeated-substring span dedup

  /** Sub-document repeated-span detection (the exact-substring dedup of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", at token granularity): find, per document, the maximal
    * token spans every position of which starts a `gramN`-token window
    * that occurs at least `minCount` times ANYWHERE in the corpus
    * (another document, or elsewhere in the same one). Doc-level dedup
    * ([[exactKeepMinId]]/[[minhashDedup]]) misses these — the classic
    * case is a unique page wrapping a boilerplate license block or a
    * long quotation; span detection localizes the repeated region so a
    * pipeline can cut it while keeping the novel text around it.
    *
    * Plan shape (all narrow, no all-pairs step anywhere):
    *   1. positioned gram fingerprints: `posexplode` over the shingle
    *      array, each gram hashed to a 64-bit `xxhash64` key AT THE SCAN —
    *      every later shuffle carries (id, pos, long), never gram text;
    *   2. corpus-wide occurrence count per key (partial+final hash agg —
    *      map-side combine collapses within-partition repeats of hot
    *      boilerplate before the exchange), keys with count ≥ minCount
    *      form the duplicated-gram set;
    *   3. left-semi equi-join grams against that set on the 64-bit key;
    *   4. gaps-and-islands: `pos − row_number()` over (doc, pos-order)
    *      groups consecutive duplicated starts; the window partitions by
    *      document id — state is bounded by document length, never by
    *      corpus size — then one agg emits each island's span.
    *
    * A position is covered iff the gram STARTING there is duplicated, so
    * a span's last covered window extends `gramN − 1` tokens past its
    * last duplicated start: `span_end = max(pos) + gramN − 1` (inclusive
    * 0-based token indexes). Documents with fewer than `gramN` tokens
    * cannot contain a full window and are excluded up front (cheap
    * `tokenCount` filter at the scan — also keeps [[TextAnalysis
    * .shingles]]'s short-doc whole-text collapse out of the semantics).
    * Duplication is judged over 64-bit fingerprints — exact modulo an
    * xxhash64 collision, same trade as [[ngramJaccardPairs]] (the
    * dual-engine oracle counts raw gram strings; a green hash match
    * certifies no collision bit the corpus).
    *
    * Returns (doc_id, span_start, span_end, span_tokens), one row per
    * maximal span.
    */
  def repeatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      gramN: Int = 8, minCount: Int = 2): DataFrame = {
    require(gramN >= 1, s"gramN must be >= 1, got $gramN")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val grams = df
      .filter(TextAnalysis.tokenCount(col(textCol)) >= gramN)
      .select(col(idCol).as("_id"),
        // r8: fused token-slice fingerprints; window order = position,
        // so posexplode positions are unchanged (≥ gramN tokens is
        // guaranteed by the filter above — no short-text fallback here)
        posexplode(TextAnalysis.shingleHashes(col(textCol), gramN))
          .as(Seq("_p", "_h")))
    val dup = grams.groupBy(col("_h"))
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount)
      .select(col("_h"))
    val w = Window.partitionBy(col("_id")).orderBy(col("_p"))
    grams.join(dup, Seq("_h"), "left_semi")
      .withColumn("_grp", col("_p") - row_number().over(w))
      .groupBy(col("_id"), col("_grp"))
      .agg(min(col("_p")).as("span_start"),
        (max(col("_p")) + lit(gramN - 1)).as("span_end"))
      .select(col("_id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** APPLY side of [[repeatedSpans]] — the actual Lee et al. 2022
    * pipeline step: remove every detected repeated span from the
    * document and emit the cleaned text. Returns one row per document
    * that HAD at least one span: (id, n_tokens, cut_tokens,
    * clean_text), where cut_tokens counts DISTINCT removed tokens
    * (overlapping spans never double-count; n_tokens − cut_tokens is
    * the kept count) and clean_text is the kept tokens re-joined with
    * single spaces (token-canonical — original inter-token whitespace
    * is not preserved; the tokenizer already defines the text's
    * semantic content) and may be EMPTY when spans cover the whole
    * document.
    *
    * Plan shape: [[repeatedSpans]]'s three narrow shuffles plus ONE
    * per-doc agg of its spans and ONE equi-join back to the corpus;
    * the cut itself is a codegen'd higher-order filter over the token
    * array against the (bounded, per-doc) span list — no explode of
    * corpus tokens, no window over corpus rows. Spans-per-doc is
    * bounded by document length, so the joined span arrays stay small
    * regardless of corpus size.
    */
  def cutRepeatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      gramN: Int = 8, minCount: Int = 2): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, gramN, minCount)
      .groupBy(col(idCol))
      .agg(
        collect_list(struct(col("span_start"), col("span_end"))).as("_spans"))
    // cut_tokens = n_tokens − kept: counted from the filtered array
    // itself, so spans that OVERLAP (adjacent islands < gramN apart
    // produce spans sharing up to gramN−2 tokens) never double-count —
    // the column is exactly "distinct tokens removed", and
    // n_tokens − cut_tokens is the kept-token count by construction
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .join(spans, Seq(idCol))
      .select(
        col(idCol), col("_t"),
        filter(col("_t"), (tok, i) =>
          !exists(col("_spans"), s =>
            i >= s("span_start") && i <= s("span_end"))).as("_kept"))
      .select(
        col(idCol),
        size(col("_t")).cast("long").as("n_tokens"),
        (size(col("_t")) - size(col("_kept"))).cast("long").as("cut_tokens"),
        array_join(col("_kept"), " ").as("clean_text"))
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Embedding near-dup pairs: cosine similarity ≥ threshold. Candidate
    * generation via BANDED random-hyperplane LSH (OR of `bands`
    * independent `planesPerBand`-bit signatures): a single flat signature
    * would have ~(1-acos(s)/π)^planes recall — only ~18% at cosine 0.95
    * with 16 planes — while the banded OR-construction reaches ~99% with
    * 8×8 at the same total plane count budget. Exact cosine verifies.
    * Returns (id_a, id_b, cosine).
    *
    * SIZING AT SCALE: `planesPerBand` must grow with log2(N). Fixed
    * signature bits saturate the 2^p band buckets as the corpus grows,
    * and candidate pairs then grow quadratically (R7ScaleBench measured
    * the knee at ~20k vectors for p=8). Hold expected bucket occupancy
    * roughly constant — p ≈ log2(N / targetOccupancy) — and the verified
    * candidate frame stays ~linear while near-dup recall at cos ≥ 0.99
    * remains ≈ 1 (per-band collision 0.9955^p, OR'd over `bands`).
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      bands: Int = 8, planesPerBand: Int = 8,
      threshold: Double = 0.95, dim: Int = 64): DataFrame = {
    // band rows and the multi-band-collapse distinct carry ONLY ids —
    // vectors join back per verified-candidate side afterwards (same
    // narrow-shuffle rationale as Similarity.lshTopK)
    val banded = Similarity.hyperplaneBandKeys(
      df, idCol, vecCol, "_id", bands, planesPerBand, dim)
    val a = banded.select(col("_band"), col("_bsig"), col("_id").as("id_a"))
    val b = banded.select(col("_band"), col("_bsig"), col("_id").as("id_b"))
    graft.functions.CosineSimilarity.register(df.sparkSession)
    // dropDuplicates: duplicate-id rows would re-expand the pairs the
    // distinct collapsed (see Similarity.lshTopK's join-back note)
    val vecs = df.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
      .dropDuplicates("_vid")
    a.join(b, Seq("_band", "_bsig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // same pair may collide in several bands — narrow pairs
      .join(vecs.withColumnsRenamed(Map("_vid" -> "id_a", "_vv" -> "_va")), "id_a")
      .join(vecs.withColumnsRenamed(Map("_vid" -> "id_b", "_vv" -> "_vb")), "id_b")
      .withColumn("cosine",
        graft.functions.CosineSimilarity.cosineSim(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact embedding near-dup pairs: EVERY (id_a < id_b) pair with cosine
    * ≥ `threshold`, by exhaustive pairwise comparison — the declared
    * exact BASELINE that [[embeddingNearDupPairs]]'s banded-LSH candidate
    * generation is pinned against in CI (DedupSpec: LSH ≡ exact on a
    * planted-near-dup corpus). Quadratic in corpus size: correct at any
    * scale but only affordable for bounded inputs (validation samples,
    * reference sets, per-cluster verification); the LSH path is the
    * 100 TB form. Returns (id_a, id_b, cosine).
    */
  def embeddingNearDupPairsExact(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95): DataFrame = {
    graft.functions.CosineSimilarity.register(df.sparkSession)
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("_va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.CosineSimilarity.cosineSim(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Embedding-space decontamination: drop every `corpus` row whose
    * vector has cosine ≥ `threshold` with ANY `reference` vector — the
    * semantic-similarity variant of [[minhashDecontaminate]] (paraphrased
    * benchmark leakage that n-gram matching misses). Banded
    * random-hyperplane signatures bucket corpus × reference as narrow
    * id pairs; exact native cosine verifies.
    */
  def embeddingDecontaminate(
      corpus: DataFrame, reference: DataFrame,
      idCol: String, vecCol: String,
      bands: Int = 8, planesPerBand: Int = 8,
      threshold: Double = 0.95, dim: Int = 64,
      checkpointDir: Option[String] = None): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val cVec = corpus.select(col(idCol).as("_id"), col(vecCol).as("_cv"))
      .dropDuplicates("_id")
    val rVec = reference.select(col(idCol).as("_rid"), col(vecCol).as("_rv"))
      .dropDuplicates("_rid")
    // same eager-barrier discipline as [[minhashDecontaminate]] (the
    // corpus subtree would otherwise be scanned and banded once per
    // consumer of the lazy plan), with the same small-input bypass
    val small = isSmallInput(corpus) && isSmallInput(reference)
    val dirtyBase = Similarity.hyperplaneBandKeys(
        corpus, idCol, vecCol, "_id", bands, planesPerBand, dim)
      .join(Similarity.hyperplaneBandKeys(
        reference, idCol, vecCol, "_rid", bands, planesPerBand, dim),
        Seq("_band", "_bsig"))
      .select(col("_id"), col("_rid"))
      .distinct()
      .join(cVec, "_id")
      .join(rVec, "_rid")
      .filter(graft.functions.CosineSimilarity.cosineSim(col("_cv"), col("_rv")) >= threshold)
      .select(col("_id").as("_dirty"))
    val dirty = if (small) dirtyBase else materializeBarrier(dirtyBase, checkpointDir)
    corpus.join(dirty, corpus(idCol) === dirty("_dirty"), "left_anti")
  }

  /** Embedding-cosine dedup, keep-smallest-id policy. */
  def embeddingDedup(
      df: DataFrame, idCol: String, vecCol: String,
      bands: Int = 8, planesPerBand: Int = 8,
      threshold: Double = 0.95, dim: Int = 64): DataFrame = {
    val losers = embeddingNearDupPairs(df, idCol, vecCol, bands, planesPerBand, threshold, dim)
      .select(col("id_b").as("_loser")).distinct()
    df.join(losers, df(idCol) === losers("_loser"), "left_anti")
  }

  // ------------------------------------ connected components (clusters)

  /** Distributed connected components over an undirected pair graph via
    * the alternating large-star / small-star algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC 2014). Returns
    * one row per node appearing in `pairs`: (`id`, `component`), where
    * `component` is the smallest node id in the node's connected
    * component. Nodes in no pair are absent — callers union them back
    * with `component = id` (see q76 / [[clusterDedup]]).
    *
    * Why this algorithm: min-label propagation needs O(diameter) rounds —
    * a million-link similarity chain takes a million shuffles — while
    * alternating star contraction converges in O(log² n) rounds (O(log n)
    * in practice) on ANY graph shape, so a 100 TB candidate-pair graph
    * with pathological chains still finishes in tens of rounds. Each
    * round is two shuffle-bounded relinks:
    *
    *   large-star: each node u links its LARGER neighbors to
    *     m = min(N(u) ∪ {u}) — emit (v, m) for v ∈ N(u), v > u
    *   small-star: orient edges large→small; each node u links its
    *     smaller neighbors and itself to m = min(N(u) ∪ {u})
    *
    * Both steps are a groupBy-min plus an equi-join back on the node id —
    * deliberately NO collect_list, so a hub node's neighbor set never
    * materializes in one row: degree skew lands on an AQE-splittable
    * shuffle, not a single fat task. Edges stay (long, long) end-to-end —
    * 16 bytes per edge on the wire regardless of document size.
    *
    * Every round ends in `distinct` + a materialization barrier
    * ([[materializeBarrier]]): iterative lineage otherwise grows a new
    * copy of all prior rounds into each action. The default
    * `localCheckpoint` pins each round's edge set in executor memory
    * until context GC — fine for tens of rounds of id-pairs; pass
    * `checkpointDir` at cluster scale to land rounds on reliable storage
    * (executor-churn-safe AND evictable). Convergence is detected by an
    * order-independent (count, xxhash-sum) signature, one tiny agg per
    * round: a round that changes nothing means the edge set is exactly
    * the star forest {(node, root)}.
    */
  /** Edge-count threshold at or below which [[connectedComponents]]
    * solves the graph on the driver with union-find instead of iterating
    * distributed star rounds. The candidate-pair graph of a dedup pass
    * is usually minuscule next to its corpus (pairs are the OUTPUT of
    * LSH banding, not the input scan), so at 2M edges (collected as one
    * primitive interleaved Array[Long]: 32 MB flat, no per-edge Tuple2
    * boxing — the same order as a broadcast-join build side) the driver
    * solve is exact, one collect, zero iterative jobs; above it the
    * log-round star loop runs. Tests pin both paths identical (DedupSpec)
    * — var, test seam only (same pattern as [[barrierThresholdBytes]]).
    */
  var ccLocalMaxEdges: Long = 2L << 20

  /** Driver union-find over canonicalized edges — the small-graph path.
    * Path-compressed; component label = min member id. `edges` is
    * interleaved [u0,v0,u1,v1,…]: one primitive long array, no per-edge
    * Tuple2 boxing (r5 advisor: boxed pairs cost ~5× the flat bytes).
    */
  private def localComponents(edges: Array[Long]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    var i = 0
    while (i < edges.length) {
      val u = edges(i); val v = edges(i + 1); i += 2
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) parent(ru) = rv
    }
    val minOf = scala.collection.mutable.LongMap.empty[Long]
    parent.keys.foreach { k =>
      val r = find(k)
      minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), k)
    }
    parent.keys.map(k => (k, minOf(find(k)))).toArray
  }

  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    val a = col("_cc_a"); val b = col("_cc_b")
    // Canonical orientation large→small; self-loops and null ids dropped.
    val edges0 = pairs
      .select(greatest(col(aCol), col(bCol)).cast("long").as("_cc_a"),
        least(col(aCol), col(bCol)).cast("long").as("_cc_b"))
      .filter(a.isNotNull && b.isNotNull && a =!= b)
      .distinct()

    // (v, m) for every neighbor v of u with v > u; m = min(N(u) ∪ {u}).
    // Output stays large→small: m <= u < v.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(b.as("_cc_a"), a.as("_cc_b")))
      val mins = sym.groupBy(a).agg(min(b).as("_cc_mn"))
        .select(a, least(col("_cc_mn"), a).as("_cc_m"))
      sym.filter(b > a).join(mins, "_cc_a")
        .select(b.as("_cc_a"), col("_cc_m").as("_cc_b"))
        .distinct()
    }
    // Edges arrive oriented a > b, so each edge belongs to exactly one
    // group (its larger endpoint) and m = min(b) < a; emit (v, m) for
    // v ∈ N(u) ∪ {u}, v ≠ m.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(a).agg(min(b).as("_cc_m"))
      val relink = e.join(mins, "_cc_a").filter(b =!= col("_cc_m"))
        .select(b.as("_cc_a"), col("_cc_m").as("_cc_b"))
      relink.union(mins.select(a, col("_cc_m").as("_cc_b"))).distinct()
    }
    // Order-independent (count, xor-of-row-hashes) — xor, not sum, so
    // the fold can't overflow under ANSI arithmetic.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(_cc_a, _cc_b))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var cur = materializeBarrier(edges0, checkpointDir)
    var sig = signature(cur)

    // Small-graph fast path: the signature's count doubles as the size
    // probe, so the decision costs no extra job.
    if (sig._1 <= ccLocalMaxEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      // primitive interleaved collect: each task ships one Array[Long]
      // (no Row/Tuple2 boxing on the wire or the driver heap)
      val perPart = cur.select(a, b).rdd.mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuilder.make[Long]
        it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
        Iterator.single(buf.result())
      }.collect()
      val edges = new Array[Long](perPart.iterator.map(_.length).sum)
      var off = 0
      perPart.foreach { p => System.arraycopy(p, 0, edges, off, p.length); off += p.length }
      return spark.createDataset(localComponents(edges).toSeq)
        .toDF("id", "component")
    }

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = materializeBarrier(smallStar(largeStar(cur)), checkpointDir)
      val nsig = signature(next)
      converged = nsig == sig
      cur = next; sig = nsig; round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds — " +
        "theoretically impossible for alternating star on a finite graph; " +
        "raise maxRounds only if the input edge set is being mutated underneath")
    // Star forest: every non-root points at its root; roots self-map.
    cur.select(a.as("id"), b.as("component"))
      .union(cur.select(b.as("id"), b.as("component")))
      .distinct()
  }

  /** Cluster-level survivor selection: connected components over
    * `pairs`, then exactly ONE surviving row per component — the row
    * minimizing (`precedence`, id) — plus every row in no pair.
    *
    * Policy contrast with the single-pass dedups (object scaladoc): on a
    * chain A~B~C (A≁C), single-pass keep-smallest-id drops B and C — the
    * same rows this method drops — but the two diverge in what they CAN
    * express. Single-pass cannot name C's cluster (it only knows C lost
    * to B), so cluster membership reports, keep-BEST-quality survivor
    * selection, and cluster-size stats all need the component id this
    * method materializes. And [[iterateToFixpoint]] of "drop rows with a
    * smaller SURVIVING neighbor" is a genuinely different policy: it
    * keeps {A, C} on the chain (a maximal-independent-set flavor),
    * where cluster dedup keeps {A} (one representative per fuzzy
    * cluster — the standard corpus-dedup contract). Pinned in DedupSpec.
    *
    * `precedence` defaults to the id itself (keep-smallest-id). Pass
    * e.g. a negated quality score to keep the best-quality member:
    * survivor = argmin over (precedence, id), deterministic via the id
    * tiebreak. The winner is found with a partial+final `min_by` agg on
    * a (precedence, id) struct — map-side combine, no window, no skew on
    * giant clusters.
    */
  def clusterDedup(
      df: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "id_a", bCol: String = "id_b",
      precedence: Option[Column] = None,
      maxRounds: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    // an input 'component' column would make the coalesce below resolve
    // ambiguously (or silently win); the _cd_* temps must be free too —
    // same guard posture as Curation.weightedSample (r5 advisor)
    Seq("component", "_cd_id", "_cd_comp", "_cd_win").foreach { c =>
      require(!df.columns.contains(c), s"input already has a $c column")
    }
    val comp = connectedComponents(pairs, aCol, bCol, maxRounds, checkpointDir)
      .withColumnRenamed("id", "_cd_id")
    val withComp = df
      .join(comp, df(idCol).cast("long") === comp("_cd_id"), "left")
      .withColumn("_cd_comp", coalesce(col("component"), df(idCol).cast("long")))
      .drop("_cd_id", "component")
    val ord = struct(precedence.getOrElse(df(idCol).cast("long")),
      df(idCol).cast("long"))
    val winners = withComp
      .groupBy(col("_cd_comp"))
      .agg(min_by(col(idCol), ord).as("_cd_win"))
      .select(col("_cd_win"))
    withComp.join(winners, withComp(idCol) === winners("_cd_win"), "left_semi")
      .drop("_cd_comp")
  }

  /** C4-style CROSS-DOCUMENT segment dedup: cut every document into
    * consecutive `segTokens`-token segments, drop every segment whose
    * exact text occurs earlier in the corpus (first occurrence by
    * (id, position) survives — C4 §2.2's "discard all but one of any
    * three-sentence span occurring more than once", with fixed-width
    * token windows standing in for sentences), and reassemble each
    * document from its surviving segments.
    *
    * Scale shape. The winner election groups on a 64-bit segment
    * fingerprint and min-reduces an (id, seg_idx) struct — map-side
    * combined, 24-byte rows, never the text. Segment text crosses the
    * wire exactly once, in the equi-join that matches each occurrence
    * against its elected winner (hash-partitioned, AQE-splittable).
    * Reassembly is a per-document sort of the surviving (seg_idx, seg)
    * pairs — bounded by document size, no window over the corpus.
    * Fingerprint collisions (~#distinct²/2⁶⁴) would merge unrelated
    * segments; at planet scale use a 128-bit hash — the q85 posture.
    *
    * Returns (idCol, n_segs, n_kept, text_out): segment counts before /
    * after, and the reassembled text ("" when everything was dropped).
    */
  def segmentDedup(
      df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 8): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    val nSeg = ceil(size(col("_sd_toks")) / lit(segTokens.toDouble)).cast("int")
    // one row per segment: slice is 1-based, last segment may be short
    val segs = df.select(col(idCol).cast("long").as("_sd_id"),
        TextAnalysis.tokens(col(textCol)).as("_sd_toks"))
      .select(col("_sd_id"),
        posexplode(transform(sequence(lit(0), greatest(nSeg - 1, lit(0))),
          i => when(nSeg > 0,
            array_join(slice(col("_sd_toks"), i * segTokens + 1, lit(segTokens)), " ")))))
      .filter(col("col").isNotNull)
      .select(col("_sd_id"), col("pos").as("_sd_idx"),
        col("col").as("_sd_seg"), xxhash64(col("col")).as("_sd_h"))
    val winners = segs
      .groupBy(col("_sd_h"))
      .agg(min(struct(col("_sd_id"), col("_sd_idx"))).as("w"))
      .select(col("_sd_h").as("_sd_wh"),
        col("w._sd_id").as("_sd_wid"), col("w._sd_idx").as("_sd_widx"))
    val kept = segs.join(winners, segs("_sd_h") === winners("_sd_wh"))
      .filter(col("_sd_id") === col("_sd_wid") && col("_sd_idx") === col("_sd_widx"))
      .select(col("_sd_id"), col("_sd_idx"), col("_sd_seg"))
    val perDoc = segs.groupBy(col("_sd_id")).agg(count(lit(1)).as("n_segs"))
    val rebuilt = kept.groupBy(col("_sd_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("_sd_idx"), col("_sd_seg")))),
          s => s("_sd_seg")), " ").as("text_out"))
    df.select(col(idCol).cast("long").as(idCol))
      .join(perDoc, col(idCol) === perDoc("_sd_id"), "left").drop("_sd_id")
      .join(rebuilt, col(idCol) === rebuilt("_sd_id"), "left").drop("_sd_id")
      .select(col(idCol),
        coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_out"), lit("")).as("text_out"))
  }
}
