package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational operators beyond the built-in surface, composed Catalyst-first
  * (SURVEY.md §4.4 preference (a): compose existing ops when semantics
  * allow, before reaching for custom plans).
  */
object Relational {

  /** Every column of `df` in a form xxhash64 accepts: map-bearing columns
    * (rejected by Spark's hash functions at analysis time) route through
    * to_json, which is deterministic for a given physical row (a task
    * retry re-reads the same bytes, so the map's storage order — and
    * therefore the hash — reproduces). Shared by [[saltedAggregate]] and
    * [[Export.mixCorpora]].
    */
  private[operators] def hashableCols(df: DataFrame): Seq[Column] = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    df.schema.fields.toSeq.map { f =>
      if (hasMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }
  }

  /** Bucketed band join: `left.x BETWEEN right.y - width AND right.y + width`.
    *
    * Spark plans a raw band condition as BroadcastNestedLoopJoin — O(|L|·|R|)
    * comparisons, a non-starter at scale. Bucketizing turns it into a
    * shuffle equi-join: each left row lands in bucket floor(x/width); each
    * right row is replicated to its bucket ±1 (any in-band pair must share
    * one of those buckets — band width ≤ bucket width); the equi-join on
    * bucket prunes the cross product to O(3·|R| + |L|) shuffled rows and
    * the exact band predicate filters residuals. AQE handles bucket skew.
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      leftVal: Column, rightVal: Column, width: Double): DataFrame = {
    require(width > 0, "band width must be positive")
    val l = left.withColumn("_band_bucket", floor(leftVal / width))
    val r = right.withColumn("_band_bucket",
      explode(array(floor(rightVal / width) - 1, floor(rightVal / width), floor(rightVal / width) + 1)))
    l.join(r, Seq("_band_bucket"))
      .filter(leftVal.between(rightVal - width, rightVal + width))
      .drop("_band_bucket")
  }

  /** Salted equi-join for SKEWED probe keys: a hot key (a handful of
    * values holding most rows) sends its entire probe volume to ONE
    * sort-merge reducer, no matter how many executors exist. Salting
    * splits each key into `saltBuckets` sub-keys: the probe side derives
    * a DETERMINISTIC salt from `probeSaltCol` (any well-distributed
    * probe column — layout-independent, unlike rand(), so retries and
    * recomputations agree), the build side replicates each row across
    * all salts, and the equi-join on (key, salt) spreads the hot key
    * over `saltBuckets` reducers. Cost: build side ×`saltBuckets` — the
    * right trade when the build is modest but too large (or too skewed)
    * to broadcast. Exactness: each probe row carries exactly one salt
    * and meets exactly one replica of every matching build row, so
    * inner and left-outer results equal the plain join row-for-row
    * (RelationalSpec pins the differential; q138 pins it under the
    * DuckDB oracle — salting must be invisible in results, the q111
    * salted-aggregation discipline). Right/full outer are rejected: an
    * unmatched build row would surface once per salt. AQE's runtime
    * skew-join split is the first line of defense; this operator is the
    * declarative form for when the skew is known ahead of time or the
    * join is inside a non-AQE context (streaming microbatches).
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int, probeSaltCol: Column,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2, got $saltBuckets")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted build side preserves only inner/left semantics, got $joinType")
    Seq(probe, build).foreach(df =>
      require(!df.columns.contains("_sj_salt"), "input already has column _sj_salt"))
    val p = probe.withColumn("_sj_salt",
      pmod(xxhash64(probeSaltCol), lit(saltBuckets.toLong)).cast("int"))
    val b = build.withColumn("_sj_salt",
      explode(lit((0 until saltBuckets).toArray)))
    p.join(b, Seq(key, "_sj_salt"), joinType).drop("_sj_salt")
  }

  /** Two-phase salted aggregation for skewed group keys: phase 1 aggregates
    * (key, salt) with `saltBuckets`-way fan-out so one hot key spreads over
    * `saltBuckets` reducers; phase 2 merges the partials per key. Caller
    * supplies the partial aggregates and their merge expressions keyed by
    * output column name, e.g. partial `count(1) as n` merged by `sum(n)`.
    */
  def saltedAggregate(
      df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // salt must be DETERMINISTIC per row content, not per physical layout:
    // spark_partition_id/monotonically_increasing_id change across task
    // retries, so a shuffle-fetch failure could regroup rows inconsistently
    // between the phase-1 map and its recomputation (the classic
    // nondeterministic-repartition over/under-count hazard). A seeded hash
    // of the whole row is retry-stable and spreads a hot key across
    // buckets as long as the key's rows differ anywhere outside the key;
    // fully identical rows share a bucket, which is safe (just less
    // spread) because aggregation is insensitive to which bucket merges
    // them.
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(Relational.hashableCols(df): _*), lit(0x5a17)),
        lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted count per key — the common skew case, pre-wired. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, keys, saltBuckets,
      partial = Seq(count(lit(1)).as("_partial_n")),
      merge = Seq(sum(col("_partial_n")).as("n")))

  // NOTE (r14 skew rung, negative finding worth keeping): exact
  // COUNT(DISTINCT v) GROUP BY k needs NO salting — Spark's two-phase
  // distinct plan already exchanges the dedup stage on (k, v)
  // (verified: Exchange hashpartitioning(key, value) under the partial
  // distinct), so a hot key's value set is natively spread across
  // reducers and only (k, partial_count) rows ride the second, k-keyed
  // exchange. The salting operators below exist for the shapes Spark
  // does NOT spread: the shuffled equi-join's probe clustering
  // ([[saltedJoin]]) and hot-key heavy-state aggregation, where the
  // bucketed order-statistics path ([[percentileContExact]]) is the
  // skew-robust form of a per-key sort window.

  /** Top-k rows per group by a double score (largest first, ties by
    * smallest id) via the bounded-buffer aggregate
    * [[graft.functions.Aggregators.TopKPairs]]: partial aggregation ships
    * ≤ k pairs per group per map task, vs a ranking window which shuffles
    * and sorts every row of every group. Returns (groupCols…, id, score,
    * rank 1..k).
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String, k: Int): DataFrame = {
    val topk = org.apache.spark.sql.functions.udaf(new graft.functions.Aggregators.TopKPairs(k))
    // null scores / null-castable ids cannot rank and would hit the
    // aggregator's non-nullable tuple encoder at runtime — excluded, the
    // same posture as a ranking window's implicit null ordering-out
    df.filter(col(scoreCol).cast("double").isNotNull &&
        col(idCol).cast("long").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("_top"))
      .select((groupCols.map(col) :+ posexplode(col("_top"))): _*)
      .select(
        (groupCols.map(col) ++ Seq(
          col("col._2").as(idCol),
          col("col._1").as(scoreCol),
          (col("pos") + 1).as("rank"))): _*)
  }

  /** As-of join (the canonical time-series operator the reference class
    * lacks): for each left row, attach the latest right row with
    * `right.ts <= left.ts` within `tolerance` (same key). Composed as a
    * union-tag + window scan: O((|L|+|R|) log) per key partition, no
    * cross join, no range explosion.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      valueCols: Seq[String], toleranceMs: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // canonical union shape: left rows keep their payload, right rows
    // carry the whole candidate as ONE struct `_r` (ts + values).
    // Forward-filling the struct instead of each column independently is
    // load-bearing: per-column last(..., ignoreNulls) would skip a
    // matched right row's genuinely-null value and splice in an OLDER
    // row's value (possibly from outside the tolerance window) — the
    // struct itself is non-null for every right row, so the fill carries
    // the matched row verbatim, nulls included, exactly like the native
    // plans.AsOfJoin. Null-key and null-ts right rows are excluded up
    // front (they never match, per SQL join semantics and the native
    // operator); null-key left rows simply find no fill.
    val lTagged = left.withColumn("_side", lit(1))
    val rTagged = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(keyCol), col(tsCol), lit(0).as("_side"),
        struct(col(tsCol).as("_ts") +: valueCols.map(c => col(c)): _*).as("_r"))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // tertiary sort on the right payload makes the winner among multiple
    // right rows sharing (key, ts) deterministic (greatest payload wins)
    // instead of shuffle-order-dependent
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc, col("_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("_last_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_r")

    val inTol = col(keyCol).isNotNull && col(tsCol).isNotNull &&
      col("_last_r").isNotNull &&
      (unix_millis(col(tsCol)) - unix_millis(col("_last_r").getField("_ts"))) <= toleranceMs
    valueCols.foldLeft(
      filled.withColumn("asof_ts", when(inTol, col("_last_r").getField("_ts")))) { (df, c) =>
      df.withColumn(s"asof_$c", when(inTol, col("_last_r").getField(c)))
    }.drop("_last_r")
  }

  /** Gap-fill a per-key daily series: emit one row for EVERY day in each
    * key's [min(day), max(day)] span, with `fill` expressions supplying
    * values for the manufactured rows (e.g. zero counts). Shape: the
    * span aggregate is partial+final; densification is a per-key
    * `sequence` + explode (array length = span days — bounded by
    * calendar time, not data volume); the join back to observed rows is
    * an equi-join on (key, day). No windows, no driver materialization.
    */
  def gapFillDaily(
      df: DataFrame, keys: Seq[String], dayCol: String,
      fill: Map[String, Column]): DataFrame = {
    val keyCols = keys.map(col)
    val spans = df.groupBy(keyCols: _*)
      .agg(min(col(dayCol)).as("_d0"), max(col(dayCol)).as("_d1"))
    val dense = spans.select(
      keyCols :+ explode(sequence(col("_d0"), col("_d1"))).as(dayCol): _*)
    val joined = dense.join(df, keys :+ dayCol, "left")
    fill.foldLeft(joined) { case (acc, (c, default)) =>
      acc.withColumn(c, coalesce(col(c), default))
    }
  }

  /** Linear interpolation of missing values in a per-key ordered series
    * (the companion to [[gapFillDaily]]: densify first, then fill the
    * manufactured nulls from the neighbors). For each null `vCol` row,
    * finds the nearest non-null value before and after (two
    * ignoreNulls window passes carrying (t, v) structs — one shuffle on
    * the key, no self-joins) and fills
    * `prev + (next − prev) · (t − tPrev)/(tNext − tPrev)`. Edge rows
    * with no neighbor on one side stay null. `tCol` must be numeric
    * (cast dates to day numbers upstream).
    */
  def interpolateLinear(
      df: DataFrame, keys: Seq[String], tCol: String, vCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val known = when(col(vCol).isNotNull,
      struct(col(tCol).as("_t"), col(vCol).as("_v")))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tCol))
    val prev = last(known, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val next = first(known, ignoreNulls = true)
      .over(w.rowsBetween(1, Window.unboundedFollowing))
    // the fraction divides DOUBLE casts explicitly: an integer tCol would
    // otherwise integer-divide, and the oracle mirror depends on the
    // exact same float expression tree on both engines
    val frac = (col(tCol) - col("_p._t")).cast("double") /
      (col("_n._t") - col("_p._t")).cast("double")
    df.withColumn("_p", prev).withColumn("_n", next)
      .withColumn(vCol,
        when(col(vCol).isNotNull, col(vCol))
          .when(col("_p").isNotNull && col("_n").isNotNull,
            col("_p._v") + (col("_n._v") - col("_p._v")) * frac))
      .drop("_p", "_n")
  }

  /** Bloom-prefiltered join: semi-join reduction for a big probe side
    * joining a (relatively) small build side on `key`. A Bloom filter of
    * the build keys broadcasts as a few MB of task closure; probe rows
    * whose key cannot be in the build set are dropped BEFORE the shuffle,
    * so the exchange carries only (true matches + fpp·non-matches) instead
    * of the whole probe table — the classic semi-join-reduction / runtime-
    * filter technique (Spark's own runtime row-group filtering applies
    * only to scans it plans itself; this composes with any DataFrame).
    *
    * The follow-up join stays EXACT: Bloom false positives survive the
    * prefilter and are eliminated by the real join, so results are
    * identical to `probe.join(build, key, joinType)` for "inner" and
    * "left_semi" (the only types offered — an outer/anti join must see
    * non-matching probe rows, which the prefilter deliberately drops).
    *
    * `build.stat.bloomFilter` runs one partial+final aggregate job whose
    * result (the sketch) returns to the driver — a bounded sketch like
    * tfidf's count, not a data collect.
    */
  def bloomPrefilteredJoin(
      probe: DataFrame, build: DataFrame, key: String,
      joinType: String = "inner",
      expectedBuildKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom prefilter preserves only inner/left_semi semantics, got $joinType")
    val bloom = build.stat.bloomFilter(key, expectedBuildKeys, fpp)
    // native codegen'd probe (graft.functions.BloomMightContain) — stays
    // inside the fused stage instead of fencing it like a scala UDF.
    // Integral keys were inserted as longs by the bloom aggregate, so the
    // widening cast matches insertion exactly. Null keys never join —
    // the probe's null propagates and the Filter drops the row, which is
    // semantics-preserving for inner/semi.
    import org.apache.spark.sql.types._
    val pred: Column = probe.schema(key).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        graft.functions.BloomMightContain.mightContain(col(key).cast(LongType), bloom)
      case StringType | BinaryType =>
        graft.functions.BloomMightContain.mightContain(col(key), bloom)
      case other => throw new IllegalArgumentException(
        s"bloom prefilter supports integral/string/binary keys, got $other")
    }
    probe.filter(pred).join(build, Seq(key), joinType)
  }

  /** Two-pass distribution ranking (NTILE / PERCENT_RANK / CUME_DIST) for
    * LOW-CARDINALITY partition keys — the case where a plain ranking window
    * single-tasks: `Window.partitionBy(k)` with 5 distinct k values sorts
    * 20% of the table in one task each, no matter how many executors exist.
    *
    * Scale shape instead: (1) per-key approx-percentile boundaries split
    * each key into `buckets` value ranges; (2) a tiny (key, bucket) count
    * aggregate (map-side combined; |keys|·buckets rows) prefix-sums into
    * exact global offsets via a window over that tiny frame — fully
    * lazy, no driver collect; (3) the only per-row sort is a window over
    * (key, bucket) — parallelism |keys|·`buckets` instead of |keys| — and
    * rank arithmetic is `offset + row_number`. Results are EXACT: boundary
    * skew from the approximate percentiles only unbalances bucket sizes,
    * never row order, because buckets are value ranges on the first order
    * column and ranks are recovered from exact counted offsets.
    *
    * Requirements: `orderCols` must form a unique total order within each
    * key (tiebreak on a key-unique column), so rank == row_number and
    * percent_rank/cume_dist need no tie handling — the same discipline the
    * dual-engine oracle needs anyway for deterministic window output. The
    * first order column must be numeric non-null (it feeds
    * percentile_approx and the range-bucket predicate). Designed for
    * |keys| up to ~10⁴ (beyond that a plain window already parallelizes
    * and this operator's driver-side count collect stops paying).
    *
    * Appends `tile` (1..numTiles), `pr`, `cd` to `df`'s columns.
    */
  def distributionRanks(
      df: DataFrame, partKey: String, orderCols: Seq[String],
      numTiles: Int = 4, buckets: Int = 64): DataFrame = {
    require(numTiles >= 1 && buckets >= 2, "numTiles >= 1, buckets >= 2")
    Seq("_dr_bnds", "_dr_b", "_dr_off", "_dr_n", "_dr_rn", "_dr_k", "_dr_kk",
        "_dr_kh", "_dr_gb", "tile", "pr", "cd")
      .foreach(c => require(!df.columns.contains(c), s"input already has column $c"))
    val v = col(orderCols.head)

    // pass 1a: interior boundaries per key (approximate is fine — see
    // doc; deliberately NOT the percentile family's fixed-width
    // min/max form: here EVERY bucket's rows get window-sorted in
    // pass 2, so sketch-balanced buckets are the straggler bound for
    // heavy-tailed keys, not just a pruning nicety). The frame doubles
    // as a dense-id dictionary so the two n-row probes below run on
    // LONG keys — the rankTargetedSelect r16 lesson: a string-keyed
    // HashedRelation probe measured ~14× a long-keyed one.
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val W = org.apache.spark.sql.expressions.Window
    val bounds = df.groupBy(col(partKey)).agg(
        percentile_approx(v.cast("double"), lit(qs.toArray), lit(2500)).as("_dr_bnds"))
      .withColumn("_dr_k", row_number().over(W.orderBy(col(partKey))).cast("long"))
    val dict = bounds
      .select(col(partKey).as("_dr_kk"), xxhash64(col(partKey)).as("_dr_kh"),
        col("_dr_k"), col("_dr_bnds"))
    // bucket = count of boundaries <= value, via the native binary-search
    // expression (an `aggregate` fold emits one `when` branch per boundary
    // — measured ~0.7 s/pass at 150k rows × 63 boundaries, Q79Profile).
    // The probe's equi-key is xxhash64(key) — single non-null long —
    // with the true key equality coalesce-wrapped as a residual filter
    // (kept OUT of the equi-keys, see q114) so the inner-join-on-key
    // semantics are exact: null keys drop, collisions only re-check.
    val withB = df
      .join(broadcast(dict), xxhash64(col(partKey)) === col("_dr_kh"))
      .filter(coalesce(col(partKey) <=> col("_dr_kk"), lit(false)))
      .withColumn("_dr_b", graft.functions.UpperBoundCount.upperBoundCount(
        col("_dr_bnds"), v.cast("double")))
      .withColumn("_dr_gb", col("_dr_k") * buckets + col("_dr_b"))
      .drop("_dr_bnds", "_dr_kk", "_dr_kh", "_dr_k")

    // pass 1b: exact (key, bucket) counts -> per-bucket global offsets
    // (prefix sum) and per-key totals. |keys|·buckets rows, so the
    // prefix-sum window runs over a TINY frame — and staying lazy keeps
    // the whole operator one plan: no driver collect, no eager jobs at
    // construction time (the first cut collected counts to the driver
    // and re-paid two build jobs on every re-execution).
    val wOff = W.partitionBy(col("_dr_gb") - col("_dr_b")).orderBy(col("_dr_b"))
    val offDf = withB.groupBy(col("_dr_gb"), col("_dr_b")).count()
      .select(col("_dr_gb"),
        coalesce(sum(col("count")).over(
          wOff.rowsBetween(W.unboundedPreceding, -1)), lit(0L)).as("_dr_off"),
        sum(col("count")).over(
          wOff.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
          .as("_dr_n"))

    // pass 2: the only per-row sort — window over the fused (key, bucket)
    // long (bijective with the old (key, bucket) pair)
    val w = W.partitionBy(col("_dr_gb")).orderBy(orderCols.map(col): _*)
    val rn = col("_dr_rn"); val n = col("_dr_n")
    // NTILE from (rn, n): first n%k tiles get floor(n/k)+1 rows. Integral
    // DIV keeps exactness for n beyond double's 2^53 mantissa.
    val q = expr(s"_dr_n DIV $numTiles"); val r = expr(s"_dr_n % $numTiles")
    withB.join(broadcast(offDf), Seq("_dr_gb"))
      .withColumn("_dr_rn", col("_dr_off") + row_number().over(w))
      .withColumn("tile",
        when(rn <= r * (q + 1), expr(s"(_dr_rn + (_dr_n DIV $numTiles)) DIV ((_dr_n DIV $numTiles) + 1)"))
          .otherwise(expr(
            s"(_dr_n % $numTiles) + (_dr_rn - (_dr_n % $numTiles) * ((_dr_n DIV $numTiles) + 1) + (_dr_n DIV $numTiles) - 1) DIV (_dr_n DIV $numTiles)"))
          .cast("int"))
      .withColumn("pr",
        when(n === 1, lit(0.0)).otherwise((rn - 1).cast("double") / (n - 1)))
      .withColumn("cd", rn.cast("double") / n)
      .drop("_dr_b", "_dr_gb", "_dr_off", "_dr_n", "_dr_rn")
  }

  /** Exact interpolated percentiles (percentile_cont semantics) for
    * LOW-CARDINALITY group keys, without per-group value buffering.
    *
    * Spark's built-in `percentile_cont` materializes EVERY group value in
    * the aggregation buffer — per-group state linear in the table, the
    * one aggregate shape that OOMs a 100 TB run when the key has a
    * handful of values (q92: 3 order statuses over all of orders). This
    * operator reuses the [[distributionRanks]] bucketing discipline and
    * adds rank-targeted pruning:
    *
    *   1. per-key approx-percentile boundaries split each key's values
    *      into `buckets` ranges; exact (key, bucket) counts prefix-sum
    *      into global offsets and totals — a |keys|·`buckets`-row frame;
    *   2. each requested fraction p needs only ranks
    *      ⌊p·(n−1)⌋+1 and ⌊p·(n−1)⌋+2 (1-based); buckets whose exact
    *      [offset+1, offset+count] rank range contains NO needed rank are
    *      DROPPED before the per-row sort — the inner join against the
    *      kept-bucket frame prunes ~(1 − 2·|ps|/buckets) of the data;
    *   3. the only per-row sort is a row_number window over the ≤2·|ps|
    *      surviving (key, bucket) slices; value-at-rank rows feed the
    *      closed-form interpolation lo + (p·(n−1) − ⌊p·(n−1)⌋)·(hi − lo).
    *
    * Exactness: boundary skew from the approximate percentiles shifts
    * bucket SIZES, never value order, and ranks come from exact counted
    * offsets — so the selected order statistics are exact. Ties are
    * harmless: row_number breaks them arbitrarily, but equal ranks map to
    * equal values. The fractional index p·(n−1) is computed in doubles,
    * the same IEEE arithmetic Spark's and DuckDB's percentile_cont use,
    * so ⌊·⌋ lands on the same rank cross-engine. NULL values are
    * excluded, matching percentile_cont on both engines; a key whose
    * values are all NULL yields no row (as does the built-in).
    *
    * Returns one row per key: (`partKey`, ps.map(_._1)) with double
    * percentile columns.
    */
  def percentileContExact(
      df: DataFrame, partKey: String, valueCol: String,
      ps: Seq[(String, Double)], buckets: Int = 256,
      bounds: Option[DataFrame] = None): DataFrame = {
    val n = col("_pc_n")
    def kLo(p: Double): Column = floor(lit(p) * (n - 1).cast("double")).cast("long") + 1
    def kHi(p: Double): Column = least(kLo(p) + 1, n)
    rankTargetedSelect(df, partKey, valueCol, ps, buckets,
      neededRanks = p => Seq(kLo(p), kHi(p)),
      finalAgg = { (name, p, rn) =>
        val lo = max(when(rn === kLo(p), col("_pc_v")))
        val hi = max(when(rn === kHi(p), col("_pc_v")))
        val idx = lit(p) * (max(n) - 1).cast("double")
        (lo + (idx - floor(idx)) * (coalesce(hi, lo) - lo)).as(name)
      },
      bounds = bounds)
  }

  /** Exact DISCRETE percentiles (percentile_disc semantics) with the same
    * bucketed rank-targeted plan as [[percentileContExact]] — the q48
    * twin of the q92 rewrite. Selection follows the built-in exactly: the
    * smallest value whose cumulative distribution k/n (computed in
    * doubles, as both engines do) reaches p — NOT ⌈p·n⌉, whose double
    * product can land one ulp above an exact integer (p = 0.7, n = 10:
    * 0.7·10 = 7.000000000000001, yet 7/10 ≥ 0.7 holds in doubles) and
    * select the wrong order statistic.
    */
  def percentileDiscExact(
      df: DataFrame, partKey: String, valueCol: String,
      ps: Seq[(String, Double)], buckets: Int = 256): DataFrame = {
    val n = col("_pc_n")
    // smallest k with k/n >= p: probe ceil(p·n) ± 1 with the double
    // cume_dist comparison itself (all three candidates, clamped to [1,n])
    def kDisc(p: Double): Column = {
      val k0 = greatest(ceil(lit(p) * n.cast("double")).cast("long"), lit(1L))
      when((k0 - 1) >= 1 && (k0 - 1).cast("double") / n.cast("double") >= p, k0 - 1)
        .otherwise(when(k0.cast("double") / n.cast("double") >= p, k0)
          .otherwise(least(k0 + 1, n)))
    }
    rankTargetedSelect(df, partKey, valueCol, ps, buckets,
      neededRanks = p => Seq(kDisc(p)),
      finalAgg = (name, p, rn) => max(when(rn === kDisc(p), col("_pc_v"))).as(name))
  }

  /** Pass 1a of the rank-targeted percentile plan, exposed so callers
    * that run SEVERAL percentile passes over related columns (q127's
    * med-then-MAD) can pay the per-row percentile_approx sketch ONCE and
    * derive later passes' boundaries from the first's (boundaries only
    * steer bucket balance — exactness never depends on them, see
    * [[percentileContExact]]). Returns (`partKey`, `_pc_bnds`:
    * array<double> of the `buckets`−1 interior approximate boundaries).
    */
  def approxBounds(
      df: DataFrame, partKey: String, valueCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    val qs = (1 until buckets).map(_.toDouble / buckets)
    df.filter(col(valueCol).isNotNull)
      .select(col(partKey), col(valueCol).cast("double").as("_pc_v"))
      .groupBy(col(partKey)).agg(
        percentile_approx(col("_pc_v"), lit(qs.toArray), lit(2500)).as("_pc_bnds"))
  }

  /** Fixed-width split points from a per-key min/max aggregate — the
    * DEFAULT pass 1a (r8): the percentile_approx sketch was the
    * dominant PER-ROW cost of the whole percentile plan (~1 µs/row
    * measured at 10× data; a min/max agg is a vectorized no-op), and
    * exactness never depends on where the splits fall — skew only
    * grows the kept-bucket sort slices of pass 2. Heavy-tailed value
    * distributions that would collapse most mass into one fixed-width
    * bucket can pass [[approxBounds]] explicitly. A key with hi == lo
    * gets no interior splits (single bucket — same degenerate shape the
    * sketch path produced).
    */
  def uniformBounds(
      df: DataFrame, partKey: String, valueCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    df.filter(col(valueCol).isNotNull)
      .select(col(partKey), col(valueCol).cast("double").as("_pc_v"))
      .groupBy(col(partKey))
      .agg(min(col("_pc_v")).as("_pc_lo"), max(col("_pc_v")).as("_pc_hi"))
      .select(col(partKey),
        when(col("_pc_hi") > col("_pc_lo"),
          transform(sequence(lit(1), lit(buckets - 1)),
            i => col("_pc_lo") +
              (col("_pc_hi") - col("_pc_lo")) * i / lit(buckets.toDouble)))
          .otherwise(array().cast("array<double>")).as("_pc_bnds"))
  }

  /** Per-key (min, max) range frame for ARITHMETIC fixed-width
    * bucketization — the r15 default pass 1a. Versus [[uniformBounds]]'
    * materialized split array, the bucket index becomes one
    * multiply-free-ish expression (`floor((v − lo) · B / (hi − lo))`,
    * clamped) instead of a 255-element binary search per row — measured
    * 2× off the q127 bucketize pass at 100×. Split placement still only
    * steers bucket balance, never exactness.
    */
  def uniformRange(
      df: DataFrame, partKey: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(partKey), col(valueCol).cast("double").as("_pc_v"))
      .groupBy(col(partKey))
      .agg(min(col("_pc_v")).as("_pc_lo"), max(col("_pc_v")).as("_pc_hi"))

  /** Shared core of [[percentileContExact]]/[[percentileDiscExact]]:
    * bucket values per key by approx-percentile boundaries, recover exact
    * global offsets from (key, bucket) counts, DROP every bucket holding
    * none of the needed ranks, sort only the kept slices, and aggregate
    * the value-at-rank rows. `neededRanks`/`finalAgg` receive columns
    * that may reference `_pc_n` (per-key total) and `_pc_rn` (exact
    * global rank). `bounds`, when given, is a per-key frame in either
    * shape: (`partKey`, `_pc_lo`, `_pc_hi`) for arithmetic fixed-width
    * bucketization ([[uniformRange]], the r15 default), or (`partKey`,
    * `_pc_bnds` array<double>) of SORTED split points (the
    * [[approxBounds]] heavy-tail path) — any splits work (skew costs
    * only pass-2 sort size). The frame MUST cover every key present in
    * `df` (every construction in this repo derives it from `df` itself,
    * so it does by construction); a missing key raises at execution
    * instead of silently degrading.
    *
    * r16 key-encoding: the n-row passes probe broadcast hash relations
    * twice per call (bounds attach, kept-bucket attach). A STRING-keyed
    * HashedRelation probe measured ~14× slower than a long-keyed one
    * (1.13 s vs 0.17 s per 15M-row pass at the 100× rung — generic
    * UnsafeHashedRelation vs LongHashedRelation), so the bounds frame
    * now carries a dense long id `_pc_k` (row_number over the |keys|-row
    * frame — bounded by the very broadcast it rides), the bounds probe
    * attaches it once, and every later keyed step — (key, bucket)
    * counts, the kept-bucket probe (fused single long `_pc_k·B + b`),
    * the rank window — runs on longs. The original key column rides
    * only the pass-2 hits slice (kept rows), so the output shape is
    * unchanged.
    */
  private def rankTargetedSelect(
      df: DataFrame, partKey: String, valueCol: String,
      ps: Seq[(String, Double)], buckets: Int,
      neededRanks: Double => Seq[Column],
      finalAgg: (String, Double, Column) => Column,
      bounds: Option[DataFrame] = None): DataFrame = {
    require(ps.nonEmpty, "at least one percentile")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "fractions must be in [0, 1]")
    require(buckets >= 2, "buckets >= 2")
    Seq("_pc_v", "_pc_b", "_pc_c", "_pc_off", "_pc_n", "_pc_rn", "_pc_bnds",
        "_pc_k", "_pc_kk", "_pc_kh", "_pc_gb")
      .foreach(c => require(!df.columns.contains(c), s"input already has column $c"))
    val W = org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(valueCol).isNotNull)
      .select(col(partKey), col(valueCol).cast("double").as("_pc_v"))

    // pass 1a: interior boundaries per key (any splits are fine — see
    // doc); arithmetic fixed-width from min/max by default (r15),
    // caller-provided otherwise (shared ranges, heavy-tail approxBounds).
    // The dense-id window is single-partition over the |keys|-row frame —
    // the same O(|keys|) bound as the broadcast itself (census-pinned).
    val bnds = bounds.getOrElse(uniformRange(df, partKey, valueCol))
    val dict = bnds
      .withColumn("_pc_k", row_number().over(W.orderBy(col(partKey))).cast("long"))
      .withColumnRenamed(partKey, "_pc_kk")
    // a key the bounds frame does not cover would silently merge into the
    // null id — fail loudly instead (the null KEY group keeps working: it
    // has its own bounds row and its own id).
    // The probe itself is on xxhash64(key) — a SINGLE NON-NULL LONG key
    // (LongHashedRelation), because a null-safe string condition compiles
    // to the composite (coalesce, isnull) key pair and a generic
    // UnsafeHashedRelation probe, the exact slow path this encoding
    // exists to remove. The null-safe key check runs as a post-join
    // filter on the (rare) hash-equal rows, so a 64-bit collision between
    // two distinct keys costs one dropped duplicate, never a wrong match.
    val missing = raise_error(lit(
      s"percentile bounds frame does not cover every $partKey")).cast("int")
    val encoded = base
      .join(broadcast(dict.withColumn("_pc_kh", xxhash64(col("_pc_kk")))),
        xxhash64(col(partKey)) === col("_pc_kh"), "left")
      .filter(col("_pc_kk").isNull || (col(partKey) <=> col("_pc_kk")))
    val withB =
      if (bnds.columns.contains("_pc_lo")) {
        // arithmetic path: bucket = clamp(floor((v − lo)·B/(hi − lo)))
        // — no per-row array search, and the broadcast carries two
        // doubles per key instead of a buckets-1 array
        encoded.select(col(partKey), col("_pc_k"), col("_pc_v"),
          when(col("_pc_k").isNull, missing)
            .otherwise(when(col("_pc_lo").isNull || !(col("_pc_hi") > col("_pc_lo")),
              lit(0))
            .otherwise(least(greatest(
              floor((col("_pc_v") - col("_pc_lo")) * buckets /
                (col("_pc_hi") - col("_pc_lo"))).cast("int"),
              lit(0)), lit(buckets - 1)))).as("_pc_b"))
      } else {
        encoded.select(col(partKey), col("_pc_k"), col("_pc_v"),
          when(col("_pc_k").isNull, missing)
            .otherwise(when(col("_pc_bnds").isNull, lit(0))
            .otherwise(graft.functions.UpperBoundCount.upperBoundCount(
              col("_pc_bnds"), col("_pc_v")))).as("_pc_b"))
      }

    // pass 1b: exact (key, bucket) counts -> offsets + totals, then DROP
    // every bucket holding no needed rank (the pruning step distribution-
    // Ranks cannot do — it needs every row ranked; percentiles need a
    // handful of ranks). (r8 note: a one-exchange |keys|-row histogram
    // aggregate of `buckets` conditional sums was tried here and measured
    // SLOWER — 2.05 s vs 1.37 s on q127 — the 64-wide agg buffer costs
    // more per row than the tiny extra exchange saves in stages.)
    val wOff = W.partitionBy(col("_pc_k")).orderBy(col("_pc_b"))
    val off = col("_pc_off")
    val cnts = withB.groupBy(col("_pc_k"), col("_pc_b"))
      .agg(count(lit(1)).as("_pc_c"))
      .select(col("_pc_k"), col("_pc_b"), col("_pc_c"),
        coalesce(sum(col("_pc_c")).over(
          wOff.rowsBetween(W.unboundedPreceding, -1)), lit(0L)).as("_pc_off"),
        sum(col("_pc_c")).over(
          wOff.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
          .as("_pc_n"))
    val bucketNeeded = ps.flatMap { case (_, p) =>
      neededRanks(p).map(k => k > off && k <= off + col("_pc_c"))
    }.reduce(_ || _)
    val kept = cnts.filter(bucketNeeded)
      .select((col("_pc_k") * buckets + col("_pc_b")).as("_pc_gb"),
        col("_pc_off"), col("_pc_n"))

    // pass 2: per-row sort over ONLY the kept (key, bucket) slices —
    // probed by the fused long key (LongHashedRelation, see scaladoc)
    val w = W.partitionBy(col("_pc_gb")).orderBy(col("_pc_v"))
    val rn = col("_pc_rn")
    val rankNeeded = ps.flatMap { case (_, p) =>
      neededRanks(p).map(k => rn === k)
    }.reduce(_ || _)
    val hits = withB
      .select(col(partKey), col("_pc_v"),
        (col("_pc_k") * buckets + col("_pc_b")).as("_pc_gb"))
      .join(broadcast(kept), Seq("_pc_gb"))
      .withColumn("_pc_rn", off + row_number().over(w))
      .filter(rankNeeded)

    val aggs = ps.map { case (name, p) => finalAgg(name, p, rn) }
    hits.groupBy(col(partKey)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact bitmap-pruned semi/anti join on an INTEGRAL key (r14, the
    * q09 100× rung): the build side folds into one Roaring bitmap via
    * [[graft.functions.BitmapDistinct.build]] — each partition dedups
    * locally, the exchange carries one serialized bitmap per partition
    * (hundreds of KB for millions of clustered surrogate keys) — and
    * the probe side filters MAP-SIDE on `bitmap_contains`. Versus the
    * shuffle anti join this removes BOTH heavy exchanges: the build's
    * per-key distinct shuffle (partial distinct is useless when keys
    * barely repeat within a partition — the exact regime where the
    * bitmap's local dedup wins) and the probe's clustering shuffle
    * (the probe never moves at all).
    *
    * Exactness: bitmap membership is exact presence (not a Bloom
    * sketch — no false positives), so results are identical to
    * LEFT SEMI / LEFT ANTI on key equality; NULL build keys are
    * skipped and NULL probe keys test FALSE, matching EXISTS /
    * NOT EXISTS equality semantics on both sides.
    *
    * Scale gate (r15, pre-flight): `maxBytes` (default 64 MB, the
    * conventional broadcast ceiling) is enforced INSIDE the build
    * aggregate — [[graft.functions.BitmapBuild]] carries a sticky
    * overflow flag, trips it on the executor the moment any partial
    * or merge exceeds the cap (dropping that buffer's memory), and
    * evaluates to NULL — so a pathological sparse 64-bit key domain
    * (Roaring degrades toward 8 B/key there, vs ~2 bits/key on dense
    * surrogate ranges) never materializes past the cap anywhere, the
    * driver included. On the NULL signal this falls back to the plain
    * shuffle semi/anti join: the exact same results at shuffle cost.
    *
    * NOTE this runs an EAGER Spark job at DataFrame-composition time
    * (the build aggregate must finish before the probe plan exists —
    * same class as an ANN codebook collect); compose it lazily only
    * behind a def. The collected bytes re-ship to probe tasks as a
    * BROADCAST variable, not a plan Literal, so each stage's task
    * binary stays small and the deserialized bitmap is shared
    * per-executor.
    */
  def bitmapSteeredJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column, anti: Boolean,
      maxBytes: Long = 64L << 20): DataFrame = {
    import graft.functions.BitmapDistinct
    val bytes = build.agg(BitmapDistinct.build(buildKey, maxBytes).as("_bm"))
      .head().getAs[Array[Byte]](0)
    if (bytes != null) {
      val bc = probe.sparkSession.sparkContext.broadcast(bytes)
      val c = BitmapDistinct.containsBroadcast(probeKey, bc)
      probe.filter(if (anti) !c else c)
    } else {
      probe.join(build.select(buildKey.as("_bk")).distinct(),
        probeKey === col("_bk"), if (anti) "left_anti" else "left_semi")
    }
  }

  def bitmapAntiJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column): DataFrame =
    bitmapSteeredJoin(probe, probeKey, build, buildKey, anti = true)

  def bitmapSemiJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column): DataFrame =
    bitmapSteeredJoin(probe, probeKey, build, buildKey, anti = false)
}
