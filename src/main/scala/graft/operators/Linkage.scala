package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage joins: set-similarity / string-similarity self-joins
  * that never go all-pairs (LLM-pipeline extension beyond SURVEY §2 —
  * fuzzy near-identical record collapse, quote/containment detection).
  *
  * == Edit-distance self-join (PassJoin partitioning) ==
  *
  * The lossless pruning is the PassJoin pigeonhole (Li, Deng, Feng 2011,
  * public literature): split every string into τ+1 contiguous segments —
  * if dist(s, t) ≤ τ, at least one segment of s appears EXACTLY as a
  * substring of t, shifted by at most τ. So:
  *
  *   - segment side: each string yields τ+1 (srcLen, segIdx, segText)
  *     keys — O(τ) fan-out;
  *   - probe side: each string yields, for each candidate source length
  *     l ∈ [len±τ] and segment index i, the substrings of matching
  *     length at starts within ±τ of the segment position — O(τ³)
  *     fan-out, constant for fixed τ;
  *   - candidates come from the EQUI-join on (srcLen, segIdx, text) —
  *     hash-partitionable, AQE-splittable, never a cartesian product;
  *   - each distinct candidate pair is verified with `levenshtein`.
  *
  * The shuffle carries (key, id, string) rows; strings in linkage
  * workloads are short identifiers/names, so this is bytes per row, and
  * candidate volume is driven by true near-duplicate density, not N².
  * Zero-length segments (strings shorter than τ+1) degrade gracefully:
  * the empty segment keys on (srcLen, segIdx) only, which is exactly the
  * tiny length-bucket bruteforce the pigeonhole requires there.
  *
  * Common-prefix caveat: keys sharing a long identical region (serial
  * numbers, `Supplier#0000…`) make that region's segment a hot join key —
  * candidates degrade toward all-pairs (measured: TPC-H supplier names,
  * where segment 0 is identical corpus-wide, cost ≈ brute force). No
  * exact-substring filter can prune inputs whose segments carry no
  * entropy; strip or rotate the constant region into a discriminative
  * form first (the salting analogue for similarity joins).
  */
object Linkage {

  /** All unordered pairs (a < b by id) within Levenshtein distance `tau`.
    * Returns (id_a, id_b, str_a, str_b, dist).
    */
  def editDistanceSelfJoin(
      df: DataFrame, idCol: String, strCol: String, tau: Int): DataFrame = {
    require(tau >= 1 && tau <= 4, "tau must be in [1, 4] (probe fan-out is O(tau^3))")
    val k = tau + 1
    // deterministic segment geometry, derived from the source length only
    // (both sides must agree): base-length segments first, the last
    // (l mod k) segments one longer
    def segLen(l: Column, i: Int): Column = {
      val base = floor(l / k).cast("int")
      val extra = pmod(l, lit(k))
      base + (lit(i) >= (lit(k) - extra)).cast("int")
    }
    def segStart(l: Column, i: Int): Column = {
      val base = floor(l / k).cast("int")
      val extra = pmod(l, lit(k))
      lit(i) * base + greatest(lit(0), lit(i) - (lit(k) - extra))
    }
    val s = df.select(col(idCol).cast("long").as("_ed_id"),
      col(strCol).as("_ed_s"), length(col(strCol)).as("_ed_l"))
    // segment side: one row per (string, segment)
    val segs = s.select(col("_ed_id"), col("_ed_s"), col("_ed_l"),
        explode(array((0 until k).map(lit): _*)).as("_ed_i"))
      .select(col("_ed_id"), col("_ed_s"), col("_ed_l"), col("_ed_i"),
        element_at(array((0 until k).map(i =>
          col("_ed_s").substr(segStart(col("_ed_l"), i) + 1,
            segLen(col("_ed_l"), i))): _*), col("_ed_i") + 1).as("_ed_txt"))
    // probe side: candidate source lengths l ∈ [len−τ, len+τ], all
    // window-shifted substrings per segment index
    val probes = s.select(col("_ed_id").as("_ed_pid"), col("_ed_s").as("_ed_t"),
        col("_ed_l").as("_ed_lt"),
        explode(sequence(greatest(col("_ed_l") - tau, lit(0)),
          col("_ed_l") + tau)).as("_ed_lsrc"))
      .select(col("*"), explode(array((0 until k).map(lit): _*)).as("_ed_pi"))
      .select(col("_ed_pid"), col("_ed_t"), col("_ed_lt"), col("_ed_lsrc"), col("_ed_pi"),
        element_at(array((0 until k).map(i =>
          struct(segStart(col("_ed_lsrc"), i).as("p"),
            segLen(col("_ed_lsrc"), i).as("n"))): _*), col("_ed_pi") + 1).as("_ed_g"))
      .select(col("_ed_pid"), col("_ed_t"), col("_ed_lt"), col("_ed_lsrc"), col("_ed_pi"),
        col("_ed_g.n").as("_ed_n"),
        // Spark's sequence(a, b) runs DESCENDING when a > b — an empty
        // window must become an empty array, not a reversed one
        explode(when(
          greatest(col("_ed_g.p") - tau, lit(0)) <=
            least(col("_ed_g.p") + tau, col("_ed_lt") - col("_ed_g.n")),
          sequence(greatest(col("_ed_g.p") - tau, lit(0)),
            least(col("_ed_g.p") + tau, col("_ed_lt") - col("_ed_g.n"))))
          .otherwise(array().cast("array<int>"))).as("_ed_p"))
      .select(col("_ed_pid"), col("_ed_t"), col("_ed_lsrc"), col("_ed_pi"),
        col("_ed_t").substr(col("_ed_p") + 1, col("_ed_n")).as("_ed_sub"))
    val cand = segs.join(probes,
        col("_ed_l") === col("_ed_lsrc") && col("_ed_i") === col("_ed_pi") &&
        col("_ed_txt") === col("_ed_sub") && col("_ed_id") =!= col("_ed_pid"))
      .select(
        least(col("_ed_id"), col("_ed_pid")).as("id_a"),
        greatest(col("_ed_id"), col("_ed_pid")).as("id_b"),
        when(col("_ed_id") < col("_ed_pid"), col("_ed_s")).otherwise(col("_ed_t")).as("str_a"),
        when(col("_ed_id") < col("_ed_pid"), col("_ed_t")).otherwise(col("_ed_s")).as("str_b"))
      .distinct()
    cand.withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= tau)
  }

  /** Shingle-containment self-join: unordered pairs whose DISTINCT
    * n-gram containment max(|A∩B|/|A|, |A∩B|/|B|) ≥ `minContainment` —
    * the "document quoted/embedded inside another" detector that Jaccard
    * similarity misses when sizes differ (Broder 1997's containment).
    *
    * Scale shape: distinct shingles per doc → inverted-index equi-join
    * on the shingle → per-pair overlap counts (map-side combinable agg) —
    * the q71 posture; candidate volume is bounded by shared-shingle
    * density, never all-pairs. Shingle sets per doc are deduped BEFORE
    * the join so hot documents contribute each gram once.
    */
  def containmentSelfJoin(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minContainment: Double): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minContainment > 0 && minContainment <= 1,
      "minContainment must be in (0, 1]")
    // r8: the self-join shuffles carry 8-byte gram fingerprints instead
    // of gram strings, and the grams are never materialized as strings
    // at all (ngramFingerprints: fused single-pass tokenize + per-token
    // hash + chained window hash). A fingerprint collision — p ≈
    // |grams|²/2⁶⁵ — can nudge one overlap count or one doc size by one.
    val grams = df.select(col(idCol).cast("long").as("_cn_id"),
        explode(TextAnalysis.ngramFingerprints(col(textCol), n)).as("_cn_g"))
    val sizes = grams.groupBy(col("_cn_id"))
      .agg(count(lit(1)).as("_cn_sz"))
    val pairs = grams.select(col("_cn_id").as("_cn_a"), col("_cn_g"))
      .join(grams.select(col("_cn_id").as("_cn_b"), col("_cn_g")), Seq("_cn_g"))
      .filter(col("_cn_a") < col("_cn_b"))
      .groupBy(col("_cn_a"), col("_cn_b"))
      .agg(count(lit(1)).as("_cn_ov"))
    pairs
      .join(sizes.withColumnRenamed("_cn_id", "_cn_a")
        .withColumnRenamed("_cn_sz", "_cn_sza"), Seq("_cn_a"))
      .join(sizes.withColumnRenamed("_cn_id", "_cn_b")
        .withColumnRenamed("_cn_sz", "_cn_szb"), Seq("_cn_b"))
      .select(col("_cn_a").as("id_a"), col("_cn_b").as("id_b"),
        col("_cn_ov").as("overlap"),
        greatest(col("_cn_ov") / col("_cn_sza"),
          col("_cn_ov") / col("_cn_szb")).as("containment"))
      .filter(col("containment") >= minContainment)
  }
}
