package graft.queries

import graft.SparkSpec
import graft.tools.PlanReport

/** Whole-inventory plan budget: every SparkEntry query's INITIAL physical
  * plan (planning only, AQE wrapper bypassed via a no-AQE audit run)
  * stays inside coarse scale-safety budgets. PlanAuditSpec spot-checks
  * the load-bearing plans in depth; this census is the regression net
  * that catches a shuffle or nested-loop join sneaking into ANY declared
  * query.
  */
class PlanCensusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // declared exceptions, each with its reason:
  //  - q10_range_join: the NAIVE theta/range join kept as the semantic
  //    baseline; q10b is the bucketed scale path (SURVEY B3)
  //  - q28_knn_brute: brute-force exact KNN, the declared O(N·Q) recall
  //    baseline the ANN paths are measured against
  //  - q62_unigram_ppx: a 1-row scalar broadcast (corpus token total)
  //    — a "nested loop" over exactly one build row
  //  - q72_cosine_dedup: Dedup.embeddingNearDupPairsExact, the declared
  //    exhaustive exact baseline; the banded-LSH scale path
  //    (embeddingNearDupPairs) is equi-join-only and pinned pair-set-
  //    identical to it in DedupSpec
  //  - q77_bm25: a 1-row scalar broadcast (corpus N + avgdl) — the same
  //    single-build-row class as q62
  private val loopOk = Set("q10_range_join", "q28_knn_brute", "q62_unigram_ppx",
    "q72_cosine_dedup", "q77_bm25")
  // media queries read generated in-memory bytes, not parquet — there is
  // no scan to push filters into; q83's seed scan is an unplanned logical
  // Relation nested inside UnionLoop (recursive CTEs plan each iteration
  // lazily at execution), so the initial-plan census structurally sees
  // scans=0 — PlanOne shows the seed already projects only c_custkey
  private val noScan = Set("q36_media_features", "q56_image_dedup",
    "q57_audio_dedup", "q58_video_dedup", "q66_mp4avi_dedup",
    "q83_recursive_cte")

  test("all plans: bounded shuffles, no stray nested-loop joins, pushdown present") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val c = PlanReport.census(fn(spark, dir).queryExecution.executedPlan)
          val errs = Seq(
            (c.shuffles > 8) -> s"$name: ${c.shuffles} shuffles (> 8)",
            (c.loops > 0 && !loopOk(name)) -> s"$name: ${c.loops} nested-loop/cartesian joins",
            (!c.pushed && !noScan(name)) -> s"$name: no parquet filter/scan pushdown")
          errs.collect { case (true, msg) => msg }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
