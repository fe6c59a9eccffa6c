package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental distinct-count rollups via mergeable HLL sketches
  * (Spark's built-in Apache DataSketches integration).
  *
  * The 100 TB pattern: computing COUNT(DISTINCT user) over an arbitrary
  * date range by rescanning raw events costs a full pass per question.
  * Instead, sketch each ingest partition ONCE at write time (one
  * partial+final agg, a few KB per group), persist the sketch column,
  * and answer any superset rollup — weekly, monthly, all-time, per
  * segment — by merging sketches: bytes instead of terabytes, and the
  * merge is associative so it parallelizes and re-rolls freely.
  * Merging N partial sketches of the same lgK is exact with respect to
  * one sketch built over the union — the estimate degrades only with
  * HLL's intrinsic error (~1.6% at lgK=12), never with the split
  * (pinned in SketchesSpec).
  */
object Sketches {

  /** Build one HLL sketch of `valueCol` per `keys` group (e.g. per
    * ingest day). `lgK` = log2 of the register count: 12 → 4 KB sketch,
    * ~1.6% relative standard error. All sketches that will ever be
    * merged must share `lgK` — fix it once per metric at schema time.
    */
  def sketchBy(df: DataFrame, keys: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as(s"${valueCol}_sketch"))

  /** Roll partial sketches up to a coarser grouping (or `Seq.empty` for
    * a grand total) WITHOUT touching raw data — the merge shuffles only
    * sketch bytes.
    */
  def mergeSketches(sketches: DataFrame, keys: Seq[String],
                    sketchCol: String): DataFrame = {
    val m = hll_union_agg(col(sketchCol)).as(sketchCol)
    if (keys.isEmpty) sketches.agg(m)
    else sketches.groupBy(keys.map(col): _*).agg(m)
  }

  /** Distinct-count estimate from a (possibly merged) sketch. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
