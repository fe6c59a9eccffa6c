package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass data-quality metrics.
  *
  * [[graft.music.Constraints]] audits run as their own jobs — the right
  * tool for gating a load. This is the complementary production shape:
  * `observe()` piggybacks aggregate metrics onto the MAIN action's
  * execution (CollectMetrics operator), so a 100 TB write gets row
  * counts and null tallies for free — no second scan, no sampling, and
  * the numbers describe exactly the rows the action processed.
  */
object Quality {

  /** Attach row-count + per-column null-count (+ optional numeric
    * min/max) metrics to `df`. Returns the instrumented frame and the
    * [[Observation]] handle; metrics materialize when the caller runs an
    * action on the returned frame (`obs.get` then blocks until done).
    */
  def observeQuality(
      df: DataFrame, nullCols: Seq[String],
      rangeCols: Seq[String] = Nil): (DataFrame, Observation) = {
    val obs = Observation()
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        (nullCols.map(c => sum(col(c).isNull.cast("long")).as(s"${c}_nulls")) ++
          rangeCols.flatMap(c => Seq(
            min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
