package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  lazy val events = graft.core.Tables.loadEvents(spark, "/root/testdata/sf0.01")
    .withColumn("day", to_date(col("event_time")))

  test("per-day sketches merge to the same estimate as one whole-range sketch") {
    val daily = Sketches.sketchBy(events, Seq("day"), "user_id")
    val merged = Sketches.mergeSketches(daily, Seq.empty, "user_id_sketch")
      .select(Sketches.estimate(col("user_id_sketch")).as("est"))
      .as[Long].head()
    val direct = Sketches.sketchBy(events.withColumn("all", lit(1)), Seq("all"), "user_id")
      .select(Sketches.estimate(col("user_id_sketch")).as("est"))
      .as[Long].head()
    // the merge is exact w.r.t. splitting: same registers either way
    assert(merged == direct, s"merged $merged != direct $direct")
    // and the estimate lands within HLL error of the true distinct count
    val exact = events.select("user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("partial rollup: day sketches → week groups without raw rescans") {
    val daily = Sketches.sketchBy(events, Seq("day"), "user_id")
      .withColumn("week", weekofyear(col("day")))
    val weekly = Sketches.mergeSketches(daily, Seq("week"), "user_id_sketch")
      .select(col("week"), Sketches.estimate(col("user_id_sketch")).as("est"))
      .as[(Int, Long)].collect().toMap
    val exactWeekly = events.withColumn("week", weekofyear(col("day")))
      .groupBy("week").agg(countDistinct("user_id").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(weekly.keySet == exactWeekly.keySet)
    weekly.foreach { case (w, est) =>
      val exact = exactWeekly(w)
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"week $w: estimate $est vs exact $exact")
    }
  }

  test("sketch column is compact (bytes, not data volume)") {
    val daily = Sketches.sketchBy(events, Seq("day"), "user_id", lgK = 12)
    val maxLen = daily.select(max(length(col("user_id_sketch"))))
      .head().getInt(0)
    // lgK=12 → 4 KiB registers + header; far below row-data scale
    assert(maxLen <= 8192, s"sketch unexpectedly large: $maxLen bytes")
  }
}
