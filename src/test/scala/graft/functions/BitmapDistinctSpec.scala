package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BitmapDistinctCount]]: exact distinct counting over integral keys
  * via mergeable Roaring bitmaps — the q11 100×-floor aggregate.
  */
class BitmapDistinctSpec extends SparkSpec {

  test("matches COUNT(DISTINCT) on grouped integral keys, nulls skipped") {
    import spark.implicits._
    val rows = (0 until 10000).map { i =>
      ("g" + (i % 7), if (i % 13 == 0) None else Some((i % 457).toLong))
    } :+ (("gNull", None: Option[Long]))
    val df = rows.toDF("g", "k").repartition(8) // force multi-partition merge
    val got = df.groupBy($"g")
      .agg(BitmapDistinct($"k").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy($"g")
      .agg(countDistinct($"k").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // all-null group: COUNT(DISTINCT) = 0, not null
    assert(got("gNull") == 0L)
  }

  test("sparse stride-clustered ids (the 100x surrogate layout) stay exact") {
    import spark.implicits._
    // 100 dense runs of 1000, each shifted by 1e6 — the replicated-key
    // layout of the scale corpora
    val ids = for (c <- 0 until 100; k <- 1 to 1000) yield c * 1000000L + k
    val df = ids.toDF("k").repartition(16)
    val n = df.agg(BitmapDistinct($"k")).collect().head.getLong(0)
    assert(n == 100000L)
    // int keys work too
    val m = ids.map(_.toInt).toDF("k").repartition(4)
      .agg(BitmapDistinct($"k")).collect().head.getLong(0)
    assert(m == 100000L)
  }

  test("negative and extreme keys survive serialization round-trips") {
    import spark.implicits._
    val ks = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue, Long.MaxValue,
      -1L, 42L)
    val n = ks.toDF("k").repartition(5)
      .agg(BitmapDistinct($"k")).collect().head.getLong(0)
    assert(n == 6L)
  }

  test("non-integral keys are rejected at analysis") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("k")
    intercept[Exception] {
      df.agg(BitmapDistinct($"k")).collect()
    }
  }
}
