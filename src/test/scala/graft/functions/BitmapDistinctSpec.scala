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

  test("build/contains round-trip: exact membership, null probe is FALSE") {
    import spark.implicits._
    val build = Seq(1L, 5L, 5L, 1000000L).toDF("k").repartition(4)
    val bytes = build.agg(BitmapDistinct.build($"k")).head().getAs[Array[Byte]](0)
    val probe = Seq(Some(1L), Some(2L), Some(5L), Some(1000000L), None)
      .toDF("k")
    val got = probe.filter(BitmapDistinct.contains($"k", bytes))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 5L, 1000000L))
    // anti form: NULL probe key is KEPT (NOT EXISTS semantics — a null
    // can never equal a build key), non-members kept, members dropped
    val anti = probe.filter(!BitmapDistinct.contains($"k", bytes))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(anti == Set(Some(2L), None))
  }

  test("bitmapAntiJoin ≡ left_anti join; empty build keeps everything") {
    import spark.implicits._
    import graft.operators.Relational
    val probe = (1L to 500L).toDF("pk").repartition(6)
    val build = (1L to 1000L).filter(_ % 3 == 0).toDF("bk").repartition(4)
    val got = Relational.bitmapAntiJoin(probe, $"pk", build, $"bk")
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = probe.join(build, $"pk" === $"bk", "left_anti")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
    // semi twin
    val semi = Relational.bitmapSemiJoin(probe, $"pk", build, $"bk")
      .collect().map(_.getLong(0)).sorted.toSeq
    val semiWant = probe.join(build, $"pk" === $"bk", "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(semi == semiWant && semi.nonEmpty)
    // empty build: anti keeps all 500, semi keeps none
    val none = build.filter($"bk" < 0)
    assert(Relational.bitmapAntiJoin(probe, $"pk", none, $"bk").count() == 500)
    assert(Relational.bitmapSemiJoin(probe, $"pk", none, $"bk").count() == 0)
  }

  test("bitmapAntiJoin size gate falls back to the shuffle anti join") {
    import spark.implicits._
    import graft.operators.Relational
    val probe = (1L to 100L).toDF("pk")
    val build = (1L to 100L).filter(_ % 2 == 0).toDF("bk")
    val got = Relational.bitmapSteeredJoin(probe, $"pk", build, $"bk",
      anti = true, maxBytes = 1L) // force the fallback
    // fallback is a real join (plan has LeftAnti), same exact result
    assert(got.queryExecution.executedPlan.toString.contains("LeftAnti"))
    assert(got.collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 100L).filter(_ % 2 == 1).toSeq)
  }

  test("capped build reports over-cap as NULL on the executor (r15 gate)") {
    import spark.implicits._
    // widely-spread keys (worst case for Roaring run containers) over
    // many partitions: every partial AND the merge path must respect
    // the sticky overflow flag — the driver sees one NULL, not bytes
    val build = spark.range(0, 20000).select(
      (col("id") * 2654435761L).as("k")).repartition(8)
    val overCap = build.agg(BitmapDistinct.build($"k", maxBytes = 256L))
      .head()
    assert(overCap.isNullAt(0), "over-cap build must evaluate to NULL")
    // same data under a roomy cap: bytes come back and membership is exact
    val ok = build.agg(BitmapDistinct.build($"k", maxBytes = 64L << 20))
      .head().getAs[Array[Byte]](0)
    assert(ok != null && ok.length > 1)
  }

  test("containsBroadcast matches contains (broadcast-variable probe)") {
    import spark.implicits._
    val build = Seq(3L, 7L, 11L).toDF("k")
    val bytes = build.agg(BitmapDistinct.build($"k"))
      .head().getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(bytes)
    val probe = Seq(Some(3L), Some(4L), Some(11L), None).toDF("k")
    val got = probe.filter(BitmapDistinct.containsBroadcast($"k", bc))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L, 11L))
    // anti: null probe key KEPT (contains(null) = FALSE, not NULL)
    val anti = probe.filter(!BitmapDistinct.containsBroadcast($"k", bc))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSet
    assert(anti == Set(Some(4L), None))
  }
}
