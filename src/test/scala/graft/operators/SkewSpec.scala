package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tools.R14SkewBench

/** The r14 skew-robustness rung, pinned (verdict item 4): on a PLANTED
  * Zipfian corpus (one hot key carrying ~20% of rows) the salted /
  * bucketed mitigation paths must (a) return EXACTLY the unmitigated
  * results and (b) keep the straggler bounded. (b) is pinned on the
  * deterministic quantity that causes the straggler — the MAX
  * shuffle-read records any single task sees — rather than wall-clock,
  * which is load-sensitive in a shared test JVM; the wall-clock pairing
  * lives in tools/R14SkewBench and PERF.md. AQE is disabled for the
  * listener runs so partition counts are fixed (AQE would coalesce the
  * small test corpus into one partition and measure nothing).
  */
class SkewSpec extends SparkSpec {

  private lazy val fact: DataFrame =
    R14SkewBench.corpus(spark, 320000L).cache()
  private def dim: DataFrame = fact.groupBy(col("key"))
    .agg(count(lit(1)).as("key_n"), round(avg(col("amount")), 6).as("key_avg"))

  private def joinPlain: DataFrame =
    fact.join(dim, Seq("key")).select(col("key"), col("value"), col("key_avg"))
  private def joinSalted: DataFrame =
    Relational.saltedJoin(fact, dim, "key", saltBuckets = 16,
      probeSaltCol = col("value"))
      .select(col("key"), col("value"), col("key_avg"))

  /** Max shuffle-read records across all tasks of everything `run`
    * executes. Polls until the listener bus drains (no public
    * waitUntilEmpty).
    */
  private def maxShuffleRead(run: () => Unit): Long = {
    val listener = new SparkListener {
      @volatile var maxRecords = 0L
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          if (r > maxRecords) maxRecords = r
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run()
      var last = -1L
      var stable = 0
      while (stable < 2) { // bus drained = two identical reads 200ms apart
        Thread.sleep(200)
        if (listener.maxRecords == last) stable += 1 else stable = 0
        last = listener.maxRecords
      }
      last
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.get(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("planted corpus really is skewed: hot key holds ~20% of rows") {
    val total = fact.count()
    val hot = fact.filter(col("key") === 0L).count()
    assert(total == 320000L)
    assert(hot > total / 6 && hot < total / 4, s"hot=$hot of $total")
  }

  test("salted join ≡ plain join on the planted corpus (exactness)") {
    val got = joinSalted.collect().map(_.toSeq.toList).sorted(
      Ordering.by((s: List[Any]) => s.mkString("|")))
    val want = joinPlain.collect().map(_.toSeq.toList).sorted(
      Ordering.by((s: List[Any]) => s.mkString("|")))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("salted join bounds the straggler the plain shuffle join can't") {
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val hotRows = fact.filter(col("key") === 0L).count()
      val plainMax = maxShuffleRead(() =>
        joinPlain.write.mode("overwrite").format("noop").save())
      val saltedMax = maxShuffleRead(() =>
        joinSalted.write.mode("overwrite").format("noop").save())
      // the plain join's worst reducer swallows the whole hot key;
      // the salted join spreads it over 16 (key, salt) buckets
      assert(plainMax >= hotRows,
        s"plain join straggler should see the full hot key: $plainMax < $hotRows")
      assert(saltedMax * 3 < plainMax * 2, // ≥1.5× headroom, deterministic
        s"salted straggler not bounded: salted=$saltedMax plain=$plainMax")
    }
  }

  test("bucketed exact median ≡ the window-sort median on the skewed corpus") {
    val wantRows = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key")).orderBy(col("amount"))
      val n = Window.partitionBy(col("key"))
      fact.select(col("key"), col("amount"),
          row_number().over(w).as("_rn"), count(lit(1)).over(n).as("_n"))
        .filter(col("_rn") === floor((col("_n") + 1) / 2) ||
          col("_rn") === floor(col("_n") / 2) + 1)
        .groupBy(col("key"))
        .agg(round(avg(col("amount")), 6).as("median"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val got = Relational.percentileContExact(fact, "key", "amount",
      Seq(("median", 0.5)), buckets = 64)
      .select(col("key"), round(col("median"), 6).as("median"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == wantRows)
  }

  test("salted aggregation ≡ plain aggregation (the additive honesty row)") {
    val want = fact.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val got = Relational.saltedAggregate(fact, Seq("key"), 16,
      partial = Seq(count(lit(1)).as("_pn"), sum(col("value")).as("_ps")),
      merge = Seq(sum(col("_pn")).as("n"), sum(col("_ps")).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.sameElements(want))
  }
}
