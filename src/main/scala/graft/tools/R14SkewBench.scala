package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-robustness rung (r14 verdict item 4): the 100× relational spine
  * is uniform TPC-H-shaped, but 100 TB reality is Zipfian — this tool
  * PLANTS the skew (one hot key carrying ~20% of rows, the remainder
  * uniform over `nKeys`) and pairs each mitigation against its
  * unmitigated form on the same on-disk corpus, wall-clock, warm
  * best-of-reps, exactness-gated (full-row-hash equality) first.
  *
  * What Spark already handles (measured, the honesty rows):
  *  - additive aggregates (count/sum by key): map-side combine crushes
  *    the hot key before the exchange — salting expected ~neutral;
  *  - exact COUNT(DISTINCT v) by k: the built-in two-phase plan
  *    exchanges the dedup stage on (k, v), natively spreading the hot
  *    key's value set (see the note in operators/Relational.scala).
  *
  * Where mitigation is load-bearing (the rung):
  *  - join_unsalted_nomitig vs join_unsalted_aqe vs join_salted: a
  *    shuffled equi-join clusters the probe on the key, so the hot
  *    key's 20% of rows land on ONE reducer of 32. AQE's skewJoin is
  *    the runtime split; [[graft.operators.Relational.saltedJoin]] is
  *    the static (key, salt) spread that also survives plans AQE can't
  *    re-split. Broadcast is disabled throughout — the scenario under
  *    test is "dim not broadcastable", the only regime where any of
  *    this matters;
  *  - median_window vs median_bucketed: per-key EXACT median via a
  *    sort window (Window.partitionBy(key) — the classic straggler,
  *    no built-in mitigation exists) vs
  *    [[graft.operators.Relational.percentileContExact]]'s bucketed
  *    two-pass, whose frames are (key, bucket)-parallel.
  *
  * The corpus is DETERMINISTIC (seeded xxhash64 transforms of
  * spark.range — no RNG), so every variant sees identical data.
  *
  * Usage: runMain graft.tools.R14SkewBench [rows] [outDir] [reps]
  * Prints one JSON line {"rows":N,"hot_frac":0.2,"loadavg":…,
  * "queries":{…}}.
  */
object R14SkewBench {
  val NKeys = 1000
  val HotPct = 20 // percent of rows on key 0

  def corpus(spark: SparkSession, rows: Long): DataFrame =
    spark.range(rows).select(
      when(pmod(xxhash64(col("id"), lit(1)), lit(100L)) < HotPct, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(2)), lit(NKeys.toLong)) + 1L)
        .as("key"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000000L)).as("value"),
      (pmod(xxhash64(col("id"), lit(4)), lit(100000L)) / 100.0).as("amount"))

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(15000000L)
    val out = args.lift(1).getOrElse("/root/repo/benchskew")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Relational

    val path = s"$out/skew_$rows.parquet"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      corpus(spark, rows).repartition(32)
        .write.mode("overwrite").parquet(path)
      println(s"[skew] corpus written: $path")
    }
    def fact: DataFrame = spark.read.parquet(path)
    def dim: DataFrame = fact.groupBy(col("key"))
      .agg(count(lit(1)).as("key_n"), round(avg(col("amount")), 6).as("key_avg"))

    def joinPlain: DataFrame =
      fact.join(dim, Seq("key")).select(col("key"), col("value"), col("key_avg"))
    def joinSalted: DataFrame =
      Relational.saltedJoin(
        fact, dim, "key", saltBuckets = 16, probeSaltCol = col("value"))
        .select(col("key"), col("value"), col("key_avg"))
    def aggPlain: DataFrame =
      fact.groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    def aggSalted: DataFrame =
      Relational.saltedAggregate(fact, Seq("key"), 16,
        partial = Seq(count(lit(1)).as("_pn"), sum(col("value")).as("_ps")),
        merge = Seq(sum(col("_pn")).as("n"), sum(col("_ps")).as("s")))
    def distinctPlain: DataFrame =
      fact.groupBy(col("key")).agg(countDistinct(col("value")).as("n_distinct"))
    def medianWindow: DataFrame = {
      val w = Window.partitionBy(col("key")).orderBy(col("amount"))
      val n = Window.partitionBy(col("key"))
      fact.select(col("key"), col("amount"),
          row_number().over(w).as("_rn"), count(lit(1)).over(n).as("_n"))
        .filter(col("_rn") === floor((col("_n") + 1) / 2) ||
          col("_rn") === floor(col("_n") / 2) + 1)
        .groupBy(col("key"))
        .agg(round(avg(col("amount")), 6).as("median"))
    }
    def medianBucketed: DataFrame =
      Relational.percentileContExact(fact, "key", "amount",
        Seq(("median", 0.5)), buckets = 256)
        .select(col("key"), round(col("median"), 6).as("median"))

    def hashOf(df: DataFrame): java.math.BigDecimal = {
      val cols = df.columns.sorted.map(col)
      // order-independent multiset hash; DECIMAL(38,0) sum can't
      // overflow (15e6 × 2^63 ≈ 1.4e26 ≪ 1e38) under ANSI mode
      df.select(xxhash64(struct(cols: _*)).cast("decimal(38,0)").as("_h"))
        .agg(sum(col("_h"))).head().getDecimal(0)
    }
    require(hashOf(joinSalted) == hashOf(joinPlain), "salted join diverged")
    require(hashOf(aggSalted) == hashOf(aggPlain), "salted agg diverged")
    require(hashOf(medianBucketed) == hashOf(medianWindow),
      "bucketed median diverged")
    println("[skew] exactness gates passed")

    def time(mk: () => DataFrame, conf: Map[String, String]): Double = {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val ts = (0 to reps).map { _ =>
          val t0 = System.nanoTime()
          mk().write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        ts.tail.min
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val noBcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val noSkewOpt = noBcast + ("spark.sql.adaptive.skewJoin.enabled" -> "false")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("join_unsalted_nomitig") = time(() => joinPlain, noSkewOpt)
    results("join_unsalted_aqe") = time(() => joinPlain, noBcast)
    results("join_salted") = time(() => joinSalted, noBcast)
    results("median_window") = time(() => medianWindow, Map.empty)
    results("median_bucketed") = time(() => medianBucketed, Map.empty)
    results("agg_unsalted") = time(() => aggPlain, Map.empty)
    results("agg_salted") = time(() => aggSalted, Map.empty)
    results("distinct_builtin") = time(() => distinctPlain, Map.empty)

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").head
    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString(",")
    println(s"""{"rows":$rows,"hot_frac":0.$HotPct,"loadavg":$load,"queries":{$qs}}""")
    spark.stop()
  }
}
