package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-robustness rung (r14 verdict item 4): the 100× relational spine
  * is uniform TPC-H-shaped, but 100 TB reality is Zipfian — this tool
  * PLANTS the skew (one hot key carrying ~20% of rows, the remainder
  * uniform over `nKeys`) and pairs the mitigation paths against their
  * unmitigated forms on the same on-disk corpus:
  *
  *  - join_unsalted_nomitig: shuffled hash/SMJ equi-join with AQE skew
  *    handling OFF and broadcast OFF — the unbounded-straggler baseline
  *    (hot key's 20% of probe rows land on one reducer of 32);
  *  - join_unsalted_aqe: same plan, AQE skewJoin ON — Spark's built-in
  *    runtime split;
  *  - join_salted: [[graft.operators.Relational.saltedJoin]] — the
  *    static (key, salt) spread, the shape that survives when the plan
  *    can't re-shuffle at runtime (e.g. the join feeds a co-partitioned
  *    consumer) or the build side is skew-replicated anyway;
  *  - distinct_unsalted vs distinct_salted: exact COUNT(DISTINCT value)
  *    per key — the aggregation where skew actually bites (the hot
  *    key's whole value set clusters onto one reducer) vs
  *    [[graft.operators.Relational.saltedDistinctCount]]'s value-salt
  *    partition of the distinct sets;
  *  - agg_unsalted vs agg_salted: plain count+sum per key — the HONESTY
  *    row: additive aggregates are already skew-immune through
  *    map-side combine, so salting is expected ~neutral here (q111's
  *    oracle face proves invisibility, not speed).
  *
  * The corpus is DETERMINISTIC (seeded xxhash64 transforms of
  * spark.range — no RNG), so every variant sees identical data and the
  * tool cross-checks result equality (full-row hash) between each
  * mitigation and its baseline before timing counts.
  *
  * Usage: runMain graft.tools.R14SkewBench [rows] [outDir] [reps]
  * Prints one JSON line {"rows":N,"hot_frac":0.2,"queries":{...}}.
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
      .config("spark.driver.memory", "16g")
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
    // per-key stats dim — small, but the scenario under test is "dim
    // NOT broadcastable" (at 100 TB the dim is dimension-shaped, not
    // tiny), so broadcast is disabled for every join variant
    def dim: DataFrame = fact.groupBy(col("key"))
      .agg(count(lit(1)).as("key_n"), round(avg(col("amount")), 6).as("key_avg"))

    def joinPlain: DataFrame =
      fact.join(dim, Seq("key")).select(col("key"), col("value"), col("key_avg"))
    def joinSalted: DataFrame =
      Relational.saltedJoin(
        fact, dim, "key", saltBuckets = 16, probeSaltCol = col("value"))
        .select(col("key"), col("value"), col("key_avg"))
    def distinctPlain: DataFrame =
      fact.groupBy(col("key")).agg(countDistinct(col("value")).as("n_distinct"))
    def distinctSalted: DataFrame =
      Relational.saltedDistinctCount(fact, Seq("key"), col("value"), 16)
    def aggPlain: DataFrame =
      fact.groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    def aggSalted: DataFrame =
      Relational.saltedAggregate(fact, Seq("key"), 16,
        partial = Seq(count(lit(1)).as("_pn"), sum(col("value")).as("_ps")),
        merge = Seq(sum(col("_pn")).as("n"), sum(col("_ps")).as("s")))

    def hashOf(df: DataFrame): Long = {
      val cols = df.columns.sorted.map(col)
      df.select(xxhash64(struct(cols: _*)).as("_h"))
        .agg(sum(col("_h"))).head().getLong(0)
    }
    // exactness gates BEFORE timing: mitigation ≡ baseline, full rows
    require(hashOf(joinSalted) == hashOf(joinPlain), "salted join diverged")
    require(hashOf(distinctSalted) == hashOf(distinctPlain),
      "salted distinct diverged")
    require(hashOf(aggSalted) == hashOf(aggPlain), "salted agg diverged")
    println("[skew] exactness gates passed")

    def time(mk: () => DataFrame, conf: Map[String, String]): Double = {
      val saved = conf.keys.map(k => k -> spark.conf.get(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val ts = (0 to reps).map { _ =>
          val t0 = System.nanoTime()
          mk().write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        ts.tail.min
      } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }
    val noBcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val noSkewOpt = noBcast + ("spark.sql.adaptive.skewJoin.enabled" -> "false")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("join_unsalted_nomitig") = time(() => joinPlain, noSkewOpt)
    results("join_unsalted_aqe") = time(() => joinPlain, noBcast)
    results("join_salted") = time(() => joinSalted, noBcast)
    results("distinct_unsalted") = time(() => distinctPlain, Map.empty)
    results("distinct_salted") = time(() => distinctSalted, Map.empty)
    results("agg_unsalted") = time(() => aggPlain, Map.empty)
    results("agg_salted") = time(() => aggSalted, Map.empty)

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").head
    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString(",")
    println(s"""{"rows":$rows,"hot_frac":0.$HotPct,"loadavg":$load,"queries":{$qs}}""")
    spark.stop()
  }
}
