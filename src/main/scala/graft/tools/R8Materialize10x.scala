package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize an N× replication of the sf0.1 corpus to ON-DISK parquet
  * (r7 judge item 1): the same replication constructions R7ScaleBench
  * used in memory, written once so the full declared query set can be
  * bench-paired against DuckDB where per-query DATA cost — not the job
  * floor — dominates.
  *
  * Replication constructions (workload realism, so true outputs grow
  * ~linearly — see R7ScaleBench's scaladoc for the reasoning):
  *  - surrogate keys offset per copy, CONSISTENTLY across tables
  *    (customer/orders share the custkey offset, orders/lineitem the
  *    orderkey offset, part/supplier their keys) so FK joins keep their
  *    exact sf0.1 match structure ×N;
  *  - low-cardinality group keys (status, priority, returnflag, source,
  *    event_type) are NOT offset — groups grow N× in SIZE, the regime
  *    the bucketed-percentile / salted-agg operators exist for;
  *  - documents: every even-position token becomes per-copy-unique, so
  *    vocabulary / n-gram / bigram frames grow ~N× instead of planting
  *    N² cross-copy near-dup pairs;
  *  - embeddings: per-copy circular shift — near-dups survive within a
  *    copy only, keeping LSH/semantic-dedup true pair sets ~linear;
  *  - events: ids offset by an EVEN stride (user_id parity is q143's
  *    variant assignment), timestamps kept — windows hold 10× the rows.
  *
  * region/nation are genuine dimensions and are copied verbatim.
  *
  * Usage: sbt "runMain graft.tools.R8Materialize10x [repl] [outDir] [tables]"
  * `tables` (comma list) restricts materialization — the r9 100×
  * documents/embeddings rung (`100 /root/repo/bench100x
  * documents,embeddings`) doesn't need 60 M lineitem rows on disk.
  */
object R8Materialize10x {
  def main(args: Array[String]): Unit = {
    val repl = args.headOption.map(_.toInt).getOrElse(10)
    val out = args.lift(1).getOrElse("/root/repo/bench10x")
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(table: String)(f: (DataFrame, Int) => DataFrame): Unit = if (wanted(table)) {
      val src = spark.read.parquet(s"$dir/$table.parquet")
      val rep = (0 until repl).map(i => f(src, i)).reduce(_.unionByName(_))
      // 16 part files: parallel scans on BOTH engines (DuckDB reads the
      // glob with per-file parallelism; Spark plans one split per file)
      rep.repartition(16).write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[10x] $table: ${spark.read.parquet(s"$out/$table.parquet").count()} rows")
    }

    Seq("region", "nation").filter(wanted).foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[10x] $t: copied verbatim")
    }
    replicate("customer")((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L)))
    replicate("supplier")((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * 1000000L)))
    replicate("part")((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * 1000000L)))
    replicate("orders")((d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
      .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
    replicate("lineitem")((d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
      .withColumn("l_partkey", col("l_partkey") + lit(i * 1000000L))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * 1000000L)))
    // doc_id/vec_id strides = the sf0.1 cardinality: ids stay DENSE
    // (0..N·5000), which q107/q117's modular synthetic graphs assume —
    // a sparse 1e6 stride warps their degree structure. n_chars keeps
    // its BIGINT type (length() returns int).
    replicate("documents")((d, i) => d
      .withColumn("doc_id", col("doc_id") + lit(i * 5000L))
      .withColumn("text", array_join(transform(
        graft.operators.TextAnalysis.tokens(col("text")),
        (t, p) => when(p % 2 === 0, concat(lit(s"c${i}_"), t)).otherwise(t)),
        " "))
      .withColumn("n_chars", length(col("text")).cast("long")))
    replicate("embeddings") { (d, i) =>
      val s = (i * 7) % 64
      val v = col("embedding")
      d.withColumn("vec_id", col("vec_id") + lit(i * 2000L))
        .withColumn("embedding",
          if (s == 0) v else concat(slice(v, s + 1, 64 - s), slice(v, 1, s)))
    }
    // events needs the nanos-flag loader; written back as µs TIMESTAMP
    // (Tables.withEventTime adapts to either on read). Even strides:
    // user_id % 2 (q143's variant) keeps its per-copy split.
    if (wanted("events")) {
      val src = graft.core.Tables.loadEvents(spark, dir)
        .withColumn("ts", col("event_time")).drop("event_time")
      val rep = (0 until repl).map(i => src
          .withColumn("event_id", col("event_id") + lit(i * 100000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000L)))
        .reduce(_.unionByName(_))
      rep.repartition(16).write.mode("overwrite").parquet(s"$out/events.parquet")
      println(s"[10x] events: ${spark.read.parquet(s"$out/events.parquet").count()} rows")
    }

    println(s"[10x] corpus written to $out (${repl}x sf0.1)")
    spark.stop()
  }
}
