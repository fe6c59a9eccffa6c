package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc latency profile of the two near-dup dedup operators — the bench
  * tail (PERF.md). Runs each operator N times sequentially in one warm
  * JVM and prints per-rep wall times, isolating operator latency from the
  * concurrent-bench contention that makes BENCH numbers noisy.
  *
  * Usage: sbt "runMain graft.tools.DedupProfile [sfDir] [reps]"
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // warm page cache

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to reps).foreach { i =>
      time(s"minhash rep$i")(
        graft.operators.Dedup.minhashDedup(docs, "doc_id", "text",
            numHashes = 32, bands = 8)
          .write.format("noop").mode("overwrite").save())
      time(s"simhash rep$i")(
        graft.operators.Dedup.simhashDedup(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
