package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc latency probe for the round-5 iterative queries (not part of
  * the driver contract; kept for reproducibility of PERF.md numbers).
  */
object Q75Timing {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("q75_connected_components", "q76_cluster_dedup", "q77_bm25"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
      df.write.format("noop").mode("overwrite").save()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
