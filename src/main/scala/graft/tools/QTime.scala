package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm per-query timer: runs each named query `reps` times (first pass
  * discarded) and prints the best time — the Bench measurement isolated
  * for one query, for tail-latency profiling without a full bench run.
  * Usage: runMain graft.tools.QTime <q1,q2,...> [sfDir] [reps]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(sys.error("usage: QTime <q,...> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BCAST", "10485760"))
      .config("spark.sql.session.timeZone", "UTC")
      // q83-class recursive CTEs: the default 1M-row recursion cap
      // trips at >= 10x-replicated data; the queries are depth-bounded
      // (log2 of the key domain), so the cap is a safety net, not a limit
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $name best=${times.tail.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
