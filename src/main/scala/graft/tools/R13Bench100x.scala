package graft.tools

import org.apache.spark.sql.SparkSession

/** r13 100×-rung runner: run named [[graft.SparkEntry]] queries against
  * a materialized scale corpus (bench100x) with the r12 relational
  * conf (AQE on, 256m autoBroadcast, shuffle 64), warm best-of-3 noop
  * writes, one JSON line on stdout — the Spark side of the
  * tools/duckdb_100x.py pairing.
  *
  * Usage: sbt "runMain graft.tools.R13Bench100x <sfDir> <q1,q2,...>"
  * SPARK_GRAFT_AQE=off replays the r12 pipeline-heavies conf (AQE's
  * runtime coalesce mis-sizes compute-dense map stages — the r12
  * finding; relational spine queries keep AQE on).
  */
object R13Bench100x {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val aqe = !sys.env.get("SPARK_GRAFT_AQE").contains("off")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (256 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[100x] $name best=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
      name -> BigDecimal(ts.min).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }
    println("{\"sf\":\"" + dir + "\",\"mode\":\"warm best-of-3 noop, shuffle 64, AQE " +
      (if (aqe) "on" else "off") + ", bcast 256m\"," +
      "\"queries\":{" +
      times.map { case (n, t) => "\"" + n + "\":" + t }.mkString(",") + "}}")
    spark.stop()
  }
}
