package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of q79's wall time at sf0.1 (bench
  * session config: AQE off, 8 shuffle partitions).
  */
object Q79Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority").as("k"), col("o_totalprice"))
    def time(label: String)(f: => Unit): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("scan")(orders.agg(sum(col("o_totalprice"))).collect())
    val qs = (1 until 64).map(_.toDouble / 64)
    time("pctl63")(orders.groupBy(col("k"))
      .agg(percentile_approx(col("o_totalprice"), lit(qs.toArray), lit(2500)).as("b"))
      .collect())
    time("pctl63_acc500")(orders.groupBy(col("k"))
      .agg(percentile_approx(col("o_totalprice"), lit(qs.toArray), lit(500)).as("b"))
      .collect())
    time("bucket_fold") {
      val bounds = orders.groupBy(col("k"))
        .agg(percentile_approx(col("o_totalprice"), lit(qs.toArray), lit(2500)).as("b"))
      orders.join(broadcast(bounds), Seq("k"))
        .select(aggregate(col("b"), lit(0),
          (acc, x) => acc + when(col("o_totalprice") >= x, 1).otherwise(0)).as("bk"))
        .agg(sum(col("bk"))).collect()
    }
    time("full_q79") {
      graft.SparkEntry.queries("q79_dist_windows")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("plain_window") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("o_totalprice"), col("o_orderkey"))
      orders.select(col("o_orderkey"), ntile(4).over(w).as("t"),
          percent_rank().over(w).as("p"), cume_dist().over(w).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
