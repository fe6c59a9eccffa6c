package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose q77's cost at sf0.1: raw scan, one tokenize pass, the fused
  * stats agg, the full fused query — pins where the wall time actually
  * goes before optimizing further.
  */
object Bm25Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    time("scan_only") { docs.agg(sum(length(col("text")))).collect() }
    time("tokenize_count") {
      docs.agg(sum(size(filter(split(col("text"), "\\s+"), t => length(t) > 0)))).collect()
    }
    time("tokenize_tf3") {
      docs.select(size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).as("dl"),
          size(filter(split(col("text"), "\\s+"), t => t === lit("dup"))).as("t0"))
        .agg(sum(col("dl")), sum(col("t0"))).collect()
    }
    time("q77_full") {
      graft.SparkEntry.queries("q77_bm25")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
