package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: what does the built-in two-phase COUNT(DISTINCT v)
  * GROUP BY k exchange on? (Decides whether the hot key's value set
  * clusters onto one reducer — the premise of the r14 skew rung.)
  */
object DistinctPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(10000).select((col("id") % 10).as("key"),
      (col("id") % 777).as("value"))
    println(df.groupBy(col("key")).agg(countDistinct(col("value")))
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
