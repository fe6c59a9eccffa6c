package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** One-off floor profile for the r12 100x relational rung. */
object Q11Floor {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(args(0) + "/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (0 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[floor] $tag best=${ts.tail.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("scan5cols")(li.select("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_suppkey").write.mode("overwrite").format("noop").save())
    time("scan+count")(li.groupBy("l_returnflag", "l_linestatus")
      .count().write.mode("overwrite").format("noop").save())
    time("preagg")(li.groupBy("l_returnflag", "l_linestatus", "l_suppkey")
      .agg(sum((col("l_quantity") * 100).cast("long")))
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
