package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** r13 q11 A/B: two-phase distinct (the r12 form) vs the bitmap
  * distinct aggregate, plus a result-equality check.
  */
object Q11Bitmap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(args(0) + "/lineitem.parquet")
    def twoPhase = li
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_suppkey"))
      .agg(
        sum((col("l_quantity") * 100).cast(LongType)).as("_sqc"),
        min(col("l_extendedprice")).as("_mn"),
        max(col("l_extendedprice")).as("_mx"),
        count(lit(1)).as("_n"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(col("_sqc")) / 100.0).as("sum_qty"),
        min(col("_mn")).as("min_price"),
        max(col("_mx")).as("max_price"),
        count(when(col("l_suppkey").isNotNull, 1)).as("n_supp"),
        sum(col("_n")).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    def bitmap = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum((col("l_quantity") * 100).cast(LongType)) / 100.0).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        graft.functions.BitmapDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    // equality first
    val a = twoPhase.collect().map(_.toSeq).toSeq
    val b = bitmap.collect().map(_.toSeq).toSeq
    println(s"[q11ab] equal: ${a == b}")
    if (a != b) { println(a.take(3)); println(b.take(3)) }
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (0 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q11ab] $tag best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("twoPhase")(twoPhase.write.mode("overwrite").format("noop").save())
    time("bitmap")(bitmap.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
