package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Decomposition profile for q11_agg_suite's 10× anomaly (r8 verdict
  * "What's wrong" #3: 7.09 s vs DuckDB 0.09 s on a 2-key groupBy).
  * Times each suspect in isolation on the same warm session so the
  * deltas attribute the cost: the parquet scan itself, the plain aggs,
  * the exact-DECIMAL SUM, the COUNT(DISTINCT) Expand, and the fused
  * whole. Usage: runMain graft.tools.Q11Profile [sfDir] [reps]
  */
object Q11Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench10x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dec = DecimalType(18, 2)
    def li: DataFrame = graft.core.Tables.load(spark, sfDir, "lineitem")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_count" -> (() => li.groupBy().count()),
      "scan_5cols" -> (() => li.select("l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_suppkey")
        .groupBy().agg(count(lit(1)).as("n"))),
      "agg_no_distinct_no_dec" -> (() => li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_p"),
          max(col("l_extendedprice")).as("max_p"),
          count(lit(1)).as("n"))),
      "agg_decimal_sum_only" -> (() => li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"))),
      "agg_distinct_only" -> (() => li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))),
      "distinct_two_pass" -> (() => li
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_suppkey"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_supp"))),
      "q11_reagg_fused" -> (() => li
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(dec)).as("_s"),
          min(col("l_extendedprice")).as("_mn"),
          max(col("l_extendedprice")).as("_mx"),
          count(lit(1)).as("_n"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("_s")).cast(DoubleType).as("sum_qty"),
          min(col("_mn")).as("min_p"), max(col("_mx")).as("max_p"),
          sum(col("_n")).as("n"), count(lit(1)).as("n_supp"))),
      "q11_as_shipped" -> (() =>
        graft.queries.InventoryQueries.q11AggSuite(spark, sfDir))
    )
    variants.foreach { case (name, mk) =>
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q11prof] $name%-24s best=${times.tail.min}%6.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
