package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational scale experiment: replicate the sf0.1 fact tables N× in
  * memory (ids offset per copy so keys stay distinct) and time the
  * heavyweight query shapes — join+agg (q05 shape), agg suite incl.
  * COUNT(DISTINCT) (q11 shape), running-window (q14 shape), RANGE frame
  * (q47 shape). The point is the SCALING RATIO, not the absolute time: a
  * shape whose cost grows ≫ N× hides a cross join or a single-reducer
  * bottleneck that 100 TB would expose.
  *
  * Usage: sbt "runMain graft.tools.QueryScaleBench [replication]"
  */
object QueryScaleBench {
  def main(args: Array[String]): Unit = {
    val repl = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def replicate(name: String, idCols: Seq[String]): DataFrame = {
      val base = spark.read.parquet(s"$dir/$name.parquet")
      (0 until repl).map { i =>
        idCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * 100000000L))
        }
      }.reduce(_.unionByName(_))
    }

    // orders/lineitem replicated with consistent key offsets so the join
    // fans out exactly like real data; customer stays 1x (dims don't grow
    // with fact volume)
    val lineitem = replicate("lineitem", Seq("l_orderkey")).persist()
    val orders = replicate("orders", Seq("o_orderkey")).persist()
    println(s"lineitem: ${lineitem.count()} rows, orders: ${orders.count()} rows (${repl}x)")

    def time(label: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    time("join+agg (q05 shape)")(
      lineitem.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("qty")), sum(col("n"))))
    time("agg suite w/ COUNT(DISTINCT) (q11 shape)")(
      lineitem.groupBy(col("l_returnflag"))
        .agg(count(lit(1)), sum(col("l_quantity")),
          countDistinct(col("l_orderkey"))))
    time("running window (q14 shape)")(
      orders.select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"),
        sum(col("o_totalprice")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
            .rowsBetween(Long.MinValue, 0)).as("run")))
    time("RANGE frame (q47 shape)")(
      orders.select(col("o_orderkey"),
        sum(col("o_totalprice")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_custkey"))
            .orderBy(datediff(col("o_orderdate"), lit("1992-01-01")))
            .rangeBetween(-30, 0)).as("r30")))
    spark.stop()
  }
}
