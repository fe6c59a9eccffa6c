package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition profile for the q08/q09 100× rung (r13 verdict #1:
  * 5.4×/6.9× vs DuckDB, the only >2× rows left on the board). DuckDB's
  * EXPLAIN ANALYZE shows NO smarter plan — a brute-force right hash
  * join fanning out all 15 M orders into a 15 M-row hash agg, wall
  * 0.44 s purely from morsel-driven 32-thread constants (operator times
  * sum to ~12.5 s). So the question this tool answers is where OUR
  * 2.35 s/1.73 s actually goes: scan, pre-aggregate exchange, join,
  * global sort — timed as incremental variants on one warm session,
  * noop-sink consumed, same methodology as [[Q11Profile]].
  *
  * Usage: runMain graft.tools.Q0809Profile [sfDir] [reps]
  */
object Q0809Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench100x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String): DataFrame = graft.core.Tables.load(spark, sfDir, n)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      // ---- shared scans ----
      "scan_orders_2col" -> (() => t("orders")
        .select("o_custkey", "o_orderkey").groupBy().count()),
      "scan_customer_1col" -> (() => t("customer")
        .select("c_custkey").groupBy().count()),
      // ---- q08 phases ----
      "q08_preagg_only" -> (() => t("orders")
        .groupBy(col("o_custkey")).agg(count(col("o_orderkey")).as("_n"))),
      "q08_join_nosort" -> (() => {
        val perCust = t("orders").groupBy(col("o_custkey"))
          .agg(count(col("o_orderkey")).as("_n"))
        t("customer").join(perCust, col("o_custkey") === col("c_custkey"), "left")
          .select(col("c_custkey"), coalesce(col("_n"), lit(0L)).as("n_orders"))
      }),
      "q08_as_shipped" -> (() =>
        graft.queries.InventoryQueries.q08LeftJoin(spark, sfDir)),
      // the r13 form (shuffle join + post-join sort), for the A/B
      // against the r14 broadcast + range-streamed rewrite
      "q08_r13_form" -> (() => {
        val perCust = t("orders").groupBy(col("o_custkey"))
          .agg(count(col("o_orderkey")).as("_n"))
        t("customer")
          .join(perCust, col("o_custkey") === col("c_custkey"), "left")
          .select(col("c_custkey"), coalesce(col("_n"), lit(0L)).as("n_orders"))
          .orderBy(col("c_custkey"))
      }),
      "q08_sort_only" -> (() => t("customer")
        .select(col("c_custkey")).orderBy(col("c_custkey"))),
      // ---- q09 phases ----
      "q09_filter_count" -> (() => t("orders")
        .filter(col("o_orderstatus") === "F").groupBy().count()),
      "q09_distinct_build" -> (() => t("orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")).distinct()),
      "q09_anti_nosort" -> (() => t("customer")
        .join(
          t("orders").filter(col("o_orderstatus") === "F")
            .select(col("o_custkey")).distinct(),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"))),
      "q09_as_shipped" -> (() =>
        graft.queries.InventoryQueries.q09AntiJoin(spark, sfDir)),
      "q09_r13_form" -> (() => t("customer")
        .join(
          t("orders").filter(col("o_orderstatus") === "F")
            .select(col("o_custkey")).distinct(),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))),
      "q09b_bitmap" -> (() =>
        graft.queries.InventoryQueries.q09bAntiBitmap(spark, sfDir))
    )
    variants.foreach { case (name, mk) =>
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q0809prof] $name%-22s best=${times.tail.min}%6.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
