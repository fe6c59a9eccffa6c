package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 A/B for the 100× semi/anti/outer spine: current query forms vs
  * aggregation-pushdown rewrites (pre-aggregate / pre-distinct the
  * fact side below the join).
  */
object R13SpineAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (256 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    def time(tag: String)(df: => DataFrame): Unit = {
      val ts = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[spine] $tag best=${ts.min}%.3f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }

    // ---- q08: left join + count
    def q08cur = t("customer")
      .join(t("orders"), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
    def q08push = {
      val per = t("orders").groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("_n"))
      t("customer")
        .join(per, col("o_custkey") === col("c_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("_n"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey"))
    }
    // ---- q09: anti join
    def q09cur = t("customer")
      .join(t("orders").filter(col("o_orderstatus") === "F"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
    def q09dist = t("customer")
      .join(t("orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
    // equality checks (cheap enough at 100x? q08 result is 1.5M rows —
    // compare counts + a checksum)
    def sig(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(xxhash64(df.columns.map(col): _*)
        .cast("decimal(38,0)"))).collect().head.toSeq
    println(s"[spine] q08 equal: ${sig(q08cur) == sig(q08push)}")
    println(s"[spine] q09 equal: ${sig(q09cur) == sig(q09dist)}")
    time("q08cur")(q08cur)
    time("q08push")(q08push)
    time("q09cur")(q09cur)
    time("q09dist")(q09dist)
    // what does the ORDER BY itself cost?
    time("q08push_noorder") {
      val per = t("orders").groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("_n"))
      t("customer")
        .join(per, col("o_custkey") === col("c_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("_n"), lit(0L)).as("n_orders"))
    }
    // join-to-aggregation forms (no join at all): one shuffle
    def q08union = {
      val u = t("customer")
        .select(col("c_custkey"), lit(null).cast("long").as("o_orderkey"),
          lit(1).as("_c"))
        .unionByName(t("orders").select(col("o_custkey").as("c_custkey"),
          col("o_orderkey"), lit(0).as("_c")))
      u.groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"), max(col("_c")).as("_hc"))
        .filter(col("_hc") === 1)
        .select(col("c_custkey"), col("n_orders"))
        .orderBy(col("c_custkey"))
    }
    def q09union = {
      val u = t("customer").select(col("c_custkey"), lit(0).as("_o"))
        .unionByName(t("orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey"), lit(1).as("_o")))
      u.groupBy(col("c_custkey")).agg(max(col("_o")).as("_m"),
          count(lit(1)).as("_n"))
        .filter(col("_m") === 0)
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }
    println(s"[spine] q08union equal: ${sig(q08cur) == sig(q08union)}")
    println(s"[spine] q09union equal: ${sig(q09cur) == sig(q09union)}")
    time("q08union")(q08union)
    time("q09union")(q09union)
    // broadcast-hinted pushdown join
    time("q08push_bcast") {
      val per = t("orders").groupBy(col("o_custkey"))
        .agg(count(col("o_orderkey")).as("_n"))
      t("customer")
        .join(broadcast(per), col("o_custkey") === col("c_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("_n"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey"))
    }
    spark.stop()
  }
}
