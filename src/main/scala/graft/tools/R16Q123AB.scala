package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 q123 A/B: the columnProfile face explodes 4 columns into (ci, v)
  * pairs and runs a weighted histogram (groupBy(ci,v).count) to get
  * exact n_distinct plus stats from one pass. Variants measured here:
  *  - cur:   shipped columnProfile
  *  - split: plain one-row agg for n/n_null/min/max/avg (no explode),
  *           explode only for the DISTINCT (ci,v) dedup (no count buffer)
  *  - splitRepart: split + repartition pairs before the dedup so the
  *           partial aggregation is not bound to the scan's 2-3 tasks
  *
  * Usage: runMain graft.tools.R16Q123AB <sfDir>
  */
object R16Q123AB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Any): Unit = {
      f
      val times = (1 to 3).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }
      println(f"[q123ab] $label%-28s ${times.min}%.2f s (all ${times.map(x => f"$x%.2f").mkString(",")})")
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = graft.core.Tables.load(spark, dir, "lineitem")
    val cents = li.select(cols.map(c =>
      round(col(c) * 100, 0).cast("long").as(c)): _*)

    t("cur (shipped face)")(graft.queries.AnalyticsQueries
      .q123Profile(spark, dir).collect())

    def splitForm(repart: Boolean): DataFrame = {
      val pairs0 = cents.select(posexplode(
        array(cols.map(c => col(c).cast("double")): _*)).as(Seq("_ci", "_v")))
      val pairs = if (repart) pairs0.repartition(
        spark.sessionState.conf.numShufflePartitions) else pairs0
      val nd = pairs.select(col("_ci"), col("_v")).distinct()
        .groupBy(col("_ci")).agg(count(col("_v")).as("n_distinct"))
      val statsRow = cents.agg(
        count(cols.head).as("n0"),
        Seq(sum(when(col(cols.head).isNull, 1L).otherwise(0L)).as("nn0"),
          min(col(cols.head)).as("mn0"), max(col(cols.head)).as("mx0"),
          avg(col(cols.head)).as("av0")) ++
        cols.zipWithIndex.tail.flatMap { case (c, i) => Seq(
          count(c).as(s"n$i"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn$i"),
          min(col(c)).as(s"mn$i"), max(col(c)).as(s"mx$i"),
          avg(col(c)).as(s"av$i")) }: _*)
      val stats = statsRow.select(explode(array(cols.indices.map(i =>
        struct(lit(i).as("_ci"), col(s"n$i").as("n"), col(s"nn$i").as("n_null"),
          col(s"mn$i").cast("double").as("min_v"),
          col(s"mx$i").cast("double").as("max_v"),
          col(s"av$i").cast("double").as("avg_v"))): _*)).as("s"))
        .select(col("s.*"))
      stats.join(nd, Seq("_ci"), "left")
        .select(element_at(typedlit(cols), col("_ci") + 1).as("column"),
          col("n"), col("n_null"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          (col("min_v") / 100.0).as("min_v"), (col("max_v") / 100.0).as("max_v"),
          round(col("avg_v") / 100.0, 6).as("avg_v"))
        .orderBy(col("column"))
    }
    t("split")(splitForm(false).collect())
    t("splitRepart")(splitForm(true).collect())
    println("cur rows:   " + graft.queries.AnalyticsQueries
      .q123Profile(spark, dir).collect().mkString("|"))
    println("split rows: " + splitForm(false).collect().mkString("|"))
    spark.stop()
  }
}
