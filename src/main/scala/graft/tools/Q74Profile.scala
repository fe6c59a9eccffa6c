package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level floor profile for q74_token_budget (r11): times the
  * phase-1 coarse agg alone (one full corpus scan + tokenize + hash
  * agg) against the full two-phase operator, interleaved A/B so machine
  * weather hits both arms (the TokBench pattern). The gap between the
  * two is everything the operator adds beyond its first corpus pass:
  * the second (bucket-pruned) scan, the broadcast build, the boundary
  * window, and the job-launch floor.
  *
  * Usage: runMain graft.tools.Q74Profile <sfDir> [iters]
  */
object Q74Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

    def coarseOnly(): Long = {
      val base = docs
        .withColumn("_ntok", graft.operators.TextAnalysis.tokenCount(col("text")))
        .withColumn("_h16", graft.operators.Curation.hash16(col("doc_id")))
      base.groupBy(col("source"), col("_h16"))
        .agg(sum(col("_ntok")).as("_btok")).count()
    }
    def scanOnly(): Long =
      docs.select(count(col("text"))).collect()(0).getLong(0)
    def phase12(): Long = {
      val base = docs
        .withColumn("_ntok", graft.operators.TextAnalysis.tokenCount(col("text")))
        .withColumn("_h16", graft.operators.Curation.hash16(col("doc_id")))
        .withColumn("_budget",
          when(length(col("source")) === 4, 500L).otherwise(650L))
      val coarse = base.groupBy(col("source"), col("_h16"), col("_budget"))
        .agg(sum(col("_ntok")).as("_btok"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("_h16"))
      coarse.withColumn("_boff", coalesce(sum(col("_btok")).over(
          wc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
        .filter(col("_boff") < col("_budget")).count()
    }
    def full(): Long =
      graft.queries.CurationQueries.q74TokenBudget(spark, dir).count()

    for (i <- 1 to iters) {
      def t(f: () => Long): (Double, Long) = {
        val s = System.nanoTime(); val n = f()
        ((System.nanoTime() - s) / 1e9, n)
      }
      val (ts, _) = t(scanOnly _)
      val (tc, _) = t(coarseOnly _); val (tp, _) = t(phase12 _)
      val (tf, _) = t(full _)
      println(f"[q74prof] iter=$i scan=$ts%.2f coarse=$tc%.2f p12=$tp%.2f full=$tf%.2f")
    }
    spark.stop()
  }
}
