package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B of the composed importanceWeights→importanceScores
  * DSIR pipeline vs the fused dsirScores form (machine noise hits both
  * arms — the TokBench pattern). Usage:
  *   sbt "runMain graft.tools.DsirAB [sfDir] [reps]"
  */
object DsirAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench100x")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))

    def composed(): Unit = {
      val w = graft.operators.Curation.importanceWeights(
        d, d.filter(col("lang") === "en"), "text")
      graft.operators.Curation.importanceScores(
          d.select(col("doc_id"), col("text")), "doc_id", "text", w)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .write.mode("overwrite").format("noop").save()
    }
    def fused(): Unit =
      graft.operators.Curation.dsirScores(d, "doc_id", "text",
          isTarget = col("lang") === "en")
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .write.mode("overwrite").format("noop").save()

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // stage decomposition (fused plan's pieces, warm)
    def toks = d.select(col("doc_id"), (col("lang") === "en").as("_tgt"),
      explode(graft.operators.TextAnalysis.tokens(col("text"))).as("_tok"))
      .select(col("doc_id"), col("_tgt"), xxhash64(col("_tok")).as("_th"))
    val tokCnt = toks.groupBy(col("_th"))
      .agg(count(lit(1)).as("_cr"),
        coalesce(sum(when(col("_tgt"), 1L)), lit(0L)).as("_ct"))
    def stage(name: String, f: () => Unit): Unit = {
      f() // warm
      val t0 = System.nanoTime(); f()
      println(f"[dsir-stage] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    stage("tokenize+hash     ", () => toks.write.mode("overwrite").format("noop").save())
    stage("  + dual-count agg", () => tokCnt.write.mode("overwrite").format("noop").save())

    composed(); fused() // warm both
    val (ca, fa) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (i <- 0 until reps) { ca(i) = time(composed _); fa(i) = time(fused _) }
    println(f"[dsir-ab] composed best=${ca.min}%.3f all=${ca.map(t => f"$t%.2f").mkString(",")}")
    println(f"[dsir-ab] fused    best=${fa.min}%.3f all=${fa.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
