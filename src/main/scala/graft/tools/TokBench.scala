package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Interleaved A/B microbench for the tokenizer hot path: the native
  * WhitespaceTokens byte-scan vs the regex `split("\\s+")` + filter
  * form, same session, alternating reps (sibling-tenant noise hits both
  * arms equally). Also times the n-gram fingerprint construction both
  * ways. Usage: TokBench [sfDir] [reps]
  */
object TokBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench10x")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").cache()
    docs.count()

    val regexToks = filter(split(col("text"), "\\s+"), t => length(t) > 0)

    def time(label: String, thunk: () => Unit): Double = {
      val t0 = System.nanoTime(); thunk(); (System.nanoTime() - t0) / 1e9
    }
    val arms: Seq[(String, () => Unit)] = Seq(
      "native_count" -> (() => docs.select(sum(size(TextAnalysis.tokens(col("text"))))).collect()),
      "regex_count " -> (() => docs.select(sum(size(regexToks))).collect()),
      "fused_5gram " -> (() => docs.select(sum(size(
        TextAnalysis.ngramFingerprints(col("text"), 5)))).collect()),
      "hof_5gram   " -> (() => docs.select(sum(size(
        TextAnalysis.ngramFingerprintsComposed(TextAnalysis.tokens(col("text")), 5)))).collect()),
      "regex_5gstr " -> (() => docs.select(sum(size(TextAnalysis.bindOnce(regexToks, ts =>
        when(size(ts) >= 5, array_distinct(transform(sequence(lit(0), size(ts) - 5),
          i => array_join(slice(ts, i + 1, lit(5)), " "))))
          .otherwise(array().cast("array<string>")))))).collect()))

    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (l, f) => acc(l) = time(l, f) :: acc(l) }
    }
    arms.foreach { case (l, _) =>
      val ts = acc(l)
      println(f"[tokbench] $l best=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
