package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible dedup scaling experiment (PERF.md §dedup-scaling):
  * replicate the sf0.1 documents table `REPL`× so every doc sits in a
  * duplicate cluster of size REPL (the web-crawl shape), time the two
  * near-dup dedup operators, and assert survivor-set exactness against
  * the 1× run.
  *
  * Usage: sbt "runMain graft.tools.DedupScaleBench [replication]"
  */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    val repl = args.headOption.map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until repl)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_))
      .persist()
    println(s"corpus: ${big.count()} docs (${repl}x replication)")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n survivors")
    }
    time(s"minhash ${repl}x")(
      graft.operators.Dedup.minhashDedup(big, "doc_id", "text",
        numHashes = 32, bands = 8).count())
    time(s"simhash ${repl}x")(
      graft.operators.Dedup.simhashDedup(big, "doc_id", "text").count())

    // exactness: every replica is a perfect duplicate, so the REPL× corpus
    // must dedup to precisely the 1× survivor set (smallest ids = copy 0)
    val one = graft.operators.Dedup.minhashDedup(docs, "doc_id", "text",
      numHashes = 32, bands = 8)
      .select("doc_id").as(Encoders.scalaLong).collect().toSet
    val many = graft.operators.Dedup.minhashDedup(big, "doc_id", "text",
      numHashes = 32, bands = 8)
      .select("doc_id").as(Encoders.scalaLong).collect().toSet
    println(s"exact: ${many == one} (1x=${one.size}, ${repl}x=${many.size})")
    spark.stop()
  }
}
