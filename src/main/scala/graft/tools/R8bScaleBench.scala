package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 continuation scale rows: the session's new operators —
  * BPE tokenizer training (q146), trained-tokenizer corpus costing
  * (q148), and retrieval-metrics eval (q145) — at 10×/100× in-memory
  * replication. Same discipline as R7/R8ScaleBench: sf0.1 replicated
  * with offset ids; documents get per-copy-unique even tokens (the
  * R8Materialize10x construction) so the VOCABULARY grows with
  * replication — the honest stress for vocabulary-frame operators;
  * embeddings get per-copy rotations so the retrieval corpus grows
  * with genuinely new vectors while the query set stays the fixed
  * 20 vectors of copy 0 (the operator's declared posture: corpus
  * scales, query set doesn't).
  *
  * Usage: sbt "runMain graft.tools.R8bScaleBench [replication]"
  */
object R8bScaleBench {
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

    val docs = (0 until repl).map(i =>
        spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("doc_id", col("doc_id") + lit(i * 5000L))
          .withColumn("text", array_join(transform(
            graft.operators.TextAnalysis.tokens(col("text")),
            (t, p) => when(p % 2 === 0, concat(lit(s"c${i}_"), t)).otherwise(t)),
            " ")))
      .reduce(_.unionByName(_)).persist()
    val nDocs = docs.count()
    val emb = (0 until repl).map { i =>
        val s = (i * 7) % 64
        val v = col("embedding")
        spark.read.parquet(s"$dir/embeddings.parquet")
          .withColumn("vec_id", col("vec_id") + lit(i * 2000L))
          .withColumn("embedding",
            if (s == 0) v else concat(slice(v, s + 1, 64 - s), slice(v, 1, s)))
      }
      .reduce(_.unionByName(_)).persist()
    val nVec = emb.count()
    println(s"corpus: $nDocs docs, $nVec vectors (${repl}x)")

    def timeOver(label: String, denom: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.1f s, $n rows, ${sec * 1e6 / denom}%.2f us/row")
    }

    timeOver("q146_bpe_merges (6 rounds over the grown vocab)", nDocs) {
      graft.operators.Tokenizer.bpeTrainMerges(docs, "text", 6).count()
    }

    timeOver("q148_bpe_corpus_cost (train + vocab-join costing)", nDocs) {
      val costs = graft.operators.Tokenizer.bpeVocabCosts(docs, "text", 6)
      docs.select(col("source"),
          explode(graft.operators.TextAnalysis.tokens(col("text"))).as("word"))
        .groupBy(col("source"), col("word")).agg(count(lit(1)).as("_n"))
        .join(costs, "word")
        .groupBy(col("source"))
        .agg(sum(col("_n")).as("ws"), sum(col("_n") * col("n_bpe")).as("bpe"))
        .count()
    }

    timeOver("q145_retrieval_metrics (fixed 20-query set, grown corpus)", nVec) {
      graft.operators.Similarity.retrievalMetrics(
        emb, emb.filter(col("vec_id") < 2000 && col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 10, bucketBits = 4).count()
    }

    spark.stop()
  }
}
