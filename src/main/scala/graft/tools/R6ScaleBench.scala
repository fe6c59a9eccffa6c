package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 scale rows (r5 judge item 6): the round-5 heavy operators at
  * 10×/100× replication — n-gram Jaccard pairs (q71 shape), repeated
  * spans (q73 shape), BM25 (q77 shape) — plus forced-DISTRIBUTED
  * connected components on a generated graph well past the
  * `ccLocalMaxEdges` driver threshold, so the star-round loop itself is
  * what's timed (every prior measurement of q75 took the driver path).
  *
  * Same discipline as QueryScaleBench/DedupScaleBench: sf0.1 corpus
  * replicated in memory with offset ids, the metric is the SCALING RATIO.
  * μs/doc flat across 10×→100× = linear operator.
  *
  * Usage: sbt "runMain graft.tools.R6ScaleBench [replication]"
  */
object R6ScaleBench {
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

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until repl)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_))
      .persist()
    val nDocs = big.count()
    println(s"corpus: $nDocs docs (${repl}x replication)")

    def timeOver(label: String, denom: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.1f s, $n rows, ${sec * 1e6 / denom}%.1f us/doc")
    }
    def time(label: String)(f: => Long): Unit = timeOver(label, nDocs)(f)

    // q71 outputs PAIRS: identical replicas would make the true-pair set
    // grow quadratically in repl (a workload artifact — real crawls keep
    // cluster sizes constant as the corpus grows). Rewriting every 7th
    // token per copy with a copy-unique token kills ~3/7 of each copy's
    // trigrams, pushing cross-copy Jaccard well under the 0.5 threshold
    // (prefix salting is NOT enough on long docs — measured 239k pairs),
    // so output stays ~repl× and the row measures the OPERATOR's
    // scaling, not the output explosion.
    // jaccard caps at 30×: its shingle inverted index shuffles ~0.8 GB per
    // replica of text-bearing rows, and 100× (>80 GB of shuffle scratch)
    // exceeds this shared box's free disk — a cluster has per-node scratch;
    // the 10×→30× ratio is the linearity evidence either way.
    // Perturbation: every EVEN-position token is replaced with a
    // copy-unique token, so every trigram of copy i contains a c<i>_
    // token and NO trigram is shared across copies — zero cross-copy LSH
    // candidates (a 1/7-density same-position variant left same-mod
    // copies sharing 4/7 of their trigrams: candidate verification went
    // quadratic in repl and 30× measured 10× the per-doc cost). Within a
    // copy both members of a planted near-dup pair perturb identically,
    // so the true-pair structure replicates — the real-crawl shape
    // (corpus grows, duplicate-cluster size constant).
    val jaccardRepl = math.min(repl, 30)
    val salted = (0 until jaccardRepl)
      .map { i =>
        docs
          .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", array_join(
            transform(split(col("text"), "\\s+"),
              (t, j) => when(pmod(j, lit(2)) === lit(0), concat(lit(s"c${i}_"), t))
                .otherwise(t)), " "))
      }
      .reduce(_.unionByName(_))
      .persist()
    val nSalted = salted.count()
    timeOver(s"ngram-jaccard ${jaccardRepl}x salted", nSalted)(
      graft.operators.Dedup.ngramJaccardPairs(
        salted, "doc_id", "text", shingleN = 3, threshold = 0.5).count())
    salted.unpersist()
    time(s"repeated-spans ${repl}x")(
      graft.operators.Dedup.repeatedSpans(
        big, "doc_id", "text", gramN = 5, minCount = 2).count())
    time(s"bm25 ${repl}x")(
      graft.operators.Retrieval.bm25(
        big, "doc_id", "text", Seq("dup", "vector", "hash")).count())

    // forced-distributed connected components: nRings disjoint rings of
    // equal length P plus a half-way chord per node — 2·nodes edges, far
    // above the 2M driver threshold; components must come out = nRings.
    // Node id belongs to ring (id % nRings) at position (id DIV nRings);
    // both edge targets stay inside the node's own ring.
    val nodes = 2000000L * repl / 10
    val nRings = 1000L
    val perRing = nodes / nRings
    val ids = spark.range(nodes)
    def ringNeighbor(offset: Column): Column =
      col("id") % nRings + ((expr(s"id DIV $nRings") + offset) % perRing) * nRings
    val edges = ids.select(col("id").as("id_a"), ringNeighbor(lit(1L)).as("id_b"))
      .union(ids.select(col("id").as("id_a"), ringNeighbor(lit(perRing / 2)).as("id_b")))
    val prevLocal = graft.operators.Dedup.ccLocalMaxEdges
    try {
      graft.operators.Dedup.ccLocalMaxEdges = 0L // force star rounds
      time(s"connected-components DISTRIBUTED ${nodes / 1000000}M nodes") {
        val cc = graft.operators.Dedup.connectedComponents(edges, "id_a", "id_b")
        val comps = cc.select(countDistinct(col("component"))).head().getLong(0)
        println(s"  components: $comps (expected $nRings)")
        comps
      }
    } finally graft.operators.Dedup.ccLocalMaxEdges = prevLocal
    spark.stop()
  }
}
