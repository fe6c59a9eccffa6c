package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rows for the round-6 CONTINUATION heavy operators — segment
  * dedup (q106), PageRank (q107), PassJoin edit-distance join (q113),
  * containment join (q116) — at replication factors of the sf0.1 corpus.
  * Same discipline as R6ScaleBench: per-unit cost flat/falling as the
  * corpus grows = linear operator.
  *
  * Pair-output workload design (the R6ScaleBench lesson): identical
  * replicas are the WRONG experiment for pair-output operators — the
  * true-pair set itself grows quadratically in the duplication factor.
  *   - containment: every even-position token gets a copy-unique prefix
  *     (q71's exact salting), so copies share zero 5-grams and output
  *     stays ~repl×;
  *   - edit-distance: each copy's string gets a 4-char `abab` tag (a, b
  *     drawn independently from the copy index), so any two distinct
  *     tags differ in ≥ 2 positions — cross-copy distance > τ=1 by
  *     construction, within-copy pair structure replicates;
  *   - segment dedup replicates UNPERTURBED on purpose: a corpus of
  *     exact re-posts is that operator's real workload, output stays one
  *     row per document, and the hot winner-election groups (one segment
  *     shared by all copies) are exactly the skew the 24-byte agg must
  *     absorb.
  *
  * Usage: sbt "runMain graft.tools.R6bScaleBench [replication]"
  */
object R6bScaleBench {
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
      println(f"$label: $sec%.1f s, $n rows, ${sec * 1e6 / denom}%.1f us/unit")
    }

    timeOver(s"segment-dedup ${repl}x (exact re-post corpus)", nDocs)(
      graft.operators.Dedup.segmentDedup(big, "doc_id", "text", segTokens = 8)
        .count())

    // PageRank on the q107 synthetic graph over repl× the node count
    val nNodes = nDocs
    val ids = spark.range(nNodes).select(col("id").as("doc_id"))
    val edges =
      ids.select(col("doc_id").as("src"), ((col("doc_id") * 31 + 17) % nNodes).as("dst"))
        .unionAll(ids.select(col("doc_id").as("src"),
          ((col("doc_id") * 97 + 43) % nNodes).as("dst")))
    timeOver(s"pagerank-3it ${repl}x (${nNodes / 1000}k nodes)", nNodes)(
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3).count())

    // edit-distance join: 4-token prefixes + cross-copy abab tag
    val tagged = (0 until repl).map { i =>
      val a = ('a' + i % 10).toChar; val b = ('a' + i / 10).toChar
      docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("prefix", concat(lit(s"$a$b$a$b "),
          array_join(slice(graft.operators.TextAnalysis.tokens(col("text")), 1, 4), " ")))
        .select(col("doc_id"), col("prefix"))
    }.reduce(_.unionByName(_)).persist()
    val nTagged = tagged.count()
    timeOver(s"editdist-join ${repl}x tagged", nTagged)(
      graft.operators.Linkage.editDistanceSelfJoin(tagged, "doc_id", "prefix", tau = 1)
        .count())
    tagged.unpersist()

    // containment join: q71's even-position copy-unique salting
    val salted = (0 until repl).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", array_join(
          transform(split(col("text"), "\\s+"),
            (t, j) => when(pmod(j, lit(2)) === lit(0), concat(lit(s"c${i}_"), t))
              .otherwise(t)), " "))
    }.reduce(_.unionByName(_)).persist()
    val nSalted = salted.count()
    timeOver(s"containment-join ${repl}x salted", nSalted)(
      graft.operators.Linkage.containmentSelfJoin(
        salted, "doc_id", "text", n = 5, minContainment = 0.5).count())
    salted.unpersist()

    spark.stop()
  }
}
