package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, TextAnalysis}

/** Stage-by-stage timing of the minhashDedup big path on an N×-replicated
  * corpus — diagnostic companion to [[DedupScaleBench]] for locating
  * where wall time goes when the replication factor grows.
  *
  * Usage: sbt "runMain graft.tools.DedupScaleProfile [replication]"
  */
object DedupScaleProfile {
  def main(args: Array[String]): Unit = {
    val repl = args.headOption.map(_.toInt).getOrElse(100)
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
    println(s"corpus: ${big.count()} docs (${repl}x)")
    println(s"estimated size: ${big.queryExecution.optimizedPlan.stats.sizeInBytes}")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // replicate the big path of minhashDedup stage by stage
    val numHashes = 32; val bands = 8; val shingleN = 3
    val shingled = big.select(
      col("doc_id").as("_id"),
      array_distinct(TextAnalysis.shingleHashes(col("text"), shingleN)).as("_sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("shingle+persist")(shingled.count())

    val sorted = array_sort(col("_sh"))
    val keyed = shingled.select(col("_id"),
      xxhash64(sorted).as("_ck1"), xxhash64(lit(1), sorted).as("_ck2"))
    val repOf = keyed.groupBy(col("_ck1"), col("_ck2")).agg(min(col("_id")).as("_rep"))
    val exactLosers = keyed.join(repOf, Seq("_ck1", "_ck2"))
      .filter(col("_id") =!= col("_rep"))
      .select(col("_id").as("_loser"))
    val repIds = repOf.select(col("_rep").as("_id"))
    time("exactLosers count")(println(s"    n=${exactLosers.count()}"))

    val rowsPerBand = numHashes / bands
    val reps = shingled.join(repIds, "_id")
    val bandedBase = reps
      .select(col("_id"),
        Dedup.minhashSignatureFromShingles(col("_sh"), numHashes).as("_sig"))
      .select(col("_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(b, slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnsRenamed(Map("pos" -> "_band", "col" -> "_bkey"))
    val banded = bandedBase.persist(StorageLevel.MEMORY_AND_DISK)
    time("band+persist")(banded.count())

    val bucketMin = banded.groupBy(col("_band"), col("_bkey"))
      .agg(min(col("_id")).as("_cand"))
    val candidates = banded.join(bucketMin, Seq("_band", "_bkey"))
      .filter(col("_cand") < col("_id"))
      .select(col("_id"), col("_cand"))
    time("candidates count")(println(s"    n=${candidates.count()}"))

    val nearLosers = candidates
      .join(shingled.withColumnsRenamed(Map("_id" -> "_cand", "_sh" -> "_sh_c")), "_cand")
      .join(shingled, "_id")
      .filter(Dedup.jaccard(col("_sh"), col("_sh_c")) >= 0.8)
      .select(col("_id").as("_loser"))
    time("nearLosers count")(println(s"    n=${nearLosers.count()}"))

    val all = time("full minhashDedup")(
      Dedup.minhashDedup(big, "doc_id", "text", numHashes = 32, bands = 8).count())
    println(s"survivors: $all")
    spark.stop()
  }
}
