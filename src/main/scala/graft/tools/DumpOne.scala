package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump ONE declared query's result to parquet for an arbitrary data dir —
  * the Verify single-query slice, for spot correctness checks on corpora
  * where running all ~170 queries is wasteful (e.g. the 100× rung, whose
  * directory only materializes documents/embeddings).
  * Usage: runMain graft.tools.DumpOne <query> <sfDir> <outDir>
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
