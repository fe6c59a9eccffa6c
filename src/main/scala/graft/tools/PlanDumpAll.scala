package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query (or a named
  * subset) to one file per query — the optimization-round evidence
  * files (`plans/r15/<query>_<suffix>.txt`). Planning only, nothing
  * executes.
  *
  * Usage: runMain graft.tools.PlanDumpAll <outDir> <suffix> [sfDir] [q1,q2,...]
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: PlanDumpAll <outDir> <suffix> [sfDir] [names]"))
    val suffix = args.lift(1).getOrElse("before")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val only = args.lift(3).map(_.split(',').toSet)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    sel.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      } catch {
        case t: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
      }
    }
    println(s"wrote ${sel.size} plans to $outDir (suffix $suffix)")
    spark.stop()
  }
}
