package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query (or a named
  * subset) to one file per query — the optimization-round evidence
  * files (`plans/r16/<query>_<suffix>.txt`). Planning only, nothing
  * executes.
  *
  * Usage: runMain graft.tools.PlanDumpAll <outDir> <suffix> [sfDir] [q1,q2,...]
  *
  * r16 (ADVICE): per-query failures are COUNTED and reported
  * ("wrote N ok, M failed"), failures are excluded from the written
  * count, and the exit code is non-zero when any dump failed — an
  * evidence run can no longer silently produce an incomplete plans/
  * directory. A query-name list passed in the sfDir slot (comma, or a
  * bare known query name) is rejected loudly instead of being treated
  * as a bogus data directory that fails every query to stderr only.
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: PlanDumpAll <outDir> <suffix> [sfDir] [names]"))
    val suffix = args.lift(1).getOrElse("before")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    require(!sfDir.contains(',') && !graft.SparkEntry.queries.contains(sfDir),
      s"arg 3 is the DATA DIRECTORY, got what looks like a query list: '$sfDir' " +
        "(usage: PlanDumpAll <outDir> <suffix> [sfDir] [q1,q2,...])")
    val only = args.lift(3).map(_.split(',').toSet)
    only.foreach { names =>
      val unknown = names -- graft.SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(",")}")
    }
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
    var failed = 0
    sel.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      } catch {
        case t: Throwable =>
          failed += 1
          System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
      }
    }
    println(s"wrote ${sel.size - failed} ok, $failed failed to $outDir (suffix $suffix)")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
