package graft.tools

import org.apache.spark.sql.SparkSession

/** Print one query's initial physical plan (pre-AQE) plus its census row —
  * the single-query debugging face of [[PlanReport]].
  * Usage: runMain graft.tools.PlanOne <queryName> [sfDir]
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanOne <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
    println(plan.toString)
    val c = PlanReport.census(plan)
    println(s"census: shuffles=${c.shuffles} broadcasts=${c.broadcasts} loops=${c.loops} pushed=${c.pushed} scans=${c.scans}")
    spark.stop()
  }
}
