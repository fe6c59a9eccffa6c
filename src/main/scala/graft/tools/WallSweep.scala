package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry

/** One-JVM sweep of the two bench-harness knobs that bound the concurrent
  * wall — submitter-thread count and shuffle partitions — to separate real
  * levers from machine weather. The wall at sf0.1 is scheduling-bound
  * (sum/32 ≈ 0.9 s vs ~6 s observed), so the suspects are submitter
  * parallelism (planning happens on submitter threads) and per-stage task
  * count on the single-threaded DAGScheduler event loop.
  *
  * Harness only — not part of the library surface. Prints one line per
  * (threads, shuffleParts) cell: min of `passes` wall passes.
  */
object WallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SWEEP_PASSES", "2").toInt
    val threadGrid = sys.env.getOrElse("SWEEP_THREADS", "8,12,16,20,24,32")
      .split(",").map(_.trim.toInt).toSeq
    val partGrid = sys.env.getOrElse("SWEEP_PARTS", "8")
      .split(",").map(_.trim.toInt).toSeq
    val fanGrid = sys.env.getOrElse("SWEEP_FANOUT", "32")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm: JIT + codegen cache + page cache, and LPT estimates
    val warm = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val byLongest = queries.sortBy { case (name, _) => -warm(name) }

    def wallPass(submitters: Int): Double = {
      val pool = Executors.newFixedThreadPool(submitters)
      val t0 = System.nanoTime()
      byLongest.foreach { case (_, fn) =>
        pool.submit(new Runnable {
          def run(): Unit =
            try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
        })
      }
      pool.shutdown()
      require(pool.awaitTermination(30, TimeUnit.MINUTES), "pass hung")
      (System.nanoTime() - t0) / 1e9
    }

    // interleave cells round-robin across passes: ambient load on this
    // box swings 2-10× over minutes, so consecutive passes of one cell
    // confound the setting with the weather — rotating through all cells
    // each round spreads every cell across the same windows
    val cells = for (fan <- fanGrid; parts <- partGrid; threads <- threadGrid)
      yield (fan, parts, threads)
    val acc = scala.collection.mutable.Map[(Int, Int, Int), List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to passes; cell @ (fan, parts, threads) <- cells) {
      spark.conf.set(graft.core.Tables.fanoutKey, fan.toString)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val w = wallPass(threads)
      acc(cell) = acc(cell) :+ w
      println(f"[pass] fan=$fan%-3d parts=$parts%-3d threads=$threads%-3d wall=$w%.2f")
    }
    for (cell @ (fan, parts, threads) <- cells) {
      val ws = acc(cell)
      println(f"[sweep] fan=$fan%-3d parts=$parts%-3d threads=$threads%-3d walls=${ws.map(w => f"$w%.2f").mkString(",")} min=${ws.min}%.2f")
    }
    spark.stop()
  }
}
