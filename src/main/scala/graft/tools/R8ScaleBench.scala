package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 scale rows (r7 judge item 3): the round-7 additions
  * q138–q143 at 10×/100× in-memory replication — salted join, bucketed
  * co-located join, correlated/lateral SQL decorrelation, PSI drift,
  * A/B z-test. Same discipline as R6/R7ScaleBench: sf0.1 replicated
  * with offset surrogate keys (low-cardinality group keys NOT offset,
  * so groups grow in size), metric is μs/row flat-or-falling across
  * 10×→100× = linear operator.
  *
  * q139's one-time bucketed WRITE is timed separately from the
  * exchange-free read join it buys — the whole point of the layout is
  * paying the shuffle once at write time.
  *
  * Usage: sbt "runMain graft.tools.R8ScaleBench [replication]"
  */
object R8ScaleBench {
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

    val orders = (0 until repl).map(i =>
        spark.read.parquet(s"$dir/orders.parquet")
          .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
      .reduce(_.unionByName(_)).persist()
    val nOrders = orders.count()
    val customer = (0 until repl).map(i =>
        spark.read.parquet(s"$dir/customer.parquet")
          .withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L)))
      .reduce(_.unionByName(_)).persist()
    val nCust = customer.count()
    val events = (0 until repl).map(i =>
        graft.core.Tables.loadEvents(spark, dir)
          .withColumn("event_id", col("event_id") + lit(i * 100000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_)).persist()
    val nEvents = events.count()
    println(s"corpus: $nOrders orders, $nCust customers, $nEvents events (${repl}x)")

    def timeOver(label: String, denom: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.1f s, $n rows, ${sec * 1e6 / denom}%.2f us/row")
    }

    import graft.operators.{Analytics, Relational}

    timeOver("q138_salted_join (16 salts, dim agg + join)", nOrders) {
      val dim = orders.groupBy(col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("prio_n"),
          round(avg(col("o_totalprice")), 6).as("prio_avg"))
        .withColumnRenamed("prio", "o_orderpriority")
      Relational.saltedJoin(
        orders.filter(col("o_orderkey") % 37 === 0)
          .select(col("o_orderkey"), col("o_orderpriority")),
        dim, "o_orderpriority", saltBuckets = 16,
        probeSaltCol = col("o_orderkey")).count()
    }

    // q139: the bucketed layout — write cost (once) vs the
    // exchange-free join it buys on every subsequent query
    val to = s"graft_r8scale_orders_$repl"
    val tc = s"graft_r8scale_cust_$repl"
    timeOver("q139_bucketed_join WRITE (one-time layout cost)", nOrders) {
      graft.operators.Export.writeBucketed(
        orders.filter(col("o_orderkey") % 19 === 0)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        to, Seq("o_custkey"), buckets = 8)
      graft.operators.Export.writeBucketed(
        customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        tc, Seq("c_custkey"), buckets = 8)
      spark.table(to).count()
    }
    timeOver("q139_bucketed_join READ (exchange-free SMJ)", nOrders) {
      spark.table(to)
        .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
        .count()
    }
    spark.sql(s"DROP TABLE IF EXISTS $to")
    spark.sql(s"DROP TABLE IF EXISTS $tc")

    orders.createOrReplaceTempView("r8_orders")
    customer.createOrReplaceTempView("r8_customer")
    timeOver("q140_correlated_subq (decorrelated scalar aggs + EXISTS)", nCust) {
      spark.sql(
        """SELECT c_custkey,
                  (SELECT count(*) FROM r8_orders o
                   WHERE o.o_custkey = c.c_custkey) AS n_orders,
                  (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM r8_orders o
                   WHERE o.o_custkey = c.c_custkey) AS max_price,
                  EXISTS(SELECT 1 FROM r8_orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 300000) AS has_big
           FROM r8_customer c
           WHERE c_custkey % 50 = 0""").count()
    }
    timeOver("q141_lateral_topk (lateral limit -> ranked window join)", nCust) {
      spark.sql(
        """SELECT c.c_custkey, t.o_orderkey,
                  CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
           FROM r8_customer c, LATERAL (
             SELECT o_orderkey, o_totalprice FROM r8_orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
           WHERE c.c_custkey % 100 = 0""").count()
    }

    timeOver("q142_psi (20-bin drift, two map-side histograms)", nOrders) {
      Analytics.populationStability(
        orders.filter(col("o_orderdate") < lit("1997-01-01")),
        orders.filter(col("o_orderdate") >= lit("1997-01-01")),
        "o_totalprice", lo = 0.0, hi = 600000.0, buckets = 20).count()
    }
    timeOver("q143_ab_test (per-user collapse + one global agg)", nEvents) {
      Analytics.abTest(events, "user_id",
        col("event_type") === "purchase" && col("value") > 150).count()
    }

    spark.stop()
  }
}
