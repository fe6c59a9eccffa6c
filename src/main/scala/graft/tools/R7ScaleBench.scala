package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 scale rows (r6 judge item 6): the round-6 analytics operators
  * (q117–q132 shapes) at 10×/100× in-memory replication, plus the two r7
  * percentile rewrites (q92/q127) whose whole point is behavior at scale.
  *
  * Same discipline as QueryScaleBench/R6ScaleBench: the sf0.1 tables
  * replicated with offset keys, the metric is the SCALING RATIO — μs/row
  * flat (or falling) across 10×→100× = linear operator.
  *
  * Replication constructions, chosen so the TRUE output grows ~linearly
  * (workload realism — see R6ScaleBench's q71 note):
  *  - orders/lineitem: surrogate keys offset per copy; low-cardinality
  *    group keys (status/priority/returnflag) are NOT offset, so groups
  *    grow 100× in SIZE — exactly the stress the q92/q127 bucketed
  *    percentile rewrite exists for.
  *  - documents: every even-position token is rewritten per-copy-unique
  *    (R6ScaleBench's construction), so vocabulary, bigram tables, and
  *    per-source distinct-gram sets grow ~repl× instead of staying flat.
  *  - embeddings: each copy's vectors are circularly shifted by a
  *    copy-distinct offset — near-identical vectors stay near-dups only
  *    WITHIN a copy, so the LSH dedup's true pair set grows ~repl×, not
  *    repl²× (identical replicas would plant a quadratic pair explosion,
  *    a workload artifact).
  *
  * Usage: sbt "runMain graft.tools.R7ScaleBench [replication]"
  */
object R7ScaleBench {
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

    val lineitem = (0 until repl).map(i =>
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"), col("l_tax")))
      .reduce(_.unionByName(_)).persist()
    val nLi = lineitem.count()

    // per-copy-unique even tokens (vocab grows ~repl×)
    val docs = (0 until repl).map { i =>
        val d = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text"))
        d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", array_join(transform(
            graft.operators.TextAnalysis.tokens(col("text")),
            (t, p) => when(p % 2 === 0, concat(lit(s"c${i}_"), t)).otherwise(t)),
            " "))
      }.reduce(_.unionByName(_)).persist()
    val nDocs = docs.count()

    // circular shift per copy: cross-copy cosine collapses, within-copy
    // structure (and its near-dup pairs) is preserved exactly
    val emb = (0 until repl).map { i =>
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("v"))
        val s = (i * 7) % 64
        e.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("v",
            if (s == 0) col("v")
            else concat(slice(col("v"), s + 1, 64 - s), slice(col("v"), 1, s)))
      }.reduce(_.unionByName(_)).persist()
    val nEmb = emb.count()

    println(s"corpus: $nOrders orders, $nLi lineitem, $nDocs docs, $nEmb vecs (${repl}x)")

    def timeOver(label: String, denom: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.1f s, $n rows, ${sec * 1e6 / denom}%.2f us/row")
    }

    import graft.operators.{Analytics, Relational}

    timeOver("q92_percentile_cont (bucketed exact, 3 groups)", nOrders) {
      Relational.percentileContExact(orders, "o_orderstatus", "o_totalprice",
        Seq("p30" -> 0.3, "p60" -> 0.6, "p90" -> 0.9)).count()
    }
    timeOver("q127_mad_outliers (bucketed exact medians)", nOrders) {
      Analytics.madOutlierStats(orders, "o_orderpriority", "o_totalprice",
        cutoff = 3.0).count()
    }
    timeOver("q122_ewma", nOrders) {
      Analytics.ewmaLast(orders, "o_custkey",
        Seq("o_orderdate", "o_orderkey"), "o_totalprice", alpha = 0.3).count()
    }
    timeOver("q124_running_distinct", nOrders) {
      Analytics.runningDistinct(
        orders.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        "o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderpriority").count()
    }
    timeOver("q119_gap_islands", nOrders) {
      graft.SparkEntry.queries // touch: same shape inline below
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("mi"))
      orders.select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("mi"))
        .distinct()
        .withColumn("grp", col("mi") - row_number().over(w))
        .groupBy(col("o_custkey"), col("grp"))
        .agg(count(lit(1)).as("len")).filter(col("len") >= 3).count()
    }
    timeOver("q120_snapshot_diff", nOrders) {
      val o = orders.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      def asOf(cut: String): DataFrame =
        graft.operators.Snapshot.latestByKey(
          o.filter(col("o_orderdate") <= lit(cut)),
          keyCols = Seq("o_custkey"), versionCols = Seq("o_orderdate", "o_orderkey"))
      val t1 = asOf("1997-01-01").select(col("o_custkey"), col("o_orderkey").as("k1"))
      val t2 = asOf("1999-01-01").select(col("o_custkey"), col("o_orderkey").as("k2"))
      t2.join(t1, Seq("o_custkey"), "left")
        .agg(count(lit(1)).as("n_t2"),
          sum(when(col("k1").isNull, 1L).otherwise(0L)).as("added")).count()
    }
    timeOver("q123_profile (4 cents cols)", nLi) {
      val cents = lineitem.select(Seq("l_quantity", "l_extendedprice",
        "l_discount", "l_tax").map(c =>
          round(col(c) * 100, 0).cast("long").as(c)): _*)
      Analytics.columnProfile(cents,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).count()
    }
    timeOver("q126_weighted_median", nLi) {
      Analytics.weightedMedian(lineitem,
        Seq("l_returnflag", "l_linestatus"), "l_quantity",
        round(col("l_extendedprice") * 100, 0).cast("long")).count()
    }
    timeOver("q128_bigram_lm", nDocs) {
      Analytics.bigramConditionalTop(docs, "source", "text", k = 3).count()
    }
    timeOver("q131_source_overlap", nDocs) {
      Analytics.corpusOverlapMatrix(docs, "source", "text", n = 5).count()
    }
    timeOver("q132_zipf_fit", nDocs) {
      Analytics.zipfFit(docs, "source", "text").count()
    }
    timeOver("q121_feature_hash", nDocs) {
      val bucket = pmod(
        conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long"), lit(64))
      docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
        .select(col("doc_id"), bucket.as("bucket"))
        .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt")).count()
    }
    timeOver("q118_topk_agg", nDocs) {
      Relational.topKPerGroup(
        docs.select(col("source"), length(col("text")).cast("double").as("score"),
          col("doc_id")),
        groupCols = Seq("source"), scoreCol = "score", idCol = "doc_id", k = 3).count()
    }
    // planesPerBand grows with log2(N): fixed signature bits saturate the
    // 2^p band buckets as N grows, sending candidate pairs quadratic
    // (measured: 8 bits = 1.1 ms/vec at 20k vecs vs 0.7 at 2k). Holding
    // expected bucket occupancy ~constant (p ≈ log2(N/8)) keeps the
    // verified-candidate frame ~linear; recall for genuine near-dups
    // (cos ≥ 0.99) stays ≥ 1 − 8·(1 − 0.9955^p) ≈ 1 at these sizes.
    val planes = math.max(8, math.ceil(math.log(nEmb / 8.0) / math.log(2)).toInt)
    timeOver(s"q130b_semdedup_lsh (banded + keep rule, $planes planes/band)", nEmb) {
      graft.operators.Dedup.embeddingDedup(emb, "vec_id", "v",
        bands = 8, planesPerBand = planes, threshold = 0.95, dim = 64).count()
    }
    timeOver("q129_hard_negatives (fixed 20-probe set)", nEmb) {
      Analytics.hardNegatives(emb, "vec_id", "v", "label",
        col("vec_id") % 29 === 0 && col("vec_id") < 580).count()
    }
    // events replicated with offset users: per-user history depth stays
    // constant, user count grows repl× — the real shape of event growth
    val ev0 = graft.core.Tables.loadEvents(spark, dir) // nanosAsLong handled
    val events = (0 until repl).map(i =>
        ev0.withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
      .reduce(_.unionByName(_))
      .persist()
    val nEvents = events.count()
    println(s"events: $nEvents rows")

    timeOver("q134_funnel shape", nEvents) {
      val t1 = events.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = events.filter(col("event_type") === "click")
        .join(t1, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      t2.count()
    }
    timeOver("q135_retention shape", nEvents) {
      val e = events.select(col("user_id"), col("event_time").cast("date").as("d"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
      e.distinct().join(cohort, Seq("user_id"))
        .withColumn("off", datediff(col("d"), col("d0")).cast("long"))
        .filter(col("off").isin(0L, 1L, 7L))
        .groupBy(col("d0"), col("off"))
        .agg(countDistinct(col("user_id")).as("n_users")).count()
    }
    timeOver("q136_attribution shape", nEvents) {
      graft.streaming.EventStreams.attributedClicks(events).count()
    }
    timeOver("q137_sliding shape", nEvents) {
      graft.streaming.EventStreams.slidingCounts(
        events, "10 minutes", "5 minutes").count()
    }

    // ---- q138 skew-join experiment: one hot key holds HALF the probe.
    // Broadcast disabled (the regime salting exists for: build too large
    // or long-lived to broadcast); plain SMJ measured with AQE's runtime
    // skew split ON and OFF, salted join with AQE OFF — the question is
    // whether the declarative salt matches AQE's runtime fix where AQE
    // isn't available (streaming microbatches, non-AQE engines).
    {
      val probe = orders.select(
        when(col("o_orderkey") % 2 === 0, lit("hot"))
          .otherwise((col("o_orderkey") % 10000).cast("string")).as("k"),
        col("o_orderkey"))
      val build = spark.range(0, 10001).select(
        when(col("id") === 10000, lit("hot"))
          .otherwise(col("id").cast("string")).as("k"),
        (col("id") * 7).as("bv"))
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        timeOver("skew join: plain SMJ, AQE skew-split ON", nOrders) {
          probe.join(build, Seq("k")).count()
        }
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        timeOver("skew join: plain SMJ, AQE OFF (hot key single-reducer)", nOrders) {
          probe.join(build, Seq("k")).count()
        }
        timeOver("skew join: saltedJoin(16), AQE OFF", nOrders) {
          graft.operators.Relational.saltedJoin(
            probe, build, "k", saltBuckets = 16,
            probeSaltCol = col("o_orderkey")).count()
        }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }

    timeOver("q117_triangles (3 modular edges/doc)", nDocs) {
      val nn = docs.agg(count(lit(1)).as("_n"))
      val base = docs.select(col("doc_id")).crossJoin(broadcast(nn))
      val edges = Seq(
          ((col("doc_id") + 1) % col("_n")),
          ((col("doc_id") * 2) % col("_n")),
          ((col("doc_id") * 3 + 1) % col("_n")))
        .map(d => base.select(col("doc_id").as("src"), d.as("dst")))
        .reduce(_.unionAll(_))
      graft.operators.Graph.triangleCount(edges, "src", "dst").count()
    }
    spark.stop()
  }
}
