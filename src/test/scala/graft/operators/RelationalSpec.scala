package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("bandJoin matches the naive band join and avoids nested-loop") {
    val part = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "part")
      .filter(col("p_size") === 1)
    val supp = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "supplier")
    val naive = part.join(supp,
        col("p_retailprice").between(col("s_acctbal") - 10, col("s_acctbal") + 10))
      .select("p_partkey", "s_suppkey")
      .as[(Long, Long)].collect().toSet
    val banded = Relational.bandJoin(part, supp, col("p_retailprice"), col("s_acctbal"), 10.0)
      .select("p_partkey", "s_suppkey")
      .as[(Long, Long)].collect().toSet
    assert(banded == naive)
    // plan: equi-join on bucket, not BroadcastNestedLoopJoin
    val plan = Relational.bandJoin(part, supp, col("p_retailprice"), col("s_acctbal"), 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("bloomPrefilteredJoin is exact for inner and left_semi, and actually prunes") {
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val custs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_acctbal") > 9000) // small build side
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").as[Long].collect().sorted.toSeq

    val plainInner = key(orders.join(custs,
      orders("o_custkey") === custs("c_custkey"), "inner")
      .select(orders("o_orderkey")))
    // long-key path (o_custkey is BIGINT)
    val bloomInner = key(Relational.bloomPrefilteredJoin(
      orders.withColumnRenamed("o_custkey", "c_custkey"), custs, "c_custkey",
      "inner", expectedBuildKeys = 1000))
    assert(bloomInner == plainInner)

    val plainSemi = key(orders.withColumnRenamed("o_custkey", "c_custkey")
      .join(custs.select("c_custkey"), Seq("c_custkey"), "left_semi"))
    val bloomSemi = key(Relational.bloomPrefilteredJoin(
      orders.withColumnRenamed("o_custkey", "c_custkey"),
      custs.select("c_custkey"), "c_custkey", "left_semi",
      expectedBuildKeys = 1000))
    assert(bloomSemi == plainSemi)

    // string-key path
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val someSrc = docs.select("source").distinct().limit(3)
    val plainStr = Relational.bloomPrefilteredJoin(docs, someSrc, "source", "left_semi",
      expectedBuildKeys = 10).count()
    assert(plainStr ==
      docs.join(someSrc, Seq("source"), "left_semi").count())

    // the prefilter must DROP rows pre-join (the whole point): with a
    // tiny build set the surviving probe fraction ≈ matches + 1% fpp
    val pruned = orders.withColumnRenamed("o_custkey", "c_custkey")
    val bloom = custs.select("c_custkey").stat.bloomFilter("c_custkey", 1000, 0.01)
    val kept = pruned.filter(udf((v: java.lang.Long) => v != null &&
      bloom.mightContainLong(v)).apply(col("c_custkey"))).count()
    assert(kept < orders.count(), s"prefilter kept all $kept rows")

    intercept[IllegalArgumentException](
      Relational.bloomPrefilteredJoin(orders, custs, "o_custkey", "left_anti"))
  }

  test("gapFillDaily fills missing days with the default, spans are per-key") {
    val d = java.sql.Date.valueOf(_: String)
    val daily = Seq(
      (1L, d("2024-01-01"), 5L), (1L, d("2024-01-03"), 2L), // gap on the 2nd
      (2L, d("2024-02-10"), 7L))                            // single-day span
      .toDF("user_id", "day", "n")
    val got = Relational.gapFillDaily(daily, Seq("user_id"), "day", Map("n" -> lit(0L)))
      .select("user_id", "day", "n")
      .as[(Long, java.sql.Date, Long)].collect().toSet
    assert(got == Set(
      (1L, d("2024-01-01"), 5L), (1L, d("2024-01-02"), 0L), (1L, d("2024-01-03"), 2L),
      (2L, d("2024-02-10"), 7L)))
  }

  test("interpolateLinear: proportional fill between neighbors, edges stay null") {
    val df = Seq(
      (1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 3L, None), (1L, 4L, Some(40.0)),
      (1L, 5L, None),                     // trailing edge: no next
      (2L, 0L, None), (2L, 1L, Some(7.0)) // leading edge: no prev
    ).toDF("k", "t", "v")
    val got = Relational.interpolateLinear(df, Seq("k"), "t", "v")
      .select("k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, 0L, Some(10.0)),
      (1L, 1L, Some(10.0 + 30.0 * (1.0 / 4.0))), // 17.5
      (1L, 3L, Some(10.0 + 30.0 * (3.0 / 4.0))), // 32.5
      (1L, 4L, Some(40.0)),
      (1L, 5L, None),
      (2L, 0L, None),
      (2L, 1L, Some(7.0))))
  }

  test("saltedCount equals plain groupBy count") {
    val li = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val plain = li.groupBy("l_returnflag").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Relational.saltedCount(li, Seq("l_returnflag"), saltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("salt is layout-independent: identical results under any repartition") {
    // regression: partition-id/monotonic-id-derived salt changed across
    // physical layouts (and task retries); content-derived salt must not
    val li = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    def run(df: org.apache.spark.sql.DataFrame) =
      Relational.saltedCount(df, Seq("l_returnflag"), saltBuckets = 8)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(li) == run(li.repartition(3)))
    assert(run(li) == run(li.repartition(17, col("l_orderkey"))))
    // and the per-(key,salt) phase-1 partials themselves are stable
    def phase1(df: org.apache.spark.sql.DataFrame) =
      Relational.saltedAggregate(df, Seq("l_returnflag"), 8,
        partial = Seq(count(lit(1)).as("n")),
        merge = Seq(sum(col("n")).as("n")))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(phase1(li) == phase1(li.coalesce(1)))
  }

  test("salted aggregation works on frames with map columns") {
    // regression: xxhash64 over all columns rejects MapType at analysis
    // time; map columns must route through to_json
    import org.apache.spark.sql.functions.{map, lit => flit}
    val withMap = Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "k")
      .withColumn("props", map(flit("x"), col("id")))
    val got = Relational.saltedCount(withMap, Seq("k"), saltBuckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L), ("b", 1L)))
  }

  test("asOfJoin attaches latest prior right row per key, respects tolerance") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val quotes = Seq( // (key, ts, price)
      ("a", ts(1), 10.0), ("a", ts(5), 11.0), ("b", ts(2), 20.0))
      .toDF("sym", "t", "price")
    val trades = Seq( // (key, ts)
      ("a", ts(3)),  // → quote @1 (10.0)
      ("a", ts(6)),  // → quote @5 (11.0)
      ("b", ts(2)),  // equal ts → quote @2 (20.0)
      ("b", ts(50)), // beyond tolerance → null
      ("c", ts(4)))  // no right rows → null
      .toDF("sym", "t")
    val got = Relational.asOfJoin(trades, quotes, "sym", "t",
        Seq("price"), toleranceMs = 10 * 60 * 1000)
      .select("sym", "t", "asof_price")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2)))).toSet
    assert(got == Set(
      ("a", ts(3), Some(10.0)), ("a", ts(6), Some(11.0)),
      ("b", ts(2), Some(20.0)), ("b", ts(50), None), ("c", ts(4), None)))
  }

  test("GraftExtensions injects cosine_sim at session build") {
    import org.apache.spark.sql.SparkSession
    spark // force the shared session first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    // getOrCreate returns the existing default session (ignoring
    // withExtensions) unless it is cleared; the new session still shares
    // the SparkContext, so do NOT stop it afterwards
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head
      assert(r.getDouble(0) == 1.0)
      // all three native functions are SQL-reachable via the extension
      val sigs = s2.sql(
        "SELECT band_sigs(array(1.0D, -2.0D), 2, 4, 8) AS s").head.getSeq[Long](0)
      assert(sigs.length == 2)
      val lang = s2.sql(
        "SELECT lang_id(array('the', 'and', 'of')) AS l").head.getString(0)
      assert(lang == "en")
      // the native as-of join planner strategy rides along too: an
      // extension-built session carries it without the per-session
      // registration AsOfJoin.asOfJoin performs
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("topKPerGroup matches ranking-window semantics with bounded state") {
    val cust = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val viaAgg = Relational.topKPerGroup(cust, Seq("c_nationkey"), "c_acctbal", "c_custkey", 3)
      .select("c_nationkey", "c_custkey", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val viaWindow = cust
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("c_nationkey", "c_custkey", "rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("distributionRanks matches plain ntile/percent_rank/cume_dist windows exactly") {
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("k"), col("o_totalprice"))
    // buckets=7 deliberately tiny and non-divisor so rows cross bucket
    // boundaries mid-key and tile arithmetic exercises both NTILE branches
    val two = Relational.distributionRanks(orders, "k",
        Seq("o_totalprice", "o_orderkey"), numTiles = 4, buckets = 7)
      .select("o_orderkey", "tile", "pr", "cd")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("o_totalprice"), col("o_orderkey"))
    val win = orders.select(col("o_orderkey"),
        ntile(4).over(w).as("tile"), percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(two == win)
    // single-row-per-key edge: pr must be 0.0, tile 1, cd 1.0
    val single = Relational.distributionRanks(
      orders.limit(0).union(orders.limit(1)), "k",
      Seq("o_totalprice", "o_orderkey"), numTiles = 4, buckets = 2)
      .select("tile", "pr", "cd").collect()
    assert(single.length == 1 && single(0).getInt(0) == 1 &&
      single(0).getDouble(1) == 0.0 && single(0).getDouble(2) == 1.0)
    // column-collision guard fires
    intercept[IllegalArgumentException] {
      Relational.distributionRanks(orders.withColumn("tile", lit(1)), "k",
        Seq("o_totalprice", "o_orderkey"))
    }
  }

  test("distributionRanks adversarial shapes: constant values, one giant key, tiny keys") {
    import spark.implicits._
    // constant order value: every percentile boundary collapses to the same
    // number, all rows land in one bucket — results must STILL equal the
    // plain window (rank comes from the unique tiebreak, not the value)
    val const = (1L to 500L).map(i => (i, "k" + (i % 3), 42.0)).toDF("id", "k", "v")
    // one giant key + two singleton keys; values half-duplicated
    val skew = ((1L to 800L).map(i => (i, "big", (i % 7).toDouble)) ++
      Seq((900L, "s1", 1.0), (901L, "s2", 2.0))).toDF("id", "k", "v")
    for (df <- Seq(const, skew)) {
      val two = Relational.distributionRanks(df, "k", Seq("v", "id"),
          numTiles = 5, buckets = 4)
        .select("id", "tile", "pr", "cd")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("v"), col("id"))
      val win = df.select(col("id"), ntile(5).over(w).as("tile"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(two == win)
    }
  }

  test("saltedJoin equals the plain join for inner and left, incl. unmatched probe keys") {
    import spark.implicits._
    // 3 hot keys + a probe-only key (left-outer null path) + a build-only key
    val probe = (1L to 900L).map(i => (i, "k" + (i % 3), i * 2)).toDF("id", "k", "pv")
      .unionByName(Seq((901L, "noMatch", 0L)).toDF("id", "k", "pv"))
    val build = Seq(("k0", 10), ("k0", 11), ("k1", 20), ("k2", 30), ("orphan", 99))
      .toDF("k", "bv")
    for (jt <- Seq("inner", "left")) {
      val salted = Relational.saltedJoin(probe, build, "k",
          saltBuckets = 7, probeSaltCol = col("id"), joinType = jt)
        .select("id", "k", "pv", "bv")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))).sorted.toSeq
      val plain = probe.join(build, Seq("k"), jt)
        .select("id", "k", "pv", "bv")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getInt(3)))).sorted.toSeq
      assert(salted == plain, s"joinType=$jt")
    }
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(probe, build, "k", 7, col("id"), "full")
    }
  }

  test("percentileCont/DiscExact match the built-in aggregates on randomized data (ties, nulls, tiny groups)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy ties (values quantized to 0.5), explicit nulls, a 1-row and
    // a 2-row group alongside big ones — every branch of the rank math
    val rows = (1 to 4000).map { i =>
      val k = "g" + (i % 5)
      val v: java.lang.Double =
        if (rnd.nextInt(20) == 0) null
        else math.floor(rnd.nextDouble() * 40) / 2.0
      (i.toLong, k, v)
    } ++ Seq((9001L, "solo", java.lang.Double.valueOf(3.25)),
      (9002L, "duo", java.lang.Double.valueOf(1.0)),
      (9003L, "duo", java.lang.Double.valueOf(2.0)),
      (9004L, "allnull", null.asInstanceOf[java.lang.Double]))
    val df = rows.toDF("id", "k", "v")
    val ps = Seq("p10" -> 0.1, "p37" -> 0.37, "p50" -> 0.5, "p70" -> 0.7, "p100" -> 1.0)

    def canon(r: org.apache.spark.sql.Row): (String, Seq[Option[Double]]) =
      (r.getString(0), (1 to ps.size).map(i =>
        if (r.isNullAt(i)) None else Some(math.round(r.getDouble(i) * 1e9) / 1e9)))

    val contExact = Relational.percentileContExact(df, "k", "v", ps, buckets = 8)
      .collect().map(canon).toMap
    val contBuiltin = df.groupBy(col("k")).agg(
        ps.map { case (n, p) =>
          expr(s"percentile_cont($p) WITHIN GROUP (ORDER BY v)").as(n) }.head,
        ps.tail.map { case (n, p) =>
          expr(s"percentile_cont($p) WITHIN GROUP (ORDER BY v)").as(n) }: _*)
      .collect().map(canon).toMap
    // all-NULL groups: built-in emits a NULL row, the exact form emits none
    assert(contBuiltin("allnull").forall(_.isEmpty))
    assert(contExact == contBuiltin.filter(_._2.exists(_.nonEmpty)))

    val discExact = Relational.percentileDiscExact(df, "k", "v", ps, buckets = 8)
      .collect().map(canon).toMap
    val discBuiltin = df.groupBy(col("k")).agg(
        ps.map { case (n, p) =>
          expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").as(n) }.head,
        ps.tail.map { case (n, p) =>
          expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").as(n) }: _*)
      .collect().map(canon).toMap
    assert(discExact == discBuiltin.filter(_._2.exists(_.nonEmpty)))

    // the scale property itself: no buffering percentile aggregate and no
    // per-key-only window survives into the physical plan
    val plan = Relational.percentileContExact(df, "k", "v", ps, buckets = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile_cont"), "built-in percentile leaked into the plan")
  }
}
