package graft.queries

import graft.SparkSpec

/** Physical-plan audits: the optimizations the engine depends on at scale
  * must actually appear in the executed plan (builder prompt: "iterate
  * until it's the plan you'd want, not just the first one that passed").
  * Guards against regressions that would silently turn broadcast joins
  * into shuffles or lose parquet pushdown.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = InventoryQueries.all(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters push down to the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("o_orderstatus") && p.contains("o_totalprice"), p)
  }

  test("q01: column pruning — scan reads only the projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("struct<r_regionkey:int,r_name:string,r_comment"), p)
  }

  test("q04: dimension join is a broadcast hash join, not a shuffle join") {
    val p = plan("q04_join_count")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q05: lineitem pre-aggregates BELOW the join (structural check)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = InventoryQueries.all("q05_threeway_join")(spark, dir)
      .queryExecution.optimizedPlan
    // an Aggregate must exist INSIDE some join's subtree — string-position
    // checks can't distinguish agg-above-join from agg-below-join
    val aggUnderJoin = lp.collect { case j: Join => j }.exists { j =>
      j.children.exists(_.collectFirst { case a: Aggregate => a }.isDefined)
    }
    assert(aggUnderJoin, lp.toString)
    val p = plan("q05_threeway_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("q07: IN-subqueries plan as semi joins") {
    val p = plan("q07_semijoin")
    assert(p.contains("LeftSemi"), p)
  }

  test("q09: NOT EXISTS plans as anti join") {
    val p = plan("q09_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("q15: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q11: aggregation is partial+final (map-side combine)") {
    val p = plan("q11_agg_suite")
    // r13 bitmap distinct: ObjectHashAggregate partial+final (the
    // bitmap buffer is object-typed), still ONE exchange and still no
    // Expand (the shape the built-in COUNT(DISTINCT) would plan)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Expand"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p) // agg + output order
  }

  test("q08 pushdown ≡ definitional fan-out left join; join kept in plan") {
    import org.apache.spark.sql.functions._
    val got = InventoryQueries.all("q08_left_join")(spark, dir)
    val want = graft.core.Tables.load(spark, dir, "customer")
      .join(graft.core.Tables.load(spark, dir, "orders"),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
    assert(got.collect().map(_.toSeq).toSeq ==
      want.collect().map(_.toSeq).toSeq)
    // the B1 face keeps its outer join; the aggregate sits BELOW it
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("LeftOuter"), p)
  }

  test("q09 pre-distinct ≡ the direct anti join; anti join kept in plan") {
    import org.apache.spark.sql.functions._
    val got = InventoryQueries.all("q09_anti_join")(spark, dir)
    val want = graft.core.Tables.load(spark, dir, "customer")
      .join(graft.core.Tables.load(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
    assert(got.collect().map(_.toSeq).toSeq ==
      want.collect().map(_.toSeq).toSeq)
    assert(got.queryExecution.executedPlan.toString.contains("LeftAnti"))
  }

  test("q09b bitmap anti ≡ the direct anti join; probe filters map-side, no join") {
    import org.apache.spark.sql.functions._
    val got = InventoryQueries.all("q09b_anti_bitmap")(spark, dir)
    val want = graft.core.Tables.load(spark, dir, "customer")
      .join(graft.core.Tables.load(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
    assert(got.collect().map(_.toSeq).toSeq ==
      want.collect().map(_.toSeq).toSeq)
    // the whole point: the probe plan carries a bitmap_contains FILTER
    // and no join at all — the build side ran as a bounded plan-build job
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("bitmap_contains"), p)
    assert(!p.contains("Join"), p)
  }

  test("q11 bitmap distinct ≡ the definitional COUNT(DISTINCT) form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val got = InventoryQueries.all("q11_agg_suite")(spark, dir).collect()
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 2)
    val want = graft.core.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"),
        min(col("l_extendedprice")).as("min_p"),
        max(col("l_extendedprice")).as("max_p"),
        count(lit(1)).as("n"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("ivfTopK / lshTopK: candidate generation is an equi-join, never a cross join") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    for (df <- Seq(
        graft.operators.Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5, nCells = 8, nProbes = 2),
        graft.operators.Similarity.lshTopK(emb, q, "vec_id", "embedding", 5))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("minhashDedup: no cross joins; the final step is an anti join") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val df = graft.operators.Dedup.minhashDedup(docs, "doc_id", "text",
      numHashes = 16, bands = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("decontamination: corpus x reference candidates join on band keys, never cross") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val df = graft.operators.Dedup.minhashDecontaminate(
      docs, docs.limit(20), "doc_id", "text", numHashes = 16, bands = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("rq5 (reference workload): dimension joins broadcast over the music tables") {
    val t = graft.music.MusicParquet.ensure(spark)
    val p = graft.music.MusicQueries
      .rq5MostRatedSongs(t("Rating"), t("Song"), t("Artist"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q40: GROUPING SETS plans as ONE Expand + partial+final aggregate (no union of scans)") {
    val df = ExtendedQueries.all("q40_grouping_sets")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(p).size == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // the naive alternative — one scan per grouping set unioned — would
    // show multiple parquet scans
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q37: native as-of join plans as the custom AsOfJoin operator, with sorted children") {
    val df = ExtendedQueries.all("q37_asof_join")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q42: power-sum statistics compute in ONE aggregate pass (no per-stat scans)") {
    val df = ExtendedQueries.all("q42_stats_corr")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial+final
  }

  test("q43: content-hash sample is a pure scan+filter — no shuffle at any scale") {
    val df = ExtendedQueries.all("q43_sample_hash")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation sort
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q44/q45: behavioral analytics plans stay cross-join-free") {
    for (name <- Seq("q44_funnel", "q45_retention")) {
      val p = ExtendedQueries.all(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: $p")
    }
  }

  test("bloomPrefilteredJoin: the probe-side filter sits BELOW the join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val orders = graft.core.Tables.load(spark, dir, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
    val custs = graft.core.Tables.load(spark, dir, "customer")
    val lp = graft.operators.Relational
      .bloomPrefilteredJoin(orders, custs, "c_custkey", "inner", 1000)
      .queryExecution.optimizedPlan
    val filterUnderJoin = lp.collect { case j: Join => j }.exists { j =>
      j.children.exists(_.collectFirst { case f: Filter => f }.isDefined)
    }
    assert(filterUnderJoin, lp.toString)
  }

  test("q50: gap-fill densification joins on (key, day) — no cross join, no window") {
    val p = ExtendedQueries.all("q50_gap_fill")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q51: null-safe equality (<=>) still plans as a hash join, not nested loop") {
    val p = ExtendedQueries.all("q51_null_safe")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q52/q53: correlated subqueries decorrelate — no per-row re-execution shapes") {
    // LATERAL + LIMIT becomes a partitioned window + equi-join; correlated
    // scalar aggregates become one aggregate + join. Neither may plan as a
    // cartesian/nested-loop per-row loop.
    for (name <- Seq("q52_lateral", "q53_corr_scalar")) {
      val p = ExtendedQueries.all(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name: $p")
    }
    val p52 = ExtendedQueries.all("q52_lateral")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p52.contains("Window"), p52)
  }

  test("whole-stage codegen covers the hot paths (final AQE plan)") {
    val df = InventoryQueries.all("q11_agg_suite")(spark, dir)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators render as "*(n) Op" in the final plan string
    assert(p.contains("*("), p)
  }

  test("AQE splits a skewed join partition at runtime (isSkew in final plan)") {
    // one key carries ~all rows of the left side — the layout-level answer
    // is salting (Relational.saltedAggregate); this pins the RUNTIME
    // answer: AQE detects the oversized shuffle partition and splits it,
    // so a skewed key degrades one task instead of stalling the stage.
    // Thresholds are shrunk so kilobyte-scale test data trips the same
    // code path 100 GB partitions trip in production.
    import org.apache.spark.sql.functions._
    val conf = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 60000)
        .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("s"))
      val right = spark.range(0, 2000).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k")
      // execute THIS df's QueryExecution so its adaptive plan finalizes
      val n = joined.collect().length
      // 57000 rows of the hot key 7, plus the multiples of 20 below 2000
      assert(n == 57000 + 100)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isSkew=true") || p.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$p")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
