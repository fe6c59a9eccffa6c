package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  lazy val quotes = Seq(
    ("a", ts(1), 10.0), ("a", ts(5), 11.0), ("b", ts(2), 20.0))
    .toDF("sym", "t", "price")
  lazy val trades = Seq(
    ("a", ts(3)), ("a", ts(6)), ("b", ts(2)), ("b", ts(50)), ("c", ts(4)))
    .toDF("sym", "t")

  test("native as-of join: latest prior right row, tolerance, missing keys") {
    val got = AsOfJoin.asOfJoin(trades, quotes, "sym", "t", Seq("price"),
        toleranceMs = 10 * 60 * 1000)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2)))).toSet
    assert(got == Set(
      ("a", ts(3), Some(10.0)), ("a", ts(6), Some(11.0)),
      ("b", ts(2), Some(20.0)), ("b", ts(50), None), ("c", ts(4), None)))
  }

  test("default tolerance (Long.MaxValue ms) actually matches — no µs-conversion overflow") {
    // regression: toleranceMs * 1000 overflowed to a negative tolerance,
    // silently unmatching EVERY row on the documented default call
    val got = AsOfJoin.asOfJoin(trades, quotes, "sym", "t", Seq("price"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2)))).toSet
    assert(got == Set(
      ("a", ts(3), Some(10.0)), ("a", ts(6), Some(11.0)),
      ("b", ts(2), Some(20.0)), ("b", ts(50), Some(20.0)), ("c", ts(4), None)))
  }

  test("asof_* columns are referencable by name downstream (stable exprIds)") {
    val joined = AsOfJoin.asOfJoin(trades, quotes, "sym", "t", Seq("price"))
    // select + filter + aggregate over the fabricated attribute: resolves
    // and binds only if repeated output calls return identical exprIds
    val n = joined
      .filter(col("asof_price").isNotNull)
      .select(col("sym"), col("asof_price"))
      .groupBy(col("sym")).agg(max(col("asof_price")).as("m"))
      .collect().length
    assert(n == 2)
  }

  test("null join keys and null timestamps never match and never crash") {
    val nq = Seq(
      (Option("a"), Option(ts(1)), 10.0),
      (Option.empty[String], Option(ts(2)), 99.0), // null right key
      (Option("b"), Option.empty[java.sql.Timestamp], 77.0), // null right ts
      (Option("b"), Option(ts(2)), 20.0))
      .toDF("sym", "t", "price")
    val nt = Seq(
      (Option("a"), Option(ts(3))),
      (Option.empty[String], Option(ts(4))), // null left key
      (Option("b"), Option.empty[java.sql.Timestamp]), // null left ts
      (Option("b"), Option(ts(5))))
      .toDF("sym", "t")
    val got = AsOfJoin.asOfJoin(nt, nq, "sym", "t", Seq("price"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getTimestamp(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      (Some("a"), Some(ts(3)), Some(10.0)),
      (None, Some(ts(4)), None),
      (Some("b"), None, None),
      (Some("b"), Some(ts(5)), Some(20.0))))
  }

  test("right rows tied on (key, ts): greatest payload wins, layout-independent") {
    // regression: without the payload tertiary sort the winner among
    // (key, ts) ties was shuffle-order-dependent
    val tied = Seq(
      ("a", ts(2), 1.0), ("a", ts(2), 9.0), ("a", ts(2), 5.0))
      .toDF("sym", "t", "price")
    def run(q: org.apache.spark.sql.DataFrame): Set[(String, Double)] =
      AsOfJoin.asOfJoin(trades.filter(col("sym") === "a"), q, "sym", "t", Seq("price"))
        .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(run(tied).map(_._2) == Set(9.0)) // greatest tied payload everywhere
    assert(run(tied) == run(tied.repartition(3)))
    assert(run(tied) == run(tied.coalesce(1)))
  }

  test("map-typed (unorderable) payload columns still execute") {
    // regression: the payload tie-break sort must skip unorderable types
    // instead of asking EnsureRequirements to sort a map column
    val mq = Seq(("a", ts(1), Map("p" -> 10.0)))
      .toDF("sym", "t", "props")
    val got = AsOfJoin.asOfJoin(trades.filter(col("sym") === "a"), mq,
        "sym", "t", Seq("props"))
      .collect().map(r => (r.getString(0), Option(r.get(2)))).toSet
    assert(got.forall(_._2.isDefined), got.mkString(", "))
  }

  test("self-join: both sides derived from the SAME base relation") {
    // regression: with shared attribute ids, DeduplicateRelations re-ids
    // the right child of the custom BinaryNode without rewriting its
    // key/ts/value expressions → [INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND] at
    // bind time (first hit by q37: clicks/views both filtered off one
    // cached events relation). The builder's alias re-mint prevents it.
    val base = Seq(
      ("a", ts(1), "view", 10.0), ("a", ts(3), "click", 0.0),
      ("b", ts(2), "view", 20.0), ("b", ts(1), "click", 0.0))
      .toDF("sym", "t", "kind", "v")
    val clicks = base.filter(col("kind") === "click").select(col("sym"), col("t"))
    val views = base.filter(col("kind") === "view")
      .select(col("sym"), col("t"), col("v"))
    val got = AsOfJoin.asOfJoin(clicks, views, "sym", "t", Seq("v"))
      .collect().map(r => (r.getString(0), Option(r.get(2)))).toSet
    assert(got == Set(("a", Some(10.0)), ("b", None)))
  }

  test("native as-of join plans as AsOfJoinExec (custom physical operator)") {
    val df = AsOfJoin.asOfJoin(trades, quotes, "sym", "t", Seq("price"))
    // nodeName strips the Exec suffix in plan strings; AdaptiveSparkPlanExec
    // wraps the tree, so the string form is the robust check
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      df.queryExecution.executedPlan.toString)
  }

  test("native as-of join agrees with the composable union+window fallback") {
    // randomized differential on a bigger input
    val rnd = new scala.util.Random(7)
    val keys = Seq("k1", "k2", "k3", "k4")
    val rights = (1 to 300).map(i =>
      (keys(rnd.nextInt(4)), ts(rnd.nextInt(59)), rnd.nextInt(1000).toDouble))
      .distinct.toDF("sym", "t", "price")
      // fallback picks greatest payload on (key, ts) ties; pre-dedup ties
      // so both implementations see a unique right row per (key, ts)
      .groupBy("sym", "t").agg(max("price").as("price"))
    val lefts = (1 to 500).map(i => (keys(rnd.nextInt(4)), ts(rnd.nextInt(59))))
      .toDF("sym", "t")

    val native = AsOfJoin.asOfJoin(lefts, rights, "sym", "t", Seq("price"),
        toleranceMs = 20 * 60 * 1000)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2)))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val fallback = Relational.asOfJoin(lefts, rights, "sym", "t", Seq("price"),
        toleranceMs = 20 * 60 * 1000)
      .select(col("sym"), col("t"), col("asof_price"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2)))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(native == fallback)
  }
}
