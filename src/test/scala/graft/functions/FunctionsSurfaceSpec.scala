package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the remaining SURVEY.md §2.4 function-surface rows:
  * B5 (approx distinct / HLL), B25 (UDF), B26 (UDAF), B27 (UDTF-class
  * generators).
  */
class FunctionsSurfaceSpec extends SparkSpec {
  import spark.implicits._

  lazy val lineitem = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")

  test("B5: approx_count_distinct within rsd of exact") {
    val r = lineitem.agg(
      countDistinct(col("l_suppkey")).as("exact"),
      approx_count_distinct(col("l_suppkey"), 0.05).as("approx")).head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.15,
      s"HLL estimate $approx too far from $exact")
  }

  test("B25: scalar UDF surface (documented last resort)") {
    val reverse = udf((s: String) => s.reverse)
    val got = Seq("abc").toDF("s").select(reverse(col("s"))).as[String].head()
    assert(got == "cba")
  }

  test("B26: Aggregator UDAF — variance matches built-in, topk bounded") {
    val varUdaf = udaf(Aggregators.VarianceAgg)
    val r = lineitem.agg(
      varUdaf(col("l_quantity")).as("v_custom"),
      var_samp(col("l_quantity")).as("v_builtin")).head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)

    val top3 = udaf(new Aggregators.TopKMin(3))
    val t = lineitem.agg(top3(col("l_quantity"))).head.getSeq[Double](0)
    assert(t.size == 3 && t == t.sorted)
  }

  test("TopK aggregators: NaN never displaces real values, layout-independent") {
    // regression: the capped-insert rewrite's naive `<=`/`>` comparisons
    // disagreed with merge's total-order sort on NaN — a NaN landed at
    // the FRONT of a top-k-min buffer (TopKMin) or froze the buffer
    // forever (TopKPairs), with partition-order-dependent results
    val data = Seq(5.0, Double.NaN, 1.0, 3.0, Double.NaN, 2.0, 4.0)
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }
    def runMin(parts: Int): Seq[Double] = {
      val top3 = udaf(new Aggregators.TopKMin(3))
      data.toDF("v", "id").repartition(parts)
        .agg(top3(col("v"))).head.getSeq[Double](0)
    }
    assert(runMin(1) == Seq(1.0, 2.0, 3.0))
    assert(runMin(1) == runMin(4) && runMin(1) == runMin(7))

    def runPairs(parts: Int): Seq[(Double, Long)] = {
      val topk = udaf(new Aggregators.TopKPairs(3))
      data.toDF("v", "id").repartition(parts)
        .agg(topk(col("v"), col("id"))).head
        .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getDouble(0), r.getLong(1)))
    }
    // NaN-score pairs rank worst: top-3 by score are 5,4,3
    assert(runPairs(1).map(_._1) == Seq(5.0, 4.0, 3.0))
    assert(runPairs(1) == runPairs(4) && runPairs(1) == runPairs(7))
  }

  test("MisraGries: error bound holds, exact when capacity covers distincts, partition-independent") {
    // skewed stream: 'hot' 60×, 'warm' 25×, then 40 singletons — n = 125
    val data = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 40).map(i => s"cold$i")
    val n = data.size.toLong
    def run(k: Int, parts: Int): Map[String, Long] = {
      val mg = udaf(new Aggregators.MisraGries(k))
      Seq(data: _*).toDF("t").repartition(parts)
        .agg(mg(col("t"))).head
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1))).toMap
    }
    // k=7: anything over n/(k+1) ≈ 15.6 MUST survive with bounded undercount
    for (parts <- Seq(1, 5, 13)) {
      val est = run(7, parts)
      assert(est.size <= 7)
      for ((item, truth) <- Seq("hot" -> 60L, "warm" -> 25L)) {
        val e = est.getOrElse(item, 0L)
        assert(e <= truth, s"$item overcounted: $e > $truth (parts=$parts)")
        assert(e >= truth - n / 8, s"$item undercount past bound (parts=$parts)")
      }
    }
    // capacity ≥ distincts: exact counts, identical across partitionings
    val truthMap = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(run(64, 1) == truthMap)
    assert(run(64, 9) == truthMap)
  }

  test("mergeable sketches: bloom filter and count-min via stat functions") {
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    // bloom filter: no false negatives on members
    val bloom = orders.stat.bloomFilter("o_orderkey", 2000, 0.03)
    val keys = orders.select("o_orderkey").as[Long].take(100)
    assert(keys.forall(bloom.mightContain))
    // count-min: estimate ≥ true count, within eps*n
    val cms = orders.stat.countMinSketch(col("o_custkey"), 0.01, 0.95, 42)
    val truth = orders.filter(col("o_custkey") === keysFirstCust(orders)).count()
    val est = cms.estimateCount(keysFirstCust(orders))
    assert(est >= truth && est <= truth + (0.01 * orders.count()).toLong + 1)
  }

  private def keysFirstCust(df: org.apache.spark.sql.DataFrame): Long =
    df.select("o_custkey").orderBy("o_custkey").as[Long].head()

  test("B27: generator surface — explode, posexplode, inline") {
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "xs")
    assert(df.select(explode(col("xs"))).count() == 2)
    val pos = df.select(posexplode(col("xs"))).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(pos == Seq((0, "a"), (1, "b")))
    val structs = Seq((1L, Seq((1, "x"), (2, "y")))).toDF("id", "pairs")
    assert(structs.select(inline(col("pairs"))).columns.length == 2)
  }

  test("QuantileSketch: exact in the small regime, bounded rank error at 100k") {
    // small regime: fewer than k items → the sketch never compacts and
    // the returned quantiles are exact order statistics
    val smallAgg = udaf(new Aggregators.QuantileSketch(128, Seq(0.0, 0.5, 1.0)))
    val small = (1 to 100).map(_.toDouble)
    val sGot = small.toDF("v").agg(smallAgg(col("v"))).head.getSeq[Double](0)
    assert(sGot == Seq(1.0, 50.0, 100.0))

    // 100k-row regime with a skewed (quadratic) distribution, multiple
    // partitions so merge() and partial aggregation are exercised:
    // observed rank error stays under 2 % of n for every probe quantile
    val n = 100000
    val agg = udaf(new Aggregators.QuantileSketch(128,
      Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)))
    val data = (0 until n).map { i =>
      val u = ((i * 2654435761L) % n).toDouble / n // deterministic scramble
      u * u * 1000.0
    }
    val got = data.toDF("v").repartition(16).agg(agg(col("v")))
      .head.getSeq[Double](0)
    val sorted = data.sorted.toIndexedSeq
    val errs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).zip(got).map {
      case (q, est) =>
        // rank of the estimate vs target rank, in fractions of n
        val rank = sorted.search(est) match {
          case scala.collection.Searching.Found(i) => i
          case scala.collection.Searching.InsertionPoint(i) => i
        }
        math.abs(rank.toDouble / n - q)
    }
    assert(errs.forall(_ <= 0.02), s"rank errors: $errs")

    // mergeability: the union sketch answers like the one-shot sketch
    // (both within the same bound; they need not be bit-identical)
    val half1 = data.take(n / 2).toDF("v").agg(agg(col("v"))).head.getSeq[Double](0)
    assert(half1.nonEmpty) // smoke: partial sketches finish cleanly
    // empty input → NaNs, not a crash
    val empty = Seq.empty[Double].toDF("v").agg(agg(col("v"))).head.getSeq[Double](0)
    assert(empty.forall(_.isNaN))
  }
}
