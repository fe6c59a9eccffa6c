package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.music.Constraints

/** Property-based layer (SURVEY.md §5.2 item 4) — ScalaCheck generators
  * drive randomized relational data through the operators; each property
  * runs a reduced case count (Spark jobs per case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 10), Gen.choose(0, 5)))

  test("semi ⊎ anti partitions the left input") {
    check(Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      val l = ls.toDF("k", "v")
      val r = rs.toDF("k", "v")
      val semi = l.join(r.select("k").distinct(), Seq("k"), "left_semi").count()
      val anti = l.join(r.select("k").distinct(), Seq("k"), "left_anti").count()
      semi + anti == ls.size.toLong
    })
  }

  test("count(col) ≤ count(*) under random nulls") {
    check(Prop.forAll(rowsGen) { ls =>
      val df = ls.toDF("k", "v")
        .withColumn("v", when(col("v") === 0, lit(null)).otherwise(col("v")))
      val r = df.agg(count(col("v")).as("c"), count(lit(1)).as("n")).head
      r.getLong(0) <= r.getLong(1)
    })
  }

  test("rollup cardinality = groups(a,b) + groups(a) + 1") {
    check(Prop.forAll(rowsGen.suchThat(_.nonEmpty)) { ls =>
      val df = ls.toDF("a", "b")
      val full = df.select("a", "b").distinct().count()
      val as = df.select("a").distinct().count()
      val roll = df.rollup("a", "b").count().count()
      roll == full + as + 1
    })
  }

  test("dropDuplicates is idempotent and keeps one row per key") {
    check(Prop.forAll(rowsGen) { ls =>
      val df = ls.toDF("k", "v")
      val d1 = df.dropDuplicates(Seq("k"))
      val d2 = d1.dropDuplicates(Seq("k"))
      d1.count() == d2.count() &&
        d1.count() == ls.map(_._1).distinct.size.toLong
    })
  }

  test("key audit flags exactly the duplicated keys") {
    check(Prop.forAll(rowsGen) { ls =>
      val df = ls.toDF("k", "v")
      val dupKeys = ls.groupBy(_._1).filter(_._2.size > 1).keySet
      val flagged = Constraints.keyViolations(df, Seq("k"))
        .select("k").as[Int].collect().toSet
      flagged == dupKeys
    })
  }

  test("intersect ⊆ both inputs; except disjoint from right") {
    check(Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      val l = ls.map(_._1).toDF("k")
      val r = rs.map(_._1).toDF("k")
      val inter = l.intersect(r).as[Int].collect().toSet
      val exc = l.except(r).as[Int].collect().toSet
      val lSet = ls.map(_._1).toSet
      val rSet = rs.map(_._1).toSet
      inter.subsetOf(lSet) && inter.subsetOf(rSet) &&
        exc.subsetOf(lSet) && exc.intersect(rSet).isEmpty
    })
  }

  // --- round-4 operator properties ---

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 1000L),
      Gen.oneOf("aa bb", "cc dd ee", "ff", "aa bb", "gg hh ii jj")))
      .map(_.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) })

  test("exactKeepMinId ≡ per-content min id (hand oracle), any layout") {
    check(Prop.forAll(docsGen, Gen.choose(1, 7)) { (docs, parts) =>
      val expect = docs.groupBy(_._2).values.map(_.map(_._1).min).toSet
      val got = graft.operators.Dedup.exactKeepMinId(
        docs.toDF("id", "text").repartition(parts), "id", "text")
        .select("id").as[Long].collect().toSet
      got == expect
    })
  }

  test("interleaveBits is injective on its domain and order-embeds boxes") {
    check(Prop.forAll(Gen.listOfN(25, Gen.zip(Gen.choose(0L, 63L), Gen.choose(0L, 63L)))) { pts =>
      val z = pts.distinct.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.operators.Layout.interleaveBits(Seq(col("x"), col("y")), 6).as("z"))
        .as[(Long, Long, Long)].collect()
      // injective: distinct (x,y) → distinct z
      z.map(_._3).distinct.length == z.length &&
        // z stays within the 12-bit interleave domain
        z.forall(r => r._3 >= 0 && r._3 < (1L << 12))
    })
  }

  test("topKPerGroup is layout-independent and matches a window-rank oracle") {
    check(Prop.forAll(rowsGen.suchThat(_.nonEmpty), Gen.choose(1, 3)) { (ls, k) =>
      val df = ls.zipWithIndex
        .map { case ((g, s), i) => (g, s.toDouble, i.toLong) }
        .toDF("g", "score", "id")
      val got = graft.operators.Relational
        .topKPerGroup(df.repartition(5), Seq("g"), "score", "id", k)
        .select("g", "id").as[(Int, Long)].collect().toSet
      // oracle: rank by (score desc, id asc) within each group, take k.
      // (groupBy returns a Map — flatMap on it would rebuild a Map keyed
      // by g and silently keep ONE pair per group; go through toList.)
      val expect = ls.zipWithIndex
        .map { case ((g, s), i) => (g, s.toDouble, i.toLong) }
        .groupBy(_._1).toList.flatMap { case (g, rows) =>
          rows.sortBy(r => (-r._2, r._3)).take(k).map(r => (g, r._3))
        }.toSet
      got == expect
    })
  }

  test("HLL sketch merge is split-invariant (register-exact)") {
    check(Prop.forAll(rowsGen.suchThat(_.size > 4), Gen.choose(1, 5)) { (ls, splitAt) =>
      val df = ls.zipWithIndex.map { case ((k, _), i) => (i % (splitAt + 1), k) }
        .toDF("part", "v")
      val one = graft.operators.Sketches
        .sketchBy(df.withColumn("part", lit(0)), Seq("part"), "v")
      val split = graft.operators.Sketches.sketchBy(df, Seq("part"), "v")
      val mergedEst = graft.operators.Sketches
        .mergeSketches(split, Seq.empty, "v_sketch")
        .select(graft.operators.Sketches.estimate(col("v_sketch"))).as[Long].head()
      val oneEst = one
        .select(graft.operators.Sketches.estimate(col("v_sketch"))).as[Long].head()
      mergedEst == oneEst
    })
  }

  test("distributionRanks is layout-independent and rank-complete per key") {
    check(Prop.forAll(rowsGen, Gen.choose(2, 5)) { (ls, parts) =>
      // unique (id via zipWithIndex) so the order tuple is a total order
      val rows = ls.zipWithIndex.map { case ((k, v), i) => (i.toLong, k % 3, v.toDouble) }
      val df = rows.toDF("id", "k", "v")
      def run(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Relational.distributionRanks(d, "k", Seq("v", "id"),
            numTiles = 3, buckets = 3)
          .select("id", "tile", "pr", "cd")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
          .toSet
      val base = run(df)
      val shuffled = run(df.repartition(parts, col("id")))
      // layout-independent AND cume_dist hits exactly 1.0 at each key max
      base == shuffled && {
        val byKey = rows.groupBy(_._2)
        byKey.forall { case (_, rs) =>
          val ids = rs.map(_._1).toSet
          base.filter(t => ids(t._1)).map(_._4).max == 1.0
        }
      }
    })
  }

  test("incrementalExactDedup: survivors fresh, distinct, min-id — any split") {
    check(Prop.forAll(rowsGen, rowsGen) { (es, is) =>
      val existing = es.zipWithIndex
        .map { case ((k, _), i) => (i.toLong, s"c$k") }.toDF("id", "c")
      val incoming = is.zipWithIndex
        .map { case ((k, _), i) => (1000L + i, s"c${k + 3}") }.toDF("id", "c")
      val exContents = es.map(t => s"c${t._1}").toSet
      val out = graft.operators.Dedup
        .incrementalExactDedup(existing, incoming, "id", "c")
        .select("id", "c").as[(Long, String)].collect()
      val inContents = is.zipWithIndex.map { case ((k, _), i) => (1000L + i, s"c${k + 3}") }
      val expected = inContents.filterNot(t => exContents(t._2))
        .groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSet
      out.toSet == expected
    })
  }

  test("q83 closed form ≡ Spark's own recursive-CTE execution (sf0.001)") {
    // the declared face ships the closed form (one map, no UnionLoop —
    // see q83RecursiveClosedForm's scaladoc); the recursive-CTE
    // capability stays exercised HERE, against the identical SQL text
    // the DuckDB oracle runs
    val dir = "/root/testdata/sf0.001"
    graft.core.Tables.registerAll(spark, dir)
    val rec = spark.sql(ExtendedQueries.q83Sql).collect().toSeq
    val closed = ExtendedQueries.q83RecursiveClosedForm(spark, dir)
      .collect().toSeq
    assert(closed == rec)
  }

  test("q42 long power sums ≡ the decimal aggregation, bit-exact (sf0.01)") {
    // the shipped face sums exact cents-space longs (split halves for
    // y² and x·y); this pin recomputes the r12 DECIMAL aggregation and
    // requires the FINAL rows — post round(6) — to be identical, so the
    // reassembly's decimal→double conversions are proven value-preserving
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val dir = "/root/testdata/sf0.01"
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast(DecimalType(4, 2)).as("x"),
        col("l_extendedprice").cast(DecimalType(8, 2)).as("y"))
    val g = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast(DoubleType).as("sx"),
      sum(col("y")).cast(DoubleType).as("sy"),
      sum(col("x") * col("x")).cast(DoubleType).as("sxx"),
      sum(col("y") * col("y")).cast(DoubleType).as("syy"),
      sum(col("x") * col("y")).cast(DoubleType).as("sxy"))
    val nD = col("n").cast(DoubleType)
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val vx = nD * col("sxx") - col("sx") * col("sx")
    val vy = nD * col("syy") - col("sy") * col("sy")
    val old = g.select(col("l_returnflag"), col("n"),
        round(cov / sqrt(vx * vy), 6).as("corr"),
        round(cov / vx, 6).as("slope"))
      .orderBy(col("l_returnflag")).collect().toSeq
    val now = ExtendedQueries.all("q42_stats_corr")(spark, dir)
      .collect().toSeq
    assert(now == old)
  }

  test("q114 group-level clip sum ≡ the per-row decimal sum, bit-exact (sf0.01)") {
    // the shipped face folds Σ round6(clip) into
    // round6(lo)·n_lo + cents_mid/100 + round6(hi)·n_hi; this pin
    // recomputes the r9 per-row DECIMAL(18,6) clipped sum over the same
    // percentile band and requires identical final rows
    val dir = "/root/testdata/sf0.01"
    val o = graft.core.Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_totalprice"))
    val b = graft.operators.Relational.percentileContExact(
        o, "o_orderstatus", "o_totalprice",
        Seq("_w_lo" -> 0.05, "_w_hi" -> 0.95))
      .withColumnRenamed("o_orderstatus", "_w_st")
    val clip = least(greatest(col("o_totalprice"), col("_w_lo")), col("_w_hi"))
    val old = o.join(broadcast(b), col("o_orderstatus") === col("_w_st"))
      .select(col("o_orderstatus"), col("_w_lo"), col("_w_hi"),
        clip.cast("decimal(18,6)").as("_w_clip"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(first(col("_w_lo")), 6).as("p05"),
        round(first(col("_w_hi")), 6).as("p95"),
        sum(col("_w_clip")).as("_w_sum"))
      .select(col("o_orderstatus"), col("n"), col("p05"), col("p95"),
        round(col("_w_sum").cast("double") / col("n"), 6).as("avg_clip"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    val now = CorpusQueries.all("q114_winsorize")(spark, dir).collect().toSeq
    assert(now == old)
  }

  test("ngramContamination: counts bounded, self-contamination is total") {
    check(Prop.forAll(Gen.listOfN(8, Gen.listOfN(6, Gen.choose(0, 4))), Gen.choose(1, 3)) {
      (docs, n) =>
        val df = docs.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.map("w" + _).mkString(" ")) }
          .toDF("doc_id", "text")
        val out = graft.operators.TextAnalysis
          .ngramContamination(df, df, "doc_id", "text", n)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        // eval == train ⇒ every gram is contaminated; counts bounded
        out.forall { case (_, g, c) => c == g && c >= 0 && g >= 0 }
    })
  }
}
