package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for [[Analytics]]: each operator against a hand-computed or
  * independently-derived reference on data small enough to verify by eye
  * — edge cases the sf-scale dual-engine oracles don't reach (empty
  * groups, ties at predicate boundaries, single-element partitions,
  * all-same-label probes).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ---- ewmaLast -----------------------------------------------------

  test("ewmaLast matches the recursive definition") {
    // s_1 = x_1; s_i = a x_i + (1-a) s_{i-1}
    val xs = Map(
      1L -> Seq(10.0, 20.0, 30.0, 40.0),
      2L -> Seq(5.0),
      3L -> Seq(1.0, 1.0, 1.0))
    val a = 0.3
    val rows = xs.toSeq.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, i, v) }
    }
    val df = rows.toDF("k", "ord", "x")
    val got = Analytics.ewmaLast(df, "k", Seq("ord"), "x", a)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2).doubleValue))
      .toMap
    xs.foreach { case (k, vs) =>
      val ref = vs.tail.foldLeft(vs.head)((s, x) => a * x + (1 - a) * s)
      val (n, ew) = got(k)
      assert(n == vs.size)
      assert(math.abs(ew - ref) < 1e-9, s"key $k: $ew vs $ref")
    }
  }

  test("ewmaLast rejects out-of-range alpha and colliding columns") {
    val df = Seq((1L, 1, 1.0)).toDF("k", "ord", "x")
    intercept[IllegalArgumentException](
      Analytics.ewmaLast(df, "k", Seq("ord"), "x", 0.0))
    intercept[IllegalArgumentException](
      Analytics.ewmaLast(df, "k", Seq("ord"), "x", 1.0))
    val bad = df.withColumn("_ew_rn", lit(1))
    intercept[IllegalArgumentException](
      Analytics.ewmaLast(bad, "k", Seq("ord"), "x", 0.5))
  }

  // ---- columnProfile ------------------------------------------------

  test("columnProfile counts nulls, exact distincts, min/max/avg") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, 4.0), (2.0, 6.0), (3.0, null))
      .toDF("a", "b")
    val p = Analytics.columnProfile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = p("a")
    assert(ra.getLong(1) == 4 && ra.getLong(2) == 0 && ra.getLong(3) == 3)
    assert(ra.getDouble(4) == 1.0 && ra.getDouble(5) == 3.0 &&
      ra.getDouble(6) == 2.0)
    val rb = p("b")
    assert(rb.getLong(1) == 2 && rb.getLong(2) == 2 && rb.getLong(3) == 2)
    assert(rb.getDouble(4) == 4.0 && rb.getDouble(5) == 6.0 &&
      rb.getDouble(6) == 5.0)
  }

  // ---- runningDistinct ----------------------------------------------

  test("runningDistinct is the exact cumulative cardinality") {
    val df = Seq(
      (1L, 1, "a"), (1L, 2, "b"), (1L, 3, "a"), (1L, 4, "c"), (1L, 5, "b"),
      (2L, 1, "z"))
      .toDF("k", "ord", "v")
    val got = Analytics.runningDistinct(df, "k", Seq("ord"), "v")
      .orderBy($"k", $"ord").select($"rd").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 2L, 3L, 3L, 1L))
  }

  // ---- kAnonymityRisk -----------------------------------------------

  test("kAnonymityRisk lists only under-k groups") {
    val df = (Seq.fill(5)(("x", 1)) ++ Seq(("y", 1), ("y", 2)))
      .toDF("q1", "q2")
    val got = Analytics.kAnonymityRisk(df, Seq($"q1", $"q2"),
        Seq("a", "b"), k = 5)
      .orderBy($"a", $"b").collect()
    assert(got.toSeq == Seq(Row("y", 1, 1L), Row("y", 2, 1L)))
  }

  // ---- weightedMedian -----------------------------------------------

  test("weightedMedian picks the lower weighted median, exact at the boundary") {
    // group g1: values 1 (w 1), 2 (w 1) — total 2, 2*cum(1)=2 >= 2 → 1.0
    // group g2: values 1 (w 1), 2 (w 3) — total 4, value 1 has 2*1 < 4 → 2.0
    // group g3: single value           → itself
    val df = Seq(
      ("g1", 1.0, 1L), ("g1", 2.0, 1L),
      ("g2", 1.0, 1L), ("g2", 2.0, 2L), ("g2", 2.0, 1L),
      ("g3", 7.0, 9L))
      .toDF("g", "v", "w")
    val got = Analytics.weightedMedian(df, Seq("g"), "v", col("w"))
      .orderBy($"g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq(("g1", 1.0, 2L), ("g2", 2.0, 4L), ("g3", 7.0, 9L)))
  }

  // ---- madOutlierStats ----------------------------------------------

  test("madOutlierStats matches hand-computed median/MAD/outliers") {
    // values: 1..9 plus a wild 1000 → med 5.5, ads {0.5,...,4.5, 994.5}
    // → mad 2.5, cutoff 3·1.4826·2.5 = 11.1195 → one outlier (1000)
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("g", "x")
    val r = Analytics.madOutlierStats(df, "g", "x", cutoff = 3.0).collect()(0)
    assert(r.getLong(1) == 10)
    assert(r.getDouble(2) == 5.5)
    assert(r.getDouble(3) == 2.5)
    assert(r.getLong(4) == 1L)
  }

  // ---- bigramConditionalTop -----------------------------------------

  test("bigramConditionalTop counts bigrams and conditional probabilities") {
    val df = Seq(
      ("s", "a b a b"), // bigrams: (a,b) (b,a) (a,b)
      ("s", "a c"),     // (a,c)
      ("s", "x"),       // no bigram
      ("s", ""))        // no bigram
      .toDF("src", "text")
    val got = Analytics.bigramConditionalTop(df, "src", "text", k = 10)
      .orderBy($"rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // counts: (a,b)=2, (a,c)=1, (b,a)=1; P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1
    assert(got == Seq(("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 1.0)))
  }

  // ---- hardNegatives -------------------------------------------------

  test("hardNegatives struct-max agg equals a ranking-window reference") {
    val rnd = new scala.util.Random(42)
    val df = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val got = Analytics.hardNegatives(df, "vec_id", "embedding", "label",
        col("vec_id") % 5 === 0)
      .orderBy($"query_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq

    // reference: explicit window ranking over the same cosine expression
    graft.functions.CosineSimilarity.register(spark)
    val c = df.select($"vec_id".as("cid"), $"embedding".as("cv"), $"label".as("cl"))
    val q = df.filter($"vec_id" % 5 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"), $"label".as("ql"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
    val ref = q.crossJoin(c).filter($"ql" =!= $"cl")
      .withColumn("cos",
        graft.functions.CosineSimilarity.cosineSim($"qv", $"cv"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .orderBy($"qid").collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == ref)
  }

  test("hardNegatives emits no row when every candidate shares the label") {
    val df = Seq((1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    assert(Analytics.hardNegatives(df, "vec_id", "embedding", "label",
      col("vec_id") === 1).count() == 0)
  }

  // ---- corpusOverlapMatrix -------------------------------------------

  test("corpusOverlapMatrix: hand-computed distinct-gram overlap and Jaccard") {
    // 2-grams: A = {a b, b c, c d} ∪ {a b} (dup collapses) = 3 grams
    //          B = {b c, c d, d e}          = 3 grams, overlap 2
    //          C = "x" (too short) → no grams → no pair rows
    val df = Seq(
      ("A", "a b c d"), ("A", "a b"),
      ("B", "b c d e"),
      ("C", "x"))
      .toDF("g", "text")
    val got = Analytics.corpusOverlapMatrix(df, "g", "text", n = 2).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1)) == ("A", "B"))
    assert(r.getLong(2) == 3 && r.getLong(3) == 3 && r.getLong(4) == 2)
    assert(r.getDouble(5) == 0.5) // 2 / (3 + 3 - 2)
  }

  // ---- zipfFit -------------------------------------------------------

  test("zipfFit matches a driver-side OLS on the same (rank, freq) table") {
    // frequencies: w1×8, w2×4, w3×2, w4×1 → ranks 1..4
    val text = (Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++
      Seq.fill(2)("w3") ++ Seq("w4")).mkString(" ")
    val df = Seq(("s", text)).toDF("g", "text")
    val r = Analytics.zipfFit(df, "g", "text").collect()(0)
    assert(r.getLong(1) == 4 && r.getLong(2) == 15)
    val pts = Seq((8.0, 1.0), (4.0, 2.0), (2.0, 3.0), (1.0, 4.0))
      .map { case (c, rk) => (math.log(rk), math.log(c)) } // x = ln rank, y = ln freq
    val n = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(3) - slope) < 1e-5, s"${r.getDouble(3)} vs $slope")
    assert(r.getDouble(4) > 0.9) // near-perfect power law by construction
  }

  // ---- semDedupKeep --------------------------------------------------

  test("semDedupKeep: min id survives each planted near-dup pair") {
    // 1 and 3 identical; 2 orthogonal; 4 = 3 scaled (cos 1) — keep {1, 2}
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(1f, 0f, 0f)),
      (4L, Array(2f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val kept = Analytics.semDedupKeep(df, "vec_id", "embedding", tau = 0.99)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("semDedupKeep keep rule is non-transitive (chain keeps the middle-dropped ends correctly)") {
    // a·b = cos 0.9, b·c = cos 0.9, a·c = cos 0.62 (below tau): with
    // tau 0.8 the min-id rule drops b (near a) and keeps c (its only
    // smaller-id near-neighbor is b, but the rule is pairwise against
    // ALL smaller ids regardless of their own survival — c's neighbor b
    // is < c and near, so c drops too). Documents the greedy semantics.
    val deg = math.toRadians(25.84) // cos ≈ 0.9
    val a = Array(1f, 0f)
    val b = Array(math.cos(deg).toFloat, math.sin(deg).toFloat)
    val c = Array(math.cos(2 * deg).toFloat, math.sin(2 * deg).toFloat)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    val kept = Analytics.semDedupKeep(df, "vec_id", "embedding", tau = 0.8)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("populationStability: hand-computed PSI, every bin present, empty-slice safe") {
    import org.apache.spark.sql.functions.col
    val ref = Seq(1.0, 1.0, 5.0, 9.0).toDF("v")
    val cur = Seq(1.0, 9.0, 9.0).toDF("v")
    // 2 bins over [0, 10), width 5: ref = (2 ones | 5, 9) = (2, 2);
    // cur = (1.0 | 9, 9) = (1, 2)
    val rows = Analytics.populationStability(ref, cur, "v", 0.0, 10.0, buckets = 2)
      .orderBy(col("bucket")).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 2L, 1L), (1L, 2L, 2L)))
    // Laplace form: p0 = 2.5/5, q0 = 1.5/4; contrib = (p0-q0)·ln(p0/q0)
    val p0 = 2.5 / 5; val q0 = 1.5 / 4
    assert(math.abs(rows(0).getDouble(3) - (p0 - q0) * math.log(p0 / q0)) < 1e-12)
    // drift symmetry: PSI(a, b) == PSI(b, a) (the formula is symmetric
    // under swap up to sign inside both factors)
    val psiAB = Analytics.populationStability(ref, cur, "v", 0.0, 10.0, 2)
      .agg(org.apache.spark.sql.functions.sum(col("contrib"))).first().getDouble(0)
    val psiBA = Analytics.populationStability(cur, ref, "v", 0.0, 10.0, 2)
      .agg(org.apache.spark.sql.functions.sum(col("contrib"))).first().getDouble(0)
    assert(math.abs(psiAB - psiBA) < 1e-12 && psiAB > 0)
    // an EMPTY current slice: smoothing keeps every contrib finite, all
    // bins still present
    val empty = Analytics.populationStability(
        ref, cur.filter(col("v") < 0), "v", 0.0, 10.0, buckets = 2)
      .orderBy(col("bucket")).collect()
    assert(empty.length == 2 && empty.forall(r => !r.getDouble(3).isNaN
      && !r.getDouble(3).isInfinite))
    // out-of-range values clamp into edge bins, never drop
    val clamped = Analytics.populationStability(
        Seq(-5.0, 50.0).toDF("v"), cur, "v", 0.0, 10.0, buckets = 2)
      .orderBy(col("bucket")).collect()
    assert(clamped.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 1L), (1L, 1L)))
  }

  test("abTest: hand-computed z on a planted conversion split") {
    import org.apache.spark.sql.functions.col
    // users 0..9; conversion event only for users 1,3,5 (variant 1) and 2 (variant 0)
    val events = (0L to 9L).map(u => (u, "view", 0.0)) ++
      Seq((1L, "buy", 1.0), (3L, "buy", 1.0), (5L, "buy", 1.0), (2L, "buy", 1.0))
    val df = events.toDF("user_id", "event_type", "value")
    val r = Analytics.abTest(df, "user_id", col("event_type") === "buy").first()
    val (n0, c0, n1, c1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert((n0, c0, n1, c1) == ((5L, 1L, 5L, 3L)))
    val p0 = 1.0 / 5; val p1 = 3.0 / 5; val pp = 4.0 / 10
    val z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1.0 / 5 + 1.0 / 5))
    assert(math.abs(r.getDouble(6) - math.round(z * 1e6) / 1e6) < 1e-9)
  }

  test("abTest: degenerate experiments surface a row with NULL z (r7 advice)") {
    import org.apache.spark.sql.functions.col
    // one-sided: only even user ids -> variant 1 empty, row still emitted
    val oneSided = Seq((0L, "buy", 1.0), (2L, "view", 0.0), (4L, "buy", 1.0))
      .toDF("user_id", "event_type", "value")
    val r1 = Analytics.abTest(oneSided, "user_id", col("event_type") === "buy").first()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) ==
      ((3L, 2L, 0L, 0L)))
    assert(r1.isNullAt(5) && r1.isNullAt(6)) // p1 and z NULL, not absent
    // zero variance: every user converts -> pooled p = 1, z NULL
    val allConv = Seq((0L, "buy", 1.0), (1L, "buy", 1.0))
      .toDF("user_id", "event_type", "value")
    val r2 = Analytics.abTest(allConv, "user_id", col("event_type") === "buy").first()
    assert(!r2.isNullAt(4) && !r2.isNullAt(5) && r2.isNullAt(6))
    // fully empty input: nothing to report on -> zero rows
    val empty = Seq.empty[(Long, String, Double)].toDF("user_id", "event_type", "value")
    assert(Analytics.abTest(empty, "user_id", col("event_type") === "buy").count() == 0)
  }
}
