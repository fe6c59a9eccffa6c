package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Graph.pageRank]]: hand-computed fixpoints, conservation properties,
  * and agreement with a driver-side reference power iteration.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("ring graph stays exactly uniform at any depth") {
    // a directed ring: every node has outdeg 1 and indeg 1, so 1/N is a
    // fixpoint of the iteration and every rank stays exactly 1/N
    val n = 12
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == n)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-15))
  }

  test("star graph matches the hand-derived one-iteration values") {
    // A(0)→B(1), A→C(2), B→A, C→A; after one iteration from r0 = 1/3:
    // r(A) = 0.15/3 + 0.85·(1/3 + 1/3), r(B) = r(C) = 0.15/3 + 0.85·(1/3)/2
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)).toDF("s", "d")
    val r = Graph.pageRank(edges, "s", "d", iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val base = (1.0 - 0.85) / 3
    assert(math.abs(r(0L) - (base + 0.85 * (2.0 / 3))) < 1e-15)
    assert(math.abs(r(1L) - (base + 0.85 * (1.0 / 3) / 2)) < 1e-15)
    assert(math.abs(r(2L) - r(1L)) < 1e-15)
  }

  test("matches a driver-side reference iteration on an irregular graph") {
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 0L), (3L, 1L), (3L, 2L),
      (4L, 0L), (4L, 4L)) // includes a self-loop and an asymmetric hub
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val d = 0.85; val n = nodes.size
    var ranks = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map(e => ranks(e._1) / outdeg(e._1)).sum).toMap
      ranks = nodes.map(v =>
        v -> ((1 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet == ranks.keySet)
    ranks.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-14, s"node $k") }
  }

  test("no-dangling graphs conserve total rank; dangling mass decays") {
    val closed = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 1L)).toDF("s", "d")
    val tot = Graph.pageRank(closed, "s", "d", iters = 5)
      .agg(sum("rank")).as[Double].head()
    assert(math.abs(tot - 1.0) < 1e-12)
    // node 2 is dangling: its mass leaves the system (documented semantics)
    val dangling = Seq((0L, 1L), (1L, 2L)).toDF("s", "d")
    val tot2 = Graph.pageRank(dangling, "s", "d", iters = 5)
      .agg(sum("rank")).as[Double].head()
    assert(tot2 < 1.0 - 1e-6)
  }

  test("checkpointEvery truncates lineage without changing results") {
    val edges = (0 until 20).map(i => (i.toLong, ((i * 7 + 3) % 20).toLong))
      .toDF("src", "dst")
    val plain = Graph.pageRank(edges, "src", "dst", iters = 6)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val ck = Graph.pageRank(edges, "src", "dst", iters = 6, checkpointEvery = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(plain.keySet == ck.keySet)
    plain.foreach { case (k, v) => assert(math.abs(ck(k) - v) < 1e-15) }
  }

  test("parameter validation") {
    val e = Seq((0L, 1L)).toDF("s", "d")
    intercept[IllegalArgumentException](Graph.pageRank(e, "s", "d", -1))
    intercept[IllegalArgumentException](Graph.pageRank(e, "s", "d", 1, damping = 1.0))
  }

  test("triangleCount: complete graphs, squares, and normalization") {
    def count(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = Graph.triangleCount(edges.toDF("s", "d"), "s", "d").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // K3: one triangle
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 0L))) == ((3L, 3L, 1L)))
    // K4: C(4,3) = 4 triangles
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(count(k4) == ((4L, 6L, 4L)))
    // square without diagonals: 0 triangles
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))) == ((4L, 4L, 0L)))
    // duplicates, reversed edges, self-loops all normalize away
    assert(count(Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L),
      (1L, 2L), (2L, 0L))) == ((3L, 3L, 1L)))
  }

  test("triangleCount matches a driver-side reference on a random graph") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val cs = canon.toSet
    // brute-force triple enumeration (NOT an adjacency-set comprehension:
    // a Set generator in a for/yield collapses same-valued yields)
    val n = 30L
    val want = (for {
      x <- 0L until n; y <- x + 1 until n; z <- y + 1 until n
      if cs((x, y)) && cs((x, z)) && cs((y, z))
    } yield (x, y, z)).size
    val r = Graph.triangleCount(edges.toDF("s", "d"), "s", "d").collect().head
    assert(r.getLong(1) == canon.size.toLong)
    assert(r.getLong(2) == want.toLong, s"expected $want triangles")
  }
}
