package graft.operators

import graft.SparkSpec

/** [[Linkage]]: PassJoin losslessness vs brute force, containment hand
  * cases and degenerate inputs.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // reference Levenshtein for the brute-force side
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(strs: Seq[(Long, String)], tau: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= tau
    } yield (ia, ib, d)).toSet

  test("editDistanceSelfJoin equals brute force on random short strings (tau 1 and 2)") {
    val rnd = new scala.util.Random(11)
    // clustered strings so true matches exist: mutations of a few seeds
    val seeds = Seq("abcdefg", "xyzzyab", "q", "", "abcdefgh")
    val strs = (0L until 120L).map { i =>
      val s = seeds(rnd.nextInt(seeds.length)).toCharArray
      val muts = rnd.nextInt(3)
      val out = (0 until muts).foldLeft(new String(s)) { (acc, _) =>
        if (acc.isEmpty) "a"
        else rnd.nextInt(3) match {
          case 0 => val p = rnd.nextInt(acc.length) // substitute
            acc.updated(p, ('a' + rnd.nextInt(4)).toChar)
          case 1 => val p = rnd.nextInt(acc.length + 1) // insert
            acc.take(p) + ('a' + rnd.nextInt(4)).toChar + acc.drop(p)
          case _ => val p = rnd.nextInt(acc.length) // delete
            acc.take(p) + acc.drop(p + 1)
        }
      }
      (i, out)
    }
    val df = strs.toDF("id", "s")
    for (tau <- Seq(1, 2)) {
      val got = Linkage.editDistanceSelfJoin(df, "id", "s", tau)
        .select("id_a", "id_b", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = brute(strs, tau)
      assert(got == want,
        s"tau=$tau missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, "degenerate fixture: no true pairs")
    }
  }

  test("editDistanceSelfJoin handles strings shorter than tau+1 and empties") {
    val strs = Seq((0L, ""), (1L, "a"), (2L, "ab"), (3L, "ba"), (4L, "zzzz"))
    val got = Linkage.editDistanceSelfJoin(strs.toDF("id", "s"), "id", "s", 2)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute(strs, 2))
  }

  test("editDistanceSelfJoin rejects out-of-range tau") {
    val df = Seq((0L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException](Linkage.editDistanceSelfJoin(df, "id", "s", 0))
    intercept[IllegalArgumentException](Linkage.editDistanceSelfJoin(df, "id", "s", 5))
  }

  test("containmentSelfJoin: hand-computed overlap and containment") {
    // d0: 6 distinct bigrams; d1 embeds d0's "c d e" span → shares
    // bigrams {c d, d e}; d1 has 4 distinct bigrams → containment 2/4
    val docs = Seq(
      (0L, "a b c d e f g"),      // bigrams: ab bc cd de ef fg (6)
      (1L, "x c d e y"),          // bigrams: xc cd de ey (4)
      (2L, "p q")                 // 1 bigram, no overlap
    ).toDF("doc_id", "text")
    val got = Linkage.containmentSelfJoin(docs, "doc_id", "text",
        n = 2, minContainment = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 1L, 2L, 0.5)))
    // raising the threshold above 0.5 removes the pair
    assert(Linkage.containmentSelfJoin(docs, "doc_id", "text", 2, 0.6).count() == 0)
  }

  test("containmentSelfJoin: full containment scores 1.0; short docs drop out") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "z a b c d e z"),      // every trigram of... check distinct 3-grams
      (2L, "a b")                 // shorter than n → no grams, never a pair
    ).toDF("doc_id", "text")
    val got = Linkage.containmentSelfJoin(docs, "doc_id", "text",
        n = 3, minContainment = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // d0 trigrams: abc bcd cde (3); d1 contains all of them → containment 1.0
    assert(got.toSeq == Seq((0L, 1L, 1.0)))
  }
}
