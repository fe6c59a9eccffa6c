package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  // keyed, versioned change log: (key, version, payload)
  private lazy val changes = Seq(
    ("a", 1L, "a-v1", false),
    ("a", 3L, "a-v3", false),
    ("a", 2L, "a-v2", false),
    ("b", 1L, "b-v1", false),
    ("c", 1L, "c-v1", false),
    ("c", 2L, "c-del", true) // newest c record is a tombstone
  ).toDF("k", "v", "payload", "deleted")

  test("latestByKey: greatest version wins per key, layout-independent") {
    val out = Snapshot.latestByKey(changes, Seq("k"), Seq("v"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a-v3", "b" -> "b-v1", "c" -> "c-del"))
    val shuffled = Snapshot.latestByKey(changes.repartition(7), Seq("k"), Seq("v"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(shuffled == out)
  }

  test("latestByKey: composite version vector is lexicographic") {
    val df = Seq(
      ("k", 1L, 9L, "low-major-high-minor"),
      ("k", 2L, 0L, "high-major")
    ).toDF("k", "maj", "min", "payload")
    val out = Snapshot.latestByKey(df, Seq("k"), Seq("maj", "min"))
      .select("payload").as[String].collect()
    assert(out.toSeq == Seq("high-major"))
  }

  test("merge: newer version wins; delta wins exact-version ties") {
    val base = Seq(("a", 2L, "base-a2"), ("b", 1L, "base-b1"))
      .toDF("k", "v", "payload")
    val delta = Seq(("a", 2L, "delta-a2"), ("b", 0L, "delta-b0-stale"))
      .toDF("k", "v", "payload")
    val out = Snapshot.merge(base, delta, Seq("k"), Seq("v"))
      .select("k", "payload").as[(String, String)].collect().toMap
    // a: exact tie at v=2 → the correction batch's re-statement wins
    // b: delta is OLDER → base survives (out-of-order delta is a no-op)
    assert(out == Map("a" -> "delta-a2", "b" -> "base-b1"))
  }

  test("merge: winning tombstone deletes the key; older tombstone does not") {
    val base = changes.filter(!col("deleted")) // live history incl. c-v1
    val delta = changes.filter(col("deleted")) // the (c, 2, tombstone)
    val out = Snapshot.merge(base, delta, Seq("k"), Seq("v"),
        tombstoneCol = Some("deleted"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a-v3", "b" -> "b-v1")) // c gone
    // a tombstone OLDER than the live record must not delete the key
    val staleDel = Seq(("a", 0L, "a-del", true))
      .toDF("k", "v", "payload", "deleted")
    val out2 = Snapshot.merge(changes.filter(!col("deleted")), staleDel,
        Seq("k"), Seq("v"), tombstoneCol = Some("deleted"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(out2("a") == "a-v3" && out2.keySet == Set("a", "b", "c"))
  }

  test("latestByKey plans as partial+final aggregate, not a window sort") {
    val plan = Snapshot.latestByKey(changes, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    // two aggregate nodes (map-side partial + reduce-side final) and no
    // window: the shuffle carries ≤1 row per (key, map partition) — the
    // property the operator exists for (see Snapshot scaladoc)
    assert(!plan.contains("Window"), plan)
    assert(plan.linesIterator.count(l =>
      l.contains("Aggregate") && l.contains("max_by")) >= 2, plan)
  }

  test("randomized differential: merge ≡ window-based reference") {
    // seeded generator: a few hot keys, colliding versions across base
    // and delta (the tie path), plus tombstones
    val rnd = new scala.util.Random(42)
    // deleted derives from row CONTENT (not an independent coin): rows
    // identical in (k, v, payload, src) must be fully identical, or the
    // documented arbitrary-among-exact-ties pick would differ from the
    // reference's equally-arbitrary pick on semantically distinct rows
    def rows(src: Int) = Seq.fill(300) {
      val (k, v, p) = (s"k${rnd.nextInt(20)}", rnd.nextInt(8).toLong, rnd.nextInt(1000))
      (k, v, p, (k, v, p, src).hashCode.abs % 10 == 0, src)
    }
    val base = rows(0).toDF("k", "v", "payload", "deleted", "src")
    val delta = rows(1).toDF("k", "v", "payload", "deleted", "src")
    // operator under test (drop the src tag first — merge adds its own)
    val got = Snapshot.merge(base.drop("src"), delta.drop("src"),
        Seq("k"), Seq("v", "payload"), tombstoneCol = Some("deleted"))
      .select("k", "v", "payload").as[(String, Long, Int)].collect().toSet
    // reference: window row_number over the union with src as tie-break.
    // (v, payload) is not unique per (k, src) either, so the reference
    // adds payload to its ordering exactly as merge's version vector does
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k"))
      .orderBy(col("v").desc, col("payload").desc, col("src").desc)
    val expect = base.unionByName(delta)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(!col("deleted"))
      .select("k", "v", "payload").as[(String, Long, Int)].collect().toSet
    assert(got == expect)
  }

  test("withIsLatest flags exactly the rows latestByKey keeps") {
    val flagged = Snapshot.withIsLatest(changes, Seq("k"), Seq("v"))
      .filter(col("is_latest"))
      .select("k", "payload").as[(String, String)].collect().toMap
    val compacted = Snapshot.latestByKey(changes, Seq("k"), Seq("v"))
      .select("k", "payload").as[(String, String)].collect().toMap
    assert(flagged == compacted)
  }
}
