package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.load(
    spark, "/root/testdata/sf0.001", "documents")

  test("piiRedact masks email/ipv4/phone, leaves SSN-shaped decoys, counts match") {
    val df = Seq(
      (1L, "write a.b-c_9@mail.example.org or ping 192.168.0.1 then +1-555-0199 done"),
      (2L, "no pii here, 1.2.3 is not an ip and 123-45-6789 is not matched"),
      (3L, "two mails x@y.io z@w.co plus 10.0.0.255 10.0.0.256 edge"),
    ).toDF("id", "text")
    val out = Curation.piiScan(df, "text").orderBy("id")
      .select("id", "n_email", "n_ipv4", "n_phone", "redacted")
      .as[(Long, Long, Long, Long, String)].collect()

    assert(out(0) == ((1L, 1L, 1L, 1L,
      "write <EMAIL> or ping <IP> then <PHONE> done")))
    // precision: version-ish dotted triple and SSN shape untouched
    assert(out(1) == ((2L, 0L, 0L, 0L,
      "no pii here, 1.2.3 is not an ip and 123-45-6789 is not matched")))
    // \d{1,3} matches 256 too (purely syntactic IPv4, documented), and both
    // mails redact
    assert(out(2)._2 == 2L && out(2)._3 == 2L)
    assert(out(2)._5 == "two mails <EMAIL> <EMAIL> plus <IP> <IP> edge")
  }

  test("assignSplit: deterministic, total, respects weights roughly, stable under growth") {
    val d = docs
    val split = Curation.assignSplit(col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = d.select(split.as("s")).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    val n = d.count().toDouble
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == n.toLong) // total: every row lands somewhere
    assert(counts("train") / n > 0.6 && counts("train") / n < 0.95)

    // growth-stability: the assignment of a doc doesn't depend on the
    // rest of the corpus
    val sub = d.filter(col("doc_id") % 3 === 0)
    val full = d.select(col("doc_id"), split.as("s")).as[(Long, String)]
      .collect().toMap
    val subM = sub.select(col("doc_id"), split.as("s")).as[(Long, String)]
      .collect().toMap
    assert(subM.forall { case (id, s) => full(id) == s })

    // determinism across evaluations
    val again = d.select(col("doc_id"), split.as("s")).as[(Long, String)]
      .collect().toMap
    assert(again == full)
  }

  test("stratifiedSample equals the naive per-stratum top-k, prefilter prunes the exchange") {
    val d = docs
    val k = 7
    def naive = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      d.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select(col("source"), col("doc_id"), col("rk"))
        .as[(String, Long, Int)].collect().toSet
    }
    val two = Curation.stratifiedSample(d, "source", "doc_id", k)
      .select(col("source"), col("doc_id"), col("rk"))
      .as[(String, Long, Int)].collect().toSet
    assert(two == naive)

    // tight overscan forces the fallback path on some strata; result must
    // still be exact
    val tight = Curation.stratifiedSample(d, "source", "doc_id", k,
      overscan = 1.0)
      .select(col("source"), col("doc_id"), col("rk"))
      .as[(String, Long, Int)].collect().toSet
    assert(tight == naive)

    // k >= stratum size degenerates to "everything, ranked"
    val all = Curation.stratifiedSample(d, "source", "doc_id", 100000)
    assert(all.count() == d.count())
  }

  test("chunkOwnershipStats: every distinct chunk owned exactly once, by its min doc") {
    val df = Seq(
      (10L, "a b c d e f g h i j"),   // chunks: "a..h", "i j"
      (20L, "a b c d e f g h x y"),   // first chunk duplicates doc 10's
      (30L, ""),                      // empty: zero chunks, no output row
      (40L, "i j"),                   // duplicates doc 10's tail chunk
    ).toDF("doc_id", "text")
    val out = Curation.chunkOwnershipStats(df, "doc_id", "text", chunkTokens = 8)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 2L, 20L -> 1L)) // 30 empty, 40 fully deduped
    // conservation: owned chunks sum to the number of distinct chunk texts
    val distinctChunks = TextAnalysis.chunkDocuments(df, "doc_id", "text", 8, 0)
      .select("chunk_text").distinct().count()
    assert(out.values.sum == distinctChunks)
  }

  test("tokenBudgetMixture ≡ naive full-window form; budget-hit property") {
    val d = docs.select(col("doc_id"), col("source"), col("text"))
    // naive: one cumulative-sum window over the whole source — the
    // definitional form the two-phase hash-prefilter plan must reproduce
    def naive(budget: org.apache.spark.sql.Column) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      d.withColumn("n_tok", size(TextAnalysis.tokens(col("text"))).cast("long"))
        .withColumn("tok_start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .filter(col("tok_start") < budget)
        .select(col("source"), col("doc_id"), col("n_tok"), col("tok_start"))
        .as[(String, Long, Long, Long)].collect().toSet
    }
    // smallThreshold = 0 forces the two-phase hash-prefilter branch —
    // the scale path this test exists to pin against the definition
    def twoPhase(budget: org.apache.spark.sql.Column) =
      Curation.tokenBudgetMixture(d, "source", "doc_id", "text", budget,
          smallThreshold = 0L)
        .select(col("source"), col("doc_id"), col("n_tok"), col("tok_start"))
        .as[(String, Long, Long, Long)].collect().toSet
    def defaultPath(budget: org.apache.spark.sql.Column) =
      Curation.tokenBudgetMixture(d, "source", "doc_id", "text", budget)
        .select(col("source"), col("doc_id"), col("n_tok"), col("tok_start"))
        .as[(String, Long, Long, Long)].collect().toSet

    for (b <- Seq(lit(1L), lit(120L), lit(700L), lit(1000000L),
        when(length(col("source")) === 4, 150L).otherwise(400L))) {
      assert(twoPhase(b) == naive(b), s"two-phase != naive for budget $b")
      // the size-branched default (single-window small path here) must
      // be indistinguishable from the forced scale path
      assert(defaultPath(b) == naive(b), s"default branch != naive for budget $b")
    }

    // budget-hit property: kept tokens reach the budget (source permitting)
    // and removing the boundary doc drops below it
    val b = 300L
    val kept = twoPhase(lit(b)).groupBy(_._1)
    val totals = d
      .withColumn("n", size(TextAnalysis.tokens(col("text"))).cast("long"))
      .groupBy("source").agg(sum(col("n")).as("t"))
      .as[(String, Long)].collect().toMap
    kept.foreach { case (src, rows) =>
      val tot = rows.toSeq.map(_._3).sum
      if (totals(src) >= b) {
        assert(tot >= b, s"$src kept $tot < budget $b")
        val maxStart = rows.maxBy(_._4)
        assert(tot - maxStart._3 < b, s"$src boundary doc not minimal")
      } else assert(tot == totals(src))
    }

    // budget larger than every source: identity selection
    assert(twoPhase(lit(1000000L)).size == d.count())

    // null keys are dropped IDENTICALLY in both branches (r11 advice:
    // the scale path's _h16 join could never carry them; the small
    // path must not keep them either), and rowCountHint picks the
    // same branch result as the bounded count
    val dNull = d.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], "web", "one two three"))
        .toDF("doc_id", "source", "text")
        .select(col("doc_id").cast("long").as("doc_id"),
          col("source"), col("text")))
    def run(st: Long, hint: Long) =
      Curation.tokenBudgetMixture(dNull, "source", "doc_id", "text",
          lit(120L), smallThreshold = st, rowCountHint = hint)
        .select(col("source"), col("doc_id"), col("n_tok"), col("tok_start"))
        .as[(String, Long, Long, Long)].collect().toSet
    val expect = naive(lit(120L)) // nulls absent from the definition too
    assert(run(0L, -1L) == expect)              // scale branch
    assert(run(2000000L, -1L) == expect)        // small branch (counted)
    assert(run(2000000L, 10L) == expect)        // small branch (hinted)
    assert(run(2000000L, 5000000L) == expect)   // hint forces scale branch
  }

  test("weightedSample: matches the driver-computed exponential race; invariances hold") {
    val rows = (1L to 200L).map(i => (i, (i % 13) + 1L))
    val d = rows.toDF("id", "w")
    // independent driver-side computation of the same draws
    def draw(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      -math.log(u) / w
    }
    val expected = rows.sortBy { case (id, w) => (draw(id, w), id) }
      .take(25).map(_._1)
    val got = Curation.weightedSample(d, "id", col("w"), k = 25)
      .orderBy(col("rk")).select("id").as[Long].collect().toSeq
    assert(got == expected)

    // weight scale-invariance: c·w divides every draw by c — same sample
    val scaled = Curation.weightedSample(d, "id", col("w") * 7.0, k = 25)
      .orderBy(col("rk")).select("id").as[Long].collect().toSeq
    assert(scaled == expected)

    // partitioning-independence: the draw is a pure key function
    val repart = Curation.weightedSample(d.repartition(17), "id", col("w"), k = 25)
      .orderBy(col("rk")).select("id").as[Long].collect().toSeq
    assert(repart == expected)

    // the cut plans as TakeOrderedAndProject, not a global sort
    val plan = Curation.weightedSample(d, "id", col("w"), k = 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k plan:\n$plan")
  }

  test("packSequences equals the naive global-window cumsum (all buckets)") {
    // non-contiguous ids, zero-token docs, and a doc longer than capacity
    val rnd = new scala.util.Random(11)
    val d = (0 until 500).map { i =>
      val n = if (i % 37 == 0) 0L else if (i % 101 == 0) 900L
        else rnd.nextInt(120).toLong
      (i.toLong * 7 + (i % 3), n) // unique, uneven spacing
    }.toDF("id", "n")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = d
      .withColumn("start", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("bin_start", floor(col("start") / 256))
      .withColumn("bin_end",
        floor((col("start") + greatest(col("n"), lit(1L)) - 1) / 256))
      .withColumn("spans", col("bin_end") =!= col("bin_start"))
      .select("id", "n", "start", "bin_start", "bin_end", "spans")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    for (b <- Seq(2, 7, 32)) {
      val got = Curation.packSequences(d, "id", "n", 256, buckets = b)
        .select("id", "n", "start", "bin_start", "bin_end", "spans")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == naive, s"buckets=$b diverges from the naive scan")
    }
    // layout independence (the repartitionByRange pid bug regression pin)
    val re = Curation.packSequences(d.repartition(13), "id", "n", 256, buckets = 7)
      .select("id", "start").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(re == naive.map(t => (t._1, t._3)))
    // a 900-token doc in 256-token bins always crosses >= 3 boundaries
    val big = naive.find(_._2 == 900L).get
    assert(big._5 - big._4 >= 3, s"multi-bin span: $big")
    // column-collision guard
    intercept[IllegalArgumentException] {
      Curation.packSequences(d.withColumn("start", lit(1)), "id", "n", 256)
    }
  }

  test("importanceWeights/Scores: hand-computed DSIR ratios on a toy corpus") {
    val raw = Seq(
      (1L, "cat dog"), (2L, "cat cat fish"), (3L, "dog bird")).toDF("id", "text")
    val target = raw.filter(col("id") === 2L) // target: cat cat fish
    val w = Curation.importanceWeights(raw, target, "text")
      .as[(String, Double)].collect().toMap
    // raw: cat=3 dog=2 fish=1 bird=1, Nr=7, V=4; target: cat=2 fish=1, Nt=3
    def expw(ct: Long, cr: Long): Double =
      math.log((ct + 1.0) / (3 + 4)) - math.log((cr + 1.0) / (7 + 4))
    assert(w.keySet == Set("cat", "dog", "fish", "bird"))
    assert(math.abs(w("cat") - expw(2, 3)) < 1e-12)
    assert(math.abs(w("dog") - expw(0, 2)) < 1e-12)
    assert(math.abs(w("fish") - expw(1, 1)) < 1e-12)
    assert(math.abs(w("bird") - expw(0, 1)) < 1e-12)
    // scores: sum of weights; target-like docs score higher
    val weights = Curation.importanceWeights(raw, target, "text")
    val s = Curation.importanceScores(raw, "id", "text", weights)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(math.abs(s(2L) - (2 * w("cat") + w("fish"))) < 1e-12)
    assert(s(2L) > s(3L), "the target doc must outscore the off-target doc")
    // empty/untokenizable doc scores 0 through the join-back
    val withEmpty = raw.union(Seq((9L, "   ")).toDF("id", "text"))
    val s2 = Curation.importanceScores(withEmpty, "id", "text", weights)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(s2(9L) == 0.0)
  }

  test("dsirScores (fused) ≡ importanceWeights→importanceScores (composed), incl. empty docs") {
    val raw = docs.limit(150).select(col("doc_id").as("id"),
        (col("doc_id") % 3 === 0).as("tgt"), col("text"))
      .union(Seq((100000L, false, "   ")).toDF("id", "tgt", "text"))
    val weights = Curation.importanceWeights(
      raw, raw.filter(col("tgt")), "text")
    val composed = Curation.importanceScores(raw, "id", "text", weights)
      .select("id", "score").as[(Long, Double)].collect()
      .map(t => (t._1, math.round(t._2 * 1e9))).sortBy(_._1).toSeq
    val fused = Curation.dsirScores(raw, "id", "text", col("tgt"))
      .select("id", "score").as[(Long, Double)].collect()
      .map(t => (t._1, math.round(t._2 * 1e9))).sortBy(_._1).toSeq
    assert(fused == composed)
    assert(fused.exists(_._1 == 100000L) &&
      fused.find(_._1 == 100000L).get._2 == 0L, "empty doc scores 0")
  }

  test("hashed-feature DSIR: bucket collapse is consistent between train and score") {
    val raw = docs.limit(120).select(col("doc_id").as("id"), col("text"))
    val target = raw.filter(col("id") % 5 === 0)
    val w = Curation.importanceWeights(raw, target, "text", hashBuckets = 64)
    assert(w.count() <= 64, "hashed weight table must be bounded by the bucket count")
    val s = Curation.importanceScores(raw, "id", "text", w, hashBuckets = 64)
      .select("id", "score").as[(Long, Double)].collect()
    assert(s.length == 120 && s.forall(r => !r._2.isNaN))
    // hashing must be the md5-derived cross-engine bucket, so scoring with
    // the same bucket count reproduces exactly under repartitioning
    val s2 = Curation.importanceScores(raw.repartition(7), "id", "text", w,
        hashBuckets = 64)
      .select("id", "score").as[(Long, Double)].collect()
    assert(s.sortBy(_._1).map(t => (t._1, math.round(t._2 * 1e9))).toSeq ==
      s2.sortBy(_._1).map(t => (t._1, math.round(t._2 * 1e9))).toSeq)
  }

  test("temperatureMixture: hand-computed sqrt-weighted largest-remainder allocation") {
    import spark.implicits._
    // sources with 100 / 400 / 900 tokens → sqrt scores 10:20:30 (exact
    // integer sqrt, scale cancels) → weights 1/6, 2/6, 3/6 of budget
    // 100: floors 16/33/50, leftover 1, remainders 4/6 (a), 2/6 (b),
    // 0 (c) → the +1 goes to a. Allocations sum to the budget EXACTLY.
    val docs = Seq(
      ("a", ("w " * 100).trim), ("b", ("w " * 400).trim),
      ("c", ("w " * 900).trim)).toDF("source", "text")
    val got = Curation.temperatureMixture(docs, "source", "text", budget = 100L)
      .orderBy("source")
      .select("source", "n_tokens", "alloc_tokens", "epochs")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 100L, 17L, 0.17), ("b", 400L, 33L, 0.0825), ("c", 900L, 50L, 0.055556)))
    assert(got.map(_._3).sum == 100L)
    // a bigger budget: the low-resource source upsamples past 1 epoch
    val e = Curation.temperatureMixture(docs, "source", "text", budget = 2000L)
      .orderBy("source").select("source", "alloc_tokens", "epochs")
      .as[(String, Long, Double)].collect().toSeq
    assert(e.map(_._2).sum == 2000L)
    assert(e.head._1 == "a" && e.head._3 > 1.0, "sqrt rule upsamples low-resource")
  }
}
