package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with planted duplicates:
  //  0/1: identical; 2: near-dup of 0 (one word changed); 3/4: unrelated
  private val base =
    "spark shuffles data between executors when a wide dependency requires repartitioning by key across the cluster"
  private lazy val corpus = Seq(
    (0L, base),
    (1L, base),
    (2L, base.replace("cluster", "network")),
    (3L, "completely different text about cooking pasta with tomatoes and basil in a large pot"),
    (4L, "yet another unrelated document discussing mountain hiking trails and weather conditions"))
    .toDF("doc_id", "text")

  test("exactKeepMinId keeps the smallest id per distinct content") {
    val out = Dedup.exactKeepMinId(corpus, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(0L, 2L, 3L, 4L))
  }

  test("minhash near-dup pairs find identical and near-identical docs") {
    val pairs = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      numHashes = 64, bands = 16, shingleN = 3, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashDedup keep-smallest-id policy") {
    val kept = Dedup.minhashDedup(corpus, "doc_id", "text", threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L) && !kept.contains(1L))
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("jaccard of identical shingle sets is 1.0, disjoint is 0.0") {
    val r = Seq(("x", "x")).toDF("a", "b").select(
      Dedup.jaccard(array(lit("p"), lit("q")), array(lit("p"), lit("q"))).as("same"),
      Dedup.jaccard(array(lit("p")), array(lit("q"))).as("disj")).head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("simhash: identical texts → distance 0; near-dups close; pairs found") {
    val sigs = corpus.select(Dedup.simhash(col("text")).as("s")).as[Long].collect()
    assert(sigs(0) == sigs(1))
    val d02 = java.lang.Long.bitCount(sigs(0) ^ sigs(2))
    val d03 = java.lang.Long.bitCount(sigs(0) ^ sigs(3))
    assert(d02 < d03)
    val pairs = Dedup.simhashNearDupPairs(corpus, "doc_id", "text", maxDist = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("ngramJaccardPairs matches planted similarity structure") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 1L)) == 1.0)
    assert(m.contains((0L, 2L)) && m((0L, 2L)) < 1.0)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("embedding near-dup: planted duplicate vector found, dedup drops it") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f, 0.2f)),
      (1L, Array(1.0f, 0.0f, 0.5f, 0.2f)),      // exact dup of 0
      (2L, Array(0.99f, 0.01f, 0.5f, 0.2f)),    // near dup of 0
      (3L, Array(-1.0f, 0.5f, -0.3f, 0.8f)))    // far away
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      bands = 4, planesPerBand = 4, threshold = 0.99, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._2 == 3L))
    val kept = Dedup.embeddingDedup(vecs, "vec_id", "embedding",
      bands = 4, planesPerBand = 4, threshold = 0.99, dim = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L) && !kept.contains(1L) && kept.contains(3L))
  }

  test("minhash and simhash agree on empty-document handling (keep one)") {
    val withEmpties = corpus.union(
      Seq((10L, ""), (11L, "   "), (12L, "")).toDF("doc_id", "text"))
    val mh = Dedup.minhashDedup(withEmpties, "doc_id", "text", threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    val sh = Dedup.simhashDedup(withEmpties, "doc_id", "text", maxDist = 3)
      .select("doc_id").as[Long].collect().toSet
    // both keep exactly the smallest-id empty doc
    assert(mh.contains(10L) && !mh.contains(11L) && !mh.contains(12L))
    assert(sh.contains(10L) && !sh.contains(11L) && !sh.contains(12L))
  }

  test("dedup idempotence on the documents table (property)") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val once = Dedup.exactKeepMinId(docs, "doc_id", "text")
    val twice = Dedup.exactKeepMinId(once, "doc_id", "text")
    assert(once.count() == twice.count())
  }

  test("decontamination removes exact and near reference matches, keeps the rest") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // reference = 5 docs verbatim + 1 lightly-edited near-copy of doc 10
    val near10 = docs.filter(col("doc_id") === 10)
      .withColumn("text", concat(col("text"), lit(" tiny suffix")))
      .withColumn("doc_id", lit(900000L))
    val reference = docs.filter(col("doc_id").isin(0, 1, 2, 3, 4)).union(near10)
    val clean = Dedup.minhashDecontaminate(docs, reference, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    // the 5 verbatim reference docs are gone (exact stage), the
    // near-copied doc 10 is gone (near stage)
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 10L))
      assert(!clean.contains(id), s"doc $id should have been decontaminated")
    // nothing unrelated was removed beyond the LSH candidates that verify
    val total = docs.count()
    assert(clean.size >= total - 10, s"over-removal: ${total - clean.size} dropped")
    // empty reference removes nothing
    val noop = Dedup.minhashDecontaminate(docs, docs.limit(0), "doc_id", "text")
    assert(noop.count() == total)
  }

  test("embedding decontamination drops semantic matches of the reference set") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // reference = 5 corpus vectors (ids shifted: decontamination must
    // match on CONTENT, not id; slightly nudged: near-match, not
    // verbatim) + one genuinely unrelated vector as the negative control
    import org.apache.spark.sql.functions.udf
    val nudge = udf((v: Seq[Float]) => v.map(x => x * 1.0001f)) // same direction
    val unrelated = Seq((999999L,
      Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val reference = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 500000L)
      .withColumn("embedding", nudge(col("embedding")))
      .unionByName(unrelated, allowMissingColumns = true)
    val clean = Dedup.embeddingDecontaminate(emb, reference, "vec_id", "embedding",
      threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    for (id <- 0L to 4L)
      assert(!clean.contains(id), s"vec $id should have been decontaminated")
    // bounded over-removal: only true cosine-0.99 matches go
    assert(clean.size >= emb.count() - 25)
    // empty reference removes nothing
    assert(Dedup.embeddingDecontaminate(emb, emb.limit(0), "vec_id", "embedding")
      .count() == emb.count())
  }

  test("ngramJaccardPairs: document-frequency cap bounds boilerplate buckets, exact below it") {
    // 30 docs of mutually-unrelated unique text, every one ending in the
    // same boilerplate phrase — the classic skew bomb: the shared trigram
    // alone would put all 30 docs in one inverted-index bucket (30² ≈ 900
    // candidate rows from a single shingle). Plus one planted true
    // near-dup pair (100, 101) whose shared shingles are all rare.
    val boiler = "all rights reserved worldwide"
    val uniques = (0 until 30).map(i =>
      (i.toLong, s"unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e $boiler"))
    val nearDup = Seq(
      (100L, "spark executes stages of tasks over partitioned data with lineage recovery"),
      (101L, "spark executes stages of tasks over partitioned data with checkpoint recovery"))
    val corpus2 = (uniques ++ nearDup).toDF("doc_id", "text")

    // tiny threshold so even a single shared shingle WOULD report a pair
    val uncapped = Dedup.ngramJaccardPairs(corpus2, "doc_id", "text",
      shingleN = 3, threshold = 0.01, maxDf = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(corpus2, "doc_id", "text",
      shingleN = 3, threshold = 0.01, maxDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // uncapped: the boilerplate shingle alone links every unique-doc pair
    assert(uncapped.size >= 30 * 29 / 2,
      s"expected the boilerplate bucket to link all pairs, got ${uncapped.size}")
    // capped: boilerplate (df=30 > 10) is dropped — only the true near-dup
    // pair (rare shingles, df=2) survives; the d² bucket never forms
    assert(capped == Set((100L, 101L)),
      s"capped pairs should be exactly the planted near-dup, got $capped")
    // exactness when the cap doesn't bite: same corpus, cap above every df
    val cap50 = Dedup.ngramJaccardPairs(corpus2, "doc_id", "text",
      shingleN = 3, threshold = 0.01, maxDf = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cap50 == uncapped)
  }

  test("chain semantics: A~B~C with A≁C drops both B and C; fixpoint is pass-stable") {
    // 20-token base; B changes 2 tokens vs A; C changes 2 MORE vs B.
    // Trigram Jaccard: J(A,B) ≈ J(B,C) ≈ 0.5, J(A,C) ≈ 0.26 — threshold
    // 0.4 makes the chain A~B~C with A≁C.
    val toksA = (0 until 20).map(i => s"w$i")
    val toksB = toksA.updated(5, "x5").updated(12, "x12")
    val toksC = toksB.updated(8, "y8").updated(16, "y16")
    val chain = Seq(
      (0L, toksA.mkString(" ")), (1L, toksB.mkString(" ")), (2L, toksC.mkString(" ")))
      .toDF("doc_id", "text")

    // verify the planted structure with the exact pair join
    val j = Dedup.ngramJaccardPairs(chain, "doc_id", "text", shingleN = 3, threshold = 0.0)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(j((0L, 1L)) >= 0.4 && j((1L, 2L)) >= 0.4 && j((0L, 2L)) < 0.4,
      s"planted chain structure broken: $j")

    // keep-smallest-id drops B (near A) AND C (near B — even though B is
    // itself dropped and A≁C): the drop decision reads the ORIGINAL
    // corpus. This is the documented non-transitive cluster semantics.
    val kept = Dedup.minhashDedup(chain, "doc_id", "text",
      numHashes = 64, bands = 32, threshold = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L), s"chain should collapse to {A}, got $kept")

    // the fixpoint wrapper converges (a second pass removes nothing) and
    // does NOT resurrect C
    val fix = Dedup.iterateToFixpoint(chain,
      d => Dedup.minhashDedup(d, "doc_id", "text", numHashes = 64, bands = 32, threshold = 0.4))
      .select("doc_id").as[Long].collect().toSet
    assert(fix == Set(0L))
  }

  test("small (lazy/window) and big (barrier/agg-join) paths produce identical results") {
    // every test input is under the adaptive-barrier threshold, so the
    // scale path (persist + localCheckpoint + agg-join group-min) would
    // otherwise never run in CI; force it and pin equivalence
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def survivors(dedup: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val smallPath = dedup(docs).select("doc_id").as[Long].collect().toSet
      val saved = Dedup.barrierThresholdBytes
      Dedup.barrierThresholdBytes = 0L // force the barrier path
      try {
        val bigPath = dedup(docs).select("doc_id").as[Long].collect().toSet
        (smallPath, bigPath)
      } finally Dedup.barrierThresholdBytes = saved
    }
    val (mhS, mhB) = survivors(d => Dedup.minhashDedup(d, "doc_id", "text", numHashes = 32, bands = 8))
    assert(mhS == mhB, s"minhash paths diverge: ${mhS.size} vs ${mhB.size}")
    val (shS, shB) = survivors(d => Dedup.simhashDedup(d, "doc_id", "text"))
    assert(shS == shB, s"simhash paths diverge: ${shS.size} vs ${shB.size}")
  }

  test("reliable-checkpoint barrier mode: identical survivors, checkpoint files written") {
    // the executor-churn-safe 100 TB form: the big path's eager barrier
    // goes through a reliable checkpoint directory instead of
    // localCheckpoint. Force the barrier path and pin result equivalence
    // across all three barrier variants (lazy small path, localCheckpoint,
    // reliable checkpoint).
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val lazySmall = ids(Dedup.minhashDedup(docs, "doc_id", "text", numHashes = 32, bands = 8))
    val saved = Dedup.barrierThresholdBytes
    Dedup.barrierThresholdBytes = 0L
    try {
      val local = ids(Dedup.minhashDedup(docs, "doc_id", "text", numHashes = 32, bands = 8))
      val reliable = ids(Dedup.minhashDedup(docs, "doc_id", "text", numHashes = 32, bands = 8,
        checkpointDir = Some(ckptDir)))
      val simLocal = ids(Dedup.simhashDedup(docs, "doc_id", "text"))
      val simReliable = ids(Dedup.simhashDedup(docs, "doc_id", "text",
        checkpointDir = Some(ckptDir)))
      assert(reliable == local && local == lazySmall,
        s"minhash barrier variants diverge: ${lazySmall.size}/${local.size}/${reliable.size}")
      assert(simReliable == simLocal,
        s"simhash barrier variants diverge: ${simLocal.size} vs ${simReliable.size}")
      // the reliable form actually wrote checkpoint data (rdd-N dirs)
      def walk(f: java.io.File): Iterator[java.io.File] =
        Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(walk)
      assert(walk(new java.io.File(ckptDir)).exists(_.getName.startsWith("rdd-")),
        s"no rdd-* checkpoint dirs under $ckptDir")
    } finally Dedup.barrierThresholdBytes = saved
  }

  test("replica recall is structural: N-fold replication dedups to the 1x survivor set") {
    // regression for the scale defect found by DedupScaleBench: single-
    // stage bucket-min simhash kept 60k of 150k docs at 30x replication
    // because 16-bit pigeonhole buckets mix distinct documents and the
    // one bucket-min candidate is often a foreign doc. The exact-collapse
    // first stage makes replica recall independent of bucket crowding.
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def replicate(n: Int) = (0 until n)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_))
    for ((name, dedup) <- Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
        "minhash" -> (d => Dedup.minhashDedup(d, "doc_id", "text", numHashes = 32, bands = 8)),
        "simhash" -> (d => Dedup.simhashDedup(d, "doc_id", "text")))) {
      val one = dedup(docs).select("doc_id").as[Long].collect().toSet
      val five = dedup(replicate(5)).select("doc_id").as[Long].collect().toSet
      assert(five == one, s"$name: ${five.size} survivors at 5x vs ${one.size} at 1x")
    }
  }

  test("banded-LSH embedding pairs ≡ exhaustive exact baseline on a planted corpus") {
    // the q72 construction in miniature: deterministic random vectors,
    // scale-jittered near-copies (cosine ≈ 0.99999), reversed decoys
    // (cosine ≪ threshold). Pins embeddingNearDupPairs' candidate
    // generation against embeddingNearDupPairsExact: at 8 bands × 8
    // planes the per-pair miss probability at this cosine is ~1e-16, and
    // the seeded hyperplanes make the outcome deterministic — any
    // divergence is a real recall regression, not flakiness.
    val rnd = new scala.util.Random(42)
    val origs = (0L until 120L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val jit = origs.filter(_._1 % 5 == 0).map { case (i, v) =>
      (i + 100000L, v.zipWithIndex.map { case (x, j) =>
        (x * (1.0 + 0.002 * (j % 7 - 3))).toFloat })
    }
    val dec = origs.filter(_._1 % 7 == 3).map { case (i, v) =>
      (i + 200000L, v.reverse)
    }
    val corpus = (origs ++ jit ++ dec).toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairSet(Dedup.embeddingNearDupPairsExact(
      corpus, "vec_id", "embedding", threshold = 0.95))
    val lsh = pairSet(Dedup.embeddingNearDupPairs(
      corpus, "vec_id", "embedding",
      bands = 8, planesPerBand = 8, threshold = 0.95, dim = 64))
    assert(exact == jit.map { case (jid, _) => (jid - 100000L, jid) }.toSet,
      "exact baseline must find exactly the planted near-copies")
    assert(lsh == exact, s"LSH recall gap: missing ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("repeatedSpans: cross-doc and within-doc duplicated windows, maximal islands") {
    // docs 1/2 share a 5-token prefix block and a 5-token suffix block
    // around a doc-unique middle token; doc 3 repeats its own 4-token
    // phrase; doc 4 is shorter than the gram window; doc 5 shares nothing.
    val df = Seq(
      (1L, "a b c d e X1 f g h i j"),
      (2L, "a b c d e X2 f g h i j"),
      (3L, "p q r s p q r s"),
      (4L, "x y"),
      (5L, "k l m n o q w"),
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(df, "doc_id", "text", gramN = 3, minCount = 2)
      .orderBy("doc_id", "span_start")
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Int, Int, Int)].collect().toSeq
    // docs 1/2: duplicated 3-gram starts at 0,1,2 (inside "a b c d e")
    // and 6,7,8 (inside "f g h i j") — two islands each, ends extended by
    // gramN-1; the X-crossing windows (3,4,5) are doc-unique and split
    // the islands. doc 3: "p q r" and "q r s" recur at starts 4,5 →
    // islands [0,1] and [4,5]. docs 4 (too short) and 5 (unique): none.
    assert(out == Seq(
      (1L, 0, 4, 5), (1L, 6, 10, 5),
      (2L, 0, 4, 5), (2L, 6, 10, 5),
      (3L, 0, 3, 4), (3L, 4, 7, 4)))
  }

  test("repeatedSpans: adjacent duplicated starts merge into one maximal span") {
    // every window of the shared sentence is duplicated → one island
    // covering the whole doc, not per-window fragments
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(df, "doc_id", "text", gramN = 3, minCount = 2)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(out == Set((1L, 0, 5, 6), (2L, 0, 5, 6)))
  }

  test("cutRepeatedSpans: removes exactly the spans, keeps novel text, empties full-cover docs") {
    // docs 1/2: two shared blocks around unique middles → cut both
    // blocks, keep the middle; docs 3/4: fully shared → clean_text
    // EMPTY; doc 5: nothing shared → not in the output at all.
    val df = Seq(
      (1L, "a b c d e X1 f g h i j"),
      (2L, "a b c d e X2 f g h i j"),
      (3L, "one two three four"),
      (4L, "one two three four"),
      (5L, "k l m n o q w"),
    ).toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(df, "doc_id", "text", gramN = 3, minCount = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "cut_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 11L, 10L, "X1"),
      (2L, 11L, 10L, "X2"),
      (3L, 4L, 4L, ""),
      (4L, 4L, 4L, "")))
  }

  test("cutRepeatedSpans: overlapping spans count distinct removed tokens, not span-length sums") {
    // doc 1's dup grams sit at positions 0 and 2 (position 1 is NOT
    // duplicated) → two islands whose gramN=3 spans [0,2] and [2,4]
    // OVERLAP at token 2. A span-length sum would claim 6 cut tokens
    // on a 5-token doc; the distinct-removed definition says 5.
    val df = Seq(
      (1L, "a b c d e"),          // grams: "a b c", "b c d", "c d e"
      (2L, "a b c z c d e"),      // shares "a b c" and "c d e", not "b c d"
    ).toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(df, "doc_id", "text", gramN = 3, minCount = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "cut_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 5L, ""),
      (2L, 7L, 6L, "z")))
  }

  // ------------------------------------- connected components / clusters

  private def ccMap(pairs: Seq[(Long, Long)],
      forceDistributed: Boolean = false): Map[Long, Long] = {
    val saved = Dedup.ccLocalMaxEdges
    if (forceDistributed) Dedup.ccLocalMaxEdges = -1L
    try Dedup.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .select("id", "component").as[(Long, Long)].collect().toMap
    finally Dedup.ccLocalMaxEdges = saved
  }

  test("connectedComponents: long path converges to the min label (distributed rounds)") {
    // a 40-node path is the adversarial diameter case — min-label
    // propagation needs 40 rounds; alternating star needs ~log
    val path = (0L until 39L).map(i => (i, i + 1))
    val cc = ccMap(path, forceDistributed = true)
    assert(cc.keySet == (0L to 39L).toSet)
    assert(cc.values.forall(_ == 0L))
  }

  test("connectedComponents: cycles, duplicate/reversed edges, self-loops, multiple components — both paths") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),      // cycle
      (3L, 2L), (2L, 3L),                // reversed + duplicate
      (7L, 7L),                          // self-loop only → node absent
      (10L, 11L), (12L, 11L))            // second component
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    assert(ccMap(edges) == expected, "driver union-find path")
    assert(ccMap(edges, forceDistributed = true) == expected, "star-rounds path")
  }

  test("connectedComponents: randomized differential vs independent union-find, both paths agree") {
    val rnd = new scala.util.Random(42)
    val n = 300
    val edges = Seq.fill(260)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // independent ground truth (array-indexed, rank-free, recursive)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    val roots = (0 until n).map(find)
    val minOfRoot = (0 until n).groupBy(roots).map { case (r, ids) => r -> ids.min.toLong }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val expected = touched.map(i => i -> minOfRoot(roots(i.toInt))).toMap
    assert(ccMap(edges) == expected, "driver union-find path")
    assert(ccMap(edges, forceDistributed = true) == expected, "star-rounds path")
  }

  test("clusterDedup: chain keeps ONE representative; fixpoint policy keeps an independent set") {
    // A~B~C chain (A≁C): cluster dedup keeps {A} — one survivor per
    // fuzzy cluster; iterateToFixpoint of "drop rows with a smaller
    // SURVIVING neighbor" keeps {A, C} — the documented policy contrast
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "solo")).toDF("id", "payload")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val clustered = Dedup.clusterDedup(rows, pairs, "id")
      .select("id").as[Long].collect().toSet
    assert(clustered == Set(1L, 9L))
    // fixpoint contrast: each round keeps the ORIGINAL rows minus those
    // with a smaller neighbor in the CURRENT survivor estimate — the
    // op converges to "x survives iff every smaller neighbor is dropped"
    // (greedy MIS by id): C returns once B is out
    val sym = pairs.union(pairs.select(col("id_b"), col("id_a")))
      .toDF("v", "nb").filter(col("nb") < col("v"))
    val drop = (cur: org.apache.spark.sql.DataFrame) => {
      val losers = cur.select(col("id").as("nb"))
        .join(sym, "nb").select("v").distinct()
      rows.join(losers, rows("id") === col("v"), "left_anti")
    }
    val fixpoint = Dedup.iterateToFixpoint(rows, drop)
      .select("id").as[Long].collect().toSet
    assert(fixpoint == Set(1L, 3L, 9L))
  }

  test("clusterDedup: precedence picks the best-quality member, id breaks ties") {
    val rows = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9),   // cluster {1,2,3}: best quality 0.9, tie → id 2
      (8L, 0.5), (9L, 0.7),              // cluster {8,9}: keep 9
      (20L, 0.1))                        // singleton survives regardless
      .toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val kept = Dedup.clusterDedup(rows, pairs, "id",
      precedence = Some(-col("quality")))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 9L, 20L))
  }

  test("connectedComponents: reliable-checkpoint rounds produce identical components") {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val edges = (0L until 25L).map(i => (i, i + 1)) ++ Seq((40L, 41L))
    val local = ccMap(edges)
    val saved = Dedup.ccLocalMaxEdges
    Dedup.ccLocalMaxEdges = -1L // force the distributed rounds
    val reliable =
      try Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b", checkpointDir = Some(ckptDir))
        .select("id", "component").as[(Long, Long)].collect().toMap
      finally Dedup.ccLocalMaxEdges = saved
    assert(reliable == local)
    def walk(f: java.io.File): Iterator[java.io.File] =
      Iterator(f) ++ Option(f.listFiles()).iterator.flatten.flatMap(walk)
    assert(walk(new java.io.File(ckptDir)).exists(_.getName.startsWith("rdd-")),
      s"no rdd-* checkpoint dirs under $ckptDir")
  }

  test("incrementalExactDedup: snapshot rejection, within-batch collapse, bloom-invisible") {
    import spark.implicits._
    val existing = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha"),   // in snapshot → rejected
      (11L, "delta"),   // fresh, unique → survives
      (12L, "epsilon"), // fresh dup, min id → survives
      (13L, "epsilon"), // fresh dup, loses to 12 → rejected
      (14L, "beta")     // in snapshot → rejected
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedup(existing, incoming, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 12L))
    // big-path parity: force the Bloom-prefiltered shape on the same data
    val saved = Dedup.barrierThresholdBytes
    val viaBloom =
      try {
        Dedup.barrierThresholdBytes = 0L
        Dedup.incrementalExactDedup(existing, incoming, "doc_id", "text")
          .select("doc_id").as[Long].collect().toSet
      } finally Dedup.barrierThresholdBytes = saved
    assert(viaBloom == out)
    // equals the naive anti-join + keep-min-id (bloom invisible)
    val naive = Dedup.exactKeepMinId(
      incoming.join(existing.select(col("text")), Seq("text"), "left_anti"),
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(out == naive)
    // empty incoming and empty existing edges
    assert(Dedup.incrementalExactDedup(existing, incoming.limit(0), "doc_id", "text")
      .count() == 0)
    assert(Dedup.incrementalExactDedup(existing.limit(0), incoming, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet == Set(10L, 11L, 12L, 14L))
  }

  test("segmentDedup: cross-doc first occurrence wins, docs reassemble in order") {
    val df = Seq(
      (0L, "a b c d e f"),      // segs "a b c" | "d e f"
      (1L, "a b c x y z"),      // "a b c" duplicates doc 0 seg 0 → dropped
      (2L, "p q r p q r"),      // within-doc dup: second "p q r" dropped
      (3L, ""),                 // tokenless → 0 segs, "" out
      (4L, "d e f g")           // "d e f" dup; short tail "g" survives
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((0L, 2L, 2L, "a b c d e f")))
    assert(out(1) == ((1L, 2L, 1L, "x y z")))
    assert(out(2) == ((2L, 2L, 1L, "p q r")))
    assert(out(3) == ((3L, 0L, 0L, "")))
    assert(out(4) == ((4L, 2L, 1L, "g")))
  }

  test("segmentDedup: duplicate-free corpus passes through verbatim") {
    val df = Seq((0L, "one two three four five"), (1L, "six seven"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segTokens = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("one two three four five", "six seven"))
    assert(out.map(r => r.getLong(1) -> r.getLong(2)).forall(p => p._1 == p._2))
  }
}
