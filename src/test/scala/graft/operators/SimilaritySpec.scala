package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical → 1, orthogonal → 0, opposite → -1, zero-safe") {
    val r = Seq(1).toDF("d").select(
      Similarity.cosine(array(lit(1.0f), lit(0.0f)), array(lit(1.0f), lit(0.0f))).as("same"),
      Similarity.cosine(array(lit(1.0f), lit(0.0f)), array(lit(0.0f), lit(1.0f))).as("orth"),
      Similarity.cosine(array(lit(1.0f), lit(0.0f)), array(lit(-1.0f), lit(0.0f))).as("opp"),
      Similarity.cosine(array(lit(0.0f), lit(0.0f)), array(lit(1.0f), lit(1.0f))).as("zero")).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
    assert(r.getDouble(3) == 0.0)
  }

  test("bruteForceTopK: nearest neighbor structure on hand-built vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // nearest to 0
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].head()
    assert(top1 == 1L)
  }

  test("lshTopK achieves high recall vs brute force on real embeddings") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      bands = 8, planesPerBand = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("ivfTopK: full-probe equals brute force; partial probes keep useful recall") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    // probing every cell degenerates to exhaustive search — must be
    // rank-identical to brute force
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbes = 8)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == exact)
    // partial probes: recall bounded below (4 of 8 cells)
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map { case (q, n, _) => (q, n) }
    val recall = exactPairs.intersect(approx).size.toDouble / exactPairs.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
  }

  test("ivfTopK partial-probe recall bound at corpus scale (pinned quality number)") {
    // the q41 oracle cross-checks only FULL-probe IVF (≡ exhaustive); this
    // pins the measured quality of the approximate path users actually
    // deploy: top-5 recall vs brute force on the sf0.01 embeddings
    // (~3000 vectors), 50 queries, probing half / a quarter of the cells.
    // Measured on the driver-generated corpus: ~0.74 at 8/16 probes,
    // ~0.46 at 4/16 — the asserted floors leave headroom for corpus
    // regeneration but hold the documented quality level. (This corpus is
    // near-uniform on the sphere — the IVF worst case; clustered real
    // embeddings probe better.)
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallAt(probes: Int): Double = {
      val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nCells = 16, nProbes = probes)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val r8 = recallAt(8)
    val r4 = recallAt(4)
    assert(r8 >= 0.65, s"IVF recall at 8/16 probes: $r8")
    assert(r4 >= 0.4, s"IVF recall at 4/16 probes: $r4")
    // more probes must not hurt (candidate sets are nested)
    assert(r8 >= r4, s"recall not monotone in probes: $r4 -> $r8")
    info(f"IVF top-5 recall sf0.01: 8/16 probes $r8%.3f, 4/16 probes $r4%.3f")
  }

  test("int8 quantization: bounded error, zero-safe, top-k mostly preserved") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val deq = emb.select(col("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("d"),
      col("embedding"))
    // element-wise error ≤ scale/2 = max|x|/254
    val maxRelErr = deq.select(
      aggregate(
        zip_with(col("embedding"), col("d"), (x, y) => abs(x.cast("double") - y)),
        lit(0.0), (a, x) => greatest(a, x)).as("err"),
      aggregate(col("embedding"), lit(0.0),
        (a, x) => greatest(a, abs(x.cast("double")))).as("mx"))
      .select(max(col("err") / col("mx"))).as[Double].head()
    assert(maxRelErr <= 1.0 / 254 + 1e-9, s"max relative error $maxRelErr")
    // zero vector round-trips to zero
    val z = Seq((0L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))))
      .as[Seq[Double]].head()
    assert(z == Seq(0.0, 0.0))
    // non-finite elements (NaN, ±Inf) are isolated (quantize to 0)
    // without corrupting the rest of the vector
    for (bad <- Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)) {
      val v = Seq((0L, Array(1.0f, bad, 2.0f))).toDF("vec_id", "embedding")
        .select(Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))))
        .as[Seq[Double]].head()
      assert(v(1) == 0.0, s"$bad -> $v")
      assert(math.abs(v(0) - 1.0) < 0.01 && math.abs(v(2) - 2.0) < 0.01,
        s"$bad -> $v")
    }
    // quantized brute-force top-5 keeps high overlap with full precision
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val dq = deq.select(col("vec_id"), col("d").as("embedding"))
    val approx = Similarity.bruteForceTopK(dq, dq.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val overlap = exact.intersect(approx).size.toDouble / exact.size
    assert(overlap >= 0.8, s"quantized top-k overlap too low: $overlap")
  }

  test("ivfAssign produces stable cells and groups similar vectors") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val assigned = Similarity.ivfAssign(emb, "embedding", nCells = 8)
    val cells = assigned.select("ivf_cell").distinct().as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 8))
    // deterministic: same input → same assignment
    val again = Similarity.ivfAssign(emb, "embedding", nCells = 8)
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toSet
    assert(assigned.select("vec_id", "ivf_cell").as[(Long, Int)].collect().toSet == again)
  }

  test("native band_sigs matches the composable bandSignature bit-for-bit") {
    graft.functions.BandSignatures.register(spark)
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bands = 8; val ppb = 8; val dim = 64
    val composable = emb.select(
      col("vec_id"),
      array((0 until bands).map(b =>
        Similarity.bandSignature(col("embedding"), b, ppb, dim)): _*).as("s"))
    val native = emb.select(
      col("vec_id"),
      graft.functions.BandSignatures.bandSigs(col("embedding"), bands, ppb, dim).as("s"))
    val c = composable.as[(Long, Seq[Long])].collect().toMap
    val n = native.as[(Long, Seq[Long])].collect().toMap
    assert(c.keySet == n.keySet)
    val mismatches = c.keys.filter(k => c(k) != n(k))
    assert(mismatches.isEmpty, s"signature drift for ids: ${mismatches.take(5)}")
  }

  test("band_sigs edge cases: short/long/null-element vectors match the HOF form") {
    graft.functions.BandSignatures.register(spark)
    val dim = 8; val bands = 2; val ppb = 4
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f)),                       // shorter than dim
      (2L, Array.tabulate(12)(i => i - 6.0f)),        // longer than dim
      (3L, Array.fill(8)(0.0f)),                      // all zero
      (4L, Array(0.5f))).toDF("id", "v")
    val withNull = vecs.select(col("id"),
      when(col("id") === 4, array(lit(null).cast("float"), lit(1.0f)))
        .otherwise(col("v")).as("v"))
    val composable = withNull.select(col("id"),
      array((0 until bands).map(b =>
        Similarity.bandSignature(col("v"), b, ppb, dim)): _*).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = withNull.select(col("id"),
      graft.functions.BandSignatures.bandSigs(col("v"), bands, ppb, dim).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(composable == native, s"$composable vs $native")
  }

  test("native expressions: interpreted (no-codegen) path agrees with codegen") {
    graft.functions.BandSignatures.register(spark)
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.LanguageId.register(spark)
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    def run(): (Map[Long, Seq[Long]], Map[Long, Double], Map[Long, String]) = {
      val sigs = emb.select(col("vec_id"),
        graft.functions.BandSignatures.bandSigs(col("embedding"), 8, 8, 64).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      val cos = emb.select(col("vec_id"),
        graft.functions.CosineSimilarity.cosineSim(col("embedding"), col("embedding")).as("c"))
        .as[(Long, Double)].collect().toMap
      val langs = docs.select(col("doc_id"),
        graft.functions.LanguageId.langId(TextAnalysis.tokens(col("text"))).as("l"))
        .as[(Long, String)].collect().toMap
      (sigs, cos, langs)
    }
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key)
    val (gs, gc, gl) = run()
    try {
      spark.conf.set(key, "NO_CODEGEN")
      val (is, ic, il) = run()
      assert(gs == is)
      assert(gc == ic)
      assert(gl == il)
    } finally spark.conf.set(key, prev)
  }

  test("hyperplane signature: identical vectors get identical signatures") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-5.0f, 1.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val sigs = vecs.select(Similarity.hyperplaneSignature(col("embedding"), 16).as("s"))
      .as[Long].collect()
    assert(sigs(0) == sigs(1))
  }

  // deterministic clustered corpus: 6 unit-ish center directions in 16-d,
  // 40 points each with small gaussian jitter — the regime IVF training
  // exists for (hash-direction cells split real clusters; trained cells
  // wrap them)
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val dim = 16; val kC = 6; val perC = 40
    val centers = Array.fill(kC) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val rows = for { c <- 0 until kC; i <- 0 until perC } yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.12).toFloat)
      ((c * perC + i).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("trainCentroids: deterministic, layout-independent, NaN-free") {
    val c1 = Similarity.trainCentroids(clustered, "vec_id", "embedding",
      nCells = 6, iters = 4)
    val c2 = Similarity.trainCentroids(clustered.repartition(13), "vec_id",
      "embedding", nCells = 6, iters = 4)
    assert(c1.length == 6 && c1.forall(_.length == 16))
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.flatten.forall(x => !x.isNaN && !x.isInfinite))
    // unit-normalized (spherical k-means invariant)
    c1.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    // over-provisioned cells (nCells > true clusters): training must not
    // NaN-poison empties — they keep their previous centroid
    val c3 = Similarity.trainCentroids(clustered, "vec_id", "embedding",
      nCells = 12, iters = 3)
    assert(c3.flatten.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("trained IVF: full-probe equals brute force; cells align to clusters") {
    val queries = clustered.filter(col("vec_id") % 40 < 3) // 3 per cluster
    val cents = Similarity.trainCentroids(clustered, "vec_id", "embedding",
      nCells = 6, iters = 4)
    val exact = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    // full probe degenerates to exhaustive search regardless of training
    val full = Similarity.ivfTopKTrained(clustered, queries, "vec_id", "embedding", 5,
      cents, nProbes = 6)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == exact)

    // trained cells wrap the planted clusters: every cluster maps to ONE
    // dominant cell, and cells are balanced (~40 rows each)
    val cellOf = Similarity.ivfAssignTrained(clustered, "embedding", cents)
      .select((col("vec_id") / 40).cast("int").as("cluster"), col("ivf_cell"))
      .as[(Int, Int)].collect()
    val purity = cellOf.groupBy(_._1).map { case (_, rows) =>
      rows.groupBy(_._2).values.map(_.size).max.toDouble / rows.size
    }
    assert(purity.forall(_ >= 0.95), s"cluster→cell purity: ${purity.toSeq.sorted}")
    val cellSizes = cellOf.groupBy(_._2).values.map(_.size)
    assert(cellSizes.max <= 2 * 40, s"trained cells unbalanced: $cellSizes")

    // the payoff: single-probe recall on clustered data — trained cells
    // find in-cluster neighbors hash directions scatter
    def recall(res: org.apache.spark.sql.DataFrame): Double = {
      val pairs = res.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val exactPairs = exact.map { case (q, n, _) => (q, n) }
      exactPairs.intersect(pairs).size.toDouble / exactPairs.size
    }
    val trained1 = recall(Similarity.ivfTopKTrained(clustered, queries,
      "vec_id", "embedding", 5, cents, nProbes = 1))
    val hash1 = recall(Similarity.ivfTopK(clustered, queries,
      "vec_id", "embedding", 5, nCells = 6, nProbes = 1, dim = 16))
    assert(trained1 >= 0.9, s"trained single-probe recall: $trained1")
    assert(trained1 >= hash1,
      s"training should not lose to hash cells: $trained1 < $hash1")
    info(f"single-probe recall on clustered corpus: trained $trained1%.3f vs hash $hash1%.3f")
  }

  test("trainCentroids on a hash sample still clusters the full corpus") {
    // train on ~half the rows; assignment quality on the FULL corpus holds
    val cents = Similarity.trainCentroids(clustered, "vec_id", "embedding",
      nCells = 6, iters = 4, sampleFraction = 0.5)
    val purity = Similarity.ivfAssignTrained(clustered, "embedding", cents)
      .select((col("vec_id") / 40).cast("int").as("cluster"), col("ivf_cell"))
      .as[(Int, Int)].collect()
      .groupBy(_._1).map { case (_, rows) =>
        rows.groupBy(_._2).values.map(_.size).max.toDouble / rows.size
      }
    assert(purity.forall(_ >= 0.9), s"sampled-training purity: ${purity.toSeq.sorted}")
  }

  test("centroid save/load round-trip: bit-identical index, torn grids rejected") {
    val cents = Similarity.trainCentroids(clustered, "vec_id", "embedding",
      nCells = 4, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft-centroids").resolve("ivf").toString
    Similarity.saveCentroids(spark, cents, path)
    val back = Similarity.loadCentroids(spark, path)
    assert(back.length == cents.length)
    cents.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
    // assignments through the loaded index are identical
    val a1 = Similarity.ivfAssignTrained(clustered, "embedding", cents)
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toMap
    val a2 = Similarity.ivfAssignTrained(clustered, "embedding", back)
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
    // a sparse (torn) grid fails loudly
    val torn = java.nio.file.Files
      .createTempDirectory("graft-centroids-torn").resolve("ivf").toString
    spark.createDataFrame(Seq((0, 0, 1.0), (1, 3, 2.0)))
      .toDF("cell", "dim", "value").write.parquet(torn)
    intercept[IllegalArgumentException] {
      Similarity.loadCentroids(spark, torn)
    }
  }

  // ----------------------------------------- product quantization (PQ)

  test("trainPqCodebooks: deterministic, layout-independent, dense grid") {
    val c1 = Similarity.trainPqCodebooks(clustered, "vec_id", "embedding",
      m = 4, ksub = 8, dim = 16, iters = 3)
    val c2 = Similarity.trainPqCodebooks(clustered.repartition(13), "vec_id",
      "embedding", m = 4, ksub = 8, dim = 16, iters = 3)
    assert(c1.length == 4 && c1.forall(_.length == 8) &&
      c1.forall(_.forall(_.length == 4)))
    assert(c1.map(_.map(_.toSeq).toSeq).toSeq == c2.map(_.map(_.toSeq).toSeq).toSeq)
    assert(c1.flatten.flatten.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("pqEncode: codes in range, deterministic, ~30x smaller than vectors") {
    val cb = Similarity.trainPqCodebooks(clustered, "vec_id", "embedding",
      m = 4, ksub = 8, dim = 16, iters = 3)
    val codes = Similarity.pqEncode(clustered, "embedding", cb)
      .select(col("vec_id"), col("pq_code")).as[(Long, Seq[Int])].collect()
    assert(codes.length == 240)
    assert(codes.forall(_._2.length == 4))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 8)))
    // same-cluster rows concentrate per SUBSPACE (the whole-code-vector
    // share is roughly the product of the m per-subspace shares, so the
    // per-subspace modal share is the right concentration metric)
    val byCluster = codes.groupBy(_._1 / 40)
    val subShares = for {
      rows <- byCluster.values.toSeq
      j <- 0 until 4
    } yield rows.groupBy(_._2(j)).values.map(_.size).max.toDouble / rows.size
    val mean = subShares.sum / subShares.size
    assert(mean >= 0.55,
      f"mean per-subspace modal share within clusters: $mean%.3f")
  }

  test("pqTopK: full probes + full rerank equals brute force exactly") {
    val queries = clustered.filter(col("vec_id") % 40 < 3)
    val coarse = Similarity.trainCentroids(clustered, "vec_id", "embedding",
      nCells = 6, iters = 4)
    val cb = Similarity.trainPqCodebooks(clustered, "vec_id", "embedding",
      m = 4, ksub = 8, dim = 16, iters = 3)
    val exact = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val pq = Similarity.pqTopK(clustered, queries, "vec_id", "embedding", 5,
        cb, coarse, nProbes = 6, rerank = 1 << 20)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pq == exact)
  }

  test("pqTopK: pruned probes + shallow ADC rerank keep recall (pinned)") {
    val queries = clustered.filter(col("vec_id") % 40 < 3)
    val coarse = Similarity.trainCentroids(clustered, "vec_id", "embedding",
      nCells = 6, iters = 4)
    val cb = Similarity.trainPqCodebooks(clustered, "vec_id", "embedding",
      m = 4, ksub = 8, dim = 16, iters = 3)
    val exactPairs = Similarity.bruteForceTopK(clustered, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // rerank = 40 ≈ one cluster's candidate count: the ADC cut must keep
    // the true top-5 inside the best 8·k of ~80 probed candidates
    val pruned = Similarity.pqTopK(clustered, queries, "vec_id", "embedding", 5,
        cb, coarse, nProbes = 2, rerank = 40)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exactPairs.intersect(pruned).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"IVF-PQ recall at nProbes=2/rerank=40: $recall")
    info(f"IVF-PQ pruned recall: $recall%.3f")
  }

  test("savePqCodebooks/loadPqCodebooks round-trip; torn grid rejected") {
    val cb = Similarity.trainPqCodebooks(clustered, "vec_id", "embedding",
      m = 4, ksub = 8, dim = 16, iters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq").resolve("cb").toString
    Similarity.savePqCodebooks(spark, cb, path)
    val back = Similarity.loadPqCodebooks(spark, path)
    assert(back.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq)
    val torn = java.nio.file.Files
      .createTempDirectory("graft-pq-torn").resolve("cb").toString
    spark.createDataFrame(Seq((0, 0, 0, 1.0), (1, 2, 3, 2.0)))
      .toDF("subspace", "cell", "dim", "value").write.parquet(torn)
    intercept[IllegalArgumentException] {
      Similarity.loadPqCodebooks(spark, torn)
    }
  }

  test("int8QuantStats: error bounded by scale/2, cosine near 1, zero-vec passthrough") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 20L).map(i =>
      (i, Array.fill(32)((rnd.nextFloat() - 0.5f) * 4f))) :+
      (20L, Array.fill(32)(0f))
    val out = Similarity.int8QuantStats(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", prefixDims = 8)
      .orderBy("vec_id").collect()
    out.dropRight(1).foreach { r =>
      val (scale, err, cos, head) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(err <= scale / 2 + 1e-9, s"vec ${r.getLong(0)}: err $err > s/2")
      assert(cos > 0.999, s"vec ${r.getLong(0)}: cos $cos")
      assert(head >= 0.0 && head <= 1.0)
    }
    // all-zero vector: scale 0, error 0, cosine/head 1 by convention
    val z = out.last
    assert(z.getDouble(1) == 0.0 && z.getDouble(2) == 0.0 &&
      z.getDouble(3) == 0.0 && z.getDouble(4) == 1.0 && z.getDouble(5) == 1.0)
  }

  test("int8QuantStats: a vector already on the int8 grid reconstructs exactly") {
    import spark.implicits._
    // values k·(127/127)·s with s = 1: max|x| = 127 → scale 1, codes = values
    val v = Seq((0L, Array(127f, -127f, 3f, 0f, 64f))).toDF("vec_id", "embedding")
    val r = Similarity.int8QuantStats(v, "vec_id", "embedding", prefixDims = 2)
      .collect().head
    assert(r.getDouble(2) == 1.0)   // scale
    assert(r.getDouble(3) == 0.0)   // max_err: exact grid
    assert(r.getDouble(4) == 1.0)   // cosine
  }
}
