package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level floor profiles for the three r15 100×-pairing reds
  * (q85 2.1×, q100 14×, q127 10× vs DuckDB) — the q11 protocol's
  * decomposition step: time each pipeline stage in isolation, warm,
  * so the wall can be attributed before any rewrite is attempted.
  *
  * Usage: runMain graft.tools.R15HeaviesProfile <sfDir> <q85|q100|q127>
  */
object R15HeaviesProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = args(1)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "off") == "on")
      .config("spark.sql.autoBroadcastJoinThreshold", (256 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Any): Unit = {
      // warm once, then best of 2 timed
      f
      val times = (1 to 2).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }
      println(f"[profile] $label%-32s ${times.min}%.2f s (all ${times.map(x => f"$x%.2f").mkString(",")})")
    }

    which match {
      case "q127" =>
        val orders = graft.core.Tables.load(spark, dir, "orders")
        val base = orders.select(col("o_orderpriority"),
          col("o_totalprice").cast("double").as("_mo_x"))
        t("scan+count")(base.count())
        val cached = base.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("cache materialize")(cached.count())
        t("bounds (uniformBounds)")(graft.operators.Relational
          .uniformBounds(cached, "o_orderpriority", "_mo_x").collect())
        val bounds = graft.operators.Relational
          .uniformBounds(cached, "o_orderpriority", "_mo_x")
        t("median pass (cached)")(graft.operators.Relational
          .percentileContExact(cached, "o_orderpriority", "_mo_x",
            Seq("_mo_med" -> 0.5), bounds = Some(bounds)).collect())
        t("FULL q127 face")(graft.queries.AnalyticsQueries
          .q127MadOutliers(spark, dir).collect())
      case "q127b" =>
        // replicate rankTargetedSelect's internal passes one by one
        val orders = graft.core.Tables.load(spark, dir, "orders")
        val base = orders.select(col("o_orderpriority"),
          col("o_totalprice").cast("double").as("_pc_v")).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        base.count()
        val bnds = graft.operators.Relational
          .uniformBounds(base, "o_orderpriority", "_pc_v")
        val withB = base.join(broadcast(bnds), Seq("o_orderpriority"), "left")
          .withColumn("_pc_b", when(col("_pc_bnds").isNull, lit(0))
            .otherwise(graft.functions.UpperBoundCount.upperBoundCount(
              col("_pc_bnds"), col("_pc_v"))))
          .drop("_pc_bnds")
        t("bucketize pass (sum _pc_b)")(
          withB.agg(sum(col("_pc_b"))).collect())
        t("cnts: groupBy(key,bucket)")(
          withB.groupBy(col("o_orderpriority"), col("_pc_b"))
            .agg(count(lit(1))).collect())
        val W = org.apache.spark.sql.expressions.Window
        val wOff = W.partitionBy(col("o_orderpriority")).orderBy(col("_pc_b"))
        val cnts = withB.groupBy(col("o_orderpriority"), col("_pc_b"))
          .agg(count(lit(1)).as("_pc_c"))
          .select(col("o_orderpriority"), col("_pc_b"), col("_pc_c"),
            coalesce(sum(col("_pc_c")).over(
              wOff.rowsBetween(W.unboundedPreceding, -1)), lit(0L)).as("_pc_off"),
            sum(col("_pc_c")).over(
              wOff.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
              .as("_pc_n"))
        val n = col("_pc_n"); val off = col("_pc_off")
        val kLo = floor(lit(0.5) * (n - 1).cast("double")).cast("long") + 1
        val kHi = least(kLo + 1, n)
        val kept = cnts.filter((kLo > off && kLo <= off + col("_pc_c")) ||
          (kHi > off && kHi <= off + col("_pc_c"))).drop("_pc_c")
        t("kept filter (collect)")(kept.collect())
        val w2 = W.partitionBy(col("o_orderpriority"), col("_pc_b"))
          .orderBy(col("_pc_v"))
        t("hits pass (join+window+filter)")(
          withB.join(broadcast(kept), Seq("o_orderpriority", "_pc_b"))
            .withColumn("_pc_rn", off + row_number().over(w2))
            .filter(col("_pc_rn") === kLo || col("_pc_rn") === kHi)
            .collect())
      case "q100" =>
        val e = graft.core.Tables.load(spark, dir, "embeddings")
        val coarse = graft.operators.Similarity.trainCentroids(
          e, "vec_id", "embedding", nCells = 8, iters = 1)
        val cb = graft.operators.Similarity.trainPqCodebooks(
          e, "vec_id", "embedding", m = 8, ksub = 16, dim = 64, iters = 1)
        t("corpus scan")(e.filter(col("embedding").isNotNull).count())
        t("ivfAssign only")(graft.operators.Similarity
          .ivfAssignTrained(e.filter(col("embedding").isNotNull),
            "embedding", coarse).count())
        t("pqEncode (index build)")(graft.operators.Similarity.pqEncode(
          graft.operators.Similarity.ivfAssignTrained(
            e.filter(col("embedding").isNotNull), "embedding", coarse),
          "embedding", cb, "_codes").count())
        val q = e.filter(col("vec_id").between(200, 204))
        t("pqTopK rerank=16 (prod)")(graft.operators.Similarity.pqTopK(
          e, q, "vec_id", "embedding", k = 10, cb, coarse,
          nProbes = 8, rerank = 16).collect())
        t("pqTopK exhaustive (face)")(graft.operators.Similarity.pqTopK(
          e, q, "vec_id", "embedding", k = 10, cb, coarse,
          nProbes = 8, rerank = 1 << 20).collect())
        t("brute q28-style")(graft.queries.PipelineQueries
          .q28KnnBrute(spark, dir).collect())
      case "q100c" =>
        // inline pqTopK's stages (visibility widened r15) to find the
        // 17 s: join width? ADC expression? window sort? final rerank?
        import graft.operators.Similarity
        val e = graft.core.Tables.load(spark, dir, "embeddings")
        val coarse = Similarity.trainCentroids(e, "vec_id", "embedding",
          nCells = 8, iters = 1)
        val cb = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
          m = 8, ksub = 16, dim = 64, iters = 1)
        val m = 8; val dsub = 8
        val full = e.filter(col("embedding").isNotNull)
          .select(col("vec_id").as("_cid"), col("embedding").as("_cv"))
        val compressed = Similarity.pqEncode(
            Similarity.ivfAssignTrained(e.filter(col("embedding").isNotNull),
              "embedding", coarse), "embedding", cb, "_codes")
          .select(col("vec_id").as("_cid"), col("ivf_cell").as("_cell"),
            col("_codes"))
        val lut = graft.operators.TextAnalysis.bindOnce(
          Similarity.unitNorm(col("embedding")), qn =>
            array((0 until m).map { j =>
              transform(typedlit(cb(j).map(_.toSeq).toSeq),
                c => Similarity.subDist(qn, j * dsub, c, dsub))
            }: _*))
        val q = e.filter(col("vec_id").between(200, 204))
          .filter(col("embedding").isNotNull)
          .select(col("vec_id").as("_qid"), col("embedding").as("_qv"),
            lut.as("_lut"),
            Similarity.trainedCellScores(col("embedding"), coarse).as("_scored"))
          .select(col("_qid"), col("_qv"), col("_lut"),
            explode(transform(
              slice(reverse(array_sort(col("_scored"))), 1, 8),
              s => s.getField("cell"))).as("_cell"))
        t("q frame (collect)")(q.collect())
        val qc = q.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        qc.count()
        val adc = (0 until m).map(j =>
          element_at(element_at(col("_lut"), j + 1),
            element_at(col("_codes"), j + 1) + 1)).reduce(_ + _)
        val joined = qc.join(compressed, Seq("_cell"))
          .filter(col("_qid") =!= col("_cid"))
        t("join only (count)")(joined.count())
        t("join carry _qv elem (sum)")(joined.select(col("_qid"), col("_cid"),
          element_at(col("_qv"), 1).as("_e")).agg(sum(col("_e"))).collect())
        t("join carry lut elem (sum)")(joined.select(col("_qid"), col("_cid"),
          element_at(element_at(col("_lut"), 1), 1).as("_e"))
          .agg(sum(col("_e"))).collect())
        t("join + codes-only expr (sum)")(joined.select(col("_qid"), col("_cid"),
          (0 until m).map(j => element_at(col("_codes"), j + 1).cast("double"))
            .reduce(_ + _).as("_e")).agg(sum(col("_e"))).collect())
        t("join + adc (sum)")(joined.select(col("_qid"), col("_cid"),
          adc.as("_adc")).agg(sum(col("_adc"))).collect())
        val W = org.apache.spark.sql.expressions.Window
        val wAdc = W.partitionBy(col("_qid"))
          .orderBy(col("_adc").asc, col("_cid").asc)
        val cand = joined.select(col("_qid"), col("_cid"), adc.as("_adc"))
          .withColumn("_ar", row_number().over(wAdc))
          .filter(col("_ar") <= (1 << 20))
          .select(col("_qid"), col("_cid"))
        t("+ adc window (count)")(cand.count())
        val qv = e.filter(col("vec_id").between(200, 204))
          .select(col("vec_id").as("_qid"), col("embedding").as("_qv"))
        val wk = W.partitionBy(col("_qid"))
          .orderBy(col("cosine").desc, col("_cid").asc)
        t("+ rerank join+cosine+topk")(
          cand.join(full, Seq("_cid")).join(broadcast(qv), Seq("_qid"))
            .select(col("_qid"), col("_cid"),
              Similarity.fastCosine(spark, col("_qv"), col("_cv")).as("cosine"))
            .withColumn("rank", row_number().over(wk))
            .filter(col("rank") <= 10).collect())
      case "q85" =>
        // mirrors the r15 hash-gram pipeline of ngramContamination,
        // cumulative stages
        val d = graft.core.Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        val train = d.filter(col("doc_id") % 10 =!= 0)
        val eval_ = d.filter(col("doc_id") % 10 === 0)
        val n = 13
        val toks = graft.operators.TextAnalysis.tokens(col("text"))
        def gramHashes(tc: org.apache.spark.sql.Column) =
          graft.operators.TextAnalysis.bindOnce(
            transform(tc, tok => xxhash64(tok)), th =>
              transform(sequence(lit(0), size(tc) - n), i =>
                graft.operators.TextAnalysis.bindOnce(slice(th, i + 1, lit(n)),
                  w => struct(xxhash64(w).as("_ct_h1"),
                    xxhash64(lit(1), w).as("_ct_h2")))))
        val evalGrams = eval_
          .select(col("doc_id").as("_ct_id"), toks.as("_ct_t"))
          .filter(size(col("_ct_t")) >= n)
          .select(col("_ct_id"),
            explode(array_distinct(gramHashes(col("_ct_t")))).as("_ct_hs"))
          .select(col("_ct_id"), col("_ct_hs._ct_h1").as("_ct_h1"),
            col("_ct_hs._ct_h2").as("_ct_h2"))
        val rawTrainGrams = train
          .select(toks.as("_ct_t"))
          .filter(size(col("_ct_t")) >= n)
          .select(explode(gramHashes(col("_ct_t"))).as("_ct_hs"))
          .select(col("_ct_hs._ct_h1").as("_ct_h1"),
            col("_ct_hs._ct_h2").as("_ct_h2"))
        t("eval grams count")(evalGrams.count())
        t("train grams explode only")(rawTrainGrams.count())
        var bloomRef: org.apache.spark.util.sketch.BloomFilter = null
        t("bloom build (eval grams)") {
          bloomRef = evalGrams.stat.bloomFilter("_ct_h1", 10000000L, 0.01)
        }
        val trainHashes = rawTrainGrams.filter(
          graft.functions.BloomMightContain.mightContain(
            col("_ct_h1"), bloomRef))
        t("train explode + bloom filter")(trainHashes.count())
        val matched = evalGrams.select(col("_ct_h1"), col("_ct_h2")).distinct()
          .join(trainHashes, Seq("_ct_h1", "_ct_h2"), "left_semi")
        t("+ matched semi-join")(matched.count())
        val perDoc = evalGrams
          .join(broadcast(matched.withColumn("_ct_hit", lit(1))),
            Seq("_ct_h1", "_ct_h2"), "left")
          .groupBy(col("_ct_id"))
          .agg(count(lit(1)).as("n_grams"),
            coalesce(sum(col("_ct_hit")), lit(0L)).as("n_contaminated"))
        t("+ perDoc join+agg")(perDoc.agg(sum(col("n_contaminated"))).collect())
        var face: org.apache.spark.sql.DataFrame = null
        t("face CONSTRUCTION (bloom job)") {
          face = graft.queries.CurationQueries.q85Contamination(spark, dir)
        }
        t("face collect (prebuilt)")(face.collect())
        t("FULL q85 face")(graft.queries.CurationQueries
          .q85Contamination(spark, dir).collect())
      case other => sys.error(s"unknown target $other")
    }
    spark.stop()
  }
}
