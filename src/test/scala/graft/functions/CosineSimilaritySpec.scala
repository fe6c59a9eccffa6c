package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the zip_with/aggregate fallback on real data") {
    CosineSimilarity.register(spark)
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.filter(col("ida") < 20).crossJoin(b.filter(col("idb") < 20))
    val diffs = pairs.select(
      abs(CosineSimilarity.cosineSim(col("va"), col("vb")) -
        Similarity.cosine(col("va"), col("vb"))).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(diffs < 1e-12, s"max |native - fallback| = $diffs")
  }

  test("registered in SQL text and edge cases hold") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same,
                cosine_sim(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS zero,
                cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n""").head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0 && r.isNullAt(2))
  }

  test("whole-stage codegen handles the expression (no fallback errors)") {
    CosineSimilarity.register(spark)
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.select(CosineSimilarity.cosineSim(col("embedding"), col("embedding")).as("c"))
      .filter(col("c") > 0.999).count()
    assert(n == emb.count()) // self-similarity = 1 for all non-zero vectors
  }
}
