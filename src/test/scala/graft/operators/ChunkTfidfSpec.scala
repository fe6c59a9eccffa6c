package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkTfidfSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments: windows, overlap, tail remainder, short docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"))                                    // shorter than a chunk
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toList
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // stride 3: [t1..t4], [t4..t7], [t7..t10]
    assert(d1 == List("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(chunks.filter(_._1 == 2L).map(_._3) == List("a b"))
    // empty / whitespace-only docs yield zero chunks, not a phantom one
    val empty = TextAnalysis.chunkDocuments(
      Seq((3L, ""), (4L, "   ")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
    assert(empty.count() == 0)
  }

  test("chunkDocuments covers every token (reconstruction property)") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val total = docs.select(sum(TextAnalysis.tokenCount(col("text")))).head.getLong(0)
    val chunked = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 16, overlap = 4)
    // sum of per-chunk non-overlap contributions == total tokens:
    // each chunk beyond idx 0 re-covers `overlap` tokens
    val stats = chunked.agg(
      sum(col("chunk_tokens")).as("s"),
      count(lit(1)).as("c"),
      countDistinct(col("doc_id")).as("d")).head
    val covered = stats.getLong(0) - (stats.getLong(1) - stats.getLong(2)) * 4
    assert(covered == total, s"covered $covered != total $total")
  }

  test("tfidf: rare terms outweigh common terms; tf counted per doc") {
    val docs = Seq(
      (1L, "common rare common"),
      (2L, "common common"),
      (3L, "common other")).toDF("doc_id", "text")
    val m = TextAnalysis.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(m((1L, "common"))._1 == 2L) // tf
    // "rare" (df=1) scores higher than one occurrence of "common" (df=3)
    assert(m((1L, "rare"))._2 > m((3L, "common"))._2)
  }

  test("stratified sampling surface (sampleBy) is seed-deterministic") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fracs = Map("en" -> 0.5, "de" -> 0.1, "zh" -> 0.1, "fr" -> 0.1, "es" -> 0.1)
    val s1 = docs.stat.sampleBy("lang", fracs, 42L).select("doc_id").as[Long].collect().toSet
    val s2 = docs.stat.sampleBy("lang", fracs, 42L).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
    val langs = docs.stat.sampleBy("lang", fracs, 42L)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.getOrElse("en", 0L) > langs.getOrElse("de", 0L))
  }
}
