package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "dup hash hash"),
    (2L, "hash join join join"),
    (3L, "vector"),
    (4L, "other words only here"))
    .toDF("doc_id", "text")

  test("bm25 matches the closed-form score on a hand-computed corpus") {
    // N=4, avgdl=3; query {dup, hash}: df(dup)=1, df(hash)=2
    //   idf(dup)=ln(1+3.5/1.5)=ln(10/3); idf(hash)=ln(1+2.5/2.5)=ln 2
    // d1 (dl=3, len factor 1.0): tf(dup)=1 → idf·2.2/2.2; tf(hash)=2 → ln2·4.4/3.2
    // d2 (dl=4, len factor 1.25): tf(hash)=1 → ln2·2.2/2.5
    val out = Retrieval.bm25(corpus, "doc_id", "text", Seq("dup", "hash"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val exp1 = math.log(10.0 / 3) + 1.375 * math.log(2)
    val exp2 = 0.88 * math.log(2)
    assert(out.keySet == Set(1L, 2L), "only matching docs are returned")
    assert(math.abs(out(1L) - exp1) < 1e-12, s"d1: ${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - exp2) < 1e-12, s"d2: ${out(2L)} vs $exp2")
  }

  test("bm25: rare-term doc outranks common-term doc; duplicate query terms collapse") {
    val out = Retrieval.bm25(corpus, "doc_id", "text", Seq("dup", "hash", "dup"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))
    val once = Retrieval.bm25(corpus, "doc_id", "text", Seq("dup", "hash"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(out == once, "queryTerms is a set: repeating a term must not double-count")
  }

  test("bm25TopK: deterministic cut, plans as TakeOrderedAndProject") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("dup", "hash"), k = 1)
    assert(top.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k plan:\n$plan")
  }

  test("fused and inverted bm25 paths agree to 1e-12 on a real corpus slice") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val terms = Seq("dup", "vector", "hash")
    val prev = Retrieval.fusedMaxTerms
    def run(): Map[Long, Double] =
      Retrieval.bm25(docs, "doc_id", "text", terms)
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val fused = try { Retrieval.fusedMaxTerms = 16; run() }
      finally Retrieval.fusedMaxTerms = prev
    val inverted = try { Retrieval.fusedMaxTerms = 0; run() }
      finally Retrieval.fusedMaxTerms = prev
    assert(fused.keySet == inverted.keySet, "matching-doc row sets differ")
    fused.foreach { case (id, s) =>
      assert(math.abs(s - inverted(id)) < 1e-12, s"doc $id: $s vs ${inverted(id)}")
    }
    // the fused plan must not shuffle per-row data: no hashpartitioning
    // exchange on doc/term keys (its only exchange is the 1-row stats agg)
    val fusedPlan = Retrieval.bm25(docs, "doc_id", "text", terms)
      .queryExecution.executedPlan.toString
    assert(!fusedPlan.contains("hashpartitioning(_bm_id"),
      s"fused path shuffles per-doc rows:\n$fusedPlan")
  }
}
