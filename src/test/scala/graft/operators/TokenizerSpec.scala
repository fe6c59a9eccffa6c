package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // Hand-computed golden (the Sennrich walkthrough shape): corpus
  //   "low low low lower" →
  // words: low ×3 → [l,o,w,</w>]; lower ×1 → [l,o,w,e,r,</w>]
  // round 1 pairs: (l,o)=4 (o,w)=4 (w,</w>)=3 (w,e)=1 (e,r)=1 (r,</w>)=1
  //   → max 4, tie (l,o) < (o,w) lexicographically → merge (l,o)
  // round 2: [lo,w,</w>]×3, [lo,w,e,r,</w>]×1:
  //   (lo,w)=4 (w,</w>)=3 (w,e)=1 (e,r)=1 (r,</w>)=1 → (lo,w)
  // round 3: [low,</w>]×3, [low,e,r,</w>]×1:
  //   (low,</w>)=3 (low,e)=1 (e,r)=1 (r,</w>)=1 → (low,</w>)
  test("bpeTrainMerges: hand-computed merges, counts, and tie-breaks") {
    val df = Seq("low low low", "lower").toDF("text")
    val got = Tokenizer.bpeTrainMerges(df, "text", 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "l", "o", 4L),
      (2L, "lo", "w", 4L),
      (3L, "low", "</w>", 3L)))
  }

  test("bpeTrainMerges: greedy left-to-right non-overlapping merge ([a x 5] → [aa,aa,a])") {
    // one word "aaaaa": round 1 merges (a,a) with overlap count 4;
    // round 2 operates on [aa,aa,a,</w>]: pairs (aa,aa)=1 (aa,a)=1
    // (a,</w>)=1 → tie on count, (a,</w>) < (aa,a) < (aa,aa) → (a,</w>)
    val df = Seq("aaaaa").toDF("text")
    val got = Tokenizer.bpeTrainMerges(df, "text", 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 4L), (2L, "a", "</w>", 1L)))
  }

  test("bpeTrainMerges: stops early when the vocabulary runs out of pairs") {
    // single 1-char word: symbols [a, </w>] → one possible merge, then
    // every word is a single symbol and no pair remains
    val df = Seq("a a a").toDF("text")
    val got = Tokenizer.bpeTrainMerges(df, "text", 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "</w>", 3L)))
  }

  test("bpeVocabCosts ≡ bpeTokenCount: vocabulary-join costing equals merge-table replay") {
    // the two application paths — training's final vocab state vs
    // re-folding a shipped merge table — must agree on every document
    val corpus = Seq(
      (1L, "low lower lowest low"), (2L, "slow slower low"),
      (3L, "glow low low flow"), (4L, "a lone low")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrainMerges(corpus, "text", 4)
      .as[(Long, String, String, Long)].collect().map(m => (m._2, m._3)).toSeq
    val viaReplay = Tokenizer.bpeTokenCount(corpus, "doc_id", "text", merges)
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    val costs = Tokenizer.bpeVocabCosts(corpus, "text", 4)
    val viaVocab = corpus
      .select(col("doc_id"), explode(
        graft.operators.TextAnalysis.tokens(col("text"))).as("word"))
      .join(costs, "word")
      .groupBy(col("doc_id")).agg(sum(col("n_bpe")).as("n"))
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(viaReplay == viaVocab)
  }

  test("bpeTokenCount: trained merges shrink token counts, untouched words stay char-split") {
    val corpus = Seq((1L, "low low"), (2L, "hi")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val got = Tokenizer.bpeTokenCount(corpus, "doc_id", "text", merges)
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    // doc 1: each "low" → [low</w>] = 1 token → 2; doc 2: [h,i,</w>] = 3
    assert(got == Seq((1L, 2L), (2L, 3L)))
  }
}
