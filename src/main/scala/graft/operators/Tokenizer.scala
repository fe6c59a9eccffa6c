package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Tokenizer TRAINING for large-scale pipelines: byte-pair-encoding
  * merge learning (Sennrich et al. 2016, arXiv:1508.07909) as a
  * distributed job — the missing third leg next to token counting
  * (B19) and tokenizer APPLICATION (q101 packing): before a corpus can
  * be packed, its tokenizer must be TRAINED on it.
  *
  * Scale discipline (the part that matters at 100 TB): the corpus is
  * touched exactly ONCE (word-count aggregation); every merge round
  * runs over the VOCABULARY frame (types, not tokens — heavy-tail
  * bounded at any corpus size), exactly like the reference
  * implementation's dict-of-words loop, but as shuffled aggregations:
  *   round := pair-count agg on (lhs, rhs) → 1-row argmax →
  *            map-side greedy merge fold.
  * The argmax is a single collected row per round (the bounded
  * driver-step pattern of k-means centroids / packing stats), and the
  * merge fold is a per-row `aggregate` — no shuffle.
  *
  * Semantics pinned for the dual-engine oracle:
  *  - words = whitespace tokens, symbolized as code points + `</w>`
  *    (the classic word-end marker);
  *  - pair counts are adjacent-symbol counts WITH overlap ([a,a,a]
  *    counts (a,a) twice), weighted by word frequency;
  *  - best pair = max count, ties broken (lhs, rhs) ascending —
  *    deterministic in both engines (binary collation);
  *  - merging is canonical GREEDY left-to-right non-overlapping
  *    ([a,a,a,a,a] → [aa,aa,a]), expressed as a string fold with a TAB
  *    separator (tokens cannot contain whitespace, so TAB is provably
  *    absent from symbols): `acc ends with TAB+lhs ∧ x = rhs → glue x
  *    onto the last symbol, else append` — DuckDB replays the identical
  *    fold via `list_reduce`, so the oracle certifies every round's
  *    pair table, argmax, and merge application.
  */
object Tokenizer {

  private val Sep = "\t"

  /** Learn `numMerges` BPE merges from the corpus; returns the merge
    * table (merge_round, lhs, rhs, pair_count) in training order —
    * the artifact a tokenizer ships. Stops early if the vocabulary
    * runs out of pairs.
    */
  def bpeTrainMerges(
      df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (cur, merges) = trainRounds(df, textCol, numMerges)
    cur.unpersist()
    merges.toSeq
      .toDF("merge_round", "lhs", "rhs", "pair_count")
      .select(col("merge_round").cast("long"), col("lhs"), col("rhs"),
        col("pair_count"))
      .orderBy(col("merge_round"))
  }

  /** Train and APPLY in one pass structure: the final merged vocabulary
    * frame itself — (word, n_bpe = its subword count under the trained
    * tokenizer). Because training already maintains every word's merged
    * symbol sequence round by round, application to the vocabulary is
    * free (`size` of the final symbols) — and costing a CORPUS is then
    * a vocabulary join away (see q148), never a per-occurrence re-fold.
    */
  def bpeVocabCosts(
      df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (cur, _) = trainRounds(df, textCol, numMerges)
    // `cur` stays persisted: the caller's action consumes it, and its
    // lineage chains through every merge round — recomputation would
    // re-run training. Vocabulary-sized (types, not tokens), and
    // MEMORY_AND_DISK entries are evictable, so the session-lifetime
    // cache entry is bounded and safe.
    cur.select(col("_w").as("word"),
      size(col("_syms")).cast("long").as("n_bpe"))
  }

  /** Shared training loop: word-count aggregation once, then per-round
    * pair-count agg → 1-row argmax → greedy merge fold, the word string
    * riding along. Returns the final (persisted) vocabulary frame and
    * the merge table.
    */
  private def trainRounds(df: DataFrame, textCol: String, numMerges: Int):
      (DataFrame, scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")

    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("_c"))
      // (?s): Java '.' excludes all five line terminators while RE2's
      // (the DuckDB oracle) excludes only \n — U+0085/U+2028/U+2029
      // survive whitespace tokenization on both sides, so a non-DOTALL
      // split would silently drop them from the symbol sequence here
      // and diverge from the oracle. DOTALL makes '.' total both sides.
      .select(col("_w"),
        concat(regexp_extract_all(col("_w"), lit("(?s)."), lit(0)),
          array(lit("</w>"))).as("_syms"),
        col("_c"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var cur = words
    var round = 1
    while (round <= numMerges) {
      val best = cur
        .select(explode(TextAnalysis.bindOnce(col("_syms"), ss =>
          when(size(ss) >= 2,
            transform(sequence(lit(0), size(ss) - 2),
              i => struct(get(ss, i).as("l"), get(ss, i + 1).as("r"))))
            .otherwise(array().cast("array<struct<l:string,r:string>>"))))
          .as("_p"), col("_c"))
        .groupBy(col("_p.l").as("_l"), col("_p.r").as("_r"))
        .agg(sum(col("_c")).as("_cnt"))
        .orderBy(col("_cnt").desc, col("_l").asc, col("_r").asc)
        .limit(1) // 1-row argmax: the bounded driver step
        .collect()
      if (best.isEmpty) round = numMerges + 1
      else {
        val Row(l: String, r: String, cnt: Long) = best(0)
        merges += ((round, l, r, cnt))
        val folded = aggregate(col("_syms"), lit(""), (acc, x) =>
          when(endswith(acc, lit(Sep + l)) && x === lit(r), concat(acc, x))
            .otherwise(concat(acc, lit(Sep), x)))
        val next = cur
          .select(col("_w"), split(ltrim(folded, Sep), Sep).as("_syms"), col("_c"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the parent
        cur.unpersist()
        cur = next
        round += 1
      }
    }
    (cur, merges)
  }

  /** Apply a learned merge table to a corpus: re-symbolize each word
    * and replay the merges in training order (the same greedy fold),
    * returning per-document subword token counts — the "how many
    * tokens will this corpus cost under the trained tokenizer"
    * estimator. One pass over the corpus; merges ride the closure as
    * literals (they are the trained artifact, vocabulary-independent).
    */
  def bpeTokenCount(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val perWord = TextAnalysis.bindOnce(
      concat(regexp_extract_all(col("_w"), lit("(?s)."), lit(0)),
        array(lit("</w>"))),
      syms0 => {
        val mergedStr = merges.foldLeft(
          aggregate(syms0, lit(""), (acc, x) => concat(acc, lit(Sep), x))) {
          case (s, (l, r)) =>
            // replay one merge: re-fold the TAB-joined symbols
            TextAnalysis.bindOnce(split(ltrim(s, Sep), Sep), ss =>
              aggregate(ss, lit(""), (acc, x) =>
                when(endswith(acc, lit(Sep + l)) && x === lit(r),
                  concat(acc, x))
                  .otherwise(concat(acc, lit(Sep), x))))
        }
        size(split(ltrim(mergedStr, Sep), Sep))
      })
    df.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .select(col(idCol), perWord.as("_n"))
      .groupBy(col(idCol))
      .agg(sum(col("_n")).cast("long").as("n_bpe_tokens"))
  }
}
