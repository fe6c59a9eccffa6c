package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Curation

/** Round-5 corpus-curation coverage (q67–q72): PII redaction,
  * deterministic split assignment, exact stratified sampling,
  * chunk-ownership dedup, n-gram Jaccard near-dup pairs, and
  * embedding-cosine near-dup dedup — all dual-engine DuckDB-oracled over
  * the real `documents`/`embeddings` tables. The synthetic corpus
  * contains no PII, so q67 plants a deterministic PII suffix (derived
  * from `doc_id`) in BOTH engines and checks detection counts + the md5
  * of the redacted text — an exact cross-engine pin of the redaction
  * semantics, including the precision case (an SSN-shaped token no
  * pattern should touch). The embeddings likewise contain no cosine
  * near-dups (max pair cosine 0.513), so q72 plants jittered copies and
  * reversed decoys with the same both-engines construction.
  */
object CurationQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** The planted-PII text: 120 chars of the real document followed by an
    * email / IPv4 / phone derived from doc_id, plus an SSN-shaped decoy
    * that must SURVIVE redaction (precision, not just recall).
    */
  private def plantedPii: org.apache.spark.sql.Column = concat(
    substring(col("text"), 1, 120),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com from 10."),
    (col("doc_id") % 200).cast("string"), lit(".3.44 call +1-555-"),
    lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
    lit(" ref 123-45-6789"))

  /** q67 — PII detect + redact (counts on the original, md5-pinned
    * redacted text). Shuffle-free per-row expressions.
    */
  def q67PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val countCols = Curation.piiCounts(plantedPii)
      .map { case (name, c) => c.as(name) }
    docs(spark, dir).select(
      (col("doc_id") +: countCols :+
        md5(Curation.piiRedact(plantedPii)).as("red_md5")): _*)
      .orderBy(col("doc_id"))
  }

  /** q68 — deterministic 80/10/10 train/val/test assignment by
    * `hash16(doc_id)`, rolled up per (split, lang).
    */
  def q68SplitCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        Curation.assignSplit(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"),
        col("lang"), col("n_chars"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"), col("lang"))

  /** q69 — exact stratified sample: the 40 smallest-(md5, id) docs per
    * source, via the hash-prefilter two-phase plan (Curation.scala).
    */
  def q69StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(docs(spark, dir), "source", "doc_id", k = 40)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("source"), col("rk"))

  /** q70 — chunk-level exact dedup by ownership: 8-token chunks, each
    * distinct chunk text owned by its smallest doc_id; rows = owners,
    * owned_chunks = distinct chunks kept.
    */
  def q70ChunkDedup(spark: SparkSession, dir: String): DataFrame =
    Curation.chunkOwnershipStats(docs(spark, dir), "doc_id", "text",
      chunkTokens = 8)
      .orderBy(col("doc_id"))

  /** q71 — exact n-gram Jaccard near-dup pairs (3-token shingles,
    * Jaccard ≥ 0.5) via the inverted-index plan (Dedup.ngramJaccardPairs:
    * quadratic only within df-capped shingle buckets, never all-pairs).
    * The default maxDf=1000 cap provably never bites here (max shingle
    * df is 7 at sf0.01 / 25 at sf0.1), so the result is EXACT and the
    * DuckDB oracle computes the same pairs from first principles. The
    * jaccard column is an exact small-int ratio — bit-identical IEEE
    * division in both engines.
    */
  def q71NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.ngramJaccardPairs(
      docs(spark, dir), "doc_id", "text", shingleN = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** q72 — embedding-cosine near-dup dedup survivors. The corpus is the
    * real embeddings table (cast to double) plus BOTH-ENGINES-planted
    * rows: a scale-jittered near-copy of every 5th vector (per-element
    * factor 1 + 0.002·((i mod 7) − 3); cosine ≈ 0.99999 to its original)
    * and a reversed decoy of every 7th (cosine ≤ 0.513 to everything —
    * must SURVIVE). A row is dropped iff some smaller-id row has cosine
    * ≥ 0.95. Margins are wide (max non-dup pair 0.513 vs min dup
    * 0.99999), so a last-ulp cosine difference cannot flip membership.
    * Spark side: Dedup.embeddingNearDupPairsExact (the declared exact
    * baseline; DedupSpec pins the banded-LSH scale path ≡ this exact
    * pair set on the same planted corpus).
    *
    * Plant-id offsets are 1e8/2e8 (not 1e5/2e5): id identity is
    * load-bearing in the survivor anti-join, so plant ids must not
    * collide with base ids at ANY materialized scale — the r9 100×
    * rung caught exactly that collision (500 k doc / 200 k vec ids vs
    * a 1e5 offset), where both engines silently computed different
    * well-defined queries. Assumption, asserted nowhere cheaper: base
    * id space < 1e8 rows per table, ~40 TB of documents at this row
    * size — revisit the constant before materializing beyond that.
    */
  def q72CosineDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val jit = e.filter(col("vec_id") % 5 === 0).select(
      (col("vec_id") + 100000000L).as("vec_id"),
      transform(col("v"),
        (x, i) => x * (lit(1.0) + lit(0.002) * (i % 7 - 3))).as("v"))
    val dec = e.filter(col("vec_id") % 7 === 3).select(
      (col("vec_id") + 200000000L).as("vec_id"), reverse(col("v")).as("v"))
    val corpus = e.unionByName(jit).unionByName(dec)
    val losers = graft.operators.Dedup
      .embeddingNearDupPairsExact(corpus, "vec_id", "v", threshold = 0.95)
      .select(col("id_b").as("vec_id")).distinct()
    corpus.join(losers, Seq("vec_id"), "left_anti")
      .select(col("vec_id")).orderBy(col("vec_id"))
  }

  /** The planted-boilerplate text for q73: every 10th document gets two
    * shared 8-token blocks separated by a doc-unique token, so each
    * planted doc contains (at least) two disjoint repeated spans with a
    * guaranteed gap between them — exercising the island-merge, the
    * island-split, and the `+ gramN − 1` end extension. Planted in BOTH
    * engines (the construction is pure string concat on doc_id), same
    * technique as q67/q72.
    */
  private def plantedBoiler: org.apache.spark.sql.Column =
    when(col("doc_id") % 10 === 0, concat(
      col("text"),
      lit(" bpa bpb bpc bpd bpe bpf bpg bph u"),
      col("doc_id").cast("string"),
      lit(" bqa bqb bqc bqd bqe bqf bqg bqh")))
      .otherwise(col("text"))

  /** q73 — repeated-substring span detection (Lee et al. 2022-style
    * sub-document dedup): maximal token spans whose every 5-gram occurs
    * ≥2 times corpus-wide (Dedup.repeatedSpans: positioned 64-bit gram
    * fingerprints → corpus count → semi-join → per-doc gaps-and-islands).
    * The synthetic corpus has few natural repeated 5-grams, so
    * [[plantedBoiler]] adds two shared blocks around a doc-unique token
    * to every 10th doc — both engines plant identically.
    */
  def q73RepeatedSpans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.repeatedSpans(
      docs(spark, dir).select(col("doc_id"), plantedBoiler.as("text")),
      "doc_id", "text", gramN = 5, minCount = 2)
      .orderBy(col("doc_id"), col("span_start"))

  /** q152 — repeated-span CUTTING ([[graft.operators.Dedup
    * .cutRepeatedSpans]]): the apply side of q73 — the Lee et al. 2022
    * sub-document dedup actually EDITS the corpus, removing every
    * maximal repeated span and keeping the novel text around it. Same
    * planted-boilerplate corpus as q73; output is the cleaned
    * single-space-canonical text per affected document, compared as a
    * raw string cross-engine (the strongest check available — any
    * off-by-one in span ends or position filtering breaks the string).
    */
  def q152SpanCut(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.cutRepeatedSpans(
      docs(spark, dir).select(col("doc_id"), plantedBoiler.as("text")),
      "doc_id", "text", gramN = 5, minCount = 2)
      .orderBy(col("doc_id"))

  /** q74 — token-budget mixture sampling: per-source deterministic
    * (md5-draw-order) document prefix until the source's token budget is
    * met (Curation.tokenBudgetMixture — two-phase hash-prefilter plan;
    * budgets 500 tokens for src0–src9, 650 for src10–src19). `tok_start`
    * (the doc's exclusive cumulative token offset in its source's draw)
    * is part of the output, pinning the ORDER of the draw cross-engine,
    * not just the selected set.
    */
  def q74TokenBudget(spark: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetMixture(
      docs(spark, dir).select(col("doc_id"), col("source"), col("text")),
      "source", "doc_id", "text",
      when(length(col("source")) === 4, 500L).otherwise(650L))
      .select(col("doc_id"), col("source"), col("n_tok"), col("tok_start"))
      .orderBy(col("source"), col("tok_start"), col("doc_id"))

  /** q149 — temperature-weighted mixture allocation
    * ([[Curation.temperatureMixture]]): the XLM-R/mT5 √n sampling rule
    * turned into an exact integer largest-remainder allocation of a
    * 10 M-token budget across sources. Allocations sum to the budget
    * EXACTLY; weights/epochs are display-rounded. Dual-engine exact:
    * IEEE sqrt is correctly rounded (bit-identical both engines),
    * everything after is BIGINT arithmetic (see the operator's
    * scaladoc for why α is pinned at 0.5).
    */
  def q149TemperatureMixture(spark: SparkSession, dir: String): DataFrame =
    Curation.temperatureMixture(
      docs(spark, dir).select(col("source"), col("text")),
      "source", "text", budget = 10000000L)
      .orderBy(col("source"))

  /** The deterministic candidate-pair graph for q75/q76: pure arithmetic
    * on `doc_id`, so both engines construct it identically (the q67/q72
    * planting technique, applied to graph topology). Chain edges
    * (doc_id, doc_id−1) broken at multiples of 17 give diameter-17
    * paths — the adversarial case for label propagation — and cross
    * edges (doc_id, doc_id−2) at multiples of 5 add cycles and bridge
    * some chain breaks (merged 34-node components). Docs with
    * doc_id % 101 = 50 touch no edge → singleton path exercised.
    */
  private def syntheticPairs(d: DataFrame): org.apache.spark.sql.DataFrame = {
    def inGraph(c: org.apache.spark.sql.Column) = c % 101 =!= 50
    d.filter(col("doc_id") % 17 =!= 0 &&
        inGraph(col("doc_id")) && inGraph(col("doc_id") - 1))
      .select(col("doc_id").as("id_a"), (col("doc_id") - 1).as("id_b"))
      .union(
        d.filter(col("doc_id") % 5 === 0 && col("doc_id") >= 2 &&
            inGraph(col("doc_id")) && inGraph(col("doc_id") - 2))
          .select(col("doc_id").as("id_a"), (col("doc_id") - 2).as("id_b")))
  }

  /** q75 — distributed connected components (alternating large/small-star,
    * [[graft.operators.Dedup.connectedComponents]]) over the synthetic
    * pair graph: every doc mapped to the min doc_id of its component,
    * singletons mapping to themselves. The DuckDB oracle computes the
    * same fixpoint from first principles with a recursive reachability
    * CTE + min — engine-independent semantics, engine-specific algorithm
    * (log-round star contraction vs transitive closure).
    */
  def q75ConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val cc = graft.operators.Dedup.connectedComponents(
      syntheticPairs(d), "id_a", "id_b")
    d.select(col("doc_id"))
      .join(cc, d("doc_id") === cc("id"), "left")
      .select(d("doc_id"),
        coalesce(col("component"), d("doc_id")).as("component"))
      .orderBy(col("doc_id"))
  }

  /** q76 — cluster-level dedup ([[graft.operators.Dedup.clusterDedup]]):
    * one survivor per connected component of the pair graph — the
    * LONGEST member (precedence −n_chars), doc_id breaking ties — plus
    * all singletons. This is the policy single-pass dedup cannot
    * express (it has no component id to select a best member within).
    */
  def q76ClusterDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    graft.operators.Dedup.clusterDedup(d, syntheticPairs(d), "doc_id",
      precedence = Some(-col("n_chars")))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** q77 — BM25 retrieval ([[graft.operators.Retrieval.bm25]]) for the
    * probe {dup, vector, hash} — 'dup' is rare (df 25/500), the others
    * common (df ~380/500), so the idf spread is exercised. All inputs to
    * the formula are exact in both engines (integer tf/df/dl, exact
    * integer-sum avgdl); ln and the 3-term sum can drift ±1 ulp between
    * engines, so the score is rounded to 6 decimals (the q62 rule —
    * drift is nine orders below the grain). Output is every matching
    * doc, ordered by doc_id: a full-score pin, stronger than a top-k cut.
    */
  def q77Bm25(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Retrieval.bm25(
      docs(spark, dir), "doc_id", "text", Seq("dup", "vector", "hash"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"))

  /** q78 — deterministic weighted sampling without replacement
    * ([[graft.operators.Curation.weightedSample]]): 60 docs drawn ∝
    * n_chars via the exponential race. Both engines compute the draw
    * −ln((md5_8hex + 0.5)/2³²)/n_chars from exact integer inputs; the
    * probability of two draws landing within the engines' ±1-ulp ln
    * disagreement is negligible (draws are spread over ~e⁻¹ scales),
    * and doc_id breaks any exact tie. Output is the selected set WITH
    * draw order — the same order-pinning trick as q74's tok_start.
    */
  def q78WeightedSample(spark: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(docs(spark, dir), "doc_id", col("n_chars"), k = 60)
      .select(col("doc_id"), col("n_chars"), col("rk"))
      .orderBy(col("rk"))

  /** q82 — θ-frequent terms via the Misra–Gries heavy-hitters sketch
    * ([[graft.functions.Aggregators.MisraGries]]) with an EXACT second
    * pass — the classic two-phase heavy-hitters shape that stays
    * correct at any vocabulary size (the r8 version pinned capacity to
    * the sf0.01 vocabulary and broke by construction at 10×):
    *
    *  1. one corpus scan through the mergeable O(k) summary with
    *     capacity k = ⌈1/θ⌉ = 200, which GUARANTEES every term of
    *     frequency > n/(k+1) — hence every θ-heavy term — survives in
    *     the sketch (MG deficit bound), alongside an exact token count
    *     n from the same scan;
    *  2. collect the ≤ k candidates (a bounded driver step, ≤ 200
    *     strings — the sketch's whole point is that this is tiny no
    *     matter the corpus), then one exact candidate-filtered count
    *     with the integer threshold cnt·200 > n (no float θ·n).
    *
    * The sketch's survivor SET may vary with partition order once it
    * evicts (only the guarantee is order-free); the exact pass-2 filter
    * makes the final answer deterministic regardless. The DuckDB oracle
    * recomputes from first principles with the same integer threshold.
    */
  def q82FrequentTerms(spark: SparkSession, dir: String): DataFrame = {
    val theta = 200 // threshold 1/200 of all tokens; capacity = ceil(1/θ)
    val mg = udaf(new graft.functions.Aggregators.MisraGries(theta))
    val toks = docs(spark, dir)
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
    val pass1 = toks.agg(mg(col("t")).as("cand"), count(lit(1)).as("n"))
      .select(col("cand"), col("n")).head()
    val n = pass1.getLong(1)
    val cands = pass1.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    toks.filter(col("t").isin(cands: _*))
      .groupBy(col("t").as("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * theta > n)
      .orderBy(col("term"))
  }

  /** q85 — train/eval n-gram contamination audit
    * ([[graft.operators.TextAnalysis.ngramContamination]]): eval = every
    * 10th doc, train = the rest, n = 13 (the standard benchmark-leakage
    * window). The corpus's planted duplicate/boilerplate structure makes
    * contamination REAL (282 of 2139 distinct eval 13-grams hit at
    * sf0.01), so the count columns are load-bearing, not all-zero. The
    * Bloom prefilter is exactness-invisible (exact string semi-join
    * after); the oracle recomputes from first principles with DuckDB
    * list slicing. frac = n_contaminated/n_grams is a small-int ratio —
    * bit-identical IEEE division both sides.
    */
  def q85Contamination(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    graft.operators.TextAnalysis.ngramContamination(
      train = d.filter(col("doc_id") % 10 =!= 0),
      eval = d.filter(col("doc_id") % 10 === 0),
      idCol = "doc_id", textCol = "text", n = 13)
      .orderBy(col("doc_id"))
  }

  /** q86 — incremental exact dedup against a corpus snapshot
    * ([[graft.operators.Dedup.incrementalExactDedup]]): incoming = every
    * 3rd doc PLUS re-idded copies (doc_id + 100000000) of every 5th-mod-1
    * doc, existing = the rest. The corpus has no natural exact text
    * duplicates, so the copies are planted IN BOTH ENGINES to make both
    * rejection modes load-bearing: a copy whose original sits in the
    * snapshot is rejected by the anti-join; a copy whose original is in
    * the same batch loses the within-batch min-id collapse. Every copy
    * must die — a broken anti-join or collapse surfaces as extra rows
    * and a hash mismatch. Bloom prefilter exactness-invisible as in
    * q59/q85.
    */
  def q86IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("text"))
    val incoming = d.filter(col("doc_id") % 3 === 0)
      .unionByName(d.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
    graft.operators.Dedup.incrementalExactDedup(
      existing = d.filter(col("doc_id") % 3 =!= 0),
      incoming = incoming,
      idCol = "doc_id", contentCol = "text")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** q87 — MAP-type function suite (the B-tier type-system face the
    * reference's flat varchar schema never exercises): construct a map
    * per row, extract / default-on-miss / membership / sorted-key list /
    * transform_values, all surfaced as scalar columns so the oracle
    * compares values not container renderings (DuckDB MAP extraction is
    * list-wrapped — `m['k'][1]` — and its cardinality is UBIGINT, both
    * normalized in the SQL).
    */
  def q87MapFns(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("m", map(
        lit("lang"), col("lang"), lit("src"), col("source"),
        lit("id"), col("doc_id").cast("string")))
      .select(
        col("doc_id"),
        element_at(col("m"), "lang").as("lv"),
        size(col("m")).cast("long").as("n"),
        map_contains_key(col("m"), "src").as("hk"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("ks"),
        element_at(transform_values(col("m"), (_, v) => upper(v)), "src").as("up_src"),
        coalesce(element_at(col("m"), "zz"), lit("none")).as("miss"))
      .orderBy(col("doc_id"))

  /** q88 — UNPIVOT (B6's inverse face, completing q80's pivot): three
    * per-doc metric columns melt to (doc_id, metric, value) rows via
    * Spark's native `unpivot` (one Expand node, no union-of-selects);
    * DuckDB's UNPIVOT reproduces it. Metrics pinned BIGINT both sides.
    */
  def q88Unpivot(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        col("n_chars").cast("long").as("m_chars"),
        length(col("text")).cast("long").as("m_len"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("m_tok"))
      .unpivot(Array(col("doc_id")),
        Array(col("m_chars"), col("m_len"), col("m_tok")), "metric", "value")
      .orderBy(col("doc_id"), col("metric"))

  /** q89 — array-returning regex (B11 widening beyond q39's scalar
    * extract): all lowercase runs and all digit runs per doc, compared
    * as joined strings plus counts (the engines agree on match order —
    * both scan left to right). */
  def q89RegexpExtractAll(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        array_join(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)), "|").as("words"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("n_words"),
        array_join(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)), "|").as("nums"))
      .orderBy(col("doc_id"))

  /** q90 — array SET operations (B-tier completion over q38's scalar
    * array suite): intersect/union/except of two distinct-element token
    * slices per doc, normalized by array_sort + join because the
    * engines' set-op output orders are implementation-defined. Inputs
    * pass through array_distinct on BOTH sides so the engines'
    * differing duplicate semantics never matter.
    */
  def q90ArraySetOps(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("_t", graft.operators.TextAnalysis.tokens(col("text")))
      .withColumn("a", array_distinct(slice(col("_t"), 1, 6)))
      .withColumn("b", array_distinct(slice(col("_t"), 4, 6)))
      .select(col("doc_id"),
        array_join(array_sort(array_intersect(col("a"), col("b"))), ",").as("i"),
        array_join(array_sort(array_union(col("a"), col("b"))), ",").as("u"),
        array_join(array_sort(array_except(col("a"), col("b"))), ",").as("x"))
      .orderBy(col("doc_id"))

  /** q91 — boolean/conditional aggregates (bool_and / bool_or /
    * count_if) per language over doc stats, plus JSON CONSTRUCTION
    * (to_json over a named struct — the inverse of q33's extraction;
    * both engines emit compact `{"k":v}` with insertion-order keys).
    */
  def q91BoolAggsJson(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(col("lang"))
      .agg(
        bool_and(col("n_chars") > 50).as("all_gt50"),
        bool_or(col("n_chars") > 900).as("any_gt900"),
        count_if(col("source") === "web").as("n_web"),
        min(col("doc_id")).as("first_id"))
      .withColumn("j", to_json(struct(col("lang"), col("n_web"))))
      .orderBy(col("lang"))

  /** q92 — INTERPOLATED quantiles (percentile_cont WITHIN GROUP), the
    * continuous counterpart of q48's percentile_disc: both engines
    * compute lo + f·(hi − lo) at the same fractional index; the 6-decimal
    * round absorbs any last-ulp drift per the float-comparison rule.
    *
    * NOT the built-in `percentile_cont`: with 3 status values over all of
    * orders, its sort-buffer aggregate holds a third of the table per
    * group — the r6 verdict's one genuine scale-killer. The
    * [[graft.operators.Relational.percentileContExact]] bucketed two-pass
    * (q79/q126 discipline) selects the same exact order statistics with
    * bounded per-task state; the DuckDB oracle stays the stock
    * percentile_cont, certifying equivalence.
    */
  def q92PercentileCont(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Relational.percentileContExact(
        Tables.load(spark, dir, "orders"), "o_orderstatus", "o_totalprice",
        Seq("p30" -> 0.3, "p60" -> 0.6, "p90" -> 0.9))
      .select(col("o_orderstatus"),
        round(col("p30"), 6).as("p30"),
        round(col("p60"), 6).as("p60"),
        round(col("p90"), 6).as("p90"))
      .orderBy(col("o_orderstatus"))

  /** q93 — DETERMINISTIC mode (most-frequent value per group): built-in
    * `mode()` returns an arbitrary tie member on both engines, so the
    * deterministic form is a count + ranking window with a lexicographic
    * tiebreak — same discipline as every other cross-engine ranking.
    */
  def q93DeterministicMode(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cnt").desc, col("source"))
    docs(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lang"), col("source").as("mode_src"), col("cnt"))
      .orderBy(col("lang"))
  }

  /** q94 — date arithmetic suite over order dates: day offset, month add
    * with end-of-month clamping (Jan 31 + 1 month = Feb 29 in a leap
    * year — both engines clamp identically, probed), last_day, and a
    * day difference. DuckDB's interval addition yields TIMESTAMP; cast
    * back to DATE.
    */
  def q94DateArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate"), 45).as("d45"),
        add_months(col("o_orderdate"), 1).as("m1"),
        last_day(col("o_orderdate")).as("eom"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("dd"))
      .orderBy(col("o_orderkey"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_temperature_mixture" -> (q149TemperatureMixture _),
    "q67_pii_redact" -> (q67PiiRedact _),
    "q85_contamination" -> (q85Contamination _),
    "q92_percentile_cont" -> (q92PercentileCont _),
    "q93_mode" -> (q93DeterministicMode _),
    "q94_date_arith" -> (q94DateArithmetic _),
    "q86_incremental_dedup" -> (q86IncrementalDedup _),
    "q87_map_fns" -> (q87MapFns _),
    "q88_unpivot" -> (q88Unpivot _),
    "q89_regexp_all" -> (q89RegexpExtractAll _),
    "q90_array_setops" -> (q90ArraySetOps _),
    "q91_bool_aggs" -> (q91BoolAggsJson _),
    "q68_split_counts" -> (q68SplitCounts _),
    "q69_stratified_sample" -> (q69StratifiedSample _),
    "q70_chunk_dedup" -> (q70ChunkDedup _),
    "q71_ngram_jaccard" -> (q71NgramJaccard _),
    "q72_cosine_dedup" -> (q72CosineDedup _),
    "q73_repeated_spans" -> (q73RepeatedSpans _),
    "q152_span_cut" -> (q152SpanCut _),
    "q74_token_budget" -> (q74TokenBudget _),
    "q75_connected_components" -> (q75ConnectedComponents _),
    "q76_cluster_dedup" -> (q76ClusterDedup _),
    "q77_bm25" -> (q77Bm25 _),
    "q78_weighted_sample" -> (q78WeightedSample _),
    "q82_frequent_terms" -> (q82FrequentTerms _),
  )

  val oracles: Map[String, String] = Map(
    "q149_temperature_mixture" ->
      """WITH tot AS (
           SELECT source,
                  CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
                    x -> len(x) > 0))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         sc AS (
           SELECT source, n_tokens,
                  CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000, 0)
                    AS BIGINT) AS s
           FROM tot),
         t AS (SELECT *, CAST(sum(s) OVER () AS BIGINT) AS tt FROM sc),
         f AS (
           SELECT *, (s * 10000000) // tt AS fl,
                  s * 10000000 - ((s * 10000000) // tt) * tt AS rem
           FROM t),
         l AS (
           SELECT *,
                  CAST(10000000 - sum(fl) OVER () AS BIGINT) AS leftover,
                  rank() OVER (ORDER BY rem DESC, source ASC) AS rk
           FROM f)
         SELECT source, n_tokens,
                round(CAST(s AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight,
                CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                  AS BIGINT) AS alloc_tokens,
                round(CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS epochs
         FROM l ORDER BY source""",
    "q67_pii_redact" ->
      """WITH aug AS (
           SELECT doc_id,
                  concat(substr(text, 1, 120), ' contact user',
                         CAST(doc_id AS VARCHAR), '@example.com from 10.',
                         CAST(doc_id % 200 AS VARCHAR), '.3.44 call +1-555-',
                         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                         ' ref 123-45-6789') AS t
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
                CAST(len(regexp_extract_all(t, '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
                md5(regexp_replace(regexp_replace(regexp_replace(t,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                      '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g')) AS red_md5
         FROM aug ORDER BY doc_id""",
    "q68_split_counts" ->
      """WITH h AS (
           SELECT doc_id, lang, n_chars,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) AS h16
           FROM documents)
         SELECT CASE WHEN h16 < 52428 THEN 'train'
                     WHEN h16 < 58982 THEN 'val'
                     ELSE 'test' END AS split,
                lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM h GROUP BY 1, 2 ORDER BY split, lang""",
    "q69_stratified_sample" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
                  CAST(row_number() OVER (
                    PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
           FROM documents)
         WHERE rk <= 40 ORDER BY source, rk""",
    "q70_chunk_dedup" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS ts
           FROM documents),
         w AS (SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS i
               FROM toks),
         ch AS (SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS chunk_text
                FROM w GROUP BY doc_id, floor((i - 1) / 8)),
         own AS (SELECT chunk_text, min(doc_id) AS doc_id FROM ch GROUP BY chunk_text)
         SELECT doc_id, count(*) AS owned_chunks
         FROM own GROUP BY doc_id ORDER BY doc_id""",
    "q71_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  list_distinct(CASE
                    WHEN len(t) = 0 THEN []
                    WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                    ELSE [array_to_string(t[i+1:i+3], ' ') FOR i IN range(0, len(t)-2)]
                  END) AS s
           FROM toks),
         inv AS (SELECT doc_id, unnest(s) AS sg FROM sh),
         common AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS c
           FROM inv x JOIN inv y ON x.sg = y.sg AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh)
         SELECT common.id_a, common.id_b,
                CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) AS jaccard
         FROM common
         JOIN sizes na ON na.doc_id = common.id_a
         JOIN sizes nb ON nb.doc_id = common.id_b
         WHERE CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5
         ORDER BY id_a, id_b""",
    "q72_cosine_dedup" ->
      """WITH base AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         jit AS (
           SELECT vec_id + 100000000 AS vec_id,
                  [v[i+1] * (1 + 0.002*((i % 7) - 3)) FOR i IN range(0, len(v))] AS v
           FROM base WHERE vec_id % 5 = 0),
         dec AS (
           SELECT vec_id + 200000000 AS vec_id, list_reverse(v) AS v
           FROM base WHERE vec_id % 7 = 3),
         corpus AS (
           SELECT * FROM base UNION ALL SELECT * FROM jit UNION ALL SELECT * FROM dec)
         SELECT c.vec_id FROM corpus c
         WHERE NOT EXISTS (
           SELECT 1 FROM corpus o
           WHERE o.vec_id < c.vec_id AND list_cosine_similarity(o.v, c.v) >= 0.95)
         ORDER BY vec_id""",
    "q152_span_cut" ->
      """WITH aug AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 10 = 0 THEN concat(text,
                         ' bpa bpb bpc bpd bpe bpf bpg bph u',
                         CAST(doc_id AS VARCHAR),
                         ' bqa bqb bqc bqd bqe bqf bqg bqh')
                       ELSE text END AS t0
           FROM documents),
         toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(t0, '\s+'), x -> len(x) > 0) AS t
           FROM aug),
         g AS (
           SELECT doc_id, unnest(gs) AS gr, generate_subscripts(gs, 1) - 1 AS p
           FROM (SELECT doc_id,
                        [array_to_string(t[i+1:i+5], ' ') FOR i IN range(0, len(t)-4)] AS gs
                 FROM toks WHERE len(t) >= 5)),
         d AS (SELECT gr FROM g GROUP BY gr HAVING count(*) >= 2),
         dp AS (SELECT doc_id, p FROM g JOIN d USING (gr)),
         isl AS (SELECT doc_id, p,
                        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
                 FROM dp),
         sp AS (SELECT doc_id, min(p) AS s, max(p) + 4 AS e
                FROM isl GROUP BY doc_id, grp),
         sd AS (SELECT DISTINCT doc_id FROM sp),
         w AS (SELECT doc_id, unnest(t) AS tok,
                      generate_subscripts(t, 1) - 1 AS i
               FROM toks),
         k AS (SELECT w.doc_id, w.tok, w.i FROM w
               WHERE NOT EXISTS (SELECT 1 FROM sp
                                 WHERE sp.doc_id = w.doc_id
                                   AND w.i BETWEEN sp.s AND sp.e)),
         kc AS (SELECT doc_id, count(*) AS kept FROM k GROUP BY doc_id),
         ct AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
                FROM k GROUP BY doc_id)
         SELECT sd.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
                CAST(len(t.t) - coalesce(kc.kept, 0) AS BIGINT) AS cut_tokens,
                coalesce(ct.clean_text, '') AS clean_text
         FROM sd
         JOIN toks t USING (doc_id)
         LEFT JOIN kc USING (doc_id)
         LEFT JOIN ct USING (doc_id)
         ORDER BY doc_id""",
    "q73_repeated_spans" ->
      """WITH aug AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 10 = 0 THEN concat(text,
                         ' bpa bpb bpc bpd bpe bpf bpg bph u',
                         CAST(doc_id AS VARCHAR),
                         ' bqa bqb bqc bqd bqe bqf bqg bqh')
                       ELSE text END AS t0
           FROM documents),
         toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(t0, '\s+'), x -> len(x) > 0) AS t
           FROM aug),
         g AS (
           SELECT doc_id, unnest(gs) AS gr, generate_subscripts(gs, 1) - 1 AS p
           FROM (SELECT doc_id,
                        [array_to_string(t[i+1:i+5], ' ') FOR i IN range(0, len(t)-4)] AS gs
                 FROM toks WHERE len(t) >= 5)),
         d AS (SELECT gr FROM g GROUP BY gr HAVING count(*) >= 2),
         dp AS (SELECT doc_id, p FROM g JOIN d USING (gr)),
         isl AS (SELECT doc_id, p,
                        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
                 FROM dp)
         SELECT doc_id, CAST(min(p) AS INTEGER) AS span_start,
                CAST(max(p) + 4 AS INTEGER) AS span_end,
                CAST(max(p) + 4 - min(p) + 1 AS INTEGER) AS span_tokens
         FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""",
    "q74_token_budget" ->
      """WITH t AS (
           SELECT doc_id, source,
                  CAST(len(list_filter(string_split_regex(text, '\s+'),
                    x -> len(x) > 0)) AS BIGINT) AS n_tok,
                  md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         c AS (
           SELECT doc_id, source, n_tok,
                  CAST(coalesce(sum(n_tok) OVER (
                    PARTITION BY source ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS tok_start,
                  CASE WHEN len(source) = 4 THEN 500 ELSE 650 END AS b
           FROM t)
         SELECT doc_id, source, n_tok, tok_start
         FROM c WHERE tok_start < b ORDER BY source, tok_start, doc_id""",
    "q75_connected_components" ->
      """WITH RECURSIVE
           e AS (
             SELECT doc_id AS a, doc_id - 1 AS b FROM documents
             WHERE doc_id % 17 <> 0 AND doc_id % 101 <> 50 AND (doc_id - 1) % 101 <> 50
             UNION ALL
             SELECT doc_id, doc_id - 2 FROM documents
             WHERE doc_id % 5 = 0 AND doc_id >= 2 AND doc_id % 101 <> 50 AND (doc_id - 2) % 101 <> 50),
           sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
           walk(id, r) AS (
             SELECT doc_id, doc_id FROM documents
             UNION
             SELECT w.id, s.b FROM walk w JOIN sym s ON s.a = w.r)
         SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
         FROM walk GROUP BY id ORDER BY doc_id""",
    "q76_cluster_dedup" ->
      """WITH RECURSIVE
           e AS (
             SELECT doc_id AS a, doc_id - 1 AS b FROM documents
             WHERE doc_id % 17 <> 0 AND doc_id % 101 <> 50 AND (doc_id - 1) % 101 <> 50
             UNION ALL
             SELECT doc_id, doc_id - 2 FROM documents
             WHERE doc_id % 5 = 0 AND doc_id >= 2 AND doc_id % 101 <> 50 AND (doc_id - 2) % 101 <> 50),
           sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
           walk(id, r) AS (
             SELECT doc_id, doc_id FROM documents
             UNION
             SELECT w.id, s.b FROM walk w JOIN sym s ON s.a = w.r),
           cc AS (SELECT id AS doc_id, min(r) AS component FROM walk GROUP BY id),
           sel AS (
             SELECT d.doc_id, d.n_chars,
                    row_number() OVER (PARTITION BY cc.component
                                       ORDER BY d.n_chars DESC, d.doc_id) AS rn
             FROM documents d JOIN cc USING (doc_id))
         SELECT doc_id, n_chars FROM sel WHERE rn = 1 ORDER BY doc_id""",
    "q77_bm25" ->
      """WITH toks AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
           FROM documents),
         stats AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(avg(len(t)) AS DOUBLE) AS avgdl
           FROM toks),
         tf AS (
           SELECT doc_id, dl, tok, CAST(count(*) AS DOUBLE) AS tf
           FROM (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, unnest(t) AS tok
                 FROM toks)
           WHERE tok IN ('dup', 'vector', 'hash')
           GROUP BY doc_id, dl, tok),
         idf AS (
           SELECT tok,
                  ln(1.0 + (n - CAST(count(*) AS DOUBLE) + 0.5)
                           / (CAST(count(*) AS DOUBLE) + 0.5)) AS idf,
                  avgdl
           FROM tf CROSS JOIN stats GROUP BY tok, n, avgdl)
         SELECT tf.doc_id,
                round(sum(idf.idf * tf.tf * (1.2 + 1.0)
                          / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / idf.avgdl))),
                      6) AS score
         FROM tf JOIN idf USING (tok)
         GROUP BY tf.doc_id ORDER BY tf.doc_id""",
    "q78_weighted_sample" ->
      """WITH keyed AS (
           SELECT doc_id, n_chars,
                  -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                      / 4294967296.0) / n_chars AS k
           FROM documents)
         SELECT doc_id, n_chars, rk FROM (
           SELECT doc_id, n_chars,
                  CAST(row_number() OVER (ORDER BY k, doc_id) AS INTEGER) AS rk
           FROM keyed)
         WHERE rk <= 60 ORDER BY rk""",
    "q82_frequent_terms" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> len(x) > 0)) AS t
           FROM documents),
         tot AS (SELECT count(*) AS n FROM tok)
         SELECT t AS term, count(*) AS cnt
         FROM tok, tot GROUP BY t, tot.n
         HAVING count(*) * 200 > tot.n ORDER BY term""",
    "q85_contamination" ->
      """WITH ev AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                      x -> len(x) > 0) AS t
           FROM documents WHERE doc_id % 10 = 0),
         tr AS (
           SELECT list_filter(string_split_regex(text, '\s+'),
                              x -> len(x) > 0) AS t
           FROM documents WHERE doc_id % 10 <> 0),
         evg AS (
           SELECT DISTINCT doc_id, array_to_string(t[i:i+12], ' ') AS g
           FROM ev, LATERAL unnest(generate_series(1, len(t) - 12)) AS u(i)
           WHERE len(t) >= 13),
         trg AS (
           SELECT DISTINCT array_to_string(t[i:i+12], ' ') AS g
           FROM tr, LATERAL unnest(generate_series(1, len(t) - 12)) AS u(i)
           WHERE len(t) >= 13),
         pd AS (
           SELECT doc_id, count(*) AS n_grams,
                  CAST(sum(CASE WHEN g IN (SELECT g FROM trg) THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_contaminated
           FROM evg GROUP BY doc_id)
         SELECT e.doc_id,
                COALESCE(pd.n_grams, 0) AS n_grams,
                COALESCE(pd.n_contaminated, 0) AS n_contaminated,
                CASE WHEN COALESCE(pd.n_grams, 0) = 0 THEN 0.0
                     ELSE CAST(pd.n_contaminated AS DOUBLE) / pd.n_grams
                END AS frac
         FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) e
         LEFT JOIN pd USING (doc_id)
         ORDER BY doc_id""",
    "q86_incremental_dedup" ->
      """WITH inc AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 5 = 1),
         ex AS (SELECT text FROM documents WHERE doc_id % 3 <> 0),
         fresh AS (SELECT doc_id, text FROM inc
                   WHERE text NOT IN (SELECT text FROM ex))
         SELECT min(doc_id) AS doc_id FROM fresh GROUP BY text
         ORDER BY doc_id""",
    "q87_map_fns" ->
      """SELECT doc_id,
                m['lang'][1] AS lv,
                CAST(cardinality(m) AS BIGINT) AS n,
                list_contains(map_keys(m), 'src') AS hk,
                array_to_string(list_sort(map_keys(m)), ',') AS ks,
                upper(m['src'][1]) AS up_src,
                COALESCE(m['zz'][1], 'none') AS miss
         FROM (SELECT doc_id,
                      MAP(['lang', 'src', 'id'],
                          [lang, source, CAST(doc_id AS VARCHAR)]) AS m
               FROM documents)
         ORDER BY doc_id""",
    "q88_unpivot" ->
      """SELECT * FROM (
           UNPIVOT (SELECT doc_id,
                           CAST(n_chars AS BIGINT) AS m_chars,
                           CAST(len(text) AS BIGINT) AS m_len,
                           CAST(len(list_filter(string_split_regex(text, '\s+'),
                                                x -> len(x) > 0)) AS BIGINT) AS m_tok
                    FROM documents)
           ON m_chars, m_len, m_tok INTO NAME metric VALUE value)
         ORDER BY doc_id, metric""",
    "q89_regexp_all" ->
      """SELECT doc_id,
                array_to_string(regexp_extract_all(text, '[a-z]+'), '|') AS words,
                CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words,
                -- DuckDB renders the no-match case as NULL where Spark's
                -- array_join of an empty array is '' — normalize
                COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), '|'), '') AS nums
         FROM documents ORDER BY doc_id""",
    "q90_array_setops" ->
      """WITH base AS (
           SELECT doc_id,
                  list_distinct(t[1:6]) AS a,
                  list_distinct(t[4:9]) AS b
           FROM (SELECT doc_id,
                        list_filter(string_split_regex(text, '\s+'),
                                    x -> len(x) > 0) AS t
                 FROM documents))
         SELECT doc_id,
                -- COALESCE: DuckDB's list_sort of an empty list renders
                -- NULL through array_to_string; Spark's array_join is ''
                COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS i,
                COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS u,
                COALESCE(array_to_string(list_sort(
                  list_filter(a, x -> NOT list_contains(b, x))), ','), '') AS x
         FROM base ORDER BY doc_id""",
    "q91_bool_aggs" ->
      """SELECT lang,
                bool_and(n_chars > 50) AS all_gt50,
                bool_or(n_chars > 900) AS any_gt900,
                CAST(count_if(source = 'web') AS BIGINT) AS n_web,
                min(doc_id) AS first_id,
                CAST(to_json(struct_pack(lang := lang,
                       n_web := CAST(count_if(source = 'web') AS BIGINT))) AS VARCHAR) AS j
         FROM documents GROUP BY lang ORDER BY lang""",
    "q92_percentile_cont" ->
      """SELECT o_orderstatus,
                round(percentile_cont(0.3) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p30,
                round(percentile_cont(0.6) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p60,
                round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 6) AS p90
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q93_mode" ->
      """SELECT lang, source AS mode_src, cnt FROM (
           SELECT lang, source, count(*) AS cnt,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY count(*) DESC, source) AS rn
           FROM documents GROUP BY lang, source)
         WHERE rn = 1 ORDER BY lang""",
    "q94_date_arith" ->
      """SELECT o_orderkey,
                d + 45 AS d45,
                CAST(d + INTERVAL 1 MONTH AS DATE) AS m1,
                last_day(d) AS eom,
                CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) AS dd
         FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
               FROM orders WHERE o_orderkey < 2000)
         ORDER BY o_orderkey""",
  )
}
