package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §2.4 B19 + the LLM-pipeline extensions): tokenization,
  * token counting, shingling, language ID, quality scoring, fingerprinting.
  *
  * Everything is a Column expression built from codegen'd built-ins
  * (`split`, higher-order `transform`/`aggregate`/`filter`, `xxhash64`) —
  * no UDFs, so whole-stage codegen spans stay wide and the operators run
  * unchanged at any scale: each is a narrow per-row map, no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenizer: maximal runs between ASCII `\s` separators,
    * empty-token-free (the `split("\\s+")` + `filter(length > 0)`
    * contract, pinned against that form in TextAnalysisSpec).
    */
  def tokens(text: Column): Column =
    // r8: native byte-scan expression (WhitespaceTokens) with the exact
    // `filter(split(text, "\\s+"), length > 0)` semantics — the regex
    // form re-compiled the pattern and round-tripped through java.lang
    // .String per ROW (see the expression's scaladoc); tokenization is
    // the hottest per-row constant in the text operators
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.WhitespaceTokens(
        org.apache.spark.sql.GraftPlanBridge.expression(text)))

  /** Evaluate `c` once and bind it as a lambda variable inside `f`.
    *
    * Catalyst performs no common-subexpression elimination across lambda
    * functions: every Column reference is a copied expression subtree, so
    * `f` mentioning its input k times re-evaluates it k times — quadratic
    * when the input is itself a per-element loop (this exact blowup made
    * shingling O(tokens²): each shingle slot re-tokenized the document).
    * Wrapping the value in a 1-element array and going through `transform`
    * binds it to a NamedLambdaVariable, which IS evaluated once.
    */
  def bindOnce(c: Column, f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Distinct 64-bit fingerprints of the token n-gram windows, built
    * WITHOUT materializing gram strings: each token is xxhash64'd once,
    * and each window fingerprint chains those hashes (Spark's own array
    * hashing) instead of re-concatenating/re-hashing token bytes per
    * window. Tokens contain no whitespace, so the gram string
    * `array_join(window, " ")` is injective on windows — distinct-by-
    * fingerprint equals distinct-by-gram-string up to negligible 64-bit
    * collisions (p ≈ |grams|²/2⁶⁵). Documents with fewer than n tokens
    * yield an empty array.
    *
    * Fused into a single native expression ([[graft.functions
    * .NgramFingerprints]]): TokBench showed the composed higher-order
    * form pays more in per-window `sequence`/lambda/`slice`/boxing
    * machinery than in hashing; the fused scan is one pass over the
    * bytes. [[ngramFingerprintsComposed]] keeps the composed form as the
    * differential parity witness.
    */
  def ngramFingerprints(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.NgramFingerprints(
        org.apache.spark.sql.GraftPlanBridge.expression(text), n))

  /** The composed-builtins form of [[ngramFingerprints]] — value-equal
    * by construction; retained as the spec's differential oracle.
    */
  private[graft] def ngramFingerprintsComposed(toks: Column, n: Int): Column = {
    require(n >= 1, s"ngram n must be >= 1, got $n")
    bindOnce(transform(toks, t => xxhash64(t)), th =>
      when(size(th) >= n,
        array_distinct(transform(sequence(lit(0), size(th) - n),
          i => xxhash64(slice(th, i + 1, lit(n))))))
        .otherwise(array().cast("array<bigint>")))
  }

  /** Whitespace token count — the count-only native byte scan
    * ([[graft.functions.TokenCount]]): `size(tokens(text))` semantics
    * (null → null included) with zero per-token allocation.
    */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.TokenCount(
        org.apache.spark.sql.GraftPlanBridge.expression(text)))

  /** BPE-ish sub-word token count: word pieces, numbers, and punctuation
    * runs counted separately (a cheap proxy for an LLM tokenizer's token
    * count — the usual cost estimator in data pipelines).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))

  /** Token n-gram shingles: `concat_ws(" ", tokens[i..i+n))` for each window.
    * Texts with fewer than n tokens yield a single shingle of the whole text
    * (so every non-empty doc has ≥1 shingle).
    */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 1, s"shingle n must be >= 1, got $n")
    bindOnce(tokens(text), toks =>
      when(size(toks) < n,
        when(size(toks) > 0, array(concat_ws(" ", toks))).otherwise(array()))
        .otherwise(
          transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Within-document repetition signal: the fraction of token n-gram
    * windows that duplicate another window of the same document —
    * `1 − distinct(shingles)/count(shingles)` — the standard repetition
    * filter of corpus quality pipelines (boilerplate, keyword stuffing,
    * and degenerate generations all score high; clean prose scores ~0).
    * Documents with fewer than n tokens have one whole-text shingle and
    * score 0; empty documents score 0. A pure per-row expression over
    * string shingles (not [[shingleHashes]]: cross-engine oracles compare
    * exact distinct counts, and a hash collision — however unlikely —
    * would silently shift the fraction), so it runs shuffle-free at any
    * corpus size.
    */
  def repetitionFraction(text: Column, n: Int): Column =
    bindOnce(shingles(text, n), sh =>
      when(size(sh) === 0, lit(0.0))
        .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)))

  /** 64-bit hashes of the token n-gram shingles, skipping the string
    * materialization entirely: xxhash64 over the token-array slice hashes
    * the n tokens directly. Set operations (Jaccard, MinHash) on these
    * hashes equal the same operations on the string shingles up to
    * negligible 64-bit collisions, at a fraction of the cost (no
    * concat_ws allocation per window).
    */
  def shingleHashes(text: Column, n: Int): Column =
    // r8: fused single-pass expression; value parity with
    // [[shingleHashesComposed]] pinned in TextAnalysisSpec
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.ShingleHashes(
        org.apache.spark.sql.GraftPlanBridge.expression(text), n, distinct = false))

  /** `array_distinct(shingleHashes(text, n))` with the distinct folded
    * into the same fused pass (first-occurrence order preserved).
    */
  def shingleHashesDistinct(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.ShingleHashes(
        org.apache.spark.sql.GraftPlanBridge.expression(text), n, distinct = true))

  /** The composed-builtins form of [[shingleHashes]] — value-equal by
    * construction; retained as the spec's differential oracle.
    */
  private[graft] def shingleHashesComposed(text: Column, n: Int): Column = {
    require(n >= 1, s"shingle n must be >= 1, got $n")
    bindOnce(tokens(text), toks =>
      when(size(toks) < n,
        when(size(toks) > 0, array(xxhash64(toks))).otherwise(array().cast("array<bigint>")))
        .otherwise(
          transform(
            sequence(lit(0), size(toks) - n),
            i => xxhash64(slice(toks, i + 1, lit(n))))))
  }

  /** Stopword tables for the n-gram/stopword language-ID heuristic. Tiny,
    * deliberately: the operator's value is the distributed scoring shape
    * (argmax over per-language hit counts), not lexicon coverage.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "para", "en", "que", "con"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "他", "这", "中"))

  /** Language-ID: argmax over per-language stopword hit ratios; "und"
    * (undetermined) when nothing matches. Pure expression — ties broken by
    * language code order for determinism.
    */
  def languageId(text: Column): Column =
    bindOnce(tokens(lower(text)), languageIdFromTokens)

  /** languageId over an already-bound (lower-cased) token array.
    *
    * One hash-map lookup per token (literal `map<string,int>` of stopword →
    * language index) feeding a bound per-language count array — NOT an
    * `isin` filter per language, which would linear-scan every stopword
    * literal per token per language (50 string compares/token; measured
    * 2.2 s vs 0.6 s on 5k docs).
    */
  def languageIdFromTokens(toks: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    // BITMASK values, not single indices: stopwords shared between
    // languages ("la"/"que" live in both fr and es) must credit EVERY
    // language containing them — a plain index map collapses duplicates
    // by last-write-wins and silently strips 2 of one language's 10
    // stopwords
    val lookup = typedlit(
      stopwords.toSeq
        .flatMap { case (lang, ws) => ws.map(_ -> (1 << langs.indexOf(lang))) }
        .groupMapReduce(_._1)(_._2)(_ | _))
    // bindOnce: one map probe per token (literal MapType lookups are
    // linear scans over the entries — probing once per count slot would
    // 5× that cost), then 5 bit tests to bump the matching slots
    val counts = aggregate(
      toks,
      array_repeat(lit(0), langs.size),
      (acc, t) =>
        bindOnce(element_at(lookup, t), mask =>
          zip_with(acc, sequence(lit(0), lit(langs.size - 1)),
            (a, i) => a + when(
              mask.bitwiseAND(call_function("shiftleft", lit(1), i)) =!= 0,
              1).otherwise(0))))
    bindOnce(counts, cs => {
      val scored = array(langs.zipWithIndex.map { case (l, i) =>
        struct(element_at(cs, i + 1).as("hits"), lit(l).as("lang"))
      }: _*)
      val best = array_max(scored) // max by (hits, then lang desc)
      when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
    })
  }

  /** Heuristic quality score in [0,1]: blend of length sanity, lexical
    * diversity, alpha ratio, and mean word length sanity — the standard
    * cheap pre-filter in web-scale corpus cleaning.
    */
  def qualityScore(text: Column): Column =
    bindOnce(tokens(text), toks => qualityScoreFromTokens(text, toks))

  /** qualityScore over an already-bound token array. */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
      val nTok = size(toks).cast("double")
      val nChar = length(text).cast("double")
      val distinctRatio = when(nTok > 0, size(array_distinct(toks)) / nTok).otherwise(0.0)
      val alphaRatio = when(nChar > 0,
        (nChar - length(regexp_replace(text, "[A-Za-z ]", ""))) / nChar).otherwise(0.0)
      val meanWordLen = when(nTok > 0, nChar / nTok).otherwise(lit(0.0))
      val lenScore = least(nTok / 20.0, lit(1.0)) // <20 tokens → penalized
      val wordLenScore = when(meanWordLen.between(2.5, 12.0), 1.0).otherwise(0.5)
      round(lenScore * 0.3 + distinctRatio * 0.3 + alphaRatio * 0.2 + wordLenScore * 0.2, 6)
  }

  /** Corpus-statistics language-model quality score (the CCNet-style
    * filter): per-document mean unigram surprisal, −mean log2 P(token),
    * where P comes from the corpus's own token frequencies. Low scores =
    * text made of common words in typical proportions; high scores =
    * gibberish, boilerplate tails, wrong-language fragments. The standard
    * second-stage quality signal after [[qualityScore]]'s shape
    * heuristics.
    *
    * Two-pass 100 TB shape: pass 1 builds the unigram table (explode →
    * count, one shuffle — or reuse a persisted vocabulary); pass 2 is an
    * explode + equi-join on token + per-doc average (broadcastable when
    * the vocabulary is capped). Returns (idCol…, ppx_bits). Documents
    * with zero tokens are dropped (no distribution to score them under —
    * callers filter those with [[tokenCount]] first).
    */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
    val freq = toks.groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    val total = freq.agg(sum(col("_n")).as("_total"))
    toks.join(freq, "_t")
      .crossJoin(broadcast(total)) // 1-row literal, not a real cross join
      .groupBy(col(idCol))
      .agg((-avg(log2(col("_n").cast("double") / col("_total").cast("double"))))
        .as("ppx_bits"))
  }

  /** Deterministic document fingerprint: 64-bit rolling hash over the token
    * stream (order-sensitive, whitespace-insensitive) via chained xxhash64 —
    * hash mixing instead of polynomial multiply, so ANSI overflow semantics
    * never trip. Equal fingerprints ⇔ equal token streams (mod collisions).
    */
  def fingerprint(text: Column): Column = fingerprintFromTokens(tokens(text))

  /** fingerprint over an already-bound token array — single definition of
    * the hash chain, shared with [[annotate]] (a drifted duplicate would
    * desynchronize dedup joins mixing the two forms).
    */
  def fingerprintFromTokens(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => xxhash64(acc, t))

  /** PII redaction patterns: email, card-shaped digit groups, phone
    * numbers (international `+...` or NANP 3-3-4 with separators), IPv4.
    * Precision over recall, deliberately: a looser digit-run pattern
    * (e.g. "any 9+ chars of digits/spaces/dashes") would scrub ISO dates
    * ("2024-01-01 00:30") and numeric ranges out of training text — worse
    * than missing an unusually-formatted phone. Order matters: the card
    * patterns run before phones (a grouped card is also phone-shaped),
    * and nothing here matches bare 4-2-2 date groups.
    */
  // (?<![0-9-]) / (?![0-9-]) boundary guards keep matches from starting
  // or ending inside a longer digit/dash run — without them a numeric
  // range followed by a 4-digit number ("100-200 3000-4000") matches the
  // NANP shape, and partial redactions split ids. The international
  // pattern bounds its separator run so an adjacent date can't be
  // absorbed.
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "(?<![0-9-])(?:[0-9]{4}[ -]){3}[0-9]{4}(?![0-9-])" -> "<NUMBER>", // grouped 16-digit card
    "(?<![0-9-])[0-9]{13,19}(?![0-9-])" -> "<NUMBER>",                // contiguous card/id run
    "\\+[0-9][0-9 ()-]{6,14}[0-9](?![0-9-])" -> "<PHONE>",            // international, + required
    "(?<![0-9-])\\(?[0-9]{3}\\)?[ -][0-9]{3}[ -][0-9]{4}(?![0-9-])" -> "<PHONE>", // NANP 3-3-4
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>")

  /** Redact PII-shaped spans with typed placeholders — the standard
    * corpus-cleaning pass before training. One chained regexp_replace per
    * pattern, all inside one projection: per-row, no shuffle, no UDF.
    */
  def redact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Term frequencies: (term, n) per document id — explode + count, the
    * shuffle-on-(id,term) shape that scales linearly.
    */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus-wide top-k terms by document frequency. */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(array_distinct(tokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(k)

  /** Split documents into overlapping token-window chunks — the standard
    * pre-embedding step in RAG/training pipelines. One row per chunk:
    * (idCol…, chunk_idx, chunk_text, chunk_tokens). Stride =
    * chunkTokens - overlap; the last window keeps its tail remainder.
    * Pure explode of a per-row computed array — no shuffle, linear scale.
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 128, overlap: Int = 32): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    val chunks = bindOnce(tokens(col(textCol)), toks => {
      val nChunks = greatest(ceil((size(toks) - overlap).cast("double") / stride), lit(1))
      // empty/whitespace-only docs yield zero chunks, not one phantom
      // empty chunk
      when(size(toks) === 0, array().cast("array<struct<chunk_idx:int,chunk_text:string,chunk_tokens:int>>"))
        .otherwise(transform(
          sequence(lit(0), (nChunks - 1).cast("int")),
          i => struct(
            i.cast("int").as("chunk_idx"),
            concat_ws(" ", slice(toks, i * stride + 1, lit(chunkTokens))).as("chunk_text"),
            least(size(toks) - i * stride, lit(chunkTokens)).cast("int").as("chunk_tokens"))))
    })
    df.select(col(idCol), explode(chunks).as("_c"))
      .select(col(idCol), col("_c.chunk_idx"), col("_c.chunk_text"), col("_c.chunk_tokens"))
  }

  /** TF-IDF per (doc, term): tf × ln((N+1)/(df+1)) + 1-smoothed. Two
    * aggregations (term frequency per doc, document frequency per term) and
    * a broadcast-able join on term — the linear-scaling shape.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count() // corpus size: one job, a long on the driver (not data)
    val tf = termFrequencies(df, idCol, textCol)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("_df"))
    tf.join(dfreq, "term")
      .withColumn("tfidf",
        col("tf") * (log((lit(n) + 1.0) / (col("_df") + 1.0)) + 1.0))
      .select(col(idCol), col("term"), col("tf"), col("tfidf"))
  }

  /** Full per-document annotation: all five text-analysis columns from
    * ONE fused byte pass over the text — the native
    * [[graft.functions.AnnotateText]] expression (whole-stage codegen,
    * zero regex passes, no per-column re-derivation). Single narrow
    * projection, no shuffle. Bit-for-bit parity with
    * [[annotateComposable]] is pinned in TextAnalysisSpec.
    */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.AnnotateText.register(df.sparkSession)
    val ann = graft.functions.AnnotateText.annotateText(col(textCol))
    // explode(array(struct)) routes the struct through a Generate node so
    // `_ann` is a bound attribute downstream — without it CollapseProject
    // copies the whole fused expression into each of the 5 field
    // extractions (5× the pass; same reason as the composable form)
    df.select(df.columns.map(col) :+ explode(array(ann)).as("_ann"): _*)
      .select(df.columns.map(col) ++ Seq(
        col("_ann.n_tokens").as("n_tokens"),
        col("_ann.n_subwords").as("n_subwords"),
        col("_ann.lang_id").as("lang_id"),
        col("_ann.quality").as("quality"),
        col("_ann.fingerprint").as("fingerprint")): _*)
  }

  /** The composable-builtins form of [[annotate]]: one tokenization pass
    * (`bindOnce`) feeding per-column derived expressions. Kept as the
    * executable specification the fused native expression is pinned
    * against — and as the fallback if the annotation set is extended
    * faster than the native expression.
    */
  def annotateComposable(df: DataFrame, textCol: String): DataFrame = {
    // native lang_id: one hash probe per token (the composable literal-map
    // form linear-scans all stopword entries per token — the dominant cost
    // of this operator); lowercasing happens inside the expression's loop,
    // so no second token array is allocated. Parity pinned in
    // TextAnalysisSpec.
    graft.functions.LanguageId.register(df.sparkSession)
    val t = col(textCol)
    val ann = bindOnce(tokens(t), toks => struct(
      size(toks).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      graft.functions.LanguageId.langId(toks).as("lang_id"),
      qualityScoreFromTokens(t, toks).as("quality"),
      fingerprintFromTokens(toks).as("fingerprint")))
    // explode(array(struct)) routes the struct through a Generate node,
    // making `_ann` a bound attribute downstream — field extraction is then
    // free. A plain projected struct would be re-inlined into each of the
    // 5 field extractions by CollapseProject (5× the whole computation;
    // SimplifyExtractValueOps cannot see through bindOnce's element_at).
    df.select(df.columns.map(col) :+ explode(array(ann)).as("_ann"): _*)
      .select(df.columns.map(col) ++ Seq(
        col("_ann.n_tokens").as("n_tokens"),
        col("_ann.n_subwords").as("n_subwords"),
        col("_ann.lang_id").as("lang_id"),
        col("_ann.quality").as("quality"),
        col("_ann.fingerprint").as("fingerprint")): _*)
  }

  /** Train/eval n-gram CONTAMINATION audit — the standard benchmark-
    * leakage check of LLM training pipelines: for each eval document,
    * how many of its distinct token n-grams also occur anywhere in the
    * training corpus. Returns one row per eval doc:
    * (idCol, n_grams, n_contaminated, frac) with frac = contaminated /
    * distinct grams (0.0 for docs shorter than n tokens).
    *
    * Scale shape (train is the 100 TB side, eval the benchmark — MB to
    * GB): eval's distinct gram set aggregates to a Bloom filter (one
    * tiny partial+final agg, few-MB sketch in the task closure); train
    * explodes its grams but drops everything outside the Bloom AT THE
    * MAP, so the shuffle carries ≈ |matching grams| + fpp·|train grams|
    * rows instead of the whole exploded corpus — and what it carries is
    * a 16-byte DOUBLE 64-bit hash pair per gram, not the ~n·word gram
    * text (the [[Dedup.exactKeepMinId]] identity standard: two
    * independently-seeded xxhash64 values; a false equality needs a
    * simultaneous 128-bit collision). The semi-join on that pair removes
    * Bloom false positives; the matched set (≤ |eval grams|) broadcasts
    * back into the per-doc count join, where the gram STRING never left
    * the eval side.
    */
  def ngramContamination(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 13,
      expectedEvalGrams: Long = 10000000L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // distinct grams per eval doc; docs with < n tokens contribute none
    // (shingles() emits a single short-text gram — excluded here, the
    // audit contract is "windows of exactly n tokens").
    //
    // Gram identity is the 128-bit hash pair of the PER-TOKEN-HASH
    // window (salt FIRST on h2 — see exactKeepMinId on why
    // hash(salt, w) is an independent second hash and hash(w, salt) is
    // not). r15: the n-token gram STRING is never materialized — at
    // 100× the concat_ws of ~25 M 13-grams (≈ 90 B of string each, both
    // sides) dominated the face (23.9 s); hashing a slice of the
    // precomputed token-hash array is fixed-width arithmetic (the full
    // face measured 2.6× off, same results: matching was ALREADY by
    // hash pair, only the hash input changed representation).
    def h1(w: Column): Column = xxhash64(w)
    def h2(w: Column): Column = xxhash64(lit(1), w)
    def gramHashes(t: Column): Column =
      bindOnce(transform(t, tok => xxhash64(tok)), th =>
        transform(sequence(lit(0), size(t) - n), i =>
          bindOnce(slice(th, i + 1, lit(n)),
            w => struct(h1(w).as("_ct_h1"), h2(w).as("_ct_h2")))))
    val evalGrams = eval
      .select(col(idCol).as("_ct_id"), tokens(col(textCol)).as("_ct_t"))
      .filter(size(col("_ct_t")) >= n)
      .select(col("_ct_id"),
        explode(array_distinct(gramHashes(col("_ct_t")))).as("_ct_hs"))
      .select(col("_ct_id"), col("_ct_hs._ct_h1").as("_ct_h1"),
        col("_ct_hs._ct_h2").as("_ct_h2"))
    val rawTrainGrams = train
      .select(tokens(col(textCol)).as("_ct_t"))
      .filter(size(col("_ct_t")) >= n)
      .select(explode(gramHashes(col("_ct_t"))).as("_ct_hs"))
      .select(col("_ct_hs._ct_h1").as("_ct_h1"),
        col("_ct_hs._ct_h2").as("_ct_h2"))
    // Small training corpora (optimizer estimate, no job — the Dedup
    // small/big seam) skip the Bloom prefilter: the sketch exists to
    // keep a 100 TB side's exploded grams out of the shuffle, and its
    // eagerly-collected build job costs more than it saves below the
    // threshold. Exactness unaffected — the semi-join is the same.
    // r15: the gate compares the SCAN estimate against 1/16 of the
    // barrier threshold, not the threshold itself — the quantity that
    // hits the shuffle is the EXPLODED gram stream (≈ tokens × 16-byte
    // hash pairs, an order of magnitude over the compressed scan
    // bytes the optimizer sees; the 100× corpus scans at 69 MB
    // "small" yet explodes to 25 M-gram / 400 MB exchanges, and the
    // ungated face measured 24.7 s vs 13.4 s bloomed). Unit-scale
    // corpora (KB–low-MB) still skip the eager sketch job.
    val trainSmall = train.queryExecution.optimizedPlan.stats.sizeInBytes <
      (Dedup.barrierThresholdBytes >> 4)
    val trainHashes =
      if (trainSmall) rawTrainGrams
      else {
        // empty eval gram set (all eval docs shorter than n): Spark's
        // bloomFilter agg yields a null sketch — every output row is zeros
        val bloom =
          try evalGrams.stat.bloomFilter("_ct_h1", expectedEvalGrams, 0.01)
          catch { case _: NullPointerException =>
            return eval.select(col(idCol), lit(0L).as("n_grams"),
              lit(0L).as("n_contaminated"), lit(0.0).as("frac")) }
        // prefilter on h1 alone (a long — cheapest possible sketch);
        // the exact match below is still the full (h1, h2) pair
        rawTrainGrams.filter(
          graft.functions.BloomMightContain.mightContain(col("_ct_h1"), bloom))
      }
    // matched grams: ≤ |eval gram set| rows — broadcastable by construction
    val matched = evalGrams.select(col("_ct_h1"), col("_ct_h2")).distinct()
      .join(trainHashes, Seq("_ct_h1", "_ct_h2"), "left_semi")
    val perDoc = evalGrams
      .join(broadcast(matched.withColumn("_ct_hit", lit(1))),
        Seq("_ct_h1", "_ct_h2"), "left")
      .groupBy(col("_ct_id"))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("_ct_hit")), lit(0L)).as("n_contaminated"))
    // every eval doc appears, including short/gram-free ones
    eval.select(col(idCol).as("_ct_id"))
      .join(perDoc, Seq("_ct_id"), "left")
      .select(col("_ct_id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_contaminated").cast("double") / col("n_grams"))
          .as("frac"))
  }

  /** Token-level blocklist screening (the safety-filter pass of a crawl
    * pipeline): per document, the count and ratio of tokens that appear
    * in `blocklist`, plus the keep/drop decision at `maxRatio`.
    *
    * Scale shape: the blocklist folds into the plan as a LITERAL array —
    * `array_contains` over a broadcast-free constant, evaluated inside
    * whole-stage codegen. The whole operator is map-only: no shuffle, no
    * join, no UDF; at 100 TB it is one scan at I/O speed. For blocklists
    * too large to inline (>~10⁴ terms) switch to an exploded-token
    * broadcast semi-join — same results, one extra map-side hash probe.
    */
  def blocklistStats(
      df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String], maxRatio: Double): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must be non-empty")
    val bl = array(blocklist.map(lit): _*)
    val toks = tokens(col(textCol))
    df.select(col(idCol),
        size(toks).cast("long").as("n_tok"),
        size(filter(toks, t => array_contains(bl, t))).cast("long").as("n_hits"))
      .withColumn("hit_ratio",
        when(col("n_tok") === 0, lit(0.0))
          .otherwise(col("n_hits").cast("double") / col("n_tok")))
      .withColumn("keep", col("hit_ratio") <= maxRatio)
  }
}
