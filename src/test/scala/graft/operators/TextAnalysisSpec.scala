package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("dummy").select(c).head.get(0)

  test("tokens: whitespace split, empty + leading-space normalization") {
    val df = Seq("a b  c", "  lead space", "", "solo").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 2, 0, 1))
  }

  test("tokens: native WhitespaceTokens ≡ filter(split(\\s+), length>0), incl. interpreted path") {
    // every separator, runs, leading/trailing, unicode (non-ASCII spaces
    // like   are NOT Java-regex \s — must stay inside tokens), null
    val samples = Seq(
      "a b  c", "  lead", "trail  ", "\t\n\f\r mix\td one\n",
      "", "   ", "solo", "a b c", "héllo wörld   em",
      "x\rty\n\nz", "многа слов 多字 \t end", null)
    val df = samples.toDF("t").select(
      TextAnalysis.tokens(col("t")).as("fast"),
      filter(split(col("t"), "\\s+"), x => length(x) > 0).as("ref"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // interpreted (non-codegen) eval path agrees too
    import org.apache.spark.unsafe.types.UTF8String
    samples.filter(_ != null).foreach { s =>
      val got = graft.functions.WhitespaceTokens.split(UTF8String.fromString(s))
      val want = s.split("\\s+").filter(_.nonEmpty).toSeq
      assert((0 until got.numElements()).map(got.getUTF8String(_).toString) == want)
    }
  }

  test("shingleHashes: fused expression ≡ composed HOF form, value-exact incl. short-text fallback") {
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b",      // duplicate windows (distinct-order matters)
      "one two",              // < n: whole-text fallback, ONE hash
      "solo",                 // 1 token: fallback
      "", "   ",              // empty after tokenization → []
      "  padded \t doc\nwith runs ", "многа слов 多字 mixed here")
    val df = samples.toDF("t").select(
      TextAnalysis.shingleHashes(col("t"), 3).as("fused"),
      TextAnalysis.shingleHashesComposed(col("t"), 3).as("ref"),
      TextAnalysis.shingleHashesDistinct(col("t"), 3).as("fusedD"),
      array_distinct(TextAnalysis.shingleHashesComposed(col("t"), 3)).as("refD"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
    // interpreted path
    import org.apache.spark.unsafe.types.UTF8String
    val got = graft.functions.ShingleHashes.compute(
      UTF8String.fromString("a b a b a b"), 3, distinct = false)
    val ref = Seq("a b a b a b").toDF("t")
      .select(TextAnalysis.shingleHashesComposed(col("t"), 3)).head.getSeq[Long](0)
    assert((0 until got.numElements()).map(got.getLong) == ref)
  }

  test("ngramFingerprints: fused expression ≡ composed HOF form, value-exact") {
    // real-ish prose, duplicates (distinct-order matters), short docs
    // (< n tokens), whitespace runs, unicode, null
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "a b a b a b a b a b a b", "one two three", "one two",
      "  padded   doc with   runs\tand\ntabs  ", "",
      "многа слов 多字 mixed script tokens here", null)
    val df = samples.toDF("t").select(
      TextAnalysis.ngramFingerprints(col("t"), 3).as("fused"),
      TextAnalysis.ngramFingerprintsComposed(TextAnalysis.tokens(col("t")), 3).as("ref"))
    df.collect().foreach { r =>
      if (r.isNullAt(0)) assert(r.getSeq[Long](1).isEmpty)
      // fused: null → null; composed: null → [] through bindOnce's
      // array-wrap. Equivalent under explode (zero rows either way).
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // interpreted path too
    import org.apache.spark.unsafe.types.UTF8String
    val one = graft.functions.NgramFingerprints.compute(
      UTF8String.fromString("a b a b a b"), 3)
    val ref = samples.take(0) // (composed value fetched via Spark below)
    val viaSpark = Seq("a b a b a b").toDF("t")
      .select(TextAnalysis.ngramFingerprintsComposed(TextAnalysis.tokens(col("t")), 3))
      .head.getSeq[Long](0)
    assert((0 until one.numElements()).map(one.getLong) == viaSpark)
  }

  test("shingles: n-grams over tokens; short docs fall back to whole text") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s")).as[Seq[String]].head
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s")).as[Seq[String]].head
    assert(short == Seq("a b"))
  }

  test("repetitionFraction: duplicate trigram share; degenerate docs pinned") {
    val rep = Seq(
      "a b c a b c a b c", // 7 trigram windows, 3 distinct → 4/7
      "w x y z",           // no repetition → 0
      "a b",               // < n tokens: one whole-text shingle → 0
      ""                   // empty → 0 (guarded, not NaN)
    ).toDF("t").select(TextAnalysis.repetitionFraction(col("t"), 3).as("r"))
      .as[Double].collect().toSeq
    assert(math.abs(rep.head - 4.0 / 7.0) < 1e-12)
    assert(rep.tail == Seq(0.0, 0.0, 0.0))
    // a degenerate generation ("the the the ...") scores ~1
    val loop = Seq(Seq.fill(50)("the").mkString(" ")).toDF("t")
      .select(TextAnalysis.repetitionFraction(col("t"), 3).as("r")).as[Double].head
    assert(loop > 0.97)
  }

  test("languageId: stopword heuristic on hand-made samples") {
    val samples = Seq(
      ("the cat and the dog is in a house", "en"),
      ("der hund und die katze ist nicht ein vogel", "de"),
      ("le chat est dans la maison pour les amis", "fr"),
      ("el gato es una mascota para la casa", "es"),
      ("xyzzy qwerty plugh", "und"))
    val got = samples.map(_._1).toDF("t")
      .select(TextAnalysis.languageId(col("t"))).as[String].collect().toSeq
    assert(got == samples.map(_._2))
  }

  test("redact replaces PII-shaped spans with typed placeholders") {
    val got = Seq(
      "mail me at jane.doe+x@example.co.uk today",
      "call +44 20 7946 0958 or 415-555-0199",
      "server at 192.168.0.1 responded",
      "card 4111 1111 1111 1111 declined",
      "id 4111111111111111 too",
      "nothing sensitive here 42",
      "Published 2024-01-01 00:30, pages 100-200", // dates must SURVIVE
      "see 100-200 3000-4000 onwards",  // range + 4-digit: NOT phone-shaped
      "+44 20 7946 0958 then 2024-01-01 x", // phone redacted, date SURVIVES
      "ref 99123-456-7890x")            // inside a longer run: untouched
      .toDF("t").select(TextAnalysis.redact(col("t"))).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today", got(0))
    assert(got(1) == "call <PHONE> or <PHONE>", got(1))
    assert(got(2) == "server at <IP> responded", got(2))
    assert(got(3) == "card <NUMBER> declined", got(3))
    assert(got(4) == "id <NUMBER> too", got(4))
    assert(got(5) == "nothing sensitive here 42", got(5))
    assert(got(6) == "Published 2024-01-01 00:30, pages 100-200", got(6))
    assert(got(7) == "see 100-200 3000-4000 onwards", got(7))
    assert(got(8) == "<PHONE> then 2024-01-01 x", got(8))
    assert(got(9) == "ref 99123-456-7890x", got(9))
  }

  test("shared stopwords credit every language containing them") {
    // "la" and "que" are in BOTH fr and es lexicons; an index-valued
    // lookup collapsed them to one language (last-write-wins), silently
    // stripping 2 of one language's 10 stopwords. A text of only shared
    // words must tie fr/es (argmax tie-break → larger code: "fr"), and
    // one extra es-only word must tip it to "es".
    graft.functions.LanguageId.register(spark)
    val got = Seq(
      "la que la que",          // all shared → tie → "fr" (larger code)
      "la que los la que")      // + es-only "los" → "es"
      .toDF("t")
      .select(
        TextAnalysis.languageId(col("t")).as("c"),
        graft.functions.LanguageId.langId(TextAnalysis.tokens(col("t"))).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) == ("fr", "fr"), got(0).toString)
    assert(got(1) == ("es", "es"), got(1).toString)
  }

  test("native lang_id matches the composable languageId on the documents table") {
    graft.functions.LanguageId.register(spark)
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = docs.select(
      col("doc_id"),
      TextAnalysis.languageId(col("text")).as("composable"),
      graft.functions.LanguageId.langId(TextAnalysis.tokens(col("text"))).as("native"))
      .collect()
    val bad = both.filter(r => r.getString(1) != r.getString(2))
    assert(bad.isEmpty, bad.take(5).mkString("; "))
    // and on the hand-made tie/empty cases
    val edge = Seq("", "   ", "the der le el 的", "xyzzy qwerty").toDF("t")
    val pairs = edge.select(
      TextAnalysis.languageId(col("t")).as("c"),
      graft.functions.LanguageId.langId(TextAnalysis.tokens(col("t"))).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.forall { case (c, n) => c == n }, pairs.mkString("; "))
  }

  test("fingerprint: whitespace-insensitive, order-sensitive") {
    assert(one(TextAnalysis.fingerprint(lit("a b c"))) ==
      one(TextAnalysis.fingerprint(lit("  a  b   c "))))
    assert(one(TextAnalysis.fingerprint(lit("a b c"))) !=
      one(TextAnalysis.fingerprint(lit("c b a"))))
  }

  test("qualityScore stays in [0,1]; longer diverse text scores higher") {
    val junk = one(TextAnalysis.qualityScore(lit("x x x x"))).asInstanceOf[Double]
    val good = one(TextAnalysis.qualityScore(
      lit("the quick brown fox jumps over a lazy dog near the quiet river bank today with friends and sunshine all around"))).asInstanceOf[Double]
    assert(junk >= 0.0 && junk <= 1.0 && good >= 0.0 && good <= 1.0)
    assert(good > junk)
  }

  test("termFrequencies and topTerms on a tiny corpus") {
    val df = Seq((1L, "a b a"), (2L, "b c")).toDF("id", "t")
    val tf = TextAnalysis.termFrequencies(df, "id", "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tf == Set((1L, "a", 2L), (1L, "b", 1L), (2L, "b", 1L), (2L, "c", 1L)))
    val top = TextAnalysis.topTerms(df, "t", 1).collect().head
    assert(top.getString(0) == "b" && top.getLong(1) == 2L) // b appears in both docs
  }

  test("unigramSurprisal: common-word docs score lower than rare-word docs") {
    // corpus where "the cat sat" words dominate; doc 3 is made of hapaxes
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "zyx qwv jkp"),
      (4L, "the the the"),
      (5L, "   ")) // zero tokens → no row
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(5L))
    // hapax-only doc carries maximal surprisal; the all-"the" doc minimal
    assert(got(3L) > got(1L) && got(3L) > got(2L))
    assert(got(4L) < got(2L))
    // hand-check doc 4: P(the) = 6/15 → surprisal = -log2(6/15) for every token
    assert(math.abs(got(4L) - (-math.log(6.0 / 15) / math.log(2))) < 1e-12)
  }

  test("annotate runs one-pass on the documents table") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ann = TextAnalysis.annotate(docs, "text")
    assert(ann.columns.toSet.intersect(
      Set("n_tokens", "n_subwords", "lang_id", "quality", "fingerprint")).size == 5)
    val row = ann.filter(col("n_tokens") > 0).head
    assert(row.getAs[Int]("n_tokens") > 0)
  }

  test("fused native annotate == composable form, bit-for-bit, corpus + adversarial rows") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // adversarial shapes the corpus may not cover: empty, whitespace-only,
    // mixed scripts, non-ASCII "other" runs, long alpha/digit runs, every
    // ASCII whitespace flavor, stopword ties across languages
    val weird = Seq(
      (9001L, ""), (9002L, "   \t\n\f\r  "),
      (9003L, "the la que des los y con für über 你好 的 是"),
      (9004L, "abcdefghijklmnop 1234567890 !!!###$$$ mix3d-t0kens"),
      (9005L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (9006L, "café naïve – em—dash … ellipsis 🙂 emoji"),
      (9007L, "der der der die die das und ist nicht ein"),
      (9008L, "  leading and trailing  "),
      (9009L, " nbsp is not ascii ws"),
      (9010L, "ThE QuIcK bRoWn FoX 123abc456"))
      .toDF("doc_id", "text")
    val input = docs.unionByName(weird)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_tokens", "n_subwords", "lang_id", "quality", "fingerprint")
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getInt(2), r.getString(3), r.getDouble(4), r.getLong(5))).toMap
    val fused = rows(TextAnalysis.annotate(input, "text"))
    val composable = rows(TextAnalysis.annotateComposable(input, "text"))
    assert(fused.size == composable.size)
    for ((id, c) <- composable)
      assert(fused(id) == c, s"doc $id: fused ${fused(id)} != composable $c")

    // the interpreted (non-codegen) path agrees with codegen
    val expr = graft.functions.AnnotateText(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("the quick 123 ... fox"),
        org.apache.spark.sql.types.StringType))
    val interp = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val viaDf = rows(TextAnalysis.annotate(
      Seq((1L, "the quick 123 ... fox")).toDF("doc_id", "text"), "text"))(1L)
    assert((interp.getInt(0), interp.getInt(1), interp.getUTF8String(2).toString,
      interp.getDouble(3), interp.getLong(4)) == viaDf)
  }

  test("ngramContamination: hand-computed overlap, short docs, bloom-invisible exactness") {
    val train = Seq(
      (1L, "a b c d e f"),         // grams(3): "a b c" "b c d" "c d e" "d e f"
      (2L, "x y z w")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "a b c d q"),          // "a b c"(hit) "b c d"(hit) "c d q"(miss)
      (11L, "q r s"),              // "q r s"(miss)
      (12L, "x y"),                // < 3 tokens: 0 grams
      (13L, "b c d e f g")).toDF("doc_id", "text") // hits: "b c d","c d e","d e f"; miss "e f g"
    def run(): Map[Long, (Long, Long, Double)] =
      TextAnalysis.ngramContamination(train, eval, "doc_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val out = run()
    assert(out(10L) == ((3L, 2L, 2.0 / 3)))
    assert(out(11L) == ((1L, 0L, 0.0)))
    assert(out(12L) == ((0L, 0L, 0.0)))
    assert(out(13L) == ((4L, 3L, 0.75)))
    // big-path parity: force the Bloom-prefiltered shape on the same data
    val saved = Dedup.barrierThresholdBytes
    val viaBloom = try { Dedup.barrierThresholdBytes = 0L; run() }
      finally Dedup.barrierThresholdBytes = saved
    assert(viaBloom == out)
    // duplicate grams inside one eval doc count once (distinct contract):
    // windows are "a b c","b c a","c a b","a b c" → 3 distinct, 1 hit
    val rep = Seq((20L, "a b c a b c")).toDF("doc_id", "text")
    val o2 = TextAnalysis.ngramContamination(train, rep, "doc_id", "text", n = 3)
      .collect().head
    assert(o2.getLong(1) == 3 && o2.getLong(2) == 1)
  }

  test("blocklistStats: token-exact hits, ratio, and keep threshold") {
    val df = Seq(
      (0L, "good words only here"),         // 0 hits → keep
      (1L, "bad bad good"),                 // 2/3 hits → drop at 0.5
      (2L, "badge embedded bad"),           // substrings don't count: 1/3
      (3L, "")                              // empty: ratio 0, keep
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistStats(df, "doc_id", "text",
        Seq("bad", "worse"), maxRatio = 0.5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(out(0) == ((0L, 4L, 0L, true)))
    assert(out(1) == ((1L, 3L, 2L, false)))
    assert(out(2) == ((2L, 3L, 1L, true)))
    assert(out(3) == ((3L, 0L, 0L, true)))
  }

  test("blocklistStats rejects an empty blocklist") {
    val df = Seq((0L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistStats(df, "doc_id", "text", Nil, 0.5)
    }
  }
}
