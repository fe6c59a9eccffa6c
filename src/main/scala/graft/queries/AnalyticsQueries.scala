package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Analytics

/** Round-6 analytics slate (q122+): time-decayed features, data
  * profiling, privacy audits, robust statistics, n-gram LM counts, and
  * contrastive mining over embeddings — each dual-engine (DuckDB
  * oracle), each built on [[graft.operators.Analytics]].
  *
  * Float discipline (SURVEY §6): q122 sums ≤ n ≈ 40 identical-per-term
  * doubles (round 4, guard band >10³); q123/q126 convert 2-decimal money
  * to exact integer cents so every sum and boundary predicate is integer
  * arithmetic; q127's percentile interpolation is the q92 discipline
  * (round 6); q128/q129 divisions/cosines are identical-operand
  * single-op doubles (round 6).
  */
object AnalyticsQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** q122 — per-customer EWMA (α = 0.3) of order totals over order
    * history ([[Analytics.ewmaLast]]): the time-decayed activity feature.
    * One window + one reusing groupBy, both on the high-cardinality
    * customer key.
    */
  def q122Ewma(spark: SparkSession, dir: String): DataFrame =
    Analytics.ewmaLast(
        Tables.load(spark, dir, "orders").filter(col("o_custkey") % 7 === 0),
        "o_custkey", Seq("o_orderdate", "o_orderkey"), "o_totalprice",
        alpha = 0.3)
      // round IN DECIMAL, cast to double last (ewmaLast's midpoint note)
      .select(col("o_custkey"), col("n"),
        round(col("ewma"), 4).cast("double").as("ewma"))
      .orderBy(col("o_custkey"))

  /** q123 — exact column profile of the lineitem measures
    * ([[Analytics.columnProfile]]): the data-contract primitive. Money
    * columns profile in exact integer cents (see the operator's cents
    * variant below) so the mean is reproducible cross-engine.
    */
  val q123Cols: Seq[String] = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  def q123Profile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    // cents view: every profiled column is an exact 2-decimal double
    // (FIXTURES §3), so ×100 + round is an exact integer re-encoding and
    // the profile's sums/avgs are integer-exact on both engines.
    val cents = li.select(q123Cols.map(c =>
      round(col(c) * 100, 0).cast("long").as(c)): _*)
    Analytics.columnProfile(cents, q123Cols)
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        (col("min_v") / 100.0).as("min_v"), (col("max_v") / 100.0).as("max_v"),
        round(col("avg_v") / 100.0, 6).as("avg_v"))
      .orderBy(col("column"))
  }

  /** q124 — running COUNT(DISTINCT priority) per customer over order
    * history ([[Analytics.runningDistinct]]): cumulative-cardinality
    * feature, exact without distinct-over-window support.
    */
  def q124RunningDistinct(spark: SparkSession, dir: String): DataFrame =
    Analytics.runningDistinct(
        Tables.load(spark, dir, "orders").filter(col("o_custkey") % 17 === 0)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
        "o_custkey", Seq("o_orderdate", "o_orderkey"), "o_orderpriority")
      .select(col("o_custkey"), col("o_orderkey"), col("rd"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  /** q125 — k-anonymity audit (k = 5) of customer quasi-identifiers
    * (nation, market segment, account-balance millibucket)
    * ([[Analytics.kAnonymityRisk]]): the re-identification risk listing.
    */
  def q125KAnonymity(spark: SparkSession, dir: String): DataFrame =
    Analytics.kAnonymityRisk(
        Tables.load(spark, dir, "customer"),
        Seq(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long")),
        Seq("nat", "seg", "bal_bucket"), k = 5)
      .orderBy(col("nat"), col("seg"), col("bal_bucket"))

  /** q126 — exact weighted median of quantity weighted by extended price
    * in integer cents ([[Analytics.weightedMedian]]): aggregate-first
    * histogram shape — the window scans |groups|·50 rows, never 600k.
    */
  def q126WeightedMedian(spark: SparkSession, dir: String): DataFrame =
    Analytics.weightedMedian(
        Tables.load(spark, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), "l_quantity",
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q127 — median/MAD robust outlier screen on order totals per
    * priority ([[Analytics.madOutlierStats]], cutoff 3.0 robust
    * z-scores).
    */
  def q127MadOutliers(spark: SparkSession, dir: String): DataFrame =
    Analytics.madOutlierStats(
        Tables.load(spark, dir, "orders"), "o_orderpriority",
        "o_totalprice", cutoff = 3.0)
      .orderBy(col("o_orderpriority"))

  /** q128 — top-3 bigram language-model counts per source with
    * conditional probability ([[Analytics.bigramConditionalTop]]):
    * KenLM-style n-gram table, bigrams built map-side.
    */
  def q128BigramLm(spark: SparkSession, dir: String): DataFrame =
    Analytics.bigramConditionalTop(docs(spark, dir), "source", "text", k = 3)
      .select(col("source"), col("w1"), col("w2"), col("cnt"),
        col("cond_p"), col("rank").cast("long").as("rank"))
      .orderBy(col("source"), col("rank"))

  /** q129 — contrastive hard-negative mining over embeddings
    * ([[Analytics.hardNegatives]]): for each probe (vec_id % 29 = 0) the
    * most-similar vector with a different label, argmax as a map-side
    * combinable struct-max aggregate.
    */
  def q129HardNegatives(spark: SparkSession, dir: String): DataFrame =
    Analytics.hardNegatives(emb(spark, dir), "vec_id", "embedding", "label",
        col("vec_id") % 29 === 0)
      .orderBy(col("query_id"))

  /** q130 — SemDeDup-style embedding pruning at cosine ≥ 0.4
    * ([[Analytics.semDedupKeep]]): survivors after dropping every vector
    * with a smaller-id near-neighbor (exact all-pairs baseline; the LSH
    * candidate path is the scale analogue).
    */
  def q130SemDedup(spark: SparkSession, dir: String): DataFrame =
    Analytics.semDedupKeep(emb(spark, dir), "vec_id", "embedding", tau = 0.4)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))

  /** q130b — SemDeDup survivors via the DECLARED SCALE PATH: candidate
    * pairs from banded random-hyperplane LSH + exact-cosine verification
    * ([[graft.operators.Dedup.embeddingDedup]]), keep rule = drop the
    * larger id of every verified pair — the same greedy min-id-wins rule
    * as q130, with candidate generation swapped from exact all-pairs to
    * equi-join-only banding (r6 verdict item 3). Oracled on the q72
    * planted construction (jittered near-copies at cosine ≈ 0.99999,
    * reversed decoys ≤ 0.513) so the oracle's exhaustive NOT EXISTS is
    * exact while the wide margin makes the 8×8-band recall loss
    * probability ~1e−16 per planted pair — a hash mismatch would mean a
    * genuinely dropped duplicate, which is the property under test.
    */
  def q130bSemDedupLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val jit = e.filter(col("vec_id") % 5 === 0).select(
      (col("vec_id") + 100000000L).as("vec_id"),
      transform(col("v"),
        (x, i) => x * (lit(1.0) + lit(0.002) * (i % 7 - 3))).as("v"))
    val dec = e.filter(col("vec_id") % 7 === 3).select(
      (col("vec_id") + 200000000L).as("vec_id"), reverse(col("v")).as("v"))
    val corpus = e.unionByName(jit).unionByName(dec)
    // r8: the R7ScaleBench plane-sizing rule ENCODED, not just
    // documented — signature bits must grow with log2(N) or the 2^planes
    // buckets saturate and candidate pairs go quadratic (measured: the
    // static 8 planes cost 14.1 s at 10× data; log-sized planes restore
    // ~linear candidate volume). The count is a metadata-cheap bounded
    // driver scalar; recall at the planted cos≈0.99999 margin stays
    // ≈1 − (1 − 0.99955^planes)^8 ≈ 1 − 1e−16 even at 16 planes.
    val n = corpus.count()
    val planes = math.max(8,
      math.ceil(math.log(math.max(n / 8.0, 2.0)) / math.log(2.0)).toInt)
    graft.operators.Dedup.embeddingDedup(
        corpus, "vec_id", "v", bands = 8, planesPerBand = planes,
        threshold = 0.95, dim = 64)
      .select(col("vec_id")).orderBy(col("vec_id"))
  }

  /** q142 — Population Stability Index of the order-price distribution
    * between pre-1997 and 1997+ orders ([[Analytics.populationStability]],
    * 20 fixed bins over [0, 600k)): the snapshot-drift monitor. The
    * contribution formula (p−q)·ln(p/q) over Laplace-smoothed bin
    * probabilities is a closed-form double expression over exact integer
    * counts — rounded at 6 on both engines.
    */
  def q142Psi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    Analytics.populationStability(
        o.filter(col("o_orderdate") < lit("1997-01-01")),
        o.filter(col("o_orderdate") >= lit("1997-01-01")),
        "o_totalprice", lo = 0.0, hi = 600000.0, buckets = 20)
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("contrib"), 6).as("contrib"))
      .orderBy(col("bucket"))
  }

  /** q143 — two-proportion A/B conversion z-test over events
    * ([[Analytics.abTest]]): variant = user_id parity, conversion = any
    * purchase over 150 (a discriminating threshold — EVERY user has
    * some purchase, which would pool p to 1.0 and zero the variance).
    * Four exact integer counts in, one closed-form z out — the
    * experiment-analysis primitive.
    */
  def q143AbTest(spark: SparkSession, dir: String): DataFrame =
    Analytics.abTest(Tables.loadEvents(spark, dir), "user_id",
      col("event_type") === "purchase" && col("value") > 150)

  /** q131 — cross-source 5-gram overlap matrix
    * ([[Analytics.corpusOverlapMatrix]]): distinct-gram Jaccard between
    * every source pair — the corpus contamination/drift matrix.
    */
  def q131SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    Analytics.corpusOverlapMatrix(docs(spark, dir), "source", "text", n = 5)
      .orderBy(col("group_a"), col("group_b"))

  /** q132 — Zipf power-law fit per source ([[Analytics.zipfFit]]):
    * log-log OLS slope + R² over each source's token frequency table.
    */
  def q132ZipfFit(spark: SparkSession, dir: String): DataFrame =
    Analytics.zipfFit(docs(spark, dir), "source", "text")
      .orderBy(col("source"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_ewma" -> (q122Ewma _),
    "q123_profile" -> (q123Profile _),
    "q124_running_distinct" -> (q124RunningDistinct _),
    "q125_k_anonymity" -> (q125KAnonymity _),
    "q126_weighted_median" -> (q126WeightedMedian _),
    "q127_mad_outliers" -> (q127MadOutliers _),
    "q128_bigram_lm" -> (q128BigramLm _),
    "q129_hard_negatives" -> (q129HardNegatives _),
    "q130_semdedup" -> (q130SemDedup _),
    "q130b_semdedup_lsh" -> (q130bSemDedupLsh _),
    "q131_source_overlap" -> (q131SourceOverlap _),
    "q132_zipf_fit" -> (q132ZipfFit _),
    "q142_psi" -> (q142Psi _),
    "q143_ab_test" -> (q143AbTest _))

  val oracles: Map[String, String] = Map(
    "q122_ewma" ->
      """WITH o AS (
           SELECT o_custkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn,
                  count(*) OVER (PARTITION BY o_custkey) AS n
           FROM orders WHERE o_custkey % 7 = 0)
         SELECT o_custkey, count(*) AS n,
                CAST(round(sum(CAST(round(
                  CASE WHEN rn = 1 THEN power(0.7, n - rn) * o_totalprice
                       ELSE 0.3 * power(0.7, n - rn) * o_totalprice
                  END, 10) AS DECIMAL(38,10))), 4) AS DOUBLE) AS ewma
         FROM o GROUP BY o_custkey ORDER BY o_custkey""",
    "q123_profile" ->
      """WITH c AS (
           SELECT CAST(round(l_quantity*100, 0) AS BIGINT) AS l_quantity,
                  CAST(round(l_extendedprice*100, 0) AS BIGINT) AS l_extendedprice,
                  CAST(round(l_discount*100, 0) AS BIGINT) AS l_discount,
                  CAST(round(l_tax*100, 0) AS BIGINT) AS l_tax
           FROM lineitem),
         p AS (
           SELECT 'l_quantity' AS "column", count(l_quantity) AS n,
                  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                  count(DISTINCT l_quantity) AS n_distinct,
                  CAST(min(l_quantity) AS DOUBLE) AS mn,
                  CAST(max(l_quantity) AS DOUBLE) AS mx,
                  round(avg(CAST(l_quantity AS DOUBLE)), 6) AS av
           FROM c
           UNION ALL
           SELECT 'l_extendedprice', count(l_extendedprice),
                  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT l_extendedprice),
                  CAST(min(l_extendedprice) AS DOUBLE),
                  CAST(max(l_extendedprice) AS DOUBLE),
                  round(avg(CAST(l_extendedprice AS DOUBLE)), 6)
           FROM c
           UNION ALL
           SELECT 'l_discount', count(l_discount),
                  CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT l_discount),
                  CAST(min(l_discount) AS DOUBLE),
                  CAST(max(l_discount) AS DOUBLE),
                  round(avg(CAST(l_discount AS DOUBLE)), 6)
           FROM c
           UNION ALL
           SELECT 'l_tax', count(l_tax),
                  CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT l_tax),
                  CAST(min(l_tax) AS DOUBLE),
                  CAST(max(l_tax) AS DOUBLE),
                  round(avg(CAST(l_tax AS DOUBLE)), 6)
           FROM c)
         SELECT "column", n, n_null, n_distinct,
                mn/100.0 AS min_v, mx/100.0 AS max_v,
                round(av/100.0, 6) AS avg_v
         FROM p ORDER BY "column"""",
    "q124_running_distinct" ->
      """WITH o AS (
           SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
           FROM orders WHERE o_custkey % 17 = 0),
         f AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  CASE WHEN row_number() OVER (
                         PARTITION BY o_custkey, o_orderpriority
                         ORDER BY o_orderdate, o_orderkey) = 1
                       THEN 1 ELSE 0 END AS fs
           FROM o)
         SELECT o_custkey, o_orderkey,
                CAST(sum(fs) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rd
         FROM f ORDER BY o_custkey, o_orderkey""",
    "q125_k_anonymity" ->
      """SELECT c_nationkey AS nat, c_mktsegment AS seg,
                CAST(floor(c_acctbal/1000) AS BIGINT) AS bal_bucket,
                count(*) AS n
         FROM customer
         GROUP BY 1, 2, 3 HAVING count(*) < 5
         ORDER BY nat, seg, bal_bucket""",
    "q126_weighted_median" ->
      """WITH h AS (
           SELECT l_returnflag, l_linestatus, l_quantity,
                  sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS w
           FROM lineitem GROUP BY 1, 2, 3),
         c AS (
           SELECT l_returnflag, l_linestatus, l_quantity, w,
                  sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
                               ORDER BY l_quantity
                               ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot
           FROM h)
         SELECT l_returnflag, l_linestatus,
                CAST(min(CASE WHEN 2*cum >= tot THEN l_quantity END) AS DOUBLE)
                  AS wmedian,
                CAST(max(tot) AS BIGINT) AS total_w
         FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "q127_mad_outliers" ->
      """WITH med AS (
           SELECT o_orderpriority,
                  percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                    AS med
           FROM orders GROUP BY 1),
         ad AS (
           SELECT o.o_orderpriority, m.med,
                  abs(o.o_totalprice - m.med) AS ad
           FROM orders o JOIN med m USING (o_orderpriority)),
         mad AS (
           SELECT o_orderpriority,
                  percentile_cont(0.5) WITHIN GROUP (ORDER BY ad) AS mad
           FROM ad GROUP BY 1)
         SELECT a.o_orderpriority, count(*) AS n,
                round(any_value(a.med), 6) AS med,
                round(any_value(d.mad), 6) AS mad,
                CAST(sum(CASE WHEN a.ad > 3.0*1.4826*d.mad THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers
         FROM ad a JOIN mad d USING (o_orderpriority)
         GROUP BY 1 ORDER BY 1""",
    "q128_bigram_lm" ->
      """WITH toks AS (
           SELECT source, list_filter(string_split_regex(text, '\s+'),
                                      x -> len(x) > 0) AS ts
           FROM documents),
         bg AS (
           SELECT source,
                  unnest([ts[i+1] || ' ' || ts[i+2]
                          for i in range(len(ts)-1)]) AS b
           FROM toks WHERE len(ts) >= 2),
         c AS (
           SELECT source, split_part(b, ' ', 1) AS w1,
                  split_part(b, ' ', 2) AS w2, count(*) AS cnt
           FROM bg GROUP BY 1, 2, 3),
         pr AS (
           SELECT source, w1, w2, cnt,
                  round(cnt / CAST(sum(cnt) OVER (PARTITION BY source, w1)
                               AS DOUBLE), 6) AS cond_p,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY cnt DESC, w1 ASC, w2 ASC)
                    AS rank
           FROM c)
         SELECT source, w1, w2, cnt, cond_p, rank
         FROM pr WHERE rank <= 3 ORDER BY source, rank""",
    "q129_hard_negatives" ->
      """WITH q AS (
           SELECT vec_id AS qid, label AS ql, embedding AS qv
           FROM embeddings WHERE vec_id % 29 = 0),
         s AS (
           SELECT q.qid, q.ql, c.vec_id AS cid, c.label AS cl,
                  list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                         CAST(c.embedding AS DOUBLE[])) AS cos
           FROM q, embeddings c WHERE c.label <> q.ql),
         r AS (
           SELECT qid, ql, cid, cl, cos,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY cos DESC, cid ASC) AS rn
           FROM s)
         SELECT qid AS query_id, ql AS query_label, cid AS negative_id,
                cl AS negative_label, round(cos, 6) AS cosine
         FROM r WHERE rn = 1 ORDER BY query_id""",
    "q130_semdedup" ->
      """WITH d AS (
           SELECT DISTINCT a.vec_id AS aid
           FROM embeddings a, embeddings b
           WHERE b.vec_id < a.vec_id
             AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])) >= 0.4)
         SELECT e.vec_id, e.label
         FROM embeddings e LEFT JOIN d ON e.vec_id = d.aid
         WHERE d.aid IS NULL ORDER BY e.vec_id""",
    "q130b_semdedup_lsh" ->
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
    "q142_psi" ->
      """WITH b AS (SELECT CAST(i AS BIGINT) AS bucket FROM range(20) t(i)),
         r AS (
           SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT), 0), 19) AS bucket,
                  count(*) AS n
           FROM orders WHERE o_orderdate < DATE '1997-01-01' GROUP BY 1),
         c AS (
           SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT), 0), 19) AS bucket,
                  count(*) AS n
           FROM orders WHERE o_orderdate >= DATE '1997-01-01' GROUP BY 1),
         j AS (
           SELECT b.bucket, COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur
           FROM b LEFT JOIN r USING (bucket) LEFT JOIN c USING (bucket)),
         t AS (
           SELECT bucket, n_ref, n_cur,
                  sum(n_ref) OVER () AS tr, sum(n_cur) OVER () AS tc FROM j)
         SELECT bucket, n_ref, n_cur,
                round(((n_ref + 0.5)/(tr + 10.0) - (n_cur + 0.5)/(tc + 10.0)) *
                      ln(((n_ref + 0.5)/(tr + 10.0)) /
                         ((n_cur + 0.5)/(tc + 10.0))), 6) AS contrib
         FROM t ORDER BY bucket""",
    "q143_ab_test" ->
      """WITH u AS (
           SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                           THEN 1 ELSE 0 END) AS conv
           FROM events GROUP BY 1),
         v AS (
           SELECT CAST(coalesce(sum(CASE WHEN user_id % 2 = 0 THEN 1 END), 0) AS BIGINT) AS n0,
                  CAST(coalesce(sum(CASE WHEN user_id % 2 = 0 THEN conv END), 0) AS BIGINT) AS c0,
                  CAST(coalesce(sum(CASE WHEN user_id % 2 = 1 THEN 1 END), 0) AS BIGINT) AS n1,
                  CAST(coalesce(sum(CASE WHEN user_id % 2 = 1 THEN conv END), 0) AS BIGINT) AS c1
           FROM u)
         SELECT n0, c0, n1, c1,
                round(CASE WHEN n0 > 0 THEN CAST(c0 AS DOUBLE)/n0 END, 6) AS p0,
                round(CASE WHEN n1 > 0 THEN CAST(c1 AS DOUBLE)/n1 END, 6) AS p1,
                round(CASE WHEN n0 > 0 AND n1 > 0
                           AND c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
                      (CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0) /
                      sqrt((CAST(c0+c1 AS DOUBLE)/(n0+n1)) *
                           (1 - CAST(c0+c1 AS DOUBLE)/(n0+n1)) *
                           (1.0/n0 + 1.0/n1)) END, 6) AS z
         FROM v WHERE n0 + n1 > 0""",
    "q131_source_overlap" ->
      """WITH toks AS (
           SELECT source, list_filter(string_split_regex(text, '\s+'),
                                      x -> len(x) > 0) AS ts
           FROM documents),
         g0 AS (
           SELECT source,
                  unnest([array_to_string(ts[CAST(i+1 AS BIGINT):CAST(i+5 AS BIGINT)], ' ')
                          for i in range(CAST(len(ts)-4 AS BIGINT))]) AS gram
           FROM toks WHERE len(ts) >= 5),
         g AS (SELECT DISTINCT source, gram FROM g0),
         sz AS (SELECT source, count(*) AS s FROM g GROUP BY source),
         p AS (
           SELECT a.source AS sa, b.source AS sb, count(*) AS ov
           FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
           GROUP BY 1, 2)
         SELECT p.sa AS group_a, p.sb AS group_b,
                CAST(za.s AS BIGINT) AS n_a, CAST(zb.s AS BIGINT) AS n_b,
                p.ov AS overlap,
                round(p.ov / CAST(za.s + zb.s - p.ov AS DOUBLE), 6) AS jaccard
         FROM p JOIN sz za ON p.sa = za.source
                JOIN sz zb ON p.sb = zb.source
         ORDER BY group_a, group_b""",
    "q132_zipf_fit" ->
      """WITH tok AS (
           SELECT source,
                  unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> len(x) > 0)) AS t
           FROM documents),
         c AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
         r AS (
           SELECT source, c,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY c DESC, t ASC) AS rk
           FROM c)
         SELECT source, count(*) AS n_types,
                CAST(sum(c) AS BIGINT) AS n_tokens,
                round(regr_slope(ln(c), ln(rk)), 6) AS slope,
                round(regr_r2(ln(c), ln(rk)), 6) AS r2
         FROM r GROUP BY source ORDER BY source""")
}
