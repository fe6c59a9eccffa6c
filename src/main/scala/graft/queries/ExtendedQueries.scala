package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.core.Tables
import graft.operators.Similarity
import graft.plans.AsOfJoin

/** Round-3 coverage extensions (q37–q43): every entry is dual-engine
  * (DuckDB oracle), following the cross-engine result-type discipline
  * documented in [[InventoryQueries]] — integer-valued columns pinned to
  * BIGINT, no DECIMAL in final outputs, double aggregation done in exact
  * DECIMAL internally and cast to DOUBLE at the end on BOTH sides.
  *
  * Highlights:
  *  - q37 puts the custom as-of join SparkPlan ([[graft.plans.AsOfJoin]])
  *    under a true cross-engine oracle (DuckDB `ASOF LEFT JOIN`) — the
  *    round-2 surface was unit-test-only;
  *  - q41 runs [[Similarity.ivfTopK]] at full probe count, where IVF
  *    provably degenerates to exhaustive search, so the approximate-ANN
  *    machinery (cell assignment, probe join, re-rank) is oracle-checked
  *    against DuckDB's own cosine ranking;
  *  - q43 is deterministic content-hash sampling — the reproducible,
  *    cluster-order-independent way to sample a 100 TB corpus (a seeded
  *    `rand()` sample changes with partitioning; an md5-prefix predicate
  *    never does, and pushes down to the scan as a cheap per-row filter).
  */
object ExtendedQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)
  private def asLong(c: Column): Column = c.cast(LongType)
  private val dec = DecimalType(18, 2)

  /** q37 — native as-of join (custom LogicalPlan/Strategy/SparkPlan) vs
    * DuckDB ASOF LEFT JOIN: attach to every click the latest same-user
    * view at or before it. Event time compares at µs precision on both
    * engines (Spark `ts DIV 1000`, DuckDB's ns→µs read truncation —
    * verified equal even at .999 µs residue). The right side has no
    * duplicate (user_id, ts) pairs in the test data, so the latest-match
    * is unique and the oracle deterministic.
    */
  def q37AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("event_time"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_time"), col("value"))
    AsOfJoin.asOfJoin(clicks, views, "user_id", "event_time", Seq("value"))
      .select(col("event_id"), col("user_id"), col("asof_value").as("v"))
      .orderBy(col("event_id"))
  }

  /** q38 — array / higher-order function suite over the embedding column:
    * length, element access, array max, sequential-fold sum, filtered
    * count. Element casts to DOUBLE are exact (float32 ⊂ float64) and the
    * left-to-right fold order is identical on both engines, so the raw
    * double sum is bit-deterministic.
    */
  def q38ArrayFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < 300)
      .select(
        col("vec_id"),
        asLong(size(col("embedding"))).as("n"),
        element_at(col("embedding"), 1).cast(DoubleType).as("e1"),
        array_max(col("embedding")).cast(DoubleType).as("mx"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType)).as("ssum"),
        asLong(size(filter(col("embedding"), x => x > 0f))).as("npos"))
      .orderBy(col("vec_id"))

  /** q39 — regular-expression suite: extract (group 0), replace-all, and
    * boolean match pinned to BIGINT. Patterns are POSIX-safe (no
    * engine-specific syntax: Spark uses java.util.regex, DuckDB RE2).
    */
  def q39Regex(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "[a-z]+", 0).as("w1"),
        regexp_replace(col("text"), "[aeiou]", "_").as("rr"),
        asLong(col("text").rlike("data").cast("int")).as("m"))
      .orderBy(col("doc_id"))

  /** q40 — GROUPING SETS with grouping_id: per-(lang, source), per-lang,
    * and grand-total counts in one pass (B6 extension beyond
    * rollup/cube). Spark plans this as a single Expand + aggregate — one
    * shuffle for all three granularities.
    */
  def q40GroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq()),
        col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n"),
        asLong(sum(col("n_chars"))).as("chars"),
        asLong(grouping_id()).as("gid"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lg"),
        coalesce(col("source"), lit("ALL")).as("src"),
        col("n"), col("chars"), col("gid"))
      .orderBy(col("gid"), col("lg"), col("src"))

  /** q41 — IVF top-k at FULL probe count (nProbes = nCells): the inverted
    * list search provably degenerates to exhaustive search, so the whole
    * IVF path — argmax cell assignment, per-query probe explosion, cell
    * equi-join, native-cosine re-rank — is oracle-checked against
    * DuckDB's cosine ranking. Fewer probes (the production setting) trade
    * recall for a ~1/nCells candidate fraction; recall at nProbes=4 is
    * pinned in SimilaritySpec.
    */
  def q41IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfTopK(e, e.filter(col("vec_id").between(100, 104)),
        "vec_id", "embedding", k = 10, nCells = 8, nProbes = 8)
      .select(col("query_id"), col("neighbor_id"), asLong(col("rank")).as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q42 — correlation / regression statistics per group, computed
    * scale-safely from exact-DECIMAL power sums (Sx, Sy, Sxx, Syy, Sxy —
    * all partial+final aggregable, order-independent), combined in one
    * identical DOUBLE formula on both engines. Built-in `corr()` streams
    * co-moments in partition order — nondeterministic last bits across
    * engines AND across shuffles; the power-sum form is bit-reproducible
    * everywhere. (The classic cancellation caveat doesn't bite here:
    * values are 5-digit with 2 decimals, far inside double's 53 bits.)
    */
  def q42StatsCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(
        col("l_returnflag"),
        col("l_quantity").cast(dec).as("x"),
        col("l_extendedprice").cast(dec).as("y"))
    val g = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast(DoubleType).as("sx"),
      sum(col("y")).cast(DoubleType).as("sy"),
      sum(col("x") * col("x")).cast(DoubleType).as("sxx"),
      sum(col("y") * col("y")).cast(DoubleType).as("syy"),
      sum(col("x") * col("y")).cast(DoubleType).as("sxy"))
    val nD = col("n").cast(DoubleType)
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val vx = nD * col("sxx") - col("sx") * col("sx")
    val vy = nD * col("syy") - col("sy") * col("sy")
    g.select(
      col("l_returnflag"),
      col("n"),
      (cov / sqrt(vx * vy)).as("corr"),
      (cov / vx).as("slope"))
      .orderBy(col("l_returnflag"))
  }

  /** q43 — deterministic content-hash sampling, stratified by source:
    * keep a doc iff the first byte of md5(text) falls under its stratum's
    * threshold (~50% for src0/src1, ~12.5% otherwise). Content hashing
    * makes the sample reproducible independent of partitioning, task
    * retries, or cluster size — the property a seeded `rand()` sample
    * does NOT have — and the predicate is a cheap per-row filter that
    * needs no shuffle at any scale.
    */
  def q43SampleHash(spark: SparkSession, dir: String): DataFrame = {
    val bucket = substring(md5(col("text").cast("binary")), 1, 2)
    val keep = when(col("source").isin("src0", "src1"), bucket <= "7f")
      .otherwise(bucket <= "1f")
    t(spark, dir, "documents")
      .filter(keep)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_asof_join"     -> (q37AsofJoin _),
    "q38_array_fns"     -> (q38ArrayFns _),
    "q39_regex"         -> (q39Regex _),
    "q40_grouping_sets" -> (q40GroupingSets _),
    "q41_ivf_topk"      -> (q41IvfTopK _),
    "q42_stats_corr"    -> (q42StatsCorr _),
    "q43_sample_hash"   -> (q43SampleHash _),
  )

  val oracles: Map[String, String] = Map(
    "q37_asof_join" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
              views  AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
         SELECT c.event_id, c.user_id, v.value AS v
         FROM clicks c ASOF LEFT JOIN views v
           ON c.user_id = v.user_id AND c.ts >= v.ts
         ORDER BY c.event_id""",
    "q38_array_fns" ->
      """SELECT vec_id,
                len(embedding) AS n,
                CAST(embedding[1] AS DOUBLE) AS e1,
                CAST(list_max(embedding) AS DOUBLE) AS mx,
                list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS ssum,
                len(list_filter(embedding, x -> x > 0)) AS npos
         FROM embeddings WHERE vec_id < 300 ORDER BY vec_id""",
    "q39_regex" ->
      """SELECT doc_id,
                regexp_extract(text, '[a-z]+') AS w1,
                regexp_replace(text, '[aeiou]', '_', 'g') AS rr,
                CAST(regexp_matches(text, 'data') AS BIGINT) AS m
         FROM documents ORDER BY doc_id""",
    "q40_grouping_sets" ->
      """SELECT coalesce(lang, 'ALL') AS lg, coalesce(source, 'ALL') AS src,
                count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
                CAST(GROUPING(lang, source) AS BIGINT) AS gid
         FROM documents
         GROUP BY GROUPING SETS ((lang, source), (lang), ())
         ORDER BY gid, lg, src""",
    "q41_ivf_topk" ->
      """SELECT query_id, neighbor_id, rank FROM (
           SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                  row_number() OVER (
                    PARTITION BY a.vec_id
                    ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                    CAST(b.embedding AS DOUBLE[])) DESC,
                             b.vec_id ASC) AS rank
           FROM embeddings a, embeddings b
           WHERE a.vec_id BETWEEN 100 AND 104 AND a.vec_id <> b.vec_id) t
         WHERE rank <= 10 ORDER BY query_id, rank""",
    "q42_stats_corr" ->
      """WITH s AS (
           SELECT l_returnflag, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                (CAST(n AS DOUBLE) * sxy - sx * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)) AS corr,
                (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
         FROM s ORDER BY l_returnflag""",
    "q43_sample_hash" ->
      """SELECT doc_id, source FROM documents
         WHERE CASE WHEN source IN ('src0', 'src1')
                    THEN substr(md5(text), 1, 2) <= '7f'
                    ELSE substr(md5(text), 1, 2) <= '1f' END
         ORDER BY doc_id""",
  )
}
