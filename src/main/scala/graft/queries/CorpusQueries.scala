package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.operators.{Dedup, Graph, Linkage, Relational, Similarity, TextAnalysis}

/** Round-6 continuation (q106+): corpus-graph and compression operators —
  * C4-style cross-document segment dedup, link-graph PageRank, blocklist
  * safety screening, int8 embedding quantization audits, the Spark 4
  * VARIANT semi-structured surface, skew-salted aggregation under the
  * exact oracle, and case-insensitive collation semantics. Each entry is
  * dual-engine DuckDB-oracled.
  *
  * Float discipline (SURVEY §6): PageRank values are O(1/N) sums of ≤ N
  * double terms — drift ~1e-17, rounded at 10. Quantization stats are
  * O(1) — rounded at 6 (9 for the tiny scale/error magnitudes). Both
  * guard bands are >10³ above the drift.
  */
object CorpusQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** q106 — C4-style cross-document segment dedup
    * ([[Dedup.segmentDedup]]): 8-token segments, first occurrence by
    * (doc_id, position) wins, documents reassembled from survivors.
    * ~175 duplicate occurrences collapse at sf0.01.
    */
  def q106SegmentDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.segmentDedup(docs(spark, dir), "doc_id", "text", segTokens = 8)
      .orderBy(col("doc_id"))

  /** q107 — fixed-depth PageRank ([[Graph.pageRank]], 3 synchronous power
    * iterations, d = 0.85) over a deterministic synthetic link graph: two
    * out-edges per document, (id·31+17) mod N and (id·97+43) mod N —
    * derived via a 1-row broadcast of N so edge generation stays lazy and
    * layout-independent. The DuckDB oracle unrolls the same three
    * iterations as CTEs.
    */
  def q107PageRank(spark: SparkSession, dir: String): DataFrame = {
    val nn = docs(spark, dir).agg(count(lit(1)).as("_n"))
    val base = docs(spark, dir).select(col("doc_id")).crossJoin(broadcast(nn))
    val edges =
      base.select(col("doc_id").as("src"),
          ((col("doc_id") * 31 + 17) % col("_n")).as("dst"))
        .unionAll(base.select(col("doc_id").as("src"),
          ((col("doc_id") * 97 + 43) % col("_n")).as("dst")))
    Graph.pageRank(edges, "src", "dst", iters = 3, damping = 0.85)
      .select(col("id"), round(col("rank"), 10).as("rank"))
      .orderBy(col("id"))
  }

  /** q108 — blocklist safety screening ([[TextAnalysis.blocklistStats]]):
    * per-document hit count/ratio against a literal blocklist and the
    * keep decision at 12 % — entirely map-side (no shuffle, no join; the
    * list folds into codegen as a constant array).
    */
  val q108Blocklist: Seq[String] = Seq("slow", "dup", "drop", "leak")
  def q108BlocklistFilter(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.blocklistStats(docs(spark, dir), "doc_id", "text",
        q108Blocklist, maxRatio = 0.12)
      .select(col("doc_id"), col("n_tok"), col("n_hits"),
        round(col("hit_ratio"), 6).as("hit_ratio"), col("keep"))
      .orderBy(col("doc_id"))

  /** q109 — int8 embedding quantization audit
    * ([[Similarity.int8QuantStats]]): per-vector scale, worst
    * reconstruction error, full-vs-dequantized cosine, and 16-dim
    * matryoshka head energy — pure higher-order array expressions, no
    * shuffle. The DuckDB oracle re-derives every stat from list lambdas.
    */
  def q109Int8Quant(spark: SparkSession, dir: String): DataFrame =
    Similarity.int8QuantStats(
        Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
        prefixDims = 16)
      .orderBy(col("vec_id"))

  /** q110 — Spark 4 VARIANT semi-structured surface: JSON built per
    * document, `parse_json` into a VariantType value, then `variant_get`
    * nested-path / array-index / typed extraction plus a missing-path
    * null. The DuckDB oracle extracts the same paths with its native JSON
    * functions, so the check is semantic parity of the two JSON engines.
    */
  def q110Variant(spark: SparkSession, dir: String): DataFrame = {
    val js = concat(
      lit("{\"id\":"), col("doc_id"),
      lit(",\"meta\":{\"lang\":\""), col("lang"),
      lit("\",\"n\":"), col("n_chars"),
      lit("},\"tags\":[\""), col("source"),
      lit("\",\"t"), (col("doc_id") % 5).cast("string"), lit("\"]}"))
    val v = parse_json(js)
    docs(spark, dir)
      .select(col("doc_id"),
        variant_get(v, "$.meta.lang", "string").as("lang_v"),
        variant_get(v, "$.meta.n", "long").as("n_v"),
        variant_get(v, "$.tags[1]", "string").as("tag1"),
        try_variant_get(v, "$.meta.absent", "long").as("absent"))
      .orderBy(col("doc_id"))
  }

  /** q111 — skew-salted aggregation under the EXACT oracle
    * ([[Relational.saltedAggregate]]): per-(source, lang) count and
    * char sum computed via the two-phase (key, salt)→key plan — the
    * hot-key spreading shape — checked against DuckDB's plain GROUP BY,
    * proving salting is invisible in results.
    */
  def q111SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Relational.saltedAggregate(
        docs(spark, dir).select(col("source"), col("lang"), col("n_chars")),
        keys = Seq("source", "lang"), saltBuckets = 8,
        partial = Seq(count(lit(1)).as("_pn"), sum(col("n_chars")).as("_ps")),
        merge = Seq(sum(col("_pn")).as("n"), sum(col("_ps")).as("sum_chars")))
      .orderBy(col("source"), col("lang"))

  /** q112 — case-insensitive collation semantics (Spark 4 `collate`):
    * a mixed-case language column compared and counted under UTF8_LCASE —
    * collated equality to a literal and collated COUNT(DISTINCT) — vs
    * DuckDB's lower() normalization. Comparison/count shapes only (never
    * emitting a collated representative value, which is layout-dependent
    * in both engines).
    */
  def q112Collation(spark: SparkSession, dir: String): DataFrame = {
    val mixed = when(col("doc_id") % 2 === 0, upper(col("lang")))
      .otherwise(col("lang"))
    docs(spark, dir)
      .select(col("source"), collate(mixed, "UTF8_LCASE").as("_m"))
      .groupBy(col("source"))
      .agg(
        sum((col("_m") === lit("en")).cast("long")).as("n_en"),
        count_distinct(col("_m")).as("n_langs_ci"),
        count(lit(1)).as("n"))
      .orderBy(col("source"))
  }

  /** q113 — edit-distance similarity self-join
    * ([[Linkage.editDistanceSelfJoin]], PassJoin partitioning, τ = 1)
    * over 4-token document prefixes: candidates from the lossless
    * segment/substring equi-join, verified with `levenshtein`. The
    * DuckDB oracle is the brute-force all-pairs filter, so the green
    * hash proves the pruning loses nothing (26 true pairs out of ~1.4M
    * at sf0.1). The input is deliberately high-entropy: identical-prefix
    * keys (TPC-H's `Supplier#0000…` names) flood ANY exact-substring
    * filter — see the operator's common-prefix caveat.
    */
  def q113EditDistJoin(spark: SparkSession, dir: String): DataFrame =
    Linkage.editDistanceSelfJoin(
        docs(spark, dir).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"),
            array_join(slice(graft.operators.TextAnalysis.tokens(col("text")),
              1, 4), " ").as("prefix")),
        "doc_id", "prefix", tau = 1)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("id_a"), col("id_b"))

  /** q114 — winsorized robust statistics: exact per-group p05/p95
    * (percentile_cont interpolation, the q92 discipline), values clipped
    * to the band, then DECIMAL-exact mean of the clipped column combined
    * in one double formula (the q104 discipline — the percentile bounds
    * make the sums order-sensitive in plain double).
    */
  def q114Winsorize(spark: SparkSession, dir: String): DataFrame = {
    // r9 scan-sharing (q127's lever): the percentile passes + the final
    // clipped aggregation read orders three times — persist the
    // 2-column projection once instead (one parquet scan at any scale).
    // Session-lifetime cache by design (lazy result ⇒ can't unpersist
    // before the caller's action); CacheManager dedupes repeat calls.
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // r7: bucketed exact percentiles (q92 discipline) — the built-in
    // percentile_cont would buffer a third of orders per status group
    val b = graft.operators.Relational.percentileContExact(
        o, "o_orderstatus", "o_totalprice",
        Seq("_w_lo" -> 0.05, "_w_hi" -> 0.95))
      .withColumnRenamed("o_orderstatus", "_w_st")
    // r16, two per-row cost removals (both pinned bit-exact against the
    // r9 form in PropertySpec):
    //  - the clip probe joins on xxhash64(status) — a single non-null
    //    LONG equi-key (LongHashedRelation; a string probe measured
    //    ~14× slower, see Relational.rankTargetedSelect) — with the
    //    true string equality as a post-join filter (===, so a NULL
    //    status row still drops exactly as the plain inner equi-join
    //    dropped it; a 64-bit collision only re-checks one row);
    //  - the clipped DECIMAL(18,6) per-row sum (whose (28,6) buffer
    //    runs on java.math.BigDecimal per row — the q42 lesson) becomes
    //    three GROUP-LEVEL terms: clip is lo for every row below the
    //    band, the exact 2-decimal price inside it, hi above it, so
    //    Σ round6(clip) = round6(lo)·n_lo + cents_mid/100 + round6(hi)·n_hi
    //    with round6 = the same double→DECIMAL(18,6) cast the old form
    //    applied per row (now applied once per group, so rounding is
    //    identical by construction), cents_mid an exact long sum split
    //    into (>>20, &0xFFFFF) halves (overflow-safe below ~10^12 rows
    //    per group), and the three terms combined in exact decimal
    //    arithmetic (scales 6/2/6, no precision-loss cap reached).
    val p = col("o_totalprice")
    val cents = round(p * 100, 0).cast("long")
    val cMid = when(p >= col("_w_lo") && p <= col("_w_hi"), cents)
      .otherwise(0L)
    val mask = lit((1L << 20) - 1)
    val agg = o
      .join(broadcast(b.withColumn("_w_h", xxhash64(col("_w_st")))),
        xxhash64(col("o_orderstatus")) === col("_w_h"))
      // coalesce-wrapped so ExtractEquiJoinKeys cannot merge the string
      // equality back into the join as a second (composite, generic-hash)
      // key — it must stay a residual condition on hash-equal rows;
      // null === null → null → false, exactly the plain inner equi-join
      .filter(coalesce(col("o_orderstatus") === col("_w_st"), lit(false)))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        first(col("_w_lo")).as("_lo"), first(col("_w_hi")).as("_hi"),
        sum(when(p < col("_w_lo"), 1L).otherwise(0L)).as("_nlo"),
        sum(when(p > col("_w_hi"), 1L).otherwise(0L)).as("_nhi"),
        sum(shiftright(cMid, 20)).as("_cmh"),
        sum(cMid.bitwiseAND(mask)).as("_cml"))
    val centsMid = col("_cmh").cast(DecimalType(25, 0)) * lit(1L << 20) +
      col("_cml")
    val wSum = col("_lo").cast(DecimalType(18, 6)) *
        col("_nlo").cast(DecimalType(14, 0)) +
      centsMid * lit(new java.math.BigDecimal("0.01")) +
      col("_hi").cast(DecimalType(18, 6)) *
        col("_nhi").cast(DecimalType(14, 0))
    agg.select(col("o_orderstatus"), col("n"),
        round(col("_lo"), 6).as("p05"),
        round(col("_hi"), 6).as("p95"),
        round(wSum.cast("double") / col("n"), 6).as("avg_clip"))
      .orderBy(col("o_orderstatus"))
  }

  /** q115 — per-source token-distribution Shannon entropy (the corpus
    * diversity metric): token counts → −Σ p·ln p, plus totals and
    * distinct counts. Two hash aggregations, map-side combined.
    */
  def q115TokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    docs(spark, dir)
      .select(col("source"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("cnt"))
      .withColumn("_p", col("cnt") / sum(col("cnt")).over(w))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tok"), count(lit(1)).as("n_distinct"),
        round(-sum(col("_p") * log(col("_p"))), 6).as("entropy"))
      .orderBy(col("source"))
  }

  /** q116 — shingle-containment self-join
    * ([[Linkage.containmentSelfJoin]], 5-gram, ≥ 0.5): detects documents
    * quoted/embedded inside larger ones where plain Jaccard dilutes —
    * inverted-index equi-join, never all-pairs; the DuckDB oracle
    * re-derives containment from first-principles list comprehensions.
    */
  def q116Containment(spark: SparkSession, dir: String): DataFrame =
    Linkage.containmentSelfJoin(docs(spark, dir), "doc_id", "text",
        n = 5, minContainment = 0.5)
      .select(col("id_a"), col("id_b"), col("overlap"),
        round(col("containment"), 6).as("containment"))
      .orderBy(col("id_a"), col("id_b"))

  /** q117 — exact triangle counting ([[Graph.triangleCount]], the
    * degree-orientation algorithm) over a deterministic synthetic graph
    * (three modular out-edges per document). The DuckDB oracle is the
    * textbook three-way self-join over canonical a<b<c edges.
    */
  def q117Triangles(spark: SparkSession, dir: String): DataFrame = {
    val nn = docs(spark, dir).agg(count(lit(1)).as("_n"))
    val base = docs(spark, dir).select(col("doc_id")).crossJoin(broadcast(nn))
    val edges = Seq(
        ((col("doc_id") + 1) % col("_n")),
        ((col("doc_id") * 2) % col("_n")),
        ((col("doc_id") * 3 + 1) % col("_n")))
      .map(d => base.select(col("doc_id").as("src"), d.as("dst")))
      .reduce(_.unionAll(_))
    Graph.triangleCount(edges, "src", "dst")
  }

  /** q118 — bounded-buffer top-k aggregate under the EXACT oracle: the
    * B26 [[graft.functions.Aggregators.TopKPairs]] UDAF (partial
    * aggregation ships ≤ k pairs per group per map task) versus DuckDB's
    * ranking window — per-source top-3 documents by n_chars, ties by
    * smallest doc_id. Proves the typed-Aggregator surface matches a
    * ranking window's semantics row for row.
    */
  def q118TopKAgg(spark: SparkSession, dir: String): DataFrame =
    Relational.topKPerGroup(
        docs(spark, dir).select(col("source"),
          col("n_chars").cast("double").as("score"), col("doc_id")),
        groupCols = Seq("source"), scoreCol = "score", idCol = "doc_id", k = 3)
      .select(col("source"), col("doc_id"),
        col("score").cast("long").as("n_chars"), col("rank").cast("long").as("rank"))
      .orderBy(col("source"), col("rank"))

  /** q119 — gap-and-islands: maximal runs of consecutive order months
    * per customer (the classic streak analysis), via the index-minus-
    * row_number grouping trick. The window partitions on o_custkey —
    * ~cardinality(customers) parallelism, each partition a handful of
    * months — so the shape holds at any scale.
    */
  def q119GapIslands(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("mi"))
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("mi"))
      .distinct()
      .withColumn("grp", col("mi") - row_number().over(w))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(min(col("mi")).as("start_mi"), max(col("mi")).as("end_mi"),
        count(lit(1)).as("len"))
      .filter(col("len") >= 3)
      .select(col("o_custkey"), col("start_mi").cast("long").as("start_mi"),
        col("end_mi").cast("long").as("end_mi"), col("len"))
      .orderBy(col("o_custkey"), col("start_mi"))
  }

  /** q120 — snapshot TIME-TRAVEL diff (the lakehouse AS-OF read): the
    * per-customer latest-order state ([[graft.operators.Snapshot
    * .latestByKey]] — map-side-combining max_by, never a full-history
    * window) materialized at two cutoff dates, then the SCD-style change
    * census between them: keys added, keys whose latest record moved,
    * keys unchanged. Two bounded aggregations + one key join.
    */
  def q120SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    def asOf(cut: String): DataFrame =
      graft.operators.Snapshot.latestByKey(
        o.filter(col("o_orderdate") <= lit(cut)),
        keyCols = Seq("o_custkey"), versionCols = Seq("o_orderdate", "o_orderkey"))
    val t1 = asOf("1997-01-01").select(col("o_custkey"), col("o_orderkey").as("k1"))
    val t2 = asOf("1999-01-01").select(col("o_custkey"), col("o_orderkey").as("k2"))
    // CASE-style counting: a null k1 must fall into the 0 branch, not
    // null out the sum (an all-null condition would make sum() NULL)
    t2.join(t1, Seq("o_custkey"), "left")
      .agg(
        count(lit(1)).as("n_t2"),
        sum(when(col("k1").isNull, 1L).otherwise(0L)).as("added"),
        sum(when(col("k1").isNotNull && col("k1") =!= col("k2"), 1L)
          .otherwise(0L)).as("changed"),
        sum(when(col("k1") === col("k2"), 1L).otherwise(0L)).as("unchanged"))
  }

  /** q121 — feature hashing (the hashing-trick featurizer): tokens
    * bucketed by an md5-derived hash mod 64 (cross-engine, seed-free),
    * per-document bucket counts as sparse (doc_id, bucket, cnt) rows.
    * Map-side explode + one hash aggregation; the hash is computed from
    * the token text so the feature space is fixed at 64 regardless of
    * vocabulary size — the property that makes it work on an unbounded
    * 100 TB vocabulary.
    */
  /** q138 — skew-salted equi-JOIN under the EXACT oracle
    * ([[Relational.saltedJoin]], the join twin of q111's salted
    * aggregation): orders (every o_orderpriority value is a hot key —
    * 5 keys over the whole table) joined to a per-priority statistics
    * dim on the salted (key, salt) pair. The oracle is the PLAIN join —
    * salting, like q111's, must be invisible in results; the operator's
    * value is spreading each hot key over 16 reducers when the dim is
    * too large or skewed to broadcast. Deterministic salt from
    * o_orderkey (layout-independent, retry-stable).
    */
  def q138SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val dim = o.groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("prio_n"),
        round(avg(col("o_totalprice")), 6).as("prio_avg"))
      .withColumnRenamed("prio", "o_orderpriority")
    Relational.saltedJoin(
        o.filter(col("o_orderkey") % 37 === 0)
          .select(col("o_orderkey"), col("o_orderpriority")),
        dim, "o_orderpriority", saltBuckets = 16, probeSaltCol = col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("prio_n"), col("prio_avg"))
      .orderBy(col("o_orderkey"))
  }

  /** q139 — BUCKETED co-located join under the EXACT oracle (the q60
    * layout discipline: a storage layout is correct iff invisible in
    * query results): orders and customer are written ONCE as co-bucketed
    * catalog tables ([[graft.operators.Export.writeBucketed]], 8 buckets
    * on the customer key) and the join reads the on-disk clustering —
    * ExportSpec pins that this plan has NO exchange on either side,
    * which at 100 TB is the entire shuffle cost of the dominant join,
    * paid once at write time instead of on every query. The oracle is
    * the plain parquet join.
    */
  def q139BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    // collision-safe table suffix (r7 advice): sha-256 of the ABSOLUTE
    // data dir, so two distinct dirs can never share a persisted
    // snapshot the way Integer.hashCode collisions could. ensure() below
    // assumes the dir's parquet is immutable for the table's lifetime —
    // a rewrite-in-place would keep serving the first snapshot (drop the
    // graft_q139_* tables to refresh), the standard materialized-layout
    // contract.
    val suffix = java.security.MessageDigest.getInstance("SHA-256")
      .digest(new java.io.File(dir).getAbsolutePath
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val to = s"graft_q139_orders_$suffix"
    val tc = s"graft_q139_cust_$suffix"
    // a previous JVM's in-memory catalog is gone but its warehouse files
    // survive — saveAsTable then fails LOCATION_ALREADY_EXISTS. Drop the
    // orphaned location before (re)creating the table.
    def ensure(table: String, build: => DataFrame, keys: Seq[String]): Unit =
      if (!spark.catalog.tableExists(table)) {
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val loc = new java.io.File(wh, table)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
          }
          rm(loc)
        }
        graft.operators.Export.writeBucketed(build, table, keys, buckets = 8)
      }
    graft.core.Tables.synchronized {
      ensure(to,
        Tables.load(spark, dir, "orders")
          .filter(col("o_orderkey") % 19 === 0)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"))
      ensure(tc,
        Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        Seq("c_custkey"))
    }
    spark.table(to)
      .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  def q121FeatureHash(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col("t")), 1, 4), 16, 10).cast("long"), lit(64))
    docs(spark, dir).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .select(col("doc_id"), bucket.as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("doc_id"), col("bucket"))
  }

  /** The planted-Zipf fact (r15, promoting the R14SkewBench rung to the
    * declared surface): key 0 carries 20% of orders (o_orderkey%5==0 —
    * the one hot key a shuffle clusters onto a single reducer), the
    * rest spread uniformly over keys 1..1000. Planted with PURE INTEGER
    * arithmetic so DuckDB replants the identical corpus from the same
    * parquet — a real differential oracle at every scale, no fixture.
    */
  private def zipfFact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      when(col("o_orderkey") % 5 === 0, lit(0L))
        .otherwise(pmod(col("o_orderkey"), lit(1000L)) + 1L).as("key"),
      col("o_orderkey").as("okey"), col("o_totalprice"))

  /** q176 — skew-salted equi-join ON THE PLANTED ZIPF CORPUS under the
    * exact oracle ([[Relational.saltedJoin]]; q138 exercises the same
    * operator on the 5-key priority domain — this face is the
    * one-hot-key-plus-long-tail shape the R14SkewBench rung measured,
    * where the unmitigated shuffle join puts 20% of probe rows on one
    * reducer of 32 and salting spreads them over 16). The oracle is the
    * PLAIN join — salting must be invisible in results. The straggler
    * bound itself is pinned in SkewSpec (max per-(key,salt) group ≈
    * hot/16), and the rung's wall-clock evidence is
    * docs/bench_r14_skew.json.
    */
  def q176SkewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = zipfFact(spark, dir)
    val dim = fact.groupBy(col("key"))
      .agg(count(lit(1)).as("key_n"),
        round(avg(col("o_totalprice")), 6).as("key_avg"))
    Relational.saltedJoin(
        fact.filter(col("okey") % 37 === 0).select(col("key"), col("okey")),
        dim, "key", saltBuckets = 16, probeSaltCol = col("okey"))
      .select(col("okey"), col("key"), col("key_n"), col("key_avg"))
      .orderBy(col("okey"))
  }

  /** q177 — bucketed exact per-key MEDIAN on the planted Zipf corpus
    * ([[Relational.percentileContExact]], the R14SkewBench
    * median_bucketed winner): the sort-window form buffers the hot
    * key's 20% of rows in ONE window frame (the classic straggler, no
    * built-in mitigation); the bucketed two-pass ranks (key, bucket)
    * slices in parallel, so the hot key spreads over 256 bucket frames.
    * Oracle: DuckDB percentile_cont(0.5), interpolation-identical.
    */
  def q177SkewBucketedMedian(spark: SparkSession, dir: String): DataFrame =
    Relational.percentileContExact(zipfFact(spark, dir), "key",
        "o_totalprice", Seq("median" -> 0.5))
      .select(col("key"), round(col("median"), 6).as("median"))
      .orderBy(col("key"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_segment_dedup" -> (q106SegmentDedup _),
    "q107_pagerank" -> (q107PageRank _),
    "q108_blocklist" -> (q108BlocklistFilter _),
    "q109_int8_quant" -> (q109Int8Quant _),
    "q110_variant" -> (q110Variant _),
    "q111_salted_agg" -> (q111SaltedAgg _),
    "q112_collation" -> (q112Collation _),
    "q113_editdist_join" -> (q113EditDistJoin _),
    "q114_winsorize" -> (q114Winsorize _),
    "q115_token_entropy" -> (q115TokenEntropy _),
    "q116_containment" -> (q116Containment _),
    "q117_triangles" -> (q117Triangles _),
    "q118_topk_agg" -> (q118TopKAgg _),
    "q119_gap_islands" -> (q119GapIslands _),
    "q120_snapshot_diff" -> (q120SnapshotDiff _),
    "q121_feature_hash" -> (q121FeatureHash _),
    "q138_salted_join" -> (q138SaltedJoin _),
    "q139_bucketed_join" -> (q139BucketedJoin _),
    "q176_skew_salted_join" -> (q176SkewSaltedJoin _),
    "q177_skew_bucketed_median" -> (q177SkewBucketedMedian _))

  val oracles: Map[String, String] = Map(
    // q176/q177 — the planted-Zipf skew faces: DuckDB replants the
    // identical corpus with the same integer arithmetic, then computes
    // the PLAIN (unmitigated) form — salting and bucketed ranking must
    // be invisible in results
    "q176_skew_salted_join" ->
      """WITH fact AS (
           SELECT CASE WHEN o_orderkey % 5 = 0 THEN 0
                       ELSE (o_orderkey % 1000) + 1 END AS key,
                  o_orderkey AS okey, o_totalprice
           FROM orders),
         dim AS (
           SELECT key, count(*) AS key_n,
                  round(avg(o_totalprice), 6) AS key_avg
           FROM fact GROUP BY key)
         SELECT f.okey, f.key, d.key_n, d.key_avg
         FROM fact f JOIN dim d USING (key)
         WHERE f.okey % 37 = 0
         ORDER BY f.okey""",
    "q177_skew_bucketed_median" ->
      """WITH fact AS (
           SELECT CASE WHEN o_orderkey % 5 = 0 THEN 0
                       ELSE (o_orderkey % 1000) + 1 END AS key,
                  o_totalprice
           FROM orders)
         SELECT key,
                round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 6) AS median
         FROM fact GROUP BY key ORDER BY key""",
    // q138/q139 — the layout-invisibility discipline: the oracle is the
    // PLAIN join; salting / on-disk bucketing must not change one row
    "q138_salted_join" ->
      """WITH dim AS (
           SELECT o_orderpriority, count(*) AS prio_n,
                  round(avg(o_totalprice), 6) AS prio_avg
           FROM orders GROUP BY 1)
         SELECT o.o_orderkey, o.o_orderpriority, dim.prio_n, dim.prio_avg
         FROM orders o JOIN dim USING (o_orderpriority)
         WHERE o.o_orderkey % 37 = 0
         ORDER BY o.o_orderkey""",
    "q139_bucketed_join" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_orderkey % 19 = 0
         ORDER BY o.o_orderkey""",
    "q106_segment_dedup" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                      x -> len(x) > 0) AS ts
           FROM documents),
         segs AS (
           SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
                  array_to_string(ts[(i*8+1):(i*8+8)], ' ') AS seg
           FROM toks, unnest(range(CAST(ceil(len(ts)/8.0) AS BIGINT))) AS t(i)),
         ranked AS (
           SELECT doc_id, seg_idx, seg,
                  row_number() OVER (PARTITION BY seg
                                     ORDER BY doc_id, seg_idx) AS rn
           FROM segs),
         per_doc AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id),
         reb AS (
           SELECT doc_id, count(*) AS n_kept,
                  string_agg(seg, ' ' ORDER BY seg_idx) AS text_out
           FROM ranked WHERE rn = 1 GROUP BY doc_id)
         SELECT d.doc_id,
                COALESCE(p.n_segs, 0) AS n_segs,
                COALESCE(r.n_kept, 0) AS n_kept,
                COALESCE(r.text_out, '') AS text_out
         FROM documents d
         LEFT JOIN per_doc p USING (doc_id)
         LEFT JOIN reb r USING (doc_id)
         ORDER BY d.doc_id""",
    "q107_pagerank" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         e AS (
           SELECT doc_id AS src, (doc_id*31+17) % nn.n AS dst FROM documents, nn
           UNION ALL
           SELECT doc_id, (doc_id*97+43) % nn.n FROM documents, nn),
         deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         r0 AS (SELECT doc_id AS id, CAST(1.0 AS DOUBLE)/nn.n AS rank
                FROM documents, nn),
         i1 AS (SELECT d.doc_id AS id,
                       (CAST(1.0 AS DOUBLE)-0.85)/nn.n
                         + 0.85*COALESCE(s.sm, 0) AS rank
                FROM documents d CROSS JOIN nn
                LEFT JOIN (SELECT e.dst AS id,
                                  sum(r.rank/deg.outdeg) AS sm
                           FROM e JOIN r0 r ON e.src = r.id
                                JOIN deg ON e.src = deg.src
                           GROUP BY e.dst) s ON d.doc_id = s.id),
         i2 AS (SELECT d.doc_id AS id,
                       (CAST(1.0 AS DOUBLE)-0.85)/nn.n
                         + 0.85*COALESCE(s.sm, 0) AS rank
                FROM documents d CROSS JOIN nn
                LEFT JOIN (SELECT e.dst AS id,
                                  sum(r.rank/deg.outdeg) AS sm
                           FROM e JOIN i1 r ON e.src = r.id
                                JOIN deg ON e.src = deg.src
                           GROUP BY e.dst) s ON d.doc_id = s.id),
         i3 AS (SELECT d.doc_id AS id,
                       (CAST(1.0 AS DOUBLE)-0.85)/nn.n
                         + 0.85*COALESCE(s.sm, 0) AS rank
                FROM documents d CROSS JOIN nn
                LEFT JOIN (SELECT e.dst AS id,
                                  sum(r.rank/deg.outdeg) AS sm
                           FROM e JOIN i2 r ON e.src = r.id
                                JOIN deg ON e.src = deg.src
                           GROUP BY e.dst) s ON d.doc_id = s.id)
         SELECT id, round(rank, 10) AS rank FROM i3 ORDER BY id""",
    "q108_blocklist" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> len(x) > 0) AS ts
           FROM documents),
         c AS (
           SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
                  CAST(len(list_filter(ts,
                    x -> list_contains(['slow','dup','drop','leak'], x)))
                    AS BIGINT) AS n_hits
           FROM t)
         SELECT doc_id, n_tok, n_hits,
                round(CASE WHEN n_tok = 0 THEN 0.0
                           ELSE CAST(n_hits AS DOUBLE)/n_tok END, 6) AS hit_ratio,
                (CASE WHEN n_tok = 0 THEN 0.0
                      ELSE CAST(n_hits AS DOUBLE)/n_tok END) <= 0.12 AS keep
         FROM c ORDER BY doc_id""",
    "q109_int8_quant" ->
      """WITH v AS (
           SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x) AS dv
           FROM embeddings),
         s AS (
           SELECT vec_id, dv,
                  list_aggregate(list_transform(dv, x -> abs(x)), 'max')
                    / 127.0 AS sc,
                  list_dot_product(dv, dv) AS n2
           FROM v),
         q AS (
           SELECT vec_id, dv, sc, n2,
                  list_transform(dv, x ->
                    least(greatest(round(x/sc, 0), -127.0), 127.0) * sc) AS dq,
                  list_dot_product(dv[1:16], dv[1:16]) AS h2
           FROM s)
         SELECT vec_id,
                round(sqrt(n2), 6) AS norm,
                round(sc, 9) AS scale,
                CASE WHEN sc = 0 THEN 0.0 ELSE
                  round(list_aggregate(
                    list_transform(list_zip(dv, dq),
                                   p -> abs(p[1] - p[2])), 'max'), 9)
                END AS max_err,
                CASE WHEN sc = 0 THEN 1.0 ELSE
                  round(list_dot_product(dv, dq)
                        / (sqrt(n2) * sqrt(list_dot_product(dq, dq))), 6)
                END AS cos_dq,
                CASE WHEN sc = 0 THEN 1.0 ELSE round(h2 / n2, 6) END
                  AS head_energy
         FROM q ORDER BY vec_id""",
    "q110_variant" ->
      """WITH j AS (
           SELECT doc_id,
                  '{"id":' || CAST(doc_id AS VARCHAR) ||
                  ',"meta":{"lang":"' || lang ||
                  '","n":' || CAST(n_chars AS VARCHAR) ||
                  '},"tags":["' || source ||
                  '","t' || CAST(doc_id % 5 AS VARCHAR) || '"]}' AS js
           FROM documents)
         SELECT doc_id,
                json_extract_string(js, '$.meta.lang') AS lang_v,
                CAST(json_extract(js, '$.meta.n') AS BIGINT) AS n_v,
                json_extract_string(js, '$.tags[1]') AS tag1,
                CAST(json_extract(js, '$.meta.absent') AS BIGINT) AS absent
         FROM j ORDER BY doc_id""",
    "q111_salted_agg" ->
      """SELECT source, lang, count(*) AS n,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY source, lang ORDER BY source, lang""",
    "q112_collation" ->
      """WITH t AS (
           SELECT source,
                  lower(CASE WHEN doc_id % 2 = 0 THEN upper(lang)
                             ELSE lang END) AS m
           FROM documents)
         SELECT source,
                CAST(sum(CASE WHEN m = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_en,
                count(DISTINCT m) AS n_langs_ci,
                count(*) AS n
         FROM t GROUP BY source ORDER BY source""",
    "q113_editdist_join" ->
      """WITH s AS (
           SELECT doc_id,
                  array_to_string(list_filter(string_split_regex(text, '\s+'),
                                              x -> len(x) > 0)[1:4], ' ') AS p
           FROM documents WHERE doc_id % 3 = 0)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
         FROM s a, s b
         WHERE a.doc_id < b.doc_id AND levenshtein(a.p, b.p) <= 1
         ORDER BY id_a, id_b""",
    "q114_winsorize" ->
      """WITH b AS (
           SELECT o_orderstatus,
                  percentile_cont(0.05) WITHIN GROUP (ORDER BY o_totalprice) AS lo,
                  percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS hi
           FROM orders GROUP BY o_orderstatus)
         SELECT o.o_orderstatus, count(*) AS n,
                round(any_value(b.lo), 6) AS p05,
                round(any_value(b.hi), 6) AS p95,
                round(CAST(sum(CAST(least(greatest(o.o_totalprice, b.lo), b.hi)
                                    AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
                  AS avg_clip
         FROM orders o JOIN b USING (o_orderstatus)
         GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""",
    "q115_token_entropy" ->
      """WITH tok AS (
           SELECT source,
                  unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> len(x) > 0)) AS t
           FROM documents),
         c AS (SELECT source, t, count(*) AS cnt FROM tok GROUP BY source, t),
         tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY source)
         SELECT c.source, any_value(tot.n) AS n_tok, count(*) AS n_distinct,
                round(-sum((cnt / CAST(tot.n AS DOUBLE))
                           * ln(cnt / CAST(tot.n AS DOUBLE))), 6) AS entropy
         FROM c JOIN tot USING (source)
         GROUP BY c.source ORDER BY c.source""",
    "q116_containment" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                      x -> len(x) > 0) AS ts
           FROM documents),
         g AS (
           SELECT doc_id,
                  unnest(list_distinct(
                    [array_to_string(ts[CAST(i+1 AS BIGINT):CAST(i+5 AS BIGINT)], ' ')
                     for i in range(CAST(len(ts)-4 AS BIGINT))])) AS gram
           FROM toks),
         sz AS (SELECT doc_id, count(*) AS s FROM g GROUP BY doc_id),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ov
               FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT p.id_a, p.id_b, p.ov AS overlap,
                round(greatest(p.ov / CAST(sa.s AS DOUBLE),
                               p.ov / CAST(sb.s AS DOUBLE)), 6) AS containment
         FROM p JOIN sz sa ON p.id_a = sa.doc_id
                JOIN sz sb ON p.id_b = sb.doc_id
         WHERE greatest(p.ov / CAST(sa.s AS DOUBLE),
                        p.ov / CAST(sb.s AS DOUBLE)) >= 0.5
         ORDER BY p.id_a, p.id_b""",
    "q117_triangles" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         e0 AS (
           SELECT doc_id AS s, (doc_id+1) % nn.n AS d FROM documents, nn
           UNION ALL SELECT doc_id, (doc_id*2) % nn.n FROM documents, nn
           UNION ALL SELECT doc_id, (doc_id*3+1) % nn.n FROM documents, nn),
         canon AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e0 WHERE s <> d)
         SELECT (SELECT count(*) FROM
                   (SELECT DISTINCT id FROM
                     (SELECT a AS id FROM canon UNION ALL SELECT b FROM canon)))
                  AS n_nodes,
                (SELECT count(*) FROM canon) AS n_edges,
                (SELECT count(*) FROM canon e1
                   JOIN canon e2 ON e2.a = e1.b
                   JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""",
    "q118_topk_agg" ->
      """SELECT source, doc_id, n_chars, rank FROM (
           SELECT source, doc_id, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id ASC) AS rank
           FROM documents) t
         WHERE rank <= 3 ORDER BY source, rank""",
    "q119_gap_islands" ->
      """WITH m AS (
           SELECT DISTINCT o_custkey,
                  year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi
           FROM orders),
         g AS (
           SELECT o_custkey, mi,
                  mi - row_number() OVER (PARTITION BY o_custkey ORDER BY mi)
                    AS grp
           FROM m)
         SELECT o_custkey,
                CAST(min(mi) AS BIGINT) AS start_mi,
                CAST(max(mi) AS BIGINT) AS end_mi, count(*) AS len
         FROM g GROUP BY o_custkey, grp
         HAVING count(*) >= 3
         ORDER BY o_custkey, start_mi""",
    "q120_snapshot_diff" ->
      """WITH s1 AS (
           SELECT o_custkey, o_orderkey AS k1 FROM (
             SELECT o_custkey, o_orderkey,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate <= DATE '1997-01-01') WHERE rn = 1),
         s2 AS (
           SELECT o_custkey, o_orderkey AS k2 FROM (
             SELECT o_custkey, o_orderkey,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderdate <= DATE '1999-01-01') WHERE rn = 1)
         SELECT count(*) AS n_t2,
                CAST(sum(CASE WHEN k1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS added,
                CAST(sum(CASE WHEN k1 IS NOT NULL AND k1 <> k2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS changed,
                CAST(sum(CASE WHEN k1 = k2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS unchanged
         FROM s2 LEFT JOIN s1 USING (o_custkey)""",
    "q121_feature_hash" ->
      """WITH tok AS (
           SELECT doc_id,
                  unnest(list_filter(string_split_regex(text, '\s+'),
                                     x -> len(x) > 0)) AS t
           FROM documents WHERE doc_id % 10 = 0)
         SELECT doc_id,
                CAST(concat('0x', substr(md5(t), 1, 4)) AS BIGINT) % 64
                  AS bucket,
                count(*) AS cnt
         FROM tok GROUP BY doc_id, bucket
         ORDER BY doc_id, bucket""")
}
