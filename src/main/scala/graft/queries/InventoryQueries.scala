package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** The 21 declared inventory queries (SURVEY.md §2.5) as idiomatic DataFrame
  * pipelines. Each covers one or more operators from the SURVEY.md §2
  * inventory (cited per query). Column aliases match the oracle SQL exactly —
  * the driver's compare sorts columns by name before hashing.
  *
  * Scale notes (100 TB design intent):
  *  - dimension joins (region/nation/customer-at-small-sf) broadcast under AQE;
  *    fact-fact joins (Q-05 lineitem⋈orders) shuffle on the join key and AQE
  *    picks sort-merge vs shuffled-hash at runtime.
  *  - every aggregate is a partial+final hash aggregate (map-side combine);
  *    no collect-to-driver anywhere.
  *  - global ORDER BY is range-partitioned; top-k (Q-15) plans as
  *    TakeOrderedAndProject (no full sort materialization).
  */
object InventoryQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  private val dec = DecimalType(18, 2)

  /** Cross-engine result-type discipline (round-1 + round-2 lessons):
    * the driver's hash is TYPE- and REPRESENTATION-sensitive, so every
    * aggregate / function column is pinned to an explicit type that both
    * engines materialize identically — integer-valued columns to BIGINT
    * (DuckDB sum(int) is HUGEINT, Spark length/year/ntile are INTEGER),
    * and NO DECIMAL in any final output: the driver reads Spark parquet
    * via pyarrow (decimal128 → exact `Decimal('637712.00')`) but the
    * DuckDB oracle via `.df()` (DECIMAL → float64 → `637712.0`), so any
    * decimal value ending in a zero digit string-hash-mismatches even
    * when values and declared types are equal (round-2 failures q11/q14/
    * q21d/q21e/q21g/q33). Discipline: do the arithmetic in DECIMAL for
    * exact, order-independent sums, then CAST the final column to DOUBLE
    * on BOTH sides — the exact-decimal→nearest-double conversion is
    * deterministic and bit-identical across engines. The paired oracle
    * SQL carries the same explicit CASTs.
    */
  private def asLong(c: Column): Column = c.cast(LongType)

  /** Q-01 (A5, A6) scan + projection + alias. */
  def q01Scan(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region")
      .select(col("r_regionkey").as("rk"), col("r_name"))
      .orderBy(col("rk"))

  /** Q-02 (A8, A9, A12) equality + BETWEEN + conjunction. */
  def q02Filter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice").between(1000, 50000))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Q-03 (A10, A11) YEAR extraction + BETWEEN on derived expression. */
  def q03YearBetween(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(year(col("o_orderdate")).between(1994, 1995))
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))

  /** Q-04 (A7, A13, A19) inner equi-join + count + mixed-direction order
    * (RQ3/RQ6 shape — Queries:21–27, 50–57). nation is tiny → broadcast join.
    */
  def q04JoinCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("n_name").asc)

  /** Q-05 (A7 3-way, A13, A16, A19, A20) RQ5 shape (Queries:40–48): 3-way
    * join, null-skipping count, FD-style projection.
    *
    * Written aggregate-first: lineitem pre-aggregates to one row per
    * l_orderkey BEFORE joining, so the wide 4× fact table never shuffles
    * through the join — the join inputs are (orders-cardinality) compact
    * rows on both sides, and o_orderkey/c_custkey uniqueness (PKs) makes
    * the post-join re-group unnecessary. Semantically identical to the
    * naive join-then-group (count(l_linenumber) is per l_orderkey either
    * way; inner joins keep exactly the matched orders); ~2× faster at
    * sf0.1 and the gap widens with scale. Catalyst does not do this
    * partial-aggregate pushdown itself.
    */
  def q05ThreeWayJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(col("l_linenumber")).as("n_items"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name").as("cust"), col("n_items"))
      .orderBy(col("n_items").desc, col("o_orderkey").asc)

  /** Q-06 (A14, A15) RQ2 shape (Queries:12–19): HAVING over MAX(YEAR()). */
  def q06Having(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(year(col("o_orderdate"))).as("max_y"))
      .filter(col("max_y") === 2000)
      .select(col("o_custkey"))
      .orderBy(col("o_custkey"))

  /** Q-07 (A17, A18) RQ4 shape (Queries:29–38): conjunction of two
    * IN-subqueries → two chained left-semi joins (what Catalyst's
    * RewritePredicateSubquery produces for IN).
    */
  def q07SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000).select(col("c_nationkey")).distinct()
    val nat = t(spark, dir, "nation")
      .filter(col("n_regionkey") <= 2).select(col("n_nationkey")).distinct()
    t(spark, dir, "supplier")
      .join(cust, col("s_nationkey") === col("c_nationkey"), "left_semi")
      .join(nat, col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Q-07b (A18/B2 scale path, same oracle as Q-07): the IN-subquery
    * conjunction through [[graft.operators.Relational.bitmapSemiJoin]]
    * — each build side folds to one Roaring bitmap (partition-local
    * dedup, an N-buffer exchange instead of the distinct's per-key
    * shuffle) and the supplier probe filters MAP-SIDE on exact
    * membership, never moving at all: zero probe-side exchanges where
    * the left-semi form clusters-or-broadcasts per subquery. The shape
    * that survives when the build's distinct-key domain is too large
    * to broadcast as rows but dense enough to bitmap (the q09b
    * discipline applied to the semi face).
    */
  def q07bSemiBitmap(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational
    val s1 = Relational.bitmapSemiJoin(
      t(spark, dir, "supplier"), col("s_nationkey"),
      t(spark, dir, "customer").filter(col("c_acctbal") > 5000),
      col("c_nationkey"))
    Relational.bitmapSemiJoin(s1, col("s_nationkey"),
        t(spark, dir, "nation").filter(col("n_regionkey") <= 2),
        col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Q-08 (B1) left outer join + count of the nullable side, with the
    * r13 AGGREGATION-PUSHDOWN-BELOW-JOIN rewrite: grouping on the
    * join key of the unique side means the per-customer order count
    * can be computed on orders ALONE before the join — the join then
    * matches 1:≤1 rows instead of fanning out 1:N, so the exchange
    * carries one row per customer, not one per order (100×: 1.5 M vs
    * 15 M join-output rows; measured 9.4 s → 2.8 s,
    * docs/bench_r13_100x.json). COUNT null-skip survives the rewrite:
    * the pre-aggregate counts non-null o_orderkey, and a customer
    * with no orders gets NULL from the outer join → coalesce 0 —
    * pinned equal to the definitional fan-out form in PlanAuditSpec.
    * The LEFT JOIN itself stays (this is the B1 outer-join face).
    */
  def q08LeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(col("o_orderkey")).as("_n"))
    // r14 A/B, measured and REJECTED (Q0809Profile, 100×, same quiet
    // session): broadcasting the per-custkey aggregate into a
    // range-partitioned customer stream (kills the post-join sort
    // exchange) costs MORE than it saves — the 1.5 M-row broadcast
    // build + range sampling push 1.86 s → 2.40 s. The r13 shuffle
    // form stays; the remaining gap to DuckDB is the exchange-
    // materialization floor (PERF.md r14 q08 profile).
    t(spark, dir, "customer")
      .join(perCust, col("o_custkey") === col("c_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("_n"), lit(0L)).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Q-09 (B2) NOT EXISTS with inner predicate → left-anti join, with
    * the r13 PRE-DISTINCT build side: anti-join semantics only need
    * key PRESENCE, so the orders side reduces to its distinct custkeys
    * before the join — map-side combine shrinks the exchanged build
    * rows by the orders-per-customer factor (100×: 7.5 M filtered
    * order rows → ≤1.5 M keys; measured 3.0 s → 1.9 s). Result
    * pinned identical to the direct anti join in PlanAuditSpec.
    */
  def q09AntiJoin(spark: SparkSession, dir: String): DataFrame =
    // r14 A/B, measured and REJECTED (Q0809Profile, 100×): FORCING the
    // 1.45 M-key distinct build into a broadcast costs more than the
    // shuffle anti it replaces (1.08 s → 1.54 s — driver-side
    // HashedRelation build dominates). The r13 pre-distinct shuffle
    // form stays; [[q09bAntiBitmap]] is the form that actually beats
    // it (0.89 s): partition-local bitmap dedup, no row broadcast.
    t(spark, dir, "customer")
      .join(
        t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Q-09b (B2 scale path, same oracle as Q-09): the anti join through
    * [[graft.operators.Relational.bitmapAntiJoin]] — the build side
    * collapses to one Roaring bitmap (per-partition local dedup, an
    * N-buffer exchange instead of the distinct's per-key shuffle) and
    * the probe filters map-side on exact bitmap membership. The shape
    * that survives when the build's distinct-key shuffle is the
    * bottleneck; results pinned identical to the LEFT ANTI form.
    * The probe is filtered IN PLACE (no pre-clustering): the survivors
    * are the anti-join's small remainder, so the trailing ORDER BY
    * exchanges only them.
    */
  def q09bAntiBitmap(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Relational.bitmapAntiJoin(
      t(spark, dir, "customer"), col("c_custkey"),
      t(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
      col("o_custkey"))
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  /** Q-10 (B3) banded range/theta join. Non-equi → broadcast-nested-loop with
    * the small (filtered) part side broadcast; band condition bounds the work.
    */
  def q10RangeJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").filter(col("p_size") === 1)
      .join(
        t(spark, dir, "supplier"),
        col("p_retailprice").between(col("s_acctbal") - 10, col("s_acctbal") + 10))
      .select(col("p_partkey"), col("s_suppkey"))
      .orderBy(col("p_partkey"), col("s_suppkey"))

  /** Q-10b (B3 scale path): same band join through
    * [[graft.operators.Relational.bandJoin]] — bucketized to a shuffle
    * equi-join instead of the broadcast-nested-loop plan, the shape that
    * survives when neither side broadcasts. Checked against the same
    * oracle as Q-10.
    */
  def q10bBandBucketed(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Relational.bandJoin(
      t(spark, dir, "part").filter(col("p_size") === 1),
      t(spark, dir, "supplier"),
      col("p_retailprice"), col("s_acctbal"), 10.0)
      .select(col("p_partkey"), col("s_suppkey"))
      .orderBy(col("p_partkey"), col("s_suppkey"))

  /** Q-11 (B4) aggregate suite incl. COUNT(DISTINCT), decimal-stable SUM
    * (§5.4 rule 2: never hash a float SUM).
    */
  def q11AggSuite(spark: SparkSession, dir: String): DataFrame =
    // Bitmap distinct (r13, closing the q11 100× floor): the exact
    // COUNT(DISTINCT l_suppkey) rides a mergeable Roaring bitmap
    // aggregate ([[graft.functions.BitmapDistinct]]) so the WHOLE
    // query is one single-pass hash aggregate over the 6
    // flag/status groups — map-side combine collapses each partition
    // to 6 rows whose distinct state is a compressed bitmap, and the
    // exchange carries ~6·|partitions| buffers instead of one row per
    // (group, suppkey). History: the built-in COUNT(DISTINCT) plans
    // an Expand that doubles every input row through the shuffle
    // (2.5× slower at 100×); the r12 two-phase pre-aggregate fixed
    // that but still paid an 8 M-entry hash table and a per-distinct-
    // key exchange (2.88× DuckDB at 100×); the bitmap form measures
    // 1.5× faster than two-phase at 10× and closes the 100× gap
    // (docs/bench_r13_100x.json). Exact by construction — presence
    // bits, idempotent merge — and pinned equal to the definitional
    // COUNT(DISTINCT) form in InventoryQueriesSpec.
    // The exact sum rides LONG CENTS (§5.4's integer-units discipline):
    // l_quantity is decimal(18,2), so ·100 is an exact integer; a long
    // sum is vectorized where the decimal(28,2) sum buffer overflows
    // Spark's compact-long representation into per-row BigDecimal ops
    // (measured ~2x on the 60M-row 100× corpus). sum/100.0 and
    // decimal-sum-cast-double are the same correctly-rounded double.
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum((col("l_quantity") * 100).cast(LongType)) / 100.0).as("sum_qty"),
        min(col("l_extendedprice")).as("min_p"),
        max(col("l_extendedprice")).as("max_p"),
        count(lit(1)).as("n"),
        graft.functions.BitmapDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q-12 (B6) ROLLUP + grouping() markers, explicit NULL ordering (§5.4 rule 3). */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asLong(grouping(col("l_returnflag"))).as("g1"),
        asLong(grouping(col("l_linestatus"))).as("g2"),
        count(lit(1)).as("n"))
      .orderBy(
        col("g1"), col("g2"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q-13 (B7) ranking window: top-3 per group with deterministic tie-break. */
  def q13RankWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(spark, dir, "customer")
      .select(col("c_custkey"), asLong(row_number().over(w)).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_custkey"))
  }

  /** Q-14 (B8) analytic window: lag + running decimal sum with explicit frame. */
  def q14AnalyticWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
        sum(col("o_totalprice").cast(dec))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("run_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q-15 (B9) global top-k — plans as TakeOrderedAndProject, no full sort. */
  def q15TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  /** Q-16 (B10) INTERSECT (DISTINCT semantics, same as DuckDB). */
  def q16Intersect(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_nationkey").as("k"))
      .intersect(t(spark, dir, "supplier").select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  /** Q-17 (B11) string function suite. */
  def q17StringFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("ub"),
        lower(col("p_type")).as("lt"),
        substring(col("p_name"), 1, 5).as("pfx"),
        asLong(length(col("p_name"))).as("len"),
        regexp_replace(col("p_brand"), lit("#"), lit("-")).as("rb"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("cat"))
      .orderBy(col("p_partkey"))

  /** Q-18 (B12) math fns; floor/ceil explicitly cast (return-type drift, §5.4
    * rule 4); round only on DECIMAL (rule 6).
    */
  def q18MathFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000.0).as("a"),
        floor(col("p_retailprice")).cast(LongType).as("f"),
        ceil(col("p_retailprice")).cast(LongType).as("c"),
        round(col("p_retailprice").cast(dec), 1).cast(DoubleType).as("r"))
      .orderBy(col("p_partkey"))

  /** Q-19 (B13) date functions; date_trunc cast to DATE (§5.4 rule 4). */
  def q19DateFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("mo"),
        asLong(year(col("o_orderdate"))).as("y"),
        asLong(month(col("o_orderdate"))).as("m"),
        asLong(dayofmonth(col("o_orderdate"))).as("d"))
      .orderBy(col("o_orderkey"))

  /** Q-20 (B14) CASE WHEN + conditional aggregation. */
  def q20CaseWhen(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Q-21 (B16) exact dedup via DISTINCT on a projection. */
  def q21Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"))
      .distinct()
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  /** Q-22 (B10) UNION ALL with provenance tag (bag semantics preserved). */
  def q22UnionAll(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_nationkey").as("k"), lit("c").as("src"))
      .unionAll(
        t(spark, dir, "supplier").select(col("s_nationkey").as("k"), lit("s").as("src")))
      .groupBy(col("k"), col("src"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"), col("src"))

  /** Q-23 (B10) EXCEPT (DISTINCT semantics, same as DuckDB). */
  def q23Except(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation").select(col("n_nationkey").as("k"))
      .except(t(spark, dir, "supplier").select(col("s_nationkey").as("k")))
      .orderBy(col("k"))

  /** Q-24 (B-ext) pivot: wide per-category columns with fixed pivot values
    * (fixed ⇒ no extra values-discovery job, and deterministic columns).
    */
  def q24Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity").cast(dec)))
      .select(col("l_linestatus"),
        col("A").cast(DoubleType).as("A"), col("N").cast(DoubleType).as("N"),
        col("R").cast(DoubleType).as("R"))
      .orderBy(col("l_linestatus"))

  /** Q-25 (B-ext) unpivot/melt: the inverse reshape, back to long form.
    * Spark's unpivot KEEPS null-valued cells; the oracle (and the usual
    * melt semantics) drops them — filter explicitly so the two agree even
    * on data where some (status, flag) cell is empty.
    */
  def q25Unpivot(spark: SparkSession, dir: String): DataFrame =
    q24Pivot(spark, dir)
      .unpivot(
        Array(col("l_linestatus")),
        Array(col("A"), col("N"), col("R")),
        "l_returnflag", "sum_qty")
      .filter(col("sum_qty").isNotNull)
      .orderBy(col("l_linestatus"), col("l_returnflag"))

  /** Q-26 (B-ext) exact median via percentile_cont (interpolating); the
    * double result is decimal-rounded for the cross-engine hash (§5.4).
    */
  def q26Median(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(round(
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
          .cast(DecimalType(18, 4)), 2).cast(DoubleType).as("med"))
      .orderBy(col("o_orderpriority"))

  /** Q-27 (B7/B8 ext) distribution windows: ntile, percent_rank,
    * cume_dist — rational-valued doubles, deterministic across engines
    * once decimal-rounded.
    */
  def q27WindowStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    t(spark, dir, "customer")
      .select(
        col("c_custkey"),
        asLong(ntile(4).over(w)).as("q"),
        round(percent_rank().over(w).cast(DecimalType(18, 6)), 6)
          .cast(DoubleType).as("pr"),
        round(cume_dist().over(w).cast(DecimalType(18, 6)), 6)
          .cast(DoubleType).as("cd"))
      .orderBy(col("c_custkey"))
  }

  /** Q-28 (B13 ext) date arithmetic: interval add, datediff, last_day. */
  def q28DateArith(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast(DateType)
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        date_add(d, 30).as("plus30"),
        datediff(d, to_date(lit("1995-01-01"))).cast("long").as("dd"),
        last_day(d).as("eom"))
      .orderBy(col("o_orderkey"))
  }

  /** Q-29 (B11 ext) string function suite 2: pad/reverse/split_part/
    * repeat/trim.
    */
  def q29StringFns2(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "-").as("rp"),
        reverse(col("p_brand")).as("rev"),
        split_part(col("p_type"), lit(" "), lit(1)).as("first_word"),
        repeat(lit("ab"), 3).as("rep"),
        trim(concat(lit(" "), col("p_brand"), lit(" "))).as("tr"))
      .orderBy(col("p_partkey"))

  /** Q-30 (B6 ext) CUBE with grouping markers. */
  def q30Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asLong(grouping(col("l_returnflag"))).as("g1"),
        asLong(grouping(col("l_linestatus"))).as("g2"),
        count(lit(1)).as("n"))
      .orderBy(
        col("g1"), col("g2"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q-31 (B8 ext) value-position windows: first/last/nth with explicit
    * frames (last_value needs UNBOUNDED FOLLOWING to mean "partition
    * last" — the default frame ends at CURRENT ROW).
    */
  def q31FirstLast(spark: SparkSession, dir: String): DataFrame = {
    val base = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val toCurrent = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        first(col("o_orderkey")).over(toCurrent).as("first_ok"),
        last(col("o_orderkey")).over(full).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(toCurrent).as("second_ok"))
      .orderBy(col("o_orderkey"))
  }

  /** Name → pipeline, in SURVEY §2.5 order. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project"   -> (q01Scan _),
    "q02_filter"         -> (q02Filter _),
    "q03_year_between"   -> (q03YearBetween _),
    "q04_join_count"     -> (q04JoinCount _),
    "q05_threeway_join"  -> (q05ThreeWayJoin _),
    "q06_having"         -> (q06Having _),
    "q07_semijoin"       -> (q07SemiJoin _),
    "q07b_semi_bitmap"   -> (q07bSemiBitmap _),
    "q08_left_join"      -> (q08LeftJoin _),
    "q09_anti_join"      -> (q09AntiJoin _),
    "q09b_anti_bitmap"   -> (q09bAntiBitmap _),
    "q10_range_join"     -> (q10RangeJoin _),
    "q10b_band_bucketed" -> (q10bBandBucketed _),
    "q11_agg_suite"      -> (q11AggSuite _),
    "q12_rollup"         -> (q12Rollup _),
    "q13_rank_window"    -> (q13RankWindow _),
    "q14_analytic_window"-> (q14AnalyticWindow _),
    "q15_topk"           -> (q15TopK _),
    "q16_intersect"      -> (q16Intersect _),
    "q17_string_fns"     -> (q17StringFns _),
    "q18_math_fns"       -> (q18MathFns _),
    "q19_date_fns"       -> (q19DateFns _),
    "q20_case_when"      -> (q20CaseWhen _),
    "q21_distinct"       -> (q21Distinct _),
    "q21b_union_all"     -> (q22UnionAll _),
    "q21c_except"        -> (q23Except _),
    "q21d_pivot"         -> (q24Pivot _),
    "q21e_unpivot"       -> (q25Unpivot _),
    "q21f_median"        -> (q26Median _),
    "q21g_window_stats"  -> (q27WindowStats _),
    "q21h_date_arith"    -> (q28DateArith _),
    "q21i_string_fns2"   -> (q29StringFns2 _),
    "q21j_cube"          -> (q30Cube _),
    "q21k_first_last"    -> (q31FirstLast _),
  )

  /** DuckDB-runnable oracle SQL (SURVEY.md §2.5, pre-validated 21/21 against
    * Spark 4.1.2 + DuckDB 1.0.0 on sf0.01). Aliases match the DataFrame
    * pipelines above exactly.
    */
  val oracles: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT r_regionkey AS rk, r_name FROM region ORDER BY r_regionkey",
    "q02_filter" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice BETWEEN 1000 AND 50000
         ORDER BY o_orderkey""",
    "q03_year_between" ->
      """SELECT o_orderkey FROM orders
         WHERE year(o_orderdate) BETWEEN 1994 AND 1995 ORDER BY o_orderkey""",
    "q04_join_count" ->
      """SELECT n_name, count(*) AS c FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY c DESC, n_name ASC""",
    "q05_threeway_join" ->
      """SELECT o_orderkey, max(c_name) AS cust, count(l_linenumber) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
         GROUP BY o_orderkey ORDER BY n_items DESC, o_orderkey ASC""",
    "q06_having" ->
      """SELECT o_custkey FROM orders
         GROUP BY o_custkey HAVING max(year(o_orderdate)) = 2000
         ORDER BY o_custkey""",
    "q07_semijoin" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE s_nationkey IN (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 5000)
           AND s_nationkey IN (SELECT DISTINCT n_nationkey FROM nation WHERE n_regionkey <= 2)
         ORDER BY s_suppkey""",
    "q07b_semi_bitmap" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE s_nationkey IN (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 5000)
           AND s_nationkey IN (SELECT DISTINCT n_nationkey FROM nation WHERE n_regionkey <= 2)
         ORDER BY s_suppkey""",
    "q08_left_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q09_anti_join" ->
      """SELECT c_custkey FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q09b_anti_bitmap" ->
      """SELECT c_custkey FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q10_range_join" ->
      """SELECT p_partkey, s_suppkey FROM part JOIN supplier
         ON p_retailprice BETWEEN s_acctbal - 10 AND s_acctbal + 10
         WHERE p_size = 1 ORDER BY p_partkey, s_suppkey""",
    "q10b_band_bucketed" ->
      """SELECT p_partkey, s_suppkey FROM part JOIN supplier
         ON p_retailprice BETWEEN s_acctbal - 10 AND s_acctbal + 10
         WHERE p_size = 1 ORDER BY p_partkey, s_suppkey""",
    "q11_agg_suite" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                min(l_extendedprice) AS min_p, max(l_extendedprice) AS max_p,
                count(*) AS n, count(DISTINCT l_suppkey) AS n_supp
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus, grouping(l_returnflag) AS g1,
                grouping(l_linestatus) AS g2, count(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q13_rank_window" ->
      """SELECT c_custkey, rn FROM (
           SELECT c_custkey, row_number() OVER
             (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
           FROM customer) t
         WHERE rn <= 3 ORDER BY c_custkey""",
    "q14_analytic_window" ->
      """SELECT o_custkey, o_orderkey,
                lag(o_orderkey) OVER w AS prev_ok,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q15_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q16_intersect" ->
      """SELECT c_nationkey AS k FROM customer
         INTERSECT
         SELECT s_nationkey AS k FROM supplier
         ORDER BY k""",
    "q17_string_fns" ->
      """SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt,
                substr(p_name, 1, 5) AS pfx, length(p_name) AS len,
                replace(p_brand, '#', '-') AS rb, concat(p_brand, '/', p_type) AS cat
         FROM part ORDER BY p_partkey""",
    "q18_math_fns" ->
      """SELECT p_partkey, abs(p_retailprice - 1000.0) AS a,
                CAST(floor(p_retailprice) AS BIGINT) AS f,
                CAST(ceil(p_retailprice) AS BIGINT) AS c,
                CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r
         FROM part ORDER BY p_partkey""",
    "q19_date_fns" ->
      """SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
                year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d
         FROM orders ORDER BY o_orderkey""",
    "q20_case_when" ->
      """SELECT o_orderpriority,
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                count(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q21_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
         ORDER BY c_nationkey, c_mktsegment""",
    "q21b_union_all" ->
      """SELECT k, src, count(*) AS n FROM (
           SELECT c_nationkey AS k, 'c' AS src FROM customer
           UNION ALL
           SELECT s_nationkey AS k, 's' AS src FROM supplier) u
         GROUP BY k, src ORDER BY k, src""",
    "q21c_except" ->
      """SELECT n_nationkey AS k FROM nation
         EXCEPT
         SELECT s_nationkey AS k FROM supplier
         ORDER BY k""",
    "q21d_pivot" ->
      """SELECT l_linestatus,
                CAST(sum(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
                CAST(sum(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
                CAST(sum(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS R
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q21e_unpivot" ->
      """SELECT l_linestatus, rf AS l_returnflag, sum_qty FROM (
           SELECT l_linestatus,
                  CAST(sum(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qa,
                  CAST(sum(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qn,
                  CAST(sum(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qr
           FROM lineitem GROUP BY l_linestatus) p
         CROSS JOIN (VALUES ('A'), ('N'), ('R')) v(rf),
         LATERAL (SELECT CASE rf WHEN 'A' THEN qa WHEN 'N' THEN qn ELSE qr END AS sum_qty) s
         WHERE sum_qty IS NOT NULL
         ORDER BY l_linestatus, rf""",
    "q21f_median" ->
      """SELECT o_orderpriority,
                CAST(round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DECIMAL(18,4)), 2) AS DOUBLE) AS med
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q21g_window_stats" ->
      """SELECT c_custkey, ntile(4) OVER w AS q,
                CAST(round(CAST(percent_rank() OVER w AS DECIMAL(18,6)), 6) AS DOUBLE) AS pr,
                CAST(round(CAST(cume_dist() OVER w AS DECIMAL(18,6)), 6) AS DOUBLE) AS cd
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
         ORDER BY c_custkey""",
    "q21h_date_arith" ->
      """SELECT o_orderkey, CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
                datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd,
                CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom
         FROM orders ORDER BY o_orderkey""",
    "q21i_string_fns2" ->
      """SELECT p_partkey, lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '-') AS rp,
                reverse(p_brand) AS rev, split_part(p_type, ' ', 1) AS first_word,
                repeat('ab', 3) AS rep, trim(concat(' ', p_brand, ' ')) AS tr
         FROM part ORDER BY p_partkey""",
    "q21j_cube" ->
      """SELECT l_returnflag, l_linestatus, grouping(l_returnflag) AS g1,
                grouping(l_linestatus) AS g2, count(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q21k_first_last" ->
      """SELECT o_orderkey,
                first_value(o_orderkey) OVER w AS first_ok,
                last_value(o_orderkey) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
                nth_value(o_orderkey, 2) OVER w AS second_ok
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
  )
}
