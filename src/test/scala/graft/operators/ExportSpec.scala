package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExportSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("deterministicShuffle: stable across partitioning, varies by seed") {
    val o1 = Export.deterministicShuffle(docs, "doc_id", 1L)
      .select("doc_id").as[Long].collect().toSeq
    val o2 = Export.deterministicShuffle(docs.repartition(7), "doc_id", 1L)
      .select("doc_id").as[Long].collect().toSeq
    val o3 = Export.deterministicShuffle(docs, "doc_id", 2L)
      .select("doc_id").as[Long].collect().toSeq
    assert(o1 == o2)           // layout-independent
    assert(o1 != o3)           // seed-dependent permutation
    assert(o1.sorted == o3.sorted) // same multiset
  }

  test("packSequences: budget respected, every doc packed once, deterministic") {
    val maxTokens = 200
    val withTok = docs.withColumn("n_tok",
      TextAnalysis.tokenCount(col("text")))
    val packed = Export.packSequences(withTok, "doc_id", "n_tok",
      maxTokens, numPartitions = 4)
    val rows = packed.select("doc_id", "seq_id", "overflow", "n_tok")
      .as[(Long, Long, Boolean, Int)].collect()
    // every doc exactly once
    assert(rows.map(_._1).sorted.toSeq ==
      docs.select("doc_id").as[Long].collect().sorted.toSeq)
    // per-sequence budget holds except flagged singleton overflows
    rows.groupBy(_._2).foreach { case (seqId, members) =>
      val total = members.map(_._4.toLong).sum
      if (total > maxTokens)
        assert(members.length == 1 && members.head._3,
          s"seq $seqId over budget with ${members.length} members")
      // seq_id is the smallest member id (the opener)
      assert(members.map(_._1).min == seqId)
    }
    // non-degenerate packing: fewer sequences than documents, and at
    // least the information-theoretic lower bound
    val nSeqs = rows.map(_._2).distinct.length
    val totalTok = rows.map(_._4.toLong).sum
    assert(nSeqs < rows.length)
    assert(nSeqs >= (totalTok + maxTokens - 1) / maxTokens)
    // deterministic under input layout changes (same numPartitions)
    val again = Export.packSequences(withTok.repartition(13), "doc_id", "n_tok",
      maxTokens, numPartitions = 4)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toSet
    assert(again == rows.map(r => (r._1, r._2)).toSet)
    // null token counts pack as 0 instead of crashing the encoder
    val withNullTok = withTok.withColumn("n_tok",
      when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("n_tok")))
    val nulled = Export.packSequences(withNullTok, "doc_id", "n_tok",
      maxTokens, numPartitions = 4)
    assert(nulled.count() == withTok.count())
    // digit-string ids work; non-numeric string ids fail FAST (not an
    // empty result); wide hash-derived ids don't overflow the bucketing
    val strIds = withTok.withColumn("doc_id", col("doc_id").cast("string"))
    assert(Export.packSequences(strIds, "doc_id", "n_tok", maxTokens, 4)
      .count() == withTok.count())
    val uuidIds = withTok.withColumn("doc_id", concat(lit("doc-"), col("doc_id")))
    intercept[IllegalArgumentException] {
      Export.packSequences(uuidIds, "doc_id", "n_tok", maxTokens, 4)
    }
    val hashIds = withTok.withColumn("doc_id", xxhash64(col("doc_id")))
    assert(Export.packSequences(hashIds, "doc_id", "n_tok", maxTokens, 4)
      .count() == withTok.count())
  }

  test("withShard: stable assignment, all shards populated, balanced-ish") {
    val sharded = Export.withShard(docs, "doc_id", 8)
    val counts = sharded.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet)
    assert(counts.values.min > 20) // 500 docs over 8 shards, roughly even
    // assignment is a pure row function: repartitioning doesn't change it
    val again = Export.withShard(docs.repartition(3), "doc_id", 8)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(sharded.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet == again)
  }

  test("writeShards: shard directories round-trip with full coverage") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Export.writeShards(docs.select("doc_id", "lang"), "doc_id", 4, out)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("shard").distinct().count() == 4)
    // intact export → empty mismatch report
    assert(Export.verifyShards(spark, out).isEmpty)
    // deleting a shard directory is detected
    val shard0 = new java.io.File(s"$out/shard=0")
    shard0.listFiles().foreach(_.delete()); shard0.delete()
    val broken = Export.verifyShards(spark, out)
    assert(!broken.isEmpty)
    assert(broken.select("shard").as[Int].collect().contains(0))
  }

  test("writeBucketed: co-bucketed tables join with NO exchange on either side") {
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val custs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "customer")
    Export.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_bkt", Seq("o_custkey"), buckets = 4)
    Export.writeBucketed(custs.select("c_custkey", "c_name"),
      "cust_bkt", Seq("c_custkey"), buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the bucketing (not a broadcast)
      // is what eliminates the exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("cust_bkt"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the same result as the plain join
      assert(joined.count() ==
        orders.join(custs, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS cust_bkt")
    }
  }

  test("mixCorpora: provenance tags, fractions respected, deterministic") {
    val en = docs.filter(col("lang") === "en")
    val de = docs.filter(col("lang") === "de")
    val mixed = Export.mixCorpora(spark,
      Seq(("english", en, 1.0), ("german", de, 0.3)))
    val counts = mixed.groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("english") == en.count())
    assert(counts("german") < de.count() && counts("german") > 0)
    val again = Export.mixCorpora(spark,
      Seq(("english", en, 1.0), ("german", de, 0.3)))
    assert(mixed.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
  }
}
