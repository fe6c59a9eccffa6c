package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source/sink coverage: parquet, csv, json, orc round-trips with explicit
  * schemas (never inference on read-back), partitioned layout with
  * partition pruning, and PK-sorted parquet for min/max row-group pruning
  * (the reference's clustered-PK analogue — SURVEY.md §4.1).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  private lazy val df = graft.core.Tables
    .load(spark, "/root/testdata/sf0.001", "nation")

  test("parquet round-trip preserves schema and rows") {
    df.write.mode("overwrite").parquet(s"$tmp/nation_parquet")
    val back = spark.read.parquet(s"$tmp/nation_parquet")
    assert(back.schema == df.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("csv round-trip with explicit schema (no inference)") {
    df.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.schema(df.schema).option("header", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() == df.count())
    assert(back.schema == df.schema)
  }

  test("json round-trip with explicit schema") {
    df.write.mode("overwrite").json(s"$tmp/nation_json")
    val back = spark.read.schema(df.schema).json(s"$tmp/nation_json")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("orc round-trip") {
    df.write.mode("overwrite").orc(s"$tmp/nation_orc")
    val back = spark.read.orc(s"$tmp/nation_orc")
    assert(back.count() == df.count())
  }

  test("hive-style partitioned write + partition pruning on read") {
    df.write.mode("overwrite").partitionBy("n_regionkey").parquet(s"$tmp/nation_part")
    val pruned = spark.read.parquet(s"$tmp/nation_part")
      .filter(col("n_regionkey") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(pruned.count() == df.filter(col("n_regionkey") === 1).count())
  }

  test("PK-sorted parquet write (clustered-PK analogue, min/max pruning)") {
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    orders.repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/orders_pk")
    val back = spark.read.parquet(s"$tmp/orders_pk")
      .filter(col("o_orderkey") === 42)
    // pushed filter lets parquet skip row groups via min/max stats
    assert(back.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)"))
  }
}
