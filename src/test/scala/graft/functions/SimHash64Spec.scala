package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}

class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the HOF fold AND the explode+aggregate path on real data") {
    SimHash64.register(spark)
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // native vs column-form HOF fold: bit-for-bit per row
    val mismatches = docs.select(
      SimHash64.simhash64(TextAnalysis.tokens(col("text"))).as("native"),
      Dedup.simhash(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // native vs the shuffle-based signature path used by simhashDedup
    val nat = docs.select(col("doc_id").as("_id"),
      SimHash64.simhash64(TextAnalysis.tokens(col("text"))).as("_sig"))
      .as[(Long, Long)].collect().toMap
    val agg = Dedup.simhashSignatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(nat == agg)
  }

  test("interpreted (no-codegen) eval agrees with codegen") {
    SimHash64.register(spark)
    val texts = Seq("the quick brown fox", "spark streaming state", "", "a a a a")
    val viaCodegen = texts.toDF("t")
      .select(SimHash64.simhash64(TextAnalysis.tokens(col("t"))))
      .as[Long].collect().toSeq
    // direct interpreted eval of the expression over the same token arrays
    val viaEval = texts.map { t =>
      val toks = texts.toDF("t").filter(col("t") === t).limit(1)
        .select(TextAnalysis.tokens(col("t"))).as[Seq[String]].head()
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(
        arr, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
        .eval(null).asInstanceOf[Long]
    }
    assert(viaCodegen == viaEval)
  }

  test("SQL registration, zero-token signature, null array") {
    SimHash64.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('x','y')) AS s,
                simhash64(CAST(array() AS ARRAY<STRING>)) AS empty,
                simhash64(CAST(NULL AS ARRAY<STRING>)) AS n""").head
    assert(r.getLong(1) == 0L)
    assert(r.isNullAt(2))
    assert(r.getLong(0) != 0L)
  }
}
