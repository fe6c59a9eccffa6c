package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  test("long probe: zero false negatives, codegen agrees with interpreted eval") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (0L until 500L).foreach(bloom.putLong)

    val probes = (0L until 1000L).toDF("k")
    val viaCodegen = probes
      .select(col("k"), BloomMightContain.mightContain(col("k"), bloom).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    // every inserted key MUST hit (bloom filters have no false negatives)
    (0L until 500L).foreach(k => assert(viaCodegen(k), s"false negative on $k"))
    // and the 1% fpp keeps most non-members out
    assert((500L until 1000L).count(viaCodegen) < 50)

    // direct interpreted eval over the same keys
    val viaEval = (0L until 1000L).map(k =>
      k -> BloomMightContain(Literal(k, LongType), bloom).eval(null).asInstanceOf[Boolean])
      .toMap
    assert(viaEval == viaCodegen)
  }

  test("string probe matches the sketch's own mightContainString; null in, null out") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    val members = Seq("alpha", "beta", "γάμμα δέλτα", "")
    members.foreach(bloom.putString)
    val cands = members ++ Seq("omega", "ALPHA", "be", "ta")

    val viaExpr = cands.toDF("s")
      .select(col("s"), BloomMightContain.mightContain(col("s"), bloom).as("hit"))
      .as[(String, Boolean)].collect().toMap
    cands.foreach(s => assert(viaExpr(s) == bloom.mightContainString(s), s"mismatch on '$s'"))

    // null propagates as null (the enclosing Filter then drops the row)
    val withNull = Seq(Some("alpha"), None).toDF("s")
      .select(BloomMightContain.mightContain(col("s"), bloom).as("hit"))
      .collect()
    assert(withNull.exists(_.isNullAt(0)))

    // interpreted parity on the string path too
    members.foreach { s =>
      val e = BloomMightContain(
        Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType), bloom)
      assert(e.eval(null) == true, s"interpreted false negative on '$s'")
    }
  }

  test("bloomPrefilteredJoin plan carries the native probe, no UDF opacity") {
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val custs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_acctbal") > 9000)
    val joined = graft.operators.Relational.bloomPrefilteredJoin(
      orders.withColumnRenamed("o_custkey", "c_custkey"), custs, "c_custkey",
      "inner", expectedBuildKeys = 1000)
    joined.write.format("noop").mode("overwrite").save()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"scala UDF leaked into the probe plan:\n$plan")
    assert(plan.toLowerCase.contains("bloommightcontain"),
      s"native probe missing from the plan:\n$plan")
  }
}
