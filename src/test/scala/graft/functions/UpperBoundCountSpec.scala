package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UpperBoundCountSpec extends SparkSpec {
  import spark.implicits._

  private val bnds = Seq(1.0, 2.0, 2.0, 5.0, 9.0)

  test("binary search equals the linear when-fold on every interesting probe") {
    val probes = Seq(0.0, 1.0, 1.5, 2.0, 2.5, 5.0, 8.9, 9.0, 10.0,
      Double.MinValue, Double.MaxValue)
    val df = probes.toDF("v").withColumn("b", typedLit(bnds))
    val out = df.select(col("v"),
        UpperBoundCount.upperBoundCount(col("b"), col("v")).as("bs"),
        aggregate(col("b"), lit(0),
          (acc, x) => acc + when(col("v") >= x, 1).otherwise(0)).as("fold"))
      .collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"probe ${r.getDouble(0)}: binary ${r.getInt(1)} vs fold ${r.getInt(2)}"))
    // ties count every equal element (matching the fold's >= orientation)
    assert(out.find(_.getDouble(0) == 2.0).get.getInt(1) == 3)
  }

  test("interpreted path matches codegen; nulls propagate; empty array is 0") {
    val expr = UpperBoundCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        bnds.toArray, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal(2.5))
    assert(expr.eval(null) == 3)
    val viaDf = Seq(2.5).toDF("v")
      .select(UpperBoundCount.upperBoundCount(typedLit(bnds), col("v")))
      .collect().head.getInt(0)
    assert(viaDf == 3)
    val nulls = Seq((Some(2.5), false), (None, true)).toDF("v", "isnull")
      .select(UpperBoundCount.upperBoundCount(
        when(col("isnull"), typedLit[Option[Seq[Double]]](None))
          .otherwise(typedLit(bnds)), col("v")).as("r"))
      .collect()
    assert(nulls(0).getInt(0) == 3 && nulls(1).isNullAt(0))
    assert(Seq(1.0).toDF("v")
      .select(UpperBoundCount.upperBoundCount(typedLit(Seq.empty[Double]), col("v")))
      .collect().head.getInt(0) == 0)
  }
}
