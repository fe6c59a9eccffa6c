package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.music.Constraints

/** Property-based layer (SURVEY.md §5.2 item 4) — ScalaCheck generators
  * drive randomized relational data through the operators; each property
  * runs a reduced case count (Spark jobs per case).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 10), Gen.choose(0, 5)))

  test("semi ⊎ anti partitions the left input") {
    check(Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      val l = ls.toDF("k", "v")
      val r = rs.toDF("k", "v")
      val semi = l.join(r.select("k").distinct(), Seq("k"), "left_semi").count()
      val anti = l.join(r.select("k").distinct(), Seq("k"), "left_anti").count()
      semi + anti == ls.size.toLong
    })
  }

  test("count(col) ≤ count(*) under random nulls") {
    check(Prop.forAll(rowsGen) { ls =>
      val df = ls.toDF("k", "v")
        .withColumn("v", when(col("v") === 0, lit(null)).otherwise(col("v")))
      val r = df.agg(count(col("v")).as("c"), count(lit(1)).as("n")).head
      r.getLong(0) <= r.getLong(1)
    })
  }

  test("rollup cardinality = groups(a,b) + groups(a) + 1") {
    check(Prop.forAll(rowsGen.suchThat(_.nonEmpty)) { ls =>
      val df = ls.toDF("a", "b")
      val full = df.select("a", "b").distinct().count()
      val as = df.select("a").distinct().count()
      val roll = df.rollup("a", "b").count().count()
      roll == full + as + 1
    })
  }

  test("dropDuplicates is idempotent and keeps one row per key") {
    check(Prop.forAll(rowsGen) { ls =>
      val df = ls.toDF("k", "v")
      val d1 = df.dropDuplicates(Seq("k"))
      val d2 = d1.dropDuplicates(Seq("k"))
      d1.count() == d2.count() &&
        d1.count() == ls.map(_._1).distinct.size.toLong
    })
  }

  test("key audit flags exactly the duplicated keys") {
    check(Prop.forAll(rowsGen) { ls =>
      val df = ls.toDF("k", "v")
      val dupKeys = ls.groupBy(_._1).filter(_._2.size > 1).keySet
      val flagged = Constraints.keyViolations(df, Seq("k"))
        .select("k").as[Int].collect().toSet
      flagged == dupKeys
    })
  }

  test("intersect ⊆ both inputs; except disjoint from right") {
    check(Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      val l = ls.map(_._1).toDF("k")
      val r = rs.map(_._1).toDF("k")
      val inter = l.intersect(r).as[Int].collect().toSet
      val exc = l.except(r).as[Int].collect().toSet
      val lSet = ls.map(_._1).toSet
      val rSet = rs.map(_._1).toSet
      inter.subsetOf(lSet) && inter.subsetOf(rSet) &&
        exc.subsetOf(lSet) && exc.intersect(rSet).isEmpty
    })
  }
}
