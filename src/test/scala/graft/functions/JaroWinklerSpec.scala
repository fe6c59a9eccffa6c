package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel: pinned to DuckDB jaro_winkler_similarity probe values") {
    // every expected value below is a DuckDB 1.x jaro_winkler_similarity
    // output captured during the round-7 cross-engine probe
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334), // jaro < boost only via prefix=0
      ("abcdef", "abdxxx", 0.6666666666666666), // jaro<=0.7: NO winkler boost
      ("abcdxx", "abxxxx", 0.8222222222222222), // jaro>0.7: boosted
      ("prefixaaa", "prefixzzz", 0.8666666666666666), // prefix capped at 4
      ("aaaa", "aaa", 0.9416666666666667),
      ("a", "a", 1.0),
      ("abc", "xyz", 0.0),
      ("", "abc", 0.0),
      ("", "", 0.0)) // DuckDB: both-empty is 0, not 1
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
    }
  }

  test("kernel: byte semantics — multi-byte code points compare per byte") {
    // DuckDB probe: 'é' vs 'e' = 0.0; 'éx' vs 'éy' = 0.8222…
    // (3-byte strings sharing the 2-byte é prefix)
    assert(jw("é", "e") === 0.0)
    assert(math.abs(jw("éx", "éy") - 0.8222222222222222) < 1e-12)
  }

  test("expression: codegen and interpreted agree on generated pairs") {
    import spark.implicits._
    JaroWinkler.register(spark)
    // CODEGEN_ONLY surfaces any Janino compile failure of the generated
    // static-call body as an error instead of a silent interpreted fallback
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = (0 until 400).map { i =>
        def s(seed: Int, n: Int): String =
          (0 until n).map(k => ('a' + ((seed * 31 + k * 7) % 5)).toChar).mkString
        (s(i, i % 11), s(i + 3, (i + 5) % 11))
      }.toDF("a", "b")
      val viaExpr = df.select(col("a"), col("b"),
        JaroWinkler.jaroWinkler(col("a"), col("b")).as("jw")).collect()
      viaExpr.foreach { r =>
        assert(r.getDouble(2) === jw(r.getString(0), r.getString(1)),
          s"codegen vs kernel for (${r.getString(0)}, ${r.getString(1)})")
      }
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("expression: null inputs null out; SQL text form resolves") {
    import spark.implicits._
    JaroWinkler.register(spark)
    val df = Seq((Some("abc"), Some("abd")), (None, Some("x")),
      (Some("x"), None)).toDF("a", "b")
    val got = df.select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0) && got(2).isNullAt(0))
    val sqlGot = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA')").collect()(0).getDouble(0)
    assert(math.abs(sqlGot - 0.9611111111111111) < 1e-12)
  }
}
