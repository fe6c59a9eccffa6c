package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {

  test("observeQuality: metrics ride the main action, values match direct aggregates") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val (instrumented, obs) = Quality.observeQuality(
      docs, nullCols = Seq("text", "lang"), rangeCols = Seq("n_chars"))
    // ONE action drives both the "pipeline" and the metrics
    instrumented.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") == docs.count())
    assert(m("text_nulls") == docs.filter(col("text").isNull).count())
    assert(m("lang_nulls") == docs.filter(col("lang").isNull).count())
    assert(m("n_chars_min") == docs.agg(min("n_chars")).head.getLong(0))
    assert(m("n_chars_max") == docs.agg(max("n_chars")).head.getLong(0))
  }
}
