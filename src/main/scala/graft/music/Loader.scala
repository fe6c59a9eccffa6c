package graft.music

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Load-side utilities mirroring the reference's ingest semantics
  * (SURVEY.md §2.1 A1–A3).
  */
object Loader {

  /** A3 — AUTO_INCREMENT surrogate keys (music_db.sql:7, 21, 34, 64).
    * Spark has no auto-increment; `monotonically_increasing_id` is
    * partition-layout-dependent, so reproducible fixtures need ids assigned
    * by `row_number` over an explicit stable ordering (SURVEY.md §7.4).
    * `startAt` models the dump's surviving high-water marks
    * (`AUTO_INCREMENT=5` with 2 rows, music_db.sql:12).
    *
    * Scale note: a single un-partitioned window is a driver-size bottleneck
    * by design here — surrogate-id assignment with *dense* reproducible ids
    * is inherently a total order. For cluster-scale loads prefer
    * `zipWithIndex`-style per-partition offsets (monotonic, not dense) or
    * keep natural keys.
    */
  def withSurrogateIds(
      df: DataFrame, idCol: String, orderCols: Seq[String],
      startAt: Long = 1L): DataFrame = {
    require(orderCols.nonEmpty, "surrogate ids need an explicit stable ordering")
    val w = Window.orderBy(orderCols.map(col): _*)
    df.withColumn(idCol, row_number().over(w).cast("long") + (startAt - 1))
  }

  /** A1 — idempotent (re)definition: register every music table as a
    * catalog-visible view from any row source, validating the schema
    * field-for-field first (names and types — NOT nullability: Spark
    * file sources force every field nullable, so a nullable-strict check
    * would reject any parquet/CSV-loaded table and leave only
    * literally-constructed frames usable. NOT NULL is re-established by
    * the C1 audit, the same split as the reference's FK-off load).
    */
  def createOrReplaceAll(spark: SparkSession, tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) =>
      val expected = MusicSchema.byName(name).schema
      require(df.schema.fields.map(f => (f.name, f.dataType)).sameElements(
          expected.fields.map(f => (f.name, f.dataType))),
        s"schema mismatch for $name: ${df.schema.simpleString} vs ${expected.simpleString}")
      df.createOrReplaceTempView(name)
    }
}
