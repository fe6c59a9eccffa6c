package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-explicit file sources/sinks — the ingest edge of the engine
  * (SURVEY.md §2.1 A2/A4: the reference loads from a MySQL dump file; the
  * Spark-native equivalents are explicit-schema CSV/JSONL/parquet reads).
  *
  * Every reader takes a declared StructType — NEVER inference: inference
  * costs an extra pass over the data at 100 TB and silently drifts types
  * between runs (an int column with one stray float becomes double and
  * every downstream hash changes). `PERMISSIVE` + `_corrupt_record` is
  * the default posture: at corpus scale a handful of malformed rows must
  * not kill a load, but they must be VISIBLE — [[corruptRecords]] splits
  * them out for the audit path (same philosophy as the FK-off load +
  * post-audit in graft.music.Constraints).
  */
object Sources {

  val CorruptCol = "_corrupt_record"

  /** Declared-schema CSV read (header expected, RFC-ish quoting). Rows
    * that fail to parse land in [[CorruptCol]] instead of failing the job.
    *
    * `multiLine=true`: corpus text routinely embeds newlines and the
    * writer quotes them across physical lines — line-at-a-time parsing
    * would shred those rows into quarantine. The cost is that files stop
    * being split-parallelizable (whole-file parse); at real scale prefer
    * many medium CSV files, or JSONL, which has no such trade.
    * `enforceSchema=false`: validate the header names against the
    * declared schema — the default binds columns by POSITION and would
    * silently swap same-typed columns if the file's order differs.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("multiLine", "true")
      .option("enforceSchema", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .csv(path)

  /** Declared-schema JSON-lines read; malformed lines → [[CorruptCol]]. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt(schema))
      .json(path)

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)

  /** Split a permissive read into (clean rows with declared columns only,
    * corrupt raw records) — the load-then-audit shape.
    *
    * Spark refuses to reference the corrupt-record column straight off
    * raw files (the parser would have to re-run per consumer and could
    * disagree with itself); the parse is cached here, which is also the
    * right call operationally — both halves of the split read it. The
    * cache follows the session's normal LRU eviction.
    */
  def corruptRecords(df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val parsed = df.cache()
    val clean = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (clean, bad)
  }

  /** CSV sink (header, one directory per table) — the export mirror of
    * [[readCsv]]; round-trip fidelity for the music schema is pinned in
    * SourcesSpec.
    */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ","): Unit =
    df.write
      .option("header", "true")
      .option("delimiter", delimiter)
      .mode("overwrite")
      .csv(path)

  /** JSONL sink. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source — the other columnar format Spark ships natively (schema
    * from file metadata like parquet; predicate pushdown + column pruning
    * apply the same way). Snappy by default.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
