package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot compaction: latest-record-wins merge of keyed, versioned
  * records — the refresh step of every periodically re-crawled corpus
  * (new crawl beats old page state, correction batches beat raw ingest)
  * and the batch form of CDC upsert compaction.
  *
  * Scale design: both entry points are a single hash aggregation on the
  * key — `max_by(struct(payload), struct(version))` — NOT a
  * `row_number() OVER (PARTITION BY key ORDER BY version DESC) = 1`
  * window. The two are semantically identical here, but the plans are
  * not: the window plan shuffles EVERY input row to its key's reducer
  * and sorts there, while the aggregate plan combines map-side first, so
  * the shuffle carries at most one surviving row per (key, map
  * partition). On a 100 TB re-crawl where a hot page has thousands of
  * historical versions, that is the difference between shuffling the
  * full history and shuffling ~one row per key per mapper. The agg also
  * needs no sort at all — final-merge is another max_by.
  */
object Snapshot {

  /** Keep, per key, the record with the lexicographically greatest
    * `versionCols` vector. All non-key columns (version columns
    * included) ride along in the surviving record, in the input column
    * order.
    *
    * Determinism: `versionCols` must be unique per key (append a unique
    * id as the last version column — the standard CDC sequence-number
    * trick). `max_by` picks an arbitrary row among exact version ties,
    * so a non-unique version vector would make the snapshot
    * layout-dependent; [[SnapshotSpec]] pins the unique-version path.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    // "_latest" is this function's internal agg alias; an input column of
    // the same name would collide in the post-agg select and silently
    // corrupt the payload — refuse instead
    require(!df.columns.contains("_latest"),
      "input must not contain a column named _latest (internal alias)")
    val payload = df.columns.filterNot(keyCols.contains)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(versionCols.map(col): _*)).as("_latest"))
      .select(keyCols.map(col) ++
        payload.map(c => col("_latest").getField(c).as(c)): _*)
  }

  /** Upsert a delta batch into a base snapshot: per key, the greatest
    * version wins; on an exact version tie the DELTA record wins (a
    * correction batch re-stating a record at its original version must
    * replace it). Both sides must share a schema (`unionByName`).
    *
    * If `tombstoneCol` is set (a boolean column), a winning record with
    * the flag true DELETES the key: it beats every older version, then
    * the key is dropped from the merged snapshot — how a crawl marks
    * pages gone without rewriting history. The flag column itself is
    * kept (it is ordinary payload; callers that want it gone drop it).
    */
  def merge(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], tombstoneCol: Option[String] = None): DataFrame = {
    // "_src" is the internal tie-break column; a pre-existing one would be
    // silently overwritten by withColumn and corrupt the delta-wins rule
    require(!base.columns.contains("_src") && !delta.columns.contains("_src"),
      "inputs must not contain a column named _src (internal tie-break)")
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(delta.withColumn("_src", lit(1)))
    // _src as the LAST version component: strictly-newer versions still
    // dominate; only exact version ties fall through to delta-beats-base
    val merged = latestByKey(tagged, keyCols, versionCols :+ "_src")
      .drop("_src")
    tombstoneCol match {
      case Some(tc) => merged.filter(!coalesce(col(tc), lit(false)))
      case None => merged
    }
  }

  /** Row-preserving form of [[latestByKey]]'s winner test: every input
    * row plus a boolean `flagCol`, true exactly on the rows
    * `latestByKey` would keep. This one IS a window (each row must see
    * its key's max to compare against — a window Column is also why it
    * cannot be a bare filter predicate: Spark forbids window functions
    * in WHERE), so it shuffles the full input — use it for
    * "flag, don't compact" flows (audit marts), not for the snapshot
    * itself.
    */
  def withIsLatest(df: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], flagCol: String = "is_latest"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val v = struct(versionCols.map(col): _*)
    df.withColumn(flagCol, v === max(v).over(w))
  }
}
