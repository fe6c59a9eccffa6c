package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming operators over the `events` schema (SURVEY.md §2.4 B20–B24).
  *
  * Every transform is a plain `DataFrame => DataFrame`, so the same logical
  * plan runs in batch (`spark.read`) and streaming (`spark.readStream`)
  * mode — Structured Streaming's incrementalization handles the rest. State
  * (window aggs, dedup, session state) is keyed and partitioned by group,
  * so it scales horizontally; watermarks bound state size, which is the
  * thing that matters at 100 TB/day ingest.
  */
object EventStreams {

  /** events schema as read with nanosAsLong (FIXTURES.md §4): `ts` arrives
    * as bigint nanoseconds; `event_time` recovers a proper timestamp.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanoseconds since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType))) // JSON string, e.g. {"k": 87}

  /** Derive event_time (µs precision) from however `ts` arrives — bigint
    * nanos (integer `DIV`, not `/`: double promotion of int64 nanos is
    * lossy ±512 ns) or a native timestamp column — shared with the batch
    * loader: see [[graft.core.Tables.withEventTime]].
    */
  def withEventTime(df: DataFrame): DataFrame =
    graft.core.Tables.withEventTime(df)

  /** Streaming source over an events parquet directory. The schema is
    * inferred from the existing files with one batch footer read (a
    * streaming parquet source requires an explicit schema), so the source
    * adapts to either `ts` encoding like the batch loader. The nanos
    * legacy flag is PINNED for this session (via Tables.pinNanosFlag,
    * under the shared lock): streaming parquet scans re-plan every
    * microbatch and re-read the conf, so a batch load's save/restore must
    * not unset it mid-stream.
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    graft.core.Tables.pinNanosFlag(spark)
    // batch-inferring the schema throws on an empty/not-yet-created source
    // directory; rawSchema keeps the start-before-producer pattern working
    // (r5 advisor) — the footer read only refines `ts`'s encoding when
    // files already exist
    val schema =
      try spark.read.parquet(path).schema
      catch { case _: org.apache.spark.sql.AnalysisException => rawSchema }
    withEventTime(spark.readStream.schema(schema).parquet(path))
  }

  /** B15 — JSON prop extraction: adds `k` from the props JSON string. */
  def withProps(df: DataFrame): DataFrame =
    df.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))

  /** B13/B21 — per-day event counts (the q34 shape). ONE transform, two
    * execution modes: the batch face is the oracled `q34_events_daily`,
    * the streaming face is pinned batch≡stream in EventStreamsSpec's
    * parity test (r6 verdict item 5).
    */
  def dailyCounts(df: DataFrame): DataFrame =
    df.groupBy(date_trunc("day", col("event_time")).cast(DateType).as("day"))
      .agg(count(lit(1)).as("n"))

  /** B21 — tumbling-window counts/sums per event type. */
  def tumblingCounts(df: DataFrame, width: String = "10 minutes"): DataFrame =
    df.groupBy(window(col("event_time"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** B21 — sliding-window counts. */
  def slidingCounts(df: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    df.groupBy(window(col("event_time"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"))

  /** B22 — session windows per user: events within `gap` of each other merge
    * into one session.
    */
  def sessionCounts(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** B23 — watermarked tumbling agg: rows later than `lateness` behind the
    * max event time seen are dropped; in append mode a window only emits
    * once the watermark passes its end.
    */
  def watermarkedCounts(df: DataFrame, width: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame =
    tumblingCounts(df.withWatermark("event_time", lateness), width)

  /** B-ext — stream-stream interval join (the attribution shape): each
    * click matches the same user's views with
    * `view_time ∈ [click_time − maxDelay, click_time]`. Both sides carry
    * watermarks and the join condition carries the time band, so Spark
    * bounds the buffered state on each side to the delay + watermark
    * window — the requirement for an unbounded stream-stream join to run
    * at all. The same plan runs in batch mode (a plain band equi-join).
    */
  def attributedClicks(
      events: DataFrame, viewType: String = "view", clickType: String = "click",
      maxDelay: String = "10 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === viewType)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("event_time").as("view_time"))
      .withWatermark("view_time", maxDelay)
    val clicks = events.filter(col("event_type") === clickType)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", maxDelay)
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("view_time") <= col("click_time") &&
        col("view_time") >= col("click_time") - expr(s"INTERVAL $maxDelay"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_time"), col("view_time"))
  }

  /** B24 — stateful streaming dedup on event_id, state bounded by the
    * watermark.
    */
  def dedupWithinWatermark(df: DataFrame, lateness: String = "10 minutes"): DataFrame =
    df.withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Dedup-at-ingest for document streams: drop any document whose
    * CONTENT signature (64-bit SimHash over the token stream — identical
    * for verbatim and near-verbatim re-crawls that tokenize identically)
    * was already seen within the watermark horizon. This is the streaming
    * face of the batch two-stage dedup's exact-collapse stage
    * ([[graft.operators.Dedup.simhashDedup]] stage 1): signature equality
    * needs no verification join, so it composes with Spark's bounded
    * dropDuplicatesWithinWatermark state — per-key state is one signature
    * long, evicted at the watermark, and the signature computation itself
    * is a stateless per-row projection (streaming-safe, no shuffle beyond
    * the dedup's own keyed exchange).
    */
  def dedupContentWithinWatermark(
      df: DataFrame, textCol: String, timeCol: String = "event_time",
      lateness: String = "10 minutes"): DataFrame = {
    // native fused signature (one int[64] per row) — the HOF fold
    // allocates two arrays per token per row; bit parity pinned in
    // SimHash64Spec so batch and streaming dedup agree on signatures
    graft.functions.SimHash64.register(df.sparkSession)
    df.withColumn("_content_sig",
        graft.functions.SimHash64.simhash64(
          graft.operators.TextAnalysis.tokens(col(textCol))))
      .withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark("_content_sig")
      .drop("_content_sig")
  }

  /** Content signatures of a static corpus — the build side for
    * [[dedupAgainstCorpus]]. Compute ONCE and persist (ideally bucketed
    * on `_content_sig`, Export.writeBucketed): the signature table is a
    * few bytes per document, so the historical side of ingest dedup
    * stays a compact index instead of the corpus itself.
    */
  def corpusSignatures(corpus: DataFrame, textCol: String): DataFrame = {
    graft.functions.SimHash64.register(corpus.sparkSession)
    corpus.select(
      graft.functions.SimHash64.simhash64(
        graft.operators.TextAnalysis.tokens(col(textCol))).as("_content_sig"))
      .distinct()
  }

  /** Dedup-at-ingest against a HISTORICAL corpus, then within the stream
    * itself: the full crawl-ingest shape. A document is dropped if its
    * content signature (same fused SimHash64 as
    * [[dedupContentWithinWatermark]] — batch and streaming agree bit-for-
    * bit) already exists in the static signature table (stream-static
    * LEFT ANTI join — Spark plans the static side once per micro-batch,
    * broadcast when small), or was already seen in-stream within the
    * watermark horizon (bounded keyed state, evicted at the watermark).
    * Pass the PRECOMPUTED [[corpusSignatures]] table: recomputing
    * signatures of a 100 TB corpus every micro-batch is the bug this
    * two-argument shape makes impossible to write.
    */
  def dedupAgainstCorpus(
      stream: DataFrame, corpusSigs: DataFrame, textCol: String,
      timeCol: String = "event_time", lateness: String = "10 minutes"): DataFrame = {
    graft.functions.SimHash64.register(stream.sparkSession)
    stream.withColumn("_content_sig",
        graft.functions.SimHash64.simhash64(
          graft.operators.TextAnalysis.tokens(col(textCol))))
      .withWatermark(timeCol, lateness)
      .join(corpusSigs, Seq("_content_sig"), "left_anti")
      .dropDuplicatesWithinWatermark("_content_sig")
      .drop("_content_sig")
  }

  /** Parquet sink with checkpointing — the durable end of the
    * readStream → transform → writeStream pipeline (B20). Append mode;
    * state (watermarks, dedup sets, window aggs) recovers from the
    * checkpoint on restart, giving exactly-once file output.
    */
  def writeParquetStream(
      df: DataFrame, outPath: String, checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append)
      .start()

  /** Typed event for the arbitrary-stateful path. */
  case class Event(event_id: Long, user_id: Long, event_type: String, value: Double)

  /** Per-user running aggregate emitted on every update. */
  case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  /** B24 (new API) — the same running per-user aggregate via Spark 4's
    * `transformWithState` StatefulProcessor: typed ValueState handles,
    * the successor to mapGroupsWithState (supports multiple state
    * variables, TTL, timers; backed by the RocksDB provider on clusters).
    */
  class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserStat] {
    import org.apache.spark.sql.Encoders
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserStat] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[UserStat](
        "userStats", Encoders.product[UserStat], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStat] = {
      val prev = Option(state.get()).getOrElse(UserStat(key, 0L, 0.0))
      val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) {
        case ((cn, cv), e) => (cn + 1, cv + e.value)
      }
      val next = UserStat(key, n, v)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** B24 — running stats through the transformWithState path.
    *
    * Precondition checked eagerly: transformWithState needs the RocksDB
    * state-store provider (multiple column families); the default
    * HDFS-backed provider fails the FIRST BATCH with
    * STATE_STORE_MULTIPLE_COLUMN_FAMILIES — a confusing runtime error
    * this turns into an actionable one at construction. The conf is NOT
    * set here as a side effect: switching providers mid-session breaks
    * other streams' existing checkpoints.
    */
  def runningUserStatsTws(ds: Dataset[Event]): Dataset[UserStat] = {
    val provider = ds.sparkSession.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").getOrElse("")
    require(provider.contains("RocksDBStateStoreProvider"),
      "transformWithState requires spark.sql.streaming.stateStore.providerClass=" +
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider " +
        s"(current: ${if (provider.isEmpty) "HDFS-backed default" else provider})")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(
        new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** Streaming face of [[graft.operators.Snapshot.latestByKey]]: the
    * per-user latest record (greatest `event_id` — the CDC sequence
    * number) maintained in typed state, emitted on every batch that
    * touches the user (Update mode: the sink upserts by key). An
    * out-of-order arrival with a SMALLER version than the held state is
    * a no-op — same semantics the batch operator gives a late delta —
    * which is what distinguishes an upsert view from last-arrival-wins
    * `dropDuplicates`. State is one record per key, shuffle-partitioned:
    * the horizontally-scalable shape; bound the key space (or add a
    * timeout) before pointing it at an unbounded-cardinality stream.
    */
  def latestUserSnapshot(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[Event, Event](GroupStateTimeout.NoTimeout) {
        (_: Long, events: Iterator[Event], state: GroupState[Event]) =>
          val incoming = events.maxBy(_.event_id)
          val next = state.getOption match {
            case Some(cur) if cur.event_id >= incoming.event_id => cur
            case _ => incoming
          }
          state.update(next)
          next
      }
  }

  /** B24 — arbitrary stateful processing via mapGroupsWithState: running
    * per-user event count + value sum maintained in typed state. State is
    * per-key and shuffle-partitioned — the horizontally-scalable shape.
    */
  def runningUserStats(ds: Dataset[Event]): Dataset[UserStat] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          val (n, v) = events.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserStat(uid, n, v)
          state.update(next)
          next
      }
  }
}
