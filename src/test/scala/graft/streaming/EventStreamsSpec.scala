package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Event-time scripts through MemoryStream — explicit watermark/window
  * semantics, not eyeballing (SURVEY.md §7.4).
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, ts nanos, user_id, event_type, value, props) at minute m. */
  private def ev(id: Long, minute: Int, user: Long = 1L,
      typ: String = "click", value: Double = 1.0): (Long, Long, Long, String, Double, String) =
    (id, minuteNanos(minute), user, typ, value, s"""{"k": $id}""")

  private def minuteNanos(m: Int): Long = m * 60L * 1000_000_000L

  private def runStream(
      input: Seq[Seq[(Long, Long, Long, String, Double, String)]],
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode, name: String): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double, String)]
    val df = EventStreams.withEventTime(
      mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = transform(df).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    input.foreach { batch => mem.addData(batch); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("B20/B21: tumbling window counts over a memory stream (update mode)") {
    val out = runStream(
      Seq(Seq(ev(1, 1), ev(2, 3), ev(3, 12))),
      df => EventStreams.tumblingCounts(df, "10 minutes"),
      OutputMode.Update, "tumbling")
    val got = out.select("win_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2))).toSet
    assert(got == Set((0L, "click", 2L), (10L, "click", 1L)))
  }

  test("B21: sliding windows assign an event to overlapping windows") {
    val out = runStream(
      Seq(Seq(ev(1, 7))),
      df => EventStreams.slidingCounts(df, "10 minutes", "5 minutes"),
      OutputMode.Update, "sliding")
    val starts = out.select("win_start").collect()
      .map(_.getTimestamp(0).getTime / 60000).toSet
    assert(starts == Set(0L, 5L)) // windows [0,10) and [5,15) both contain minute 7
  }

  test("B22: session windows merge events within gap, split beyond it") {
    val out = runStream(
      // user 1: events at min 0 and 10 (gap 30 → one session);
      // then min 60 (new session). user 2: one event.
      Seq(Seq(ev(1, 0), ev(2, 10), ev(3, 60), ev(4, 5, user = 2L))),
      df => EventStreams.sessionCounts(df, "30 minutes"),
      OutputMode.Complete, "sessions")
    val got = out.select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(got == List((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("B23: watermark drops late rows; append emits only closed windows") {
    val out = runStream(
      Seq(
        Seq(ev(1, 1), ev(2, 3)),   // window [0,10)
        Seq(ev(3, 25)),            // advances watermark to 15 → closes [0,10)
        Seq(ev(4, 2))),            // late: event-time 2 < watermark → dropped
      df => EventStreams.watermarkedCounts(df, "10 minutes", "10 minutes"),
      OutputMode.Append, "watermarked")
    val got = out.select("win_start", "n").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1))).toSet
    // only the closed [0,10) window is emitted, with the on-time 2 rows;
    // the late event 4 was NOT added (would have made n=3)
    assert(got == Set((0L, 2L)))
  }

  test("B-ext: stream-stream interval join attributes clicks to in-window views") {
    // Timeline starts at minute 60: an event AT epoch 0 equals the
    // initial watermark value and is discarded as late — a real
    // semantic, not a bug, but not what this test is about.
    // user 1: view@60, view@80; clicks @65 (→ view@60) and @85
    // (→ view@80; view@60 is 25 min stale, outside the 10-min band).
    // user 2: click with no view → no row (inner join).
    val script = Seq(
      ev(10, 60, user = 1, typ = "view"),
      ev(11, 80, user = 1, typ = "view"),
      ev(20, 65, user = 1, typ = "click"),
      ev(21, 85, user = 1, typ = "click"),
      ev(22, 66, user = 2, typ = "click"))
    val out = runStream(Seq(script),
      df => EventStreams.attributedClicks(df),
      OutputMode.Append, "attributed")
    val got = out.select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((20L, 10L), (21L, 11L)))
    // batch mode: identical pairs from the same transform
    val batch = EventStreams.attributedClicks(
      EventStreams.withEventTime(
        script.toDF("event_id", "ts", "user_id", "event_type", "value", "props")))
      .select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == got)
  }

  test("B24: dropDuplicatesWithinWatermark dedups replayed event_ids") {
    val out = runStream(
      Seq(
        Seq(ev(1, 1), ev(1, 1), ev(2, 3)), // dup in same batch
        Seq(ev(2, 3), ev(5, 6))),          // replay of 2 across batches
      df => EventStreams.dedupWithinWatermark(df, "10 minutes"),
      OutputMode.Append, "dedup")
    val ids = out.select("event_id").as[Long].collect().toList.sorted
    assert(ids == List(1L, 2L, 5L))
  }

  test("B24-ext: content-signature dedup at ingest drops re-crawled documents") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val df = EventStreams.withEventTime(
      mem.toDF.toDF("event_id", "ts", "text"))
    val q = EventStreams.dedupContentWithinWatermark(df, "text")
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode(OutputMode.Append).start()
    val doc = "the quick brown fox jumps over the lazy dog"
    val other = "a completely different document about spark streaming state"
    Seq(
      Seq((1L, minuteNanos(1), doc), (2L, minuteNanos(2), doc)), // same-batch re-crawl
      Seq((3L, minuteNanos(3), doc), (4L, minuteNanos(4), other)) // cross-batch re-crawl
    ).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val ids = spark.table("content_dedup").select("event_id").as[Long].collect().toList.sorted
    // 2 and 3 carry the same content signature as 1 → dropped; the helper
    // must also not leak its internal _content_sig column
    assert(ids == List(1L, 4L))
    assert(!spark.table("content_dedup").columns.contains("_content_sig"))
  }

  test("B24-ext: ingest dedup against a historical corpus + within-stream") {
    implicit val sqlCtx = spark.sqlContext
    val known = "the quick brown fox jumps over the lazy dog"
    val fresh = "a brand new document the archive has never seen"
    val corpus = Seq((100L, known)).toDF("doc_id", "text")
    val sigs = EventStreams.corpusSignatures(corpus, "text")
    val mem = MemoryStream[(Long, Long, String)]
    val df = EventStreams.withEventTime(
      mem.toDF.toDF("event_id", "ts", "text"))
    val q = EventStreams.dedupAgainstCorpus(df, sigs, "text")
      .writeStream.format("memory").queryName("corpus_dedup")
      .outputMode(OutputMode.Append).start()
    Seq(
      Seq((1L, minuteNanos(1), known), (2L, minuteNanos(2), fresh)),
      Seq((3L, minuteNanos(3), fresh)) // in-stream re-crawl of 2
    ).foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val ids = spark.table("corpus_dedup").select("event_id").as[Long].collect().toList.sorted
    // 1 is already in the historical corpus; 3 repeats 2 within the stream
    assert(ids == List(2L))
    assert(!spark.table("corpus_dedup").columns.contains("_content_sig"))
  }

  test("B24: mapGroupsWithState running per-user stats across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("userstats")
      .outputMode(OutputMode.Update).start()
    mem.addData(EventStreams.Event(1, 100, "click", 2.0),
      EventStreams.Event(2, 100, "view", 3.0))
    q.processAllAvailable()
    mem.addData(EventStreams.Event(3, 100, "click", 5.0),
      EventStreams.Event(4, 200, "click", 7.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("userstats")
      .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(last == Set((100L, 3L, 10.0), (200L, 1L, 7.0)))
  }

  test("latestUserSnapshot: streaming upsert view; out-of-order arrivals are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.latestUserSnapshot(mem.toDS())
      .writeStream.format("memory").queryName("usersnap")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(EventStreams.Event(5, 100, "view", 1.0),
        EventStreams.Event(2, 100, "click", 9.0)) // within-batch: 5 wins
      q.processAllAvailable()
      // late arrival BELOW the held version must not regress the snapshot
      mem.addData(EventStreams.Event(3, 100, "click", 7.0),
        EventStreams.Event(1, 200, "signup", 4.0))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(8, 100, "purchase", 2.0)) // advances
      q.processAllAvailable()
      // memory sink in Update mode appends each emission; the LAST row
      // per user (max event_id emitted) is the current snapshot
      val last = spark.table("usersnap")
        .groupBy("user_id")
        .agg(max(struct(col("event_id"), col("event_type"), col("value"))).as("s"))
        .select(col("user_id"), col("s.event_id"), col("s.event_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(last == Set((100L, 8L, "purchase"), (200L, 1L, "signup")))
      // the late batch emitted the UNCHANGED snapshot for user 100
      // (event_id 5), not the stale record (3)
      val emitted = spark.table("usersnap")
        .filter(col("user_id") === 100).select("event_id")
        .collect().map(_.getLong(0)).toSet
      assert(emitted == Set(5L, 8L) && !emitted.contains(3L))
    } finally q.stop()
  }

  test("B24: transformWithState (new API) matches mapGroupsWithState results") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs multi-column-family state → RocksDB provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserStatsTws(mem.toDS())
      .writeStream.format("memory").queryName("userstats_tws")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(EventStreams.Event(1, 100, "click", 2.0),
        EventStreams.Event(2, 100, "view", 3.0))
      q.processAllAvailable()
      mem.addData(EventStreams.Event(3, 100, "click", 5.0),
        EventStreams.Event(4, 200, "click", 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("userstats_tws")
      .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(last == Set((100L, 3L, 10.0), (200L, 1L, 7.0)))
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("B20: file-source streaming over the real events parquet") {
    // file stream sources take directories; stage the single file into one
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStreams.readStream(spark, dir.toString)
    assert(stream.isStreaming)
    val q = EventStreams.tumblingCounts(stream, "1 hour")
      .writeStream.format("memory").queryName("file_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val out = spark.table("file_stream")
      assert(out.count() > 0)
      // streaming result equals the batch result of the same transform
      val batch = EventStreams.tumblingCounts(
        graft.core.Tables.loadEvents(spark, "/root/testdata/sf0.001"), "1 hour")
      assert(out.collect().toSet == batch.collect().toSet)
    } finally q.stop()
  }

  test("B20/B24: parquet sink + checkpoint recovery keeps dedup state across restart") {
    val in = java.nio.file.Files.createTempDirectory("sink-in")
    val out = java.nio.file.Files.createTempDirectory("sink-out").resolve("data")
    val ckpt = java.nio.file.Files.createTempDirectory("sink-ckpt")

    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(in.resolve(name).toString)

    // batch 1: two events (+ an in-batch duplicate id)
    writeBatch("b1", Seq(ev(1, 1), ev(1, 1), ev(2, 3)))
    val stream1 = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.rawSchema).parquet(s"$in/*"))
    val q1 = EventStreams.writeParquetStream(
      EventStreams.dedupWithinWatermark(stream1, "10 minutes"),
      out.toString, ckpt.toString)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out.toString).select("event_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))

    // batch 2 arrives while the query is DOWN; restart from the checkpoint:
    // the replayed id=2 must stay deduped (state recovered), id=5 appended
    writeBatch("b2", Seq(ev(2, 3), ev(5, 6)))
    val stream2 = EventStreams.withEventTime(
      spark.readStream.schema(EventStreams.rawSchema).parquet(s"$in/*"))
    val q2 = EventStreams.writeParquetStream(
      EventStreams.dedupWithinWatermark(stream2, "10 minutes"),
      out.toString, ckpt.toString)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(out.toString).select("event_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 5L))
  }

  test("batch≡stream parity: the ORACLED q34/q35 results reproduce through the streaming path") {
    // r6 verdict item 5: q34/q35 are DuckDB-oracled in batch shape; this
    // test replays the same events parquet through readStream and asserts
    // the streaming sink contents equal those oracled DataFrames
    // row-for-row — closing the loop batch-oracle ⇒ stream.
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("events-parity")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStreams.readStream(spark, dir.toString)

    def runComplete(name: String,
        t: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Set[Row] = {
      val q = t(stream).writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete).start()
      try { q.processAllAvailable(); spark.table(name).collect().toSet }
      finally q.stop()
    }

    val sDaily = runComplete("parity_daily", EventStreams.dailyCounts)
    val bDaily = graft.SparkEntry.queries("q34_events_daily")(spark, sf).collect()
    assert(bDaily.nonEmpty && sDaily == bDaily.toSet)

    val sSess = runComplete("parity_sess", df =>
      EventStreams.sessionCounts(df, "30 minutes")
        .select(col("user_id"), col("sess_start"), col("sess_end"), col("n_events")))
    val bSess = graft.SparkEntry.queries("q35_events_sessions")(spark, sf).collect()
    assert(bSess.nonEmpty && sSess == bSess.toSet)

    // q136's stream-stream interval join (watermarked, append mode): the
    // streaming sink must emit exactly the oracled batch pair set
    val qAttr = EventStreams.attributedClicks(stream).writeStream
      .format("memory").queryName("parity_attr").outputMode(OutputMode.Append).start()
    val sAttr =
      try { qAttr.processAllAvailable(); spark.table("parity_attr").collect().toSet }
      finally qAttr.stop()
    val bAttr = graft.SparkEntry.queries("q136_attribution")(spark, sf).collect()
    assert(bAttr.nonEmpty && sAttr == bAttr.toSet)
  }

  test("B20: batch and streaming share the same transform (events table)") {
    val batch = graft.core.Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val agg = EventStreams.tumblingCounts(batch, "1 hour")
    assert(agg.count() > 0)
    val props = EventStreams.withProps(batch).filter(col("k").isNotNull)
    assert(props.count() > 0)
  }
}
