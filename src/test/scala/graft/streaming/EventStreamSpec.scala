package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Runtime proof that the streaming transforms are genuinely incremental:
  * feed events through a MemoryStream in multiple micro-batches and
  * assert the final state equals the batch twin on the same data. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  private val sample = Seq(
    (1L, ts(1), 10L, "click", 1.0, "{}"),
    (2L, ts(4), 10L, "click", 2.0, "{}"),
    (3L, ts(11), 11L, "view", 3.0, "{}"),
    (4L, ts(12), 10L, "click", 4.0, "{}"),
    (5L, ts(25), 11L, "view", 5.0, "{}"),
    (6L, ts(59), 12L, "error", 6.0, "{}"))

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("tumblingStats over MemoryStream (2 micro-batches) equals batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.tumblingStats(streamDf)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      mem.addData(sample.take(3))
      q.processAllAvailable()
      mem.addData(sample.drop(3))
      q.processAllAvailable()
      val streamed = rows(
        spark.table("tumbling_test").orderBy("win_start", "event_type"))
      val batch = rows(
        EventStream.tumblingStats(toDf(sample)).orderBy("win_start", "event_type"))
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("tumblingStats under a real file readStream (AvailableNow) equals batch") {
    val sfDir = "/root/testdata/sf0.001"
    // assume, not if: a missing fixture must surface as CANCELED, not as
    // a silently green test that asserted nothing
    assume(new java.io.File(s"$sfDir/events.parquet").exists(),
      s"$sfDir/events.parquet missing")
    locally {
      val batchDf = graft.Tables.events(spark, sfDir) // sets nanosAsLong conf
      // the streaming file source wants a DIRECTORY; stage the fixture file
      val dir = java.nio.file.Files.createTempDirectory("stream_events")
      java.nio.file.Files.copy(
        java.nio.file.Path.of(s"$sfDir/events.parquet"),
        dir.resolve("part-0.parquet"))
      val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val streamRaw = spark.readStream.schema(rawSchema)
        .parquet(dir.toString)
      val streamDf = graft.Tables.normalizeTs(streamRaw)
      val q = EventStream.tumblingStats(streamDf)
        .writeStream.format("memory").queryName("file_stream_test")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination(120000)
        val streamed = rows(
          spark.table("file_stream_test").orderBy("win_start", "event_type"))
        val batch = rows(
          EventStream.tumblingStats(batchDf).orderBy("win_start", "event_type"))
        assert(streamed == batch)
        assert(streamed.nonEmpty)
      } finally q.stop()
    }
  }

  test("sessionStats merges events within the 5-minute gap (batch semantics)") {
    // user 10: events at 1,4 (merge), 12 (new) → 2 sessions, max 2 events
    // user 11: events at 11, 25 → 2 sessions of 1
    val out = EventStream.sessionStats(toDf(sample)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == ((2L, 3L, 2L)))
    assert(out(11L) == ((2L, 2L, 1L)))
    assert(out(12L) == ((1L, 1L, 1L)))
  }

  test("sessionWindowBounds: start = first event, end = last event + gap " +
    "(Spark session_window semantics, the q74 oracle's island form)") {
    val out = EventStream.sessionWindowBounds(toDf(sample)).collect()
      .map(r => (r.getLong(2), r.getTimestamp(0), r.getTimestamp(1), r.getLong(3)))
    // user 10: events at 1,4 merge (gap < 5min) → [01:00, 09:00), then 12
    val u10 = out.filter(_._1 == 10L)
    assert(u10.length == 2)
    assert(u10(0)._2 == ts(1) && u10(0)._3 == ts(9) && u10(0)._4 == 2L)
    assert(u10(1)._2 == ts(12) && u10(1)._3 == ts(17) && u10(1)._4 == 1L)
  }

  test("sessionWindows (the streaming-capable stage) runs as a real " +
    "streaming query and its final state equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.sessionWindows(streamDf)
      .writeStream.format("memory").queryName("session_win_test")
      .outputMode("complete").start()
    try {
      mem.addData(sample.take(3))
      q.processAllAvailable()
      mem.addData(sample.drop(3))
      q.processAllAvailable()
      val streamed = rows(spark.table("session_win_test")
        .select(col("session_window.start"), col("user_id"), col("n_events"))
        .orderBy("start", "user_id"))
      val batch = rows(EventStream.sessionWindows(toDf(sample))
        .select(col("session_window.start"), col("user_id"), col("n_events"))
        .orderBy("start", "user_id"))
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("dedupedEvents on a BATCH read is the id-exact dedup twin " +
    "(dropDuplicatesWithinWatermark is streams-only in Spark)") {
    val replayed = sample ++ sample.take(3)
    val out = EventStream.dedupedEvents(toDf(replayed))
    assert(out.count() == sample.length.toLong)
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      sample.map(_._1).sorted)
  }

  test("dedupReplayStats: a fully doubled input aggregates to the " +
    "single-copy truth (the q107 oracle shape)") {
    val out = EventStream.dedupReplayStats(toDf(sample)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // single-copy truth from the fixture: click={1,2,4} user 10,
    // view={3,5} user 11, error={6} user 12
    assert(out == Seq(
      ("click", 3L, 1L, 7.0),
      ("error", 1L, 1L, 6.0),
      ("view", 2L, 1L, 8.0)), out.toString)
  }

  test("dedupedEvents drops replayed ids across micro-batches (at-least-once → exactly-once)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.dedupedEvents(streamDf)
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(sample.take(4))
      q.processAllAvailable()
      mem.addData(sample.take(2))  // replay of batch-1 events
      mem.addData(sample.drop(4))  // plus genuinely new ones
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == sample.map(_._1).sorted) // each id exactly once
    } finally q.stop()
  }

  test("userRunningCounts: flatMapGroupsWithState accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.userRunningCounts(streamDf)
      .writeStream.format("memory").queryName("running_test")
      .outputMode("update").start()
    try {
      mem.addData(sample.take(4)) // user 10: 3 events (1+2+4), user 11: 1
      q.processAllAvailable()
      mem.addData(sample.drop(4)) // user 11: +1, user 12: +1
      q.processAllAvailable()
      // update-mode sink appends one row per key per batch; the LAST row
      // per user carries the accumulated state
      val last = spark.table("running_test")
        .groupBy("user_id")
        .agg(max(struct(col("events_seen"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.events_seen"), col("s.total_value"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(last(10L) == ((3L, 7.0)))  // 1.0 + 2.0 + 4.0
      assert(last(11L) == ((2L, 8.0)))  // 3.0 + 5.0 across two batches
      assert(last(12L) == ((1L, 6.0)))
    } finally q.stop()
  }

  test("userRunningCounts evicts a key once the watermark passes its " +
    "last activity + TTL, and keys within the horizon keep accumulating") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // TTL 30 min, watermark delay 1 h (inside userRunningCounts)
    val q = EventStream.userRunningCounts(streamDf, idleTtlMinutes = 30)
      .writeStream.format("memory").queryName("ttl_test")
      .outputMode("update").start()
    try {
      // b1: user 10 active at 00:01/00:04 (timeout arms at 00:34),
      //     user 11 at 00:11 (times out 00:41)
      mem.addData(Seq(
        (1L, at("00:01:00"), 10L, "click", 1.0, "{}"),
        (2L, at("00:04:00"), 10L, "click", 2.0, "{}"),
        (3L, at("00:11:00"), 11L, "view", 3.0, "{}")))
      q.processAllAvailable()
      // b2: user 11 again at 02:30 — re-arms ITS timeout to 03:00; after
      // this batch the watermark is 02:30 − 1 h = 01:30, past user 10's
      mem.addData(Seq((4L, at("02:30:00"), 11L, "view", 5.0, "{}")))
      q.processAllAvailable()
      // b3: unrelated user 12 — processed AT watermark 01:30, so user
      // 10's state (timeout 00:34) is evicted during this batch; user
      // 11's (timeout 03:00) survives
      mem.addData(Seq((5L, at("03:00:00"), 12L, "error", 6.0, "{}")))
      q.processAllAvailable()
      // b4: both users return at 03:30 (watermark now 02:00) — user 10
      // restarts from zero, user 11 continues its accumulator
      mem.addData(Seq(
        (6L, at("03:30:00"), 10L, "click", 100.0, "{}"),
        (7L, at("03:30:00"), 11L, "view", 7.0, "{}")))
      q.processAllAvailable()
      val byUser = spark.table("ttl_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
      // user 10: accumulated to (2, 3.0), evicted, restarted at (1, 100.0)
      assert(byUser(10L).contains((2L, 3.0)))
      assert(byUser(10L).contains((1L, 100.0)),
        s"state must restart after TTL eviction: ${byUser(10L)}")
      assert(!byUser(10L).contains((3L, 103.0)),
        "an evicted key must NOT continue its old accumulator")
      // user 11: never idle past the TTL horizon — counts survive
      assert(byUser(11L).contains((3L, 15.0)), s"${byUser(11L)}")
    } finally q.stop()
  }

  test("sessionQuota: budget continues across micro-batches, a gap opens " +
    "a new session, an evicted key restarts, streaming equals batch") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val rows = Seq(
      // b1: user 10 burst — k=2 admits e1/e2, rejects e3
      Seq((1L, at("00:01:00"), 10L, "click", 1.0, "{}"),
        (2L, at("00:02:00"), 10L, "click", 1.0, "{}"),
        (3L, at("00:03:00"), 10L, "click", 1.0, "{}"),
        (6L, at("00:01:00"), 11L, "view", 1.0, "{}")),
      // b2: same session resumes in a LATER batch — still over budget
      Seq((4L, at("00:04:00"), 10L, "click", 1.0, "{}")),
      // b3: 16-min gap -> new session, budget resets (state survived)
      Seq((5L, at("00:20:00"), 10L, "click", 1.0, "{}")),
      // b4: watermark pusher — user 11's state (timeout 00:06) evicts
      Seq((8L, at("03:00:00"), 12L, "error", 1.0, "{}")),
      // b5: user 11 returns after eviction -> fresh session
      Seq((7L, at("03:30:00"), 11L, "view", 1.0, "{}")))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.sessionQuota(streamDf, k = 2)
      .writeStream.format("memory").queryName("quota_test")
      .outputMode("append").start()
    try {
      rows.foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = spark.table("quota_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == Set(
        (10L, 1L, 1L), (10L, 2L, 2L),          // burst capped at k=2
        (10L, 5L, 1L),                         // new session after the gap
        (11L, 6L, 1L), (11L, 7L, 1L),          // restart after eviction
        (12L, 8L, 1L)), streamed.toString)
      // the batch twin on the SAME rows (one pass, no eviction) agrees
      val batch = EventStream.sessionQuotaBatch(toDf(rows.flatten), k = 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch == streamed, s"batch $batch vs streamed $streamed")
    } finally q.stop()
  }

  test("userRunningCounts on a BATCH Dataset spans the whole input " +
    "(timeouts never fire in batch — the TTL is a streaming-only bound)") {
    val out = EventStream.userRunningCounts(toDf(sample)).collect()
      .map(r => r.user_id -> ((r.events_seen, r.total_value))).toMap
    assert(out(10L) == ((3L, 7.0)))
    assert(out(11L) == ((2L, 8.0)))
    assert(out(12L) == ((1L, 6.0)))
  }

  test("two-stage streaming session rollup (append-mode sessionWindows → " +
    "foreachBatch parquet sink → downstream sessionRollup) equals batch " +
    "sessionStats") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val base = java.nio.file.Files.createTempDirectory("two_stage").toString
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.sessionStatsTwoStage(
      streamDf, s"$base/sessions", s"$base/ckpt")
    try {
      mem.addData(sample.take(3))
      q.processAllAvailable()
      mem.addData(sample.drop(3))
      q.processAllAvailable()
      // append mode emits a session only once the WATERMARK closes it —
      // two far-future sentinel events advance the watermark past every
      // real session's end (sentinel 2 closes sentinel 1's session too)
      mem.addData(Seq((900L, at("08:00:00"), 999L, "click", 0.0, "{}")))
      q.processAllAvailable()
      mem.addData(Seq((901L, at("12:00:00"), 999L, "click", 0.0, "{}")))
      q.processAllAvailable()
      val streamed = rows(
        EventStream.sessionRollup(spark.read.parquet(s"$base/sessions"))
          .filter(col("user_id") =!= 999L).orderBy("user_id"))
      val batch = rows(EventStream.sessionStats(toDf(sample)).orderBy("user_id"))
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // append semantics: each finalized session appeared exactly once
      val sess = spark.read.parquet(s"$base/sessions")
      assert(sess.count() ==
        sess.select("user_id", "win_start").distinct().count())
    } finally q.stop()
  }

  test("clickAttribution stream-stream join over micro-batches equals " +
    "the batch twin (clicks arrive in a different batch than purchases)") {
    implicit val sqlCtx = spark.sqlContext
    val attribution = Seq(
      (1L, ts(5), 10L, "click", 1.0, "{}"),
      (2L, ts(20), 10L, "click", 1.0, "{}"),
      (3L, ts(30), 10L, "purchase", 9.0, "{}"), // joins clicks at 5 and 20
      (4L, ts(31), 11L, "click", 1.0, "{}"),    // other user
      (5L, ts(45), 11L, "purchase", 9.0, "{}"), // joins click at 31
      (6L, ts(50), 12L, "purchase", 9.0, "{}")) // no clicks: absent (inner)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.clickAttribution(streamDf)
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      mem.addData(attribution.take(2)) // clicks first...
      q.processAllAvailable()
      mem.addData(attribution.drop(2)) // ...purchases in a later batch
      q.processAllAvailable()
      val streamed = rows(spark.table("attr_test").orderBy("event_id", "cts"))
      val batch = rows(EventStream.clickAttribution(toDf(attribution))
        .orderBy("event_id", "cts"))
      assert(streamed == batch)
      assert(streamed.map(_.head).toSet == Set(3L, 5L)) // 6 has no clicks
    } finally q.stop()
  }

  test("slidingStats: each event contributes to exactly two 10/5 windows") {
    val out = EventStream.slidingStats(toDf(sample))
    val totalContribs = out.agg(sum("cnt")).collect().head.getLong(0)
    assert(totalContribs == sample.size * 2L)
  }
}
