package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, unix_micros}
import graft.streaming.Sessionize

class SessionizeSpec extends SparkSpec {

  private def ts(hour: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")
  private def sec(hour: Int, min: Int): Long = ts(hour, min).getTime / 1000

  test("flatMapGroupsWithState closes sessions on gap and flushes on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF.toDF("ts", "user_id")

    val query = Sessionize.streamingSessions(events).writeStream
      .format("memory").queryName("session_sink").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one open session); user 2: one event
      stream.addData((ts(0, 0), 1L), (ts(0, 10), 1L), (ts(0, 5), 2L))
      query.processAllAvailable()
      assert(spark.table("session_sink").count() == 0, "no session closed yet")

      // user 1 returns after a >30 min gap: the first session closes,
      // emitted by the function itself; the same trigger advances the
      // watermark to 01:00, which fires user 2's 00:35 event-time
      // timeout and flushes their idle session from state
      stream.addData((ts(2, 0), 1L))
      query.processAllAvailable()
      val afterGap = spark.table("session_sink").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(afterGap == Set(
        (1L, sec(0, 0), sec(0, 10), 2L),
        (2L, sec(0, 5), sec(0, 5), 1L)), s"got $afterGap")

      // user 1's open 02:00 session closes on the next arrival
      stream.addData((ts(9, 0), 1L))
      query.processAllAvailable()
      val flushed = spark.table("session_sink").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(flushed.contains((1L, sec(2, 0), sec(2, 0), 1L)), s"got $flushed")
    } finally query.stop()
  }

  test("out-of-order events within a micro-batch are sessionized in time order") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF.toDF("ts", "user_id")
    val query = Sessionize.streamingSessions(events).writeStream
      .format("memory").queryName("session_sink2").outputMode("append").start()
    try {
      // arrival order scrambled: 01:30, 00:00, 00:15 — time order has a
      // 75-min gap between 00:15 and 01:30
      stream.addData((ts(1, 30), 7L), (ts(0, 0), 7L), (ts(0, 15), 7L))
      query.processAllAvailable()
      val got = spark.table("session_sink2").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(got == Set((7L, sec(0, 0), sec(0, 15), 2L)),
        "first session closed with both early events; 01:30 stays open")
    } finally query.stop()
  }

  test("cross-batch disorder within the watermark cannot regress session bounds") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF.toDF("ts", "user_id")
    val query = Sessionize.streamingSessions(events).writeStream
      .format("memory").queryName("session_sink3").outputMode("append").start()
    try {
      // batch 1 opens a session at 02:00; batch 2 delivers a LATE event
      // (01:50, still within the watermark) — it must extend the session
      // backwards (start=01:50) without moving last_sec back
      stream.addData((ts(2, 0), 9L))
      query.processAllAvailable()
      stream.addData((ts(1, 50), 9L))
      query.processAllAvailable()
      // advance the watermark far enough to flush the session
      stream.addData((ts(9, 0), 9L))
      query.processAllAvailable()
      stream.addData((ts(18, 0), 9L))
      query.processAllAvailable()
      val got = spark.table("session_sink3").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(got.contains((9L, sec(1, 50), sec(2, 0), 2L)),
        s"late event must widen the session to [01:50, 02:00], got $got")
    } finally query.stop()
  }

  test("a straggler older than the open session by more than the gap becomes its own session") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF.toDF("ts", "user_id")
    val query = Sessionize.streamingSessions(events).writeStream
      .format("memory").queryName("session_sink4").outputMode("append").start()
    try {
      // batch 1 opens [02:00]; batch 2 delivers 01:10 — inside the 1 h
      // watermark (not dropped) but more than the 30-min gap before the
      // session start: batch semantics keeps them as separate sessions
      stream.addData((ts(2, 0), 11L))
      query.processAllAvailable()
      stream.addData((ts(1, 10), 11L))
      query.processAllAvailable()
      stream.addData((ts(9, 0), 11L), (ts(18, 0), 11L))
      query.processAllAvailable()
      val got = spark.table("session_sink4").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(got.contains((11L, sec(1, 10), sec(1, 10), 1L)),
        s"straggler closes as its own singleton, got $got")
      assert(got.contains((11L, sec(2, 0), sec(2, 0), 1L)),
        s"the open session is not fused with the straggler, got $got")
    } finally query.stop()
  }

  test("consecutive stragglers within the gap fold into one session, not singletons") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF.toDF("ts", "user_id")
    val query = Sessionize.streamingSessions(events).writeStream
      .format("memory").queryName("session_sink5").outputMode("append").start()
    try {
      // batch 1 opens [02:00] (watermark → 01:00); batch 2 delivers two
      // stragglers 01:05 and 01:20 — inside the watermark, both >gap
      // older than the open session, but within the gap of EACH OTHER:
      // batch semantics merges them into one session
      stream.addData((ts(2, 0), 13L))
      query.processAllAvailable()
      stream.addData((ts(1, 5), 13L), (ts(1, 20), 13L))
      query.processAllAvailable()
      val got = spark.table("session_sink5").as[(Long, Long, Long, Long)]
        .collect().toSet
      assert(got.contains((13L, sec(1, 5), sec(1, 20), 2L)),
        s"stragglers within GapSec of each other fold into one session, got $got")
      assert(!got.exists(r => r._2 == sec(1, 5) && r._4 == 1L),
        s"no singleton for the folded straggler, got $got")
    } finally query.stop()
  }

  test("native session_window agrees with the custom-state sessionizer per user") {
    // same corpus, two independent implementations: the built-in merging
    // session windows and the lag/cumsum assignment — session COUNTS per
    // user must agree whenever no gap delta sits exactly on the 30-min
    // boundary at differing precisions (µs here vs the summary's seconds
    // truncation can shift a boundary, so compare the µs-exact count
    // against a µs-exact reference)
    val native = rowsOf(Sessionize.sessionWindows(spark, SF))
      .groupBy(_.getLong(0)).view.mapValues(_.size).toMap
    val ref = rowsOf(Tables.events(spark, SF)
      .select(col("user_id"), unix_micros(col("ts")).as("us")))
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues { evs =>
        val sorted = evs.map(_._2).sorted
        1 + sorted.zip(sorted.tail).count { case (a, b) => b - a > 1800000000L }
      }.toMap
    assert(native == ref, "merging windows == gap-delta counting")
    // window end is last event + gap by contract
    rowsOf(Sessionize.sessionWindows(spark, SF)).foreach { r =>
      assert(r.getLong(r.fieldIndex("end_us")) >
        r.getLong(r.fieldIndex("start_us")))
    }
  }

  test("session_window works identically under a streaming watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val q = Sessionize.sessionWindowAgg(
        stream.toDF.toDF("ts", "user_id").withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("sw_sink").outputMode("append").start()
    try {
      stream.addData((ts(0, 0), 21L), (ts(0, 10), 21L), (ts(2, 0), 21L))
      q.processAllAvailable()
      stream.addData((ts(9, 0), 21L))
      q.processAllAvailable()
      val got = spark.table("sw_sink").as[(Long, Long, Long, Long)].collect().toSet
      val s0 = ts(0, 0).getTime * 1000L
      assert(got.contains((21L, s0, ts(0, 10).getTime * 1000L + 1800000000L, 2L)),
        s"first session [00:00, 00:10+gap) with 2 events, got $got")
    } finally q.stop()
  }

  test("batch session summary aggregates the windowed session assignment") {
    val sessions = rowsOf(relational.Tpch.qEventsSessionize(spark, SF))
      .groupBy(_.getLong(0))
    val summary = rowsOf(Sessionize.sessionSummary(spark, SF))
      .map(r => r.getLong(0) -> r).toMap
    assert(summary.keySet == sessions.keySet)
    sessions.foreach { case (user, rows) =>
      val s = summary(user)
      assert(s.getLong(s.fieldIndex("n_sessions")) == rows.size)
      assert(s.getLong(s.fieldIndex("n_events_total")) ==
        rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum)
    }
  }
}
