package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Windowed
import graft.pipeline.Dedup

class StreamingSpec extends SparkSpec {

  private def ts(hour: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")

  test("streaming windowed agg equals the batch plan once the watermark closes windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val events = stream.toDF.toDF("ts", "event_type", "value")

    val query = Windowed.streaming(events).writeStream
      .format("memory").queryName("windowed_sink").outputMode("append").start()
    try {
      val batch1 = Seq(
        (ts(0, 10), "click", 1.5), (ts(0, 20), "click", 2.5),
        (ts(0, 40), "error", 4.0), (ts(1, 15), "click", 8.0))
      stream.addData(batch1: _*)
      query.processAllAvailable()
      // watermark = 01:15 − 2 h < hour-0 window end ⇒ nothing emitted yet
      assert(spark.table("windowed_sink").count() == 0)

      // advance event time far enough to close the hour-0 and hour-1 windows
      stream.addData((ts(5, 0), "click", 1.0))
      query.processAllAvailable()
      stream.addData((ts(9, 0), "click", 1.0))
      query.processAllAvailable()

      val got = spark.table("windowed_sink")
        .select("window_start_sec", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val expect = Windowed.windowedAgg(
        (batch1 :+ ((ts(5, 0), "click", 1.0))).toDF("ts", "event_type", "value"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      // every window the watermark has passed must match the batch plan
      got.foreach { case (k, v) =>
        assert(expect(k) == v, s"window $k: stream=$v batch=${expect(k)}")
      }
      val hour0 = ts(0, 0).getTime / 1000
      assert(got.contains((hour0, "click")) && got.contains((hour0, "error")),
        "hour-0 windows emitted after watermark passed")
      assert(got((hour0, "click")) == ((2L, 4.0)))
    } finally query.stop()
  }

  test("streaming dedup drops same-content payloads across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val q = Windowed.streamingDedup(stream.toDF.toDF("ts", "payload"))
      .select("payload").writeStream
      .format("memory").queryName("dedup_sink").outputMode("append").start()
    try {
      stream.addData((ts(0, 0), "doc-a"), (ts(0, 1), "doc-b"), (ts(0, 2), "doc-a"))
      q.processAllAvailable()
      // duplicate arriving in a LATER micro-batch, still within watermark
      stream.addData((ts(0, 30), "doc-a"), (ts(0, 31), "doc-c"))
      q.processAllAvailable()
      val seen = spark.table("dedup_sink").as[String].collect().sorted.toSeq
      assert(seen == Seq("doc-a", "doc-b", "doc-c"),
        s"one row per distinct payload, got $seen")
    } finally q.stop()
  }

  test("canonical dedup collapses token-order variants, keeps genuinely new payloads") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val q = Windowed.canonicalDedupStreaming(stream.toDF.toDF("ts", "payload"))
      .select("payload").writeStream
      .format("memory").queryName("canon_sink").outputMode("append").start()
    try {
      stream.addData((ts(0, 0), "k1 v1 k2 v2"), (ts(0, 1), "k3 v3"))
      q.processAllAvailable()
      // same event re-serialized in a different field order -> dropped;
      // a payload with genuinely different tokens -> kept
      stream.addData((ts(0, 30), "k2 v2 k1 v1"), (ts(0, 31), "k1 v1 k2 v9"))
      q.processAllAvailable()
      val seen = spark.table("canon_sink").as[String].collect().sorted.toSeq
      assert(seen == Seq("k1 v1 k2 v2", "k1 v1 k2 v9", "k3 v3"),
        s"order variant must collapse, new payload must survive: $seen")
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks within the lookback only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = streaming.StreamJoin.intervalJoinStreaming(
        purchases.toDF.toDF("ts", "user_id", "event_id"),
        clicks.toDF.toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName("sj_sink").outputMode("append").start()
    try {
      // user 1: click at 09:00 (inside lookback of the 09:30 purchase),
      // click at 08:00 (outside), user 2's click must not match user 1
      clicks.addData((ts(8, 0), 1L, 100L), (ts(9, 0), 1L, 101L), (ts(9, 10), 2L, 102L))
      purchases.addData((ts(9, 30), 1L, 500L))
      q.processAllAvailable()
      val got = spark.table("sj_sink").as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 500L, 101L)),
        s"only the in-window same-user click joins, got $got")
    } finally q.stop()
  }

  test("sliding windows replicate every event into exactly duration/slide windows") {
    val r = rowsOf(Windowed.slidingBatch(spark, SF))
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getLong(0) % 1800 == 0,
      "window starts on the 30-min grid"))
    val total = r.map(_.getLong(r.head.fieldIndex("n_events"))).sum
    assert(total == 2 * Tables.events(spark, SF).count(),
      "each event lands in exactly 2 overlapping windows")
  }

  test("streaming sliding agg equals the batch plan once windows close") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val q = Windowed.slidingStreaming(stream.toDF.toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("sliding_sink")
      .outputMode("append").start()
    try {
      val data = Seq((ts(0, 10), "click", 1.0), (ts(0, 40), "click", 2.0))
      stream.addData(data: _*)
      q.processAllAvailable()
      stream.addData((ts(9, 0), "click", 1.0)) // advance watermark far past hour 0
      q.processAllAvailable()
      val got = spark.table("sliding_sink")
        .select("window_start_sec", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val expect = Windowed.slidingAgg(data.toDF("ts", "event_type", "value"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      expect.foreach { case (k, v) =>
        assert(got.get(k).contains(v), s"window $k: stream=${got.get(k)} batch=$v")
      }
      // the 00:00 window holds both events; the 00:30 straddler only the second
      val h0 = ts(0, 0).getTime / 1000
      assert(got((h0, "click")) == ((2L, 3.0)))
      assert(got((h0 + 1800, "click")) == ((1L, 2.0)))
    } finally q.stop()
  }

  test("streaming distinct-users chain equals batch counts once windows close") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val q = Windowed.distinctUsersStreaming(stream.toDF.toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("distinct_users_sink")
      .outputMode("append").start()
    try {
      // hour 0: users 1,1,2 (2 distinct / 3 events); hour 1: user 1 only
      val data = Seq((ts(0, 5), 1L), (ts(0, 25), 1L), (ts(0, 45), 2L),
        (ts(1, 10), 1L))
      stream.addData(data: _*)
      q.processAllAvailable()
      stream.addData((ts(9, 0), 7L)) // watermark far past hours 0-1
      q.processAllAvailable()
      val got = spark.table("distinct_users_sink")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val h0 = ts(0, 0).getTime / 1000
      assert(got(h0) == ((2L, 3L)))
      assert(got(h0 + 3600) == ((1L, 1L)))
      val expect = Windowed.distinctUsersAgg(data.toDF("ts", "user_id"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      expect.foreach { case (k, v) =>
        assert(got.get(k).contains(v), s"window $k: stream=${got.get(k)} batch=$v")
      }
    } finally q.stop()
  }

  test("streaming SCD2 closes intervals exactly when the watermark passes the successor") {
    import spark.implicits._
    import graft.streaming.{CdcCompact, StreamDrops}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Long, Double)]
    val drops = StreamDrops.accumulator(spark, "cdc_scd2_test")
    val q = CdcCompact.streamingScd2(
        stream.toDF.toDF("ts", "user_id", "event_id", "value"), drops)
      .writeStream.format("memory").queryName("scd2_sink")
      .outputMode("append").start()
    try {
      // three versions, delivered OUT OF ORDER
      stream.addData((ts(0, 40), 1L, 2L, 20.0), (ts(0, 10), 1L, 1L, 10.0))
      q.processAllAvailable()
      assert(spark.table("scd2_sink").count() == 0) // wm < t2, nothing closes
      stream.addData((ts(1, 20), 1L, 3L, 30.0), (ts(2, 0), 99L, 90L, 0.0))
      q.processAllAvailable() // wm = 2:00 - 1h = 1:00 ≥ t2 → first closes
      stream.addData((ts(9, 0), 99L, 91L, 0.0)) // wm far past t3
      q.processAllAvailable()
      val h = (hh: Int, mm: Int) => ts(hh, mm).getTime / 1000
      val got = spark.table("scd2_sink").filter("user_id = 1")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(got == Set(
        (h(0, 10), h(0, 40), 1L, 10.0),
        (h(0, 40), h(1, 20), 2L, 20.0))) // t3 stays open — never emitted
      // regression (r15 ADVICE): a version arriving BELOW the watermark
      // (wm is 8:00 here) used to re-sort ahead of the open tail and
      // emit an interval overlapping the history above — it must drop
      stream.addData((ts(0, 20), 1L, 10L, 99.0), (ts(10, 0), 99L, 92L, 0.0))
      q.processAllAvailable()
      assert(spark.table("scd2_sink").filter("user_id = 1").count() == 2,
        "beyond-watermark version is dropped, history never overlaps")
      // r16 verdict task 3: the divergence drop is OBSERVABLE per
      // micro-batch. Two layers: Spark's own state-operator metric
      // counts rows its late-events filter sheds BEFORE the state
      // function (this planted row — measured, batch in=2 dropped=1);
      // the operator's graft.drops accumulator counts the residual
      // class that reaches the function below the EVICTION watermark
      // (asserted by direct drive in the drop-count test below).
      val shedByEngine = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(shedByEngine >= 1L,
        s"the planted late row must appear in numRowsDroppedByWatermark " +
          s"($shedByEngine); operator counter=${drops.acc.value}")
      // equality with the batch plan's CLOSED intervals on the same rows
      val batchEvents = Seq(
        (ts(0, 10), 1L, 1L, 10.0), (ts(0, 40), 1L, 2L, 20.0), (ts(1, 20), 1L, 3L, 30.0))
        .toDF("ts", "user_id", "event_id", "value")
      val expect = batchEvents
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("valid_to_sec", lead(col("sec"), 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("sec"), col("event_id"))))
        .filter(col("valid_to_sec").isNotNull)
        .select(col("sec"), col("valid_to_sec"), col("event_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == expect)
    } finally q.stop()
  }

  test("streaming funnel emits final per-episode stages equal to the batch plan") {
    import spark.implicits._
    import graft.streaming.Funnel
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val q = Funnel.streamingFunnel(stream.toDF.toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode("append").start()
    try {
      // user 1 episode 1: full chain, delivered OUT OF ORDER;
      // episode 2 (after a > 2 h gap): signup + late click (> 1 h → stage 1)
      // user 2: click only (stage 0)
      val evs = Seq(
        (ts(0, 30), 1L, "click"), (ts(0, 5), 1L, "signup"),
        (ts(1, 10), 1L, "purchase"), (ts(0, 50), 1L, "view"),
        (ts(4, 0), 1L, "signup"), (ts(5, 30), 1L, "click"),
        (ts(0, 10), 2L, "click"))
      stream.addData(evs: _*)
      q.processAllAvailable()
      // watermark is 5:30 − 1 h = 4:30: user 2's lone episode (timeout
      // 2:10) is already final, but user 1's buffer (timeout 7:30) is not
      assert(spark.table("funnel_sink").filter("user_id = 1").count() == 0)
      stream.addData((ts(12, 0), 99L, "view")) // watermark far past all gaps
      q.processAllAvailable()
      val got = spark.table("funnel_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      val h = (hh: Int, mm: Int) => ts(hh, mm).getTime / 1000
      assert(got((1L, 1L)) == ((h(0, 5), 3L)))  // full chain
      assert(got((1L, 2L)) == ((h(4, 0), 1L)))  // click 90 min late → signup only
      assert(got((2L, 1L)) == ((h(0, 10), 0L))) // no signup
      // and the batch plan over the same events agrees row for row
      val batch = Funnel.episodeFunnelAgg(spark,
        evs.zipWithIndex.map { case ((t, u, ty), i) => (t, u, ty, i.toLong) }
          .toDF("ts", "user_id", "event_type", "event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      batch.foreach { case (k, v) =>
        assert(got.get(k).contains(v), s"episode $k: stream=${got.get(k)} batch=$v")
      }
    } finally q.stop()
  }

  test("stateful timeouts clamp ahead of the eviction watermark (r15 ADVICE)") {
    // A key whose STORED state predates the current watermark (buffered
    // under an older watermark; the entry drop only filters arrivals)
    // reaches the timeout re-arm with event times below
    // getCurrentWatermarkMs. Unclamped, last+gap lands at/below the
    // watermark and GroupStateImpl.setTimeoutTimestamp throws, killing
    // the whole query. Drive each named state function directly against
    // a GroupState that enforces the real timeout contract.
    import graft.streaming.{Funnel, FunnelState, Sessionize, OpenSession,
      CdcCompact, KeyVersion, StreamDrops}
    val wm = ts(11, 0).getTime // eviction watermark: 11:00
    val sec5 = ts(5, 0).getTime / 1000
    val stF = new WatermarkedGroupState[FunnelState](wm)
    stF.update(FunnelState(Seq((sec5, "view")))) // buffered under an older wm
    assert(Funnel.funnelUpdate(StreamDrops.Noop)(5L,
      Iterator((ts(11, 30), 5L, "view", ts(11, 30).getTime / 1000)), stF).isEmpty)
    assert(stF.timeoutMs > wm, "funnel timeout clamps ahead of the watermark")
    val stS = new WatermarkedGroupState[OpenSession](wm)
    assert(Sessionize.sessionUpdate(5L,
      Iterator((ts(5, 0), 5L, sec5)), stS).isEmpty)
    assert(stS.timeoutMs > wm, "session timeout clamps ahead of the watermark")
    val stC = new WatermarkedGroupState[KeyVersion](wm)
    stC.update(KeyVersion(sec5, 7L, "click", 1.0, 1L)) // live key, old version
    assert(CdcCompact.compactUpdate(StreamDrops.Noop)(5L,
      Iterator.empty, stC).isEmpty)
    assert(stC.timeoutMs > wm, "compactor timeout clamps ahead of the watermark")
  }

  test("state functions drop beyond-watermark rows and count them (r15/r16 ADVICE)") {
    import graft.streaming.{CdcCompact, Scd2State, KeyVersion, ContributionCap,
      CapState, Funnel, FunnelState, StreamDrops}
    class Tally extends StreamDrops.Counter {
      var n = 0L
      override def add(x: Long): Unit = n += x
    }
    val wm = ts(11, 0).getTime
    // a version below the watermark used to re-sort ahead of the open
    // tail and emit an interval overlapping already-written history
    val open = Seq((ts(7, 0).getTime / 1000, 1L, 1.0))
    val stV = new WatermarkedGroupState[Scd2State](wm)
    stV.update(Scd2State(open))
    val tV = new Tally
    val outV = CdcCompact.scd2Update(tV)(1L,
      Iterator((ts(0, 20), 1L, ts(0, 20).getTime / 1000, 10L, 99.0)), stV).toSeq
    assert(outV.isEmpty, "no overlapping interval is emitted")
    assert(stV.value.versions == open, "the open tail is untouched")
    assert(tV.n == 1L, "the divergence drop is counted, not silent")
    // a beyond-horizon event for a not-yet-capped user used to be
    // admitted immediately with the next rank, out of event-time order
    val stK = new WatermarkedGroupState[CapState](wm)
    stK.update(CapState(1L, Seq.empty))
    val tK = new Tally
    val outK = ContributionCap.capUpdate(tK)(2L,
      Iterator((ts(1, 0), 2L, ts(1, 0).getTime * 1000L, 91L)), stK).toSeq
    assert(outK.isEmpty, "beyond-watermark event is dropped, not admitted")
    assert(stK.value.nAdmitted == 1L && stK.value.pending.isEmpty)
    assert(tK.n == 1L, "the divergence drop is counted, not silent")
    // r16 ADVICE (medium): a straggler for an already-EVICTED compactor
    // key used to re-create state from its stale version and, one
    // trigger later, emit a CompactedRow OLDER than the one already
    // written — it must drop on entry instead
    val stC = new WatermarkedGroupState[KeyVersion](wm)
    val tC = new Tally
    val outC = CdcCompact.compactUpdate(tC)(5L,
      Iterator((ts(0, 30), 5L, ts(0, 30).getTime / 1000, 3L, "view", 2.0)), stC).toSeq
    assert(outC.isEmpty && stC.getOption.isEmpty,
      "an evicted key's stale straggler must not resurrect state")
    assert(tC.n == 1L, "the divergence drop is counted, not silent")
    // r16 ADVICE (low): a gap-window straggler for a user whose episode
    // already flushed used to open fresh state and emit a spurious
    // one-event episode — it must drop on entry instead
    val stE = new WatermarkedGroupState[FunnelState](wm)
    val tE = new Tally
    val outE = Funnel.funnelUpdate(tE)(6L,
      Iterator((ts(0, 30), 6L, "view", ts(0, 30).getTime / 1000)), stE).toSeq
    assert(outE.isEmpty && stE.getOption.isEmpty,
      "a flushed user's straggler must not open a spurious episode")
    assert(tE.n == 1L, "the divergence drop is counted, not silent")
  }

  test("windowed top-k: dense ranks per window, streaming sums match the batch kernel") {
    // batch entry: ranks dense 1..k, ordered by the exact sum
    val r = rowsOf(Windowed.topkBatch(spark, SF))
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)) == (1L to rows.size.toLong), "dense ranks")
      assert(sorted.size <= Windowed.TopkK)
      val sums = sorted.map(_.getDouble(3))
      assert(sums == sums.sorted.reverse, "ranked by sum desc")
    }
    // streaming path: per-user window sums appended on close equal batch
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val q = Windowed.topkStreaming(stream.toDF.toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("topk_sink")
      .outputMode("append").start()
    try {
      val data = Seq((ts(0, 10), 1L, 5.0), (ts(0, 20), 1L, 2.0),
        (ts(0, 40), 2L, 4.5), (ts(0, 50), 3L, 1.0))
      stream.addData(data: _*)
      q.processAllAvailable()
      stream.addData((ts(9, 0), 9L, 1.0)) // close hour 0
      q.processAllAvailable()
      val got = spark.table("topk_sink")
        .select("window_start_sec", "user_id", "n_events", "sum_value")
        .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getDouble(3)))
        .toMap
      val h0 = ts(0, 0).getTime / 1000
      assert(got((h0, 1L)) == ((2L, 7.0)), "user 1 sums fold across the window")
      assert(got((h0, 2L)) == ((1L, 4.5)) && got((h0, 3L)) == ((1L, 1.0)))
    } finally q.stop()
  }

  test("in-stream ranked top-k: one final emission per closed window, equal to the batch kernel; shard top-ks merge exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data1 = Seq((ts(0, 10), 1L, 5.0), (ts(0, 20), 2L, 6.0))
    val data2 = Seq((ts(0, 25), 1L, 3.0), (ts(0, 30), 3L, 4.0), (ts(0, 40), 4L, 1.0))
    val h0 = ts(0, 0).getTime / 1000
    def drive(shards: Int, sink: String): Array[(Long, Long, Long, Double, Long)] = {
      val stream = MemoryStream[(Timestamp, Long, Double)]
      val q = Windowed.topkStreamingRanked(
          stream.toDF.toDF("ts", "user_id", "value"), shards = shards)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        stream.addData(data1: _*)
        q.processAllAvailable()
        stream.addData(data2: _*) // sums build ACROSS micro-batches
        q.processAllAvailable()
        stream.addData((ts(9, 0), 9L, 1.0)) // watermark closes hour 0
        q.processAllAvailable()
        stream.addData((ts(9, 30), 9L, 1.0)) // further batches: no re-emission
        q.processAllAvailable()
        spark.table(sink)
          .select("window_start_sec", "user_id", "n_events", "sum_value", "rnk")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      } finally q.stop()
    }
    // unsharded: the emission IS the exact per-window top-k
    val got = drive(1, "topk_ranked_sink").filter(_._1 == h0)
    // h0 sums: u1=8.0(2 events), u2=6.0, u3=4.0, u4=1.0 -> k=3 cuts u4
    assert(got.sortBy(_._5).toSeq == Seq(
      (h0, 1L, 2L, 8.0, 1L), (h0, 2L, 1L, 6.0, 2L), (h0, 3L, 1L, 4.0, 3L)),
      s"one ranked emission on window close, k rows, batch-equal sums; got ${got.toSeq}")
    // sharded: each (window, shard) emits its local top-k once; the
    // bounded merge over shards x k rows recovers the global top-k
    val sharded = drive(2, "topk_ranked_sink2").filter(_._1 == h0)
    assert(sharded.length > 3, "two shards emit more than k total candidates")
    val merged = sharded.sortBy(r => (-r._4, r._2)).take(3)
      .zipWithIndex.map { case ((w, u, n, s, _), i) => (w, u, n, s, i + 1L) }
    assert(merged.toSeq == got.sortBy(_._5).toSeq,
      "global top-k == merge of per-shard top-ks")
  }

  test("batch left join keeps clickless purchases as a single null-padded row") {
    val pairs = rowsOf(streaming.StreamJoin.leftJoinBatch(spark, SF))
    assert(pairs.nonEmpty)
    val counts = rowsOf(streaming.StreamJoin.intervalJoinBatch(spark, SF))
      .map(r => r.getLong(1) -> r.getLong(r.fieldIndex("n_recent_clicks"))).toMap
    val byPurchase = pairs.groupBy(_.getLong(1))
    assert(byPurchase.keySet == counts.keySet, "every purchase appears")
    byPurchase.foreach { case (pid, rows) =>
      val cIdx = rows.head.fieldIndex("click_id")
      if (counts(pid) == 0)
        assert(rows.size == 1 && rows.head.isNullAt(cIdx),
          s"purchase $pid: one null-padded row")
      else {
        assert(rows.size.toLong == counts(pid), s"purchase $pid: one row per click")
        rows.foreach(r => assert(!r.isNullAt(cIdx)))
      }
    }
  }

  test("streaming left-outer join null-pads once the watermark retires the purchase") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = streaming.StreamJoin.leftJoinStreaming(
        purchases.toDF.toDF("ts", "user_id", "event_id"),
        clicks.toDF.toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName("slj_sink")
      .outputMode("append").start()
    try {
      // user 1 purchase has an in-window click; user 2 purchase has none
      clicks.addData((ts(9, 0), 1L, 101L))
      purchases.addData((ts(9, 30), 1L, 500L), (ts(9, 40), 2L, 501L))
      q.processAllAvailable()
      // push both watermarks far past purchase time + lookback so the
      // unmatched purchase's state is provably complete, then nudge an
      // extra batch (outer results emit on state eviction)
      clicks.addData((ts(20, 0), 9L, 900L))
      purchases.addData((ts(20, 0), 9L, 901L))
      q.processAllAvailable()
      clicks.addData((ts(23, 0), 9L, 902L))
      purchases.addData((ts(23, 0), 9L, 903L))
      q.processAllAvailable()
      val got = spark.table("slj_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(got.contains((1L, 500L, Some(101L))), s"matched pair emitted: $got")
      assert(got.contains((2L, 501L, None)), s"clickless purchase null-padded: $got")
    } finally q.stop()
  }

  test("CDC batch compaction keeps exactly the newest version per key") {
    val r = rowsOf(streaming.CdcCompact.latestBatch(spark, SF))
    assert(r.nonEmpty)
    assert(r.map(_.getLong(0)).distinct.size == r.size, "one row per key")
    assert(r.map(_.getLong(r.head.fieldIndex("n_updates"))).sum ==
      Tables.events(spark, SF).count(), "every event counted as an update")
    // brute force: the reported version is each user's max (sec, event_id)
    val ev = rowsOf(Tables.events(spark, SF)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id")))
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
      .groupBy(_._1)
    r.foreach { row =>
      val expect = ev(row.getLong(0)).map(e => (e._2, e._3)).max
      assert((row.getLong(row.fieldIndex("last_sec")),
        row.getLong(row.fieldIndex("last_event_id"))) == expect)
    }
  }

  test("streaming CDC compaction emits the latest version once the key quiesces") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val q = streaming.CdcCompact.streamingCompact(
        stream.toDF.toDF("ts", "user_id", "event_id", "event_type", "value"))
      .writeStream.format("memory").queryName("cdc_sink")
      .outputMode("append").start()
    try {
      // user 1 gets two versions (the second, 9:10, must win even though
      // it arrives in the same batch); user 2 one version
      stream.addData(
        (ts(9, 10), 1L, 102L, "update", 2.0),
        (ts(9, 0), 1L, 101L, "create", 1.0),
        (ts(9, 5), 2L, 103L, "create", 3.0))
      q.processAllAvailable()
      assert(spark.table("cdc_sink").count() == 0, "nothing emitted while live")
      // advance the watermark far past 9:10 + quiesce window
      stream.addData((ts(22, 0), 9L, 900L, "create", 0.0))
      q.processAllAvailable()
      stream.addData((ts(23, 0), 9L, 901L, "update", 0.0))
      q.processAllAvailable()
      val got = spark.table("cdc_sink")
        .as[(Long, Long, Long, String, Double, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(got.keySet == Set(1L, 2L), s"both idle keys compacted: ${got.keySet}")
      assert(got(1L) == ((1L, ts(9, 10).getTime / 1000, 102L, "update", 2.0, 2L)),
        "latest version wins with the full update count")
      assert(got(2L)._5 == 3.0 && got(2L)._6 == 1L)
    } finally q.stop()
  }

  test("interval-join batch equivalent: counts verified against a brute-force scan") {
    val ev = rowsOf(Tables.events(spark, SF)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("sec")))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val clicks = ev.filter(_._2 == "click").groupBy(_._1)
    val got = rowsOf(streaming.StreamJoin.intervalJoinBatch(spark, SF))
    assert(got.size == ev.count(_._2 == "purchase"))
    got.foreach { r =>
      val (user, pSec) = (r.getLong(0), r.getLong(2))
      val expect = clicks.getOrElse(user, Nil)
        .count(c => c._4 >= pSec - streaming.StreamJoin.LookbackSec && c._4 <= pSec)
      assert(r.getLong(r.fieldIndex("n_recent_clicks")) == expect)
    }
  }

  test("batch dedup keeps the earliest event per content hash with the copy count") {
    val r = rowsOf(Windowed.dedupBatch(spark, SF))
    assert(r.nonEmpty)
    val total = r.map(_.getLong(r.head.fieldIndex("n_copies"))).sum
    assert(total == Tables.events(spark, SF).count(),
      "every event is attributed to exactly one hash group")
    assert(r.map(_.getString(0)).distinct.size == r.size, "one row per hash")
  }

  test("batch entry aggregates the events table per hour and type") {
    val r = rowsOf(Windowed.batch(spark, SF))
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(0) % 3600 == 0, "window starts on the hour")
      assert(row.getLong(row.fieldIndex("n_events")) > 0)
    }
    val keys = r.map(row => (row.getLong(0), row.getString(1)))
    assert(keys == keys.distinct, "one row per (window, type)")
  }

  test("stream-static enrichment matches the batch join and keeps dimension-less events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String, Double)]
    val events = stream.toDF.toDF("event_id", "user_id", "event_type", "value")
    val query = graft.streaming.Enrich.enrichStreaming(events, SF).writeStream
      .format("memory").queryName("enrich_sink").outputMode("append").start()
    try {
      // user 3 exists in the customer dimension; user 99999 does not
      stream.addData((1L, 3L, "click", 1.0), (2L, 99999L, "view", 2.0))
      query.processAllAvailable()
      val got = spark.table("enrich_sink")
        .as[(Long, Long, String, Double, Option[String])].collect()
        .map(r => r._1 -> r).toMap
      assert(got.keySet == Set(1L, 2L), "stateless join emits every event")
      assert(got(1L)._5.nonEmpty, "known user gains its segment")
      assert(got(2L)._5.isEmpty, "unknown user survives with null segment")
      // the streamed rows agree with the batch-equivalent join
      val batch = rowsOf(graft.streaming.Enrich.enrichBatch(spark, SF)
        .filter(col("user_id") === 3L).limit(1)).head
      assert(batch.getString(batch.fieldIndex("segment")) == got(1L)._5.get,
        "same dimension row as the batch path")
    } finally query.stop()
  }

  test("daily pivot counts partition the event table exactly") {
    val r = rowsOf(relational.Tpch.qPivotDaily(spark, SF))
    assert(r.nonEmpty)
    val total = r.map(row =>
      relational.Tpch.PivotEventTypes.map(c => row.getLong(row.fieldIndex(c))).sum).sum
    assert(total == Tables.events(spark, SF).count(),
      "every event lands in exactly one (day, type) cell")
  }

  test("unpivot is the exact inverse of the pivot (round trip to long form)") {
    val melted = rowsOf(relational.Tpch.qUnpivot(spark, SF))
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = rowsOf(Tables.events(spark, SF)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .count())
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(melted == direct, "melt(pivot(x)) == groupBy long form")
  }

  test("gap detect finds exactly the planted empty-minute runs, inclusive bounds") {
    import spark.implicits._
    // events at minutes 0, 1, 5, 6, 10 → gaps [2,5) (3 min) and [7,10) (3 min)
    val events = Seq(ts(0, 0), ts(0, 1), ts(0, 5), ts(0, 6), ts(0, 10))
      .map(t => (t, "click")).toDF("ts", "event_type")
    val got = Windowed.gaps(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = ts(0, 0).getTime / 1000
    assert(got.toSeq == Seq(
      (base + 2 * 60, base + 5 * 60, 3L),
      (base + 7 * 60, base + 10 * 60, 3L)))
  }

  test("streaming minute counts: emitted minutes exclude the planted hole") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val events = stream.toDF.toDF("ts", "event_type")
    val query = Windowed.minuteCountsStreaming(events).writeStream
      .format("memory").queryName("minutes_sink").outputMode("append").start()
    try {
      stream.addData((ts(0, 0), "a"), (ts(0, 0), "b"), (ts(0, 3), "c"))
      query.processAllAvailable()
      stream.addData((ts(9, 0), "wm")) // advance watermark past hour 0
      query.processAllAvailable()
      stream.addData((ts(23, 0), "wm2"))
      query.processAllAvailable()
      val base = ts(0, 0).getTime / 1000
      val got = spark.table("minutes_sink").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(base) == 2L, "minute 0 counted both events")
      assert(got(base + 180) == 1L)
      assert(!got.contains(base + 60) && !got.contains(base + 120),
        "the empty minutes never appear in the monitoring stream")
    } finally query.stop()
  }

  test("streaming simhash screen: hit set equals the capped batch pairs across micro-batches") {
    import spark.implicits._
    import graft.streaming.FingerprintScreen
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // fingerprints planted directly: 10 and 20 are hamming-1 twins of 0
    // arriving LATER; 30 is far from everything; 40 is an exact copy of
    // 10 arriving last. Arrival order = id order (the batch-equivalence
    // precondition the scaladoc states).
    val fps = Seq(
      0L -> 0x0F0F0F0F0FL, 10L -> 0x0F0F0F0F0EL, 20L -> 0x0F0F0F0F0DL,
      30L -> 0x123456789AL, 40L -> 0x0F0F0F0F0EL)
    val stream = MemoryStream[(Long, Long)]
    val q = FingerprintScreen.screenStreaming(
        stream.toDF.toDF("doc_id", "fp"))
      .writeStream.format("memory").queryName("screen_sink")
      .outputMode("append").start()
    try {
      stream.addData(fps.take(2): _*) // batch 1: 0, 10
      q.processAllAvailable()
      stream.addData(fps.drop(2): _*) // batch 2: 20, 30, 40
      q.processAllAvailable()
      val got = spark.table("screen_sink").collect()
        .map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSet // (a, b, h)
      // batch twin: the capped band pairs over the same fingerprints
      val banded = Dedup.bandedFingerprints(
        fps.toDF("doc_id", "fp"), "fp", Dedup.HammingMax + 1,
        Dedup.SimhashBits / (Dedup.HammingMax + 1))
      val expect = rowsOf(Dedup.cappedBandPairs(banded, Dedup.BandBucketCap)
          .filter(col("hamming") <= Dedup.HammingMax).distinct())
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the stream emits one hit per matching band — set-collapse both
      assert(got == expect,
        s"stream hits $got must equal the batch capped pairs $expect")
      assert(got.contains((0L, 10L, 1L)) && got.contains((10L, 40L, 0L)),
        "cross-micro-batch matches found (state carried the witnesses)")
      assert(!got.exists(t => t._1 == 30L || t._2 == 30L),
        "the distant fingerprint matches nothing")
    } finally q.stop()
  }

  test("streaming minhash screen: hit set matches the planted signature overlaps across micro-batches") {
    import spark.implicits._
    import graft.streaming.FingerprintScreen
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // signatures planted directly (mh0..mh31). Bands are 4 consecutive
    // perms each; sharing the FIRST 16 perms ⇒ same hash in bands 0-3 ⇒
    // same buckets, and exactly MinhashMinMatches=16 matches — the
    // verify boundary. 0/10 share 16; 20 copies 10 (32 vs 10, 16 vs 0);
    // 30 shares nothing; 40 copies 0 and arrives in the SECOND batch
    // (state must carry the earlier witnesses).
    def sig(f: Int => Long): Seq[Long] = (0 until Dedup.NumPerm).map(f).toSeq
    val s0 = sig(i => 10L + i)
    val s10 = sig(i => if (i < 16) 10L + i else 1000L + i)
    val s30 = sig(i => 5000L + i)
    val rows = Seq(0L -> s0, 10L -> s10, 20L -> s10, 30L -> s30, 40L -> s0)
    val stream = MemoryStream[(Long, Seq[Long])]
    val sigCols = (0 until Dedup.NumPerm).map(i => col("sig")(i).as(s"mh$i"))
    val q = FingerprintScreen.minhashScreenStreaming(
        stream.toDF.toDF("doc_id", "sig")
          .select(col("doc_id") +: sigCols: _*))
      .writeStream.format("memory").queryName("mh_screen_sink")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(3): _*) // batch 1: 0, 10, 20
      q.processAllAvailable()
      stream.addData(rows.drop(3): _*) // batch 2: 30, 40
      q.processAllAvailable()
      val got = spark.table("mh_screen_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = Set(
        (10L, 0L, 16L), (20L, 0L, 16L), (20L, 10L, 32L),
        (40L, 0L, 32L), (40L, 10L, 16L), (40L, 20L, 16L))
      assert(got == expect,
        s"stream hits $got must equal the planted overlap set $expect")
    } finally q.stop()
  }

  test("streaming minhash screen: bucket state honors the witness cap") {
    import graft.streaming.{MinhashProbe, SigWitnesses, FingerprintScreen}
    // identical signatures collapse into one bucket; with cap=3 only
    // the first three become witnesses, yet every later arrival still
    // hits all of them at full 32/32 matches
    val s = (0 until Dedup.NumPerm).map(_.toLong)
    val probes = (0L until 8L).map(i => MinhashProbe(0, 7L, i, s))
    val state = new TestGroupState[SigWitnesses]
    val hits = FingerprintScreen.minhashScreenBucket(3)(
      (0, 7L), probes.iterator, state).toSeq
    assert(state.value.ids == List(0L, 1L, 2L), "store capped at 3 witnesses")
    val perDoc = hits.groupBy(_.doc_id)
    (3L until 8L).foreach { d =>
      assert(perDoc(d).map(_.dup_of).toSet == Set(0L, 1L, 2L),
        s"arrival $d matches exactly the capped witnesses") }
    assert(hits.forall(_.matches == Dedup.NumPerm.toLong))
  }

  test("streaming simhash screen: bucket state honors the witness cap") {
    import graft.streaming.{BandProbe, BucketWitnesses, FingerprintScreen}
    // drive one bucket's transition directly: identical fingerprints
    // collapse into one bucket; with cap=3 only the first three become
    // witnesses, yet EVERY later arrival still hits witness #1
    val probes = (0L until 10L).map(i => BandProbe(0, 7L, i, 0xABCL))
    val state = new TestGroupState[BucketWitnesses]
    val hits = FingerprintScreen.screenBucket(3)((0, 7L), probes.iterator, state).toSeq
    assert(state.value.ids == List(0L, 1L, 2L), "store capped at 3 witnesses")
    val perDoc = hits.groupBy(_.doc_id)
    (3L until 10L).foreach { d =>
      assert(perDoc(d).map(_.dup_of).toSet == Set(0L, 1L, 2L),
        s"arrival $d matches exactly the capped witnesses") }
    assert(hits.forall(_.hamming == 0L))
  }

  test("streaming contribution cap admits exactly the batch earliest-K despite out-of-order arrival") {
    import spark.implicits._
    import graft.streaming.ContributionCap
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Long)]
    val q = ContributionCap.capStreaming(
        stream.toDF.toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName("cap_sink")
      .outputMode("append").start()
    try {
      // user 1: seven events delivered OUT OF ORDER — only the five
      // EARLIEST (by event time, not arrival) may admit, in rank order
      stream.addData((ts(0, 30), 1L, 3L), (ts(0, 10), 1L, 1L), (ts(0, 20), 1L, 2L))
      q.processAllAvailable()
      assert(spark.table("cap_sink").count() == 0, "wm has not passed anything yet")
      stream.addData((ts(0, 50), 1L, 5L), (ts(0, 40), 1L, 4L),
        (ts(1, 0), 1L, 6L), (ts(1, 10), 1L, 7L), (ts(3, 0), 2L, 90L))
      q.processAllAvailable() // wm → 2:00: all user-1 events ready
      val got1 = spark.table("cap_sink").filter("user_id = 1").collect()
        .map(r => (r.getLong(1), r.getLong(3))).toSet
      assert(got1 == Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L)),
        "earliest five admit with batch-identical ranks; 6 and 7 are dropped")
      // a capped user's late re-arrival must NOT re-open the budget
      stream.addData((ts(1, 30), 1L, 8L), (ts(9, 0), 3L, 99L))
      q.processAllAvailable() // wm → 8:00: user 2's held event admits
      assert(spark.table("cap_sink").filter("user_id = 1").count() == 5)
      val got2 = spark.table("cap_sink").filter("user_id = 2").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got2 == Seq((90L, ts(3, 0).getTime * 1000L, 1L)))
      assert(spark.table("cap_sink").filter("user_id = 3").count() == 0,
        "user 3's event is still inside the watermark horizon")
      // regression (r15 ADVICE): a beyond-horizon arrival for a
      // NOT-yet-capped user (user 2 has 1 of 5 admitted) must be
      // dropped, not admitted with the next rank out of event-time
      // order — the earliest-K invariant is scoped to the horizon
      stream.addData((ts(1, 0), 2L, 91L))
      q.processAllAvailable() // wm is 8:00; 1:00 is beyond the horizon
      assert(spark.table("cap_sink").filter("user_id = 2").count() == 1,
        "beyond-watermark event is dropped on entry")
    } finally q.stop()
  }
}

/** Minimal GroupState stub for driving a state function directly. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = None
  def value: S = v.get
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(s: S): Unit = { v = Some(s) }
  override def remove(): Unit = { v = None }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(ms: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(ms: Long): Unit = ()
  override def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
  override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}

/** [[TestGroupState]] that simulates GroupStateImpl's event-time
  * contract: the current watermark is `wmMs`, and a timeout set at or
  * below it throws IllegalArgumentException (the real operator's
  * behavior — the clamp-regression tests rely on it). */
class WatermarkedGroupState[S](wmMs: Long) extends TestGroupState[S] {
  var timeoutMs: Long = Long.MinValue
  override def getCurrentWatermarkMs(): Long = wmMs
  override def setTimeoutTimestamp(ms: Long): Unit = {
    require(ms > wmMs,
      s"Timeout timestamp ($ms) cannot be earlier than the current watermark ($wmMs)")
    timeoutMs = ms
  }
}
