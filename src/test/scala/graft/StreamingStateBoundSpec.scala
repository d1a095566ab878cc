package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** State-SIZE probes for the stateful streaming family at ×100 fixture
  * volume — the documented contracts are asserted numerically by
  * driving the named state-transition functions through a
  * watermark-tracking [[GroupState]] stub over tens of thousands of
  * events (plain driver-side Scala: the state functions are pure, so
  * the probe needs no cluster and runs in milliseconds):
  *
  *   - funnel: state is bounded by ONE activity burst per user, not by
  *     stream length — 100 bursts × 50 events never buffer more than
  *     one burst at a time.
  *   - SCD2: state is the open tail inside the watermark horizon —
  *     10 000 versions flow through while state never exceeds the
  *     horizon's worth.
  *   - contribution cap: once capped, pending is EMPTY forever — 10 000
  *     further arrivals cost zero state.
  */
class StreamingStateBoundSpec extends AnyFunSuite {

  /** GroupState stub with a settable watermark, timeout flag, and the
    * real setTimeoutTimestamp contract (throws at/below the wm). */
  class SimState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    var wmMs: Long = 0L
    var timedOut: Boolean = false
    var timeoutMs: Long = Long.MinValue
    private var v: Option[S] = None
    def value: Option[S] = v
    override def exists: Boolean = v.isDefined
    override def get: S = v.get
    override def getOption: Option[S] = v
    override def update(s: S): Unit = { v = Some(s) }
    override def remove(): Unit = { v = None }
    override def hasTimedOut: Boolean = timedOut
    override def setTimeoutDuration(ms: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ms: Long): Unit = {
      require(ms > wmMs,
        s"Timeout timestamp ($ms) cannot be earlier than watermark ($wmMs)")
      timeoutMs = ms
    }
    override def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = wmMs
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private val T0 = 1704067200L // 2024-01-01T00:00Z epoch sec
  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("funnel state is burst-bounded: 100 bursts x 50 events never pile up") {
    import graft.streaming.{Funnel, FunnelState}
    val st = new SimState[FunnelState]
    val burstLen = 50
    var maxBuffered = 0
    var episodes = 0L
    for (b <- 0 until 100) {
      val base = T0 + b * 4 * Funnel.EpisodeGapSec // bursts far apart
      val rows = (0 until burstLen).iterator
        .map(i => (ts(base + i * 60L), 1L, "click", base + i * 60L))
      st.timedOut = false
      st.wmMs = (base - Funnel.EpisodeGapSec) * 1000L
      assert(Funnel.funnelUpdate(graft.streaming.StreamDrops.Noop)(1L, rows, st).isEmpty)
      maxBuffered = math.max(maxBuffered, st.value.map(_.events.size).getOrElse(0))
      // the watermark passes the burst's gap: the timeout fires, the
      // buffered episode emits, state evicts
      st.timedOut = true
      st.wmMs = st.timeoutMs + 1
      episodes += Funnel.funnelUpdate(graft.streaming.StreamDrops.Noop)(1L, Iterator.empty, st).size
      assert(st.value.isEmpty, s"burst $b: state must evict on flush")
    }
    assert(maxBuffered == burstLen,
      s"state must hold exactly one burst ($maxBuffered buffered)")
    assert(episodes == 100L, s"every burst emits one episode ($episodes)")
  }

  test("SCD2 state is the in-horizon open tail: 10k versions, bounded state") {
    import graft.streaming.{CdcCompact, Scd2State}
    val st = new SimState[Scd2State]
    val stepSec = 10L
    val horizonSec = 3600L
    var maxState = 0
    var closed = 0L
    var prevTo = Long.MinValue
    for (batch <- 0 until 100) {
      val rows = (0 until 100).iterator.map { i =>
        val sec = T0 + (batch * 100 + i) * stepSec
        (ts(sec), 1L, sec, (batch * 100 + i).toLong, 1.0)
      }
      // wm trails the batch max by the 1h delay (as the real query's
      // watermark would)
      st.wmMs = (T0 + (batch * 100 + 99) * stepSec - horizonSec) * 1000L
      val out = CdcCompact.scd2Update(graft.streaming.StreamDrops.Noop)(1L, rows, st).toSeq
      out.foreach { r =>
        assert(r.valid_from_sec >= prevTo, "emitted history never overlaps")
        prevTo = r.valid_to_sec
      }
      closed += out.size
      maxState = math.max(maxState, st.value.map(_.versions.size).getOrElse(0))
    }
    assert(closed > 9000L, s"almost all intervals closed ($closed)")
    // the horizon holds 360 versions (3600s / 10s) + the open head
    assert(maxState <= horizonSec / stepSec + 101,
      s"state bounded by the watermark horizon, got $maxState of 10000")
  }

  test("contribution cap: a capped user's 10k later arrivals cost zero state") {
    import graft.streaming.{ContributionCap, CapState}
    val st = new SimState[CapState]
    // five events arrive IN-horizon (held), then the watermark passes
    // them and they admit in event-time rank order
    st.wmMs = (T0 - 100L) * 1000L
    val first = (0 until 5).iterator.map { i =>
      val sec = T0 + i * 10L
      (ts(sec), 1L, sec * 1000000L, i.toLong)
    }
    assert(ContributionCap.capUpdate(graft.streaming.StreamDrops.Noop)(1L, first, st).isEmpty, "held until wm")
    st.wmMs = (T0 + 1000L) * 1000L
    val admits = ContributionCap.capUpdate(graft.streaming.StreamDrops.Noop)(1L, Iterator.empty, st).toSeq
    assert(admits.map(_.rnk) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(st.value.get.nAdmitted == ContributionCap.CapK)
    // 10 000 further arrivals: all dropped outright, pending stays empty
    for (batch <- 0 until 100) {
      val rows = (0 until 100).iterator.map { i =>
        val sec = T0 + 100000L + (batch * 100 + i) * 10L
        (ts(sec), 1L, sec * 1000000L, (1000 + batch * 100 + i).toLong)
      }
      st.wmMs = (T0 + 50000L) * 1000L
      assert(ContributionCap.capUpdate(graft.streaming.StreamDrops.Noop)(1L, rows, st).isEmpty)
      assert(st.value.get.pending.isEmpty, "capped user keeps no pending list")
    }
  }

  test("simhash screen: a planted mega-dup bucket holds <= cap witnesses at x100 volume") {
    // r16 verdict task 6: the screens claim state bounded by key-space
    // CONSTRUCTION (<= cap witnesses per live bucket) — pin it
    // numerically with 50 000 probes landing in ONE bucket, all within
    // HammingMax of each other (the mega-dup group that would pile up
    // state if the cap gated on anything but the store size)
    import graft.streaming.{FingerprintScreen, BandProbe, BucketWitnesses}
    val cap = graft.pipeline.Dedup.BandBucketCap
    val st = new SimState[BucketWitnesses]
    var maxHitsPerBatch = 0
    for (batch <- 0 until 100) {
      val probes = (0 until 500).iterator.map { i =>
        val id = (batch * 500 + i).toLong
        // fingerprints within Hamming 1 of each other: bit 0 wiggles
        BandProbe(0, 7L, id, 0x5555555500000000L | (id & 1L))
      }
      val hits = FingerprintScreen.screenBucket(cap)((0, 7L), probes, st).size
      maxHitsPerBatch = math.max(maxHitsPerBatch, hits)
      assert(st.value.get.ids.size <= cap,
        s"batch $batch: witness store exceeded the cap (${st.value.get.ids.size})")
    }
    assert(st.value.get.ids.size == cap, "the store fills to exactly the cap")
    assert(st.value.get.ids == (0L until cap.toLong).toList,
      "witnesses are the first-arrived prefix — deterministic under replay")
    // emission is bounded too: <= cap hits per arrival, never quadratic
    assert(maxHitsPerBatch <= 500 * cap)
  }

  test("minhash screen: mega-dup bucket state is <= cap signatures at x100 volume") {
    import graft.streaming.{FingerprintScreen, MinhashProbe, SigWitnesses}
    val cap = graft.pipeline.Dedup.BandBucketCap
    val sig: Seq[Long] = Seq.tabulate(graft.pipeline.Dedup.NumPerm)(_.toLong)
    val st = new SimState[SigWitnesses]
    for (batch <- 0 until 100) {
      val probes = (0 until 500).iterator.map { i =>
        MinhashProbe(0, 7L, (batch * 500 + i).toLong, sig) // identical sigs
      }
      FingerprintScreen.minhashScreenBucket(cap)((0, 7L), probes, st)
        .foreach(h => assert(h.matches == graft.pipeline.Dedup.NumPerm.toLong))
      assert(st.value.get.ids.size <= cap,
        s"batch $batch: signature store exceeded the cap (${st.value.get.ids.size})")
    }
    assert(st.value.get.ids.size == cap, "the store fills to exactly the cap")
  }
}
