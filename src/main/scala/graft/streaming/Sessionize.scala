package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.relational.Tpch

/** Open session carried in streaming state for one user. */
final case class OpenSession(start_sec: Long, last_sec: Long, n_events: Long)

/** A closed session emitted downstream. */
final case class ClosedSession(
    user_id: Long, session_start_sec: Long, session_end_sec: Long, n_events: Long)

/** Gap-based sessionization (30-minute inactivity closes a session),
  * in both execution shapes:
  *
  *   - [[sessionSummary]]: the batch plan — per-user session statistics
  *     over the windowed session assignment (one shuffle on user_id;
  *     both window passes and the final aggregate reuse the same
  *     partitioning). This is the oracle-checked `st_sessionize` entry.
  *   - [[streamingSessions]]: the streaming path — custom per-key state
  *     via `flatMapGroupsWithState` (the Structured Streaming tool for
  *     semantics that windowed aggs can't express): state is the open
  *     session per user, closed sessions are emitted as soon as a
  *     larger-gap event arrives, and an EVENT-TIME TIMEOUT flushes
  *     sessions whose user went silent once the watermark passes — the
  *     state-eviction bound that keeps per-key state finite at
  *     100 TB/day. Exercised in ScalaTest via MemoryStream.
  */
object Sessionize {

  val GapSec = 1800L

  /** Per-user session statistics — batch-equivalent `st_sessionize`. */
  def sessionSummary(spark: SparkSession, dir: String): DataFrame =
    Tpch.qEventsSessionize(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events_total"),
        max(col("n_events")).as("max_session_events"),
        min(col("start_sec")).as("first_sec"),
        max(col("end_sec")).as("last_sec"))
      .orderBy(col("user_id"))

  /** Gap-based sessionization via the BUILT-IN `session_window` — the
    * native Spark operator for the same semantics [[streamingSessions]]
    * implements with custom state (merging session windows, no
    * per-event state function). Works identically over batch and
    * streaming inputs; this batch form is the oracle-checked
    * `st_session_window` entry, and the ScalaTest streaming spec runs
    * the same transform under a watermark. Micro-second precision —
    * unlike [[sessionSummary]]'s epoch-second truncation — so the
    * oracle replays the gap decisions on `epoch_us`. Window end is
    * last-event + gap (the operator's contract). */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    sessionWindowAgg(graft.Tables.events(spark, dir))
      .orderBy(col("user_id"), col("start_us"))

  /** The shared transform: same plan for batch and streaming inputs. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  /** Streaming sessionizer. `events` must carry (ts: timestamp,
    * user_id: long); emits a [[ClosedSession]] when a gap closes a
    * session or the event-time timeout fires. */
  def streamingSessions(events: DataFrame): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      // keep the watermarked `ts` column flowing into the stateful
      // operator (projecting it away detaches the watermark)
      .select(col("ts"), col("user_id").cast("long").as("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"))
      .as[(java.sql.Timestamp, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionUpdate)
  }

  /** The per-key state transition — named so the spec can drive it
    * against a watermark-enforcing [[GroupState]] directly. */
  private[graft] def sessionUpdate(
      user: Long, rows: Iterator[(java.sql.Timestamp, Long, Long)],
      state: GroupState[OpenSession]): Iterator[ClosedSession] =
          if (state.hasTimedOut) {
            // watermark passed start-of-gap + 30 min: flush and evict
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.start_sec, s.last_sec, s.n_events))
          } else {
            // micro-batch arrival order is not time order: sort the batch
            val ts = rows.map(_._3).toArray.sorted
            val closed = Iterator.newBuilder[ClosedSession]
            var open = state.getOption
            // cross-batch stragglers (events >gap older than the open
            // session) belong to an EARLIER session. They are folded into
            // their own gap-delimited session as long as consecutive
            // stragglers in this (sorted) batch stay within GapSec —
            // matching what the batch plan would build from them — and
            // flushed when the chain breaks. Residual approximation:
            // stragglers cannot rejoin sessions emitted in PREVIOUS
            // micro-batches (those are already downstream; that is the
            // inherent streaming/batch divergence the watermark bounds).
            var strag: Option[OpenSession] = None
            def flushStrag(): Unit = {
              strag.foreach(st =>
                closed += ClosedSession(user, st.start_sec, st.last_sec, st.n_events))
              strag = None
            }
            ts.foreach { t =>
              open match {
                case Some(s) if t < s.start_sec - GapSec =>
                  strag match {
                    case Some(st) if t - st.last_sec <= GapSec =>
                      strag = Some(OpenSession(st.start_sec, t, st.n_events + 1))
                    case _ =>
                      flushStrag()
                      strag = Some(OpenSession(t, t, 1))
                  }
                case Some(s) if t - s.last_sec > GapSec =>
                  closed += ClosedSession(user, s.start_sec, s.last_sec, s.n_events)
                  open = Some(OpenSession(t, t, 1))
                case Some(s) =>
                  // cross-batch disorder within the gap: an event newer
                  // than the watermark may still be older than the open
                  // session's bounds — widen, never regress (a regressed
                  // last_sec would also pull the event-time timeout
                  // backwards)
                  open = Some(OpenSession(math.min(s.start_sec, t),
                    math.max(s.last_sec, t), s.n_events + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            flushStrag()
            open.foreach { s =>
              state.update(s)
              // flush when the watermark proves the gap elapsed; clamp
              // the timeout ahead of the watermark — a straggler inside
              // the open session's gap can leave last_sec + gap at or
              // below the current watermark, and setTimeoutTimestamp(<=
              // wm) throws (the funnel-family lesson); firing one
              // trigger later flushes the same session bounds
              state.setTimeoutTimestamp(
                math.max((s.last_sec + GapSec) * 1000L,
                  state.getCurrentWatermarkMs() + 1000L))
            }
            closed.result().iterator
          }

  val oracle: Map[String, String] = Map(
    // µs-precision gap sessionization; session end = last event + gap
    "st_session_window" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         flagged AS (
           SELECT user_id, event_id, us,
             CASE WHEN LAG(us) OVER w IS NULL
                    OR us - LAG(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         s AS (
           SELECT user_id, us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, MIN(us) AS start_us,
                MAX(us) + 1800000000 AS end_us,
                COUNT(*) AS n_events
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, start_us""",
    "st_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
             CASE WHEN LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w IS NULL
                    OR CAST(FLOOR(epoch(ts)) AS BIGINT) - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w > 1800
                  THEN 1 ELSE 0 END AS is_new
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)),
         sessions AS (
           SELECT user_id, ts_sec,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged),
         per_session AS (
           SELECT user_id, session_id, COUNT(*) AS n_events,
                  MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec
           FROM sessions GROUP BY user_id, session_id)
         SELECT user_id, COUNT(*) AS n_sessions,
                CAST(SUM(n_events) AS BIGINT) AS n_events_total,
                MAX(n_events) AS max_session_events,
                MIN(start_sec) AS first_sec, MAX(end_sec) AS last_sec
         FROM per_session GROUP BY user_id ORDER BY user_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_sessionize" -> (sessionSummary _),
    "st_session_window" -> (sessionWindows _),
  )
}
