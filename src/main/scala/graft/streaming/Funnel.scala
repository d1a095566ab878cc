package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Buffered in-flight events for one user (sec, event_type). */
final case class FunnelState(events: Seq[(Long, String)])

/** One quiesce-delimited funnel episode for one user. */
final case class FunnelEpisode(user_id: Long, episode: Long,
    episode_start_sec: Long, stage: Long,
    s_sec: Option[Long], c_sec: Option[Long], p_sec: Option[Long])

/** PER-EPISODE conversion funnel over the events stream — the
  * streaming-honest form of the funnel: a GLOBAL per-user funnel
  * (`q_events_funnel`) is undecidable on an unbounded stream (a signup
  * can always still arrive), so the funnel is scoped to quiesce-
  * delimited activity EPISODES (gap > [[Funnel.EpisodeGapSec]] starts a
  * new episode — sessionization at the funnel horizon), within which
  * the signup → click (≤ 1 h) → purchase (≤ 1 h) chain is exact and
  * FINAL once the watermark passes episode-end + gap.
  *
  *   - [[episodeFunnelBatch]]: the batch plan (oracle-checked
  *     `st_funnel`): gap episodes via the lag/cumsum windows
  *     (`q_events_sessionize`'s idiom), then the chain via the
  *     min-when windows (`q_events_funnel`'s idiom) per episode.
  *   - [[streamingFunnel]]: flatMapGroupsWithState per user — events
  *     BUFFER in state (sorted at flush, so intra-horizon disorder
  *     costs nothing) until the event-time timeout proves the episode
  *     gap elapsed, then every buffered episode is computed by the
  *     identical plain-Scala rule and emitted, state evicted. State is
  *     bounded by one activity burst per user (the [[Sessionize]]
  *     contract); a user reappearing after eviction restarts episode
  *     numbering at 1 — the inherent stream/batch divergence the
  *     watermark bounds, downstream consumers key on
  *     (user, episode_start_sec).
  */
object Funnel {

  /** Per-step chain window (click within 1 h of signup, purchase
    * within 1 h of click) — `q_events_funnel`'s constant. */
  val StepSec = 3600L

  /** Quiesce gap that delimits episodes: 2 × [[StepSec]], the horizon
    * past which no event can extend an open chain. */
  val EpisodeGapSec = 7200L

  /** Batch path — the oracle-checked `st_funnel` entry. */
  def episodeFunnelBatch(spark: SparkSession, dir: String): DataFrame =
    episodeFunnelAgg(spark, Tables.events(spark, dir))
      .orderBy(col("user_id"), col("episode"))

  /** The shared batch transform (also the streaming spec's expectation
    * builder): one shuffle on user_id; the episode windows, the chain
    * windows and the final aggregate all reuse that partitioning. */
  def episodeFunnelAgg(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    val ep = Window.partitionBy($"user_id", $"episode")
    events
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp($"ts").as("sec"))
      .withColumn("prev", lag($"sec", 1).over(byUser))
      .withColumn("is_new",
        when($"prev".isNull || $"sec" - $"prev" > EpisodeGapSec, 1L).otherwise(0L))
      .withColumn("episode", sum($"is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sfirst",
        min(when($"event_type" === "signup", $"sec")).over(ep))
      .withColumn("cfirst",
        min(when($"event_type" === "click" &&
          $"sec" >= $"sfirst" && $"sec" <= $"sfirst" + StepSec, $"sec")).over(ep))
      .withColumn("pfirst",
        min(when($"event_type" === "purchase" &&
          $"sec" >= $"cfirst" && $"sec" <= $"cfirst" + StepSec, $"sec")).over(ep))
      .groupBy($"user_id", $"episode")
      .agg(min($"sec").as("episode_start_sec"),
        min($"sfirst").as("s_sec"),
        min($"cfirst").as("c_sec"),
        min($"pfirst").as("p_sec"))
      .select($"user_id", $"episode", $"episode_start_sec",
        when($"p_sec".isNotNull, 3L).when($"c_sec".isNotNull, 2L)
          .when($"s_sec".isNotNull, 1L).otherwise(0L).as("stage"),
        $"s_sec", $"c_sec", $"p_sec")
  }

  /** The episode split + chain rule in plain Scala — applied to a
    * user's SORTED buffered events at flush time. Mirrors
    * [[episodeFunnelAgg]] exactly (spec-asserted). */
  private[graft] def episodesOf(user: Long, evs: Seq[(Long, String)])
      : Seq[FunnelEpisode] = {
    val sorted = evs.sortBy(_._1)
    val groups = scala.collection.mutable.ListBuffer.empty[Vector[(Long, String)]]
    sorted.foreach { e =>
      if (groups.nonEmpty && e._1 - groups.last.last._1 <= EpisodeGapSec)
        groups(groups.length - 1) = groups.last :+ e
      else groups += Vector(e)
    }
    groups.toSeq.zipWithIndex.map { case (es, i) =>
      val s = es.collect { case (t, "signup") => t } match {
        case Seq() => None; case ts => Some(ts.min)
      }
      val c = s.flatMap { sv =>
        es.collect { case (t, "click") if t >= sv && t <= sv + StepSec => t } match {
          case Seq() => None; case ts => Some(ts.min)
        }
      }
      val p = c.flatMap { cv =>
        es.collect { case (t, "purchase") if t >= cv && t <= cv + StepSec => t } match {
          case Seq() => None; case ts => Some(ts.min)
        }
      }
      val stage = if (p.isDefined) 3L else if (c.isDefined) 2L
        else if (s.isDefined) 1L else 0L
      FunnelEpisode(user, i + 1L, es.head._1, stage, s, c, p)
    }
  }

  /** The per-key state transition — named so the spec can drive it
    * against a watermark-enforcing [[GroupState]] directly. */
  private[graft] def funnelUpdate(drops: StreamDrops.Counter)(
      user: Long, rows: Iterator[(java.sql.Timestamp, Long, String, Long)],
      state: GroupState[FunnelState]): Iterator[FunnelEpisode] =
    if (state.hasTimedOut) {
      val evs = state.get.events
      state.remove()
      episodesOf(user, evs).iterator
    } else {
      // rows at/below the EVICTION watermark are DROPPED on entry (the
      // scd2/cap divergence-bound discipline, r16 ADVICE): a gap-window
      // straggler for a user whose episode already flushed would
      // otherwise open fresh state and emit a spurious one-event
      // episode overlapping the history already written. The drop is
      // counted on `drops`; batch equality holds for rows arriving
      // at/above each batch's eviction watermark
      val wmSec = state.getCurrentWatermarkMs() / 1000L
      var nLate = 0L
      val fresh = rows.map(r => (r._4, r._3)).filter { e =>
        val ok = e._1 > wmSec
        if (!ok) nLate += 1L
        ok
      }.toSeq
      drops.add(nLate)
      val buf = state.getOption.map(_.events).getOrElse(Seq.empty) ++ fresh
      if (buf.isEmpty) Iterator.empty // everything late, nothing buffered
      else {
        state.update(FunnelState(buf))
        // flush once the watermark proves no event can extend the newest
        // buffered episode. Fresh rows sit above the watermark, but a
        // PREVIOUSLY-buffered event (admitted under an older watermark)
        // can sit below it — unclamped, max+gap can land at/below the
        // eviction watermark and setTimeoutTimestamp(<= wm) throws,
        // killing the query. Clamp forward: the buffer is re-sorted at
        // flush, so firing one trigger later never changes the emitted
        // episodes.
        state.setTimeoutTimestamp(
          math.max((buf.map(_._1).max + EpisodeGapSec) * 1000L,
            state.getCurrentWatermarkMs() + 1000L))
        Iterator.empty
      }
    }

  /** Streaming path: buffer per user until the watermark proves the
    * episode gap elapsed, then emit every buffered episode and evict.
    * `events` must carry (ts: timestamp, user_id, event_type). Late
    * drops are counted on a named accumulator (`graft.drops.funnel`)
    * unless the caller supplies its own [[StreamDrops.Counter]]. */
  def streamingFunnel(events: DataFrame): Dataset[FunnelEpisode] =
    streamingFunnel(events,
      StreamDrops.accumulator(events.sparkSession, "funnel"))

  def streamingFunnel(events: DataFrame, drops: StreamDrops.Counter)
      : Dataset[FunnelEpisode] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id").cast("long").as("user_id"),
        col("event_type"), unix_timestamp(col("ts")).as("sec"))
      .as[(java.sql.Timestamp, Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[FunnelState, FunnelEpisode](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(funnelUpdate(drops))
  }

  val oracle: Map[String, String] = Map(
    "st_funnel" ->
      s"""WITH e AS (
           SELECT user_id, event_id, event_type,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         x AS (
           SELECT *, LAG(sec) OVER w AS prev FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         y AS (
           SELECT *, CASE WHEN prev IS NULL OR sec - prev > $EpisodeGapSec
                          THEN 1 ELSE 0 END AS is_new FROM x),
         z AS (
           SELECT *, SUM(is_new) OVER (PARTITION BY user_id
             ORDER BY sec, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS episode
           FROM y),
         a AS (
           SELECT *, MIN(CASE WHEN event_type = 'signup' THEN sec END)
             OVER (PARTITION BY user_id, episode) AS sfirst FROM z),
         b AS (
           SELECT *, MIN(CASE WHEN event_type = 'click'
               AND sec >= sfirst AND sec <= sfirst + $StepSec THEN sec END)
             OVER (PARTITION BY user_id, episode) AS cfirst FROM a),
         c2 AS (
           SELECT *, MIN(CASE WHEN event_type = 'purchase'
               AND sec >= cfirst AND sec <= cfirst + $StepSec THEN sec END)
             OVER (PARTITION BY user_id, episode) AS pfirst FROM b)
         SELECT user_id, CAST(episode AS BIGINT) AS episode,
                MIN(sec) AS episode_start_sec,
                CAST(CASE WHEN MIN(pfirst) IS NOT NULL THEN 3
                          WHEN MIN(cfirst) IS NOT NULL THEN 2
                          WHEN MIN(sfirst) IS NOT NULL THEN 1
                          ELSE 0 END AS BIGINT) AS stage,
                MIN(sfirst) AS s_sec, MIN(cfirst) AS c_sec, MIN(pfirst) AS p_sec
         FROM c2 GROUP BY user_id, episode
         ORDER BY user_id, episode""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_funnel" -> (episodeFunnelBatch _),
  )
}
