package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Per-user admission state: how many events this user has already
  * contributed, plus the in-horizon arrivals the watermark has not yet
  * proven orderable. Once `nAdmitted` reaches the cap the pending list
  * is always empty — state is O(cap + in-flight) per key, never
  * corpus-sized. */
final case class CapState(nAdmitted: Long, pending: Seq[(Long, Long)])

/** One admitted event: `rnk` is the user's contribution index (1-based,
  * ≤ cap), identical to the batch plan's rank. */
final case class CapAdmit(user_id: Long, event_id: Long, sec: Long, rnk: Long)

/** ONLINE per-user contribution capping — the streaming member of the
  * contribution-bounding family (batch audit:
  * [[graft.pipeline.Dedup.contribCap]]): an event stream is throttled
  * so each user contributes at most [[CapK]] events, by EVENT TIME
  * (earliest first), not arrival order — the admitted set is exactly
  * the batch plan's earliest-K, independent of network reordering.
  *
  *   - [[capBatch]]: the batch plan — earliest-[[CapK]] events per
  *     user through the prune-or-degrade top-k idiom (bounded heaps,
  *     no per-user sort). This is the oracle-checked `st_contrib_cap`
  *     entry.
  *   - [[capStreaming]]: the streaming path — per-user state via
  *     `flatMapGroupsWithState` holds the pending (sec, event_id)
  *     arrivals; an event is ADMITTED only once the watermark passes
  *     its event time — the proof that nothing earlier can still
  *     arrive — so in-horizon disorder costs nothing and the admitted
  *     prefix equals the batch rank order exactly (the screen-family
  *     lesson: first-ARRIVAL admission silently diverges under
  *     reordering; watermark-gated admission cannot). Ready events
  *     beyond the cap are dropped and the pending list is empty from
  *     then on; the event-time timeout re-arms at the earliest pending
  *     event so admissions flush even when the user goes quiet.
  *
  * Scale shape: both paths shuffle once on `user_id`; streaming state
  * is bounded by construction (≤ cap admissions ever, pending bounded
  * by the watermark horizon). `st_contrib_cap`. */
object ContributionCap {

  /** Max events one user may contribute — shared with the batch audit
    * ([[graft.pipeline.Dedup.ContribCapK]]). */
  val CapK: Int = graft.pipeline.Dedup.ContribCapK

  /** Batch earliest-K admission per user — `st_contrib_cap`. */
  def capBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
    graft.plans.TopKPerGroup.rankTopK(
        ev, Seq("user_id"), Seq("sec" -> false, "event_id" -> false), CapK)
      .select(col("user_id"), col("event_id"), col("sec"), col("rnk"))
      .orderBy(col("user_id"), col("rnk"))
  }

  /** Streaming watermark-gated admission. `events` must carry
    * (ts: timestamp, user_id, event_id); emits one [[CapAdmit]] per
    * admitted event, in rank order per user. */
  def capStreaming(events: DataFrame): Dataset[CapAdmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id").cast("long").as("user_id"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long").as("event_id"))
      .as[(java.sql.Timestamp, Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[CapState, CapAdmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(java.sql.Timestamp, Long, Long, Long)],
         state: GroupState[CapState]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          val st = state.getOption.getOrElse(CapState(0L, Seq.empty))
          // a capped user keeps no pending list — drop arrivals outright
          // (state stays, pinned at the cap: flatMapGroupsWithState does
          // NOT auto-filter late data, so forgetting a capped user would
          // re-open their budget on a late arrival)
          val pending =
            if (st.nAdmitted >= CapK) Seq.empty
            else st.pending ++ rows.map(r => (r._3, r._4))
          // STRICTLY below the watermark: an event at sec == wm could
          // still gain a same-second, smaller-id sibling
          val (ready, hold) = pending.partition(_._1 < wmSec)
          val admits = ready.sortBy(identity)
            .take(CapK - st.nAdmitted.toInt)
            .zipWithIndex.map { case ((sec, id), i) =>
              CapAdmit(user, id, sec, st.nAdmitted + i + 1)
            }
          val n = st.nAdmitted + admits.length
          val keep = if (n >= CapK) Seq.empty else hold
          state.update(CapState(n, keep))
          // re-arm one second past the earliest still-held event so it
          // admits once the watermark strictly passes it, even if the
          // user goes quiet (+1 also keeps the timeout > current wm)
          keep.sortBy(identity).headOption
            .foreach(e => state.setTimeoutTimestamp((e._1 + 1) * 1000L))
          admits.iterator
      }
  }

  val oracle: Map[String, String] = Map(
    "st_contrib_cap" ->
      s"""WITH r AS (
           SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id) AS rnk
           FROM events)
         SELECT user_id, event_id, sec, CAST(rnk AS BIGINT) AS rnk
         FROM r WHERE rnk <= $CapK ORDER BY user_id, rnk""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_contrib_cap" -> (capBatch _),
  )
}
