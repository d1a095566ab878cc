package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Per-user admission state: how many events this user has already
  * contributed, plus the in-horizon arrivals the watermark has not yet
  * proven orderable (`pending` holds (us, event_id)). Once `nAdmitted`
  * reaches the cap the pending list is always empty — state is
  * O(cap + in-flight) per key, never corpus-sized. */
final case class CapState(nAdmitted: Long, pending: Seq[(Long, Long)])

/** One admitted event: `rnk` is the user's contribution index (1-based,
  * ≤ cap), identical to the batch plan's rank; `us` is the event time
  * in epoch MICROseconds — the same granularity the batch audit
  * ([[graft.pipeline.Dedup.contribCap]]) ranks on, so the two family
  * members' kept sets agree even for sub-second siblings. */
final case class CapAdmit(user_id: Long, event_id: Long, us: Long, rnk: Long)

/** ONLINE per-user contribution capping — the streaming member of the
  * contribution-bounding family (batch audit:
  * [[graft.pipeline.Dedup.contribCap]]): an event stream is throttled
  * so each user contributes at most [[CapK]] events, by EVENT TIME
  * (earliest first), not arrival order — the admitted set is exactly
  * the batch plan's earliest-K for rows arriving at or above each
  * batch's EVICTION watermark (slightly stricter than the 1 h lateness
  * allowance: across consecutive non-idle batches the eviction
  * watermark runs ahead of the late-events one, and rows in that gap
  * are dropped — counted on `graft.drops.contrib_cap`). Both paths
  * rank on `unix_micros(ts)`, the exact
  * tie-break the batch audit uses (whole-second ranking would let two
  * same-second, different-microsecond events disagree with
  * `d_contrib_cap`'s kept set).
  *
  *   - [[capBatch]]: the batch plan — earliest-[[CapK]] events per
  *     user through the prune-or-degrade top-k idiom (bounded heaps,
  *     no per-user sort). This is the oracle-checked `st_contrib_cap`
  *     entry.
  *   - [[capStreaming]]: the streaming path — per-user state via
  *     `flatMapGroupsWithState` holds the pending (us, event_id)
  *     arrivals; an event is ADMITTED only once the watermark passes
  *     its event time — the proof that nothing earlier can still
  *     arrive — so in-horizon disorder costs nothing and the admitted
  *     prefix equals the batch rank order exactly (the screen-family
  *     lesson: first-ARRIVAL admission silently diverges under
  *     reordering; watermark-gated admission cannot). Arrivals whose
  *     event time is already BELOW the watermark are dropped on entry
  *     (flatMapGroupsWithState does not auto-filter late data): a
  *     beyond-horizon straggler admitted with the next rank would
  *     break the earliest-K order against already-emitted admissions.
  *     That drop is the stream/batch divergence bound — the
  *     batch-equality guarantee holds for reordering within the 1 h
  *     horizon, and data later than that is discarded, never
  *     mis-ranked. Ready events beyond the cap are dropped and the
  *     pending list is empty from then on; the event-time timeout
  *     re-arms at the earliest pending event so admissions flush even
  *     when the user goes quiet.
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
        unix_micros(col("ts")).as("us"))
    graft.plans.TopKPerGroup.rankTopK(
        ev, Seq("user_id"), Seq("us" -> false, "event_id" -> false), CapK)
      .select(col("user_id"), col("event_id"), col("us"), col("rnk"))
      .orderBy(col("user_id"), col("rnk"))
  }

  /** Streaming watermark-gated admission. `events` must carry
    * (ts: timestamp, user_id, event_id); emits one [[CapAdmit]] per
    * admitted event, in rank order per user. */
  def capStreaming(events: DataFrame): Dataset[CapAdmit] =
    capStreaming(events,
      StreamDrops.accumulator(events.sparkSession, "contrib_cap"))

  def capStreaming(events: DataFrame, drops: StreamDrops.Counter)
      : Dataset[CapAdmit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id").cast("long").as("event_id"))
      .as[(java.sql.Timestamp, Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[CapState, CapAdmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(capUpdate(drops))
  }

  /** The per-key state transition — named so the spec can drive it
    * against a watermark-enforcing [[GroupState]] directly. */
  private[graft] def capUpdate(drops: StreamDrops.Counter)(
      user: Long, rows: Iterator[(java.sql.Timestamp, Long, Long, Long)],
      state: GroupState[CapState]): Iterator[CapAdmit] = {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(CapState(0L, Seq.empty))
          // beyond-horizon arrivals are DROPPED on entry: an event whose
          // time is already below the watermark can no longer be ordered
          // against the admitted prefix (earlier admissions with later
          // event times may exist downstream) — admitting it would break
          // the earliest-K contract, so it is discarded and counted on
          // `drops`, documented as the divergence bound
          var nLate = 0L
          val fresh = rows.map(r => (r._3, r._4)).filter { e =>
            val ok = e._1 >= wmUs
            if (!ok) nLate += 1L
            ok
          }.toSeq
          drops.add(nLate)
          // a capped user keeps no pending list — drop arrivals outright
          // (state stays, pinned at the cap: forgetting a capped user
          // would re-open their budget on a late arrival)
          val pending =
            if (st.nAdmitted >= CapK) Seq.empty
            else st.pending ++ fresh
          // STRICTLY below the watermark: an event at us == wm could
          // still gain a same-instant, smaller-id sibling
          val (ready, hold) = pending.partition(_._1 < wmUs)
          val admits = ready.sortBy(identity)
            .take(CapK - st.nAdmitted.toInt)
            .zipWithIndex.map { case ((us, id), i) =>
              CapAdmit(user, id, us, st.nAdmitted + i + 1)
            }
          val n = st.nAdmitted + admits.length
          val keep = if (n >= CapK) Seq.empty else hold
          state.update(CapState(n, keep))
          // re-arm one second past the earliest still-held event so it
          // admits once the watermark strictly passes it, even if the
          // user goes quiet; the entry filter guarantees held events sit
          // at/above the watermark, and the max-clamp keeps the timeout
          // strictly ahead of it even at the us→ms truncation boundary
          keep.sortBy(identity).headOption
            .foreach(e => state.setTimeoutTimestamp(
              math.max(e._1 / 1000L + 1000L,
                state.getCurrentWatermarkMs() + 1000L)))
          admits.iterator
  }

  val oracle: Map[String, String] = Map(
    "st_contrib_cap" ->
      s"""WITH r AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS rnk
           FROM events)
         SELECT user_id, event_id, us, CAST(rnk AS BIGINT) AS rnk
         FROM r WHERE rnk <= $CapK ORDER BY user_id, rnk""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_contrib_cap" -> (capBatch _),
  )
}
