package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Per-key current version carried in streaming state. */
final case class KeyVersion(
    sec: Long, event_id: Long, event_type: String, value: Double, n_updates: Long)

/** A compacted (materialized) key version emitted downstream. */
final case class CompactedRow(
    user_id: Long, last_sec: Long, last_event_id: Long,
    last_type: String, last_value: Double, n_updates: Long)

/** Pending (not yet closed) versions for one key: (sec, event_id, value). */
final case class Scd2State(versions: Seq[(Long, Long, Double)])

/** One closed SCD2 validity interval. */
final case class Scd2Row(user_id: Long, valid_from_sec: Long,
    valid_to_sec: Long, event_id: Long, value: Double)

/** CDC / upsert compaction: collapse a change stream to the LATEST
  * version per key — the materialize step between an event log and a
  * serving table (warehouse upsert, Kafka log compaction, Delta MERGE
  * all have this shape).
  *
  *   - [[latestBatch]]: the batch plan — one struct-max aggregate per
  *     key ((sec, event_id) is a total version order, so max(struct)
  *     IS "latest wins"; map-side combined, single shuffle, no window
  *     sort). This is the oracle-checked `st_cdc_latest` entry.
  *   - [[streamingCompact]]: the streaming path — per-key state via
  *     `flatMapGroupsWithState` holding only the current version
  *     (constant state per key, the compaction invariant); a key's
  *     version is EMITTED once the event-time timeout proves it idle
  *     for [[QuiesceSec]] — the watermark is the proof no older update
  *     can still arrive, the same eviction bound every stateful op in
  *     this package carries. A key that updates again later simply
  *     opens a new compaction epoch (normal checkpoint semantics).
  */
object CdcCompact {

  /** Idle window after which a key's current version is materialized. */
  val QuiesceSec = 3600L

  /** Latest event per user plus the update count — batch-equivalent
    * `st_cdc_latest`. */
  def latestBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("sec"), col("event_id"), col("event_type"), col("value")))
          .as("last"),
        count(lit(1)).as("n_updates"))
      .select(col("user_id"),
        col("last.sec").as("last_sec"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("n_updates"))
      .orderBy(col("user_id"))

  /** Streaming compactor. `events` must carry (ts: timestamp, user_id,
    * event_id, event_type, value); emits one [[CompactedRow]] per key
    * per quiesce epoch. Late drops are counted on a named accumulator
    * (`graft.drops.cdc_compact`) unless the caller supplies its own
    * [[StreamDrops.Counter]]. */
  def streamingCompact(events: DataFrame): Dataset[CompactedRow] =
    streamingCompact(events,
      StreamDrops.accumulator(events.sparkSession, "cdc_compact"))

  def streamingCompact(events: DataFrame, drops: StreamDrops.Counter)
      : Dataset[CompactedRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      // keep the watermarked ts column flowing into the stateful op
      .select(col("ts"), col("user_id").cast("long").as("user_id"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long").as("event_id"),
        col("event_type"), col("value").cast("double").as("value"))
      .as[(java.sql.Timestamp, Long, Long, Long, String, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[KeyVersion, CompactedRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(compactUpdate(drops))
  }

  /** The per-key state transition — named so the spec can drive it
    * against a watermark-enforcing [[GroupState]] directly. */
  private[graft] def compactUpdate(drops: StreamDrops.Counter)(
      user: Long, rows: Iterator[(java.sql.Timestamp, Long, Long, Long, String, Double)],
      state: GroupState[KeyVersion]): Iterator[CompactedRow] =
          if (state.hasTimedOut) {
            val v = state.get
            state.remove()
            Iterator.single(CompactedRow(
              user, v.sec, v.event_id, v.event_type, v.value, v.n_updates))
          } else {
            // beyond-watermark updates are DROPPED on entry (the
            // scd2/cap divergence-bound discipline, r16 ADVICE): a
            // straggler for an already-quiesced (EVICTED) key would
            // otherwise re-create state from its stale version and, one
            // trigger later, emit a CompactedRow OLDER than the one
            // already written — a downstream latest-view regresses. The
            // drop is counted, and n_updates counts in-horizon updates
            // only — the stated stream/batch divergence bound
            val wmSec = state.getCurrentWatermarkMs() / 1000L
            var nLate = 0L
            // micro-batch arrival order is not version order: fold to the
            // max (sec, event_id) — the same total order the batch plan's
            // struct-max uses, so out-of-order updates can never regress
            // the materialized version
            var v = state.getOption
            rows.foreach { case (_, _, sec, id, tpe, value) =>
              if (sec <= wmSec) nLate += 1L
              else v = v match {
                case Some(cur)
                  if cur.sec > sec || (cur.sec == sec && cur.event_id >= id) =>
                  Some(cur.copy(n_updates = cur.n_updates + 1))
                case Some(cur) =>
                  Some(KeyVersion(sec, id, tpe, value, cur.n_updates + 1))
                case None => Some(KeyVersion(sec, id, tpe, value, 1L))
              }
            }
            drops.add(nLate)
            v.foreach { cur =>
              state.update(cur)
              // clamp ahead of the watermark: a LIVE key whose stored
              // version predates the current watermark (the entry drop
              // only filters arrivals, not state) would otherwise set a
              // timeout <= wm, which throws (the funnel-family lesson);
              // firing one trigger later emits the same compacted version
              state.setTimeoutTimestamp(
                math.max((cur.sec + QuiesceSec) * 1000L,
                  state.getCurrentWatermarkMs() + 1000L))
            }
            Iterator.empty
          }

  /** SCD2 interval emission — the HISTORY complement of the
    * [[latestBatch]] snapshot: every version of a key becomes a
    * validity interval [its ts, the next version's ts), the
    * slowly-changing-dimension type-2 table a warehouse keeps beside
    * the compacted serving table.
    *
    *   - [[scd2Batch]]: one LEAD window per key on the (sec, event_id)
    *     total version order; only CLOSED intervals emit (the open
    *     tail has no valid_to yet) — the oracle-checked `st_cdc_scd2`
    *     entry.
    *   - [[streamingScd2]]: per-key state holds the PENDING versions
    *     (sorted on flush, so in-horizon disorder costs nothing); an
    *     interval (vᵢ → vᵢ₊₁) emits exactly when the watermark passes
    *     vᵢ₊₁'s event time — the proof no late version can still slot
    *     between them — and the closed head is dropped from state.
    *     The open tail persists (state is |keys| + in-flight versions
    *     — the SCD2 contract: a dimension's key space is bounded);
    *     the event-time timeout re-arms at the earliest pending
    *     boundary so intervals close even when the key goes quiet.
    *     Versions arriving with event time at or below the watermark
    *     are dropped on entry — the stream/batch divergence bound:
    *     emitted history never overlaps, and equality with
    *     [[scd2Batch]] holds for rows arriving at or above each
    *     batch's EVICTION watermark. (That is slightly stricter than
    *     the 1 h lateness allowance: across consecutive non-idle
    *     batches the eviction watermark runs ahead of the late-events
    *     one, so a row in that gap is dropped even though the source
    *     admitted it.) Drops are counted on
    *     `graft.drops.cdc_scd2`. */
  def scd2Batch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
        col("event_id"), col("value"))
      .withColumn("valid_to_sec", lead(col("sec"), 1).over(w))
      .filter(col("valid_to_sec").isNotNull)
      .select(col("user_id"), col("sec").as("valid_from_sec"),
        col("valid_to_sec"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("valid_from_sec"), col("event_id"))
  }

  /** Streaming SCD2. `events` must carry (ts: timestamp, user_id,
    * event_id, value). Late drops are counted on a named accumulator
    * (`graft.drops.cdc_scd2`) unless the caller supplies its own
    * [[StreamDrops.Counter]]. */
  def streamingScd2(events: DataFrame): Dataset[Scd2Row] =
    streamingScd2(events,
      StreamDrops.accumulator(events.sparkSession, "cdc_scd2"))

  def streamingScd2(events: DataFrame, drops: StreamDrops.Counter)
      : Dataset[Scd2Row] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id").cast("long").as("user_id"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
      .as[(java.sql.Timestamp, Long, Long, Long, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(scd2Update(drops))
  }

  /** The per-key state transition — named so the spec can drive it
    * against a watermark-enforcing [[GroupState]] directly. */
  private[graft] def scd2Update(drops: StreamDrops.Counter)(
      user: Long, rows: Iterator[(java.sql.Timestamp, Long, Long, Long, Double)],
      state: GroupState[Scd2State]): Iterator[Scd2Row] = {
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          // beyond-watermark versions are DROPPED on entry
          // (flatMapGroupsWithState does not auto-filter late rows): a
          // version arriving after its successors were closed would
          // re-sort ahead of the open tail and emit an interval
          // overlapping history already written to the sink. The drop —
          // counted on `drops` — is the stream/batch divergence bound:
          // rows at/above the batch's eviction watermark close exactly
          // the batch LEAD plan's intervals; later data is discarded,
          // never emitted inconsistently
          var nLate = 0L
          val fresh = rows.map(r => (r._3, r._4, r._5)).filter { v =>
            val ok = v._1 > wmSec
            if (!ok) nLate += 1L
            ok
          }.toSeq
          drops.add(nLate)
          val pending =
            state.getOption.map(_.versions).getOrElse(Seq.empty) ++ fresh
          val sorted = pending.sortBy(v => (v._1, v._2))
          // close every interval whose SUCCESSOR the watermark has passed
          var cut = 0
          while (cut + 1 < sorted.length && sorted(cut + 1)._1 <= wmSec) cut += 1
          val closed = (0 until cut).map { i =>
            Scd2Row(user, sorted(i)._1, sorted(i + 1)._1,
              sorted(i)._2, sorted(i)._3)
          }
          val keep = sorted.drop(cut)
          if (keep.nonEmpty) {
            state.update(Scd2State(keep))
            // re-arm at the earliest still-open boundary (> wm by
            // construction — an older boundary would have closed above)
            if (keep.length >= 2) state.setTimeoutTimestamp(keep(1)._1 * 1000L)
          } else state.remove()
          closed.iterator
  }

  val oracle: Map[String, String] = Map(
    "st_cdc_scd2" ->
      """WITH e AS (
           SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
                  event_id, value
           FROM events),
         w AS (
           SELECT user_id, sec AS valid_from_sec, event_id, value,
                  LEAD(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) AS valid_to_sec
           FROM e)
         SELECT user_id, valid_from_sec, valid_to_sec, event_id, value
         FROM w WHERE valid_to_sec IS NOT NULL
         ORDER BY user_id, valid_from_sec, event_id""",
    "st_cdc_latest" ->
      """WITH e AS (
           SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
                  event_id, event_type, value
           FROM events),
         r AS (
           SELECT user_id, sec, event_id, event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY sec DESC, event_id DESC) AS rn,
                  COUNT(*) OVER (PARTITION BY user_id) AS n
           FROM e)
         SELECT user_id, sec AS last_sec, event_id AS last_event_id,
                event_type AS last_type, value AS last_value,
                CAST(n AS BIGINT) AS n_updates
         FROM r WHERE rn = 1 ORDER BY user_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_cdc_latest" -> (latestBatch _),
    "st_cdc_scd2"   -> (scd2Batch _),
  )
}
