package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** One ranked row of the in-stream windowed top-k
  * ([[Windowed.topkStreamingRanked]]); `shard` identifies the emitting
  * (window, shard) state key — 0 when unsharded. */
final case class WindowTopkRow(window_start_sec: Long, shard: Int, user_id: Long,
    n_events: Long, sum_value: Double, rnk: Long)

/** Watermarked tumbling-window aggregation over the events stream.
  *
  * One transform, two execution paths:
  *   - [[batch]] runs the identical logical plan on the batch events
  *     table — this is the oracle-checked `st_windowed_agg` entry
  *     (Structured Streaming's core guarantee is exactly this
  *     batch/stream equivalence);
  *   - [[streaming]] applies it to a streaming DataFrame with a 2-hour
  *     watermark (state eviction bound — without it, window state grows
  *     forever at 100 TB/day); exercised in ScalaTest via MemoryStream.
  *
  * Decimal sums keep the aggregation order-independent, so the result is
  * identical across micro-batch orderings and hash-matches DuckDB.
  */
object Windowed {

  private val D12_2 = DecimalType(12, 2)

  /** Tumbling 1-hour windows × event_type: count + exact value sum. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(D12_2)), 2).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_sec"),
        col("event_type"), col("n_events"), col("sum_value"))

  def batch(spark: SparkSession, dir: String): DataFrame =
    windowedAgg(Tables.events(spark, dir))
      .orderBy(col("window_start_sec"), col("event_type"))

  /** Streaming path: same agg under a watermark. Append-mode compatible
    * (windows close when the watermark passes window end). */
  def streaming(events: DataFrame): DataFrame =
    windowedAgg(events.withWatermark("ts", "2 hours"))

  /** SLIDING 1-hour windows every 30 minutes × event_type — the
    * overlapping-window shape ([[windowedAgg]] tumbles; a rate monitor
    * wants "the last hour, refreshed every half hour"). Each event lands
    * in exactly duration/slide = 2 windows: Spark's window generator
    * replicates rows map-side (no join against a window table), then one
    * shuffle on (window, type). The oracle replays the replication as a
    * 2-offset cross join on the same epoch-aligned grid. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(D12_2)), 2).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_sec"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch path of the sliding window — the oracle-checked
    * `st_sliding_window` entry. */
  def slidingBatch(spark: SparkSession, dir: String): DataFrame =
    slidingAgg(Tables.events(spark, dir))
      .orderBy(col("window_start_sec"), col("event_type"))

  /** Streaming path: same sliding agg under a watermark (a window closes
    * when the watermark passes its END; with a 30-min slide two windows
    * are open per event, both bounded). */
  def slidingStreaming(events: DataFrame): DataFrame =
    slidingAgg(events.withWatermark("ts", "2 hours"))

  /** EXACT distinct users per tumbling hour — the audience/uniques
    * count a rate monitor wants, where approximate HLL sketches are
    * not oracle-replayable. Streaming forbids COUNT(DISTINCT) in one
    * stateful operator, so this is the documented two-stage chain
    * (Spark 3.4+ multiple-stateful-operators): stage 1 reduces to one
    * row per (window, user) — map-side combined, state bounded by
    * users-per-open-window; stage 2 re-windows via `window_time` and
    * counts rows. Both stages run the IDENTICAL plan in batch (the
    * oracle-checked path) and under a watermark in streaming — the
    * batch/stream equivalence is asserted by MemoryStream replay in
    * StreamingSpec. At 100 TB the (window, user) exchange is the
    * intrinsic exact-distinct shuffle; the second stage's input is
    * already |uniques|-sized. `st_distinct_users`. */
  def distinctUsersAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("w")), "1 hour").as("w2"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
      .select(unix_timestamp(col("w2.start")).as("window_start_sec"),
        col("n_users"), col("n_events"))

  def distinctUsersBatch(spark: SparkSession, dir: String): DataFrame =
    distinctUsersAgg(Tables.events(spark, dir))
      .orderBy(col("window_start_sec"))

  /** Streaming path: the same two-stage chain under one upstream
    * watermark (append mode; stage-1 windows close when the watermark
    * passes, feeding closed per-user rows into stage 2). */
  def distinctUsersStreaming(events: DataFrame): DataFrame =
    distinctUsersAgg(events.withWatermark("ts", "2 hours"))

  /** Streaming exact dedup — the streaming counterpart of
    * `d_exact_dedup`: drops payloads whose content hash was already
    * seen, with the watermark bounding how long seen-hashes state is
    * retained (without it, dedup state grows forever on an unbounded
    * stream). Input needs (ts: timestamp, payload: string). */
  def streamingDedup(stream: DataFrame): DataFrame =
    stream
      .withColumn("content_hash", md5(col("payload")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Batch counterpart of [[streamingDedup]] over the events stream:
    * first occurrence per content hash plus the duplicate count. Both
    * keep exactly one representative per hash; they can differ on WHICH
    * when duplicates arrive out of order — the streaming operator keeps
    * the first ARRIVED (processing order), this batch form keeps the
    * event-time-first (earliest (ts, event_id)), the deterministic
    * choice an oracle can replay. One map-side-combined struct-min
    * aggregation. `st_dedup`. */
  def dedupBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(md5(col("props")).as("content_hash"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .groupBy(col("content_hash"))
      .agg(min(struct(col("sec"), col("event_id"))).as("first"),
        count(lit(1)).as("n_copies"))
      .select(col("content_hash"), col("first.sec").as("first_sec"),
        col("first.event_id").as("first_event_id"), col("n_copies"))
      .orderBy(col("content_hash"))

  /** Canonical (order-insensitive) content hash: tokens sorted before
    * hashing, so two payloads that differ only in serialization order —
    * JSON field order, shuffled attribute lists, the classic
    * "same event, different producer library" ingest artifact —
    * collapse to ONE key that plain content hashing treats as
    * distinct. Pure codegen'd column expression (split → array_sort →
    * md5), byte-wise string ordering in both engines. */
  private def canonicalHash(payload: org.apache.spark.sql.Column) =
    md5(concat_ws(" ", array_sort(split(payload, " "))))

  /** Streaming canonicalizing dedup — [[streamingDedup]]'s
    * order-insensitive sibling: drops payloads whose SORTED token
    * multiset was already seen inside the watermark. Stateless
    * canonicalization + one `dropDuplicatesWithinWatermark` stateful
    * op, so state stays hash-keyed and watermark-bounded exactly like
    * the exact-dedup path. */
  def canonicalDedupStreaming(stream: DataFrame): DataFrame =
    stream
      .withColumn("canon_hash", canonicalHash(col("payload")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("canon_hash")

  /** Batch counterpart of [[canonicalDedupStreaming]] over the events
    * stream: first occurrence per canonical hash (earliest
    * (ts, event_id) — the deterministic choice an oracle replays),
    * duplicate count, and `n_variants` = distinct RAW content hashes
    * in the group — the serialization-variant collapse that separates
    * this operator from `st_dedup` (n_variants > 1 ⇔ order-only
    * duplicates that exact hashing misses). One map-side-combined
    * aggregation; countDistinct rewrites to a two-level exact
    * distinct aggregate on the same key. `st_canonical_dedup`. */
  def canonicalDedupBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(canonicalHash(col("props")).as("canon_hash"),
        md5(col("props")).as("raw_hash"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .groupBy(col("canon_hash"))
      .agg(min(struct(col("sec"), col("event_id"))).as("first"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("raw_hash")).as("n_variants"))
      .select(col("canon_hash"), col("first.sec").as("first_sec"),
        col("first.event_id").as("first_event_id"), col("n_copies"),
        col("n_variants"))
      .orderBy(col("canon_hash"))

  /** Reported ranks per window for [[topkBatch]]. */
  val TopkK = 3

  /** Per-(window, user) exact value sums — the shared kernel of the
    * windowed top-k: this IS the streaming-safe part (keyed windowed
    * aggregation under a watermark, appended when the window closes).
    * The RANK is deliberately not in the streaming plan: append-mode
    * ranking would need the window's final contents mid-stream, which
    * is precisely what the watermark close provides downstream — so
    * the streaming path emits closed per-user window sums and the
    * top-k is the per-closed-window post-pass ([[topkBatch]] runs it
    * through the native TopKPerGroup heap). */
  def windowedUserSums(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(D12_2)), 2).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_sec"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Batch path of the windowed top-k — the oracle-checked
    * `st_windowed_topk` entry: top [[TopkK]] users per hour by exact
    * summed value, (sum desc, user_id) total order. */
  def topkBatch(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.rankTopK(
        windowedUserSums(Tables.events(spark, dir)),
        Seq("window_start_sec"), Seq("sum_value" -> true, "user_id" -> false),
        TopkK)
      .select(col("window_start_sec"), col("user_id"), col("n_events"),
        col("sum_value"), col("rnk"))
      .orderBy(col("window_start_sec"), col("rnk"))

  /** Streaming path: the keyed window sums under a watermark. */
  def topkStreaming(events: DataFrame): DataFrame =
    windowedUserSums(events.withWatermark("ts", "2 hours"))

  /** In-stream RANKED top-k emission — the streaming path that emits
    * the per-window top-k ITSELF, instead of handing closed per-user
    * sums to a batch post-pass: `flatMapGroupsWithState` keyed by
    * (window, shard) accumulates exact per-user sums (integer cents —
    * the same DECIMAL(12,2) per-event rounding as the batch kernel, so
    * sums are bit-equal), and the event-time TIMEOUT — the watermark's
    * proof that the window can gain no more events, the
    * [[CdcCompact.streamingCompact]] quiesce pattern — fires exactly
    * once per key, ranking the accumulated sums (sum desc, user asc)
    * and emitting the top `k` as final rows.
    *
    * Scale shape: state per key is the per-user sum map of one
    * (window, shard) — `shards` bounds it to the window's distinct
    * users / shards. With shards > 1 each key emits its LOCAL top-k;
    * since a user's events land wholly in one shard (hash of user),
    * the global top-k is contained in the union of shard top-ks, and
    * the final merge is a trivial bounded op over shards×k rows per
    * window (the standard two-level distributed top-k — the spec
    * drives it). The default single shard emits the exact per-window
    * top-k directly. */
  def topkStreamingRanked(events: DataFrame, k: Int = TopkK,
                          shards: Int = 1): Dataset[WindowTopkRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .select(col("ts"),
        (unix_timestamp(col("ts")) - pmod(unix_timestamp(col("ts")), lit(3600L)))
          .as("wstart"),
        pmod(col("user_id"), lit(shards.toLong)).cast("int").as("shard"),
        col("user_id").cast("long").as("user_id"),
        (col("value").cast(D12_2) * 100).cast("long").as("cents"))
      .as[(java.sql.Timestamp, Long, Int, Long, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Map[Long, (Long, Long)], WindowTopkRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((wstart, shard), rows, state) =>
          if (state.hasTimedOut) {
            // window closed: rank once, emit once, drop the state
            val sums = state.get
            state.remove()
            sums.toSeq
              .map { case (u, (n, cents)) => (u, n, cents) }
              .sortBy { case (u, _, cents) => (-cents, u) }
              .take(k).zipWithIndex.iterator
              .map { case ((u, n, cents), i) =>
                WindowTopkRow(wstart, shard, u, n, cents / 100.0, i + 1L) }
          } else {
            var sums = state.getOption.getOrElse(Map.empty[Long, (Long, Long)])
            rows.foreach { case (_, _, _, u, c) =>
              val (n0, c0) = sums.getOrElse(u, (0L, 0L))
              sums = sums.updated(u, (n0 + 1L, c0 + c))
            }
            state.update(sums)
            // fire when the watermark passes the window end
            state.setTimeoutTimestamp((wstart + 3600L) * 1000L)
            Iterator.empty
          }
      }
  }

  /** Stream-health GAP DETECTION — the outage monitor: contiguous runs
    * of minutes with NO events, as (gap_start_sec, gap_end_sec,
    * n_minutes) intervals. The batch path is the oracle-checked
    * `st_gap_detect` entry; [[minuteCountsStreaming]] is the live
    * counterpart (per-minute counts under a watermark — a minute
    * ABSENT from the monitoring stream is a gap the alerting layer
    * flags).
    *
    * Scale note: the minute grid and the missing-minute set are
    * CALENDAR-bounded, not corpus-bounded — a full year is 525,600
    * rows — so the run-grouping window (the sessionize
    * bucket-minus-row-number trick on a global order) and the one-row
    * `sequence` explode are bounded regardless of event volume; the
    * event scan itself reduces map-side to distinct minutes. */
  def gaps(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = events
      .select(floor(unix_timestamp(col("ts")) / 60).cast("long").as("b"))
      .distinct()
    val rng = b.agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
    val missing = rng.select(explode(sequence(col("lo"), col("hi"))).as("b"))
      .join(b, Seq("b"), "left_anti")
    missing
      .withColumn("g", col("b") - row_number().over(Window.orderBy(col("b"))))
      .groupBy(col("g"))
      .agg((min(col("b")) * 60).as("gap_start_sec"),
        ((max(col("b")) + 1) * 60).as("gap_end_sec"),
        count(lit(1)).as("n_minutes"))
      .select(col("gap_start_sec"), col("gap_end_sec"), col("n_minutes"))
      .orderBy(col("gap_start_sec"))
  }

  def gapDetectBatch(spark: SparkSession, dir: String): DataFrame =
    gaps(Tables.events(spark, dir))

  /** Streaming per-minute event counts under a watermark — the
    * monitoring stream [[gaps]] post-processes: a minute that never
    * arrives in the sink is a gap. Append-mode compatible. */
  def minuteCountsStreaming(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("minute_start_sec"),
        col("n_events"))

  val oracle: Map[String, String] = Map(
    "st_gap_detect" ->
      """WITH b AS (
           SELECT DISTINCT CAST(FLOOR(epoch(ts) / 60) AS BIGINT) AS b
           FROM events),
         r AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM b),
         miss AS (
           SELECT m.b FROM (SELECT unnest(range(lo, hi + 1)) AS b FROM r) m
           WHERE m.b NOT IN (SELECT b FROM b)),
         g AS (SELECT b, b - ROW_NUMBER() OVER (ORDER BY b) AS grp FROM miss)
         SELECT MIN(b) * 60 AS gap_start_sec,
                (MAX(b) + 1) * 60 AS gap_end_sec,
                CAST(COUNT(*) AS BIGINT) AS n_minutes
         FROM g GROUP BY grp ORDER BY gap_start_sec""",
    "st_windowed_topk" ->
      s"""WITH e AS (
           SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec, user_id, value
           FROM events),
         sums AS (
           SELECT ts_sec - ts_sec % 3600 AS window_start_sec, user_id,
                  COUNT(*) AS n_events,
                  CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
           FROM e GROUP BY 1, 2)
         SELECT window_start_sec, user_id, n_events, sum_value,
                CAST(rnk AS BIGINT) AS rnk FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start_sec
                    ORDER BY sum_value DESC, user_id) AS rnk
           FROM sums)
         WHERE rnk <= $TopkK ORDER BY window_start_sec, rnk""",
    "st_canonical_dedup" ->
      """WITH e AS (
           SELECT md5(array_to_string(list_sort(string_split(props, ' ')), ' '))
                    AS canon_hash,
                  md5(props) AS raw_hash,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
           FROM events),
         r AS (
           SELECT canon_hash, sec, event_id,
                  ROW_NUMBER() OVER (PARTITION BY canon_hash
                    ORDER BY sec, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY canon_hash) AS n_copies,
                  COUNT(DISTINCT raw_hash) OVER (PARTITION BY canon_hash)
                    AS n_variants
           FROM e)
         SELECT canon_hash, sec AS first_sec, event_id AS first_event_id,
                n_copies, CAST(n_variants AS BIGINT) AS n_variants
         FROM r WHERE rn = 1 ORDER BY canon_hash""",
    "st_dedup" ->
      """WITH e AS (
           SELECT md5(props) AS content_hash,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec, event_id
           FROM events),
         r AS (
           SELECT content_hash, sec, event_id,
                  ROW_NUMBER() OVER (PARTITION BY content_hash
                    ORDER BY sec, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY content_hash) AS n_copies
           FROM e)
         SELECT content_hash, sec AS first_sec, event_id AS first_event_id,
                n_copies
         FROM r WHERE rn = 1 ORDER BY content_hash""",
    "st_distinct_users" ->
      """WITH e AS (
           SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec, user_id
           FROM events)
         SELECT ts_sec - ts_sec % 3600 AS window_start_sec,
                COUNT(DISTINCT user_id) AS n_users,
                COUNT(*) AS n_events
         FROM e GROUP BY 1 ORDER BY 1""",
    "st_windowed_agg" ->
      """WITH e AS (
           SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec, event_type, value
           FROM events)
         SELECT ts_sec - ts_sec % 3600 AS window_start_sec, event_type,
                COUNT(*) AS n_events,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
         FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
    "st_sliding_window" ->
      """WITH e AS (
           SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec, event_type, value
           FROM events),
         w AS (
           SELECT (ts_sec - ts_sec % 1800) - off AS window_start_sec,
                  event_type, value
           FROM e CROSS JOIN (SELECT unnest([0, 1800]) AS off) o)
         SELECT window_start_sec, event_type,
                COUNT(*) AS n_events,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_windowed_agg"   -> (batch _),
    "st_distinct_users" -> (distinctUsersBatch _),
    "st_dedup"          -> (dedupBatch _),
    "st_canonical_dedup" -> (canonicalDedupBatch _),
    "st_sliding_window" -> (slidingBatch _),
    "st_windowed_topk"  -> (topkBatch _),
    "st_gap_detect"     -> (gapDetectBatch _),
  )
}
