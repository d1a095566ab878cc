package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stream-stream interval join: purchases joined to the same user's
  * clicks from the preceding hour.
  *
  * Streaming path = a watermarked stream-stream inner join — the
  * Structured Streaming feature built exactly for this: both sides
  * buffer in state, the time-range condition bounds HOW LONG (a click
  * is droppable once the purchase watermark passes click time + 1 h),
  * so state is evicted instead of accumulated. The batch path is the
  * same logical join (equi on `user_id` plus the range residual — a
  * keyed interval join, shuffle-bounded by the user key, never a pair
  * product) and is what the DuckDB gate hash-checks. `st_interval_join`.
  */
object StreamJoin {

  /** Lookback window, seconds. */
  val LookbackSec = 3600L

  /** Batch equivalent: per purchase, the count of same-user clicks in
    * [purchase − lookback, purchase]. */
  def intervalJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("sec", unix_timestamp(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("sec").as("p_sec"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("sec").as("c_sec"))
    p.join(c,
        col("user_id") === col("c_user") &&
          col("c_sec") >= col("p_sec") - LookbackSec && col("c_sec") <= col("p_sec"),
        "left_outer")
      .groupBy(col("user_id"), col("purchase_id"), col("p_sec"))
      .agg(count(col("c_sec")).as("n_recent_clicks"))
      .orderBy(col("purchase_id"))
  }

  /** Streaming path: watermarked stream-stream inner join. `purchases`
    * and `clicks` need (ts: timestamp, user_id, event_id). Watermarks
    * bound both sides' state: a buffered click can be evicted once the
    * purchase-side watermark proves no future purchase can reach back to
    * it. Emits one row per (purchase, matching click) pair in append
    * mode; the per-purchase count is a downstream aggregation. */
  def intervalJoinStreaming(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("ts").as("p_ts"),
      col("user_id").as("p_user"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "30 minutes")
    val c = clicks.select(col("ts").as("c_ts"),
      col("user_id").as("c_user"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    p.join(c, expr(
      s"""p_user = c_user AND
          c_ts >= p_ts - interval ${LookbackSec} seconds AND
          c_ts <= p_ts"""))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"))
  }

  /** LEFT-OUTER flavour at pair granularity: every purchase emits one
    * row per in-window click, or a single null-click row when none
    * matched — the attribution-report shape where unattributed
    * conversions must stay visible. Batch path: keyed interval left
    * join (equi on user + range residual, shuffle on the user key).
    * `st_left_join`. */
  def leftJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("sec", unix_timestamp(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("sec").as("p_sec"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("sec").as("c_sec"))
    p.join(c,
        col("user_id") === col("c_user") &&
          col("c_sec") >= col("p_sec") - LookbackSec && col("c_sec") <= col("p_sec"),
        "left_outer")
      .select(col("user_id"), col("purchase_id"), col("p_sec"),
        col("click_id"), col("c_sec"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Streaming path of [[leftJoinBatch]]: watermarked stream-stream
    * LEFT OUTER join. The null-padded row for an unmatched purchase can
    * only be emitted once the click-side watermark proves no matching
    * click can still arrive — which is exactly the state-eviction bound
    * (both buffers drop rows the time-range condition has retired). */
  def leftJoinStreaming(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("ts").as("p_ts"),
      col("user_id").as("p_user"), col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "30 minutes")
    val c = clicks.select(col("ts").as("c_ts"),
      col("user_id").as("c_user"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    p.join(c, expr(
      s"""p_user = c_user AND
          c_ts >= p_ts - interval ${LookbackSec} seconds AND
          c_ts <= p_ts"""), "leftOuter")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"))
  }

  val oracle: Map[String, String] = Map(
    "st_left_join" ->
      """WITH e AS (
           SELECT user_id, event_type, event_id,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         p AS (SELECT user_id, event_id AS purchase_id, sec AS p_sec
               FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id AS c_user, event_id AS click_id, sec AS c_sec
               FROM e WHERE event_type = 'click')
         SELECT p.user_id, p.purchase_id, p.p_sec, c.click_id, c.c_sec
         FROM p LEFT JOIN c
           ON c.c_user = p.user_id
          AND c.c_sec >= p.p_sec - 3600 AND c.c_sec <= p.p_sec
         ORDER BY purchase_id, click_id""",
    "st_interval_join" ->
      """WITH e AS (
           SELECT user_id, event_type, event_id,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
           FROM events),
         p AS (SELECT user_id, event_id AS purchase_id, sec AS p_sec
               FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, sec AS c_sec FROM e WHERE event_type = 'click')
         SELECT p.user_id, p.purchase_id, p.p_sec,
                COUNT(c.c_sec) AS n_recent_clicks
         FROM p LEFT JOIN c
           ON c.user_id = p.user_id
          AND c.c_sec >= p.p_sec - 3600 AND c.c_sec <= p.p_sec
         GROUP BY p.user_id, p.purchase_id, p.p_sec
         ORDER BY purchase_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_interval_join" -> (intervalJoinBatch _),
    "st_left_join"     -> (leftJoinBatch _),
  )
}
