package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stream-static enrichment: each event picks up its user's customer
  * attributes from a static dimension table.
  *
  * This is the STATELESS streaming join — the third join shape next to
  * the stateful stream-stream interval join ([[StreamJoin]]) and the
  * windowed aggregations: the static side is re-read per micro-batch
  * (picking up dimension updates for free) and broadcast when small, so
  * no state store is involved at all and the stream never blocks on a
  * watermark. At 100 TB/day of events the enrichment cost is exactly
  * the batch join's: a broadcast hash join inside each micro-batch.
  *
  * The batch equivalent (`st_enrich`, hash-checked) is the same logical
  * plan over the bounded table. Left outer: enrichment must never DROP
  * events whose user is missing from the dimension (here user 0).
  */
object Enrich {

  /** The static dimension: customer key → market segment. */
  private def dim(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))

  /** Batch equivalent of the enrichment join. */
  def enrichBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .join(dim(spark, dir), Seq("user_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("segment"))
      .orderBy(col("event_id"))

  /** Streaming path: the same join with a streaming `events` side.
    * `events` needs (event_id, user_id, event_type, value); the static
    * side comes from `dir`. Stateless — no watermark required. */
  def enrichStreaming(events: DataFrame, dir: String): DataFrame = {
    val spark = events.sparkSession
    events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .join(broadcast(dim(spark, dir)), Seq("user_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("segment"))
  }

  val oracle: Map[String, String] = Map(
    "st_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment AS segment
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_enrich" -> (enrichBatch _),
  )
}
