package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** One scaled event entering the anomaly screen: `vc` is the value in
  * exact integer cents ([[Anomaly]] scaling), `ts_us` the event time in
  * microseconds (the within-group order key, with event_id tiebreak). */
final case class AnomalyEvent(event_type: String, ts_us: Long, event_id: Long,
    vc: Long)

/** One flagged event. `dev_num` = W·v − S and `var_num` = W·Q − S² are
  * the EXACT integer z-test terms (see [[Anomaly]]); `z` is the derived
  * |z| score, null when the trailing window has zero variance (the
  * any-deviation-is-infinite case). */
final case class AnomalyHit(event_id: Long, event_type: String,
    dev_num: Long, var_num: Long, z: Option[Double])

/** Trailing-window z-score spike detection over the events stream — the
  * metric-quality monitor a 100 TB/day ingest keeps on every feed
  * (sudden value spikes mean a broken upstream, a unit change, or
  * fraud; flagging them ONLINE is the point, so the operator is
  * streaming-first with a batch twin for the oracle gate).
  *
  * An event is anomalous when its value deviates from the mean of the
  * previous [[Anomaly.W]] same-type values by more than
  * [[Anomaly.ZThreshold]] population standard deviations. The test runs
  * in EXACT INTEGER arithmetic — the HarmonicLcm trick applied to
  * z-scores: with values scaled to cents (v), window sum S and square
  * sum Q,
  *
  *   z² = (v − μ)² / σ²  =  (W·v − S)² / (W·Q − S²)
  *
  * so |z| > T  ⇔  (W·v − S)² > T²·(W·Q − S²) — all BIGINT terms, no
  * float boundary for the flag decision in either engine (the reported
  * z value itself is sqrt of an exact integer ratio: both engines run
  * the identical IEEE divide + sqrt + 4-dp round). Zero variance with a
  * deviating value flags with z = null.
  *
  * Batch twin: one window-function pass — partition by event_type,
  * order by (ts, event_id), frame = the W preceding rows. No joins; the
  * single shuffle is the partition key. Streaming: one
  * flatMapGroupsWithState keyed by event_type whose state is the last
  * ≤ W scaled values — BOUNDED BY CONSTRUCTION at W longs per event
  * type regardless of stream length, the property that lets the screen
  * run forever. Micro-batch rows are processed in (ts, event_id) order
  * within the group; as with the fingerprint screens, batch/stream
  * equality assumes globally event-time-ordered arrival across
  * micro-batches (MemoryStream-asserted), since a trailing window read
  * mid-stream is inherently arrival-order state. `st_anomaly`. */
object Anomaly {

  /** Trailing window length (previous same-type events). */
  val W = 16

  /** Flag threshold in population standard deviations. */
  val ZThreshold = 3

  private val D12_2 = DecimalType(12, 2)

  /** HALF_UP 4-dp rounding — SQL `round(x, 4)` semantics in both
    * engines, for kernel-side parity with the oracle. */
  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Events with the exact-cents value scaling shared by both paths. */
  private def scaled(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("event_type"), col("ts"),
      (col("value").cast(D12_2) * 100).cast("long").as("vc"))

  /** Batch twin — the oracle-checked `st_anomaly` entry. */
  def anomalyBatch(spark: SparkSession, dir: String): DataFrame = {
    val win = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-W, -1)
    val wl = lit(W.toLong)
    val t2 = lit((ZThreshold * ZThreshold).toLong)
    val num = wl * col("vc") - col("s")
    val den = wl * col("q") - col("s") * col("s")
    scaled(Tables.events(spark, dir))
      .select(col("event_id"), col("event_type"), col("vc"),
        count(col("vc")).over(win).as("n"),
        sum(col("vc")).over(win).as("s"),
        sum(col("vc") * col("vc")).over(win).as("q"))
      .filter(col("n") === W &&
        ((den > 0 && num * num > t2 * den) || (den === 0 && num =!= 0)))
      .select(col("event_id"), col("event_type"),
        num.as("dev_num"), den.as("var_num"),
        when(den > 0,
          round(sqrt((num * num).cast("double") / den.cast("double")), 4))
          .as("z"))
      .orderBy(col("event_id"))
  }

  /** The per-key state step: score each arrival against the current
    * trailing buffer, then push it in. Rows are sorted by (ts_us,
    * event_id) inside the micro-batch group. */
  private def screen(w: Int, t: Int)(key: String, rows: Iterator[AnomalyEvent],
      state: GroupState[Seq[Long]]): Iterator[AnomalyHit] = {
    var buf = state.getOption.getOrElse(Seq.empty).toVector
    val out = rows.toVector.sortBy(e => (e.ts_us, e.event_id)).flatMap { e =>
      val hit = if (buf.length == w) {
        var s = 0L; var q = 0L
        buf.foreach { x => s += x; q += x * x }
        val num = w.toLong * e.vc - s
        val den = w.toLong * q - s * s
        if (den > 0 && num * num > t.toLong * t * den)
          Some(AnomalyHit(e.event_id, key, num, den,
            Some(round4(math.sqrt((num * num).toDouble / den.toDouble)))))
        else if (den == 0 && num != 0)
          Some(AnomalyHit(e.event_id, key, num, den, None))
        else None
      } else None
      buf = (buf :+ e.vc).takeRight(w)
      hit
    }
    state.update(buf)
    out.iterator
  }

  /** Streaming path over a stream with (event_id, event_type, ts,
    * value) — same flags as [[anomalyBatch]] under event-time-ordered
    * arrival. */
  def anomalyStreaming(events: DataFrame, w: Int = W,
                       t: Int = ZThreshold): Dataset[AnomalyHit] = {
    import events.sparkSession.implicits._
    scaled(events)
      .select(col("event_type"), expr("unix_micros(ts)").as("ts_us"),
        col("event_id"), col("vc"))
      .as[AnomalyEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(screen(w, t))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_anomaly" -> (anomalyBatch _),
  )

  val oracle: Map[String, String] = Map(
    "st_anomaly" ->
      s"""WITH v AS (
           SELECT event_id, event_type, ts,
                  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
           FROM events),
         w AS (
           SELECT event_id, event_type, vc,
                  COUNT(vc) OVER win AS n,
                  CAST(SUM(vc) OVER win AS BIGINT) AS s,
                  CAST(SUM(vc * vc) OVER win AS BIGINT) AS q
           FROM v
           WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN $W PRECEDING AND 1 PRECEDING))
         SELECT event_id, event_type,
                $W * vc - s AS dev_num,
                $W * q - s * s AS var_num,
                CASE WHEN $W * q - s * s > 0 THEN
                  ROUND(sqrt(
                    CAST(($W * vc - s) * ($W * vc - s) AS DOUBLE) /
                    CAST($W * q - s * s AS DOUBLE)), 4)
                END AS z
         FROM w
         WHERE n = $W AND
               (($W * q - s * s > 0 AND
                 ($W * vc - s) * ($W * vc - s) >
                   ${ZThreshold * ZThreshold} * ($W * q - s * s))
                OR ($W * q - s * s = 0 AND $W * vc <> s))
         ORDER BY event_id""",
  )
}
