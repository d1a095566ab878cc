package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Observability for the stateful family's DOCUMENTED divergence drops
  * (r16 verdict task 3): every `flatMapGroupsWithState` operator in
  * this package discards rows whose event time the eviction watermark
  * has already passed — correct by the stream/batch divergence bound
  * each operator's scaladoc states, but at 100 TB a SILENT drop is an
  * ops hazard (a lagging upstream partition can shed hours of data
  * with no signal). Two observable layers:
  *
  *   1. Spark's own `FlatMapGroupsWithStateExec` sheds rows below the
  *      LATE-EVENTS watermark before the state function ever runs, and
  *      reports them per micro-batch as the state-operator metric
  *      `numRowsDroppedByWatermark` (StreamingQueryProgress) — measured
  *      in StreamingSpec: a planted sub-watermark row lands there, not
  *      in the operator. An ops deployment alerts on that metric first.
  *   2. The state functions' OWN entry filters catch the residual
  *      class — rows between the late-events and eviction watermarks
  *      (the two differ across consecutive non-idle batches), plus
  *      everything late in direct-drive/replay contexts with no engine
  *      filter. Each streaming entry point threads a
  *      [[StreamDrops.Counter]] into its state-transition function; the
  *      default is a named [[LongAccumulator]], which Spark surfaces
  *      per-stage in the UI/status APIs and whose running value a
  *      driver can read between micro-batches.
  *
  * The counter is an abstract hook (not a bare accumulator) so the
  * state functions stay directly drivable by the specs without a
  * SparkContext — [[StreamDrops.Noop]] for pure unit drives, a local
  * tally for drop-count assertions. */
object StreamDrops {

  /** Serializable drop-count sink — incremented on the executor inside
    * the state function, so implementations must be driver-readable
    * the way accumulators are. */
  trait Counter extends Serializable { def add(n: Long): Unit }

  /** No-op sink for pure unit drives of the state functions. */
  case object Noop extends Counter { override def add(n: Long): Unit = () }

  /** Accumulator-backed sink — the production default. */
  final class AccCounter(val acc: LongAccumulator) extends Counter {
    override def add(n: Long): Unit = if (n > 0L) acc.add(n)
  }

  /** Register a named late-drop accumulator for operator `op`
    * (`graft.drops.<op>`) — visible per micro-batch in the Spark UI's
    * stage accumulables and readable on the driver via `.acc.value`. */
  def accumulator(spark: SparkSession, op: String): AccCounter =
    new AccCounter(spark.sparkContext.longAccumulator(s"graft.drops.$op"))
}
