package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge.
  *
  * Spark 4 made the Column/Expression conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extension libraries
  * that ship native Catalyst expressions use a package-qualified shim
  * like this one — the same technique Spark's own connector/extension
  * modules use. Nothing else in this package; all engine code lives
  * under `graft.*`.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame. */
  def plan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame from a logical plan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-root a CHECKPOINTED frame on the same cached InternalRow RDD
    * with its carried origin statistics CLEARED. `localCheckpoint`
    * truncates the plan but eagerly copies the origin plan's Catalyst
    * `Statistics` into the new LogicalRDD (SPARK-39902); an iterative
    * kernel whose rounds self-join the previous iterate therefore
    * compounds the BigInt `sizeInBytes` digit count geometrically —
    * by round ~10 the stats visitor spends minutes inside BigInteger
    * multiplication, and the NEXT `localCheckpoint` call itself hangs
    * (it computes those stats eagerly via rewriteStatsAndConstraints).
    * Clearing `originStats` resets the leaf to `defaultSizeInBytes`
    * with ZERO data movement — same RDD, same partitioning, same
    * ordering — unlike a `createDataFrame(df.rdd, schema)` re-root,
    * which pays a Row deserialize/re-encode pass per downstream
    * action. Non-LogicalRDD roots pass through unchanged. */
  def scrubOriginStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ofRows(df.sparkSession, lr.copy()(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          None, None))
      case _ => df
    }

  /** Events DROPPED by the listener bus's SHARED queue since session
    * start. A `QueryExecutionListener` — e.g. `graft.JitAudit` — rides
    * ONLY the shared `AsyncEventQueue` of this bus, so a nonzero shared
    * dropped count means its feed is LOSSY and an "every executed plan
    * was inspected" claim cannot be certified; reading the counter
    * turns a silently-starved feed into a visible signal (the bus
    * internals are `private[spark]`, hence this bridge). Drops on the
    * OTHER bounded queues (appStatus, executorManagement, eventLog —
    * the likeliest droppers in GC-heavy runs) never starve a
    * QueryExecutionListener, so counting them would spuriously
    * de-certify a fully-inspected run (ADVICE r19); they are summed
    * separately by [[listenerEventsDroppedElsewhere]] for reporting. */
  def listenerEventsDropped(spark: org.apache.spark.sql.SparkSession): Long =
    droppedCounts(spark).collect {
      case (name, n) if name.startsWith("queue.shared.") => n
    }.sum

  /** Drops on every listener-bus queue EXCEPT the shared one (see
    * [[listenerEventsDropped]]) — report-only, never a certification
    * input. */
  def listenerEventsDroppedElsewhere(
      spark: org.apache.spark.sql.SparkSession): Long =
    droppedCounts(spark).collect {
      case (name, n) if !name.startsWith("queue.shared.") => n
    }.sum

  /** Per-queue dropped-event counters (`queue.<name>.numDroppedEvents`)
    * from the bus's metric registry. */
  private def droppedCounts(
      spark: org.apache.spark.sql.SparkSession): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.listenerBus.metrics.metricRegistry
      .getCounters.asScala.toSeq
      .collect { case (name, c) if name.endsWith("numDroppedEvents") =>
        (name, c.getCount) }
  }

  /** Is the given planner strategy registered in this session? Lets
    * operators with a custom physical plan degrade gracefully to a
    * built-in formulation in sessions built without GraftExtensions. */
  def hasStrategy(spark: org.apache.spark.sql.SparkSession,
                  s: org.apache.spark.sql.execution.SparkStrategy): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.planner.extraPlanningStrategies.exists(_ eq s)
}
