package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.debug
import org.apache.spark.sql.util.QueryExecutionListener

/** In-loop codegen METHOD-SIZE audit — the [[CodegenSizeSpec]] JIT-gap
  * gate extended into the iterative kernels (r17 verdict task 2).
  *
  * HotSpot never JIT-compiles a method larger than 8,000 bytecode bytes
  * (`-XX:DontCompileHugeMethods`, on by default), while Spark only
  * abandons whole-stage codegen above 65,535 — a generated method in
  * the gap silently runs INTERPRETED (the r17 class that cost the
  * sign-LSH index build two orders of magnitude). `CodegenSizeSpec`
  * sweeps every registered key's FINAL plan, but an iterative kernel's
  * per-round stages only ever exist as transient plans materialized by
  * in-loop `localCheckpoint`/`count` actions and root their outputs at
  * checkpoints — a static sweep never sees them, so the next 59 KB
  * method could hide in a loop body and read as "host drift" for
  * rounds.
  *
  * This listener rides Spark's own action hook: EVERY Dataset action —
  * including each round's eager `localCheckpoint`, the exact seam the
  * loops materialize through — fires `QueryExecutionListener.onSuccess`
  * with the executed plan (for AQE queries, `debug.codegenStringSeq`
  * descends into the resolved adaptive subtrees). Each plan is
  * recompiled with the same generator the executor used and any
  * whole-stage subtree whose largest generated method exceeds the JIT
  * ceiling is recorded. Recompiling every round's plan is measurement
  * overhead, not something a production session pays — so the audit is
  * opt-in: `SPARK_GRAFT_JIT_AUDIT=1` on [[ScaleBench]]/[[ScaleBenchC]]
  * (run once per round at the 15k/×10 point per SURVEY §4.13/§4.14),
  * and [[JitAuditSpec]] drives the loop kernels under it in CI.
  */
object JitAudit {

  /** HotSpot's DontCompileHugeMethods ceiling (bytecode bytes). */
  val JitCeiling = 8000

  final case class Offender(action: String, maxMethodBytes: Int, subtree: String)

  final class Listener extends QueryExecutionListener {
    private val offendersBuf =
      new java.util.concurrent.ConcurrentLinkedQueue[Offender]
    private val inspectedCount = new java.util.concurrent.atomic.AtomicLong
    private val failedCount = new java.util.concurrent.atomic.AtomicLong

    /** Plans inspected so far (listener-bus-async — poll for stability
      * before reading a final value). */
    def inspected: Long = inspectedCount.get

    /** Plans whose codegen inspection itself threw (should stay 0; a
      * nonzero count means the audit has a blind spot, not the fleet). */
    def failed: Long = failedCount.get

    def offenders: Seq[Offender] = {
      import scala.jdk.CollectionConverters._
      offendersBuf.iterator().asScala.toSeq
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      try {
        inspect(qe.executedPlan, funcName).foreach(offendersBuf.add)
        inspectedCount.incrementAndGet()
      } catch {
        case scala.util.control.NonFatal(_) => failedCount.incrementAndGet()
      }
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Max-method audit of one physical plan (AQE subtrees included via
    * Spark's own debug traversal). A subtree whose generated code
    * FAILED to compile reports ByteCodeStats.UNAVAILABLE (-1) — that
    * is strictly worse than the JIT gap (Spark falls back to the
    * interpreted path for it), so the sentinel is flagged, never
    * silently passed as under-ceiling. */
  def inspect(plan: SparkPlan, action: String): Seq[Offender] =
    debug.codegenStringSeq(plan).collect {
      case (subtree, _, stats)
          if stats.maxMethodCodeSize > JitCeiling || stats.maxMethodCodeSize < 0 =>
        Offender(action, stats.maxMethodCodeSize,
          subtree.linesIterator.find(_.nonEmpty).getOrElse("").take(120))
    }

  /** Attach a fresh audit listener to the session when `enabled`;
    * returns it for the caller's end-of-run report. */
  def attachIf(enabled: Boolean, spark: SparkSession): Option[Listener] =
    if (!enabled) None
    else {
      val l = new Listener
      spark.listenerManager.register(l)
      Some(l)
    }

  /** Wait for an async counter feed to go quiet: returns once `read`
    * has been stable for `quietPolls` consecutive `pollMs` sleeps (or
    * the deadline passes). Shared by [[report]] and the spec settles —
    * one stabilization loop, not three hand-copies. */
  def awaitStable(read: () => Long, quietPolls: Int = 6, pollMs: Long = 100,
      deadlineSec: Long = 60): Long =
    awaitStableChecked(read, quietPolls, pollMs, deadlineSec)._1

  /** [[awaitStable]] plus an honest second return: `true` when the
    * quiet window was actually observed, `false` when the DEADLINE cut
    * the wait short (the feed was still moving — whatever was read is
    * a lower bound, not a settled value). */
  def awaitStableChecked(read: () => Long, quietPolls: Int = 6,
      pollMs: Long = 100, deadlineSec: Long = 60): (Long, Boolean) = {
    var cur = read()
    var same = 0
    val deadline = System.nanoTime() + deadlineSec * 1000 * 1000 * 1000
    while (same < quietPolls && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      val nxt = read()
      if (nxt == cur) same += 1 else { cur = nxt; same = 0 }
    }
    (cur, same >= quietPolls)
  }

  /** End-of-run audit verdict: the offender count plus whether the run
    * can be CERTIFIED clean at all — a pass claim needs every executed
    * plan inspected, and three things break that claim without putting
    * anything in `offenders`: an inspection that threw (`failed`), a
    * stabilization wait that hit its deadline while the feed was still
    * moving, and listener-bus queue overflow silently dropping events
    * before the listener ever saw them (the GC-heavy 150k runs are
    * exactly where the bounded shared queue lags — ADVICE r18). */
  final case class Verdict(json: String, offenders: Int, certified: Boolean)

  /** Wait for the async listener feed to go quiet (inspected count
    * stable across polls), then report: JSON fragment for the bench
    * line + per-offender stderr lines, plus the certification verdict.
    * The quiet window is 3 s of no movement: a single in-flight
    * inspection is a codegen recompile that can take hundreds of ms,
    * so a sub-second window could read the feed as done while the
    * last (often largest) plan is still being inspected. `spark` is
    * read for the bus's dropped-event counters (a dropped event is an
    * uninspected plan — uncertifiable, though invisible to `failed`). */
  def report(l: Listener, spark: SparkSession): Verdict = {
    val (_, settled) = awaitStableChecked(() => l.inspected,
      quietPolls = 10, pollMs = 300)
    // certification reads the SHARED queue only — the one this listener
    // rides; drops elsewhere (appStatus etc.) are reported, not fatal
    val dropped = org.apache.spark.sql.graft.bridge.listenerEventsDropped(spark)
    val droppedOther =
      org.apache.spark.sql.graft.bridge.listenerEventsDroppedElsewhere(spark)
    val off = l.offenders
    off.foreach(o => System.err.println(
      s"[jit-audit] OFFENDER ${o.maxMethodBytes} bytes in action " +
        s"'${o.action}': ${o.subtree}"))
    if (!settled) System.err.println(
      "[jit-audit] WARNING: inspected-count feed still moving at the " +
        "stabilization deadline — the audit may have concluded before " +
        "the last plans were delivered; treat this run as UNCERTIFIED")
    if (dropped > 0) System.err.println(
      s"[jit-audit] WARNING: listener bus SHARED queue dropped $dropped " +
        "events — plans may have been executed that the audit never saw; " +
        "treat this run as UNCERTIFIED")
    if (droppedOther > 0) System.err.println(
      s"[jit-audit] note: $droppedOther events dropped on non-shared " +
        "listener queues (appStatus/executorManagement/eventLog) — no " +
        "QueryExecutionListener rides those, so certification is unaffected")
    if (l.failed > 0) System.err.println(
      s"[jit-audit] WARNING: ${l.failed} plan inspections threw — " +
        "an uninspected plan cannot be certified under-ceiling")
    val certified = settled && dropped == 0 && l.failed == 0
    Verdict(
      s""""jit_audit":{"inspected":${l.inspected},""" +
        s""""failed":${l.failed},"offenders":${off.size},""" +
        s""""bus_dropped":$dropped,"bus_dropped_other":$droppedOther,""" +
        s""""certified":$certified}""",
      off.size, certified)
  }
}
