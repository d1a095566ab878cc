package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.debug

/** Fleet-wide codegen METHOD-SIZE audit — the r17 lesson made a
  * permanent gate. HotSpot never JIT-compiles a method larger than
  * 8,000 bytecode bytes (-XX:DontCompileHugeMethods, on by default),
  * while Spark only abandons a whole-stage subtree above
  * spark.sql.codegen.hugeMethodLimit = 65,535 — so a generated method
  * in the (8,000, 65,535] gap silently runs INTERPRETED with no
  * warning anywhere. That exact gap cost the eps-index build 203 s of
  * interpreted evaluation for what is 0.8 s JIT-compiled (the per-bit
  * sign-LSH spelling inlined 16×12 64-dim dot products into one
  * 59,690-byte method; see [[graft.functions.SignLshBuckets]]).
  *
  * The audit compiles every registered key's FINAL plan (plus the
  * forced-bucketed eps layer, whose index-build stage the registered
  * keys' exact-at-test-SF branch would otherwise hide) via Spark's own
  * debug.codegenStringSeq — the same compiler the executor uses — and
  * fails on any whole-stage subtree whose largest generated method
  * exceeds the JIT ceiling. Iterative kernels root their outputs at
  * checkpoints, so their in-loop stages are audited by their own
  * drivers ([[ScaleBench]]/[[ScaleBenchC]]); this gate covers the
  * one-shot plan surface, which is where wide expression fan-outs
  * (per-bit columns, unrolled literals, mega-CASE chains) live.
  */
class CodegenSizeSpec extends SparkSpec {

  /** HotSpot's DontCompileHugeMethods ceiling. */
  private val JitCeiling = 8000

  /** AQE-off clone: under adaptive execution the physical tree hides
    * its stages behind AdaptiveSparkPlanExec until runtime, so a
    * static codegenStringSeq sweep sees almost nothing (measured: 5
    * subtrees across 196 keys — the non-vacuity assert below exists
    * because of exactly that). The audit is about GENERATED CODE
    * shape, which is identical either way; with AQE off the full
    * whole-stage tree is visible statically. Cloned session so the
    * shared suite session never observes the conf (the SSSP
    * loop-width precedent). */
  private lazy val auditSession = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      // only the two copy-rejection classes a conf clone legitimately
      // hits (static/immutable entries, removed-config errors) — a
      // fatal VM error must propagate, not vanish into a skipped entry
      try s.conf.set(k, v) catch {
        case _: org.apache.spark.sql.AnalysisException => ()
        case _: IllegalArgumentException => ()
      }
    }
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def maxMethodSize(df: DataFrame): Seq[(String, Int)] =
    debug.codegenStringSeq(df.queryExecution.executedPlan).map {
      case (subtree, _, stats) =>
        (subtree.linesIterator.find(_.nonEmpty).getOrElse("").take(120),
          stats.maxMethodCodeSize)
    }

  test("no registered key's final plan generates a method above the JIT ceiling") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    var audited = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (key, fn) =>
      val df =
        try fn(auditSession, SF)
        catch { case e: Throwable => fail(s"$key failed to build: ${e.getMessage}") }
      maxMethodSize(df).foreach { case (subtree, size) =>
        audited += 1
        // size < 0 = ByteCodeStats.UNAVAILABLE: the generated code
        // failed to compile at all — flag it, never pass it as clean
        if (size > JitCeiling || size < 0)
          offenders += f"$key%-28s $size%6d  $subtree"
      }
      // iterative kernels may pin checkpoints in their returned plan;
      // release so the 196-key sweep doesn't accumulate blocks
      graph.Algorithms.releaseIterate(df)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // non-vacuity, floored by the registry itself: nearly every key's
    // final plan carries ≥ 1 whole-stage subtree, so a sweep that saw
    // fewer subtrees than registered keys has broken (e.g. AQE hiding
    // the tree again) — the floor tracks registry growth automatically
    assert(audited >= SparkEntry.queries.size,
      s"audit saw only $audited codegen subtrees across " +
        s"${SparkEntry.queries.size} registered keys")
    assert(offenders.isEmpty,
      s"${offenders.size} whole-stage subtrees exceed the HotSpot JIT " +
        s"ceiling ($JitCeiling bytecode bytes) and would run INTERPRETED:\n" +
        offenders.mkString("\n"))
  }

  test("the forced-bucketed eps layer stays under the JIT ceiling") {
    // the registered dbscan/census keys take the exact branch at test
    // SF, so force the bucketed generator the way a >MaxExactVectors
    // corpus would reach it (the branch that regressed pre-r17)
    val eps = pipeline.Similarity.epsPairsBucketed(auditSession, SF, 0.3)
    val big = maxMethodSize(eps).filter(s => s._2 > JitCeiling || s._2 < 0)
    graph.Algorithms.releaseIterate(eps)
    assert(big.isEmpty,
      s"forced eps layer generates interpreted-only methods:\n" +
        big.map { case (s, n) => s"$n  $s" }.mkString("\n"))
  }
}
