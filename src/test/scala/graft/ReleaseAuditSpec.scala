package graft

import graft.graph.Clouds
import org.apache.spark.sql.DataFrame

/** Checkpoint-LIFECYCLE audit for the loop/adjacency kernels: every
  * eager `localCheckpoint(true)` pins executor blocks until explicitly
  * released, and a kernel that returns with internal checkpoints still
  * pinned leaks them for the session (harmless at fixture scale, an
  * eviction-thrash source at 100 TB — the r13/r15 ADVICE class). The
  * contract asserted here: after a kernel's output is materialized,
  * the ONLY persistent RDDs it may leave behind are the ones its own
  * returned plan references (its final eager checkpoint); every
  * internal per-step / adjacency / index checkpoint must be gone. */
class ReleaseAuditSpec extends SparkSpec {

  /** RDD ids the frame's own plan pins — the output's checkpoints,
    * including any sitting behind a rebase/freshStats wrapper (hence
    * the full lineage walk, not just the LogicalRDD roots). */
  private def ckIds(df: DataFrame): Set[Int] = {
    val ids = scala.collection.mutable.Set.empty[Int]
    def walk(rdd: org.apache.spark.rdd.RDD[_]): Unit =
      if (ids.add(rdd.id)) rdd.dependencies.foreach(d => walk(d.rdd))
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => walk(lr.rdd)
      case _ => ()
    }
    ids.toSet
  }

  /** Monitor signalled by the ContextCleaner each time an RDD's blocks
    * finish cleaning — the audit waits on REAL cleanup events instead
    * of GC-poll sleeps (r16 ADVICE: 75 × 200 ms polling was slow and
    * GC-timing flaky). One listener for the whole suite. */
  private object cleanedSignal {
    @volatile private var attached = false
    def ensureAttached(): Unit = synchronized {
      if (!attached) {
        org.apache.spark.GraftCleanerHook.onRddCleaned(spark.sparkContext) {
          _ => synchronized { notifyAll() }
        }
        attached = true
      }
    }
    /** Wait up to `ms` for the next cleanup event (or timeout). */
    def awaitEvent(ms: Long): Unit = synchronized { wait(ms) }
  }

  private def assertReleased(label: String)(op: => DataFrame): Unit = {
    cleanedSignal.ensureAttached()
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = op
    out.count() // materialize through the caller's action
    def leakedNow(): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- before -- ckIds(out)
    var leaked = leakedNow()
    // a pin with no live reference (e.g. a kernel-internal checkpoint
    // whose frame went out of scope) is collected by Spark's
    // ContextCleaner on GC — request a GC and then wait on the
    // cleaner's OWN rddCleaned events (bounded, but returns the moment
    // cleanup lands) so the audit fails only on LIVE pins, the actual
    // session-lifetime leak class
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      System.gc()
      cleanedSignal.awaitEvent(500)
      leaked = leakedNow()
    }
    assert(leaked.isEmpty,
      s"$label leaves ${leaked.size} LIVE persistent RDDs beyond its own " +
        s"output (survived GC + ContextCleaner): " +
        leaked.toSeq.sorted.mkString(", "))
    graph.Algorithms.releaseIterate(out) // keep the suite itself clean
  }

  test("walk kernels release every per-step checkpoint and the adjacency") {
    assertReleased("g_random_walk")(Clouds.randomWalks(spark, SF))
    assertReleased("g_node2vec_walks")(Clouds.node2vecWalks(spark, SF))
  }

  test("the jaccard family releases its 2|E| adjacency input on every branch") {
    assertReleased("g_neighbor_jaccard (image branch)")(
      Clouds.neighborJaccard(spark, SF))
    assertReleased("g_neighbor_jaccard (join branch)")(
      Clouds.neighborJaccard(spark, SF, maxCells = 0L))
    assertReleased("g_neighbor_jaccard_capped")(
      Clouds.neighborJaccardCapped(spark, SF))
    assertReleased("g_link_pred")(Clouds.linkPrediction(spark, SF))
  }

  test("the bucketed eps-pair generator releases its vector and index checkpoints") {
    assertReleased("epsPairsBucketed")(
      pipeline.Similarity.epsPairsBucketed(spark, SF, 0.3))
  }

  test("the threshold sweep and linkage census stay release-clean (regression)") {
    assertReleased("g_threshold_sweep")(Clouds.thresholdSweep(spark, SF))
    assertReleased("s_linkage_census")(pipeline.Similarity.linkageCensus(spark, SF))
  }

  test("the r16 fleet-sweep offenders stay release-clean") {
    // a one-time sweep of all 196 registry keys (r16) found live pins
    // in exactly these four; each got an explicit release — keep them
    // pinned clean here
    assertReleased("g_shortest_paths")(Clouds.shortestPaths(spark, SF))
    assertReleased("s_knn_graph")(pipeline.Similarity.knnGraph(spark, SF))
    assertReleased("s_nn_descent")(pipeline.Similarity.nnDescentGraph(spark, SF))
    assertReleased("t_bpe_encode")(pipeline.Text.bpeEncode(spark, SF))
  }
}
