package graft

import org.apache.spark.sql.functions._

/** The r20 loop-action fusion helpers: a LAZY local checkpoint whose
  * convergence probe doubles as the materialization job
  * ([[graph.Algorithms.checkpointCounted]] family). The kernels'
  * value-correctness is already pinned by the oracle gate and the
  * per-kernel specs; this spec pins the helper CONTRACT — the returned
  * count is exact, the checkpoint really is materialized-and-pinned by
  * the probe (a half-computed lazy checkpoint would recompute — or
  * worse, fail — downstream), and releaseIterate can free it. */
class LoopFusionSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedRdd(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.head

  test("checkpointCounted: one-job count is exact and the checkpoint is pinned") {
    val df = (1L to 1000L).toDF("id").repartition(5)
    val (ck, n) = graph.Algorithms.checkpointCounted(df)
    assert(n == 1000L)
    assert(pinnedRdd(ck).getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
    // downstream reads see the full materialized iterate
    assert(ck.agg(sum(col("id"))).head.getLong(0) == 500500L)
    graph.Algorithms.releaseIterate(ck)
  }

  test("checkpointPredCounted: predicate count matches, full frame intact") {
    val df = (1L to 1000L).toDF("id")
      .withColumn("changed", col("id") % 7 === 0).repartition(5)
    val (ck, n) = graph.Algorithms.checkpointPredCounted(df, col("changed"))
    assert(n == (1L to 1000L).count(_ % 7 == 0))
    assert(ck.count() == 1000L) // the probe materialized EVERY partition
    graph.Algorithms.releaseIterate(ck)
  }

  test("loopCheckpointCounted: scrubbed stats, same count contract") {
    val df = (1L to 512L).toDF("id").repartition(4)
    val (ck, n) = graph.Algorithms.loopCheckpointCounted(df)
    assert(n == 512L)
    assert(ck.count() == 512L)
    graph.Algorithms.releaseIterate(ck)
  }
}
