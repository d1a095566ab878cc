package org.apache.spark

/** Test-only bridge into Spark's `private[spark]` ContextCleaner
  * listener API, so the release audit can synchronize on actual RDD
  * cleanup events instead of polling System.gc + sleep (r16 ADVICE:
  * the 75 × 200 ms poll loop was slow and GC-timing flaky). Lives in
  * the org.apache.spark package purely for access; used only by
  * graft.ReleaseAuditSpec. */
object GraftCleanerHook {

  /** Attach `f`, fired with each RDD id whose blocks the
    * ContextCleaner finished removing. No-op if the cleaner is off. */
  def onRddCleaned(sc: SparkContext)(f: Int => Unit): Unit =
    sc.cleaner.foreach(_.attachListener(new CleanerListener {
      override def rddCleaned(rddId: Int): Unit = f(rddId)
      override def shuffleCleaned(shuffleId: Int): Unit = ()
      override def broadcastCleaned(broadcastId: Long): Unit = ()
      override def accumCleaned(accId: Long): Unit = ()
      override def checkpointCleaned(rddId: Long): Unit = ()
    }))
}
