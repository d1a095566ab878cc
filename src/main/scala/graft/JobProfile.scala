package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run registry keys under bench-identical session conf and
  * report, per key, the JOB/STAGE/TASK shape of the execution — jobs
  * launched, stages run, summed task time, shuffle bytes — next to the
  * wall clock. Separates "compute-bound" from "fixed-overhead-bound"
  * (hundreds of tiny jobs from an iterative kernel's per-round
  * actions), which is the first split any optimization of the loop
  * kernels needs (guide §1: measure first).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProfile g_mst ..."
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1
          tasks += s.stageInfo.numTasks
          taskMs += s.stageInfo.taskMetrics.executorRunTime
          shufWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          shufRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // one warmup pass at the smallest SF so JIT noise does not read as
    // compute (same rationale as Bench's warmup)
    val warmDir = "/root/testdata/sf0.001"
    args.foreach { k =>
      if (new java.io.File(warmDir).isDirectory)
        try SparkEntry.queries(k)(spark, warmDir).count()
        catch { case _: Throwable => () }
      // listener events are async; a short drain pause is plenty for a
      // dev tool (the bus clears in ms once the action returns)
      Thread.sleep(500)
      synchronized { jobs = 0; stages = 0; tasks = 0; taskMs = 0; shufWrite = 0; shufRead = 0 }
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"PROFILE $k rows=$n wall=$wall%.2fs jobs=$jobs stages=$stages " +
        f"tasks=$tasks taskTime=${taskMs / 1e3}%.1fs " +
        f"shufW=${shufWrite / 1e6}%.1fMB shufR=${shufRead / 1e6}%.1fMB " +
        f"parallelEff=${taskMs / 1e3 / wall / cpus.toDouble}%.2f")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
