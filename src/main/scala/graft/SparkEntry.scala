package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (relational.Tpch.queries, relational.Tpch.oracle),
      (relational.Joins.queries, relational.Joins.oracle),
      (graph.Clouds.queries, graph.Clouds.oracle),
      (pipeline.Dedup.queries, pipeline.Dedup.oracle),
      (pipeline.Text.queries, pipeline.Text.oracle),
      (pipeline.Similarity.queries, pipeline.Similarity.oracle),
      (pipeline.Multimodal.queries, pipeline.Multimodal.oracle),
      (streaming.Windowed.queries, streaming.Windowed.oracle),
      (streaming.Sessionize.queries, streaming.Sessionize.oracle),
      (streaming.StreamJoin.queries, streaming.StreamJoin.oracle),
      (streaming.Enrich.queries, streaming.Enrich.oracle),
      (streaming.CdcCompact.queries, streaming.CdcCompact.oracle),
      (streaming.FingerprintScreen.queries, streaming.FingerprintScreen.oracle),
      (streaming.Anomaly.queries, streaming.Anomaly.oracle),
      (streaming.Funnel.queries, streaming.Funnel.oracle),
      (streaming.ContributionCap.queries, streaming.ContributionCap.oracle),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.Tpch.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Each entry pins the PASSED session as the thread's active session
    * before building its plan: session-conf-gated plan decisions
    * (graft.hash.impl — [[Hashing.hash60]]) resolve through the
    * thread-local `SQLConf.get` at Column-construction time, and
    * without this seam a caller invoking a key with session A from a
    * thread whose active session is B would silently build A's plan
    * under B's conf. One wrapper here covers the whole registry.
    *
    * The pin is SCOPED: the caller's previously-active session is
    * restored (or, when there was none, cleared) in a finally — the
    * plan decisions resolve during `fn`, and leaving the key's session
    * active after the call would hand a multi-session driver the wrong
    * conf for its OWN next plan on the same thread (the exact hazard
    * this wrapper exists to prevent, r18 verdict nit 1). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _).map { case (k, fn) =>
      k -> ((s: SparkSession, dir: String) => {
        val prev = SparkSession.getActiveSession
        SparkSession.setActiveSession(s)
        try fn(s, dir)
        finally prev match {
          case Some(p) => SparkSession.setActiveSession(p)
          case None => SparkSession.clearActiveSession()
        }
      })
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
