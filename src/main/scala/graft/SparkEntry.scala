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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
