package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (Test/fork gives one JVM). */
object TestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions())
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write a fixture `documents.parquet` into a fresh dir, return the dir
    * (same layout as the driver testdata, so operators read it as-is). */
  def docsFixture(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "fixture").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  /** Smallest driver testdata — correctness shape checks only. */
  val SF = "/root/testdata/sf0.001"
  def rowsOf(df: DataFrame): Seq[org.apache.spark.sql.Row] = df.collect().toSeq
}
