package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish testdata.
  *
  * All operators take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read
  * `$sfDir/<table>.parquet`. Reads are plain declarative scans so Catalyst
  * pushes filters/projections into the parquet reader — at 100 TB the same
  * code reads a partitioned table directory unchanged.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table carries parquet TIMESTAMP(NANOS) which Spark 4 refuses
    * to read natively. With `spark.sql.legacy.parquet.nanosAsLong=true` the
    * column arrives as LONG nanos; normalize to a micros TimestampType here
    * (integer DIV keeps it exact — double division would lose precision at
    * 1.7e18). DuckDB reads the same file as TIMESTAMP_NS; second-level
    * truncation on both sides keeps oracle comparisons precision-proof.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
