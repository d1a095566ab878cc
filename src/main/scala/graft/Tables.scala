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
  /** The events table's `ts` has arrived in three physical shapes across
    * testdata regenerations, so normalize ALL of them to a micros
    * TimestampType in this one place and every consumer heals at once:
    *
    *   - parquet TIMESTAMP(NANOS): Spark 4 refuses it natively; with
    *     `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as LONG
    *     nanos → `timestamp_micros(ts DIV 1000)` (integer DIV keeps it
    *     exact — double division would lose precision at 1.7e18).
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *     TIMESTAMP_NTZ → cast to TimestampType. The session timezone is
    *     pinned to UTC in every entrypoint, so the cast reinterprets the
    *     wall-clock micros as the identical UTC instant (value-exact).
    *   - TimestampType already: pass through.
    *
    * DuckDB reads the same files as TIMESTAMP_NS/TIMESTAMP; `epoch_us`
    * agrees with `unix_micros` on all shapes under UTC.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** Schema normalization for any events-shaped frame (see [[events]]). */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
