package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drift-proofing for the events `ts` normalization: the driver has
  * regenerated testdata with a new physical timestamp type twice
  * (TIMESTAMP_NANOS in r7, TIMESTAMP_NTZ micros in r10), and each time
  * silently broke every `unix_micros`/`session_window` consumer. This
  * spec constructs an events parquet in all three observed shapes and
  * asserts `Tables.events` always yields a µs TimestampType with the
  * same instant values, so the next physical-type surprise fails HERE
  * with a named assertion instead of at analysis time fleet-wide.
  */
class TablesSpec extends SparkSpec {

  /** 2024-01-15T12:34:56.789012Z in epoch micros. */
  private val InstantUs = 1705322096789012L

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "events-shape").toString

  private def assertNormalized(dir: String, shape: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"$shape: Tables.events must yield TimestampType, got ${ev.schema("ts").dataType}")
    val us = ev.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(us == Seq(InstantUs),
      s"$shape: normalization must preserve the instant ($InstantUs), got $us")
  }

  test("events ts: native TIMESTAMP passes through") {
    val dir = fixtureDir()
    import spark.implicits._
    Seq((1L, InstantUs, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertNormalized(dir, "TIMESTAMP")
  }

  test("events ts: TIMESTAMP_NTZ (µs, isAdjustedToUTC=false) is cast to UTC instant") {
    val dir = fixtureDir()
    import spark.implicits._
    Seq((1L, InstantUs, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // confirm the fixture really round-trips as NTZ before testing the fix
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"fixture must surface as NTZ, got ${raw.schema("ts").dataType}")
    assertNormalized(dir, "TIMESTAMP_NTZ")
  }

  test("events ts: INT64 nanos (legacy nanosAsLong) is DIV-1000 normalized") {
    val dir = fixtureDir()
    import spark.implicits._
    // nanosAsLong surfaces TIMESTAMP(NANOS) as a plain LONG of nanos;
    // writing a LONG column named ts reproduces what the reader yields
    Seq((1L, InstantUs * 1000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assertNormalized(dir, "INT64-nanos")
  }

  test("driver testdata events normalizes to TimestampType at sf0.001") {
    val ev = Tables.events(spark, SF)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1)
  }
}
