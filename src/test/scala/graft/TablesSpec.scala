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

  /** Schema canary for EVERY consumed table: the driver has regenerated
    * testdata with changed physical types twice (events.ts). If any
    * column's Spark-inferred type drifts again, this fails naming the
    * exact table/column instead of letting operators break downstream
    * (or — worse — silently change semantics). On drift: if harmless,
    * update the expectation; if a timestamp/decimal shape change,
    * normalize it in `Tables` (the `normalizeEventTs` pattern) so the
    * engine's consumed schema stays stable. */
  test("driver testdata schemas match the engine's consumed contract") {
    def sig(df: org.apache.spark.sql.DataFrame): String =
      df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
        .mkString(", ")
    val expected = Map(
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int",
      "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
        "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
        "l_discount:double, l_tax:double, l_returnflag:string, " +
        "l_linestatus:string, l_shipdate:timestamp_ntz"),
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
        "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, " +
        "p_type:string, p_size:int, p_retailprice:double"),
      "region" -> "r_regionkey:int, r_name:string",
      "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double")
    val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "customer" -> Tables.customer _, "documents" -> Tables.documents _,
      "embeddings" -> Tables.embeddings _, "events" -> Tables.events _,
      "lineitem" -> Tables.lineitem _, "nation" -> Tables.nation _,
      "orders" -> Tables.orders _, "part" -> Tables.part _,
      "region" -> Tables.region _, "supplier" -> Tables.supplier _)
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = sig(loaders(name)(spark, SF))
      if (got != want) Some(s"$name:\n  expected $want\n  got      $got") else None
    }
    assert(drift.isEmpty,
      s"TESTDATA SCHEMA DRIFT (see canary Scaladoc):\n${drift.mkString("\n")}")
  }
}
