package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Anomaly

class AnomalySpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  /** Events fixture dir with the driver's events.parquet layout. */
  private def eventsFixture(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "fixture").toString
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // 16 warm-up values with some variance, then a huge spike, then a calm
  // value; a second type stays constant then deviates (zero-variance path)
  private val varied: Seq[Double] =
    Seq(10.0, 11.0, 10.0, 9.0, 10.0, 11.0, 10.0, 9.0,
        10.0, 11.0, 10.0, 9.0, 10.0, 11.0, 10.0, 9.0)
  private val plantedRows: Seq[(Long, Timestamp, Long, String, Double, String)] = {
    val a = varied.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i), 1L, "click", v, "{}")
    } ++ Seq(
      (16L, ts(16), 1L, "click", 500.0, "{}"),  // spike: |z| >> 3
      (17L, ts(17), 1L, "click", 10.0, "{}"))   // calm again (spike now in window)
    val b = (0 until 16).map(i =>
      (100L + i, ts(i), 2L, "error", 5.0, "{}")) ++ Seq(
      (116L, ts(16), 2L, "error", 5.01, "{}"),  // zero variance, any deviation flags
      (117L, ts(17), 2L, "error", 5.0, "{}"))   // back on the constant: no flag
    a ++ b
  }

  test("batch anomaly flags the planted spike and the zero-variance deviation, nothing else") {
    val dir = eventsFixture(plantedRows)
    val got = rowsOf(Anomaly.anomalyBatch(spark, dir))
    val ids = got.map(_.getLong(0)).toSet
    assert(ids == Set(16L, 116L), s"flagged $ids")
    val spike = got.find(_.getLong(0) == 16L).get
    // z for the spike: W=16, window = varied (cents), v = 50000
    val cents = varied.map(v => (v * 100).round)
    val s = cents.sum; val q = cents.map(x => x * x).sum
    val num = 16L * 50000L - s
    val den = 16L * q - s * s
    assert(spike.getLong(2) == num && spike.getLong(3) == den)
    val wantZ = java.math.BigDecimal.valueOf(
        math.sqrt((num * num).toDouble / den.toDouble))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(spike.getDouble(4) == wantZ)
    assert(wantZ > 3.0)
    // zero-variance deviation carries a null z
    val dev = got.find(_.getLong(0) == 116L).get
    assert(dev.getLong(3) == 0L && dev.isNullAt(4))
  }

  test("streaming anomaly equals the batch twin across micro-batches under ordered arrival") {
    val dir = eventsFixture(plantedRows)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val events = stream.toDF.toDF("event_id", "ts", "event_type", "value")
    val query = Anomaly.anomalyStreaming(events).writeStream
      .format("memory").queryName("anomaly_sink").outputMode("append").start()
    try {
      val ordered = plantedRows.sortBy(r => (r._2.getTime, r._1))
        .map(r => (r._1, r._2, r._4, r._5))
      val (b1, b2) = ordered.splitAt(20)
      stream.addData(b1: _*)
      query.processAllAvailable()
      stream.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("anomaly_sink")
        .select("event_id", "event_type", "dev_num", "var_num", "z")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSet
      val want = rowsOf(Anomaly.anomalyBatch(spark, dir))
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSet
      assert(got == want)
      assert(got.map(_._1) == Set(16L, 116L))
    } finally query.stop()
  }

  test("st_anomaly on the driver events table is calm-majority and deterministic") {
    val a = rowsOf(Anomaly.anomalyBatch(spark, SF))
    val b = rowsOf(Anomaly.anomalyBatch(spark, SF))
    assert(a == b)
    val total = Tables.events(spark, SF).count()
    assert(a.size < total / 10, s"flagged ${a.size} of $total — screen too hot")
  }
}
