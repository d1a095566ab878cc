package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedIntersectCount.sortedIntersectCount

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("two-pointer count equals set-intersection size on sorted distinct arrays") {
    val rows = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 5L, 8L)),   // {3,5}
      (Seq(1L, 2L), Seq(3L, 4L)),                   // disjoint
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),           // identical
      (Seq.empty[Long], Seq(1L, 2L)),               // empty side
      (Seq.empty[Long], Seq.empty[Long]))
    val got = rows.toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(_.getLong(0))
    val expect = rows.map { case (a, b) => (a.toSet intersect b.toSet).size.toLong }
    assert(got.toSeq == expect)
  }

  test("randomized cross-check against array_intersect on sorted distinct sets") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      rng.shuffle((0L until 60L).toList).take(rng.nextInt(40)).sorted,
      rng.shuffle((0L until 60L).toList).take(rng.nextInt(40)).sorted))
    val df = rows.toDF("a", "b")
    val mismatches = df.select(
        sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .filter(col("fast") =!= col("builtin")).count()
    assert(mismatches == 0)
  }

  test("null arrays and null elements yield NULL, both eval paths") {
    val df = Seq(
      (Some(Seq[java.lang.Long](1L, 2L)), Some(Seq[java.lang.Long](2L, 3L))),
      (None, Some(Seq[java.lang.Long](1L))),
      (Some(Seq[java.lang.Long](1L, null)), Some(Seq[java.lang.Long](1L, 2L))))
      .toDF("a", "b")
    val vals = df.select(sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vals.toSeq == Seq(Some(1L), None, None))
    // interpreted (non-codegen) path via a driver-evaluated filter
    assert(df.filter(sortedIntersectCount(col("a"), col("b")) > 0L).count() == 1)
  }

  test("SQL binding through GraftExtensions") {
    Seq((Seq(1L, 4L, 9L), Seq(4L, 9L, 12L))).toDF("a", "b")
      .createOrReplaceTempView("sic_probe")
    val n = spark.sql(
      "SELECT sorted_intersect_count(a, b) AS c FROM sic_probe")
      .collect().head.getLong(0)
    assert(n == 2L)
  }

  test("rejects non-long-array inputs at analysis time") {
    val df = Seq((Seq(1.0), Seq(2L))).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(sortedIntersectCount(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
