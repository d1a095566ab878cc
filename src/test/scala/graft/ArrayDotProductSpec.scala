package graft

import org.apache.spark.sql.functions._
import graft.functions.ArrayDotProduct.arrayDot

class ArrayDotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native array_dot matches driver-side sequential double math") {
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]))
    val got = rows.toDF("a", "b")
      .select(arrayDot(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    val expect = rows.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y } }
    assert(got.toSeq == expect)
  }

  test("native array_dot is null-safe and survives both eval paths") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)).toDF("a", "b")
    val vals = df.select(arrayDot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.toSeq == Seq(Some(11.0), None, None))
    // interpreted path (no codegen): evaluate via a filter on the driver
    val n = df.filter(arrayDot(col("a"), col("b")) > 10.0).count()
    assert(n == 1)
  }

  test("mismatched lengths and null elements yield NULL, both eval paths") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),       // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null element
      (Seq[java.lang.Double](2.0, 3.0), Seq[java.lang.Double](4.0, 5.0))) // clean
      .toDF("a", "b")
    val vals = df.select(arrayDot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.toSeq == Seq(None, None, Some(23.0)))
    // interpreted path: NULL comparisons are filtered out, only the clean
    // row survives
    assert(df.filter(arrayDot(col("a"), col("b")) > 0.0).count() == 1)
  }

  test("rejects non-double-array inputs at analysis time") {
    val df = Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(arrayDot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
