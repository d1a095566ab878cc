package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("array_dot is callable from pure SQL when the extension is installed") {
    // getOrCreate() would silently reuse the suite's shared session and
    // ignore the extensions config — force a genuinely new session (the
    // underlying SparkContext is still shared), then restore.
    val saved = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf — with an already-running
    // SparkContext (this suite) it is ignored, so install via the
    // builder API; a real deployment sets the conf at spark-submit time.
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .head().getDouble(0)
      assert(r == 32.0)
      val wrongArity = intercept[Exception] {
        spark.sql("SELECT array_dot(array(1.0D))").collect()
      }
      assert(wrongArity.getMessage.contains("2"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      saved.foreach { s =>
        SparkSession.setDefaultSession(s)
        SparkSession.setActiveSession(s)
      }
    }
  }
}
