package graft

import graft.functions.SignLshBuckets
import graft.functions.SignLshBuckets.signLshBuckets
import org.apache.spark.sql.functions._

/** Construction-time validation + value-based equality of the shared
  * sign-LSH expression (the two r17 ADVICE items on the fleet's
  * bucketed-similarity entry point). */
class SignLshBucketsSpec extends SparkSpec {

  private def planes(tables: Int, bits: Int, dim: Int)
      : Array[Array[Array[Double]]] =
    Array.tabulate(tables)(t => Array.tabulate(bits)(j =>
      Array.tabulate(dim)(d => (t * 31 + j * 7 + d).toDouble / 100 - 0.5)))

  private def expr(p: Array[Array[Array[Double]]]): SignLshBuckets =
    SignLshBuckets(org.apache.spark.sql.graft.bridge.expression(col("v")), p)

  test("malformed plane tables fail at construction, not at bind/eval") {
    // empty planes: the old code threw IndexOutOfBounds via planes(0)(0)
    assertThrows[IllegalArgumentException](expr(Array.empty))
    // a table with zero hyperplanes
    assertThrows[IllegalArgumentException](
      expr(Array(Array.empty[Array[Double]])))
    // ragged dimensionality: table 1 rows disagree with table 0's dim
    val ragged = planes(2, 2, 4)
    ragged(1)(1) = Array(0.1, 0.2)
    assertThrows[IllegalArgumentException](expr(ragged))
    // > 64 bits/table would alias buckets via Java's mod-64 `1L << j`
    assertThrows[IllegalArgumentException](expr(planes(1, 65, 4)))
    // the fleet's real shapes construct fine
    expr(planes(16, 12, 64))
  }

  test("two identical calls compare equal (subexpression elimination sees them)") {
    // the entry points allocate fresh plane arrays per call — equality
    // must be VALUE-based or canonicalization/CSE never dedups the work.
    // Children are built directly (in a real plan the analyzer resolves
    // them to AttributeReferences, which already compare by exprId).
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def freshPlanes(last: Double) =
      Array(Array(Array(0.1, -0.2), Array(0.3, last)))
    val a = SignLshBuckets(UnresolvedAttribute("v"), freshPlanes(0.4))
    val b = SignLshBuckets(UnresolvedAttribute("v"), freshPlanes(0.4))
    val c = SignLshBuckets(UnresolvedAttribute("v"), freshPlanes(0.5))
    assert(a == b, "identical planes + child must compare equal")
    assert(a.hashCode == b.hashCode, "equal expressions must hash equal")
    assert(a != c, "different plane values must not compare equal")
  }

  test("bucket values are unchanged by the equality/validation changes") {
    import spark.implicits._
    // hand-checked fixture: v = (1, -1), table 0 planes (1,0) and (0,1)
    // → signs (+, −) → bits 0b01 = 1; table 1 plane (−1, 0) → 0b00 = 0
    val p = Seq(Seq(Array(1.0, 0.0), Array(0.0, 1.0)), Seq(Array(-1.0, 0.0)))
    val out = Seq(Seq(1.0, -1.0)).toDF("v")
      .select(signLshBuckets(col("v"), p).as("b"))
      .as[Seq[Long]].head()
    assert(out == Seq(1L, 0L))
  }
}
