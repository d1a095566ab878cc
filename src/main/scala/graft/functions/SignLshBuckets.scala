package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: ALL sign-LSH table buckets of a vector in
  * one pass — `array<long>` of length `numTables`, where element `t`
  * packs the sign bits of the table-`t` hyperplane projections
  * (`bit j set ⟺ Σ_d v(d)·plane(t)(j)(d) > 0`, the dot folded
  * left-to-right in element order exactly like
  * [[ArrayDotProduct]] — the DuckDB oracles replay these very doubles).
  *
  * Why one expression instead of the previous per-bit column spelling
  * (`when(arrayDot(v, lit-array) > 0, 1L << j)` summed per table,
  * exploded): with T tables × k bits the explode stage inlines T·k
  * unrolled 64-dim dot products into ONE generated Java method —
  * measured 59,690 bytecode bytes at the eps-index shape (16×12),
  * under Spark's 65,535 codegen-fallback limit but far over HotSpot's
  * `DontCompileHugeMethods` 8,000-byte JIT ceiling, so the whole
  * narrow-map stage ran INTERPRETED: 203 s for 200k vectors
  * (§4.14 ×100 eps_index stage). This expression keeps the arithmetic
  * bit-identical (same fold order, same `> 0` test, same `1L << j`
  * packing, so every bucket value and downstream oracle hash is
  * unchanged) but emits a ~30-line triple loop with the planes in a
  * compiled reference object — measured 2.5 s on the same 200k rows.
  *
  * Null semantics replicate the column spelling exactly: a null input
  * vector, a length-mismatched vector, or a null element each made
  * every per-bit `arrayDot` NULL, so every `when` fell to its
  * `otherwise(0L)` and the row produced all-zero buckets (never a null
  * array). Hence `nullable = false` and the zero-fill fast path below.
  */
case class SignLshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  // shared entry for every sign-LSH consumer — fail at CONSTRUCTION, not
  // with an IndexOutOfBounds at bind time / silent bucket aliasing later
  // (r17 ADVICE): non-empty tables, one consistent dimensionality, and
  // ≤ 64 bits per table (the bucket packs bits into one long; a 65th bit
  // would alias buckets via Java's mod-64 shift semantics)
  require(planes.nonEmpty && planes.forall(_.nonEmpty),
    "sign-LSH planes must carry ≥ 1 table with ≥ 1 hyperplane each")
  require(planes.forall(_.length <= 64),
    s"sign-LSH buckets pack each table's sign bits into one long — at " +
      s"most 64 bits per table, got ${planes.map(_.length).max}")
  require(planes.forall(_.forall(_.length == planes(0)(0).length)),
    "sign-LSH hyperplanes must share one dimensionality across all tables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sign_lsh_buckets"

  private lazy val dim: Int = planes(0)(0).length

  private lazy val elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    val nT = planes.length
    val out = new Array[Long](nT)
    var ok = v != null && v.numElements() == dim
    if (ok && elementsNullable) {
      var d = 0
      while (ok && d < dim) { if (v.isNullAt(d)) ok = false; d += 1 }
    }
    if (ok) {
      var t = 0
      while (t < nT) {
        val tbl = planes(t)
        var b = 0L
        var j = 0
        while (j < tbl.length) {
          val h = tbl(j)
          var s = 0.0
          var d = 0
          while (d < dim) { s += v.getDouble(d) * h(d); d += 1 }
          if (s > 0) b |= (1L << j)
          j += 1
        }
        out(t) = b
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val out = ctx.freshName("out")
    val ok = ctx.freshName("ok")
    val t = ctx.freshName("t")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val s = ctx.freshName("s")
    val b = ctx.freshName("b")
    val tbl = ctx.freshName("tbl")
    val h = ctx.freshName("h")
    val nullElemCheck =
      if (elementsNullable)
        s"""for (int $d = 0; $ok && $d < $dim; $d++) {
           |  if ($v.isNullAt($d)) $ok = false;
           |}""".stripMargin
      else ""
    ev.copy(code =
      code"""
         |${childGen.code}
         |long[] $out = new long[${planes.length}];
         |boolean $ok = !${childGen.isNull} && $v.numElements() == $dim;
         |$nullElemCheck
         |if ($ok) {
         |  for (int $t = 0; $t < ${planes.length}; $t++) {
         |    double[][] $tbl = $planesRef[$t];
         |    long $b = 0L;
         |    for (int $j = 0; $j < $tbl.length; $j++) {
         |      double[] $h = $tbl[$j];
         |      double $s = 0.0;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        $s += $v.getDouble($d) * $h[$d];
         |      }
         |      if ($s > 0) $b |= (1L << $j);
         |    }
         |    $out[$t] = $b;
         |  }
         |}
         |final ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  // the Array-typed field would make case-class equality REFERENCE-based
  // (and the Column entry point allocates fresh arrays per call), so two
  // identical signLshBuckets calls would never compare equal — defeating
  // subexpression elimination and plan canonicalization (r17 ADVICE).
  // Value-compare the planes instead. Expression equality/hashCode run
  // many times per optimizer batch (ExpressionSet, CSE maps,
  // canonicalization), so the O(tables·bits·dim) tensor walk is cached
  // (plane hash) and pre-filtered (reference, then hash) — the deep
  // element compare only runs for distinct-reference, hash-equal pairs.
  @transient private lazy val planesHash: Int =
    java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override def equals(other: Any): Boolean = other match {
    case s: SignLshBuckets =>
      child == s.child &&
        ((planes eq s.planes) ||
          (planesHash == s.planesHash && java.util.Arrays.deepEquals(
            planes.asInstanceOf[Array[AnyRef]],
            s.planes.asInstanceOf[Array[AnyRef]])))
    case _ => false
  }

  override def hashCode(): Int = 31 * child.hashCode() + planesHash

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {
  import org.apache.spark.sql.graft.bridge

  /** Column-API entry point: per-table sign-LSH buckets of `v` under
    * `planes` (indexed planes(table)(bit)(dim)). */
  def signLshBuckets(v: Column, planes: Seq[Seq[Array[Double]]]): Column =
    bridge.column(SignLshBuckets(bridge.expression(v),
      planes.map(_.toArray).toArray))
}
