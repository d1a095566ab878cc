package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the number of positions where two
  * `array<long>` columns hold EQUAL non-null elements — the MinHash
  * signature-match count (est_jaccard numerator) in one generated loop.
  *
  * Why not the per-slot column spelling (`when(sa.mh_i === sb.mh_i, 1)
  * .otherwise(0)` summed over 32 slots): that chain inlines 32
  * comparisons + 32 CASE branches into the pair-verify projection —
  * 9,195 bytecode bytes at the d_minhash_lsh shape, over HotSpot's
  * 8,000-byte DontCompileHugeMethods ceiling, so the verify stage of
  * every candidate pair ran INTERPRETED (the CodegenSizeSpec audit
  * caught it fleet-wide). The count is integer arithmetic, so the
  * replacement is bit-identical: position i contributes 1 iff both
  * elements are non-null and equal — exactly the CASE's null
  * semantics (null = x → ELSE 0).
  *
  * Null/shape semantics: a null input array yields 0 (the column
  * spelling never sees a null array — the arrays are built inline
  * from non-null struct fields — so this is the total extension);
  * positions beyond the shorter array contribute 0.
  */
case class ArrayEqualCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "array_equal_count"

  private lazy val anyElementNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input).asInstanceOf[ArrayData]
    val b = right.eval(input).asInstanceOf[ArrayData]
    if (a == null || b == null) return 0
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!(anyElementNullable && (a.isNullAt(i) || b.isNullAt(i))) &&
          a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    val a = aGen.value
    val b = bGen.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val nullGuard =
      if (anyElementNullable) s"!($a.isNullAt($i) || $b.isNullAt($i)) && "
      else ""
    ev.copy(code =
      code"""
         |${aGen.code}
         |${bGen.code}
         |int $c = 0;
         |if (!${aGen.isNull} && !${bGen.isNull}) {
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($nullGuard$a.getLong($i) == $b.getLong($i)) $c++;
         |  }
         |}
         |final int ${ev.value} = $c;
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqualCount =
    copy(left = newLeft, right = newRight)
}

object ArrayEqualCount {
  import org.apache.spark.sql.graft.bridge

  /** Column-API entry point: `arrayEqualCount($"sigA", $"sigB")`. */
  def arrayEqualCount(a: Column, b: Column): Column =
    bridge.column(ArrayEqualCount(bridge.expression(a), bridge.expression(b)))
}
