package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: intersection SIZE of two SORTED
  * `array<bigint>` columns via a two-pointer merge.
  *
  * Why not the built-in `size(array_intersect(a, b))`: array_intersect
  * builds a hash set from one side PER ROW (allocation + boxing +
  * rehashing), then materializes the intersection array only for its
  * length to be read. On a similarity-graph rescore join the arrays are
  * adjacency lists — at hub scale (deg 10⁶) that is a per-pair
  * gigabyte-churn hot loop. Both inputs here are produced by
  * `sort_array(collect_list(...))`, so the classic zero-allocation
  * two-pointer walk is available: O(|a| + |b|) comparisons, no
  * intermediate array, and `doGenCode` keeps it inside whole-stage
  * codegen.
  *
  * CONTRACT: both arrays must be sorted ascending. On unsorted input
  * the count is undefined (it degrades to a partial count, it does not
  * throw) — the call sites own the `sort_array`. Duplicates are counted
  * pairwise-min like a sorted-bag intersection; the graft call sites
  * pass distinct adjacency sets, where that equals set-intersection
  * size.
  *
  * Null semantics: the expression yields NULL when the two-pointer
  * merge REACHES a null element; a null positioned after the merge
  * terminates (e.g. a trailing null when the other array exhausts
  * first) is never inspected, so such inputs return a count. This is
  * weaker than strict NULL propagation but consistent between the
  * interpreted and codegen paths, and the graft call sites only pass
  * `sort_array` output (nulls sort FIRST, so any null is reached
  * immediately). The element null checks are only emitted when the
  * input type admits nulls.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override def nullable: Boolean = true

  private lazy val elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    val checkNulls = elementsNullable
    var c = 0L
    var i = 0
    var j = 0
    while (i < nx && j < ny) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(j))) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |long $c = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $nx && $j < $ny) {
         |  $nullCheck
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $c; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  import org.apache.spark.sql.graft.bridge

  /** Column-API entry point: `sortedIntersectCount($"a", $"b")`. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    bridge.column(SortedIntersectCount(bridge.expression(a), bridge.expression(b)))
}
