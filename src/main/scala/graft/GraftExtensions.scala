package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ArrayDotProduct, SortedIntersectCount}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so pure-SQL users get them too:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT array_dot(a.embedding, b.embedding) FROM ...
  *
  * The Column API ([[ArrayDotProduct.arrayDot]]) works without this —
  * the extension only adds the SQL name binding.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(
        classOf[ArrayDotProduct].getCanonicalName, "", "array_dot",
        "array_dot(a, b) - sequential-order dot product of two array<double> columns.",
        "", "", "", "", "4.0.0", "", "built-in"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "array_dot takes exactly 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(
        classOf[SortedIntersectCount].getCanonicalName, "", "sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two sorted array<bigint> columns (two-pointer merge).",
        "", "", "", "", "4.0.0", "", "built-in"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "sorted_intersect_count takes exactly 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
  }
}
