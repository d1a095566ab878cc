package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-group top-k as a first-class operator.
  *
  * Spark expresses "top k rows per group" as
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k`, which
  * physically SORTS every group in full — at 100 TB a popular group is
  * billions of rows and the sort spills. The dedicated operator keeps a
  * bounded k-heap per group in TWO phases, exactly like a hash
  * aggregate: a map-side partial pass bounds the SHUFFLE to ≤ k rows
  * per (group, input partition), then a final pass after the group
  * exchange merges the partials. O(n log k) compute, O(k) state per
  * group, no sort, no spill.
  *
  * Wiring: [[TopKPerGroup]] (logical) is planned by [[TopKStrategy]]
  * (injected via `graft.GraftExtensions`) into partial+final
  * [[TopKPerGroupExec]] nodes; `EnsureRequirements` inserts the group
  * exchange between them because the final node declares
  * `ClusteredDistribution`. [[topKPerGroup]] is the Column-API entry.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groups = groupExprs
    val orders = sortOrders
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groups, childOutput)
      val ordering = new LazilyGeneratedOrdering(orders, childOutput)
      // PriorityQueue is a max-heap: with `ordering` itself (compare<0 ⇒
      // sorts earlier ⇒ better), the head is the row that sorts LAST —
      // the worst retained row, evicted when a better one arrives
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](
            ordering.asInstanceOf[Ordering[InternalRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach { (_, heap) => out ++= heap.dequeueAll.reverseIterator }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.graft.bridge
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  /** Top `k` rows per `group`, best-first by `orderBy`
    * ((column, descending?) pairs). Built directly on the analyzed
    * child's attribute references, so the node enters planning fully
    * resolved. Rows are returned unranked — rank the (tiny) result
    * downstream if needed. */
  def topKPerGroup(df: DataFrame, group: Seq[String],
                   orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = bridge.plan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${child.output.map(_.name).mkString(", ")}"))
    val orders = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    bridge.ofRows(df.sparkSession,
      TopKPerGroup(group.map(attr), orders, k, child))
  }

  /** The k = 1 case — each group's single BEST row under the total
    * (orderBy + tiebreak) order, skipping [[rankTopK]]'s window: the
    * native two-phase heap already returns exactly one row per group,
    * and that row IS the argmin/argmax. Exists to replace
    * `groupBy(g).agg(min(struct(o…)))` / `max(struct(…))` argmins: a
    * struct-typed Min/Max has no mutable UnsafeRow buffer, so it plans
    * as ObjectHashAggregate, whose sort-based fallback kicks in past
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) distinct groups per task — i.e. every |V|-group or
    * |corpus|-group argmin EXTERNALLY SORTS the full candidate stream
    * on both sides of its exchange (the degradation
    * [[graft.graph.Algorithms.boruvkaMst]] documents and dodges with a
    * child-session conf; this operator dodges it structurally). The
    * heap pass is O(n) with O(groups) state and shuffles ≤ 1 row per
    * (group, map partition) — the same volume as the aggregate's
    * partial. Callers must pass a TOTAL order (orderBy ∪ tiebreak
    * unique within each group), same contract as every top-k site;
    * results are bit-identical to the struct-aggregate formulation.
    * Without the strategy, degrades to the windowed rank (identical
    * rows). */
  def top1PerGroup(df: DataFrame, group: Seq[String],
                   orderBy: Seq[(String, Boolean)]): DataFrame =
    if (bridge.hasStrategy(df.sparkSession, TopKStrategy))
      topKPerGroup(df, group, orderBy, 1)
    else rankTopK(df, group, orderBy, 1).drop("rnk")

  /** The prune-or-degrade idiom shared by every top-k call site: when
    * the session has [[TopKStrategy]] registered, cut the input down
    * with the native two-phase heap operator first (bounded k-heaps,
    * map-side partial, no per-group sort), then let a window rank the
    * ≤ k·groups survivors; without the strategy the window alone
    * produces identical results — the caller's (orderBy, tiebreak)
    * order must be total. Returns the input columns plus a long `rnk`
    * in 1..k per group. */
  def rankTopK(df: DataFrame, group: Seq[String],
               orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val pruned =
      if (bridge.hasStrategy(df.sparkSession, TopKStrategy))
        topKPerGroup(df, group, orderBy, k)
      else df
    val w = Window.partitionBy(group.map(col): _*)
      .orderBy(orderBy.map { case (n, desc) => if (desc) col(n).desc else col(n).asc }: _*)
    pruned.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
