package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** The storage layouts must actually change the plans: bucketing must
  * delete the join exchanges, partitioning must prune at planning time. */
class LayoutSpec extends SparkSpec {

  test("same-bucketed tables sort-merge join with zero exchanges") {
    val orders = Tables.orders(spark, SF).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, SF)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Layout.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    Layout.writeBucketed(li, "bkt_lineitem", "o_orderkey", 8)
    // model the fact×fact case bucketing exists for: at test SF the
    // planner would broadcast these tiny tables (and rightly skip the
    // bucketed scan), so pin broadcast off for the assertion
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.colocatedJoin(spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.linesIterator.take(12).mkString("\n")}")
      // and it still computes the right thing
      assert(joined.count() == Tables.lineitem(spark, SF)
        .join(Tables.orders(spark, SF), col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("partitioned table prunes partitions at planning time") {
    val ev = Tables.events(spark, SF)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Layout.writePartitioned(ev, "part_events", "day")
    val days = spark.table("part_events").select("day").distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.length > 1, "fixture must span multiple days")
    val q = spark.table("part_events").filter(col("day") === days.head)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || scan.contains("partitionFilters"),
      "day predicate must reach the scan as a partition filter")
    val pruned = q.queryExecution.optimizedPlan.stats.sizeInBytes
    val full = spark.table("part_events").queryExecution.optimizedPlan.stats.sizeInBytes
    assert(pruned < full, "pruned scan must be estimated strictly smaller")
    assert(q.count() == ev.filter(col("day") === days.head).count())
  }
}
