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

  test("TPC-H Q3 over bucketed orders/lineitem drops the fact-join exchanges at bench SF") {
    val benchDir = "/root/testdata/sf0.1"
    assume(new java.io.File(benchDir).isDirectory, s"$benchDir not present")
    Layout.writeBucketed(Tables.orders(spark, benchDir), "bkt_orders_01", "o_orderkey", 8)
    Layout.writeBucketed(Tables.lineitem(spark, benchDir), "bkt_lineitem_01", "l_orderkey", 8)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange"))
    // fact×fact modelling: disable broadcast so both variants plan the
    // orders⋈lineitem join as SMJ — the bucketed one must skip BOTH of
    // that join's exchanges (the write already hashed and sorted)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val raw = relational.Tpch.q3Body(Tables.customer(spark, benchDir),
        Tables.orders(spark, benchDir), Tables.lineitem(spark, benchDir))
      val bucketed = relational.Tpch.q3Body(Tables.customer(spark, benchDir),
        spark.table("bkt_orders_01"), spark.table("bkt_lineitem_01"))
      assert(exchanges(bucketed) == exchanges(raw) - 2,
        s"bucketed Q3 must save exactly the two fact-join exchanges " +
          s"(raw=${exchanges(raw)}, bucketed=${exchanges(bucketed)})")
      assert(bucketed.collect().toSeq == raw.collect().toSeq,
        "layout must never change the result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("incremental dedup against a hash-bucketed store shuffles only the incoming batch") {
    // the daily 100 TB flow: the STORE (every hash ever ingested) is
    // bucketed on content_hash at rest, so the anti join re-shuffles
    // only the day's incoming batch — the store-side exchange (the one
    // proportional to corpus size) is paid once at write time
    val docs = Tables.documents(spark, SF)
    val store = docs.filter(col("source") === "src0")
      .select(md5(col("text")).as("content_hash"))
    val incoming = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
    Layout.writeBucketed(store, "bkt_store_hashes", "content_hash", 8)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val raw = incoming.join(store, Seq("content_hash"), "left_anti")
      val bucketed = incoming.join(spark.table("bkt_store_hashes"),
        Seq("content_hash"), "left_anti")
      assert(exchanges(bucketed) == exchanges(raw) - 1,
        s"bucketed store must skip its anti-join exchange " +
          s"(raw=${exchanges(raw)}, bucketed=${exchanges(bucketed)})")
      assert(bucketed.count() == raw.count(), "layout must never change the result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("ANN payload re-attach against a vec_id-bucketed vector store skips the store-side exchange") {
    // the ANN serving flow at 100 TB: candidate generation emits
    // (query, vec_id) pairs; re-attaching the (wide) vector payload is
    // a join on vec_id against the WHOLE store. Bucketing the store on
    // vec_id at rest makes that join scan pre-hashed co-located buckets
    // — the corpus-proportional exchange is paid once at ingest, every
    // query pays only the (small) candidate-side shuffle.
    import spark.implicits._
    val vecs = Tables.embeddings(spark, SF)
      .select(col("vec_id"), col("embedding"))
    Layout.writeBucketed(vecs, "bkt_vectors", "vec_id", 8)
    val cand = (0L until 50L).map(i => (i % 10, i)).toDF("query_id", "vec_id")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val raw = cand.join(vecs, Seq("vec_id"))
      val bucketed = cand.join(spark.table("bkt_vectors"), Seq("vec_id"))
      assert(exchanges(bucketed) == exchanges(raw) - 1,
        s"bucketed vector store must skip its join exchange " +
          s"(raw=${exchanges(raw)}, bucketed=${exchanges(bucketed)})")
      assert(bucketed.count() == raw.count(), "layout must never change the result")
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
