package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerGroup

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def sample = {
    val rng = new scala.util.Random(3)
    (1 to 500).map(i => (rng.nextInt(7).toLong, i.toLong, rng.nextInt(1000).toDouble))
  }

  test("native top-k per group equals the window formulation") {
    val df = sample.toDF("g", "id", "score").repartition(5)
    val native = TopKPerGroup.topKPerGroup(
        df, Seq("g"), Seq("score" -> true, "id" -> false), 3)
      .select(col("g"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("g"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == viaWindow)
  }

  test("physical plan is a two-phase heap with a group exchange, no sort") {
    val df = sample.toDF("g", "id", "score").repartition(5)
    // stringify: AQE wraps the plan, so node collection would miss it
    val plan = TopKPerGroup.topKPerGroup(
        df, Seq("g"), Seq("score" -> true), 3)
      .queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2,
      s"partial + final pair in:\n$plan")
    assert(plan.contains("Exchange"), "group exchange between phases")
    assert(!plan.contains("Sort ["), s"no sort operator in:\n$plan")
  }

  test("k larger than any group returns everything; groups smaller than k survive") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (2L, 3L, 1.0)).toDF("g", "id", "score")
    val all = TopKPerGroup.topKPerGroup(df, Seq("g"), Seq("score" -> true), 10)
      .count()
    assert(all == 3)
  }

  test("top1PerGroup equals the struct-min argmin on a many-group input") {
    // 900 groups across 7 partitions — far past the 128-group
    // ObjectHashAggregate fallback the heap exists to dodge, so this
    // pins value-equality exactly where the two plans diverge most
    val rng = new scala.util.Random(7)
    val df = (1 to 4000)
      .map(i => (rng.nextInt(900).toLong, i.toLong, rng.nextInt(50).toDouble))
      .toDF("g", "id", "score").repartition(7)
    val viaHeap = TopKPerGroup.top1PerGroup(
        df, Seq("g"), Seq("score" -> false, "id" -> false))
      .select(col("g"), col("id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaAgg = df.groupBy(col("g"))
      .agg(min(struct(col("score"), col("id"))).as("m"))
      .select(col("g"), col("m.id"), col("m.score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaHeap == viaAgg)
    // and the descending (argmax) orientation against max(struct)
    val viaHeapMax = TopKPerGroup.top1PerGroup(
        df, Seq("g"), Seq("score" -> true, "id" -> false))
      .select(col("g"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaAggMax = df.groupBy(col("g"))
      .agg(max(struct(col("score"), (-col("id")).as("neg"))).as("m"))
      .select(col("g"), (-col("m.neg")).as("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaHeapMax == viaAggMax)
  }

  test("similarity top-k uses the native operator under the extension session") {
    val plan = graft.pipeline.Similarity.cosineTopK(spark, SF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["),
      "cosineTopK plans through the native two-phase operator")
  }
}
