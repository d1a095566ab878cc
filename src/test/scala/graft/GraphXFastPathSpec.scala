package graft

import org.apache.spark.sql.functions._
import graft.graph.{Algorithms, Clouds, GraphXFastPath, TestGraph}

/** The GraphX fast path must agree with the 100 TB DataFrame loops. */
class GraphXFastPathSpec extends SparkSpec {
  import spark.implicits._

  test("GraphX connected components equal the DataFrame loop on the test graph") {
    val g = TestGraph.graph(spark, SF)
    val edges = g.edges.filter(col("distance") <= TestGraph.QueryThreshold)
    val df = Algorithms.connectedComponents(g.nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = GraphXFastPath.connectedComponents(spark, g.nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df == gx)
  }

  test("GraphX triangle counts equal the degree-oriented wedge join per node") {
    val g = TestGraph.graph(spark, SF)
    val df = g.triangleCounts(col("distance") <= TestGraph.QueryThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = g.edges.filter(col("distance") <= TestGraph.QueryThreshold)
    val gx = GraphXFastPath.triangleCounts(spark, g.nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df == gx)
  }

  test("GraphX Pregel SSSP equals the DataFrame loop bitwise on the test graph") {
    val g = TestGraph.graph(spark, SF)
    val sym = g.symmetrizedEdges.filter(col("distance") <= TestGraph.QueryThreshold)
      .withColumnRenamed("distance", "weight")
    val seeds = g.nodes.filter(col("source") === TestGraph.Ncbi &&
      contains(col("taxonomy"), lit("4"))).select(col("id"))
    val df = Algorithms.shortestPaths(g.nodes, sym, seeds)
      .filter(col("dist").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gx = GraphXFastPath.shortestPaths(spark, g.nodes, sym, seeds).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(df == gx, "identical reachable sets and bitwise-equal distances")
  }

  test("GraphX k-core equals the DataFrame peel on the test graph and random graphs") {
    val g = TestGraph.graph(spark, SF)
    val edges = g.edges.filter(col("distance") <= TestGraph.QueryThreshold)
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(
      toMap(Algorithms.kCore(g.nodes, edges, Clouds.KCoreK).collect()) ==
        toMap(GraphXFastPath.kCore(spark, g.nodes, edges, Clouds.KCoreK).collect()))
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed * 7)
      val n = 5 + rng.nextInt(20)
      val es = List.fill(3 * n) {
        val a = rng.nextInt(n).toLong
        var b = rng.nextInt(n).toLong
        if (a == b) b = (a + 1) % n
        (a, b)
      }
      val nodes = (0L until n.toLong).toDF("id")
      val edf = es.toDF("src", "dst")
      assert(
        toMap(Algorithms.kCore(nodes, edf, 3).collect()) ==
          toMap(GraphXFastPath.kCore(spark, nodes, edf, 3).collect()),
        s"seed=$seed edges=$es")
    }
  }

  test("GraphX label propagation equals the DataFrame rounds on the test graph and random graphs") {
    val g = TestGraph.graph(spark, SF)
    val edges = g.edges.filter(col("distance") <= TestGraph.QueryThreshold)
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(
      toMap(Algorithms.labelPropagation(g.nodes, edges).collect()) ==
        toMap(GraphXFastPath.labelPropagation(spark, g.nodes, edges).collect()))
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed * 13)
      val n = 5 + rng.nextInt(20)
      val es = List.fill(2 * n) {
        val a = rng.nextInt(n).toLong
        var b = rng.nextInt(n).toLong
        if (a == b) b = (a + 1) % n
        (a, b)
      }
      val nodes = (0L until n.toLong).toDF("id")
      val edf = es.toDF("src", "dst")
      assert(
        toMap(Algorithms.labelPropagation(nodes, edf).collect()) ==
          toMap(GraphXFastPath.labelPropagation(spark, nodes, edf).collect()),
        s"seed=$seed edges=$es")
    }
  }

  test("GraphX pagerank ranks a dangling-free fixture like the DataFrame loop") {
    // strongly connected: no dangling normalization difference
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    def ranking(rows: Seq[(Long, Double)]): Seq[Long] =
      rows.sortBy { case (id, r) => (-r, id) }.map(_._1)
    val df = Algorithms.pageRank(nodes, edges, iters = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val gx = GraphXFastPath.pageRank(spark, nodes, edges, iters = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ranking(df) == ranking(gx))
    assert(math.abs(df.map(_._2).sum - 1.0) < 1e-9, "DF loop conserves mass")
  }
}
