package graft

import org.apache.spark.sql.functions._
import graft.graph.Algorithms

/** Hand-computed fixtures for the oracle-less iterative algorithms. */
class AlgorithmsSpec extends SparkSpec {
  import spark.implicits._

  private def nodesDf(ids: Long*) = ids.toDF("id")

  test("connected components on a two-component fixture") {
    val nodes = nodesDf(1, 2, 3, 4, 5, 6)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val comp = Algorithms.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("connected components survives an empty graph and empty edge set") {
    val none = Algorithms.connectedComponents(
      spark.emptyDataset[Long].toDF("id"),
      spark.emptyDataset[(Long, Long)].toDF("src", "dst"))
    assert(none.count() == 0)
    val isolated = Algorithms.connectedComponents(
      nodesDf(7, 8), spark.emptyDataset[(Long, Long)].toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(isolated == Map(7L -> 7L, 8L -> 8L))
  }

  test("connected components converges on a long path (pointer jumping)") {
    val n = 64L
    val nodes = nodesDf(1L to n: _*)
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = Algorithms.connectedComponents(nodes, edges).collect()
    assert(comp.forall(_.getLong(1) == 1L))
  }

  test("pagerank matches a driver-side reference implementation") {
    // graph with a dangling node (4) and a hub (1)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val nodes = nodesDf(1, 2, 3, 4)
    val got = Algorithms.pageRank(nodes, edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // reference: same recurrence, driver-side
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L), 3L -> Seq(1L, 4L))
    var pr = Seq(1L, 2L, 3L, 4L).map(_ -> 0.25).toMap
    def round12(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    for (_ <- 1 to 10) {
      val dangling = pr.filterNot(kv => out.contains(kv._1)).values.sum
      val contrib = out.toSeq.flatMap { case (s, ds) => ds.map(_ -> pr(s) / ds.size) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = pr.keys.map(id => id ->
        round12(0.15 / 4 + 0.85 * (contrib.getOrElse(id, 0.0) + dangling / 4))).toMap
    }
    got.foreach { case (id, r) => assert(math.abs(r - pr(id)) < 1e-12, s"node $id") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass conservation")
  }

  test("walk counts match driver-side A^t multiplication and rank the hub first") {
    // path 1-2-3 with a hub 3 also joined to 4 and 5; 6 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L)).toDF("src", "dst")
    val nodes = nodesDf(1, 2, 3, 4, 5, 6)
    val got = Algorithms.walkCounts(nodes, edges, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: integer adjacency power iterate
    val adj = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L, 5L),
      4L -> Seq(3L), 5L -> Seq(3L), 6L -> Seq.empty[Long])
    var x = adj.keys.map(_ -> 1L).toMap
    for (_ <- 1 to 4)
      x = adj.keys.map(v => v -> adj(v).map(x).sum).toMap
    assert(got == x)
    assert(got(6L) == 0L, "isolated node counts zero walks")
    assert(got(3L) == got.values.max, "the hub has the most 4-walks")
  }

  test("personalized pagerank matches a driver-side restart-walk reference") {
    // seed 1; node 4 is dangling (mass restarts at the seed); node 5 is
    // disconnected from the seed side and must end at exactly 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val nodes = nodesDf(1, 2, 3, 4, 5, 6)
    val seeds = nodesDf(1)
    val got = Algorithms.personalizedPageRank(nodes, edges, seeds, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val out = Map(1L -> Seq(2L), 2L -> Seq(3L), 3L -> Seq(1L, 4L), 5L -> Seq(6L))
    def round12(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    var pr = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0, 5L -> 0.0, 6L -> 0.0)
    for (_ <- 1 to 10) {
      val dangling = pr.filterNot(kv => out.contains(kv._1)).values.sum
      val contrib = out.toSeq.flatMap { case (s, ds) => ds.map(_ -> pr(s) / ds.size) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = pr.keys.map { id =>
        val c = contrib.getOrElse(id, 0.0)
        id -> round12(
          if (id == 1L) 0.15 / 1.0 + 0.85 * (c + dangling / 1.0)
          else 0.85 * c)
      }.toMap
    }
    got.foreach { case (id, r) => assert(math.abs(r - pr(id)) < 1e-12, s"node $id") }
    assert(got(5L) == 0.0 && got(6L) == 0.0, "no seed mass reaches the far component")
    assert(got(1L) > got(2L) && got(2L) > got(4L),
      "proximity to the seed orders the ranks")
  }

  test("per-node triangle counts on K4 plus an isolated node") {
    val nodes = nodesDf(1, 2, 3, 4, 5)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = graph.PropertyGraph(nodes, edges).triangleCounts().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L),
      "each K4 node closes 3 triangles; global = sum/3 = 4")
  }

  test("k-core matches reference peeling on a fixture and on the driver graph") {
    // fixture: K4 core {1,2,3,4} plus a pendant chain 4-5-6 that peels away
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = Algorithms.kCore(nodesDf(1, 2, 3, 4, 5, 6, 7), edges, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      "the 3-core is exactly the K4; chain and isolate peel off")

    // driver graph: cross-check against an independent in-memory peel
    val g = graph.TestGraph.graph(spark, SF)
      .filterEdges(org.apache.spark.sql.functions.col("distance") <= graph.TestGraph.QueryThreshold)
    val es = g.edges.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = g.nodes.select("id").collect().map(_.getLong(0)).toSet
    var members = ids
    var changed = true
    while (changed) {
      val deg = members.map(_ -> 0L).toMap ++
        es.flatMap { case (a, b) if members(a) && members(b) => Seq(a, b); case _ => Nil }
          .groupBy(identity).view.mapValues(_.size.toLong)
      val next = members.filter(id => deg.getOrElse(id, 0L) >= graph.Clouds.KCoreK)
      changed = next != members
      members = next
    }
    val expDeg = es.flatMap { case (a, b) if members(a) && members(b) => Seq(a, b); case _ => Nil }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sparkCore = Algorithms.kCore(g.nodes, g.edges, graph.Clouds.KCoreK)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sparkCore == expDeg, "spark k-core must equal the reference peel")
  }

  test("label propagation converges to per-clique communities across a bridge") {
    // two triangles bridged by one edge: each clique converges to its
    // minimum id; the bridge is outvoted by the within-clique majority
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("src", "dst")
    val got = Algorithms.labelPropagation(nodesDf(1, 2, 3, 4, 5, 6, 7), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(got) == Set(1L), s"left clique unites on min id, got $got")
    assert(Set(4L, 5L, 6L).map(got).size == 1, s"right clique unites, got $got")
    assert(got(7L) == 7L, "isolated node keeps its own label")
    assert(got(1L) != got(5L), "the bridge must not merge the cliques")
  }

  test("shortest paths match Dijkstra on a weighted fixture") {
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 5.0), (3L, 4L, 1.0), (2L, 4L, 10.0),
      (5L, 4L, 1.0)).toDF("src", "dst", "weight")
    val nodes = nodesDf(1, 2, 3, 4, 5, 6)
    val seeds = nodesDf(1)
    val got = Algorithms.shortestPaths(nodes, edges, seeds).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(1.0))
    assert(got(3L).contains(3.0), "1→2→3 beats the direct 5.0 edge")
    assert(got(4L).contains(4.0), "1→2→3→4 beats 1→2→4")
    assert(got(5L).isEmpty && got(6L).isEmpty, "unreachable stays null")
  }

  test("star-contraction CC agrees with hash-to-min on adversarial chains") {
    // a chain whose ids DESCEND along the path is label propagation's
    // worst case (the min creeps one hop per round); the star kernel's
    // round bound is shape-independent. 200 nodes: ids 200→1 chained,
    // plus a clique, plus isolated nodes.
    val chain = (200L to 2L by -1).map(i => (i, i - 1))
    val clique = Seq((300L, 301L), (300L, 302L), (301L, 302L))
    val nodes = ((1L to 200L) ++ Seq(300L, 301L, 302L, 400L)).toDF("id")
    val edges = (chain ++ clique).toDF("src", "dst")
    val star = Algorithms.connectedComponentsStar(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 200L).forall(star(_) == 1L), "chain collapses to min id 1")
    assert(Seq(300L, 301L, 302L).forall(star(_) == 300L))
    assert(star(400L) == 400L, "isolated node keeps itself")
    // contract parity with the main kernel on the same input
    val htm = Algorithms.connectedComponents(nodes, edges, maxIter = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == htm, "both kernels share the (id, min-member) contract")
  }

  test("boruvka MST matches a hand-checked tree and keeps the forest invariant") {
    // square 1-2-3-4 with a heavy diagonal and a separate edge 5-6:
    // MST of the square = the three cheapest sides; diagonal excluded
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 1.5), (1L, 4L, 4.0),
      (1L, 3L, 9.0), (5L, 6L, 7.0)).toDF("u", "v", "w")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val (forest, comp) = Algorithms.boruvkaMst(nodes, edges)
    val f = forest.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(f == Set((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 4L, 1.5), (5L, 6L, 7.0)))
    val c = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L, 4L).map(c).size == 1, "square contracts to one component")
    assert(c(5L) == c(6L) && c(5L) != c(1L))
    assert(c(7L) == 7L, "isolated node is its own component")
  }

  test("boruvka MST equals Kruskal's weight on the driver graph") {
    val g = graft.graph.TestGraph.graph(spark, SF)
      .filterEdges(col("distance") <= graft.graph.TestGraph.QueryThreshold)
    val edges = g.edges.select(col("src").as("u"), col("dst").as("v"),
      col("distance").as("w"))
    val nodes = g.nodes.select(col("id"))
    val (forest, comp) = Algorithms.boruvkaMst(nodes, edges)
    val fRows = forest.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nComp = comp.select(col("c")).distinct().count()
    val nNodes = nodes.count()
    assert(fRows.length == nNodes - nComp, "forest invariant |F| = |V| - #components")
    // independent yardstick: driver-side Kruskal with union-find on the
    // collected edge list (sf0.001 is small enough to collect in a spec)
    val all = edges.collect().map(r => (r.getDouble(2), r.getLong(0), r.getLong(1)))
      .sortBy(identity)
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    var kruskalWeight = BigDecimal(0)
    var kruskalEdges = 0
    all.foreach { case (w, u, v) =>
      if (find(u) != find(v)) {
        parent(find(u)) = find(v); kruskalWeight += BigDecimal(w); kruskalEdges += 1
      }
    }
    assert(fRows.length == kruskalEdges, "same forest size as Kruskal")
    val boruvkaWeight = fRows.map(e => BigDecimal(e._3)).sum
    assert((boruvkaWeight - kruskalWeight).abs < BigDecimal("1e-9"),
      s"same total weight: boruvka=$boruvkaWeight kruskal=$kruskalWeight")
  }
}
