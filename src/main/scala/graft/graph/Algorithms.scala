package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms on DataFrames.
  *
  * The reference's "clouds" (phageclouds_gdb.py) are connected components
  * of the distance-thresholded sharesDNA graph. Neo4j walks them; at
  * 100 TB the Spark-native answer is an O(log n)-round alternating
  * min-label/pointer-jumping loop with per-iteration `localCheckpoint`
  * to cut lineage. Every iteration is two shuffles on the node id —
  * the working set stays (id, comp), never the whole property payload.
  */
object Algorithms {

  /** Connected components on an undirected view of `edges` (src,dst).
    * Returns (id, component) where component = min node id of the
    * component. Hash-to-min + pointer doubling: each round takes the min
    * of a node's neighbours' labels, then jumps labels through themselves
    * (comp := comp(comp)), halving chain lengths — convergence in
    * O(log diameter) rounds vs O(diameter) for plain propagation.
    * Convergence is checked on sum(comp), which strictly decreases until
    * the fixpoint (labels only ever decrease).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .localCheckpoint(true)

    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    var prevSum = BigDecimal(-1)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // min over neighbours' labels
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("vcomp")).as("nbr_comp"))
      val stepped = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"), least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // pointer jumping: comp := comp(comp). comp values are node ids, so
      // the inner self-join is total.
      val jumped = stepped.alias("l")
        .join(stepped.select(col("id").as("cid"), col("comp").as("ccomp")),
          col("l.comp") === col("cid"))
        .select(col("l.id").as("id"), col("ccomp").as("comp"))
        .localCheckpoint(true)
      val s = BigDecimal(
        jumped.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0))
      done = s == prevSum
      prevSum = s
      labels = jumped
      iter += 1
    }
    labels
  }

  /** PageRank, fixed iteration count, damping d. Dangling-node mass is
    * redistributed uniformly (one scalar aggregate per iteration — an
    * O(1) driver value, not a collect of data). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val ids = nodes.select(col("id")).distinct().localCheckpoint(true)
    val n = ids.count().toDouble
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("odeg"))
      .localCheckpoint(true)
    var pr = ids.select(col("id"), lit(1.0 / n).as("rank")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val withDeg = pr.join(outDeg, Seq("id"), "left_outer")
      val dangling = withDeg.filter(col("odeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = withDeg.filter(col("odeg").isNotNull)
        .join(edges.select(col("src").as("id"), col("dst")), Seq("id"))
        .select(col("dst").as("id"), (col("rank") / col("odeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      pr = ids.join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + lit(dangling / n))).as("rank"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Weighted single-source (or multi-source) shortest paths from a seed
    * id set over directed edges with a `weight` column — Bellman-Ford on
    * DataFrames: iterate relax-all until no distance improves. Converges
    * in at most |longest shortest path| rounds; each round is one shuffle
    * join on the frontier. */
  def shortestPaths(nodes: DataFrame, edges: DataFrame, seedIds: DataFrame,
                    maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight")).localCheckpoint(true)
    var dist = nodes.select(col("id"))
      .join(seedIds.select(col("id"), lit(0.0).as("dist0")), Seq("id"), "left_outer")
      .select(col("id"), col("dist0").as("dist"))   // null = unreachable (yet)
      .localCheckpoint(true)
    var iter = 0
    var improved = true
    while (improved && iter < maxIter) {
      val cand = dist.filter(col("dist").isNotNull)
        .join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("weight")).as("cand"))
        .groupBy(col("id")).agg(min(col("cand")).as("cand"))
      val next = dist.join(cand, Seq("id"), "left_outer")
        .select(col("id"),
          when(col("dist").isNull, col("cand"))
            .when(col("cand").isNull, col("dist"))
            .otherwise(least(col("dist"), col("cand"))).as("dist"))
        .localCheckpoint(true)
      improved = next.join(dist.withColumnRenamed("dist", "old"), Seq("id"))
        .filter(col("old").isNull && col("dist").isNotNull || col("dist") < col("old"))
        .limit(1).count() > 0
      dist = next
      iter += 1
    }
    dist
  }
}
