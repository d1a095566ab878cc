package graft

import graft.pipeline.Similarity

class SimilaritySpec extends SparkSpec {

  /** 30 fixture vectors: queries 0..9, their planted near-duplicates
    * 10..19 (tiny perturbation ⇒ cosine ≈ 1), decoys 20..29. */
  private lazy val dir: String = {
    val rng = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val qs = (0 until 10).map(_ => unit())
    val twins = qs.map(v => v.map(x => (x + 0.01 * rng.nextGaussian()).toFloat))
    val decoys = (0 until 10).map(_ => unit())
    val rows = (qs ++ twins ++ decoys).zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toSeq, i % 3)
    }
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "emb").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("brute-force top-k ranks each planted twin first") {
    val top1 = rowsOf(Similarity.cosineTopK(spark, dir))
      .filter(_.getLong(3) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach(q => assert(top1(q) == q + 10,
      s"query $q: nearest must be its twin, got ${top1(q)}"))
  }

  test("LSH ANN recovers every planted twin (high-cosine recall)") {
    val byQuery = rowsOf(Similarity.lshAnn(spark, dir))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0L until 10L).foreach { q =>
      assert(byQuery.getOrElse(q, Set.empty).contains(q + 10),
        s"query $q: twin must appear in LSH candidates")
    }
  }

  test("IVF ANN recovers most planted twins and only rescores probed lists") {
    val byQuery = rowsOf(Similarity.ivfAnn(spark, dir))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // a twin is near-identical to its query, so both land in the same
    // inverted list and the probed-list candidate set must contain it
    val recalled = (0L until 10L).count(q =>
      byQuery.getOrElse(q, Set.empty).contains(q + 10))
    assert(recalled >= 8, s"IVF recall too low: $recalled/10")
  }

  test("IVF ANN on the driver corpus: k rows per query, ranks dense, never worse than random") {
    val ivf = rowsOf(Similarity.ivfAnn(spark, SF))
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted == (1L to rs.size.toLong))
    }
    // sanity vs the exact baseline: IVF's best hit per query should be a
    // genuine neighbour (cos within the exact top-5 range)
    val exactBest = rowsOf(Similarity.cosineTopK(spark, SF))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max).toMap
    ivf.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getDouble(2)).max <= exactBest(q) + 1e-9)
    }
  }

  test("PQ-ADC recovers planted twins through the compressed scan") {
    // a twin shares its query's codeword in every subspace (near-identical
    // sub-vectors → same argmax), so its ADC score equals the query's own
    // self-score — the top of the compressed ranking
    val byQuery = rowsOf(Similarity.pqAnn(spark, dir))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalled = (0L until 10L).count(q =>
      byQuery.getOrElse(q, Set.empty).contains(q + 10))
    assert(recalled >= 8, s"PQ recall too low: $recalled/10")
  }

  test("IVF×PQ scans only probed lists and agrees with plain PQ-ADC on shared candidates") {
    val ivfpq = rowsOf(Similarity.ivfPqAnn(spark, SF))
    assert(ivfpq.nonEmpty)
    ivfpq.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(4)).sorted == (1L to rs.size.toLong), "dense ranks")
      val adc = rs.sortBy(_.getLong(4)).map(_.getDouble(2))
      assert(adc == adc.sorted.reverse, "ranking follows the ADC score")
    }
    // the coarse quantizer only PRUNES: a candidate IVF×PQ scores must
    // carry the identical ADC score plain PQ computes for it (same
    // codebook, same distance tables — the composition changes the scan
    // set, never the scoring)
    val pqScores = rowsOf(Similarity.pqAnn(spark, SF))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivfpq.foreach { r =>
      pqScores.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(math.abs(s - r.getDouble(2)) < 1e-12,
          s"ADC score mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
      }
    }
    // and every scored neighbour sits in one of the query's probed lists
    // (checked indirectly: the ivf candidate set for the same corpus)
    val ivfCands = rowsOf(Similarity.ivfAnn(spark, SF, k = Int.MaxValue / 2))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ivfpq.foreach(r => assert(ivfCands((r.getLong(0), r.getLong(1))),
      "IVF×PQ neighbour outside the probed lists"))
  }

  test("Lloyd-trained PQ codebook beats the sampled seed on ADC recall@5") {
    // deterministic A/B on the driver corpus: identical data + exact
    // arithmetic in both runs, only the codebook differs (iters=1 is the
    // untrained lowest-id seed). Measured at (m=32, k=64): 0.40 sampled
    // → 0.44 trained (the old (4,8) config gave 0.20 → 0.26 —
    // quantizer-bound, see the PqK sweep comment).
    val truth = rowsOf(Similarity.cosineTopK(spark, SF))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recallAt5(iters: Int): Double = {
      val got = rowsOf(Similarity.pqAnn(spark, SF, iters = iters))
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      truth.map { case (q, t) => got.getOrElse(q, Set.empty).intersect(t).size }
        .sum.toDouble / truth.values.map(_.size).sum
    }
    val sampled = recallAt5(1)
    val trained = recallAt5(Similarity.PqIters)
    info(f"ADC recall@5: sampled=$sampled%.3f trained=$trained%.3f")
    assert(trained > sampled,
      f"Lloyd training must improve ADC recall: $sampled%.3f → $trained%.3f")
    assert(trained >= 0.4,
      f"16-bit trained codes must clear the 0.4 recall@5 floor: $trained%.3f")
  }

  test("PQ-ADC on the driver corpus: dense ranks, ADC-ordered, exact rescore bounded") {
    val pq = rowsOf(Similarity.pqAnn(spark, SF))
    assert(pq.nonEmpty)
    val exactBest = rowsOf(Similarity.cosineTopK(spark, SF))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max).toMap
    pq.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(4)).sorted == (1L to rs.size.toLong), "ranks dense")
      val adc = rs.sortBy(_.getLong(4)).map(_.getDouble(2))
      assert(adc == adc.sorted.reverse, "ranking follows the ADC score")
      rs.foreach(r => assert(r.getLong(1) != q, "never self"))
      // the rescored cosine is exact, so it can never beat the true best
      assert(rs.map(_.getDouble(3)).max <= exactBest(q) + 1e-9)
    }
  }

  test("mutual-kNN graph contains every planted twin edge, canonically, symmetric by construction") {
    val edges = rowsOf(Similarity.knnGraph(spark, dir))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    edges.foreach { case (s, d) => assert(s < d, "canonical src < dst") }
    // a twin is its query's nearest neighbour AND vice versa → mutual edge
    (0L until 10L).foreach(q =>
      assert(edges((q, q + 10)), s"twin edge ($q, ${q + 10}) must be mutual"))
  }

  test("shared ladder layer: one truth + four family runs feed both ANN audits") {
    // the production contract from ladderLayer's scaladoc: materialize
    // the ranked lists ONCE, fan them out to both audits — and get
    // bit-identical results to the rebuild-per-key registry path
    val shared = Similarity.ladderLayer(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      rowsOf(df).map(_.toString)
    assert(rows(Similarity.annRecallOn(shared)) ==
      rows(Similarity.annRecall(spark, dir)), "recall report agrees")
    assert(rows(Similarity.recallCurveOn(shared)) ==
      rows(Similarity.recallCurve(spark, dir)), "recall curve agrees")
  }

  test("kNN candidate generation bounds a collapsed LSH bucket at C(cap,2) pairs") {
    import spark.implicits._
    // the skew case: hundreds of vectors hashing to ONE (table, bucket) —
    // uncapped this is C(n,2) pairs from a single key
    val n = 300
    val collapsed = (0L until n.toLong).map(i => (i, 0, 0L))
      .toDF("vec_id", "table", "bucket")
    val cap = 8
    val capped = rowsOf(Similarity.knnCandidates(collapsed, cap))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.size == cap * (cap - 1) / 2,
      s"collapsed bucket must yield exactly C($cap,2) pairs, got ${capped.size}")
    val full = rowsOf(Similarity.knnCandidates(collapsed, n))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.size == n * (n - 1) / 2, "uncapped control is the full product")
    assert(capped.subsetOf(full), "capped candidates ⊆ uncapped")
  }

  test("capped kNN graph: cap-off equivalence on the fixture, measured recall on a mega near-dup group") {
    // buckets on the 30-vector fixture are far below the cap → the capped
    // plan must be EXACTLY the uncapped graph
    val dflt = rowsOf(Similarity.knnGraph(spark, dir))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unc = rowsOf(Similarity.knnGraph(spark, dir, cap = Int.MaxValue))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt == unc, "cap must be a no-op when no bucket exceeds it")
    // mega near-dup group: 200 near-identical vectors collapse every LSH
    // table to ~one bucket; the capped graph still finds edges because
    // the per-table salt samples INDEPENDENTLY (different 64 survivors
    // per table), and recall vs the uncapped graph stays material
    val rng = new scala.util.Random(11)
    val base = Array.fill(64)(rng.nextGaussian())
    val bn = math.sqrt(base.map(x => x * x).sum)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        base.map(x => (x / bn + 0.001 * rng.nextGaussian()).toFloat).toSeq, 0)
    }
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mega").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val cappedEdges = rowsOf(Similarity.knnGraph(spark, d))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncEdges = rowsOf(Similarity.knnGraph(spark, d, cap = Int.MaxValue))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedEdges.nonEmpty, "capped graph must still find edges in the group")
    val recall = cappedEdges.intersect(uncEdges).size.toDouble / uncEdges.size
    info(f"mega-group recall capped-vs-uncapped: $recall%.3f " +
      s"(${cappedEdges.size} capped / ${uncEdges.size} uncapped edges)")
    assert(recall >= 0.1, f"recall degraded past graceful: $recall%.3f")
    // NN-descent round: wedge candidates re-find neighbors the bucket
    // cap sampled apart — recall vs the uncapped graph must IMPROVE
    val refined = rowsOf(Similarity.nnDescentGraph(spark, d))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refRecall = refined.intersect(uncEdges).size.toDouble / uncEdges.size
    info(f"mega-group recall after NN-descent: $refRecall%.3f " +
      s"(${refined.size} refined edges)")
    assert(refRecall > recall,
      f"NN-descent must lift capped recall: $recall%.3f -> $refRecall%.3f")
  }

  test("NN-descent on the fixture keeps every planted twin edge and stays canonical") {
    val edges = rowsOf(Similarity.nnDescentGraph(spark, dir))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    edges.foreach { case (s, t) => assert(s < t, "canonical src < dst") }
    (0L until 10L).foreach(q =>
      assert(edges((q, q + 10)), s"twin edge ($q, ${q + 10}) survives refinement"))
  }

  test("kNN graph on the driver corpus: edges are genuinely mutual top-k members") {
    val edges = rowsOf(Similarity.knnGraph(spark, SF))
    assert(edges.nonEmpty)
    // symmetrized check: recompute per-node top-k over the edge set itself —
    // every kept edge must appear in BOTH endpoints' neighbourhoods of the graph
    val byNode = edges.flatMap { r =>
      val (s, d) = (r.getLong(0), r.getLong(1))
      Seq(s -> d, d -> s)
    }.groupBy(_._1)
    edges.foreach { r =>
      assert(byNode(r.getLong(0)).nonEmpty && byNode(r.getLong(1)).nonEmpty)
      assert(r.getDouble(2) <= 1.0001 && r.getDouble(2) >= -1.0001)
    }
  }

  test("semantic dedup drops exactly one of each planted twin pair, keeps decoys") {
    // twins are near-identical → same cluster, cosine ≈ 1 ≥ τ → the
    // higher id of each pair is dropped; random decoys survive
    val r = rowsOf(Similarity.semanticDedup(spark, dir, k = 4, iters = 2))
    assert(r.size == 30, "every vector gets a row")
    val keep = r.map(row => row.getLong(0) -> row.getBoolean(2)).toMap
    (0L until 10L).foreach { q =>
      assert(keep(q), s"query $q is the lower id of its twin pair — kept")
      assert(!keep(q + 10), s"twin ${q + 10} is semantically duplicate — dropped")
    }
    assert((20L until 30L).count(keep) >= 8, "random decoys overwhelmingly survive")
  }

  test("semantic dedup witness cap: mega-cluster drops everything via witness #1, misses only mid-id-witness dups") {
    import spark.implicits._
    def row(id: Long, cl: Long, v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, cl, v.toSeq, n)
    }
    // mega-cluster: 400 near-identical members in ONE cluster — the
    // k-means-collapse shape that used to be quadratic. With ANY cap,
    // every y>0 matches lowest-id witness 0, so recall loss is zero
    // while the pair product is n·cap, not C(n,2).
    val rng = new scala.util.Random(13)
    val base = Array.fill(64)(rng.nextGaussian())
    val mega = (0L until 400L).map(i =>
      row(i, 0L, base.map(x => x + 1e-6 * rng.nextGaussian())))
    val megaAv = mega.toDF("vec_id", "cluster_id", "v", "norm")
    val droppedMega = rowsOf(Similarity.semanticDropped(megaAv, 0.9, cap = 4))
      .map(_.getLong(0)).toSet
    assert(droppedMega == (1L until 400L).toSet,
      "every non-first member of a near-identical mega-cluster is dropped even at cap 4")
    // heterogeneous cluster: y=10 is similar ONLY to mid-id member 9
    // (orthogonal to everyone else). cap=5 excludes witness 9 → y kept
    // (the documented graceful recall loss); cap=10 includes it → dropped.
    val ortho = (0L until 10L).map { i =>
      val v = Array.fill(64)(0.0); v(i.toInt) = 1.0; row(i, 1L, v)
    }
    val y = { val v = Array.fill(64)(0.0); v(9) = 1.0; row(10L, 1L, v) }
    val hetero = (ortho :+ y).toDF("vec_id", "cluster_id", "v", "norm")
    val atCap5 = rowsOf(Similarity.semanticDropped(hetero, 0.9, cap = 5))
      .map(_.getLong(0)).toSet
    val atCap10 = rowsOf(Similarity.semanticDropped(hetero, 0.9, cap = 10))
      .map(_.getLong(0)).toSet
    assert(atCap5 == Set.empty[Long], "witness 9 outside cap → capped misses the drop")
    assert(atCap10 == Set(10L), "witness 9 inside cap → exact drop recovered")
    assert(atCap5.subsetOf(atCap10), "capped drops ⊆ exact drops (precision 1)")
  }

  test("semantic dedup on the driver corpus: keep flags complement the dropped set") {
    val r = rowsOf(Similarity.semanticDedup(spark, SF))
    assert(r.nonEmpty && r.map(_.getLong(0)).distinct.size == r.size)
    val nKept = r.count(_.getBoolean(2))
    assert(nKept > 0 && nKept <= r.size)
  }

  test("range search finds every planted twin and nothing below the threshold") {
    val r = rowsOf(Similarity.rangeSearch(spark, dir, minCos = 0.9))
    val byQuery = r.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0L until 10L).foreach(q =>
      assert(byQuery.getOrElse(q, Set.empty).contains(q + 10),
        s"query $q: twin must be within the 0.9 radius"))
    r.foreach(row => assert(row.getDouble(2) >= 0.9, "no below-threshold rows"))
    // radius ⊆ brute-force ground truth: every reported cosine is exact,
    // so the same pair filtered on the exact all-pairs table must agree
    val exact = rowsOf(Similarity.embeddingNearDup(spark, dir, minCos = 0.9))
      .map(row => (row.getLong(0), row.getLong(1)) -> row.getDouble(2)).toMap
    r.foreach { row =>
      val key = (math.min(row.getLong(0), row.getLong(1)),
        math.max(row.getLong(0), row.getLong(1)))
      assert(exact.get(key).contains(row.getDouble(2)),
        s"range-search pair $key must carry the exact cosine")
    }
  }

  test("near-dup pairs on the fixture are exactly the planted twins") {
    val pairs = rowsOf(Similarity.embeddingNearDup(spark, dir, minCos = 0.9))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 10L).map(q => (q, q + 10)).toSet)
  }

  test("k-means assigns every vector once and co-clusters each planted twin pair") {
    val assign = rowsOf(Similarity.kmeans(spark, dir))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign.keySet == (0L until 30L).toSet, "every vector exactly once")
    assert(assign.values.toSet.size <= Similarity.KmeansK, "at most K clusters")
    // a twin is cosine≈1 from its query: Lloyd should keep them together
    // except when a pair sits right on a cluster boundary (two centroids
    // near-equidistant) — tolerate one boundary split
    val together = (0L until 10L).count(q => assign(q) == assign(q + 10))
    assert(together >= 9, s"only $together/10 twin pairs co-clustered")
    // and Lloyd must actually move past the seed: on the driver corpus a
    // further refinement pass changes nothing material (fixpoint-ish)
    val again = rowsOf(Similarity.kmeans(spark, dir,
      iters = Similarity.KmeansIters + 1))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = assign.count { case (id, c) => again(id) != c }
    assert(moved <= 3, s"assignment should be near-stable after 5 passes, moved=$moved")
  }

  test("exact near-dup refuses to collect a corpus past the driver bound") {
    val e = intercept[IllegalArgumentException] {
      Similarity.embeddingNearDup(spark, dir, minCos = 0.9, maxVectors = 3)
    }
    assert(e.getMessage.contains("s_lsh_ann"), "error must point at the scale paths")
  }

  test("LSH ANN on the driver corpus emits k rows per query with valid ranks") {
    val rows = rowsOf(Similarity.lshAnn(spark, SF))
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val ranks = rs.map(_.getLong(3)).sorted
      assert(ranks == (1L to rs.size.toLong), "dense ranks from 1")
      assert(rs.size <= 5)
    }
  }

  test("cluster purity equals the hand-computed majority share of the kmeans assignment") {
    val assign = rowsOf(Similarity.kmeans(spark, dir))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val expected = assign.groupBy(_._2).map { case (cid, members) =>
      val byLabel = members.keys.toSeq.map(labels).groupBy(identity)
        .map { case (l, xs) => (l, xs.size.toLong) }
      // argmax with ties to the SMALLEST label — the struct-max contract
      val (majLabel, majCnt) = byLabel.toSeq.sortBy { case (l, c) => (-c, l) }.head
      cid -> (members.size.toLong, majLabel, majCnt)
    }
    val got = rowsOf(Similarity.clusterPurity(spark, dir))
    assert(got.map(_.getLong(1)).sum == labels.size, "every vector in exactly one cluster")
    got.foreach { r =>
      val (n, l, c) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == l && r.getLong(3) == c,
        s"cluster ${r.getLong(0)}: expected ($n, $l, $c)")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("ANN recall report covers the full ladder; each family row equals the set intersection") {
    val truth = rowsOf(Similarity.cosineTopK(spark, dir))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approxByFam = Map(
      "lsh" -> Similarity.lshAnn(spark, dir),
      "ivf" -> Similarity.ivfAnn(spark, dir),
      "pq" -> Similarity.pqAnn(spark, dir),
      "ivfpq" -> Similarity.ivfPqAnn(spark, dir)
    ).view.mapValues(df =>
      rowsOf(df).map(r => (r.getLong(0), r.getLong(1))).toSet).toMap
    val got = rowsOf(Similarity.annRecall(spark, dir))
    assert(got.map(_.getString(0)).toSet == approxByFam.keySet,
      "one row group per index family")
    approxByFam.keys.foreach { f =>
      assert(got.filter(_.getString(0) == f).map(_.getLong(1)).toSet ==
        (0L until 10L).toSet, s"family $f covers every query")
    }
    got.foreach { r =>
      val (f, q) = (r.getString(0), r.getLong(1))
      val hits = truth.filter(_._1 == q).count(approxByFam(f).contains)
      assert(r.getLong(2) == 5L, "n_true is always k")
      assert(r.getLong(3) == hits.toLong,
        s"family $f query $q: n_hit must be the intersection size")
      assert(r.getDouble(4) == math.round(hits / 5.0 * 10000) / 10000.0)
    }
    // every query's twin is rank-1 in the truth and recovered by the
    // LSH index (asserted above), so the LSH rows can't report zero;
    // the compressed families are only floored in aggregate (the spec
    // ladder asserts recall@5 >= 0.4 for PQ elsewhere)
    got.filter(_.getString(0) == "lsh").foreach(r => assert(r.getLong(3) >= 1L,
      s"lsh query ${r.getLong(1)}: the recovered twin alone guarantees a hit"))
  }

  test("recall curve: full axis, prefix-consistent counts, twins dominate @1") {
    val rows = rowsOf(Similarity.recallCurve(spark, dir))
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val fams = Seq("ivf", "ivfpq", "lsh", "pq")
    assert(rows.keySet == (for (f <- fams; k <- Similarity.RecallKs)
      yield (f, k)).toSet, "every (family, k) cell present")
    rows.foreach { case ((f, k), (nTrue, nHit, rec)) =>
      assert(nTrue == 10L * k, s"$f@$k: truth is the 10-query top-$k prefix")
      assert(nHit <= nTrue && rec >= 0.0 && rec <= 1.0, s"$f@$k bounded")
    }
    fams.foreach { f =>
      val hits = Similarity.RecallKs.map(k => rows((f, k))._2)
      assert(hits.sliding(2).forall(p => p.head <= p.last),
        s"$f: hits grow with k (prefix logic): $hits")
    }
    // rank 1 of every query's truth is its planted twin, which LSH
    // recovers by construction on the fixture — recall@1 is perfect
    assert(rows(("lsh", 1))._3 == 1.0, "planted twins dominate @1")
  }

  test("silhouette: covers every member, bounded in [-1,1], a>=0, b above a on average") {
    val rows = rowsOf(Similarity.silhouette(spark, dir))
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_members"))).sum == 30L,
      "every vector contributes to exactly one cluster row")
    rows.foreach { r =>
      val (a, b, s) = (r.getDouble(r.fieldIndex("mean_a")),
        r.getDouble(r.fieldIndex("mean_b")),
        r.getDouble(r.fieldIndex("mean_silhouette")))
      assert(a >= 0.0 && a <= 2.0, s"own-centroid cosine distance in range: $a")
      assert(b >= 0.0 && b <= 2.0, s"rival-centroid distance in range: $b")
      assert(s >= -1.0 && s <= 1.0, s"silhouette bounded: $s")
      // Lloyd assigns each point to its NEAREST centroid at round end,
      // so per-point a <= b always — the cluster means inherit it
      assert(a <= b + 1e-9, s"assignment optimality violated: a=$a b=$b")
      assert(s >= 0.0, "centroid-silhouette of a Lloyd assignment is non-negative")
    }
    // the planted twin clusters are tight: overall mean silhouette is
    // decisively positive, not boundary noise
    val n = rows.map(_.getLong(rows.head.fieldIndex("n_members"))).sum.toDouble
    val overall = rows.map(r => r.getDouble(r.fieldIndex("mean_silhouette")) *
      r.getLong(r.fieldIndex("n_members"))).sum / n
    assert(overall > 0.1, s"overall silhouette $overall should be decisively positive")
  }

  test("linkage census: merges are monotone as the cosine cut loosens") {
    val rows = rowsOf(Similarity.linkageCensus(spark, SF))
      .sortBy(-_.getDouble(0)) // strict → loose
    assert(rows.length == Similarity.LinkageCuts.length)
    rows.sliding(2).foreach {
      case Seq(strict, loose) =>
        // loosening only ADDS edges: singletons can only be absorbed,
        // the largest cluster can only grow, coverage can only grow
        assert(loose.getAs[Long]("n_singletons") <= strict.getAs[Long]("n_singletons"))
        assert(loose.getAs[Long]("largest_size") >= strict.getAs[Long]("largest_size"))
        assert(loose.getAs[Long]("n_clustered") >= strict.getAs[Long]("n_clustered"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clustered") >= 2 * r.getAs[Long]("n_clusters"))
    }
  }

  test("dbscan: planted core fan, a one-neighbour border, and an orthogonal noise point") {
    // 2-D directions embedded in 64-dim: cores at 0/20/40/60 degrees are
    // pairwise within the eps angle (cos >= 0.5 > 0.3) so each has 3
    // neighbours + self = minPts; the border at -55 degrees sees ONLY the
    // 0-degree core (cos 55 ~= 0.574; cos 75 ~= 0.259 < 0.3); 135 degrees
    // is outside eps of everything
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat) ++ Seq.fill(62)(0.0f)
    }
    val rows = Seq(0, 20, 40, 60).map(a => at(a.toDouble)) ++
      Seq(at(-55.0), at(135.0))
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "dbscan").toString
    import spark.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = rowsOf(Similarity.dbscan(spark, d))
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    (0L to 3L).foreach(i => assert(out(i) == (("core", 0L)), s"vec $i: ${out(i)}"))
    assert(out(4L) == (("border", 0L)))
    assert(out(5L) == (("noise", -1L)))
  }

  test("eps-pair gate: bucketed pairs are a subset of exact with identical cosines, recall pinned") {
    // parity below the bound: the bucketed generator's every pair must
    // appear in the exact set with the SAME rounded cosine (precision
    // 1.0 by construction — candidates are exactly rescored), and the
    // eps-index shape must clear its measured recall floor at both the
    // dbscan eps and the strictest linkage cut
    val exact = rowsOf(Similarity.embeddingNearDup(spark, SF, Similarity.DbscanEpsCos))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = rowsOf(Similarity.epsPairsBucketed(spark, SF, Similarity.DbscanEpsCos))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    bucketed.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos),
        s"bucketed pair $pair cos $cos must match exact ${exact.get(pair)}")
    }
    val recall03 = bucketed.size.toDouble / exact.size
    assert(recall03 >= 0.6, s"eps recall at τ=0.3: $recall03 (measured 0.73 at the 16×4 shape)")
    val exact04 = exact.filter(_._2 >= 0.4)
    val recall04 = bucketed.count(_._2 >= 0.4).toDouble / exact04.size
    assert(recall04 >= 0.7, s"eps recall at τ=0.4: $recall04 (measured 0.80 at the 16×4 shape)")
  }

  test("dbscan above the gate degrades to the bucketed eps-graph instead of refusing") {
    // force the bucketed branch (maxExact = 0) on the full sf0.001
    // corpus: the operator must RUN (no driver collect, no require) and
    // agree with the exact plan on the overwhelming share of role
    // assignments — the recalled eps-graph only loses boundary pairs
    val exact = rowsOf(Similarity.dbscan(spark, SF))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val approx = rowsOf(Similarity.dbscan(spark, SF, maxExact = 0L))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(approx.size == exact.size, "every vector is labeled")
    assert(approx.values.forall(Set("core", "border", "noise")))
    val agree = exact.count { case (id, role) => approx(id) == role }
    assert(agree.toDouble / exact.size >= 0.7,
      s"role agreement $agree/${exact.size} under the recalled eps-graph")
  }

  test("linkage census above the gate emits the same ladder shape from the bucketed eps-graph") {
    val rows = rowsOf(Similarity.linkageCensus(spark, SF, maxExact = 0L))
      .sortBy(-_.getDouble(0))
    assert(rows.length == Similarity.LinkageCuts.length)
    rows.sliding(2).foreach {
      case Seq(strict, loose) =>
        assert(loose.getAs[Long]("n_singletons") <= strict.getAs[Long]("n_singletons"))
        assert(loose.getAs[Long]("largest_size") >= strict.getAs[Long]("largest_size"))
        assert(loose.getAs[Long]("n_clustered") >= strict.getAs[Long]("n_clustered"))
      case _ =>
    }
  }
}
