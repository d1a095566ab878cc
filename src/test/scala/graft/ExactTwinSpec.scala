package graft

import graft.graph.{Clouds, TestGraph}
import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Fleet convention for EXACT-TRUTH arms (r16 verdict task 5): every
  * audit key that computes exact truth to grade an approximate path
  * must be either REQUIRE-GUARDED (fails loudly with a pointer at the
  * scale path — never silently OOMs mid-job) or SAMPLE/CAP-BOUNDED
  * (keeps running at any corpus size over a deterministic subset).
  * This spec enumerates each exact arm in the registry and pins its
  * bounding mechanism, so the next audit key can't ship unguarded:
  *
  *   - `d_embedding_neardup` (and the eps-gate's exact branch feeding
  *     s_dbscan / s_linkage_census): require-guarded at
  *     [[Similarity.MaxExactVectors]].
  *   - `g_walk_cap_audit`'s uncapped twin: hash-SAMPLED above
  *     [[Clouds.WalkAuditMaxEdges]] (the r16 verdict's one weak grade).
  *   - `s_ann_recall` / `s_recall_curve`'s brute-force truth
  *     ([[Similarity.cosineTopK]]): bounded by CONSTRUCTION — the
  *     broadcast query side is a fixed nQueries rows, so truth volume
  *     is nQueries × k at any corpus size.
  *   - `d_lsh_recall` / `d_minhash_est`'s exact-Jaccard arm: bounded by
  *     the [[Dedup.GramDfCap]] stoplist — every gram bucket holds ≤ cap
  *     docs, so the exact intersection join is linear, never quadratic.
  */
class ExactTwinSpec extends SparkSpec {

  test("embeddingNearDup fails loudly past its vector bound, pointing at the scale paths") {
    val e = intercept[IllegalArgumentException] {
      Similarity.embeddingNearDup(spark, SF, maxVectors = 1L)
    }
    assert(e.getMessage.contains("s_lsh_ann") && e.getMessage.contains("s_ivf_ann"),
      s"the guard must point at the bucketed scale paths: ${e.getMessage}")
    // the guard trusts a caller-supplied count (the epsPairs gate counts
    // once and threads it through — r16 ADVICE: no double scan)
    val viaKnown = Similarity.embeddingNearDup(spark, SF, maxVectors = 1L,
      nKnown = 1L)
    val default = Similarity.embeddingNearDup(spark, SF)
    assert(viaKnown.collect().toSeq == default.collect().toSeq,
      "nKnown only skips the re-count; the computed pairs are identical")
  }

  test("walk-cap audit replays BOTH twins over a hash-sampled walk subset above the edge bound") {
    val nNodes = TestGraph.phageNodes(spark, SF).count()
    // force the above-bound branch: sampleMod = max(2, nodes/4096) = 2
    val sampled = rowsOf(Clouds.walkCapAudit(spark, SF, maxEdges = 0L))
    assert(sampled.length == Clouds.WalkLen + 1,
      "the audit report keeps its per-step shape under sampling")
    val byStep = sampled.map(r => r.getInt(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    val (nCap0, nFull0, agree0) = byStep(0)
    assert(nCap0 == nFull0, "both twins walk the identical sampled population")
    assert(agree0 == 1.0, "step 0 is the start node in both runs")
    assert(nCap0 < nNodes, s"the subset is strict ($nCap0 of $nNodes starts)")
    // the subset is the deterministic hash sample randomWalks takes at
    // mod 2 — replay the filter and match the population exactly
    val expected = TestGraph.phageNodes(spark, SF)
      .filter(pmod(Hashing.md5Hash60(
        concat_ws("|", col("id"), lit("wsample"))), lit(2L)) === 0)
      .count()
    assert(nCap0 == expected,
      s"sampled starts ($nCap0) must equal the mod-2 hash subset ($expected)")
    // at/below the bound the plan is the r16 one — full population
    val full = rowsOf(Clouds.walkCapAudit(spark, SF))
    assert(full.find(_.getInt(0) == 0).get.getLong(1) == nNodes,
      "below the bound every node starts a walk (byte-identical r16 plan)")
  }

  test("rescorePairs' broadcast gate trusts the caller-threaded count (nKnown only skips the re-count)") {
    val v = Similarity.vectors(spark, SF).localCheckpoint(true)
    val n = v.count()
    // consecutive-id candidate pairs — tiny, both endpoints exist
    val cand = v.select(col("vec_id").as("a"), (col("vec_id") + 1L).as("b"))
      .filter(col("b") < n)
    def jobsSeen(): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // the status store is fed asynchronously — read a STABLE job count
    // (unchanged across several polls) so in-flight events from earlier
    // actions can't skew the baseline or the assertion (the shared
    // stabilization loop from JitAudit)
    def settled(): Long =
      JitAudit.awaitStable(() => jobsSeen().toLong, pollMs = 50)
    // calibrate the barrier action's own job count (AQE may split one
    // action into several jobs) before using it to bracket the claims
    val base = settled()
    spark.range(1).count()
    val barrierJobs = settled() - base
    val before = settled()
    val threaded = Similarity.rescorePairs(v, cand, n)
    spark.range(1).count() // ordering barrier
    assert(settled() == before + barrierJobs,
      "plan construction with nKnown must launch ZERO Spark jobs")
    val mid = settled()
    val counted = Similarity.rescorePairs(v, cand)
    spark.range(1).count() // barrier again
    assert(settled() > mid + barrierJobs,
      "the nKnown-less fallback pays the count scan at construction")
    // nKnown only skips the re-count: identical rows either way (join
    // output ORDER is not contractual even on local[4] — compare the
    // row multisets via a deterministic sort, not emission order)
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.sortBy(_.toString)
    assert(sortedRows(threaded) == sortedRows(counted),
      "threaded and re-counted rescores must produce identical pairs")
    // and the threaded value IS what the gate reads: at/below the bound
    // the vector side carries the broadcast HINT; above it the hint is
    // withheld and the planner decides from stats (which on a tiny
    // checkpointed corpus may still pick broadcast — the hint is the
    // gate's output, the physical join is the planner's)
    def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
            if h.hints.strategy.contains(
              org.apache.spark.sql.catalyst.plans.logical.BROADCAST) => h
      }.nonEmpty
    assert(hasBroadcastHint(threaded),
      "at/below the bound the vector side is hint-broadcast")
    val shuffled = Similarity.rescorePairs(v, cand,
      Similarity.MaxExactVectors + 1)
    assert(!hasBroadcastHint(shuffled),
      "an above-bound count must withhold the broadcast hint " +
        "(the shuffle-join cluster shape)")
    graph.Algorithms.releaseIterate(v)
  }

  test("the brute-force ANN truth arm is bounded by construction: nQueries x k rows") {
    val nQ = 3
    val k = 4
    val truth = Similarity.cosineTopK(spark, SF, nQueries = nQ, k = k)
    assert(truth.count() == nQ.toLong * k,
      "truth volume is fixed by the broadcast query side, not the corpus")
  }

  test("the exact-Jaccard truth arm is DF-cap bounded: a mega-gram cannot go quadratic") {
    // 60 docs all sharing one gram: df = 60 > GramDfCap = 20 drops it
    // from the stoplisted table, so the exact intersection join sees
    // ZERO pairs from the pile-up; a rare shared gram still pairs
    val docs = (0L until 60L).map(i =>
      (i, if (i < 2) "alpha beta gamma delta" else "alpha beta xx" + i,
        "en", "src0", 20L))
    val dir = TestSession.docsFixture(docs)
    val pairs = Dedup.ngramJaccard(spark, dir, minSim = 0.05).collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 0L &&
      pairs.head.getLong(1) == 1L,
      s"only the rare-gram pair survives the DF cap, got ${pairs.length}")
  }
}
