package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Operator-contract assertions that hold in EITHER hash mode — the
  * r18 verdict's task 4: xxhash64 production mode has no DuckDB replay
  * (by design), so its correctness signal cannot be the oracle gate.
  * What CAN be asserted is that the operator contracts are
  * hash-DISTRIBUTION properties: keep-first survivorship, witness-cap
  * bounds, split fractions, budget cuts and permutation shape must hold
  * for ANY well-distributed 60-bit hash, and each test here runs the
  * REGISTRY key under both `graft.hash.impl` values and asserts the
  * contract on both results. The md5 default additionally gets the full
  * bit-for-bit oracle gate; xxhash64 gets exactly these invariants plus
  * the fleet-wide zero-error run (SURVEY §7.23).
  */
class HashContractSpec extends SparkSpec {

  private lazy val xxSession: SparkSession = {
    val s = spark.newSession()
    s.conf.set("graft.hash.impl", "xxhash64")
    s
  }

  /** Run the registry key under BOTH hash impls (the SparkEntry wrapper
    * pins each session active for plan construction) and assert the
    * contract on each mode's rows. */
  private def bothModes(key: String, dir: String = SF)(
      contract: (String, Seq[Row]) => Unit): Unit =
    Seq("md5" -> spark, "xxhash64" -> xxSession).foreach { case (mode, s) =>
      contract(mode, rowsOf(SparkEntry.queries(key)(s, dir)))
    }

  test("d_shuffle_index is a permutation of 0..n-1 in both modes") {
    bothModes("d_shuffle_index") { (mode, rows) =>
      val pos = rows.map(_.getAs[Long]("shuffle_pos"))
      assert(pos.nonEmpty, s"[$mode] empty shuffle")
      assert(pos.distinct.size == pos.size,
        s"[$mode] shuffle_pos must be collision-free")
      assert(pos.min == 0L && pos.max == pos.size - 1L,
        s"[$mode] shuffle_pos must cover 0..n-1 exactly")
    }
  }

  test("d_split_assign is cluster-leakage-safe with sane fractions in both modes") {
    bothModes("d_split_assign") { (mode, rows) =>
      val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
      // leakage safety: near-dup cluster members NEVER straddle splits
      byCluster.foreach { case (c, rs) =>
        assert(rs.map(_.getAs[String]("split")).distinct.size == 1,
          s"[$mode] cluster $c straddles splits — train/test leakage")
      }
      // fractions: 80/10/10 at CLUSTER granularity, binomial tolerance
      // (~500 clusters at sf0.001 → 3σ ≈ ±6% on train, ±4% on val/test)
      val n = byCluster.size.toDouble
      val frac = byCluster.map(_._2.head.getAs[String]("split"))
        .groupBy(identity).map { case (k, v) => k -> v.size / n }
      assert(frac.getOrElse("train", 0.0) > 0.65 && frac("train") < 0.95,
        s"[$mode] train fraction ${frac.get("train")} outside tolerance")
      Seq("val", "test").foreach(s =>
        assert(frac.getOrElse(s, 0.0) > 0.03 && frac(s) < 0.20,
          s"[$mode] $s fraction ${frac.get(s)} outside tolerance"))
    }
  }

  test("d_dedup_clusters keep-first survivor IS the cluster minimum in both modes") {
    bothModes("d_dedup_clusters") { (mode, rows) =>
      rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (c, rs) =>
        val ids = rs.map(_.getAs[Long]("doc_id"))
        assert(c == ids.min,
          s"[$mode] cluster label must be the member minimum ($c vs ${ids.min})")
        rs.foreach(r => assert(
          r.getAs[Boolean]("keep") == (r.getAs[Long]("doc_id") == c),
          s"[$mode] keep flag must mark exactly the min-id survivor"))
      }
    }
  }

  test("d_curation_e2e keeps within the per-language token budget in both modes") {
    bothModes("d_curation_e2e") { (mode, rows) =>
      assert(rows.nonEmpty, s"[$mode] curation kept nothing")
      rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
        val toks = rs.map(_.getAs[Long]("n_tokens")).sum
        assert(toks <= Dedup.TokensPerLang,
          s"[$mode] $lang kept $toks tokens over the ${Dedup.TokensPerLang} budget")
      }
      val pos = rows.map(_.getAs[Long]("shuffle_pos"))
      assert(pos.distinct.size == pos.size,
        s"[$mode] manifest shuffle positions must be collision-free")
    }
  }

  /** Disjoint-vocabulary docs (30 tokens each, doc-prefixed words) with
    * three PLANTED exact-duplicate pairs: an exact dup has an identical
    * gram set, hence an identical minhash signature and identical band
    * buckets under ANY hash impl — the mode-independent recall floor. */
  private lazy val dupFixture: String = TestSession.docsFixture(
    (0L until 40L).map { i =>
      val base = Seq(3L -> 1L, 17L -> 9L, 33L -> 24L).toMap.getOrElse(i, i)
      val text = (0 until 30).map(j => s"d${base}w$j").mkString(" ")
      (i, text, "en", "src0", text.length.toLong)
    })

  test("d_minhash_lsh recovers planted exact dups at est=1 in both modes") {
    bothModes("d_minhash_lsh", dupFixture) { (mode, rows) =>
      val got = rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
      Seq((1L, 3L), (9L, 17L), (24L, 33L)).foreach(p =>
        assert(got(p), s"[$mode] planted exact dup $p must be recovered"))
      rows.foreach { r =>
        assert(r.getAs[Long]("a") < r.getAs[Long]("b"),
          s"[$mode] pairs must be canonical a < b")
        val est = r.getAs[Double]("est_jaccard")
        assert(est >= 0.5 && est <= 1.0, s"[$mode] est_jaccard $est out of range")
        assert((est * Dedup.NumPerm) == math.rint(est * Dedup.NumPerm),
          s"[$mode] est_jaccard must be a dyadic matches/${Dedup.NumPerm}")
      }
    }
  }

  /** One boilerplate page replicated 120×: every band of every
    * fingerprint collapses into ONE bucket — the witness cap must bound
    * the pair volume AND keep the exact-witness (pair-with-minimum)
    * property in both modes, because the fingerprints are identical
    * texts' fingerprints whichever hash built them. */
  private lazy val megaFixture: String = TestSession.docsFixture(
    (0L until 120L).map { i =>
      val text = (0 until 30).map(j => s"boiler$j").mkString(" ")
      (i, text, "en", "src0", text.length.toLong)
    })

  test("d_simhash_pairs witness cap bounds a collapsed mega-bucket in both modes") {
    val n = 120
    val cap = Dedup.BandBucketCap
    bothModes("d_simhash_pairs", megaFixture) { (mode, rows) =>
      val pairs = rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
      assert(pairs.size == cap * (cap - 1) / 2 + cap * (n - cap),
        s"[$mode] collapsed bucket must yield the witness bound, got ${pairs.size}")
      (cap.toLong until n.toLong).foreach(y => assert(pairs((0L, y)),
        s"[$mode] member $y must pair with the bucket minimum"))
    }
  }

  // ---- r20: the remaining hash-GATED decision families (r19 verdict
  // task 5) — every operator whose KEPT SET or SCHEDULE depends on the
  // hash gets a mode-independent contract. ----

  test("d_sample_mix gate is rate-consistent with sane per-lang fractions in both modes") {
    // per-lang corpus totals are hash-independent — compute once
    val totals = graft.pipeline.Docs.docs(spark, SF)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Dedup.MixRates.toMap
    bothModes("d_sample_mix") { (mode, rows) =>
      rows.foreach { r =>
        val (lang, b, rate) = (r.getAs[String]("lang"),
          r.getAs[Long]("mix_bucket"), r.getAs[Long]("keep_rate"))
        assert(rate == rates(lang).toLong,
          s"[$mode] keep_rate must be the MixRates entry for $lang")
        assert(b >= 0 && b < rate,
          s"[$mode] kept doc's mix_bucket $b must sit under its rate $rate")
      }
      // realized per-lang keep fraction ≈ rate, binomial tolerance
      val kept = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.size)
      totals.foreach { case (lang, n) =>
        val p = rates(lang) / 100.0
        val tol = 4 * math.sqrt(p * (1 - p) / n) + 1.0 / n
        val got = kept.getOrElse(lang, 0).toDouble / n
        assert(math.abs(got - p) <= tol,
          s"[$mode] $lang keep fraction $got vs rate $p (n=$n, tol=$tol)")
      }
    }
  }

  test("d_sample_mix keeps or drops exact duplicates identically in both modes") {
    // planted identical texts under a 25%-rate lang: the content-hash
    // gate must treat both members of each dup pair identically —
    // consistency with dedup is the reason the gate is content-hashed
    val fixture = TestSession.docsFixture(
      (0L until 40L).map { i =>
        val base = Seq(3L -> 1L, 17L -> 9L, 33L -> 24L).toMap.getOrElse(i, i)
        val text = (0 until 30).map(j => s"d${base}w$j").mkString(" ")
        (i, text, "zh", "src0", text.length.toLong)
      })
    bothModes("d_sample_mix", fixture) { (mode, rows) =>
      val kept = rows.map(_.getAs[Long]("doc_id")).toSet
      val bucket = rows.map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Long]("mix_bucket")).toMap
      Seq((1L, 3L), (9L, 17L), (24L, 33L)).foreach { case (a, b) =>
        assert(kept(a) == kept(b),
          s"[$mode] identical texts $a/$b must be kept or dropped together")
        if (kept(a)) assert(bucket(a) == bucket(b),
          s"[$mode] identical texts must land in the same mix bucket")
      }
    }
  }

  test("d_epoch_schedule stochastic rounding is bounded and unbiased in both modes") {
    bothModes("d_epoch_schedule") { (mode, rows) =>
      assert(rows.nonEmpty, s"[$mode] empty schedule")
      rows.foreach { r =>
        val (n, f, reps) = (r.getAs[Long]("n_docs"),
          r.getAs[Double]("epoch_factor"), r.getAs[Long]("n_repeats"))
        assert(f >= Dedup.EpochMinFactor && f <= Dedup.EpochMaxFactor,
          s"[$mode] epoch factor $f outside the clamp")
        // hard bound: every doc repeats ⌊f⌋ or ⌈f⌉ times
        assert(reps >= math.floor(f).toLong * n && reps <= math.ceil(f).toLong * n,
          s"[$mode] n_repeats $reps outside [⌊f⌋n, ⌈f⌉n] for f=$f n=$n")
        // unbiasedness: realized factor within binomial tolerance of f
        val q = f - math.floor(f)
        val tol = 4 * math.sqrt(q * (1 - q) / n) + 2e-4 // + 4dp rounding slack
        val realized = r.getAs[Double]("realized_factor")
        assert(math.abs(realized - f) <= tol,
          s"[$mode] realized factor $realized vs f=$f (n=$n, tol=$tol)")
      }
    }
  }

  test("d_span_mask offsets stay inside their chunk (non-overlap by construction) in both modes") {
    val chunk = graft.pipeline.Text.SpanChunk
    val len = graft.pipeline.Text.SpanLen
    bothModes("d_span_mask") { (mode, rows) =>
      assert(rows.nonEmpty, s"[$mode] empty mask schedule")
      rows.foreach { r =>
        val (sid, start) =
          (r.getAs[Long]("span_id"), r.getAs[Long]("start_tok"))
        assert(r.getAs[Long]("span_len") == len.toLong,
          s"[$mode] span_len must be $len")
        assert(start >= sid * chunk && start + len <= (sid + 1) * chunk,
          s"[$mode] span $sid at $start leaves its chunk — overlap possible")
        assert(r.getAs[String]("masked").split(" ").length == len,
          s"[$mode] masked target must carry exactly $len tokens")
      }
      // schedule completeness: per doc, span ids are exactly 0..nChunks-1
      rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (d, rs) =>
        val ids = rs.map(_.getAs[Long]("span_id")).sorted
        assert(ids == (0L until ids.size).toList,
          s"[$mode] doc $d span ids must be consecutive from 0")
      }
    }
  }

  test("d_importance_weights resample keep tracks min(1, weight) in both modes") {
    bothModes("d_importance_weights") { (mode, rows) =>
      assert(rows.nonEmpty, s"[$mode] empty weights")
      rows.foreach { r =>
        assert(r.getAs[Long]("doc_id") >= Dedup.DsirTargetDocs,
          s"[$mode] only raw-domain docs are scored")
        val w = r.getAs[Double]("weight")
        assert(w >= 0.0, s"[$mode] weight must be nonnegative")
        // deterministic in EVERY mode: weight ≥ 1 ⇒ the 10^6 gate always passes
        if (w >= 1.0) assert(r.getAs[Int]("keep") == 1,
          s"[$mode] weight ≥ 1 must always be kept")
      }
      // realized keep count ≈ Σ min(1, w): Poisson-binomial tolerance
      val ps = rows.map(r => math.min(1.0, r.getAs[Double]("weight")))
      val expected = ps.sum
      val sigma = math.sqrt(ps.map(p => p * (1 - p)).sum)
      val got = rows.map(_.getAs[Int]("keep").toLong).sum.toDouble
      assert(math.abs(got - expected) <= 4 * sigma + 1,
        s"[$mode] kept $got vs expected $expected (σ=$sigma)")
    }
  }

  test("d_substring_dedup dup shares are well-formed and min-id owns itself in both modes") {
    bothModes("d_substring_dedup") { (mode, rows) =>
      val minDoc = rows.map(_.getAs[Long]("doc_id")).min
      rows.foreach { r =>
        assert(r.getAs[Long]("n_dup_windows") <= r.getAs[Long]("n_windows"),
          s"[$mode] dup windows cannot exceed windows")
        if (r.getAs[Long]("doc_id") == minDoc)
          assert(r.getAs[Long]("n_dup_windows") == 0L,
            s"[$mode] the corpus-minimum doc owns every window it has")
      }
    }
  }
}
