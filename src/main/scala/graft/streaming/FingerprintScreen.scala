package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.pipeline.{Dedup, Docs}

/** One banded fingerprint row entering the screen. */
final case class BandProbe(band: Int, bits: Long, doc_id: Long, fp: Long)

/** A verified near-dup hit emitted by the streaming screen. */
final case class ScreenHit(doc_id: Long, dup_of: Long, hamming: Long)

/** Per-bucket witness store: the ≤ [[Dedup.BandBucketCap]]
  * FIRST-ARRIVED (= lowest-id, when arrival follows ids) members of one
  * (band, bits) bucket. Constant-bounded state per key — the streaming
  * mirror of the batch witness cap. */
final case class BucketWitnesses(ids: List[Long], fps: List[Long])

/** One banded MinHash row entering the online screen: the bucket key
  * (band, folded band-hash) plus the full 32-perm signature the
  * in-state verify needs. */
final case class MinhashProbe(band: Int, bkt: Long, doc_id: Long, sig: Seq[Long])

/** Per-bucket witness store for the MinHash screen — ids plus their
  * full signatures (the verify is a 32-way equality count, so the
  * whole signature rides in state; ≤ cap × NumPerm longs per key,
  * constant-bounded like [[BucketWitnesses]]). */
final case class SigWitnesses(ids: List[Long], sigs: List[Seq[Long]])

/** A verified near-dup hit from the MinHash screen: `matches` = how
  * many of the 32 permutation minima agree (≥ [[Dedup.MinhashMinMatches]]). */
final case class MinhashScreenHit(doc_id: Long, dup_of: Long, matches: Long)

/** ONLINE SimHash near-dup screen — the streaming member of the
  * fingerprint-dedup family (batch pairs: [[Dedup.simhashPairs]];
  * corpus-probe ingest: [[Dedup.incrementalSimhash]]): documents
  * arrive one shard after another, each is screened against what
  * arrived BEFORE it (keep-first online dedup), and the per-bucket
  * store keeps only the capped witness prefix so state NEVER grows
  * with the corpus — the property that lets the screen run forever.
  *
  *   - [[screenBatch]]: the batch plan — per-doc keep-first verdict
  *     over the capped band pairs (`dup_of` = smallest witness within
  *     Hamming ≤ [[Dedup.HammingMax]], NULL ⇒ kept). This is the
  *     oracle-checked `st_simhash_screen` entry; with arrival order =
  *     id order the streaming path returns EXACTLY these verdicts
  *     (witnesses = first cap arrivals = lowest cap ids — the same
  *     prefix the batch cap ranks).
  *   - [[screenStreaming]]: the streaming path — banded probes keyed by
  *     (band, bits) through `flatMapGroupsWithState`: each bucket
  *     group matches arrivals against its stored witnesses (exact
  *     popcount verify) and appends the arrival to the store while
  *     under the cap. Emitted hits are (doc, witness, hamming) match
  *     rows; the ScalaTest drives it with a MemoryStream and asserts
  *     hit-set equality with the batch pairs.
  *
  * Scale shape: state is ≤ cap entries per LIVE bucket key (bounded by
  * construction, no watermark needed for correctness — the store is
  * the retention policy); the only shuffle is the (band, bits) key —
  * identical to the batch bucket join's. `st_simhash_screen`. */
object FingerprintScreen {

  /** Batch keep-first verdict per document — `st_simhash_screen`. */
  def screenBatch(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.simhashPairs(spark, dir)
    Docs.docs(spark, dir).select(col("doc_id"))
      .join(pairs.groupBy(col("b").as("doc_id")).agg(min(col("a")).as("dup_of")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Explode a (doc_id, fp) fingerprint frame into its band probes —
    * the same banding [[Dedup.bandedFingerprints]] computes, shaped
    * for the typed streaming path. */
  def bandProbes(fp: DataFrame, nBands: Int, bandBits: Int): Dataset[BandProbe] = {
    import fp.sparkSession.implicits._
    Dedup.bandedFingerprints(fp, "fp", nBands, bandBits)
      .select(col("band").cast("int").as("band"), col("bits"),
        col("doc_id"), col("fp"))
      .as[BandProbe]
  }

  /** Streaming screen over a stream of (doc_id, fp) fingerprints.
    * Emits one [[ScreenHit]] per (arrival, witness) match — dedup
    * across bands and the min-witness verdict are downstream
    * aggregates on this (bounded: ≤ cap hits per doc per band).
    * Within a micro-batch the group's rows are processed in doc_id
    * order, so replays and batch boundaries cannot reorder the
    * witness prefix. */
  def screenStreaming(fp: DataFrame, cap: Int = Dedup.BandBucketCap)
      : Dataset[ScreenHit] = {
    import fp.sparkSession.implicits._
    val nBands = Dedup.HammingMax + 1
    val bandBits = Dedup.SimhashBits / nBands
    bandProbes(fp, nBands, bandBits)
      .groupByKey(p => (p.band, p.bits))
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(screenBucket(cap))
  }

  /** Batch keep-first verdict for the ONLINE MinHash screen —
    * `st_minhash_screen`, the text-path twin of `st_simhash_screen`
    * (token-overlap near-dups instead of Hamming-ball ones; the
    * [[Dedup.incrementalNeardup]] probe is the shard-ingest member of
    * the same family). Band hashes fold into the bounded
    * [[Dedup.MinhashScreenBuckets]] space, each bucket keeps its
    * ≤ cap LOWEST-id witnesses (the [[Dedup.cappedBandPairs]] witness
    * argument: the keep-first survivor of a duplicate group is the
    * bucket minimum, always witness #1), and candidates are verified
    * by the integer signature-match count ≥
    * [[Dedup.MinhashMinMatches]] — bucket folding can only add
    * candidates for this verify to discard, never drop a true bucket
    * match. Output: (doc_id, dup_of = smallest verified witness,
    * kept). */
  def minhashScreenBatch(spark: SparkSession, dir: String,
                         cap: Int = Dedup.BandBucketCap): DataFrame = {
    val sig = Dedup.minhashSignatures(spark, dir).localCheckpoint(true)
    val bands = Dedup.minhashBands(sig)
      .select(col("doc_id"), col("band"),
        pmod(col("bh"), lit(Dedup.MinhashScreenBuckets)).as("bkt"))
    val wit = graft.plans.TopKPerGroup.rankTopK(
        bands, Seq("band", "bkt"), Seq("doc_id" -> false), cap)
      .select(col("doc_id"), col("band"), col("bkt"))
    val cand = wit.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // native in-loop signature verify (the when-chain spelling rode the
    // JIT-ceiling class CodegenSizeSpec polices; integer count, so the
    // ≥ MinhashMinMatches cut is bit-identical)
    val matches = graft.functions.ArrayEqualCount.arrayEqualCount(
      array((0 until Dedup.NumPerm).map(i => col(s"sa.mh$i")): _*),
      array((0 until Dedup.NumPerm).map(i => col(s"sb.mh$i")): _*))
    val ver = cand
      .join(sig.as("sa"), col("a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("b") === col("sb.doc_id"))
      .filter(matches >= Dedup.MinhashMinMatches)
      .groupBy(col("b").as("doc_id")).agg(min(col("a")).as("dup_of"))
    Docs.docs(spark, dir).select(col("doc_id"))
      .join(ver, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Shape a (doc_id, mh0..mh31) signature frame into typed
    * [[MinhashProbe]]s — the streaming input rows. */
  def minhashProbes(sig: DataFrame): Dataset[MinhashProbe] = {
    import sig.sparkSession.implicits._
    Dedup.minhashBandsSig(sig)
      .select(col("band").cast("int").as("band"),
        pmod(col("bh"), lit(Dedup.MinhashScreenBuckets)).as("bkt"),
        col("doc_id"), col("sig"))
      .as[MinhashProbe]
  }

  /** Streaming MinHash screen over a stream of signature rows — the
    * same flatMapGroupsWithState shape as [[screenStreaming]], keyed
    * on (band, folded band-hash). State is bounded by CONSTRUCTION
    * twice over: ≤ cap witnesses per key AND ≤ NumBands ·
    * [[Dedup.MinhashScreenBuckets]] keys, so the screen runs forever
    * regardless of corpus size. Emits one oriented (max id, min id)
    * hit per verified (arrival, witness) signature match; dedup
    * across bands and the min-witness verdict are downstream
    * aggregates. */
  def minhashScreenStreaming(sig: DataFrame, cap: Int = Dedup.BandBucketCap)
      : Dataset[MinhashScreenHit] = {
    import sig.sparkSession.implicits._
    minhashProbes(sig)
      .groupByKey(p => (p.band, p.bkt))
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(minhashScreenBucket(cap))
  }

  /** One MinHash bucket's state transition — the [[screenBucket]]
    * discipline (in-batch id sort, oriented emission, cap-gated
    * admission) with the popcount verify replaced by the 32-way
    * signature match count. */
  private[graft] def minhashScreenBucket(cap: Int)(
      key: (Int, Long), rows: Iterator[MinhashProbe],
      state: GroupState[SigWitnesses]): Iterator[MinhashScreenHit] = {
    var st = state.getOption.getOrElse(SigWitnesses(Nil, Nil))
    val out = scala.collection.mutable.ListBuffer.empty[MinhashScreenHit]
    rows.toSeq.sortBy(_.doc_id).foreach { p =>
      st.ids.iterator.zip(st.sigs.iterator).foreach { case (wid, wsig) =>
        val m = wsig.iterator.zip(p.sig.iterator)
          .count { case (a, b) => a == b }.toLong
        if (m >= Dedup.MinhashMinMatches && wid != p.doc_id)
          out += MinhashScreenHit(
            math.max(p.doc_id, wid), math.min(p.doc_id, wid), m)
      }
      if (st.ids.size < cap)
        st = SigWitnesses(st.ids :+ p.doc_id, st.sigs :+ p.sig)
    }
    state.update(st)
    out.iterator
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_simhash_screen" -> (screenBatch _),
    "st_minhash_screen" -> ((s: SparkSession, d: String) => minhashScreenBatch(s, d)),
  )

  /** Verdict = keep-first over the capped pair set — the pair oracle
    * (which already replays banding + witness cap + popcount) nested
    * as a CTE, then one MIN(witness) per flagged doc. */
  val oracle: Map[String, String] = Map(
    "st_simhash_screen" ->
      s"""WITH pr AS (${Dedup.oracle("d_simhash_pairs")}),
         ver AS (SELECT b AS doc_id, MIN(a) AS dup_of FROM pr GROUP BY b)
         SELECT d.doc_id, v.dup_of, v.dup_of IS NULL AS kept
         FROM documents d LEFT JOIN ver v ON v.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    "st_minhash_screen" -> Dedup.minhashScreenOracle,
  )

  /** One bucket's state transition, factored out for direct unit
    * drive: match each arrival against the stored witnesses, then
    * admit it to the store while under the cap. Hits are emitted
    * ORIENTED — (max id, min id) — not (arrival, witness): with
    * id-ordered arrival the two are identical (every stored witness
    * has a smaller id), but when a shard replays out of order a
    * LOWER-id doc can arrive after its higher-id bucket-mates, and
    * arrival-orientation would silently drop the pair (the old
    * `wid < arrival` guard). Orienting by id keeps the match either
    * way; the self-pair from a re-delivered probe is the one case
    * skipped. */
  private[graft] def screenBucket(cap: Int)(
      key: (Int, Long), rows: Iterator[BandProbe],
      state: GroupState[BucketWitnesses]): Iterator[ScreenHit] = {
    var st = state.getOption.getOrElse(BucketWitnesses(Nil, Nil))
    val out = scala.collection.mutable.ListBuffer.empty[ScreenHit]
    rows.toSeq.sortBy(_.doc_id).foreach { p =>
      st.ids.iterator.zip(st.fps.iterator).foreach { case (wid, wfp) =>
        val h = java.lang.Long.bitCount(wfp ^ p.fp).toLong
        if (h <= Dedup.HammingMax && wid != p.doc_id)
          out += ScreenHit(math.max(p.doc_id, wid), math.min(p.doc_id, wid), h)
      }
      if (st.ids.size < cap)
        st = BucketWitnesses(st.ids :+ p.doc_id, st.fps :+ p.fp)
    }
    state.update(st)
    out.iterator
  }
}
