package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The conf-gated production hash switch (r17 verdict task 3):
  * `graft.hash.impl=xxhash64` swaps every [[Hashing.hash60]] call site
  * from the DuckDB-replayable md5 default to Spark's native xxhash64,
  * masked to the same 60-bit nonnegative range. The oracle gate always
  * runs the md5 default; these tests pin (a) that the default is
  * bit-stable md5, (b) that the switch actually reroutes the fleet,
  * and (c) that the xxhash64 range satisfies every downstream
  * consumer's [0, 2^60) contract. */
class HashingSpec extends SparkSpec {

  /** Run `f` with `s` as the thread's active session (hash60 reads the
    * ACTIVE session's SQLConf at plan-construction time). */
  private def withActive[T](s: SparkSession)(f: => T): T = {
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(s)
    try f finally prev match {
      case Some(p) => SparkSession.setActiveSession(p)
      // no previous active session on this thread: CLEAR rather than
      // leak the xxhash64 session into later tests on the same thread
      case None => SparkSession.clearActiveSession()
    }
  }

  private lazy val xxSession: SparkSession = {
    val s = spark.newSession()
    s.conf.set("graft.hash.impl", "xxhash64")
    s
  }

  test("the default mode IS the DuckDB-replayable md5 hash, bit-for-bit") {
    val row = spark.range(1).select(
      Hashing.hash60(lit("graft")).as("h"),
      Hashing.md5Hash60(lit("graft")).as("m")).head()
    assert(row.getLong(0) == row.getLong(1), "unset conf must mean md5")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("graft".getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(15)
    assert(row.getLong(0) == java.lang.Long.parseLong(hex, 16),
      "md5Hash60 must equal the 15-hex-digit md5 prefix")
  }

  test("graft.hash.impl=xxhash64 reroutes hash60 and stays in [0, 2^60)") {
    val vals = withActive(xxSession) {
      xxSession.range(2000).select(
        Hashing.hash60(concat_ws("|", col("id"), lit("probe"))).as("h"),
        Hashing.md5Hash60(concat_ws("|", col("id"), lit("probe"))).as("m"),
        Hashing.xxHash60(concat_ws("|", col("id"), lit("probe"))).as("x"))
        .collect()
    }
    assert(vals.forall(r => r.getLong(0) == r.getLong(2)),
      "in xxhash64 mode hash60 must BE xxHash60")
    assert(vals.exists(r => r.getLong(0) != r.getLong(1)),
      "the modes must actually differ (the switch is not a no-op)")
    val bound = 1L << 60
    assert(vals.forall(r => r.getLong(0) >= 0L && r.getLong(0) < bound),
      "masked xxhash64 must satisfy the fleet's [0, 2^60) range contract")
  }

  test("both impls are NULL-preserving: hash60(NULL) is NULL in either mode") {
    // Spark's raw xxhash64 is NON-nullable (a NULL child is skipped and
    // the seed hash returned) while md5(NULL) is NULL; fleet call sites
    // hash bare nullable columns (gram/token/text), where the NULL
    // propagates through pmod/filters and DROPS the row — so the
    // production impl must preserve NULL or the two modes diverge on
    // the operator CONTRACT, not just on sampled sets (ADVICE r18).
    val nullStr = lit(null).cast("string")
    val md5Row = spark.range(1).select(
      Hashing.hash60(nullStr).as("h"), Hashing.md5Hash60(nullStr).as("m")).head()
    assert(md5Row.isNullAt(0) && md5Row.isNullAt(1),
      "md5 mode must propagate NULL input to NULL hash")
    val xxRow = withActive(xxSession) {
      xxSession.range(1).select(
        Hashing.hash60(nullStr).as("h"), Hashing.xxHash60(nullStr).as("x")).head()
    }
    assert(xxRow.isNullAt(0) && xxRow.isNullAt(1),
      "xxhash64 mode must ALSO propagate NULL input to NULL hash")
    // and non-null inputs are untouched by the guard
    val live = withActive(xxSession) {
      xxSession.range(1).select(Hashing.xxHash60(lit("graft")).as("x")).head()
    }
    assert(!live.isNullAt(0), "non-null input must still hash")
  }

  test("a registry call restores the caller's previously-active session") {
    // the SparkEntry wrapper pins the invoked key's session active for
    // plan construction; it must NOT leak it — a multi-session driver
    // building its own conf-gated columns next on the same thread would
    // silently inherit the key's conf (r18 verdict nit 1)
    withActive(spark) { // caller's thread-active session: the md5 one
      SparkEntry.queries("d_shuffle_index")(xxSession, SF).count()
      assert(SparkSession.getActiveSession.contains(spark),
        "after a registry call the CALLER's active session must be back")
      // and the caller's next conf-gated column resolves under ITS conf
      val row = spark.range(1).select(
        Hashing.hash60(lit("graft")).as("h"),
        Hashing.md5Hash60(lit("graft")).as("m")).head()
      assert(row.getLong(0) == row.getLong(1),
        "the caller's md5-mode conf must survive the registry call")
    }
    // a thread with NO previous active session comes back clear, not
    // with the key's session leaked into its active slot
    val t = new Thread(() => {
      SparkSession.clearActiveSession()
      SparkEntry.queries("d_shuffle_index")(xxSession, SF).count()
      assert(SparkSession.getActiveSession.isEmpty,
        "no-previous-session threads must come back CLEARED")
    })
    var err: Option[Throwable] = None
    t.setUncaughtExceptionHandler((_, e) => err = Some(e))
    t.start(); t.join()
    err.foreach(throw _)
  }

  test("a hash-heavy key runs end-to-end in xxhash64 mode (production path)") {
    // d_shuffle_index emits one row per document regardless of hash
    // impl (it is a hash-ordered permutation), so row-count equality
    // across modes is the mode-independent invariant to pin
    val md5Rows = SparkEntry.queries("d_shuffle_index")(spark, SF).count()
    val xxRows = withActive(xxSession) {
      SparkEntry.queries("d_shuffle_index")(xxSession, SF).count()
    }
    assert(xxRows == md5Rows,
      s"the permutation must keep every doc in both modes ($xxRows vs $md5Rows)")
  }
}
