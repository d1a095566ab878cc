package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing, shared by the dedup pipeline and
  * the graph operators.
  *
  * The workhorse is a 60-bit hash from the first 15 hex chars of md5:
  * md5 is bit-identical in every engine, and 15 hex digits stay under
  * 2^60 so signed-long arithmetic never overflows. A DuckDB oracle
  * replays it as a seeded fold over the hex digits ([[hexFoldSql]]).
  *
  * [[hash60]] is the fleet entry point and adds the PRODUCTION switch
  * (r17 verdict task 3): session conf `graft.hash.impl=xxhash64` swaps
  * every call site to Spark's native codegen'd xxhash64 (masked to the
  * same 60-bit nonnegative range — every downstream `pmod` / `/2^60`
  * consumer is range-compatible). md5 computes a full cryptographic
  * digest over an allocated UTF-8 copy then string-formats it —
  * measured ~3-4× xxhash64's cost per row on short strings, pure
  * per-row tax at 100 TB. xxhash64 has no DuckDB replay, so the
  * ORACLE GATE runs the md5 default; the conf is for deployments,
  * where cross-engine replayability is not part of the job. Sampling /
  * banding / bucketing semantics are hash-DISTRIBUTION properties, so
  * both impls satisfy every operator contract; only the concrete
  * sampled sets differ between modes.
  */
object Hashing {

  private val Mask60 = (1L << 60) - 1

  /** 60-bit md5-prefix hash of a column (see object docs). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit xxhash64 hash — the production impl behind [[hash60]].
    *
    * NULL-PRESERVING to match the md5 default: Spark's raw `xxhash64`
    * is non-nullable (a NULL child is skipped and the seed hash comes
    * back) while `md5(NULL)` is NULL — and fleet call sites hash bare
    * nullable columns (gram/token/text), where the md5 mode's NULL
    * propagates through `pmod`/filters and DROPS the row. Without the
    * guard a NULL row would get a real bucket/gate value in xxhash64
    * mode only, breaking the "both impls satisfy every operator
    * contract" claim. `when` without `otherwise` yields NULL on the
    * miss branch; codegen subexpression elimination shares the
    * duplicated child reference.
    *
    * Input must be DETERMINISTIC: `c` appears twice (guard + hash), and
    * subexpression elimination does not apply to non-deterministic
    * children — a `rand()`-derived column could be null-checked on one
    * evaluation and hashed on another (ADVICE r19). Every fleet call
    * site passes deterministic columns (parquet fields and pure
    * functions of them); a future non-deterministic caller must
    * pre-project the column into a named attribute first. */
  def xxHash60(c: Column): Column =
    when(c.isNotNull, xxhash64(c).bitwiseAND(lit(Mask60)))

  /** The fleet's 60-bit hash, conf-gated: `graft.hash.impl=xxhash64`
    * selects [[xxHash60]], anything else (or unset) the DuckDB-
    * replayable [[md5Hash60]] default.
    *
    * Resolution contract: the conf is read at PLAN-CONSTRUCTION time
    * from the THREAD-ACTIVE session's SQLConf (`SQLConf.get` — the
    * same thread-local channel Spark's own construction-time confs
    * like `spark.sql.session.timeZone` use; a Column carries no
    * session). A single-session app — the normal deployment — always
    * satisfies this. Multi-session drivers must build plans with the
    * target session active on the thread; [[SparkEntry.queries]] pins
    * the passed session active per entry, so every registry key is
    * safe by construction, and tests that hand-build columns use an
    * explicit set/clear (HashingSpec.withActive). */
  def hash60(c: Column): Column =
    if (org.apache.spark.sql.internal.SQLConf.get
        .getConfString("graft.hash.impl", "md5") == "xxhash64") xxHash60(c)
    else md5Hash60(c)

  /** DuckDB rendering of [[md5Hash60]]: parse the 15-char md5 prefix as
    * base-16 via a seeded list fold (list_reduce has no init argument in
    * DuckDB 1.x — list_prepend seeds the accumulator). */
  def hexFoldSql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split_regex(substring(md5($expr), 1, 15), ''),
            c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1)),
          (acc, d) -> acc * 16 + d)"""
}
