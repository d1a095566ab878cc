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
  * Swapping in xxhash64 (same call shape, ~5× faster on long strings,
  * but with no SQL-engine equivalent) is a one-line production change.
  */
object Hashing {

  /** 60-bit md5-prefix hash of a column (see object docs). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of [[md5Hash60]]: parse the 15-char md5 prefix as
    * base-16 via a seeded list fold (list_reduce has no init argument in
    * DuckDB 1.x — list_prepend seeds the accumulator). */
  def hexFoldSql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split_regex(substring(md5($expr), 1, 15), ''),
            c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1)),
          (acc, d) -> acc * 16 + d)"""
}
