package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash column primitives for the LLM-data-pipeline
  * operators (SURVEY.md §7.2). Everything here is a native Catalyst
  * expression chain (codegen'd, no UDFs) and — deliberately — has an
  * exact DuckDB-SQL equivalent so dedup/similarity operators stay
  * oracle-checkable:
  *
  *  - [[hash64]]: md5 → first 15 hex chars → BIGINT. Identical in
  *    DuckDB as `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`.
  *    60 bits, always positive, deterministic across engines — unlike
  *    Spark's xxhash64 / DuckDB's hash() which disagree.
  *  - shingles/tokens are plain `split`/`transform` array ops.
  */
object TextOps {

  /** Lowercase, trim, collapse whitespace — canonical form for dedup. */
  def normText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text (no empties). */
  def tokens(c: Column): Column =
    filter(split(normText(c), " "), t => t =!= "")

  /** Word n-gram shingles (space-joined), distinct. Empty when the
    * document has fewer than n tokens. */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    array_distinct(
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n), i =>
          concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** Engine-portable 60-bit hash (see object doc). */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant for minhash families: hash64(seed || ':' || x). */
  def hash64Seeded(seed: Int, c: Column): Column =
    hash64(concat(lit(s"$seed:"), c))

  /** DuckDB SQL fragment equivalent to [[hash64]] applied to `expr`. */
  def sqlHash64(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB SQL fragment equivalent to [[hash64Seeded]]. */
  def sqlHash64Seeded(seed: Int, expr: String): String =
    sqlHash64(s"concat('$seed:', $expr)")

  /** DuckDB SQL fragments for the normalized text / tokens / shingles. */
  def sqlNorm(expr: String): String =
    s"regexp_replace(trim(lower($expr)), '\\s+', ' ', 'g')"
  def sqlTokens(expr: String): String =
    s"list_filter(string_split(${sqlNorm(expr)}, ' '), x -> x <> '')"
  /** DuckDB shingle fragment over a CTE-bound token-list column `t`. */
  def sqlShinglesOfT(n: Int): String = {
    val parts = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"list_distinct([$parts for i in range(1, len(t) - ${n - 2})])"
  }
}
