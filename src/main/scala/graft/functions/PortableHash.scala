package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-verifiable hash family over a 31-bit domain.
  *
  * The dedup/sketch operators (MinHash, SimHash, fingerprints) need a hash
  * both Spark and the DuckDB oracle can compute EXACTLY — Spark's xxhash64
  * has no DuckDB twin, which demoted those operators to the weaker rows-only
  * gate in round 1. This family is plain modular arithmetic over 2^31
  * (products of two 31-bit values fit a signed 64-bit long, so neither
  * engine can overflow): a Java-style poly-31 character hash as the base,
  * then per-permutation affine mixes `(h*a + b) mod 2^31` with odd `a`.
  *
  * At 10^12-shingle scale a 31-bit base hash collides far more than
  * xxhash64 would; for MinHash that only perturbs the sketch (a collision
  * merges two shingles — the estimator degrades gracefully), it does not
  * break the banding join. Production can swap `base` for xxhash64 without
  * touching the banding plans; the 31-bit family is what makes the operator
  * *provably correct* against an independent engine.
  *
  * Everything here stays inside whole-stage codegen: higher-order array
  * functions + integer arithmetic, no UDFs.
  */
object PortableHash {

  /** modulus 2^31 */
  val M = 2147483648L

  private val MULT = 2654435761L // Knuth multiplicative-hash constant
  private val STEP = 40503L

  /** Affine-mix constants for permutation i: `a` stays odd (odd*odd mod 2^31
    * is odd), so `h -> (h*a+b) mod 2^31` is a bijection on the domain.
    */
  def aConst(i: Int): Long = (MULT * (2L * i + 1)) % M
  def bConst(i: Int): Long = (STEP * (i + 1)) % M

  /** poly-31 char hash (Java `String.hashCode` recurrence, reduced mod 2^31):
    * `h = (h*31 + ascii(c)) mod 2^31` over the characters of `c`.
    * The empty-string filter pins identical split semantics in both engines.
    *
    * DOMAIN: whole Unicode code points in both engines. Spark's
    * `split(c, "")` uses Java's code-point-aware regex engine, so a non-BMP
    * character stays ONE element (a surrogate pair), and `ascii()` on that
    * element evaluates `codePointAt(0)` — the full code point. DuckDB's
    * `string_split(c, '')` likewise yields whole code points and its
    * `ascii()` returns the code point value. Both engines therefore fold
    * the identical `(h*31 + codePoint) mod 2^31` recurrence on arbitrary
    * Unicode text (pinned by TextHashExprsSpec's supplementary-character
    * doc against the native kernel's explicit `codePointAt` fold).
    */
  def poly(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % M)

  /** permutation i of a base hash: `(h * a_i + b_i) mod 2^31`. */
  def mix(h: Column, i: Int): Column = (h * aConst(i) + bConst(i)) % M

  /** Compose three 31-bit token hashes into one 31-bit shingle hash
    * (rolling poly base 131). Avoids materializing shingle STRINGS: tokens
    * are char-hashed once, each 3-gram is then 4 integer ops.
    */
  def shingle3(h1: Column, h2: Column, h3: Column): Column =
    ((h1 * 131 + h2) % M * 131 + h3) % M

  // ---- DuckDB twins (SQL text fragments used by the oracle strings) ----

  /** DuckDB SQL for [[poly]] applied to expression `v`. */
  def polySql(v: String): String =
    s"list_reduce(list_prepend(0::BIGINT, [ascii(c)::BIGINT for c in string_split($v, '') if c <> '']), (a, b) -> (a*31 + b) % 2147483648)"

  /** DuckDB SQL for [[mix]] with the permutation index given by SQL
    * expression `p` (constants computed IN SQL by the same formulas as
    * [[aConst]]/[[bConst]] — no literal tables to drift).
    */
  def mixSql(h: String, p: String): String =
    s"($h * ((2654435761 * (2*($p) + 1)) % 2147483648) + (40503 * (($p) + 1)) % 2147483648) % 2147483648"

  /** DuckDB SQL for [[shingle3]]. */
  def shingle3Sql(h1: String, h2: String, h3: String): String =
    s"((($h1) * 131 + ($h2)) % 2147483648 * 131 + ($h3)) % 2147483648"
}
