package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Hash / arithmetic primitives that have an *exactly equivalent* DuckDB SQL
  * form, so every operator built on them is verifiable against the DuckDB
  * oracle. Each Spark-side function here has a `sql*` twin producing the
  * DuckDB expression string from the same constants — one source of truth
  * for both engines.
  *
  * Design note (scale): everything here is built from codegen'd
  * `org.apache.spark.sql.functions` — md5 + string slicing + integer
  * arithmetic — so the hot path stays inside WholeStageCodegen with no UDFs.
  */
object Portable {

  /** Large Mersenne prime 2^31-1; all rolling/minhash arithmetic is mod P.
    * Operands are kept < 2^21 * 2^32 so products never overflow signed 64-bit
    * in either engine.
    */
  val P: Long = 2147483647L

  /** Strip a component oracle's TERMINAL ORDER BY so it can nest as a
    * CTE subquery — the one string surgery composite oracles perform,
    * centralized so every site carries the same loud guard: a missing
    * clause OR one inside a trailing parenthesized subquery fails at
    * oracle-construction time instead of silently truncating mid-query.
    */
  def sqlNoOrder(sql: String): String = {
    val i = sql.lastIndexOf("ORDER BY")
    require(i >= 0 && !sql.substring(i).contains(")"),
      s"component oracle must end in a terminal ORDER BY clause:\n$sql")
    sql.substring(0, i)
  }

  /** 32-bit deterministic hash of a string: first 8 hex chars of md5.
    * Value range [0, 2^32) — always non-negative, fits BIGINT in both engines.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** DuckDB twin of [[hash32]]. `e` is a SQL expression string. */
  def sqlHash32(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  // ---------------------------------------------------------------- MinHash

  /** Number of minhash permutations (4 bands x 4 rows for LSH banding). */
  val MinHashPerms = 16
  val MinHashBands = 4
  val MinHashRows  = 4 // per band

  /** Permutation constants a_i, b_i for h_i(x) = (a_i * x + b_i) mod P.
    * a_i <= ~2.7e5 keeps a_i * hash32 < 2^50 — no 64-bit overflow.
    */
  val MinHashA: Seq[Long] = (0 until MinHashPerms).map(i => 100003L + 10007L * i)
  val MinHashB: Seq[Long] = (0 until MinHashPerms).map(i => 12345L + 104729L * i)

  /** i-th minhash permutation applied to an already-hashed shingle column. */
  def minHashPerm(h32: Column, i: Int): Column =
    (h32 * lit(MinHashA(i)) + lit(MinHashB(i))) % lit(P)

  /** DuckDB twin: permutation expression over a hashed-shingle expression. */
  def sqlMinHashPerm(h32: String, i: Int): String =
    s"((($h32) * ${MinHashA(i)}::BIGINT + ${MinHashB(i)}::BIGINT) % ${P}::BIGINT)"

  // ---------------------------------------------- signed random projection

  /** SRP-LSH shape: bands x bits-per-band sign buckets over deterministic
    * hyperplanes. A pair colliding in ANY band becomes a candidate —
    * the embedding-space analogue of MinHash banding.
    */
  val SrpBands = 4
  val SrpBits = 8

  /** Hyperplane component for (band b, bit j, 1-based element i):
    * md5-derived, symmetric in [-1, 1] — identical in both engines.
    */
  def srpPlane(b: Column, j: Column, i: Column): Column =
    (hash32(concat_ws("_", lit("srp"), b, j, i)) % 2001 - 1000) / 1000.0

  /** DuckDB twin of [[srpPlane]]; operands are SQL expression strings. */
  def sqlSrpPlane(b: String, j: String, i: String): String =
    s"((${sqlHash32(s"'srp_' || ($b)::VARCHAR || '_' || ($j)::VARCHAR || '_' || ($i)::VARCHAR")} % 2001) - 1000) / 1000.0"

  // ---------------------------------------------------------------- SimHash

  /** SimHash width in bits (32-bit simhash; fits BIGINT in both engines). */
  val SimHashBits = 32

  // ------------------------------------------------------------ Tokenizing
  // Both engines must tokenize *identically*: lowercase, trim, split on
  // whitespace runs.

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def sqlTokens(e: String): String = s"regexp_split_to_array(lower(trim($e)), '\\s+')"

  /** A SQL STRING LITERAL for `s` — single quotes doubled (the ANSI
    * escape both engines accept). Every oracle builder that interpolates
    * a runtime term/phrase into SQL must route it through here: the
    * builders are public API, and a term containing `'` would otherwise
    * produce a syntactically broken (or injected) oracle query.
    */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Word n-gram size for shingling (dedup family). */
  val ShingleN = 3

  /** Hot-shingle cap: shingles occurring in more than this many documents are
    * dropped from the inverted index before the candidate-pair self-join.
    * This is the standard skew guard that keeps the join from exploding on
    * stop-shingles at scale; mirrored exactly in the oracle SQL.
    */
  val MaxShingleDocFreq = 100
}
