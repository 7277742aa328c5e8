package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * At 100 TB a hot grouping key (one user, one event type) concentrates a
  * whole reduce partition on one task. Salting spreads each key across
  * `salt` deterministic sub-keys, partial-aggregates per (key, salt) —
  * map-side combine already bounds the shuffle — then finalizes per key.
  * Exact for algebraic aggregates (sum/count/min/max).
  *
  * Complements AQE's skew-join handling (enabled in GraftSession), which
  * covers joins; this covers aggregation skew explicitly.
  */
object Skew {

  /** Salted sum+count of `value` grouped by `key`. The spreader hashes the
    * value column (deterministic, data-dependent) rather than rand() so
    * results are reproducible.
    */
  def saltedAgg(df: DataFrame, key: Column, value: Column, salt: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(value), lit(salt)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col("k"))
      .agg(sum(col("_psum")).as("total"), sum(col("_pn")).as("n"))

  /** Salted inner JOIN for a skewed fact key (q22): AQE's skew-join split
    * handled declaratively — the standard technique when a broadcast is
    * impossible (right side too large) and one fact key owns a reduce
    * partition. The fact side gets a deterministic salt in [0, salt); the
    * dimension side is replicated once per salt value; the join key
    * becomes (key, _salt), so a hot key's rows spread across `salt`
    * reducers instead of serializing on one. EXACT for inner joins: each
    * fact row meets each of its dimension rows exactly once (the
    * replication is on the other side of its salt pin).
    *
    * Cost: the dimension shuffle inflates by `salt`x — the right trade
    * exactly when the dimension is orders of magnitude smaller than the
    * fact (else let AQE decide). The salt hashes the whole fact row, so
    * the spread is data-dependent and reproducible, never rand().
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val f = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col): _*), lit(salt)))
    val d = dim.withColumn("_salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Reducer count the [[skewReport]] salt recommendation assumes. */
  val SkewPartitions = 32

  /** JOIN-KEY SKEW ADVISOR (q36): the diagnosis q21/q22 are the cure
    * for. For each candidate shuffle key, one pass computes the key
    * histogram's shape — total rows, distinct keys, the hottest key and
    * its row count, the skew factor (max/avg, integer ×1000) and the
    * recommended salt: how many of [[SkewPartitions]] reducers the hot
    * key needs, ⌈max·P/n⌉ (1 = no salting needed). Integer-exact, so the
    * advisor row itself is oracle-gated.
    *
    * Scale shape: ONE scan of the fact table (the candidate keys explode
    * per row into (key_col, value) pairs), one partial-aggregated shuffle
    * keyed by (key_col, value), then per-key-column aggregates over the
    * bounded histogram. The hot key resolves via max(struct(c, -kv)) —
    * no second scan, min key id on ties.
    */
  def skewReport(df: DataFrame, keys: Seq[String]): DataFrame = {
    val pairs = df.select(explode(array(keys.map(k =>
        struct(lit(k).as("kc"), col(k).cast("long").as("kv"))): _*)).as("p"))
      .select(col("p.kc").as("key_col"), col("p.kv").as("kv"))
    val hist = pairs.groupBy(col("key_col"), col("kv"))
      .agg(count(lit(1)).as("c"))
    hist.groupBy(col("key_col"))
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(struct(col("c"), (-col("kv")).as("nk"))).as("mx"))
      .select(col("key_col"), col("n_rows"), col("n_keys"),
        col("mx.c").as("max_rows"), (-col("mx.nk")).as("hot_key"))
      .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_rows"),
        col("hot_key"),
        expr("max_rows * 1000 * n_keys div n_rows").as("skew_x1000"),
        expr(s"(max_rows * $SkewPartitions + n_rows - 1) div n_rows")
          .as("rec_salt"))
      .orderBy(col("key_col"))
  }

  /** Oracle for [[skewReport]] over lineitem's three join keys. */
  val sqlSkewReport: String = {
    def part(k: String): String =
      s"""(WITH p AS (SELECT $k AS kv, count(*)::BIGINT AS c
         |    FROM lineitem GROUP BY 1),
         |  s AS (SELECT sum(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
         |      max(c)::BIGINT AS max_rows FROM p),
         |  h AS (SELECT min(kv)::BIGINT AS hot_key FROM p, s WHERE p.c = s.max_rows)
         |  SELECT '$k' AS key_col, n_rows, n_keys, max_rows, hot_key,
         |    (max_rows * 1000 * n_keys) // n_rows AS skew_x1000,
         |    (max_rows * $SkewPartitions + n_rows - 1) // n_rows AS rec_salt
         |  FROM s, h)""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(part)
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
  }
}
