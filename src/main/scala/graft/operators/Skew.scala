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
}
