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
}
