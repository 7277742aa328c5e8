package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DISTRIBUTED TOTAL-ORDER BUCKETING — the billion-row remedy for
  * `ntile(k) OVER (ORDER BY ...)`: Spark plans an unpartitioned window
  * as ONE task holding the whole frame ("WindowExec: No Partition
  * Defined"), which is fine for a bounded domain but a serial stage the
  * moment the frame scales with the data (q34's purchasing users). This
  * computes the IDENTICAL bucket assignment in three data-parallel
  * steps, provided the order keys form a TOTAL order (callers append a
  * unique tie-break column, exactly as the oracle's `ORDER BY ..., id`
  * does — with no duplicate composite key, rank-based and value-based
  * bucketing coincide, so the result is ntile's bit-for-bit):
  *
  *  1. range-repartition + sort by the keys (the distributed sort Spark
  *     already does well), freeze the partitioning with an eager
  *     localCheckpoint so every consumer sees the same layout;
  *  2. per-partition row counts -> global rank offsets. This is a
  *     numPartitions-row driver round-trip (the bm25ServeBatch class of
  *     bounded collect: `spark.sql.shuffle.partitions` rows, config-
  *     bounded, never data-bounded);
  *  3. per-row global rank = partition-LOCAL row_number (a PARTITIONED
  *     window — RangePartitioning assigns partition ids in key order)
  *     plus the broadcast offset, and the ntile bucket is pure integer
  *     arithmetic on that rank: with n rows and k buckets the first
  *     n % k buckets hold n/k + 1 rows, the rest n/k.
  *
  * Scale shape: one range shuffle of the input (what any global order
  * costs), then map-side-only arithmetic; no stage sees more than a
  * partition. The window in step 3 is keyed by partition id — bounded
  * by construction, never the "move all data to one partition" plan.
  */
object Ranking {

  /** Append ntile(`buckets`) over the total order `keys` as column
    * `out` (INT, 1-based). `keys` MUST be duplicate-free as a composite
    * (append a unique id as the last key); equality with `ntile` is
    * pinned in ScaleOpsSpec.
    */
  def withNtile(df: DataFrame, out: String, buckets: Int,
                keys: Seq[Column]): DataFrame = {
    require(buckets >= 1, "buckets must be at least 1")
    require(keys.nonEmpty, "at least one order key")
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val mat = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // partition counts: a config-bounded driver round-trip (<= parts
    // rows), collected from the SAME materialized layout step 3 reads
    val counts = mat.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val offsets = counts.keys.toSeq.sorted.map { pid =>
      pid -> counts.filter(_._1 < pid).values.sum
    }.toMap
    val q = total / buckets
    val r = total % buckets
    val t = r * (q + 1)
    // ntile's exact fill rule at rank rn: first r buckets take q+1 rows
    val bucket =
      if (q == 0) col("__rn")
      else expr(s"""CASE WHEN __rn <= $t THEN (__rn + $q) div ${q + 1}
                    ELSE $r + (__rn - $t + $q - 1) div $q END""")
    mat
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(keys: _*)).cast("long") +
          coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)))
      .withColumn(out, bucket.cast("int"))
      .drop("__pid", "__rn")
  }
}
