package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *     already does well), freeze the partitioning with a LAZY
  *     localCheckpoint (materialized by the counts collect in step 2)
  *     so every consumer sees the same layout;
  *  2. per-partition row counts -> global rank offsets. This is a
  *     numPartitions-row driver round-trip (the bm25ServeBatch class of
  *     bounded collect: `spark.sql.shuffle.partitions` rows, config-
  *     bounded, never data-bounded);
  *  3. per-row global rank = the partition-LOCAL position read straight
  *     off monotonically_increasing_id's low 33 bits (the checkpointed
  *     scan iterates the stored sort order — no window, no second
  *     shuffle, no re-sort) plus the broadcast offset, and the ntile
  *     bucket is pure integer arithmetic on that rank: with n rows and
  *     k buckets the first n % k buckets hold n/k + 1 rows, the rest
  *     n/k.
  *
  * Scale shape: ONE range shuffle and ONE sort of the input (what any
  * global order costs), then map-side-only arithmetic; no stage sees
  * more than a partition, and no Window node exists in the plan at all
  * (plan-locked in PlanShapeSpec).
  *
  * Fault-tolerance caveat (deliberate trade): localCheckpoint blocks are
  * UNRECOVERABLE after executor loss — unlike persist(), a consumer
  * action on a previously-returned ranked frame FAILS instead of
  * recomputing, and Spark documents local checkpointing as unsafe with
  * dynamic allocation (an idle-decommissioned executor takes its blocks
  * with it). On the single-host harness this cannot trigger; a
  * multi-node deployment that needs lost-executor recovery should
  * disable dynamic allocation for the job or accept the retry-from-
  * source failure mode. The rank VALUES are unaffected either way —
  * only availability of the returned frame is.
  */
object Ranking {

  /** Append ntile(`buckets`) over the total order `keys` as column
    * `out` (INT, 1-based). `keys` MUST be duplicate-free as a composite
    * (append a unique id as the last key); equality with `ntile` is
    * pinned in ScaleOpsSpec. `out` must not already exist (silent
    * overwrite would corrupt a caller frame); the internal temp columns
    * are collision-proofed against the input schema. `numPartitions`
    * overrides the range-shuffle width; the default reads
    * `spark.sql.shuffle.partitions` and falls back to the cluster
    * default parallelism when that value is non-numeric (e.g. "auto").
    */
  /** The shared core: the input materialized in the frozen range layout
    * with a GLOBAL 1-based rank appended under a collision-proof fresh
    * name — plus the total row count (already on the driver from the
    * counts round-trip, so ntile's fill arithmetic costs nothing extra).
    */
  private def globalRank(df: DataFrame, out: String, keys: Seq[Column],
                         numPartitions: Option[Int]): (DataFrame, String, Long) = {
    require(keys.nonEmpty, "at least one order key")
    require(!df.columns.contains(out),
      s"output column '$out' already exists in the input frame")
    val parts = numPartitions.filter(_ > 0).getOrElse(
      scala.util.Try(df.sparkSession.conf
          .get("spark.sql.shuffle.partitions").toInt)
        .toOption.filter(_ > 0)
        .getOrElse(df.sparkSession.sparkContext.defaultParallelism))
    def fresh(base: String): String = {
      var n = base
      while (df.columns.contains(n) || n == out) n += "_"
      n
    }
    val pidCol = fresh("__pid")
    val rnCol = fresh("__rn")
    // LAZY localCheckpoint, not persist: the counts collect below is
    // the FIRST action, so it materializes the checkpoint blocks as a
    // side effect and the whole op still costs one job over the input
    // (eager=true paid a materialization job plus a second counting
    // pass — the round-14 shape). The layout is equally frozen (step 3
    // reads the saved blocks, never re-runs the range exchange, so the
    // sampled range bounds the counts were collected under are the
    // bounds every consumer sees). Unlike persist(), this registers NO
    // CacheManager entry: blocks die with the RDD via the
    // ContextCleaner once the returned frame is unreferenced, so a
    // long-lived session calling withNtile/withRowNumber on varied
    // inputs holds at most the live frames' blocks — no session-long
    // cache accumulation and no "already cached" double-cache warnings
    // (RankingLifecycleSpec pins the cache-manager contract).
    val mat = df
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint(false)
    // partition counts: a config-bounded driver round-trip (<= parts
    // rows), collected from the SAME materialized layout step 3 reads
    val counts = mat.groupBy(col(pidCol)).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val offsets = counts.keys.toSeq.sorted.map { pid =>
      pid -> counts.filter(_._1 < pid).values.sum
    }.toMap
    // step 3 WITHOUT a window: the checkpointed frame is already sorted
    // within its range partitions, so the partition-local position is
    // monotonically_increasing_id's low 33 bits (the documented layout —
    // partition index in the upper 31 bits, per-partition record number
    // in the lower 33; evaluation order over a checkpointed scan IS the
    // stored sort order, and re-reads iterate the saved blocks, never a
    // recompute). The previous form ranked via row_number() OVER
    // (PARTITION BY pid), which re-shuffled AND re-sorted the full frame
    // a second time just to recover an order the blocks already hold —
    // measured 1.27 s -> ~0.6 s on q34's three-quintile RFM at sf0.1.
    // Capacity: 2^33 rows per range partition (~8.5e9) before the mask
    // wraps — at that size the caller widens numPartitions long before.
    val localCol = fresh("__loc")
    val ranked = mat
      .withColumn(localCol,
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .withColumn(rnCol,
        col(localCol) + 1L +
          coalesce(element_at(typedLit(offsets), col(pidCol)), lit(0L)))
      .drop(pidCol, localCol)
    (ranked, rnCol, total)
  }

  /** Append a GLOBAL 1-based `row_number()` over the total order `keys`
    * as column `out` (BIGINT) — the distributed replacement for
    * `row_number() OVER (ORDER BY ...)` when the frame scales with the
    * data (a full-vocabulary Zipf rank, a corpus-wide position): same
    * three steps as [[withNtile]], identical to the serial window
    * whenever the keys form a total order (unit-pinned).
    */
  def withRowNumber(df: DataFrame, out: String, keys: Seq[Column],
                    numPartitions: Option[Int] = None): DataFrame = {
    val (ranked, rnCol, _) = globalRank(df, out, keys, numPartitions)
    ranked.withColumnRenamed(rnCol, out)
  }

  def withNtile(df: DataFrame, out: String, buckets: Int,
                keys: Seq[Column], numPartitions: Option[Int] = None): DataFrame = {
    require(buckets >= 1, "buckets must be at least 1")
    val (ranked, rnCol, total) = globalRank(df, out, keys, numPartitions)
    val q = total / buckets
    val r = total % buckets
    val t = r * (q + 1)
    // ntile's exact fill rule at rank rn: first r buckets take q+1 rows
    val bucket =
      if (q == 0) col(rnCol)
      else expr(s"""CASE WHEN $rnCol <= $t THEN ($rnCol + $q) div ${q + 1}
                    ELSE $r + ($rnCol - $t + $q - 1) div $q END""")
    ranked
      .withColumn(out, bucket.cast("int"))
      .drop(rnCol)
  }
}
