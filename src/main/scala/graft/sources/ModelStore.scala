package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet round-trip for TRAINED ARTIFACTS (BPE merges/vocab, whitening
  * model, k-means centroids, IVF cell assignments): a real pipeline trains
  * ONCE and applies across shards/days, so every learned model needs a
  * durable form — not a lifetime bounded by the query that trained it.
  *
  * Parquet is the storage: binary-exact for doubles (no decimal round trip
  * to drift a centroid), self-describing schema, splittable on read. Models
  * are dimension-table-sized by construction (vocab, D x D, k x dims), so a
  * single coalesced file per artifact keeps the load side a cheap local
  * scan — at 100 TB the MODEL stays tiny even when the corpus doesn't; it
  * is the corpus-sized outputs that go through [[Corpus.writeParquet]]'s
  * partitioned writer instead.
  */
object ModelStore {

  /** Write one SMALL model table (overwrite). Single file: for artifacts
    * that are dimension-sized by construction (centroids k x dims, the
    * whitening D x D, the merge table), one file makes the apply-side
    * broadcast read one footer instead of shuffle-partition-many. Do NOT
    * use for tables that grow with the corpus — that's [[saveLarge]].
    */
  def save(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** Write a model table that SCALES WITH THE DATA (the k-means cell
    * assignment is one row per vector; a BPE vocabulary is one row per
    * distinct word): parallel write with bounded file sizes — a coalesce(1)
    * here would funnel the table through a single task at 100 TB.
    */
  def saveLarge(df: DataFrame, path: String): Unit =
    df.write.option("maxRecordsPerFile", "5000000")
      .mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Refuse an IN-PLACE rewrite: mode-overwrite deletes the target
    * directory before the (lazy) input DataFrames have been read, so
    * compacting an index into the directory it was loaded from either
    * throws Spark's cannot-overwrite-a-path-being-read error or destroys
    * the artifact mid-job. Compaction callers pass every table about to
    * be rewritten; any input file already under `dir` aborts loudly
    * BEFORE the first delete. Tables not yet backed by files (a
    * fresh-built in-memory index) have no inputFiles and pass.
    */
  def requireNotInPlace(dir: String, inputs: DataFrame*): Unit = {
    def norm(s: String): String = {
      val p =
        try {
          val u = new java.net.URI(s)
          if (u.getScheme != null && u.getPath != null) u.getPath else s
        } catch { case _: Exception => s }
      java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
    }
    val out = norm(dir)
    val hit = inputs.iterator.flatMap(_.inputFiles).find { f =>
      val p = norm(f)
      p == out || p.startsWith(out + java.io.File.separator)
    }
    require(hit.isEmpty,
      s"in-place compaction: output dir $dir overlaps an input file " +
        s"(${hit.getOrElse("")}); write to a fresh directory, then swap")
  }
}
