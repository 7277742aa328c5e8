package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan pruning (q35): the z-order
  * clustering audit behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Min/max
  * file statistics only prune scans when the file layout makes value
  * ranges narrow; sorting by ONE column gives that column perfect
  * pruning and leaves every other column's ranges full-width. Z-ordering
  * interleaves the bits of two columns so BOTH get sub-linear file
  * ranges — this operator measures exactly how much, on the lineitem
  * fact table, by laying the rows out both ways and reporting the
  * fraction of files a point probe on each column must scan.
  *
  * File assignment is SHUFFLE-FREE by construction: a file is a quadtree
  * cell — the top bits of the interleaved key (respectively the top bits
  * of the scaled sort column for the linear layout) — a pure per-row
  * projection after one broadcast scalar row of global min/max. That is
  * the 100 TB shape: no global sort, no window; the write itself would
  * be `.repartitionByRange`/bucketing on the same key, and the audit's
  * cell stats are exactly the parquet footer min/max the scan planner
  * would see.
  *
  * Determinism: bit interleaving, scaling and the pruning arithmetic are
  * pure integer expressions (`div` / `//` on non-negative operands), so
  * every emitted value hash-matches with no rounding pin.
  */
object Layout {

  /** Bits per dimension in the interleaved key (16 → 32-bit z key). */
  val ZBits = 16

  /** Top bits of the key that name a file: 4 → up to 16 files/cells. */
  val FileBits = 4

  private val zShift = 1L << (2 * ZBits - FileBits)
  private val lShift = 1L << (ZBits - FileBits)

  /** Bit-interleave expression over pre-scaled 16-bit a16/b16 columns —
    * emitted in either engine's dialect (`shift` renders a right shift).
    */
  private def zTerms(shift: (String, Int) => String): String =
    (0 until ZBits).map { i =>
      s"((${shift("a16", i)} & 1) * ${1L << (2 * i)}) + " +
        s"((${shift("b16", i)} & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** The shared cell assignment: every row with its z key and its
    * quadtree cell (`zfile`) / linear bucket (`lfile`) — one broadcast
    * scalar row of global min/max, then pure per-row bit math. The audit
    * reads the hypothetical layout off this frame; [[writeZordered]]
    * makes it physical.
    */
  /** Cell assignment under GIVEN bounds — the shard-append path: scaling
    * frozen to the layout's saved min/max (an index does not re-scale
    * per shard — d13's frozen-df rule applied to layout), out-of-range
    * shard values clamped into the edge cells. The clamp is a no-op on
    * the full path (global bounds contain every value), so the audit's
    * arithmetic is unchanged.
    */
  private def filedWith(base: DataFrame, mm: DataFrame): DataFrame = {
    val scaled = base.crossJoin(broadcast(mm)).select(col("a"), col("b"),
      expr("least(greatest(((a - amn) * 65535) div greatest(amx - amn, 1L), 0L), 65535L)")
        .as("a16"),
      expr("least(greatest(((b - bmn) * 65535) div greatest(bmx - bmn, 1L), 0L), 65535L)")
        .as("b16"))
    val z = zTerms((c, i) => s"shiftright($c, $i)")
    scaled.select(col("a"), col("b"),
      expr(s"$z").as("zkey"),
      expr(s"($z) div $zShift").as("zfile"),
      expr(s"a16 div $lShift").as("lfile"))
  }

  private def keyCols(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_partkey").as("a"), col("l_suppkey").as("b"))

  private def bounds(base: DataFrame): DataFrame =
    base.agg(min(col("a")).as("amn"), max(col("a")).as("amx"),
      min(col("b")).as("bmn"), max(col("b")).as("bmx"))

  private def filed(lineitem: DataFrame): DataFrame = {
    val base = keyCols(lineitem)
    filedWith(base, bounds(base))
  }

  /** Recompute each row's cell under GIVEN saved bounds — (a, b, zfile);
    * the frozen-cell invariant check shard appends are tested against.
    */
  def cellOf(lineitem: DataFrame, mm: DataFrame): DataFrame =
    filedWith(keyCols(lineitem), mm).select(col("a"), col("b"), col("zfile"))

  /** The audited per-cell min/max table for the z layout — exactly the
    * parquet footer statistics [[writeZordered]]'s output files must
    * reproduce cell-for-cell (LayoutSpec proves they do).
    */
  def zCellStats(lineitem: DataFrame): DataFrame =
    filed(lineitem).groupBy(col("zfile"))
      .agg(min(col("a")).as("amn"), max(col("a")).as("amx"),
        min(col("b")).as("bmn"), max(col("b")).as("bmx"))
      .orderBy(col("zfile"))

  /** WRITE the z-ordered layout q35 audits: every row routed to its
    * quadtree cell — `repartition(zfile)` hash-routes each cell's rows
    * to exactly one task, `partitionBy(zfile)` gives each cell its own
    * file, `sortWithinPartitions(zkey)` orders rows inside it (tight
    * row-group stats beyond the file level). NO GLOBAL SORT anywhere —
    * the classic `ORDER BY zkey` write is a full-corpus range sort;
    * cell routing is a hash exchange plus per-partition sorts, the
    * shape that survives 100 TB. The resulting footers carry the
    * audit's predicted per-cell min/max verbatim, so the audit's
    * scan_frac_ppm is the layout's REAL pruning rate, not a model.
    */
  def writeZordered(lineitem: DataFrame, dir: String): Unit = {
    val base = keyCols(lineitem)
    val mm = bounds(base).localCheckpoint(true)
    filedWith(base, mm)
      .select(col("a").as("l_partkey"), col("b").as("l_suppkey"),
        col("zkey"), col("zfile"))
      .repartition(col("zfile"))
      .sortWithinPartitions(col("zfile"), col("zkey"))
      .write.mode("overwrite").partitionBy("zfile").parquet(dir)
    // persist the scaling bounds next to the data (underscore path —
    // invisible to parquet readers) so shard appends can assign cells
    // without re-deriving bounds from a corpus they must not re-read;
    // written after the data so the overwrite above cannot clobber it
    graft.sources.ModelStore.save(mm, s"$dir/_zbounds")
  }

  /** INCREMENTAL SHARD APPEND into an existing z-ordered layout: cells
    * are assigned under the SAVED bounds (frozen scaling — re-scaling
    * per shard would move every existing row's cell), shard rows land
    * as new files inside their cells' directories, and only the shard
    * is read or written. A touched cell accumulates files until
    * [[compactCell]] rewrites it — the d13/t34/s11 artifact economics
    * applied to physical layout: daily data enters at shard cost, the
    * full corpus is never relaid.
    */
  def writeZorderedShard(shard: DataFrame, dir: String): Unit = {
    val mm = graft.sources.ModelStore.load(shard.sparkSession, s"$dir/_zbounds")
    filedWith(keyCols(shard), mm)
      .select(col("a").as("l_partkey"), col("b").as("l_suppkey"),
        col("zkey"), col("zfile"))
      .repartition(col("zfile"))
      .sortWithinPartitions(col("zfile"), col("zkey"))
      .write.mode("append").partitionBy("zfile").parquet(dir)
  }

  /** Rewrite ONE cell's accumulated files into a single z-sorted file
    * (dynamic partition overwrite — the other cells' files are
    * untouched). The cell's rows are materialized off the source files
    * before the overwrite (localCheckpoint) so the rewrite never reads
    * what it is replacing.
    */
  def compactCell(spark: org.apache.spark.sql.SparkSession, dir: String,
                  cell: Long): Unit =
    spark.read.parquet(dir)
      .filter(col("zfile").cast("long") === cell)
      .select(col("l_partkey"), col("l_suppkey"), col("zkey"),
        col("zfile").cast("long").as("zfile"))
      .localCheckpoint(true)
      .coalesce(1)
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("zfile").parquet(dir)

  def zorderAudit(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(col("l_partkey").as("a"), col("l_suppkey").as("b"))
    val filed = this.filed(lineitem)
    def stats(fcol: String, layout: String): DataFrame =
      filed.groupBy(col(fcol).as("f"))
        .agg(min(col("a")).as("amn"), max(col("a")).as("amx"),
          min(col("b")).as("bmn"), max(col("b")).as("bmx"))
        .withColumn("layout", lit(layout))
    val st = stats("zfile", "zorder").unionByName(stats("lfile", "linear"))
    val nf = st.groupBy(col("layout")).agg(count(lit(1)).as("n_files"))
    def leg(probe: String, vcol: Column, mnc: String, mxc: String): DataFrame = {
      val vals = base.select(vcol.as("v")).distinct()
      val nv = vals.agg(count(lit(1)).as("n_vals"))
      vals.join(broadcast(st.select(col("layout"), col(mnc).as("mn"), col(mxc).as("mx"))),
          col("v") >= col("mn") && col("v") <= col("mx"))
        .groupBy(col("layout")).agg(count(lit(1)).as("files_scanned"))
        .join(broadcast(nf), "layout").crossJoin(broadcast(nv))
        .select(col("layout"), lit(probe).as("probe_col"), col("n_files"),
          col("n_vals"), col("files_scanned"),
          expr("files_scanned * 1000000 div (n_vals * n_files)").as("scan_frac_ppm"))
    }
    leg("partkey", col("a"), "amn", "amx")
      .unionByName(leg("suppkey", col("b"), "bmn", "bmx"))
      .orderBy(col("layout"), col("probe_col"))
  }

  /** Oracle for [[zorderAudit]]: identical integer scaling, interleave,
    * quadtree-cell assignment and pruning counts.
    */
  def sqlZorderAudit: String = {
    val z = zTerms((c, i) => s"($c >> $i)")
    s"""WITH base AS (SELECT l_partkey AS a, l_suppkey AS b FROM lineitem),
       |mm AS (SELECT min(a) AS amn, max(a) AS amx, min(b) AS bmn, max(b) AS bmx
       |  FROM base),
       |scaled AS (SELECT a, b,
       |    ((a - mm.amn) * 65535) // greatest(mm.amx - mm.amn, 1) AS a16,
       |    ((b - mm.bmn) * 65535) // greatest(mm.bmx - mm.bmn, 1) AS b16
       |  FROM base, mm),
       |filed AS (SELECT a, b, ($z) // $zShift AS zfile, a16 // $lShift AS lfile
       |  FROM scaled),
       |st AS (
       |  SELECT 'zorder' AS layout, zfile AS f, min(a) AS amn, max(a) AS amx,
       |      min(b) AS bmn, max(b) AS bmx FROM filed GROUP BY 2
       |  UNION ALL
       |  SELECT 'linear', lfile, min(a), max(a), min(b), max(b)
       |  FROM filed GROUP BY 2),
       |nf AS (SELECT layout, count(*)::BIGINT AS n_files FROM st GROUP BY 1),
       |va AS (SELECT DISTINCT a AS v FROM base),
       |vb AS (SELECT DISTINCT b AS v FROM base),
       |nva AS (SELECT count(*)::BIGINT AS n_vals FROM va),
       |nvb AS (SELECT count(*)::BIGINT AS n_vals FROM vb),
       |lega AS (SELECT st.layout, 'partkey' AS probe_col,
       |    count(*)::BIGINT AS files_scanned
       |  FROM st JOIN va ON va.v BETWEEN st.amn AND st.amx GROUP BY 1, 2),
       |legb AS (SELECT st.layout, 'suppkey' AS probe_col,
       |    count(*)::BIGINT AS files_scanned
       |  FROM st JOIN vb ON vb.v BETWEEN st.bmn AND st.bmx GROUP BY 1, 2),
       |leg AS (
       |  SELECT lega.layout, probe_col, nf.n_files, nva.n_vals, files_scanned
       |  FROM lega JOIN nf ON nf.layout = lega.layout, nva
       |  UNION ALL
       |  SELECT legb.layout, probe_col, nf.n_files, nvb.n_vals, files_scanned
       |  FROM legb JOIN nf ON nf.layout = legb.layout, nvb)
       |SELECT layout, probe_col, n_files, n_vals, files_scanned,
       |  (files_scanned * 1000000) // (n_vals * n_files) AS scan_frac_ppm
       |FROM leg ORDER BY layout, probe_col""".stripMargin
  }
}
