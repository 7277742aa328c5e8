package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-verified bit-interleave corners for the z-order layout audit
  * (q35 gates it against the oracle at corpus scale).
  */
class LayoutSpec extends AnyFunSuite {

  test("zorder corners: interleaved quadtree cells separate both columns, linear only one") {
    val s = TestSpark.spark
    import s.implicits._
    // the four corners of the 16-bit square scale to themselves
    // (amn=0, amx=65535) and land in cells 0 / 5 / 10 / 15: the top 4
    // interleaved bits are b15 a15 b14 a14.
    val d = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("l_partkey", "l_suppkey")
    val got = Layout.zorderAudit(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      // linear: 2 files; partkey probes prune to 1 file, suppkey probes
      // scan everything (full-width b ranges in every file)
      ("linear", "partkey", 2L, 2L, 2L, 500000L),
      ("linear", "suppkey", 2L, 2L, 4L, 1000000L),
      // zorder: 4 single-row cells; every probe on EITHER column prunes
      // to half the files
      ("zorder", "partkey", 4L, 2L, 4L, 500000L),
      ("zorder", "suppkey", 4L, 2L, 4L, 500000L)), s"${got.toSeq}")
  }

  test("z-order write realizes the audit: real parquet footers equal the predicted cell stats and skip rate") {
    import scala.jdk.CollectionConverters._
    val s = TestSpark.spark
    val li = graft.Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(col("l_partkey"), col("l_suppkey"))
    val out = java.nio.file.Files.createTempDirectory("graft-zwrite").toString
    Layout.writeZordered(li, out)
    val predicted = Layout.zCellStats(li).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // read the REAL footers: per cell exactly one file whose column
    // statistics must equal the audited cell min/max
    val conf = new org.apache.hadoop.conf.Configuration()
    val cellDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("zfile="))
    val actual = cellDirs.map { d =>
      val cell = d.getName.stripPrefix("zfile=").toLong
      val parts = d.listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"cell $cell must be one file, got ${parts.length}")
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(parts.head.getAbsolutePath), conf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        def mm(name: String): (Long, Long) = {
          val ss = blocks.map(b => b.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics)
          (ss.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
            ss.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
        }
        val (amn, amx) = mm("l_partkey")
        val (bmn, bmx) = mm("l_suppkey")
        cell -> ((amn, amx, bmn, bmx))
      } finally rd.close()
    }.toMap
    assert(actual == predicted,
      s"footer stats diverge from audited cells:\n$actual\nvs\n$predicted")
    // the realized skip rate, recomputed from the REAL footers, equals
    // the audit's predicted files_scanned for both probe columns
    val audit = Layout.zorderAudit(li).collect()
      .filter(_.getString(0) == "zorder")
      .map(r => r.getString(1) -> r.getLong(4)).toMap
    val aVals = li.select(col("l_partkey")).distinct().collect().map(_.getLong(0))
    val bVals = li.select(col("l_suppkey")).distinct().collect().map(_.getLong(0))
    val stats = actual.values.toSeq
    val scannedA = aVals.map(v => stats.count(c => v >= c._1 && v <= c._2).toLong).sum
    val scannedB = bVals.map(v => stats.count(c => v >= c._3 && v <= c._4).toLong).sum
    assert(scannedA == audit("partkey"),
      s"partkey realized scan $scannedA != predicted ${audit("partkey")}")
    assert(scannedB == audit("suppkey"),
      s"suppkey realized scan $scannedB != predicted ${audit("suppkey")}")
  }

  test("incremental z-order: shard appends into frozen cells; compaction restores one tight file") {
    val s = TestSpark.spark
    val li = graft.Tables.lineitem(s, "/root/testdata/sf0.001")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    val cut = li.agg(expr("percentile_approx(l_orderkey, 0.8)")).first().getLong(0)
    val old = li.filter(col("l_orderkey") < cut).drop("l_orderkey")
    val shard = li.filter(col("l_orderkey") >= cut).drop("l_orderkey")
    val out = java.nio.file.Files.createTempDirectory("graft-zshard").toString
    Layout.writeZordered(old, out)
    Layout.writeZorderedShard(shard, out)

    // nothing lost, nothing duplicated
    val back = s.read.parquet(out)
    assert(back.count() == li.count(), "append must preserve row count")

    // frozen-cell invariant: every row sits in the cell the SAVED bounds
    // assign it to — shard rows included (old-bounds scaling, clamped)
    val mm = graft.sources.ModelStore.load(s, s"$out/_zbounds")
    val recomputed = Layout.cellOf(back, mm)
    val pairs = back.select(col("l_partkey"), col("l_suppkey"),
        col("zfile").cast("long").as("zf"))
      .groupBy("l_partkey", "l_suppkey", "zf").count()
    val expectPairs = recomputed
      .select(col("a").as("l_partkey"), col("b").as("l_suppkey"),
        col("zfile").as("zf"))
      .groupBy("l_partkey", "l_suppkey", "zf").count()
    assert(pairs.exceptAll(expectPairs).count() == 0
      && expectPairs.exceptAll(pairs).count() == 0,
      "every row must sit in the saved-bounds cell")

    // a shard-touched cell holds >1 file; compaction rewrites ONLY it
    val cellDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("zfile="))
    def filesOf(d: java.io.File) = d.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val touched = cellDirs.find(filesOf(_).length > 1)
    assert(touched.nonEmpty, "the shard must have touched at least one cell")
    val cell = touched.get.getName.stripPrefix("zfile=").toLong
    val untouchedFiles = cellDirs.filter(_ != touched.get)
      .map(d => d.getName -> filesOf(d).map(_.getName).toSet).toMap
    Layout.compactCell(s, out, cell)
    assert(filesOf(touched.get).length == 1, "compacted cell must be one file")
    val afterFiles = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("zfile=")).filter(_.getName != touched.get.getName)
      .map(d => d.getName -> filesOf(d).map(_.getName).toSet).toMap
    assert(afterFiles == untouchedFiles, "compaction must not touch other cells")
    assert(s.read.parquet(out).count() == li.count(), "compaction preserves rows")
  }

  test("zorder audit: constant column degenerates safely (greatest(..,1) guard)") {
    val s = TestSpark.spark
    import s.implicits._
    val d = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("l_partkey", "l_suppkey")
    val got = Layout.zorderAudit(d).collect()
    // no crash, 4 rows, and the constant suppkey is a single value probe
    assert(got.length == 4)
    val sk = got.filter(_.getString(1) == "suppkey").map(_.getLong(3))
    assert(sk.forall(_ == 1L), s"n_vals for constant col: ${sk.toSeq}")
  }
}
