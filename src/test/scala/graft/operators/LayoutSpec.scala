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
