package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The ANN serve-time cost budget (s20/s21): [[Similarity.annProbeCosts]]
  * prices each request's probed cells by saved-index occupancy and keeps
  * them nearest-first under AnnBudgetFactor × expected volume (nearest
  * probe always kept), and [[Similarity.ivfPqServeBudgeted]] scores
  * EXACTLY the kept probes through the shared serving core — pinned here
  * on a corpus with hand-built cluster occupancies, so every keep/drop
  * decision is arithmetic the test states, not fixture coincidence.
  *
  * Fixture: 16 vectors in 4 orthogonal-axis clusters sized 10/3/2/1
  * (dim 8, sub 1). k-means inits from vec_ids 0..3 — one per cluster —
  * so cells converge to the axes and cell c holds cluster c. Budget =
  * n × IvfPqProbes / IvfPqCoarse = 16 × 2/4 = 8 candidate rows.
  */
class AnnBudgetSpec extends AnyFunSuite {

  private val Dim = 8
  private val Sub = Dim / Similarity.PqBlocks // = 1

  /** Cluster sizes by axis: cell 0 → 10, cell 1 → 3, cell 2 → 2, cell 3 → 1. */
  private def axisVec(axis: Int): Array[Float] = {
    val v = Array.fill(Dim)(0.0f); v(axis) = 1.0f; v
  }

  private def corpus(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    // vec_ids 0..3 are the k-means init seeds, one per cluster
    val members: Seq[(Long, Int)] =
      Seq(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3) ++
        (4L to 12L).map(_ -> 0) ++ // cluster 0: 10 members total
        Seq(13L -> 1, 14L -> 1) ++ // cluster 1: 3
        Seq(15L -> 2)              // cluster 2: 2 (cluster 3: 1)
    members.map { case (id, ax) => (id, s"c$ax", axisVec(ax)) }
      .toDF("vec_id", "label", "embedding")
  }

  /** A request nudged toward `near` with a `far` second-nearest axis. */
  private def query(s: org.apache.spark.sql.SparkSession,
                    qid: Long, near: Int, far: Int) = {
    import s.implicits._
    val v = Array.fill(Dim)(0.0f); v(near) = 1.0f; v(far) = 0.5f
    Seq((qid, "q", v)).toDF("vec_id", "label", "embedding")
  }

  test("probe audit: occupancy-priced nearest-first walk, nearest probe always kept") {
    val s = TestSpark.spark
    val idx = Similarity.ivfPqTrain(corpus(s), Sub)
    val qs = query(s, 100L, 0, 1) // probes cell 0 (occ 10) then 1 (occ 3)
      .unionByName(query(s, 101L, 2, 3)) // cells 2 (2) then 3 (1)
      .unionByName(query(s, 102L, 1, 2)) // cells 1 (3) then 2 (2)
    val audit = Similarity.annProbeCosts(qs, idx, Sub)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    // budget = 8: q100's nearest cell alone exceeds it (occ 10) and is
    // kept by the pr = 1 guarantee; its second probe (cum 13) drops.
    // q101/q102 fit whole (cum 3 and 5).
    assert(audit == Seq(
      (100L, 1, 0, 10L, 10L, true),
      (100L, 2, 1, 3L, 13L, false),
      (101L, 1, 2, 2L, 2L, true),
      (101L, 2, 3, 1L, 3L, true),
      (102L, 1, 1, 3L, 3L, true),
      (102L, 2, 2, 2L, 5L, true)), s"unexpected walk:\n$audit")
    // independent greedy reference: replay the walk in plain Scala from
    // the audit's own (pr, occ) inputs and the collected corpus size —
    // the window arithmetic must match a sequential fold exactly
    val n = idx.cells.count()
    val budgetOk = (cum: Long) =>
      cum * Similarity.IvfPqCoarse <=
        n * Similarity.IvfPqProbes * Similarity.AnnBudgetFactor
    audit.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { r =>
        cum += r._4
        assert(r._5 == cum, s"cum mismatch at $r")
        assert(r._6 == (r._2 == 1 || budgetOk(cum)), s"verdict mismatch at $r")
      }
    }
    // the kept slice IS what serving uses (one shared walk)
    val keptFromAudit = audit.filter(_._6).map(a => (a._1, a._3)).toSet
    val served = Similarity.annBudgetProbes(qs, idx, Sub)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(keptFromAudit == served)
  }

  test("budgeted serve equals the plain serve when every probe fits the budget") {
    val s = TestSpark.spark
    val idx = Similarity.ivfPqTrain(corpus(s), Sub)
    val qs = query(s, 101L, 2, 3).unionByName(query(s, 102L, 1, 2))
    val got = Similarity.ivfPqServeBudgeted(qs, corpus(s), idx, Sub, 3)
      .collect().map(_.toSeq).toSeq
    val want = Similarity.ivfPqServe(qs, corpus(s), idx, Sub, 3)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("budgeted serve over a dropped cell equals the plain serve over an index without it (shared-core consistency)") {
    val s = TestSpark.spark
    val idx = Similarity.ivfPqTrain(corpus(s), Sub)
    val q100 = query(s, 100L, 0, 1) // drops cell 1 under the budget
    val got = Similarity.ivfPqServeBudgeted(q100, corpus(s), idx, Sub, 3)
      .collect().map(_.toSeq).toSeq
    // reference: the plain path still probes cells {0, 1}, but with
    // cell 1's codes removed from the index its ADC candidates are
    // exactly the budgeted path's — identical rows prove the budgeted
    // entry point changes WHICH cells score, never HOW they score
    val pruned = idx.copy(codes = idx.codes.filter(col("cell") === 0))
    val want = Similarity.ivfPqServe(q100, corpus(s), pruned, Sub, 3)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("cell-pressure dashboard flags exactly the cell that alone exceeds a request budget") {
    val s = TestSpark.spark
    val idx = Similarity.ivfPqTrain(corpus(s), Sub)
    // n = 16, budget = 8: cell 0 (occ 10) alone exceeds it — every
    // request probing it rides the pr = 1 guarantee or drops it; the
    // other cells are fine (the driver fixture never fires this flag —
    // its k-means cells are balanced — so the skewed world pins BOTH
    // outcomes)
    val rows = Similarity.annCellPressure(idx)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(rows == Seq(
      (0, 10L, 625000L, true),
      (1, 3L, 187500L, false),
      (2, 2L, 125000L, false),
      (3, 1L, 62500L, false)), s"unexpected pressure table:\n$rows")
  }

  test("budget recall report: 1.0 exactly when nothing drops, measured overlap when a cell drops") {
    val s = TestSpark.spark
    val c = corpus(s)
    val idx = Similarity.ivfPqTrain(c, Sub)
    val qs = query(s, 100L, 0, 1) // drops cell 1
      .unionByName(query(s, 101L, 2, 3)) // fits whole
    val rep = Similarity.annBudgetRecall(qs, c, idx, Sub, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    // q101 keeps both probes -> the shared core makes budgeted == plain,
    // so its recall MUST be exactly 1.0 (the honesty identity)
    val q101 = rep.find(_._1 == 101L).get
    assert(q101 == ((101L, 2L, 0L, 3L, 3L, 1.0)), s"fits-whole row: $q101")
    // q100 drops cell 1 (occ 3 of 13 probed): the report's recall must
    // equal the independently-computed top-k overlap
    val plain = Similarity.ivfPqServe(query(s, 100L, 0, 1), c, idx, Sub, 3)
      .collect().map(_.getLong(2)).toSet
    val bud = Similarity.ivfPqServeBudgeted(query(s, 100L, 0, 1), c, idx, Sub, 3)
      .collect().map(_.getLong(2)).toSet
    val want = math.round(bud.intersect(plain).size.toDouble / 3 * 10000) / 10000.0
    val q100 = rep.find(_._1 == 100L).get
    assert((q100._2, q100._3, q100._4, q100._5) == ((1L, 1L, 10L, 13L)),
      s"narrowed row volumes: $q100")
    assert(q100._6 == want, s"recall ${q100._6} != independent $want")
  }

  test("empty request batch serves empty without error") {
    val s = TestSpark.spark
    import s.implicits._
    val idx = Similarity.ivfPqTrain(corpus(s), Sub)
    val none = Seq.empty[(Long, String, Array[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(Similarity.ivfPqServeBudgeted(none, corpus(s), idx, Sub, 3).count() == 0)
    assert(Similarity.annProbeCosts(none, idx, Sub).count() == 0)
  }
}
