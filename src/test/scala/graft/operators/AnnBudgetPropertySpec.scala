package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized property of the s20 probe-budget walk: on ANY occupancy
  * profile and ANY request batch, [[Similarity.annProbeCosts]] equals an
  * INDEPENDENT Scala reference of the greedy rule (probe order fixed by
  * geometry, keep while the running occupancy stays within
  * AnnBudgetFactor × n × IvfPqProbes / IvfPqCoarse, nearest probe
  * unconditional), and the budgeted serve equals the plain serve over an
  * index restricted to the kept cells. The worlds are four orthogonal
  * AXIS clusters of random sizes with one k-means seed each, so the
  * trained cells are known BY CONSTRUCTION (cluster ax → cell ax, every
  * member identical) and each request's probe order is known geometry
  * (its main axis first, its 0.5-weighted axis second) — the property
  * exercises the walk over arbitrary occupancies without re-deriving the
  * trainer. Fixed seeds (the ValidationPropertySpec convention).
  */
class AnnBudgetPropertySpec extends AnyFunSuite {

  private val Dim = 8
  private val Sub = Dim / Similarity.PqBlocks

  private def axisVec(near: Int, far: Int = -1): Array[Float] = {
    val v = Array.fill(Dim)(0.0f); v(near) = 1.0f
    if (far >= 0) v(far) = 0.5f
    v
  }

  /** (cluster sizes by axis, requests as (qid, nearAxis, farAxis)). */
  private def world(seed: Long): (Seq[Int], Seq[(Long, Int, Int)]) = {
    val g = for {
      sizes <- Gen.listOfN(4, Gen.chooseNum(1, 12))
      nReq <- Gen.chooseNum(1, 6)
      reqs <- Gen.listOfN(nReq, for {
        near <- Gen.chooseNum(0, 3)
        far <- Gen.oneOf((0 to 3).filter(_ != near))
      } yield (near, far))
    } yield (sizes, reqs.zipWithIndex.map { case ((n, f), i) =>
      (100L + i, n, f)
    })
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator produced no sample"))
  }

  private def corpus(s: org.apache.spark.sql.SparkSession, sizes: Seq[Int]) = {
    import s.implicits._
    // vec_ids 0..3 seed one cluster each; the rest fill by size
    val seeds = (0 to 3).map(ax => (ax.toLong, ax))
    val rest = sizes.zipWithIndex.flatMap { case (n, ax) =>
      Seq.fill(n - 1)(ax)
    }.zipWithIndex.map { case (ax, i) => (4L + i, ax) }
    (seeds ++ rest).map { case (id, ax) => (id, s"c$ax", axisVec(ax)) }
      .toDF("vec_id", "label", "embedding")
  }

  test("probe walk equals the independent greedy reference on random occupancy worlds") {
    val s = TestSpark.spark
    import s.implicits._
    (401L to 408L).foreach { seed =>
      val (sizes, reqs) = world(seed)
      val n = sizes.sum.toLong
      val c = corpus(s, sizes)
      val idx = Similarity.ivfPqTrain(c, Sub)
      val qs = reqs.map { case (qid, near, far) =>
        (qid, "q", axisVec(near, far))
      }.toDF("vec_id", "label", "embedding")
      // independent reference: probe order is (near, far) by geometry,
      // prices are the generated sizes, the walk is a sequential fold
      val budget = (cum: Long) =>
        cum * Similarity.IvfPqCoarse <=
          n * Similarity.IvfPqProbes * Similarity.AnnBudgetFactor
      val want = reqs.flatMap { case (qid, near, far) =>
        val first = sizes(near).toLong
        val second = first + sizes(far)
        Seq(
          (qid, 1, near, sizes(near).toLong, first, true),
          (qid, 2, far, sizes(far).toLong, second, budget(second)))
      }.sortBy(r => (r._1, r._2))
      val got = Similarity.annProbeCosts(qs, idx, Sub)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
      assert(got == want, s"seed $seed (sizes $sizes): walk diverged" +
        s"\ngot  $got\nwant $want")
      // the kept slice IS the serving probe set
      val served = Similarity.annBudgetProbes(qs, idx, Sub)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(served == want.filter(_._6).map(w => (w._1, w._3)).toSet,
        s"seed $seed: kept slice diverged")
      // shared-core consistency on one request: budgeted == plain over
      // the index restricted to that request's kept cells
      val (qid0, near0, far0) = reqs.head
      val kept0 = want.filter(w => w._1 == qid0 && w._6).map(_._3)
      val q0 = Seq((qid0, "q", axisVec(near0, far0)))
        .toDF("vec_id", "label", "embedding")
      val pruned = idx.copy(codes =
        idx.codes.filter(col("cell").isin(kept0: _*)))
      val budgeted = Similarity.ivfPqServeBudgeted(q0, c, idx, Sub, 3)
        .collect().map(_.toSeq).toSeq
      val reference = Similarity.ivfPqServe(q0, c, pruned, Sub, 3)
        .collect().map(_.toSeq).toSeq
      assert(budgeted == reference, s"seed $seed: serve diverged")
    }
  }
}
