package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the systematic PPS sampler ([[Curation.ppsSample]]):
  * the invariants Madow's method guarantees BY CONSTRUCTION must hold on
  * arbitrary weight profiles, not just the fixtures —
  *  - the sample size is exact: Σ n_picks = total_weight div stride
  *    (the guaranteed-size property that distinguishes systematic PPS
  *    from Bernoulli sampling);
  *  - multiplicity is bounded by weight: a doc spanning w units of the
  *    line can contain at most w div stride + 1 boundaries;
  *  - every multiplicity is positive on emitted rows, and every doc with
  *    w ≥ stride is GUARANTEED a pick (its interval must contain a
  *    boundary);
  *  - the selection is a pure function of the weight table (re-running
  *    permutes nothing).
  */
class CurationPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).getOrElse(fail("no sample"))

  // weight profiles mixing minnows and whales, including ties and 1s
  private val genWeights: Gen[List[Long]] = for {
    n <- Gen.chooseNum(12, 120)
    ws <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.chooseNum(1L, 50L),
      2 -> Gen.chooseNum(500L, 5000L)))
  } yield ws

  test("systematic PPS invariants hold on arbitrary weight profiles") {
    val spark = TestSpark.spark
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val ws = sample(genWeights, seed)
      val docs = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "n_chars")
      val total = ws.sum
      val target = math.max(ws.length / Curation.PpsTargetDiv, 1)
      val stride = math.max(total / target, 1L)
      val got = Curation.ppsSample(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      assert(got.values.map(_._2.toLong).sum == total / stride,
        s"seed=$seed: sample size must be exactly total div stride " +
          s"(${total / stride}), got ${got.values.map(_._2).sum}")
      got.foreach { case (id, (w, picks)) =>
        assert(picks >= 1, s"seed=$seed doc $id emitted with zero picks")
        assert(picks <= w / stride + 1,
          s"seed=$seed doc $id (w=$w) exceeded its boundary bound: $picks")
      }
      // a whale spanning >= stride cannot be missed
      ws.zipWithIndex.foreach { case (w, i) =>
        if (w >= stride)
          assert(got.contains(i.toLong),
            s"seed=$seed: doc $i with w=$w >= stride=$stride was skipped")
      }
      val again = Curation.ppsSample(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      assert(got == again, s"seed=$seed: selection must be deterministic")
    }
  }
}
