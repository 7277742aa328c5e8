package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized property of the t59 budget walk: on ANY corpus and ANY
  * request batch, [[TextOps.bm25BudgetTerms]] equals an INDEPENDENT
  * Scala reference of the greedy rule (sort the request's distinct
  * terms by (df, t), keep while the running df total stays within
  * Bm25BudgetFactor × corpus size), and the budgeted serve equals the
  * plain serve over exactly that kept set. Generators cover duplicate
  * request terms, out-of-vocabulary terms (df 0), single-term and
  * all-hot requests, on corpora skewed enough that some terms are in
  * nearly every document. Fixed seeds (the ValidationPropertySpec
  * convention).
  */
class Bm25BudgetPropertySpec extends AnyFunSuite {

  // small alphabet -> genuinely hot terms; docs of 1-8 tokens
  private def world(seed: Long): (Seq[(Long, String)], Seq[(Long, Seq[String])]) = {
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val g = for {
      nDocs <- Gen.chooseNum(1, 30)
      docs <- Gen.listOfN(nDocs,
        Gen.chooseNum(1, 8).flatMap(l => Gen.listOfN(l, Gen.oneOf(vocab))))
      nReq <- Gen.chooseNum(1, 6)
      reqs <- Gen.listOfN(nReq, Gen.chooseNum(1, 5).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf(vocab :+ "zz_absent"))))
    } yield (
      docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) },
      reqs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) })
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator produced no sample"))
  }

  // the independent reference: plain Scala over the same token rule
  private def referenceKept(docs: Seq[(Long, String)],
                            reqs: Seq[(Long, Seq[String])]): Set[(Long, String)] = {
    val df = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(_ -> id)
    }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct.size.toLong }
    val budget = docs.size.toLong * TextOps.Bm25BudgetFactor
    reqs.flatMap { case (qid, ts) =>
      val priced = ts.distinct.map(t => (t, df.getOrElse(t, 0L)))
        .sortBy { case (t, d) => (d, t) }
      priced.scanLeft(("", 0L, 0L)) { case ((_, _, cum), (t, d)) =>
        (t, d, cum + d)
      }.drop(1).takeWhile(_._3 <= budget).map(x => (qid, x._1))
    }.toSet
  }

  test("budget keep-set equals the independent greedy reference on random worlds") {
    val s = TestSpark.spark
    import s.implicits._
    (301L to 310L).foreach { seed =>
      val (docs, reqs) = world(seed)
      val idx = TextOps.buildBm25Index(docs.toDF("doc_id", "text"))
      val reqDf = reqs.toDF("query_id", "terms")
      val got = TextOps.bm25BudgetTerms(reqDf, idx)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = referenceKept(docs, reqs)
      assert(got == want, s"seed $seed: kept diverged\ngot  $got\nwant $want")
      // the serve over the kept set IS the budgeted serve
      val keptArrays = want.groupBy(_._1).toSeq
        .map { case (q, ts) => (q, ts.map(_._2).toSeq.sorted) }
      val viaPruned = TextOps.bm25ServeBatch(
        keptArrays.toDF("query_id", "terms"), idx)
        .collect().map(_.toSeq).toSeq
      val budgeted = TextOps.bm25ServeBatchBudgeted(reqDf, idx)
        .collect().map(_.toSeq).toSeq
      assert(budgeted == viaPruned, s"seed $seed: serve diverged")
    }
  }
}
