package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized properties of the span-near family against an
  * INDEPENDENT reference implementation (a per-document dynamic
  * program, written directly from the Lucene ordered-SpanNearQuery
  * semantics): on arbitrary small corpora over a tiny alphabet —
  * duplicate-heavy, overlap-heavy, the regime where chain multiplicity
  * is hardest — the per-row fold, the banded join form, and the batch
  * server must all agree with the DP and with each other. Fixed seeds
  * (the ValidationPropertySpec convention).
  */
class SpanNearPropertySpec extends AnyFunSuite {

  /** Reference count of ordered chains p1 < ... < pk with every
    * consecutive gap in (0, gap]: dp(j)(i) = chains of terms[0..j]
    * ending at i.
    */
  private def refChains(toks: Seq[String], terms: Seq[String], gap: Int): Long = {
    val n = toks.length
    if (n == 0) return 0L
    val dp = Array.ofDim[Long](terms.length, n)
    for (i <- 0 until n; j <- terms.indices if toks(i) == terms(j)) {
      if (j == 0) dp(j)(i) = 1L
      else {
        var s = 0L
        var p = math.max(0, i - gap)
        while (p < i) { s += dp(j - 1)(p); p += 1 }
        dp(j)(i) = s
      }
    }
    (0 until n).map(dp(terms.length - 1)(_)).sum
  }

  private val alphabet = Seq("a", "b", "c", "d")

  private def sample(seed: Long): (Seq[Seq[String]], Seq[String], Int) = {
    val g = for {
      nDocs <- Gen.chooseNum(3, 12)
      docs <- Gen.listOfN(nDocs,
        Gen.chooseNum(1, 25).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf(alphabet))))
      k <- Gen.chooseNum(2, 4)
      terms <- Gen.listOfN(k, Gen.oneOf(alphabet)) // duplicates allowed
      gap <- Gen.chooseNum(1, 5)
    } yield (docs.map(_.toSeq), terms.toSeq, gap)
    g(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator produced no sample"))
  }

  test("per-row fold and banded join form both equal the reference DP on random duplicate-heavy corpora") {
    val s = TestSpark.spark
    import s.implicits._
    (301L to 308L).foreach { seed =>
      val (docs, terms, gap) = sample(seed)
      val expected = docs.zipWithIndex.map { case (toks, i) =>
        i.toLong -> refChains(toks, terms, gap)
      }.toMap
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val viaExpr = df.select(col("doc_id"),
          TextOps.spanNearMatchExpr(col("text"), terms, gap).as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaExpr == expected,
        s"seed $seed terms=$terms gap=$gap: fold $viaExpr vs DP $expected")
      val viaJoin = TextOps.spanNearSearch(df, terms, gap).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaJoin == expected.filter(_._2 > 0L),
        s"seed $seed terms=$terms gap=$gap: join $viaJoin vs DP")
    }
  }

  test("batch server equals per-query chains on random mixed-k/gap request batches") {
    val s = TestSpark.spark
    import s.implicits._
    (401L to 404L).foreach { seed =>
      val (docs, _, _) = sample(seed)
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val idx = TextOps.buildPositionalIndex(df)
      // a mixed batch drawn from the same generator family (fresh
      // sub-seeds), plus one malformed row
      val reqs = (1L to 4L).map { q =>
        val (_, terms, gap) = sample(seed * 100 + q)
        (q, terms, gap)
      } :+ ((9L, Seq("a"), 3))
      val got = TextOps.spanNearServeBatch(
          reqs.toDF("query_id", "terms", "gap"), idx)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
      reqs.foreach { case (qid, terms, gap) =>
        val expected =
          if (terms.length < 2) Map.empty[Long, Long]
          else docs.zipWithIndex.collect {
            case (toks, i) if refChains(toks, terms, gap) > 0 =>
              i.toLong -> refChains(toks, terms, gap)
          }.toMap
        val mine = got.collect { case ((q, d), n) if q == qid => d -> n }
        assert(mine == expected,
          s"seed $seed query $qid ($terms, $gap): $mine vs $expected")
      }
      assert(TextOps.spanNearServeRejects(
          reqs.toDF("query_id", "terms", "gap"))
        .collect().map(_.getLong(0)).toSeq == Seq(9L))
    }
  }

  /** Reference for the UNORDERED family: window starts [i, i+win)
    * containing every distinct term — a direct scan, no cleverness.
    */
  private def refWindows(toks: Seq[String], terms: Seq[String], win: Int): Long = {
    val ts = terms.distinct
    toks.indices.count { i =>
      val seen = toks.slice(i, i + win).toSet
      ts.forall(seen.contains)
    }.toLong
  }

  test("co-occurrence fold, coverage join form, and batch server all equal the reference scan") {
    val s = TestSpark.spark
    import s.implicits._
    (501L to 506L).foreach { seed =>
      val (docs, terms, win) = sample(seed)
      val ts = terms.distinct
      if (ts.length >= 2) {
        val expected = docs.zipWithIndex.map { case (toks, i) =>
          i.toLong -> refWindows(toks, ts, win)
        }.toMap
        val df = docs.zipWithIndex
          .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
          .toDF("doc_id", "text")
        val viaExpr = df.select(col("doc_id"),
            TextOps.coocMatchExpr(col("text"), terms, win).as("m"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaExpr == expected,
          s"seed $seed terms=$terms win=$win: fold $viaExpr vs scan $expected")
        val viaJoin = TextOps.coocSearch(df, terms, win).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaJoin == expected.filter(_._2 > 0L),
          s"seed $seed terms=$terms win=$win: coverage $viaJoin vs scan")
        val served = TextOps.coocServeBatch(
            Seq((1L, terms, win)).toDF("query_id", "terms", "win"),
            TextOps.buildPositionalIndex(df))
          .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
        assert(served == expected.filter(_._2 > 0L),
          s"seed $seed terms=$terms win=$win: served $served vs scan")
      }
    }
  }
}
