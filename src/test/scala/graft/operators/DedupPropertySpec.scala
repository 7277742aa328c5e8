package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized properties of the dedup primitives — the invariants that
  * must hold on ANY corpus, not just the crafted fixtures: the per-row
  * SimHash fold equals the batch aggregate, byte-band candidate
  * generation is EXACT within the Hamming radius (the Manku pigeonhole),
  * and shard substring coverage is bounded by the doc's own length.
  * Generators run on fixed seeds (no scalatestplus bridge in the offline
  * cache — the ValidationPropertySpec convention).
  */
class DedupPropertySpec extends AnyFunSuite {

  private val word = Gen.oneOf("the", "cat", "sat", "mat", "dog", "ran",
    "alpha", "beta", "gamma", "delta", "zip", "quo")
  private val doc = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.chooseNum(2, 12)
    .flatMap(n => Gen.listOfN(n, doc))

  private def sample(seed: Long): List[String] =
    corpus(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator produced no sample"))

  test("per-row simhash fold == batch simhash aggregate on random corpora") {
    val s = TestSpark.spark
    import s.implicits._
    (1L to 8L).foreach { seed =>
      val d = sample(seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val perRow = d
        .withColumn("w", graft.functions.Portable.tokens(col("text")))
        .withColumn("th", transform(col("w"),
          t => graft.functions.Portable.hash32(t)))
        .select(col("doc_id"), Dedup.simhashExpr(col("th")).as("simhash"))
        .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      val batch = Dedup.simhash(d).collect().map(_.toSeq).toSeq
      assert(perRow == batch, s"seed $seed")
    }
  }

  test("simhash banding finds EVERY pair within the Hamming radius (pigeonhole, any corpus)") {
    val s = TestSpark.spark
    import s.implicits._
    (11L to 16L).foreach { seed =>
      val d = sample(seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sims = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1))
      val brute = (for {
        (ia, sa) <- sims; (ib, sb) <- sims if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= Dedup.HammingMax
      } yield (ia, ib, h)).toSet
      val banded = Dedup.simhashPairs(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute,
        s"seed $seed: missing=${brute -- banded} extra=${banded -- brute}")
    }
  }

  test("shard substr coverage is bounded by the doc's own token count; fractions stay in [0,1]") {
    val s = TestSpark.spark
    import s.implicits._
    (21L to 23L).foreach { seed =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-substr").toString
      val old = sample(seed).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      Dedup.buildAndSaveSubstrIndex(old, dir)
      val shard = sample(seed + 100).zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
      val r = Dedup.shardSubstrSpans(shard, Dedup.loadSubstrIndex(s, dir)).collect()
      r.foreach { row =>
        val (n, dup, frac) = (row.getLong(1), row.getLong(2), row.getDouble(3))
        assert(dup >= 0L && dup <= n, s"seed $seed coverage bounded: $row")
        assert(frac >= 0.0 && frac <= 1.0, s"seed $seed fraction in [0,1]: $row")
      }
    }
  }
}
