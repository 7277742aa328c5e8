package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized properties of the erasure sweep's re-derivations — the
  * equalities that must hold on ANY corpus, not just the fixtures:
  * count-reversible deletion equals the survivor build (substr index),
  * the affected-day rebuild equals the survivor sketch (KMV), and the
  * BM25 list-delete serves exactly what a survivor build serves.
  * Generators run on fixed seeds (the ValidationPropertySpec
  * convention).
  */
class ForgetPropertySpec extends AnyFunSuite {

  private val word = Gen.oneOf("the", "cat", "sat", "mat", "dog", "ran",
    "alpha", "beta", "gamma", "delta", "zip", "quo")
  private val doc = Gen.chooseNum(8, 30).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.chooseNum(4, 14)
    .flatMap(n => Gen.listOfN(n, doc))

  private def docs(seed: Long): org.apache.spark.sql.DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    corpus(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail("generator produced no sample"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("substr df-decrement equals the survivor build on random corpora") {
    val s = TestSpark.spark
    (31L to 36L).foreach { seed =>
      val d = docs(seed)
      val full = java.nio.file.Files.createTempDirectory("graft-fprop-f").toString
      val surv = java.nio.file.Files.createTempDirectory("graft-fprop-s").toString
      Dedup.buildAndSaveSubstrIndex(d, full)
      Dedup.buildAndSaveSubstrIndex(d.filter(!Forget.DocDeleted), surv)
      val dec = Dedup.deleteFromSubstrIndex(
          Dedup.loadSubstrIndex(s, full), d.filter(Forget.DocDeleted))
        .orderBy(col("g")).collect().map(_.toSeq).toSeq
      val fresh = Dedup.loadSubstrIndex(s, surv)
        .orderBy(col("g")).collect().map(_.toSeq).toSeq
      assert(dec == fresh, s"seed $seed")
    }
  }

  test("bm25 list-delete serves exactly the survivor build on random corpora") {
    val s = TestSpark.spark
    import s.implicits._
    (41L to 44L).foreach { seed =>
      val d = docs(seed)
      val idx = TextOps.buildBm25Index(d)
      val deletedIds = d.filter(Forget.DocDeleted).select(col("doc_id"))
      val q = Seq("the", "alpha", "zip")
      val viaDelete = TextOps.bm25FromIndex(
          TextOps.deleteListFromBm25Index(idx, deletedIds), q)
        .collect().map(_.toSeq).toSeq
      val viaRebuild = TextOps.bm25FromIndex(
          TextOps.buildBm25Index(d.filter(!Forget.DocDeleted)), q)
        .collect().map(_.toSeq).toSeq
      assert(viaDelete == viaRebuild, s"seed $seed")
    }
  }

  test("lm count-decrement scores exactly like the survivor train on random corpora") {
    val s = TestSpark.spark
    (61L to 64L).foreach { seed =>
      val d = docs(seed)
      val survivors = d.filter(!Forget.DocDeleted)
      val full = java.nio.file.Files.createTempDirectory("graft-fprop-lmf").toString
      val fresh = java.nio.file.Files.createTempDirectory("graft-fprop-lms").toString
      TextOps.trainAndSaveSurprisalModel(d, full)
      TextOps.trainAndSaveSurprisalModel(survivors, fresh)
      val pruned = TextOps.deleteFromSurprisalModel(
        TextOps.loadSurprisalModel(s, full), d.filter(Forget.DocDeleted), survivors)
      val freshM = TextOps.loadSurprisalModel(s, fresh)
      assert(pruned.counts.orderBy(col("t")).collect().map(_.toSeq).toSeq
        == freshM.counts.orderBy(col("t")).collect().map(_.toSeq).toSeq,
        s"seed $seed counts")
      assert(pruned.totals.collect().map(_.toSeq).toSeq
        == freshM.totals.collect().map(_.toSeq).toSeq, s"seed $seed totals")
      // scoring under the pruned model is byte-identical to the
      // survivor-trained model's — the erased text no longer influences
      // any downstream verdict
      val a = TextOps.unigramSurprisalFromSaved(survivors, pruned)
        .collect().map(_.toSeq).toSeq
      val b = TextOps.unigramSurprisalFromSaved(survivors, freshM)
        .collect().map(_.toSeq).toSeq
      assert(a == b, s"seed $seed scoring")
    }
  }

  test("kmv affected-day rebuild equals the survivor sketch on random event tables") {
    val s = TestSpark.spark
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val eventsGen = for {
      n <- Gen.chooseNum(20, 120)
      rows <- Gen.listOfN(n, for {
        day <- Gen.chooseNum(0, 6)
        user <- Gen.chooseNum(1L, 40L)
        hour <- Gen.chooseNum(0, 23)
      } yield (day, user, hour))
    } yield rows
    (51L to 55L).foreach { seed =>
      val rows = eventsGen(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail("generator produced no sample"))
        .zipWithIndex.map { case ((day, user, hour), i) =>
          (i.toLong, new java.sql.Timestamp(
            base + day * 86400000L + hour * 3600000L), user, "click", 1.0, "{}")
        }
      val e = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val saved = Sketches.dailyKmvSketchRows(e)
      val after = Forget.pruneKmvSketch(saved, e)
        .orderBy(col("day"), col("h")).collect().map(_.toSeq).toSeq
      val fresh = Sketches.dailyKmvSketchRows(e.filter(!Forget.UserDeleted))
        .orderBy(col("day"), col("h")).collect().map(_.toSeq).toSeq
      assert(after == fresh, s"seed $seed")
    }
  }
}
