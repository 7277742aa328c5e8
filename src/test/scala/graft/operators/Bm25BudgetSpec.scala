package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The serve-time cost budget (t59): [[TextOps.bm25BudgetTerms]] keeps
  * each request's terms rarest-first while the cumulative df stays
  * within Bm25BudgetFactor × corpus size, and
  * [[TextOps.bm25ServeBatchBudgeted]] scores EXACTLY the kept set
  * through the shared core — pinned here on a corpus with hand-built
  * document frequencies, so every keep/drop decision is arithmetic the
  * test states, not fixture coincidence.
  */
class Bm25BudgetSpec extends AnyFunSuite {

  // n = 6 docs. dfs: "rare" 1, "mid" 3, "hot" 5, "stop" 6. Budget = 6.
  private def corpus(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(
      (1L, "stop hot mid rare"),
      (2L, "stop hot mid extra"),
      (3L, "stop hot mid extra"),
      (4L, "stop hot extra pad"),
      (5L, "stop hot extra pad"),
      (6L, "stop filler pad pad")).toDF("doc_id", "text")
  }

  test("budget keeps rarest-first under the df ceiling; the rarest term always survives") {
    val s = TestSpark.spark
    import s.implicits._
    val idx = TextOps.buildBm25Index(corpus(s))
    val reqs = Seq(
      (1L, Seq("rare", "hot")),          // 1 + 5 = 6 <= 6: both kept
      (2L, Seq("rare", "mid", "hot")),   // 1, 4, 9: hot dropped
      (3L, Seq("stop", "hot")),          // 5 <= 6, +6 = 11: stop dropped
      (4L, Seq("stop")),                 // 6 <= 6: a lone max-df term survives
      (5L, Seq("ghost", "stop"))         // ghost df 0 free; 0+6 = 6: both kept
    ).toDF("query_id", "terms")
    val kept = TextOps.bm25BudgetTerms(reqs, idx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept == Set(
      (1L, "rare"), (1L, "hot"),
      (2L, "rare"), (2L, "mid"),
      (3L, "hot"),
      (4L, "stop"),
      (5L, "ghost"), (5L, "stop")))
  }

  test("budgeted serve equals the plain serve over hand-pruned requests (shared-core consistency)") {
    val s = TestSpark.spark
    import s.implicits._
    val idx = TextOps.buildBm25Index(corpus(s))
    val raw = Seq((1L, Seq("rare", "mid", "hot")), (2L, Seq("stop", "hot")))
      .toDF("query_id", "terms")
    val pruned = Seq((1L, Seq("rare", "mid")), (2L, Seq("hot")))
      .toDF("query_id", "terms")
    val got = TextOps.bm25ServeBatchBudgeted(raw, idx)
      .collect().map(_.toSeq).toSeq
    val want = TextOps.bm25ServeBatch(pruned, idx)
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("ties on df break lexicographically; malformed requests stay on the rejects channel") {
    val s = TestSpark.spark
    import s.implicits._
    val idx = TextOps.buildBm25Index(corpus(s))
    // "hot" and a same-df synthetic: build a corpus where two terms tie
    val tied = Seq((1L, "aa bb x"), (2L, "aa bb y"), (3L, "filler z"))
      .toDF("doc_id", "text")
    val tIdx = TextOps.buildBm25Index(tied)
    // n = 3, budget 3; aa df 2, bb df 2: cum 2, 4 -> keeps "aa" only
    val keptTie = TextOps.bm25BudgetTerms(
      Seq((1L, Seq("bb", "aa"))).toDF("query_id", "terms"), tIdx)
      .collect().map(_.getString(1)).toSeq
    assert(keptTie == Seq("aa"))
    // null-element and empty requests reject exactly as the plain path
    val bad = Seq((1L, Seq("rare", null)), (2L, Seq.empty[String]),
      (3L, Seq("rare"))).toDF("query_id", "terms")
    assert(TextOps.bm25ServeRejects(bad).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L))
    assert(TextOps.bm25ServeBatchBudgeted(bad, idx)
      .select(col("query_id")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("the cost audit explains every request and its kept slice IS the served term set") {
    val s = TestSpark.spark
    import s.implicits._
    val idx = TextOps.buildBm25Index(corpus(s))
    val reqs = Seq(
      (1L, Seq("rare", "mid", "hot")),
      (2L, Seq("ghost", "stop"))).toDF("query_id", "terms")
    val audit = TextOps.bm25RequestCosts(reqs, idx)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // one row per (request, distinct term); cum is the running df total
    // in (df, t) order; kept flips exactly where the ceiling (n = 6) is
    assert(audit.toSeq == Seq(
      (1L, "rare", 1L, 1L, true),
      (1L, "mid", 3L, 4L, true),
      (1L, "hot", 5L, 9L, false),
      (2L, "ghost", 0L, 0L, true),
      (2L, "stop", 6L, 6L, true)))
    val keptFromAudit = audit.filter(_._5).map(a => (a._1, a._2)).toSet
    val served = TextOps.bm25BudgetTerms(reqs, idx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(keptFromAudit == served,
      "the audit's kept slice must equal the budgeted serve's term set")
  }

  test("budget recall report: 1.0 exactly when nothing drops, measured overlap when a term drops") {
    val s = TestSpark.spark
    import s.implicits._
    val idx = TextOps.buildBm25Index(corpus(s))
    val reqs = Seq(
      (1L, Seq("rare", "hot")),        // 1 + 5 = 6 <= 6: nothing drops
      (2L, Seq("rare", "mid", "hot"))  // hot (df 5) drops at cum 9
    ).toDF("query_id", "terms")
    val rep = TextOps.bm25BudgetRecall(reqs, idx, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    // request 1 keeps everything -> shared core makes budgeted == plain,
    // recall MUST be exactly 1.0 (the honesty identity)
    assert(rep.find(_._1 == 1L).get == ((1L, 2L, 0L, 6L, 6L, 1.0)))
    // request 2 drops "hot": the report's recall equals the
    // independently-computed top-k overlap
    val one = Seq((2L, Seq("rare", "mid", "hot"))).toDF("query_id", "terms")
    val plain = TextOps.bm25ServeBatch(one, idx, 3)
      .collect().map(_.getLong(2)).toSet
    val bud = TextOps.bm25ServeBatchBudgeted(one, idx, 3)
      .collect().map(_.getLong(2)).toSet
    val want = math.round(bud.intersect(plain).size.toDouble / 3 * 10000) / 10000.0
    val r2 = rep.find(_._1 == 2L).get
    assert((r2._2, r2._3, r2._4, r2._5) == ((2L, 1L, 4L, 9L)), s"volumes: $r2")
    assert(r2._6 == want, s"recall ${r2._6} != independent $want")
  }

  test("empty batch and empty index both serve empty without error") {
    val s = TestSpark.spark
    import s.implicits._
    val idx = TextOps.buildBm25Index(corpus(s))
    val none = Seq.empty[(Long, Seq[String])].toDF("query_id", "terms")
    assert(TextOps.bm25ServeBatchBudgeted(none, idx).count() == 0)
    val emptyIdx = TextOps.buildBm25Index(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(TextOps.bm25ServeBatchBudgeted(
      Seq((1L, Seq("rare"))).toDF("query_id", "terms"), emptyIdx).count() == 0)
  }
}
