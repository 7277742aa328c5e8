package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Empty-input robustness: a pipeline stage fed an empty shard (a crawl
  * day with no documents, a filter that drained everything) must return
  * an empty/degenerate frame, NEVER throw — the failure mode that takes
  * down a scheduled 100 TB job at 3am over one empty partition. Trained
  * operators that REQUIRE data (Whiten's Cholesky, the IRLS classifier)
  * are exempt: their loud require IS the documented contract.
  */
class EmptyInputSpec extends AnyFunSuite {

  private def emptyDocs: DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def emptyEvents: DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("document operators survive an empty corpus") {
    val d = emptyDocs
    assert(TextOps.quality(d, col("text")).count() == 0)
    assert(TextOps.langId(d, col("text")).count() == 0)
    assert(TextOps.redact(d).count() == 0)
    assert(TextOps.repetitionCoverage(d).count() == 0)
    assert(TextOps.unigramSurprisal(d).count() == 0)
    assert(TextOps.stupidBackoffSurprisal(d).count() == 0)
    assert(TextOps.topNgrams(d).count() == 0)
    assert(TextOps.langConfusion(d).count() == 0)
    assert(Dedup.exact(d).count() == 0)
    assert(Dedup.lshPairs(d).count() == 0)
    assert(Dedup.sourceOverlap(d).count() == 0)
    assert(Dedup.lshTuningReport(d).collect()
      .forall(r => r.getLong(2) == 0L), "empty corpus must price zero candidates")
    assert(Curation.ppsSample(d).count() == 0)
    assert(Curation.perSourceCap(d).count() == 0)
    assert(Curation.packSequences(d).count() == 0)
    assert(Curation.curatedManifest(d).count() == 0)
  }

  test("event operators survive an empty stream-table") {
    val e = emptyEvents
    assert(EventWindows.tumblingHourly(e).count() == 0)
    assert(EventWindows.hopping(e).count() == 0)
    assert(EventWindows.ohlc(e).count() == 0)
    assert(EventWindows.heartbeatGaps(e).count() == 0)
    assert(EventWindows.sessionize(e).count() == 0)
    assert(AsOf.clickAttribution(e).count() == 0)
  }

  test("round-11 additions survive empty inputs") {
    val s = TestSpark.spark
    import s.implicits._
    val d = emptyDocs
    val e = emptyEvents
    val emptyClusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster")
    assert(Curation.softDedupWeights(d, emptyClusters).count() == 0)
    assert(Curation.ppsSoftDedup(d, emptyClusters).count() == 0)
    assert(Curation.evalQuotas(d).count() == 0)
    assert(Dedup.containmentPairs(d).count() == 0)
    assert(Dedup.ppJoinPairs(d).count() == 0)
    // the corpus row (-1) is a global aggregate: it emits even with zero
    // pairs, matching the oracle's always-present UNION ALL row
    val coh = Dedup.clusterCoherence(d, emptyClusters).collect()
    assert(coh.length == 1 && coh(0).getLong(0) == -1L && coh(0).getLong(1) == 0L)
    assert(Graph.textRank(d).count() == 0)
    assert(Unigram.unigramVocab(d).count() == 0)
    assert(EventWindows.kmSurvival(e).count() == 0)
    assert(EventWindows.seasonalDecompose(e).count() == 0)
    assert(Graph.markovAttribution(e).count() == 0)
    assert(Graph.topPaths(e).count() == 0)
    val el = Seq.empty[(Long, Long)].toDF("l_partkey", "l_suppkey")
    assert(Layout.zorderAudit(el).count() == 0)
    val el2 = Seq.empty[(Long, Long, Long)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    // an empty fact still yields the (empty) advisor table, not a throw
    assert(Skew.skewReport(el2,
      Seq("l_orderkey", "l_partkey", "l_suppkey")).count() == 0)
  }

  test("round-12 additions survive empty inputs") {
    val s = TestSpark.spark
    import s.implicits._
    val d = emptyDocs
    val e = emptyEvents
    // empty erasure surfaces: an index built from nothing prunes to
    // nothing; an empty delete-list changes nothing
    val emptyIdxGrams = Seq.empty[(Long, Long)].toDF("g", "df")
    assert(Dedup.deleteFromSubstrIndex(emptyIdxGrams, d).count() == 0)
    val emptySketch = Seq.empty[(String, Long)].toDF("day", "h")
    assert(graft.operators.Forget.pruneKmvSketch(emptySketch, e).count() == 0)
    val emptyFp = Seq.empty[(Long, Long, Int)].toDF("asset_id", "ahash", "nbits")
    assert(graft.operators.Forget.pruneMediaFingerprints(emptyFp).count() == 0)
    // serving an empty request batch from a real index emits nothing
    val docsReal = graft.Tables.documents(s, "/root/testdata/sf0.001").limit(50)
    val bm = TextOps.buildBm25Index(docsReal)
    val emptyQ = Seq.empty[(Long, Seq[String])].toDF("query_id", "terms")
    assert(TextOps.bm25ServeBatch(emptyQ, bm).count() == 0)
    // deleting EVERYTHING from an index leaves a servable empty index
    val allGone = TextOps.deleteFromBm25Index(bm, lit(true))
    assert(TextOps.bm25FromIndex(allGone).count() == 0)
  }

  test("round-14 additions survive empty inputs") {
    val s = TestSpark.spark
    import s.implicits._
    val d = emptyDocs
    // an index built from an empty corpus serves (empty) results for
    // both positional query classes, single and batch form
    val emptyIdx = TextOps.buildPositionalIndex(d)
    assert(TextOps.phraseFromIndex(emptyIdx).count() == 0)
    assert(TextOps.proximityFromIndex(emptyIdx, "a", "b").count() == 0)
    assert(TextOps.phraseSearch(d).count() == 0)
    assert(TextOps.proximitySearch(d, "a", "b").count() == 0)
    // empty request batches against a real index emit nothing
    val docsReal = graft.Tables.documents(s, "/root/testdata/sf0.001").limit(50)
    val idx = TextOps.buildPositionalIndex(docsReal)
    assert(TextOps.phraseServeBatch(
      Seq.empty[(Long, Seq[String])].toDF("query_id", "phrase"), idx)
      .count() == 0)
    assert(TextOps.proximityServeBatch(
      Seq.empty[(Long, String, String, Int)].toDF("query_id", "a", "b", "slop"),
      idx).count() == 0)
    // deleting everything leaves a servable empty index
    assert(TextOps.phraseFromIndex(
      TextOps.deleteFromPositionalIndex(idx, lit(true))).count() == 0)
    // the distributed rank on an empty frame is an empty frame
    assert(Ranking.withNtile(
      Seq.empty[(Long, Long)].toDF("v", "id"), "b", 5,
      Seq(col("v"), col("id"))).count() == 0)
    // per-row gates on empty/short text score zero, never throw
    val scored = Seq((1L, ""), (2L, "one")).toDF("doc_id", "text")
      .select(TextOps.phraseMatchExpr(col("text"), Seq("a", "b")).as("p"),
        TextOps.proximityMatchExpr(col("text"), "a", "b").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(scored.forall(_ == ((0L, 0L))), scored.toSeq.toString)
  }

  test("round-15 additions survive empty inputs") {
    val s = TestSpark.spark
    import s.implicits._
    val docsReal = graft.Tables.documents(s, "/root/testdata/sf0.001").limit(50)
    val idx = TextOps.buildPositionalIndex(docsReal)
    // an empty span-near batch against a real index emits nothing, and
    // an all-malformed batch serves nothing but rejects everything
    val emptyB = Seq.empty[(Long, Seq[String], Int)]
      .toDF("query_id", "terms", "gap")
    assert(TextOps.spanNearServeBatch(emptyB, idx).count() == 0)
    assert(TextOps.spanNearServeRejects(emptyB).count() == 0)
    val badB = Seq((1L, Seq("a"), 8), (2L, Seq("a", "b"), 0))
      .toDF("query_id", "terms", "gap")
    assert(TextOps.spanNearServeBatch(badB, idx).count() == 0)
    assert(TextOps.spanNearServeRejects(badB).count() == 2)
    // span-near against an empty index: single and batch forms
    val emptyIdx = TextOps.buildPositionalIndex(emptyDocs)
    assert(TextOps.spanNearFromIndex(emptyIdx, Seq("a", "b"), 3).count() == 0)
    assert(TextOps.spanNearServeBatch(
      Seq((1L, Seq("a", "b"), 3)).toDF("query_id", "terms", "gap"),
      emptyIdx).count() == 0)
    // the per-row chain gate on empty/short text scores zero
    val scored = Seq((1L, ""), (2L, "a b")).toDF("doc_id", "text")
      .select(TextOps.spanNearMatchExpr(col("text"), Seq("a", "b", "c"), 3))
      .collect().map(_.getLong(0))
    assert(scored.forall(_ == 0L), scored.toSeq.toString)
    // the term-cost table over an empty corpus is an empty report
    assert(TextOps.termCostDeciles(emptyIdx, emptyDocs).count() == 0)
    // the stop-candidate list over an empty corpus is empty
    assert(TextOps.servingStopCandidates(emptyIdx, emptyDocs).count() == 0)
    // co-occurrence: empty/malformed batches and empty indexes
    assert(TextOps.coocFromIndex(emptyIdx, Seq("a", "b"), 3).count() == 0)
    assert(TextOps.coocServeBatch(
      Seq.empty[(Long, Seq[String], Int)].toDF("query_id", "terms", "win"),
      idx).count() == 0)
    val badCooc = Seq((1L, Seq("a"), 3), (2L, Seq("a", "b"), 0))
      .toDF("query_id", "terms", "win")
    assert(TextOps.coocServeBatch(badCooc, idx).count() == 0)
    assert(TextOps.coocServeRejects(badCooc).count() == 2)
    val coocScore = Seq((1L, ""), (2L, "a")).toDF("doc_id", "text")
      .select(TextOps.coocMatchExpr(col("text"), Seq("a", "b"), 3))
      .collect().map(_.getLong(0))
    assert(coocScore.forall(_ == 0L), coocScore.toSeq.toString)
  }

  test("round-17 additions survive empty inputs") {
    val s = TestSpark.spark
    import s.implicits._
    // the stop-leg pricer: an empty request batch, an empty stop list,
    // and a null/null-element terms array all yield zero legs (the
    // malformed shapes stay on the rejects channel, which judges shape)
    val stop = Seq(("the", 13L)).toDF("t", "occ")
    val noReqs = Seq.empty[(Long, Seq[String])].toDF("query_id", "terms")
    assert(TextOps.positionalStopLegs(noReqs, stop).count() == 0)
    val reqs = Seq((1L, Seq("the", "join")), (2L, Seq("join")))
      .toDF("query_id", "terms")
    val noStop = Seq.empty[(String, Long)].toDF("t", "occ")
    assert(TextOps.positionalStopLegs(reqs, noStop).count() == 0)
    val badReqs = Seq((1L, null: Seq[String]), (2L, Seq("the", null)))
      .toDF("query_id", "terms")
    assert(TextOps.positionalStopLegs(badReqs, stop).count() == 0)
  }

  test("a NULL ELEMENT inside a request's term array is rejected, not silently zero-served") {
    // the round-15 advisory: a null term never equi-joins a posting, so
    // before the element check such a request served zero rows while
    // being absent from *ServeRejects — indistinguishable from a real
    // zero-match query. Each batch pairs the malformed request with a
    // well-formed sibling to pin serve + rejects as a true partition.
    val s = TestSpark.spark
    import s.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val idx = TextOps.buildPositionalIndex(docs)
    def rejected(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet

    val ph = Seq((1L, Seq("a", null)), (2L, Seq("a", "b")))
      .toDF("query_id", "phrase")
    assert(rejected(TextOps.phraseServeRejects(ph)) == Set(1L))
    assert(rejected(TextOps.phraseServeBatch(ph, idx)
      .select(col("query_id"))) == Set(2L))

    val sn = Seq((1L, Seq("a", null, "c"), 2), (2L, Seq("a", "b"), 2))
      .toDF("query_id", "terms", "gap")
    assert(rejected(TextOps.spanNearServeRejects(sn)) == Set(1L))
    assert(rejected(TextOps.spanNearServeBatch(sn, idx)
      .select(col("query_id"))) == Set(2L))

    val cc = Seq((1L, Seq("a", null, "b"), 4), (2L, Seq("a", "c"), 4))
      .toDF("query_id", "terms", "win")
    assert(rejected(TextOps.coocServeRejects(cc)) == Set(1L))
    assert(rejected(TextOps.coocServeBatch(cc, idx)
      .select(col("query_id"))) == Set(2L))

    val bm = Seq((1L, Seq("a", null)), (2L, Seq("a")))
      .toDF("query_id", "terms")
    assert(rejected(TextOps.bm25ServeRejects(bm)) == Set(1L))
    val bmIdx = TextOps.buildBm25Index(docs)
    assert(rejected(TextOps.bm25ServeBatch(bm, bmIdx)
      .select(col("query_id"))) == Set(2L))
  }
}
