package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Resource-lifetime contract of [[Ranking]] (the round-15 advisory):
  * withNtile/withRowNumber materialize their range layout via a LAZY
  * localCheckpoint, so repeated calls on VARIED inputs in a long-lived
  * session must register NOTHING in the session CacheManager — persist()
  * entries live until session end (the leak class), while checkpoint
  * blocks die with their RDD via the ContextCleaner. The spec drives
  * many calls and pins the cache-manager count flat, plus the result on
  * the call whose blocks a previous call could have evicted.
  */
class RankingLifecycleSpec extends AnyFunSuite {

  test("repeated withNtile/withRowNumber calls register no CacheManager entries") {
    val s = TestSpark.spark
    import s.implicits._
    // baseline, not assumption: earlier suites' query construction
    // legitimately registers caches in the shared session (operators
    // that cache-and-unpersist around an action register at .cache()
    // time), so the spec clears the manager and then requires Ranking
    // to keep it empty — uncached plans just recompute, so clearing is
    // correctness-neutral for any frame another suite still holds
    Bridge.clearCaches(s)
    assert(Bridge.noCachedPlans(s))
    (1 to 6).foreach { i =>
      val df = (0L until 50L * i).map(v => (v % 7, v)).toDF("v", "id")
      val nt = Ranking.withNtile(df, "b", 3, Seq(col("v"), col("id")))
      val rn = Ranking.withRowNumber(df, "r", Seq(col("v").desc, col("id")))
      assert(nt.count() == 50L * i && rn.count() == 50L * i)
      assert(Bridge.noCachedPlans(s),
        s"call $i left a CacheManager entry behind (session-long leak)")
    }
  }

  test("dedup operators register no CacheManager entries (cache-discipline sweep)") {
    val s = TestSpark.spark
    import s.implicits._
    Bridge.clearCaches(s)
    assert(Bridge.noCachedPlans(s))
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // varied inputs across calls — the session-accumulation shape the
    // round-16 sweep eliminated: jaccardPairs/lshPairs/shardLshPairs
    // materialize their shared shingle frames via EAGER localCheckpoint
    // (the shared-intermediate convention — blocks die with the frame,
    // no CacheManager entry), never a session-pinned cache()
    (1 to 3).foreach { i =>
      val d = (0L until 4L * i)
        .map(id => (id, if (id % 2 == 0) base else s"$base extra$id word$i"))
        .toDF("doc_id", "text")
      Dedup.jaccardPairs(d).count()
      Dedup.lshPairs(d).count()
      assert(Bridge.noCachedPlans(s),
        s"dedup call $i left a CacheManager entry behind (session-long leak)")
    }
    // the incremental shard path: the index build itself cache()s scoped
    // intermediates but unpersists them before returning; the shard-pair
    // serve must then leave the manager empty too
    val dir = java.nio.file.Files.createTempDirectory("lsh_lifecycle").toString
    val corpus = (0L until 6L).map(id => (id, s"$base corpusdoc$id"))
      .toDF("doc_id", "text")
    Dedup.buildAndSaveLshIndex(corpus, dir)
    val idx = Dedup.loadLshIndex(s, dir)
    val shard = (100L until 104L).map(id => (id, s"$base sharddoc$id"))
      .toDF("doc_id", "text")
    Dedup.shardLshPairs(shard, idx).count()
    assert(Bridge.noCachedPlans(s),
      "shard dedup left a CacheManager entry behind (session-long leak)")
  }

  test("rank stays correct when consumed after later Ranking calls intervene") {
    val s = TestSpark.spark
    import s.implicits._
    val a = (0L until 97L).map(v => ((v * 13) % 11, v)).toDF("v", "id")
    val rankedA = Ranking.withRowNumber(a, "r", Seq(col("v"), col("id")))
    // interleave: a different input materializes its own layout before
    // rankedA is ever consumed — the frozen-bounds guarantee must be
    // per-frame, not last-caller-wins
    val b = (0L until 64L).map(v => (v % 3, v)).toDF("v", "id")
    assert(Ranking.withNtile(b, "b", 4, Seq(col("v"), col("id"))).count() == 64)
    val got = rankedA.orderBy(col("r")).select(col("id")).as[Long].collect()
    val want = (0L until 97L).sortBy(v => ((v * 13) % 11, v)).toArray
    assert(got.sameElements(want))
  }
}
