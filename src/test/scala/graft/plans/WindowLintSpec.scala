package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** UNPARTITIONED-WINDOW LINT over every registered query plan: Spark
  * plans `OVER ()` / `OVER (ORDER BY ...)` windows as ONE task holding
  * the whole frame ("WindowExec: No Partition Defined") — fine when the
  * frame is bounded by construction, a serial stage the moment it
  * scales with the data (the q34 class, fixed in round 14 by
  * [[graft.operators.Ranking.withNtile]]). Until now "every remaining
  * unpartitioned window is bounded" was a per-round judge audit; this
  * test makes it structural: the lint sweeps the OPTIMIZED logical plan
  * of every `SparkEntry.queries` entry, collects every Window node
  * without partition keys, and fails unless the query is explicitly
  * allowlisted with its boundedness argument. A future query that
  * reintroduces a data-scaled serial window fails CI, not the cluster.
  *
  * The sweep inspects plans WITHOUT executing the queries (artifact
  * builds memoized inside query construction do run, once, at the
  * fixture scale), so it covers all registered queries in one test.
  */
class WindowLintSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Query name -> why every unpartitioned window in its plan is
    * bounded by construction. An entry here is a REVIEWED claim: the
    * window's input is capped by a limit, a fixed calendar/bucket
    * domain, or a config constant — never by corpus size. The lint
    * also fails on STALE entries (allowlisted but no longer
    * unpartitioned), so the list can only shrink when plans improve.
    */
  private val allowed: Map[String, String] = Map(
    // --- rank over an orderBy+limit(K) cut: the limit compiles to
    // TakeOrderedAndProject (map-side top-K), so exactly K rows reach
    // the serial window (verified in the executed plans)
    "c10_mahalanobis" -> "rank over limit(MahalTopK) rows",
    "q37_top_paths" -> "rank over limit(PathTopK) rows",
    "q38_blame_supplier" -> "rank over limit(20) rows",
    "t39_collocations" -> "rank over limit(CollocTopK) rows",
    "t42_textrank" -> "rank over limit(TrTopK) rows",
    "t43_unigram_vocab" -> "rank over limit(TopOut) rows",
    // --- rank<=k filter: Catalyst's InferWindowGroupLimit rewrites the
    // input to a physical TakeOrderedAndProject below the window
    // (verified: t31's plan shows the window fed by the top-k), so the
    // serial stage sees k rows however large the posting list is
    "t31_bm25_topk" -> "rank<=k over the scored set: top-k below the window",
    "t32_bm25_from_saved" -> "t31's rank<=k shape over the saved index",
    "t33_hybrid_rrf" -> "two rank<=k legs (bm25 + cosine), each top-k'd below its window",
    "t34_bm25_merged" -> "t31's rank<=k shape over the merged index",
    "t35_bm25_deleted" -> "t31's rank<=k shape over the tombstoned index",
    "t46_bm25_compacted" -> "t31's rank<=k shape over the compacted index",
    // --- fixed config-bounded domains: the window input is an
    // aggregate over a domain that never scales with the corpus
    "p34_pps_sample" -> "carry cumsum over 64 shard totals (shard = hash % 64)",
    "p49_pps_soft_dedup" -> "p34's 64-row shard-total carry, soft-weighted",
    "t40_heaps" -> "cumsum over the HeapsBuckets-row bucket table",
    "s16_ivf_split" -> "median-histogram cumsum, input hard-capped at 2e6+1 rows",
    "p46_index_decision" -> "s16's capped median-histogram cumsums (composition)",
    // --- tokenizer symbol tables: id assignment over the
    // distinct-symbol dimension (O(alphabet + merges + marks) rows,
    // bounded by the configured merge-round count, never corpus-sized)
    "t11_bpe_apply" -> "symbol-id rank over the merge-bounded symbol table",
    "t12_bpe_vocab" -> "symbol-id rank over the merge-bounded symbol table",
    "t14_bpe_apply_saved" -> "t11's symbol-id rank, saved-artifact path",
    "t16_bpe_merge_replay" -> "t11's symbol-id rank under merge replay",
    // --- dimension/calendar domains: one row per source or per day
    "p44_epoch_schedule" -> "running totals + lag over one row per source",
    "p52_eval_quotas" -> "largest-remainder rank over one row per source",
    "w30_survival" -> "life-table cumsums over one row per conversion day",
    "w32_seasonal" -> "±3-day rolling mean over one row per calendar day"
  )

  test("every unpartitioned window in every registered query plan is allowlisted with a boundedness argument") {
    val s = TestSpark.spark
    val offenders = scala.collection.mutable.SortedMap.empty[String, Int]
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(s, dir)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (wins.nonEmpty) offenders(name) = wins.size
    }
    val unexplained = offenders.keySet -- allowed.keySet
    assert(unexplained.isEmpty,
      s"queries with UNALLOWLISTED unpartitioned windows (serial-stage " +
        s"risk — either partition the window or allowlist it with its " +
        s"boundedness argument): " +
        unexplained.map(n => s"$n (${offenders(n)})").mkString(", "))
    val stale = allowed.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale allowlist entries (no unpartitioned window remains — " +
        s"delete them so the list stays honest): ${stale.mkString(", ")}")
  }
}
