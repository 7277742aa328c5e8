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
  * without partition keys, and fails unless the window is SHAPE-BOUNDED
  * (a provable row cap below it in the plan — see [[shapeBounded]]) or
  * the query is explicitly allowlisted with its boundedness argument.
  * Shape-provable beats allowlisted: the round-15 list carried 12
  * entries (the limit+rank and BM25 rank<=k families) whose bound the
  * optimizer already enforces — those are now CHECKED in the plan, and
  * a stale-entry assert deleted them. A future query that reintroduces
  * a data-scaled serial window fails CI, not the cluster.
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
    // --- fixed config-bounded domains: the window input is an
    // aggregate over a domain that never scales with the corpus.
    // (The `hash % K` shard-carry family — p34/p49 — is no longer
    // listed: its bound is now PROVED from the plan by the
    // bounded-domain-aggregate case in [[shapeBounded]].)
    "t40_heaps" -> ("cumsum over the HeapsBuckets-row bucket table " +
      "(bucket = doc_id*20 div n_docs: the <=21-value domain is a DATA " +
      "fact — doc_id < n_docs — not a plan shape, so it stays a " +
      "reviewed claim)"),
    // (p46_index_decision is no longer listed: the round-17 sharing pass
    // materializes the s16 split leg once at construction — its capped
    // median cumsum runs inside that job and the composition's own plan
    // carries no unpartitioned window anymore.)
    "s16_ivf_split" -> "median-histogram cumsum, input hard-capped at 2e6+1 rows",
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

  /** The SHAPE-PROVABLE bound the optimizer itself guarantees: any
    * window whose input, walking down through row-preserving/shrinking
    * unary nodes (Project/Filter/Sort), is capped at this many rows is
    * accepted WITHOUT an allowlist entry — the bound is CHECKED in the
    * optimized plan, not claimed in a comment. Two shapes qualify:
    *  - a Limit below the window (`maxRows` propagates up through
    *    Project/Filter/Sort), the orderBy+limit(K)+rank family;
    *  - Catalyst's InferWindowGroupLimit node (the `rank <= k` rewrite,
    *    the t31 BM25 family): an UNPARTITIONED WindowGroupLimit feeds
    *    the serial window at most `limit` rows (map-side partial top-k
    *    + one k-row final), however large the posting list is.
    * Every such bound is a config constant (top-k, report caps), so the
    * ceiling just separates "config" from "corpus-scaled".
    */
  private val MaxProvableRows = 10000L

  /** Plan-derivable cardinality ceiling of a grouping expression: a
    * modulus by a literal K can take at most K (pmod) or 2K−1 (signed
    * remainder) values, a literal exactly one, a boolean three (t/f/
    * null) — and casts/aliases preserve the bound. Attributes resolve
    * through the defining Project below, so `groupBy(shard)` over a
    * projected `hash(id) % 64` proves the same bound as the inline
    * expression. Anything else: unknown (None) — the proof must come
    * from the expression, never from data.
    */
  private def domainSize(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      scope: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case _: Literal => Some(1L)
      case a: Alias => domainSize(a.child, scope)
      case c: Cast => domainSize(c.child, scope)
      case r: Remainder => r.right match {
        case Literal(k: Int, _) if k != 0 => Some(2L * math.abs(k) - 1)
        case Literal(k: Long, _) if k != 0 => Some(2L * math.abs(k) - 1)
        case _ => None
      }
      case p: Pmod => p.right match {
        case Literal(k: Int, _) if k != 0 => Some(math.abs(k).toLong)
        case Literal(k: Long, _) if k != 0 => Some(math.abs(k))
        case _ => None
      }
      case attr: AttributeReference =>
        scope.collectFirst {
          case pr: org.apache.spark.sql.catalyst.plans.logical.Project
              if pr.projectList.exists(a =>
                a.exprId == attr.exprId && a.isInstanceOf[Alias]) =>
            val a = pr.projectList.find(_.exprId == attr.exprId)
              .get.asInstanceOf[Alias]
            domainSize(a.child, pr.child)
        }.flatten
      case e if e.dataType == org.apache.spark.sql.types.BooleanType =>
        Some(3L)
      case _ => None
    }
  }

  private def shapeBounded(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    if (p.maxRows.exists(_ <= MaxProvableRows)) true
    else p match {
      case g: WindowGroupLimit =>
        g.partitionSpec.isEmpty && g.limit <= MaxProvableRows
      case u @ (_: Project | _: Filter | _: Sort) =>
        shapeBounded(u.asInstanceOf[UnaryNode].child)
      // bounded-domain aggregate (the p34 shard-carry family): an
      // aggregate emits at most one row per grouping-key combination,
      // so when EVERY grouping expression has a plan-derivable domain
      // (hash % 64, booleans, literals) the product bounds the window
      // input however large the corpus below it is. BigInt product —
      // a Long product of many bounded keys could wrap and wrongly
      // certify; +1 per NULLABLE key for its null group
      case a: Aggregate if a.groupingExpressions.nonEmpty =>
        val ds = a.groupingExpressions.map(e =>
          domainSize(e, a.child).map(d => if (e.nullable) d + 1 else d))
        ds.forall(_.isDefined) &&
          ds.flatten.map(BigInt(_)).product <= BigInt(MaxProvableRows)
      case _ => false
    }
  }

  test("every unpartitioned window in every registered query plan is shape-bounded or allowlisted with a boundedness argument") {
    val s = TestSpark.spark
    val offenders = scala.collection.mutable.SortedMap.empty[String, Int]
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(s, dir)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty && !shapeBounded(w.child) => w
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
