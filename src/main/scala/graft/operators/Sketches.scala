package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** K-minimum-values (KMV) distinct-count sketches — the mergeable-sketch
  * family member HLL (w18) cannot replace: because a KMV sketch carries the
  * k smallest item HASHES (not register maxima), two sketches support SET
  * ALGEBRA — union by re-minning, and intersection via the Jaccard share of
  * the merged k-min (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007). HLL union is exact
  * under merge but has no intersection; KMV buys |A∩B| for the price of k
  * hash values per set.
  *
  * Determinism: the hash is [[Portable.hash32]] (md5-derived, identical in
  * DuckDB), the k-th-min selection is a total order over those hashes, and
  * the estimator `(k-1)·2^32 div h_k` is INTEGER division — every output is
  * replayed bit-for-bit by the SQL oracle, no probabilistic tolerance pin
  * anywhere (the ADVICE r10 lesson: pinned-true tolerance verdicts go
  * spurious on a new corpus; deterministic replays don't).
  *
  * Scale shape: a sketch is ≤ k rows per group. Building one is a groupBy
  * + per-group top-k (rank ≤ k over the hash order — Spark runs the rank
  * filter inside the window sort, nothing materializes beyond the group's
  * distinct hashes); every later merge/fan-out touches only sketch rows,
  * never raw events. The 100 TB story: ship k·groups rows a day, answer
  * union/intersection/rolling-window cardinalities forever without
  * re-reading the corpus.
  */
object Sketches {

  /** Sketch size: relative error ~ 1/sqrt(k-2) ≈ 13% — the fixture checks
    * the ARITHMETIC (deterministic replay), not the accuracy; accuracy is
    * a documented property of k, tuned per deployment.
    */
  val KmvK = 64

  /** (k-1)·2^32 — the estimator numerator; fits BIGINT with k=64. */
  val KmvNum: Long = (KmvK - 1).toLong * 4294967296L

  /** SQL fragment estimating distinct count from (n kept rows, max kept
    * hash): when fewer than k distinct hashes exist the sketch IS the set
    * (estimate = exact n); otherwise the classic k-th-min estimator, with
    * greatest(h,1) guarding the measure-zero h_k = 0 draw. Integer `div`
    * truncation matches DuckDB `//` (both operands non-negative).
    */
  private[graft] def estExpr(n: String, hk: String): String =
    s"CASE WHEN $n < $KmvK THEN $n ELSE $KmvNum div greatest($hk, 1L) END"

  private[graft] def sqlEstExpr(n: String, hk: String): String =
    s"CASE WHEN $n < $KmvK THEN $n ELSE $KmvNum // greatest($hk, 1) END"

  // ------------------------------------------------------------ q28 set ops

  /** Per-event-type KMV sketches over the item universe, then pairwise
    * union AND intersection cardinality estimates (q28). For each type
    * pair: merge the two k-min lists, re-min to k, estimate the union from
    * the merged k-th min, and estimate the intersection as
    * `(items of the merged k-min present in BOTH sketches) / k_used ×
    * est_union` — the Jaccard-share identity, integer-exact because
    * `n_both · est_union` fits a BIGINT.
    *
    * Plan shape: one distinct + per-type rank builds the sketches (the only
    * pass over events); everything after operates on ≤ k·|types| rows —
    * the pair expansion is a broadcast nested-loop over the |types|-row
    * dimension (bounded by construction, the q27 basket-pair argument),
    * and the merged rank partitions by pair.
    */
  def kmvSetOps(events: DataFrame): DataFrame = {
    val items = events
      .filter(col("ts").isNotNull && col("props").isNotNull)
      .select(col("event_type").as("t"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .select(col("t"), Portable.hash32(col("item").cast("string")).as("h"))
      .distinct()
    kmvPairwise(items)
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("k_used"), col("n_both"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** The pairwise KMV core over any distinct (t, h) membership table:
    * per-key sketches, merged re-min per key pair, union/intersection
    * estimates — shared by q28 (event types × items) and t41 (sources ×
    * vocabulary). Returns (ta, tb, k_used, n_both, est_a, est_b,
    * est_union, est_inter), unordered.
    */
  private def kmvPairwise(items: DataFrame): DataFrame = {
    // sk (types × K rows) feeds FOUR consumers (per-type estimates, the
    // type domain, both merge sides) — uncheckpointed, the membership
    // scan + distinct + top-K window re-ran per consumer
    val sk = items
      .withColumn("r", row_number().over(Window.partitionBy(col("t")).orderBy(col("h"))))
      .filter(col("r") <= KmvK)
      .localCheckpoint(true)
    val te = sk.groupBy(col("t"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .withColumn("est", expr(estExpr("n", "hk")))
    val types = sk.select(col("t")).distinct()
    val prs = types.as("a").join(broadcast(types.as("b")), col("a.t") < col("b.t"))
      .select(col("a.t").as("ta"), col("b.t").as("tb"))
    val mA = prs.join(sk.select(col("t").as("ta"), col("h")), "ta")
      .select(col("ta"), col("tb"), col("h"), lit(1).as("ia"), lit(0).as("ib"))
    val mB = prs.join(sk.select(col("t").as("tb"), col("h")), "tb")
      .select(col("ta"), col("tb"), col("h"), lit(0).as("ia"), lit(1).as("ib"))
    val m = mA.unionByName(mB)
      .groupBy(col("ta"), col("tb"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val mr = m.withColumn("r",
        row_number().over(Window.partitionBy(col("ta"), col("tb")).orderBy(col("h"))))
      .filter(col("r") <= KmvK)
    val u = mr.groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("hu"),
        sum(col("ia") * col("ib")).as("n_both"))
      .withColumn("est_union", expr(estExpr("k_used", "hu")))
      .withColumn("est_inter", expr("(n_both * est_union) div k_used"))
    u.join(te.select(col("t").as("ta"), col("est").as("est_a")), "ta")
      .join(te.select(col("t").as("tb"), col("est").as("est_b")), "tb")
  }

  /** SOURCE VOCABULARY OVERLAP (t41): pairwise Jaccard of per-source
    * vocabularies estimated from KMV sketches — the d19 source-overlap
    * question asked of the LEXICON instead of the documents (two crawls
    * with near-identical vocabularies are stylistic near-clones even
    * when no document matches; the mixture-weighting signal). The
    * Jaccard estimate n_both/k_used comes straight from the merged
    * k-min; corpus cost is one distinct (source, token) pass, sketches
    * after.
    */
  def vocabOverlap(docs: DataFrame): DataFrame = {
    val items = docs
      .select(col("source").as("t"), explode(Portable.tokens(col("text"))).as("tok"))
      .select(col("t"), Portable.hash32(col("tok")).as("h"))
      .distinct()
    kmvPairwise(items)
      .select(col("ta").as("source_a"), col("tb").as("source_b"),
        col("k_used"), col("n_both"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"),
        (round(col("n_both").cast("double") / col("k_used"), 4) + 0.0).as("jaccard_est"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** The pairwise-KMV CTE chain shared by the q28/t41 oracles: expects a
    * leading CTE named `items` (DISTINCT t, h), ends after `ue`/`tes` —
    * callers append their final SELECT.
    */
  private def sqlKmvPairwiseCtes(itemsCte: String): String =
    s"""$itemsCte,
       |sk AS (SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS r
       |  FROM items QUALIFY r <= $KmvK),
       |te AS (SELECT t, count(*)::BIGINT AS n, max(h) AS hk FROM sk GROUP BY t),
       |tes AS (SELECT t, ${sqlEstExpr("n", "hk")} AS est FROM te),
       |types AS (SELECT DISTINCT t FROM sk),
       |prs AS (SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t),
       |m AS (SELECT ta, tb, h, max(ia) AS ia, max(ib) AS ib FROM (
       |    SELECT ta, tb, h, 1 AS ia, 0 AS ib FROM prs JOIN sk ON sk.t = prs.ta
       |    UNION ALL
       |    SELECT ta, tb, h, 0 AS ia, 1 AS ib FROM prs JOIN sk ON sk.t = prs.tb)
       |  GROUP BY 1, 2, 3),
       |mr AS (SELECT ta, tb, h, ia, ib,
       |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS r
       |  FROM m QUALIFY r <= $KmvK),
       |u AS (SELECT ta, tb, count(*)::BIGINT AS k_used, max(h) AS hu,
       |    sum(ia * ib)::BIGINT AS n_both
       |  FROM mr GROUP BY 1, 2),
       |ue AS (SELECT *, ${sqlEstExpr("k_used", "hu")} AS est_union FROM u)""".stripMargin

  /** Oracle for [[kmvSetOps]] — the identical hash, rank, and integer
    * estimator replayed in DuckDB (QUALIFY is the rank-≤-k filter).
    */
  val sqlKmvSetOps: String = {
    // plain string (not an s-interpolator): "$.k" stays literal
    val h = Portable.sqlHash32("(json_extract(props, '$.k')::INT)::VARCHAR")
    val items =
      s"""items AS (SELECT DISTINCT event_type AS t, $h AS h
         |  FROM events WHERE ts IS NOT NULL AND props IS NOT NULL
         |    AND json_extract(props, '$$.k') IS NOT NULL)""".stripMargin
    s"""WITH ${sqlKmvPairwiseCtes(items)}
       |SELECT ue.ta AS type_a, ue.tb AS type_b, ue.k_used, ue.n_both,
       |  ea.est AS est_a, eb.est AS est_b, ue.est_union,
       |  (ue.n_both * ue.est_union) // ue.k_used AS est_inter
       |FROM ue
       |JOIN tes ea ON ea.t = ue.ta
       |JOIN tes eb ON eb.t = ue.tb
       |ORDER BY type_a, type_b""".stripMargin
  }

  /** Oracle for [[vocabOverlap]]: the same chain over the per-source
    * distinct token hashes.
    */
  val sqlVocabOverlap: String = {
    val h = Portable.sqlHash32("tok")
    val items =
      s"""items AS (SELECT DISTINCT t, $h AS h FROM (
         |  SELECT source AS t, unnest(${Portable.sqlTokens("text")}) AS tok
         |  FROM documents))""".stripMargin
    s"""WITH ${sqlKmvPairwiseCtes(items)}
       |SELECT ue.ta AS source_a, ue.tb AS source_b, ue.k_used, ue.n_both,
       |  ea.est AS est_a, eb.est AS est_b, ue.est_union,
       |  (ue.n_both * ue.est_union) // ue.k_used AS est_inter,
       |  round(ue.n_both::DOUBLE / ue.k_used, 4) + 0.0 AS jaccard_est
       |FROM ue
       |JOIN tes ea ON ea.t = ue.ta
       |JOIN tes eb ON eb.t = ue.tb
       |ORDER BY source_a, source_b""".stripMargin
  }

  // ------------------------------------------------------- w24 rolling DAU

  /** Rolling-window length in days (a 7-day rolling DAU window). */
  val RollDays = 7

  /** 7-day rolling distinct users per day from MERGED DAILY KMV SKETCHES
    * (w24) — w18's union-of-dailies story with set-algebra-capable
    * sketches: each day reduces to its k smallest user-hashes; a day's
    * sketch fans out to the ≤ 7 window-ends it participates in (an explode
    * of 7 integer offsets, equi-semijoined back to days that exist — no
    * range join); each window-end re-mins the union and estimates. The
    * raw-events pass is the daily distinct + rank; the fan-out and merge
    * touch only k-rows-per-day sketch rows. `exact_dau7` replays the same
    * window over the distinct (day, user) pairs — the declared exact
    * baseline column (deterministic, so the oracle pins BOTH, no
    * tolerance verdict).
    */
  def rollingDau(events: DataFrame): DataFrame = {
    // du feeds THREE pipelines (day domain, sketch build, exact
    // comparison) and the day domain four semi-joins — uncheckpointed,
    // the events scan + distinct re-ran per consumer (the d24
    // shared-intermediate rule; both tables are far smaller than events)
    val du = events.filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .localCheckpoint(true)
    val daysPresent = du.select(col("day")).distinct()
      .localCheckpoint(true)
    val sk = du
      .select(col("day"), Portable.hash32(col("user_id").cast("string")).as("h"))
      .distinct()
      .withColumn("r", row_number().over(Window.partitionBy(col("day")).orderBy(col("h"))))
      .filter(col("r") <= KmvK)
    val offs = explode(sequence(lit(0), lit(RollDays - 1))).as("i")
    // sketch fan-out: (day, h) contributes to ends day..day+6 that exist
    val fanned = sk.select(col("day"), col("h"), offs)
      .select(expr(s"date_add(day, i)").as("end"), col("h"))
      .join(daysPresent.select(col("day").as("end")), Seq("end"), "left_semi")
      .distinct() // same user-hash from two days in one window re-mins once
    val merged = fanned
      .withColumn("r", row_number().over(Window.partitionBy(col("end")).orderBy(col("h"))))
      .filter(col("r") <= KmvK)
      .groupBy(col("end"))
      .agg(count(lit(1)).as("nm"), max(col("h")).as("hk"))
      .withColumn("est_dau7", expr(estExpr("nm", "hk")))
    val exact = du.select(col("day"), col("user_id"), offs)
      .select(expr(s"date_add(day, i)").as("end"), col("user_id"))
      .join(daysPresent.select(col("day").as("end")), Seq("end"), "left_semi")
      .groupBy(col("end"))
      .agg(countDistinct(col("user_id")).as("exact_dau7"))
    val winDays = daysPresent.select(col("day"), offs)
      .select(expr(s"date_add(day, i)").as("end"))
      .join(daysPresent.select(col("day").as("end")), Seq("end"), "left_semi")
      .groupBy(col("end")).agg(count(lit(1)).as("win_days"))
    merged.join(exact, "end").join(winDays, "end")
      .select(date_format(col("end"), "yyyy-MM-dd").as("day"),
        col("win_days"), col("est_dau7"), col("exact_dau7"))
      .orderBy(col("day"))
  }

  // ------------------------------------------------- streaming daily KMV

  /** Daily KMV distinct-user estimate in batch form — the comparison twin
    * of [[kmvDauStream]] (same hash, same k-min, same integer estimator;
    * one day of [[rollingDau]]'s fan-in).
    */
  def dailyKmv(events: DataFrame): DataFrame = {
    val sk = events.filter(col("ts").isNotNull)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        Portable.hash32(col("user_id").cast("string")).as("h"))
      .distinct()
      .withColumn("r", row_number().over(Window.partitionBy(col("day")).orderBy(col("h"))))
      .filter(col("r") <= KmvK)
    sk.groupBy(col("day"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(col("day"), col("n_kept"), expr(estExpr("n_kept", "hk")).as("est"))
      .orderBy(col("day"))
  }

  /** The k-min sketch ROWS per day — the persistable artifact form
    * ([[dailyKmv]] is its estimate view).
    */
  def dailyKmvSketchRows(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        Portable.hash32(col("user_id").cast("string")).as("h"))
      .distinct()
      .withColumn("r", row_number().over(Window.partitionBy(col("day")).orderBy(col("h"))))
      .filter(col("r") <= KmvK)
      .select(col("day"), col("h"))

  /** Calendar boundary for the p47 refresh fixture: days before this are
    * "yesterday's saved artifact", days at/after are the arriving shard.
    */
  val KmvRefreshCutDay = "2024-01-25"

  /** SKETCH REFRESH FROM A SAVED ARTIFACT (p47) — the persistence leg
    * the KMV family's siblings already have (LSH d13, BM25 t34, IVF-PQ
    * s11): yesterday's corpus ships as its ≤ k-rows-per-day sketch
    * table; a new shard hashes ONLY its own events and re-mins into the
    * union. Because the day key partitions the two sides (an old day's
    * data never arrives in the shard), the refreshed sketches EQUAL the
    * from-scratch [[dailyKmv]] over the whole corpus — which is exactly
    * what the oracle replays, so the equality is the correctness gate,
    * not a claim.
    */
  def kmvRefresh(saved: DataFrame, shardEvents: DataFrame): DataFrame = {
    val merged = saved.unionByName(dailyKmvSketchRows(shardEvents))
      .distinct()
      .withColumn("r", row_number().over(Window.partitionBy(col("day")).orderBy(col("h"))))
      .filter(col("r") <= KmvK)
    merged.groupBy(col("day"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(col("day"), col("n_kept"), expr(estExpr("n_kept", "hk")).as("est"))
      .orderBy(col("day"))
  }

  /** Oracle for [[kmvRefresh]]: the from-scratch daily KMV over ALL
    * events — equal to saved∪shard by the day-partition argument.
    */
  val sqlDailyKmv: String = {
    val h = Portable.sqlHash32("user_id::VARCHAR")
    s"""WITH du AS (SELECT DISTINCT strftime(ts::DATE, '%Y-%m-%d') AS day, $h AS h
       |  FROM events WHERE ts IS NOT NULL),
       |sk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r
       |  FROM du QUALIFY r <= $KmvK),
       |g AS (SELECT day, count(*)::BIGINT AS n_kept, max(h) AS hk FROM sk GROUP BY day)
       |SELECT day, n_kept, ${sqlEstExpr("n_kept", "hk")} AS est
       |FROM g ORDER BY day""".stripMargin
  }

  /** One streamed arrival: the day key and the already-hashed user.
    * `op` is the [[graft.streaming.CurationStream.OpForget]] control tag
    * ("add" when the input has no op column); `ts` carries the
    * watermark-tagged event time when a horizon is armed.
    */
  final case class KmvEv(day: String, h: Long, op: String = "add",
                         ts: java.sql.Timestamp = null)

  /** One streamed estimate emission (same columns as [[dailyKmv]]). */
  final case class KmvDayOut(day: String, n_kept: Long, est: Long)

  /** STREAMING daily distinct-user KMV (the [[dailyKmv]] twin as keyed
    * state): each day's state is its k smallest distinct user-hashes — a
    * BOUNDED-BY-CONSTRUCTION ≤ k-element sorted set, the whole point of
    * carrying a sketch instead of a seen-set (the firstSeen dedup horizon
    * problem doesn't exist here: state never exceeds k longs per day no
    * matter the arrival count). Insertion is idempotent (set semantics),
    * so at-least-once redelivery cannot change an estimate — the crash
    * story is free. Each micro-batch emits the day's current estimate;
    * the final emission per day equals the batch [[dailyKmv]] row.
    *
    * The hash column is the SAME [[Portable.hash32]] Catalyst expression
    * the batch side uses — computed in the streaming select, before the
    * fold — so stream/batch parity needs no JVM reimplementation of md5.
    */
  /** `horizonMs` bounds the one-key-per-calendar-day accretion (the
    * [[graft.streaming.CurationStream.firstSeen]] convention): a day
    * idle past h evicts when the watermark passes — in event time a day
    * stops arriving ≤ the watermark delay after it ends, so h a little
    * over a day keeps exactly the open days live. Erasure reaches the
    * RUNNING sketch: an `op = "forget"` control record (optional `op`
    * column) carries the user like an arrival, hashes through the SAME
    * expression, and REMOVES that hash from its day's k-min set — the
    * user's identifier is physically gone from state. Honesty note: a
    * hash that was discarded while the erased member occupied a slot
    * cannot be resurrected, so the post-forget estimate may read low
    * relative to a never-added world (set semantics bound the error to
    * the number of forgotten members); the erased day re-emits its
    * corrected estimate in the forget's own micro-batch.
    */
  def kmvDauStream(events: DataFrame,
                   horizonMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.streaming.CurationStream.opCol
    val s = events.sparkSession
    import s.implicits._
    val base0 = events.filter(col("ts").isNotNull)
    val base = horizonMs match {
      case Some(h) => base0.withWatermark("ts", s"$h milliseconds")
      case None    => base0
    }
    val timeout =
      if (horizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    base
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        Portable.hash32(col("user_id").cast("string")).as("h"),
        opCol(events).as("op"), col("ts"))
      .as[KmvEv]
      .groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(kmvFold(horizonMs))
      .toDF()
  }

  /** Per-day state transition: fold arrivals into the k-min set (forget
    * records remove their hash), emit the current estimate (same
    * arithmetic as [[estExpr]], h_k guard included). Adds are
    * order-insensitive (set semantics); forgets apply at their
    * event-time position, after same-instant adds.
    */
  private def kmvFold(horizonMs: Option[Long])(day: String,
      rows: Iterator[KmvEv],
      state: org.apache.spark.sql.streaming.GroupState[List[Long]])
      : Iterator[KmvDayOut] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      import graft.streaming.CurationStream.{opRank, OpForget}
      val set = scala.collection.mutable.TreeSet.from(state.getOption.getOrElse(Nil))
      var maxTsMs = Long.MinValue
      rows.toArray.sortBy(r =>
        (Option(r.ts).map(_.getTime).getOrElse(Long.MinValue), opRank(r.op), r.h))
        .foreach { r =>
          Option(r.ts).foreach(t => maxTsMs = math.max(maxTsMs, t.getTime))
          if (r.op == OpForget) set -= r.h
          else {
            set += r.h
            if (set.size > KmvK) set -= set.last
          }
        }
      val kept = set.toList
      if (kept.isEmpty) {
        // a fully-erased day leaves NO key behind and emits nothing
        if (state.exists) state.remove()
        Iterator.empty
      } else {
        state.update(kept)
        horizonMs.foreach { h =>
          if (maxTsMs != Long.MinValue)
            state.setTimeoutTimestamp(math.max(
              maxTsMs + h, state.getCurrentWatermarkMs() + 1))
        }
        val n = kept.size.toLong
        val est = if (n < KmvK) n else KmvNum / math.max(kept.last, 1L)
        Iterator.single(KmvDayOut(day, n, est))
      }
    }

  // ------------------------------------------- streaming heavy hitters

  /** SpaceSaving counter capacity per day — state is ≤ this many
    * (item, count, err) triples regardless of item cardinality; every
    * estimate's error is ≤ n/capacity (Metwally et al., ICDT 2005).
    */
  val SsCounters = 16

  /** One streamed arrival for the heavy-hitter fold (`op`/`ts`: the
    * [[KmvEv]] control/watermark convention).
    */
  final case class SsEv(day: String, item: Int, op: String = "add",
                        ts: java.sql.Timestamp = null)

  /** One tracked counter emission: est overestimates the true count by at
    * most err (so true ∈ [est − err, est]); n_seen is the day's arrival
    * total the n/C error bound reads against.
    */
  final case class SsOut(day: String, item: Int, est: Long, err: Long,
                         n_seen: Long)

  /** STREAMING heavy hitters per day (the bounded-state twin of w23's
    * trending counts): a SpaceSaving summary of [[SsCounters]] counters
    * per day. An untracked arrival under a full table evicts the minimum
    * counter and inherits its count as `err` — the classic guarantee
    * follows: any item with true count > n/C is tracked, and
    * est − err ≤ true ≤ est, DETERMINISTIC bounds (not probabilistic),
    * which is what lets the spec pin them. w23 itself needs the exact
    * (day, item) counts — unbounded key cardinality in streaming; this is
    * the fixed-memory summary a 100 TB stream can actually keep.
    */
  /** `horizonMs` bounds the per-calendar-day key accretion and `op =
    * "forget"` control records reach the RUNNING summary — both the
    * [[kmvDauStream]] conventions. A forget record carries the item like
    * an arrival (same props extraction) and REMOVES its counter: the
    * item's identifiable record is physically gone from state and it can
    * never surface in a later emission (unless re-added fresh). The
    * day's arrival total n_seen is an aggregate, not item-keyed data, so
    * it stands — every surviving counter's est − err ≤ true ≤ est bound
    * still holds (removing a counter never touches another's).
    */
  def heavyHittersStream(events: DataFrame,
                         horizonMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.streaming.CurationStream.opCol
    val s = events.sparkSession
    import s.implicits._
    val base0 = events.filter(col("ts").isNotNull && col("props").isNotNull)
    val base = horizonMs match {
      case Some(h) => base0.withWatermark("ts", s"$h milliseconds")
      case None    => base0
    }
    val timeout =
      if (horizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    base
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        opCol(events).as("op"), col("ts"))
      .filter(col("item").isNotNull)
      .as[SsEv]
      .groupByKey(_.day)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(ssFold(horizonMs))
      .toDF()
  }

  /** Per-day SpaceSaving transition. State: (n_seen, tracked counters).
    * Eviction picks the minimum count with smallest-item tie-break, so
    * the summary is a deterministic function of the arrival sequence —
    * forgets included: they apply at their arrival position (the
    * sequence is the semantics here, unlike the set-semantics KMV).
    */
  private def ssFold(horizonMs: Option[Long])(day: String,
      rows: Iterator[SsEv],
      state: org.apache.spark.sql.streaming.GroupState[(Long, List[(Int, Long, Long)])])
      : Iterator[SsOut] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      import graft.streaming.CurationStream.OpForget
      val (n0, l0) = state.getOption.getOrElse((0L, Nil))
      var n = n0
      var maxTsMs = Long.MinValue
      val m = scala.collection.mutable.Map.from(
        l0.map { case (i, c, e) => i -> ((c, e)) })
      rows.foreach { r =>
        Option(r.ts).foreach(t => maxTsMs = math.max(maxTsMs, t.getTime))
        if (r.op == OpForget) m -= r.item
        else {
          n += 1
          m.get(r.item) match {
            case Some((c, e)) => m(r.item) = (c + 1, e)
            case None if m.size < SsCounters => m(r.item) = (1L, 0L)
            case None =>
              val (vi, (vc, _)) = m.minBy { case (i, (c, _)) => (c, i.toLong) }
              m -= vi
              m(r.item) = (vc + 1, vc)
          }
        }
      }
      state.update((n, m.toList.map { case (i, (c, e)) => (i, c, e) }))
      horizonMs.foreach { h =>
        if (maxTsMs != Long.MinValue)
          state.setTimeoutTimestamp(math.max(
            maxTsMs + h, state.getCurrentWatermarkMs() + 1))
      }
      m.toList.sortBy(_._1)
        .map { case (i, (c, e)) => SsOut(day, i, c, e, n) }.iterator
    }

  /** Oracle for [[rollingDau]]: identical hash, fan-out, re-min, and
    * integer estimator (DuckDB DATE + INT is date_add).
    */
  val sqlRollingDau: String = {
    val h = Portable.sqlHash32("user_id::VARCHAR")
    s"""WITH du AS (SELECT DISTINCT ts::DATE AS day, user_id
       |  FROM events WHERE ts IS NOT NULL),
       |days AS (SELECT DISTINCT day FROM du),
       |sk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r
       |  FROM (SELECT DISTINCT day, $h AS h FROM du) QUALIFY r <= $KmvK),
       |offs AS (SELECT i::INT AS i FROM range($RollDays) t(i)),
       |fanned AS (SELECT DISTINCT sk.day + offs.i AS e, sk.h
       |  FROM sk CROSS JOIN offs
       |  WHERE sk.day + offs.i IN (SELECT day FROM days)),
       |merged AS (SELECT e, h, row_number() OVER (PARTITION BY e ORDER BY h) AS r
       |  FROM fanned QUALIFY r <= $KmvK),
       |mest AS (SELECT e, count(*)::BIGINT AS nm, max(h) AS hk
       |  FROM merged GROUP BY e),
       |exact AS (SELECT du.day + offs.i AS e,
       |    count(DISTINCT du.user_id)::BIGINT AS exact_dau7
       |  FROM du CROSS JOIN offs
       |  WHERE du.day + offs.i IN (SELECT day FROM days) GROUP BY 1),
       |wd AS (SELECT days.day + offs.i AS e, count(*)::BIGINT AS win_days
       |  FROM days CROSS JOIN offs
       |  WHERE days.day + offs.i IN (SELECT day FROM days) GROUP BY 1)
       |SELECT strftime(mest.e, '%Y-%m-%d') AS day, wd.win_days,
       |  ${sqlEstExpr("mest.nm", "mest.hk")} AS est_dau7, exact.exact_dau7
       |FROM mest JOIN exact ON exact.e = mest.e JOIN wd ON wd.e = mest.e
       |ORDER BY day""".stripMargin
  }
}
