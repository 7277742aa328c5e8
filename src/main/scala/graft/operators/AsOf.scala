package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time AS-OF join — the classic operator Spark lacks natively: each
  * left row matched to the LATEST right row with ts_right <= ts_left within
  * its key (trade-to-quote, event-to-dimension-version, click-to-view
  * attribution).
  *
  * Why not a join: Spark plans a `l.key = r.key AND r.ts <= l.ts` join with
  * a per-key NESTED LOOP over right rows (and keeps EVERY match, needing a
  * rank-1 window on an |L|x|R|-per-key intermediate) — quadratic per key,
  * the 100 TB anti-pattern. The scale-correct composition: tag both sides,
  * union, ONE hash shuffle on the key, one partition-local sort, and a
  * running ignore-nulls last_value window — O(n log n) per partition, no
  * pair blowup, no broadcast. PlanShapeSpec locks the no-nested-loop shape;
  * DuckDB's native ASOF JOIN is the oracle, pinning the semantics
  * (inclusive <=, latest-wins) cross-engine.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate duplicates (the
  * w7 query takes max view per instant); "latest at t" is ill-defined in
  * both engines otherwise. The payload must be non-null on right rows (a
  * null payload is indistinguishable from "no match yet" to the running
  * last_value). BOTH preconditions are ENFORCED, not documented — see
  * [[AsOf.asOf]]: misuse raise_errors instead of silently mis-matching.
  */
object AsOf {

  /** Tagged side prep shared by [[asOf]] and [[asOfSegmented]]: left rows
    * carry their original row as a struct, right rows their (guarded)
    * payload; both collapse to the (__k, __ts, __side, __pay, __row) shape
    * the union sorts.
    *
    * NULL semantics, pinned to the DuckDB ASOF LEFT JOIN oracle:
    *  - null KEYS never match: the window's partitionBy would group null
    *    keys TOGETHER (unlike a join), so null-key right rows are dropped —
    *    null-key left rows then see only null payloads and come out
    *    unmatched;
    *  - null right TIMESTAMPS never match (`vts <= ts` is never true for
    *    NULL): dropped for the same reason — the window's nulls-first sort
    *    would otherwise put a null-ts right row BEFORE every left row and
    *    silently match it everywhere (and two null-ts rows would evade the
    *    duplicate guard, NULL === NULL being null);
    *  - a null right PAYLOAD is indistinguishable from "no match yet" to
    *    the running last_value, so it fails loudly per row instead.
    */
  private def prepSides(left: DataFrame, key: String, leftTs: String,
                        right: DataFrame, rightTs: String, payload: String)
      : (DataFrame, DataFrame) = {
    val payType = right.schema(payload).dataType
    val l = left.select(col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), lit(null).cast(payType).as("__pay"),
      struct(left.columns.map(col): _*).as("__row"))
    val rowType = l.schema("__row").dataType
    val guardedPay = when(col(payload).isNotNull, col(payload))
      .otherwise(raise_error(lit(
        s"as-of: right payload '$payload' is null — a null payload is " +
          "indistinguishable from 'no right row yet'; filter or coalesce " +
          "right rows first")).cast(payType))
    val r = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).as("__k"), col(rightTs).as("__ts"),
        lit(0).as("__side"), guardedPay.as("__pay"),
        lit(null).cast(rowType).as("__row"))
    (l, r)
  }

  /** The duplicate-(key, ts) guard woven into `__pay`: duplicates are
    * ADJACENT under the (ts, side) sort within `partitionCols`, so one lag
    * over the match window's own ordering detects them with no extra
    * exchange — "latest at t" would otherwise be engine-arbitrary.
    */
  private def dupGuardedPay(partitionCols: Seq[Column], payType: org.apache.spark.sql.types.DataType): Column = {
    val wLag = Window.partitionBy(partitionCols: _*)
      .orderBy(col("__ts"), col("__side"))
    val dup = col("__side") === 0 &&
      lag(col("__side"), 1).over(wLag) === 0 &&
      lag(col("__ts"), 1).over(wLag) === col("__ts")
    when(dup,
      raise_error(concat(lit("as-of: duplicate right rows at (key, ts) = ("),
        col("__k").cast("string"), lit(", "), col("__ts").cast("string"),
        lit(") — pre-aggregate right to one row per (key, ts)"))).cast(payType))
      .otherwise(col("__pay"))
  }

  /** Left rows + (`__match` = latest right payload, `__mts` = its ts), null
    * when no right row precedes. Left columns pass through unchanged.
    */
  def asOf(left: DataFrame, key: String, leftTs: String,
           right: DataFrame, rightTs: String, payload: String): DataFrame = {
    val payType = right.schema(payload).dataType
    val (l, r) = prepSides(left, key, leftTs, right, rightTs, payload)
    // right rows sort BEFORE left rows at the same instant => inclusive <=
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__pay", dupGuardedPay(Seq(col("__k")), payType))
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .withColumn("__mts",
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(c => col(s"__row.$c")) :+ col("__match") :+ col("__mts")): _*)
  }

  /** SEGMENTED as-of: identical semantics to [[asOf]], but the window
    * partitions on (key, coarse-epoch bucket) instead of the raw key — the
    * hot-key cap. [[asOf]]'s per-key ordered scan serializes one
    * pathological key (a bot user with a year of events) onto one task;
    * here a task owns at most one bucket of one key, so per-task work is
    * bounded by temporal co-location (the w8 banding idea applied to the
    * as-of scan).
    *
    * Two passes:
    *  1. carry-in: per (key, bucket), the last right (payload, ts) INSIDE
    *     the bucket (one partial-aggregated max), then a per-key running
    *     last over the BUCKET-SUMMARY table — one row per non-empty
    *     (key, bucket), dimension-sized, never the corpus — with a
    *     rows-(-1) frame so a bucket sees only strictly-earlier buckets;
    *  2. the [[asOf]] union+sort+running-last within each (key, bucket),
    *     coalesced with the bucket's carry-in for left rows that precede
    *     every right row in their bucket.
    *
    * Timestamps must be TimestampType (bucketing uses unix_micros). Both
    * [[asOf]] preconditions are enforced the same way (duplicates share a
    * bucket, so the lag guard still sees them adjacent).
    *
    * Cost trade vs [[asOf]]: the inputs are read again for the carry pass,
    * but those extra reads are NARROW (key/ts/payload only — column
    * pruning drops the carried left row), and the summary they aggregate
    * to is bucket-counted. Paying ~2 pruned scans to bound per-task work
    * is the right trade exactly when a hot key exists; keep [[asOf]] when
    * keys are known to be balanced.
    */
  def asOfSegmented(left: DataFrame, key: String, leftTs: String,
                    right: DataFrame, rightTs: String, payload: String,
                    bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val payType = right.schema(payload).dataType
    val (l, r) = prepSides(left, key, leftTs, right, rightTs, payload)
    val bucketed = l.unionByName(r)
      .withColumn("__b", expr(s"unix_micros(__ts) div $bucketUs"))

    // pass 1: bucket summaries (right side only) -> per-key carry-in over
    // the summary table. max(struct(ts, pay)) is the in-bucket latest; the
    // frame stops at -1 row so a bucket's carry is strictly earlier buckets.
    val rSum = bucketed.filter(col("__side") === 0)
      .groupBy(col("__k"), col("__b"))
      .agg(max(struct(col("__ts"), col("__pay"))).as("m"))
      .select(col("__k"), col("__b"),
        col("m.__ts").as("__bts"), col("m.__pay").as("__bpay"))
    val allBuckets = bucketed.select(col("__k"), col("__b")).distinct()
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allBuckets.join(rSum, Seq("__k", "__b"), "left")
      .select(col("__k"), col("__b"),
        last(col("__bpay"), ignoreNulls = true).over(wCarry).as("__carry_pay"),
        last(col("__bts"), ignoreNulls = true).over(wCarry).as("__carry_ts"))

    // pass 2: the asOf window, partitioned by (key, BUCKET)
    val wSeg = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(carry, Seq("__k", "__b"), "left")
      .withColumn("__pay", dupGuardedPay(Seq(col("__k"), col("__b")), payType))
      .withColumn("__match",
        coalesce(last(col("__pay"), ignoreNulls = true).over(wSeg),
          col("__carry_pay")))
      .withColumn("__mts",
        coalesce(last(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(wSeg), col("__carry_ts")))
      .filter(col("__side") === 1)
      .select((left.columns.map(c => col(s"__row.$c")) :+ col("__match") :+ col("__mts")): _*)
  }

  /** Click-to-view attribution over the events table (w7): every click
    * matched to the user's latest preceding (or simultaneous) view, with
    * the microsecond gap — unmatched clicks keep a null attribution.
    */
  def clickAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    asOf(clicks, "user_id", "ts", views, "vts", "view_id")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("__match").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("__mts"))).as("gap_us"))
      .orderBy(col("click_id"))
  }

  /** TEMPORAL DIMENSION LOOKUP (w27) — the warehouse SCD pattern as an
    * as-of: each purchase labeled with the user's STATUS at that instant,
    * where status is the type of the latest signup/error changelog event
    * at or before the purchase (purchases before any status row read
    * 'none'). This is the lookup w21's validity intervals exist to
    * answer, composed from the same [[asOf]] fold the attribution
    * queries use — dimension versioning without materializing intervals.
    * Same-instant changelog duplicates collapse by max event_id (the
    * [[clickAttribution]] dedup guard).
    */
  def statusLookup(events: DataFrame): DataFrame = {
    val dim = events
      .filter(col("event_type").isin("signup", "error") && col("ts").isNotNull)
      .groupBy(col("user_id"), col("ts").as("sts"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("b"))
      .select(col("user_id"), col("sts"), col("b.event_type").as("status"))
    val purchases = events
      .filter(col("event_type") === "purchase" && col("ts").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    asOf(purchases, "user_id", "ts", dim, "sts", "status")
      .select(col("purchase_id"), col("user_id"),
        coalesce(col("__match"), lit("none")).as("status"),
        (unix_micros(col("ts")) - unix_micros(col("__mts"))).as("since_us"))
      .orderBy(col("purchase_id"))
  }

  /** Oracle for [[statusLookup]]: DuckDB's native ASOF LEFT JOIN over
    * the arg_max-deduped changelog (null left ts pre-filtered — the
    * engine-divergence gotcha).
    */
  val sqlStatusLookup: String =
    """WITH st AS (SELECT user_id, ts AS sts,
      |    arg_max(event_type, event_id) AS status
      |  FROM events WHERE event_type IN ('signup', 'error')
      |    AND ts IS NOT NULL GROUP BY 1, 2),
      |p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase' AND ts IS NOT NULL)
      |SELECT p.purchase_id, p.user_id,
      |  coalesce(st.status, 'none') AS status,
      |  (epoch_us(p.ts) - epoch_us(st.sts))::BIGINT AS since_us
      |FROM p ASOF LEFT JOIN st ON p.user_id = st.user_id AND st.sts <= p.ts
      |ORDER BY purchase_id""".stripMargin

  /** Funnel conversion summary (w16) — the product-analytics sequence
    * query: of all purchases, how many were preceded (per user) by a
    * view, and how many of THOSE views were themselves preceded by a
    * signup — the ordered 3-step chain signup → view → purchase, counted
    * by CHAINED as-of joins. Each step is one [[asOf]] (latest right at
    * or before the step's anchor time), and the chain anchors step 2 at
    * the MATCHED VIEW'S timestamp, not the purchase's — the ordering
    * constraint that makes it a funnel rather than three independent
    * existence checks. Unmatched steps flow through as nulls and fall
    * out of the conditional counts.
    *
    * Scale shape: two w7-shaped passes (union + one key exchange + a
    * running ignore-nulls last each — never a per-key nested loop), then
    * one single-row aggregate. The same segmented/hot-key-capped variant
    * (w9) slots in per step if a key owns the stream. st1 is consumed
    * twice, but the n_purchases count branch does NOT replan step 1:
    * pruning drops the window expressions, the empty Window node is
    * removed, and the __side=1 filter folds the union to the bare
    * purchases scan — so each as-of fold executes exactly once
    * (plan-locked in PlanShapeSpec: exactly two __k exchanges).
    */
  def funnel(events: DataFrame): DataFrame = {
    // null event times are excluded on EVERY side up front (the w10/w17
    // convention, and this operator's own step-2 rule): a null ts has no
    // place on the as-of axis, and the engines disagree about it —
    // DuckDB's sort-based ASOF puts a NULL last and matches the latest
    // row, the Spark fold puts it first and matches nothing
    val evs = events.filter(col("ts").isNotNull)
    val purchases = evs.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = evs.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("vts0"))
      .agg(max(col("event_id")).as("view_id"))
    val signups = evs.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("sts0"))
      .agg(max(col("event_id")).as("signup_id"))
    val st1 = asOf(purchases, "user_id", "ts", views, "vts0", "view_id")
      .select(col("user_id"), col("event_id"),
        col("__match").as("view_id"), col("__mts").as("vts"))
    // step 2 runs ONLY over view-matched rows — explicitly, in both
    // engines: a NULL left timestamp has no place on the as-of axis, and
    // the engines disagree about it (measured: DuckDB's sort-based ASOF
    // puts the NULL last and matches the LATEST right row; the Spark
    // fold matches nothing). A funnel row without step 2 cannot have
    // step 3, so the filter is also the semantics.
    val st2 = asOf(st1.filter(col("view_id").isNotNull),
        "user_id", "vts", signups, "sts0", "signup_id")
      .select(col("event_id"), col("__match").as("signup_id"))
    val m2 = st2.agg(count(lit(1)).as("with_view"),
      count(col("signup_id")).as("full_funnel"))
    st1.agg(count(lit(1)).as("n_purchases"))
      .crossJoin(broadcast(m2))
      .select(col("n_purchases"), col("with_view"), col("full_funnel"),
        when(col("n_purchases") === 0, lit(0.0))
          .otherwise(round(col("with_view") / col("n_purchases"), 4)).as("view_rate"),
        when(col("with_view") === 0, lit(0.0))
          .otherwise(round(col("full_funnel") / col("with_view"), 4)).as("signup_rate"))
  }

  /** Oracle: the same chain as two native ASOF LEFT JOINs. */
  val sqlFunnel: String =
    """WITH p AS (SELECT user_id, ts, event_id FROM events
      |  WHERE event_type = 'purchase' AND ts IS NOT NULL),
      |v AS (SELECT user_id, ts AS vts0, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1, 2),
      |s AS (SELECT user_id, ts AS sts0, max(event_id) AS signup_id
      |  FROM events WHERE event_type = 'signup' AND ts IS NOT NULL GROUP BY 1, 2),
      |st1 AS (SELECT p.user_id, p.event_id, v.view_id, v.vts0 AS vts
      |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.vts0 <= p.ts),
      |st2 AS (SELECT st1.event_id, s.signup_id
      |  FROM (SELECT * FROM st1 WHERE view_id IS NOT NULL) st1
      |  ASOF LEFT JOIN s ON st1.user_id = s.user_id AND s.sts0 <= st1.vts),
      |m AS (SELECT (SELECT count(*) FROM st1)::BIGINT AS n_purchases,
      |    count(*)::BIGINT AS with_view,
      |    count(signup_id)::BIGINT AS full_funnel
      |  FROM st2)
      |SELECT n_purchases, with_view, full_funnel,
      |  CASE WHEN n_purchases = 0 THEN 0.0
      |    ELSE round(with_view::DOUBLE / n_purchases, 4) END AS view_rate,
      |  CASE WHEN with_view = 0 THEN 0.0
      |    ELSE round(full_funnel::DOUBLE / with_view, 4) END AS signup_rate
      |FROM m""".stripMargin

  /** Segment width for the w9 query: 6-hour buckets over the events table. */
  val SegmentUs: Long = 6L * 3600 * 1000000

  /** w7 via the SEGMENTED path (w9): identical result — the oracle is the
    * same native ASOF JOIN — through the hot-key-capped two-pass plan.
    */
  def clickAttributionSegmented(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    asOfSegmented(clicks, "user_id", "ts", views, "vts", "view_id", SegmentUs)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("__match").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("__mts"))).as("gap_us"))
      .orderBy(col("click_id"))
  }

  val sqlClickAttribution: String =
    """WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |v AS (SELECT user_id, ts AS vts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT c.event_id AS click_id, c.user_id, v.view_id,
      |  (epoch_us(c.ts) - epoch_us(v.vts))::BIGINT AS gap_us
      |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.vts <= c.ts
      |ORDER BY click_id""".stripMargin

  // --------------------------------------------------- nearest as-of (w11)

  /** NEAREST as-of with a tolerance (pandas `merge_asof(direction=
    * 'nearest', tolerance=...)`): each left row matched to the right row
    * minimizing |ts_right - ts_left| within its key, match discarded when
    * the nearer side is still more than `tolUs` away; an EXACT tie (one
    * candidate each side, equidistant) resolves to the BACKWARD one — the
    * causal row — so the choice is total and engine-independent.
    *
    * Same scale shape as [[asOf]], and the reason this is an operator
    * instead of "join on |Δt| <= tol and rank": ONE union, ONE hash
    * shuffle on the key, one partition-local sort, and BOTH directions
    * read from the same sorted run — the backward candidate is a running
    * ignore-nulls `last` over the preceding frame, the forward candidate a
    * running ignore-nulls `first` over the following frame. No per-key
    * pair blowup, no second exchange for the forward pass. At-the-same-
    * instant right rows belong to the BACKWARD side (inclusive <=, the
    * [[asOf]] tie rule); the forward frame sees strictly-later rows only,
    * because same-instant right rows sort before the left row and a ROWS
    * following frame starts at the left row itself.
    *
    * Both [[asOf]] preconditions (unique right (key, ts), non-null
    * payload) are enforced by the same guards. Timestamps must be
    * TimestampType (the gap arithmetic is in microseconds).
    */
  def asOfNearest(left: DataFrame, key: String, leftTs: String,
                  right: DataFrame, rightTs: String, payload: String,
                  tolUs: Long): DataFrame = {
    val payType = right.schema(payload).dataType
    val (l, r) = prepSides(left, key, leftTs, right, rightTs, payload)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
    val wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val backWins = col("__bok") && (!col("__fok") || col("__bgap") <= col("__fgap"))
    l.unionByName(r)
      .withColumn("__pay", dupGuardedPay(Seq(col("__k")), payType))
      // all four running candidates in ONE select: same-frame expressions
      // collapse into a single Window operator per direction (interleaved
      // withColumns would leave a Project between them and defeat
      // CollapseWindow — four passes over the sorted run instead of two)
      .select(col("*"),
        last(col("__pay"), ignoreNulls = true).over(wb).as("__bm"),
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(wb).as("__bts"),
        first(col("__pay"), ignoreNulls = true).over(wf).as("__fm"),
        first(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(wf).as("__fts"))
      .filter(col("__side") === 1)
      .withColumn("__bgap", unix_micros(col("__ts")) - unix_micros(col("__bts")))
      .withColumn("__fgap", unix_micros(col("__fts")) - unix_micros(col("__ts")))
      .withColumn("__bok", col("__bts").isNotNull && col("__bgap") <= tolUs)
      .withColumn("__fok", col("__fts").isNotNull && col("__fgap") <= tolUs)
      .withColumn("__match",
        when(backWins, col("__bm")).when(col("__fok"), col("__fm")))
      .withColumn("__mts",
        when(backWins, col("__bts")).when(col("__fok"), col("__fts")))
      .select((left.columns.map(c => col(s"__row.$c"))
        :+ col("__match") :+ col("__mts")): _*)
  }

  /** SEGMENTED nearest as-of — [[asOfNearest]] semantics through the
    * [[asOfSegmented]] hot-key cap: windows partition on (key, coarse
    * epoch bucket), so one pathological key cannot serialize its whole
    * history onto one task. The carry machinery is SYMMETRIC: the
    * backward carry-in is the latest right summary over strictly-EARLIER
    * buckets (the asOfSegmented pass), the forward carry-out the earliest
    * right summary over strictly-LATER buckets — both running over the
    * per-(key, bucket) summary table (one row per non-empty bucket,
    * dimension-sized), both frames off ONE (key)-ordered exchange of that
    * summary. Buckets partition event time, so "latest right ≤ t" is
    * in-bucket or in the backward carry, and "earliest right > t"
    * in-bucket or in the forward carry — coalesce is exact, not a
    * heuristic. Same guards, same nearest/tie/tolerance rule as
    * [[asOfNearest]].
    */
  def asOfNearestSegmented(left: DataFrame, key: String, leftTs: String,
                           right: DataFrame, rightTs: String, payload: String,
                           tolUs: Long, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val payType = right.schema(payload).dataType
    val (l, r) = prepSides(left, key, leftTs, right, rightTs, payload)
    val bucketed = l.unionByName(r)
      .withColumn("__b", expr(s"unix_micros(__ts) div $bucketUs"))

    // pass 1: per-(key, bucket) right summaries — latest for the backward
    // carry, earliest for the forward carry — then both carries off one
    // (key)-ordered window over the summary table
    val rSum = bucketed.filter(col("__side") === 0)
      .groupBy(col("__k"), col("__b"))
      .agg(max(struct(col("__ts"), col("__pay"))).as("mx"),
        min(struct(col("__ts"), col("__pay"))).as("mn"))
      .select(col("__k"), col("__b"),
        col("mx.__ts").as("__lts"), col("mx.__pay").as("__lpay"),
        col("mn.__ts").as("__ets"), col("mn.__pay").as("__epay"))
    val allBuckets = bucketed.select(col("__k"), col("__b")).distinct()
    val wBack = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wFwd = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = allBuckets.join(rSum, Seq("__k", "__b"), "left")
      .select(col("__k"), col("__b"),
        last(col("__lpay"), ignoreNulls = true).over(wBack).as("__cb_pay"),
        last(col("__lts"), ignoreNulls = true).over(wBack).as("__cb_ts"),
        first(col("__epay"), ignoreNulls = true).over(wFwd).as("__cf_pay"),
        first(col("__ets"), ignoreNulls = true).over(wFwd).as("__cf_ts"))

    // pass 2: both in-bucket candidates off one (key, bucket)-sorted run,
    // coalesced with their carries; then the asOfNearest pick
    val wSeg = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__ts"), col("__side"))
    val wSegB = wSeg.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSegF = wSeg.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val backWins = col("__bok") && (!col("__fok") || col("__bgap") <= col("__fgap"))
    bucketed.join(carry, Seq("__k", "__b"), "left")
      .withColumn("__pay", dupGuardedPay(Seq(col("__k"), col("__b")), payType))
      .select(col("*"),
        last(col("__pay"), ignoreNulls = true).over(wSegB).as("__ibm"),
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(wSegB).as("__ibts"),
        first(col("__pay"), ignoreNulls = true).over(wSegF).as("__ifm"),
        first(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(wSegF).as("__ifts"))
      .filter(col("__side") === 1)
      .withColumn("__bm", coalesce(col("__ibm"), col("__cb_pay")))
      .withColumn("__bts", coalesce(col("__ibts"), col("__cb_ts")))
      .withColumn("__fm", coalesce(col("__ifm"), col("__cf_pay")))
      .withColumn("__fts", coalesce(col("__ifts"), col("__cf_ts")))
      .withColumn("__bgap", unix_micros(col("__ts")) - unix_micros(col("__bts")))
      .withColumn("__fgap", unix_micros(col("__fts")) - unix_micros(col("__ts")))
      .withColumn("__bok", col("__bts").isNotNull && col("__bgap") <= tolUs)
      .withColumn("__fok", col("__fts").isNotNull && col("__fgap") <= tolUs)
      .withColumn("__match",
        when(backWins, col("__bm")).when(col("__fok"), col("__fm")))
      .withColumn("__mts",
        when(backWins, col("__bts")).when(col("__fok"), col("__fts")))
      .select((left.columns.map(c => col(s"__row.$c"))
        :+ col("__match") :+ col("__mts")): _*)
  }

  /** Tolerance for the w11 query: 1 day in microseconds — wide enough that
    * most clicks find a view on one side, narrow enough that some stay
    * unmatched and some resolve FORWARD (the fixture's backward gaps
    * median ~1.45 days).
    */
  val NearestTolUs: Long = 86400L * 1000000L

  /** w11: every click matched to the user's NEAREST view within a day —
    * the attribution variant for instrument-skew data where the relevant
    * exposure may be logged just after the click. `gap_us` is SIGNED
    * (positive = view before click, negative = view after).
    */
  def clickNearestAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    asOfNearest(clicks, "user_id", "ts", views, "vts", "view_id", NearestTolUs)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("__match").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("__mts"))).as("gap_us"))
      .orderBy(col("click_id"))
  }

  /** w12: w11 through the SEGMENTED nearest path (hot-key cap) — same
    * oracle, proving the symmetric two-carry plan is a pure plan change.
    */
  def clickNearestSegmented(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    asOfNearestSegmented(clicks, "user_id", "ts", views, "vts", "view_id",
        NearestTolUs, SegmentUs)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("__match").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("__mts"))).as("gap_us"))
      .orderBy(col("click_id"))
  }

  /** Oracle: candidate pairs within tolerance, ranked by (gap, direction)
    * — `min_by` over the composite `gap * 2 + fwd` key, which is UNIQUE
    * per click (same gap + same direction would mean the same view row,
    * since right rows are unique per (key, ts)), so the pick is total.
    */
  /** LINEAR-INTERPOLATION as-of (w19) — the gap-fill join: each left row
    * gets the bracketing right rows (latest at-or-before AND earliest
    * strictly-after, per key) and the payload linearly interpolated
    * between them at the left timestamp; one-sided brackets clamp to the
    * existing side, no bracket at all is null. The standard time-series
    * alignment for joining a sparse metric onto event times (sensor
    * resampling, price marking, metric attribution) — an operator family
    * Spark has no native form for.
    *
    * Same scale shape as [[asOfNearest]] (which it shares the union +
    * one-sort + two-frame machinery with): one hash exchange on the key,
    * one partition-local sort, both bracket candidates off the same
    * sorted run — never a per-key pair join. Tie rule inherited from the
    * (ts, side) sort: a right row exactly at the left instant is the
    * BACKWARD bracket (inclusive <=), so the interpolation factor is 0
    * and the row takes that exact payload.
    *
    * FP contract with the oracle: the factor is (int64 micros delta
    * cast double) / (int64 micros delta), applied as pv + (nv-pv)*f —
    * one multiply, one add, identical in both engines.
    */
  def asOfInterpolate(left: DataFrame, key: String, leftTs: String,
                      right: DataFrame, rightTs: String, payload: String): DataFrame = {
    val payType = right.schema(payload).dataType
    val (l, r) = prepSides(left, key, leftTs, right, rightTs, payload)
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__side"))
    val wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("__pay", dupGuardedPay(Seq(col("__k")), payType))
      .select(col("*"),
        last(col("__pay"), ignoreNulls = true).over(wb).as("__pv"),
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(wb).as("__pts"),
        first(col("__pay"), ignoreNulls = true).over(wf).as("__nv"),
        first(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(wf).as("__nts"))
      .filter(col("__side") === 1)
      .withColumn("__interp",
        when(col("__pts").isNotNull && col("__nts").isNotNull,
          col("__pv") + (col("__nv") - col("__pv")) *
            ((unix_micros(col("__ts")) - unix_micros(col("__pts"))).cast("double")
              / (unix_micros(col("__nts")) - unix_micros(col("__pts")))))
          .when(col("__pts").isNotNull, col("__pv"))
          .otherwise(col("__nv")))
      .select((left.columns.map(c => col(s"__row.$c"))
        :+ col("__pv") :+ col("__nv") :+ col("__interp")): _*)
  }

  /** w19: every click's value interpolated between its user's bracketing
    * views — the per-instant view dedup (max value) is the w7 convention.
    */
  def clickValueInterpolation(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click" && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = events.filter(col("event_type") === "view" && col("ts").isNotNull)
      .groupBy(col("user_id"), col("ts").as("vts"))
      .agg(max(col("value")).as("v"))
    asOfInterpolate(clicks, "user_id", "ts", views, "vts", "v")
      .select(col("event_id").as("click_id"), col("user_id"),
        round(col("__pv"), 6).as("prev_v"), round(col("__nv"), 6).as("next_v"),
        round(col("__interp"), 6).as("interp"))
      .orderBy(col("click_id"))
  }

  /** Oracle for w19: the IDENTICAL union + (ts, side)-sorted frames in
    * DuckDB window syntax (IGNORE NULLS running brackets), the identical
    * micros-ratio lerp.
    */
  val sqlClickValueInterpolation: String =
    s"""WITH c AS (SELECT user_id, ts, event_id FROM events
       |  WHERE event_type = 'click' AND ts IS NOT NULL),
       |v AS (SELECT user_id, ts AS vts, max(value) AS v FROM events
       |  WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1, 2),
       |u AS (SELECT user_id AS k, ts, 1 AS side, NULL::DOUBLE AS pay, event_id FROM c
       |  UNION ALL
       |  SELECT user_id, vts, 0, v, NULL FROM v),
       |w AS (SELECT *,
       |    last_value(pay IGNORE NULLS) OVER win_b AS pv,
       |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER win_b AS pts,
       |    first_value(pay IGNORE NULLS) OVER win_f AS nv,
       |    first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER win_f AS nts
       |  FROM u
       |  WINDOW win_b AS (PARTITION BY k ORDER BY ts, side
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    win_f AS (PARTITION BY k ORDER BY ts, side
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT event_id AS click_id, k AS user_id,
       |  round(pv, 6) AS prev_v, round(nv, 6) AS next_v,
       |  round(CASE WHEN pts IS NOT NULL AND nts IS NOT NULL THEN
       |      pv + (nv - pv) * ((epoch_us(ts) - epoch_us(pts))::DOUBLE
       |        / (epoch_us(nts) - epoch_us(pts)))
       |    WHEN pts IS NOT NULL THEN pv ELSE nv END, 6) AS interp
       |FROM w WHERE side = 1 ORDER BY click_id""".stripMargin

  val sqlClickNearestAttribution: String =
    s"""WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
       |v AS (SELECT user_id, ts AS vts, max(event_id) AS view_id
       |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
       |cand AS (SELECT c.event_id, v.view_id, v.vts,
       |    abs(epoch_us(c.ts) - epoch_us(v.vts)) AS gap,
       |    CASE WHEN v.vts <= c.ts THEN 0 ELSE 1 END AS fwd
       |  FROM c JOIN v ON c.user_id = v.user_id
       |  WHERE abs(epoch_us(c.ts) - epoch_us(v.vts)) <= $NearestTolUs),
       |best AS (SELECT event_id, min_by(view_id, gap * 2 + fwd) AS view_id,
       |    min_by(vts, gap * 2 + fwd) AS vts
       |  FROM cand GROUP BY event_id)
       |SELECT c.event_id AS click_id, c.user_id, b.view_id,
       |  (epoch_us(c.ts) - epoch_us(b.vts))::BIGINT AS gap_us
       |FROM c LEFT JOIN best b ON b.event_id = c.event_id
       |ORDER BY click_id""".stripMargin

  // --------------------------------------------------- streaming as-of

  /** Tagged union row for the streaming as-of (micros keep ordering exact;
    * tsUs is optional so a null LEFT event time flows through as a row
    * instead of killing the query at the non-nullable encoder). Sides:
    * 0 = right, 1 = left, 2 = forget control record (an `op = "forget"`
    * row from EITHER input — the
    * [[graft.streaming.CurationStream.OpForget]] convention); the
    * (tsUs, side) sort puts a same-instant forget after both sides, so
    * erasure is effective from its instant onward. `ts` carries the
    * watermark-tagged event time when a horizon is armed.
    */
  final case class StreamEv(k: String, tsUs: Option[Long], side: Int,
                            pay: String, ts: java.sql.Timestamp = null)

  /** One enriched left row: the latest right payload/ts seen at or before it. */
  final case class StreamMatch(k: String, ts_us: Option[Long], value: String,
                               match_pay: Option[String], match_ts_us: Option[Long])

  /** Per-key state + batch fold shared by the streaming op and its spec:
    * rows event-time-sorted with right-before-left at the same instant
    * (the batch [[asOf]] inclusive-<= tie rule); right rows advance the
    * (ts, payload) state, left rows emit the current state ONLY when its
    * event time is at-or-before their own (state newer than the left row
    * = an out-of-order arrival the state can't rewind for; the row emits
    * unmatched rather than matched-to-its-future). A left row with NO
    * event time emits unmatched — `vts <= NULL` is never true in the
    * batch/oracle semantics, so it must not read the state.
    */
  def foldAsOf(horizonMs: Option[Long])(key: String, rows: Iterator[StreamEv],
               state: org.apache.spark.sql.streaming.GroupState[(Long, String)])
      : Iterator[StreamMatch] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
    var cur: Option[(Long, String)] = state.getOption
    val batch = rows.toSeq
    // within-batch duplicate check FIRST, independent of the carried
    // state: two conflicting right rows at one ts must die even when both
    // are older than the state (the stale branch below would otherwise
    // swallow them). NOTE the honest limit vs the batch guard: a conflict
    // between batches at a ts STRICTLY OLDER than the carried state is
    // undetectable with O(1) state — the stream remembers one (ts,
    // payload) pair, not history; enforce upstream dedup for that case.
    batch.filter(e => e.side == 0 && e.tsUs.isDefined)
      .groupBy(_.tsUs)
      .collectFirst { case (Some(t), es) if es.map(_.pay).distinct.sizeIs > 1 => t }
      .foreach(t => throw new IllegalArgumentException(
        s"as-of stream: conflicting right rows at (key=$key, ts=$t) — " +
          "pre-aggregate right to one row per (key, ts)"))
    val out = batch.sortBy(e => (e.tsUs.getOrElse(Long.MinValue), e.side)).flatMap { e =>
      if (e.side == 2) {
        // forget control record: the key's carried (ts, payload) is
        // purged from this instant onward — a later left row in this
        // batch (or any after) can only match a right row that ALSO
        // arrives after the forget
        cur = None
        None
      } else if (e.side == 0) {
        // the batch asOf's two enforced preconditions, enforced HERE too
        // (an exception stops the query — the rapid's error-stop
        // contract, same as a raise_error in the batch plan):
        // a null payload is indistinguishable from "no match yet"...
        if (e.pay == null) throw new IllegalArgumentException(
          s"as-of stream: right payload is null at (key=$key, ts=${e.tsUs}) — " +
            "filter or coalesce right rows first")
        // ...and duplicate (key, ts) right rows make "latest at t"
        // arrival-order-arbitrary. An identical re-delivery (same ts AND
        // same payload) is an idempotent no-op and passes — at-least-once
        // sources replay records; only a CONFLICTING duplicate dies.
        e.tsUs.foreach { t =>
          cur match {
            case Some((pt, pp)) if pt == t && pp != e.pay =>
              throw new IllegalArgumentException(
                s"as-of stream: conflicting right rows at (key=$key, ts=$t) — " +
                  "pre-aggregate right to one row per (key, ts)")
            case Some((pt, _)) if t < pt =>
              () // late right row OLDER than the state: stale — "latest
                 // wins" must not regress to it
            case _ => cur = Some((t, e.pay))
          }
        }
        None
      }
      else if (e.tsUs.isEmpty) Some(StreamMatch(key, None, e.pay, None, None))
      else {
        // the carried state can be NEWER than a late-arriving left row
        // (state can't rewind) — enriching it with a payload from the
        // row's event-time FUTURE would be silently event-time-wrong, so
        // emit it unmatched instead: a violation of the in-order-arrival
        // contract becomes an observable null match, never a wrong one.
        // In-order keys never hit this (state ts <= left ts by arrival
        // order, with <= covering the same-instant right-first tie rule),
        // so the batch-equivalence property is untouched.
        val m = cur.filter(_._1 <= e.tsUs.get)
        Some(StreamMatch(key, e.tsUs, e.pay, m.map(_._2), m.map(_._1)))
      }
    }
    cur match {
      case Some(c) =>
        state.update(c)
        horizonMs.foreach { h =>
          // deadline anchor: the later of the carried right instant and
          // this batch's max event time (left arrivals are activity too)
          val anchor = (c._1 +: batch.flatMap(_.tsUs)).max
          state.setTimeoutTimestamp(math.max(
            anchor / 1000L + h, state.getCurrentWatermarkMs() + 1))
        }
      case None =>
        // an erased key leaves NOTHING behind (and a key that never
        // carried a right row was never stored to begin with)
        if (state.exists) state.remove()
    }
    out.iterator
  }

  /** STREAM-ORDER as-of enrichment — the unbounded-stream form of [[asOf]]:
    * a left stream (key, ts, value) enriched with the latest preceding
    * right payload per key, via keyed state (`flatMapGroupsWithState`)
    * over the tagged union of both streams.
    *
    * The contract is stream-time, stated honestly: a left row matches the
    * latest right row APPLIED to state at or before it — which equals the
    * event-time [[asOf]] exactly when each key's rows ARRIVE in event-time
    * order (what per-key sticky Kafka partitioning gives the rapid: one
    * partition per key is totally ordered). A right row arriving LATE —
    * after a left row of larger event time was already emitted — does not
    * retro-match it; within a micro-batch, rows are event-time sorted
    * (right before left at the same instant, the batch tie rule), so
    * intra-batch disorder is absorbed.
    *
    * Scale shape: state is ONE (ts, payload) pair per key — the enrichment
    * dimension's live size, not the stream's history — partitioned by key
    * across executors like all keyed state; each micro-batch shuffles once
    * on the key. The 100 TB/day form of click-to-view attribution, running
    * continuously instead of re-scanning a day's events.
    *
    * Both inputs must be streaming DataFrames with columns (key, ts,
    * value/payload); ts is event-time (TimestampType).
    */
  def asOfStream(left: DataFrame, key: String, leftTs: String, value: String,
                 right: DataFrame, rightTs: String, payload: String,
                 horizonMs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.streaming.CurationStream.{opCol, OpForget}
    // the forget control convention: an optional `op` column on EITHER
    // input marks erasure records (side 2); they carry the key and event
    // time, purge the key's carried (ts, payload) in their micro-batch,
    // and a same-instant forget applies after both sides' rows
    def side(df: DataFrame, dataSide: Int): Column =
      when(opCol(df) === OpForget, 2).otherwise(dataSide)
    val l = left.select(col(key).cast("string").as("k"),
      unix_micros(col(leftTs)).as("tsUs"), side(left, 1).as("side"),
      col(value).cast("string").as("pay"),
      col(leftTs).cast("timestamp").as("ts"))
    // same null semantics as the batch [[prepSides]]: null-key / null-ts
    // RIGHT rows are dropped (they can never match anything; letting them
    // into the null-key state group would silently enrich null-key left
    // rows, which the batch join semantics forbid)
    val r = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).cast("string").as("k"),
        unix_micros(col(rightTs)).as("tsUs"), side(right, 0).as("side"),
        col(payload).cast("string").as("pay"),
        col(rightTs).cast("timestamp").as("ts"))
    val u0 = l.unionByName(r)
    // `horizonMs` bounds the ever-seen-key state accretion (the
    // [[graft.streaming.CurationStream.firstSeen]] convention): a key
    // with no arrivals on either side for h evicts when the watermark
    // passes — the next left row starts unenriched, exactly as if the
    // key were new; within the horizon, semantics are unchanged
    val u = horizonMs match {
      case Some(h) => u0.withWatermark("ts", s"$h milliseconds")
      case None    => u0
    }
    val timeout =
      if (horizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    u.as[StreamEv]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(foldAsOf(horizonMs))
      .toDF()
  }

  // ---------------------------------------------- streaming nearest as-of

  /** Tagged union row for the streaming NEAREST as-of: `ts` (timestamp)
    * carries the watermark, `tsUs` the exact microseconds (Timestamp
    * getTime is ms-truncated), null event times flow as None.
    */
  final case class NearEv(k: String, ts: java.sql.Timestamp, tsUs: Option[Long],
                          side: Int, pay: String)

  /** Keyed state: pending undecided left rows + the right-row buffer
    * within the reachable horizon.
    */
  final case class NearState(pend: List[(Long, String)],
                             rights: List[(Long, String)])

  /** One decided left row: the nearest right payload/ts within tolerance,
    * or unmatched.
    */
  final case class NearMatch(k: String, ts_us: Option[Long], value: String,
                             match_pay: Option[String], match_ts_us: Option[Long])

  /** STREAMING nearest as-of — [[asOfNearest]] semantics over two live
    * streams. Unlike the backward-only [[asOfStream]] (which can emit a
    * left row the moment it arrives — its match can only be in the past),
    * a NEAREST match may still be beaten by a closer FORWARD right row
    * that has not arrived yet, so a left row is decidable only once the
    * watermark passes its forward horizon `lt + tolUs`: by the watermark
    * contract no right row at or before that instant can still arrive,
    * and every candidate is in hand. Left rows buffer in keyed state
    * until then (an event-time timer fires the decision when no new data
    * does); right rows buffer within the reachable horizon and are
    * EVICTED once older than both `min(pending) - tol` and
    * `watermark - tol` (a future left admitted by the watermark has
    * `lt >= watermark`, so older rights are unreachable by ANY future or
    * pending row) — state is bounded by arrival rate x tolerance, never
    * the stream's lifetime. Same tie rule as batch (equal gap -> the
    * backward, causal row), same enforced preconditions (conflicting
    * duplicate rights die; idempotent redeliveries pass; null payloads
    * die; null-ts/key rows never match), and decided rows emit in
    * event-time order per key. The input union must carry a watermark
    * ([[asOfNearestStream]] applies it).
    */
  def foldNearest(tolUs: Long)(key: String, rows: Iterator[NearEv],
      state: org.apache.spark.sql.streaming.GroupState[NearState])
      : Iterator[NearMatch] = {
    val st0 = state.getOption.getOrElse(NearState(Nil, Nil))
    var pend = st0.pend
    var rights = st0.rights
    val immediate = scala.collection.mutable.ArrayBuffer.empty[NearMatch]
    rows.toSeq.sortBy(e => (e.tsUs.getOrElse(Long.MinValue), e.side)).foreach { e =>
      if (e.side == 0) {
        if (e.pay == null) throw new IllegalArgumentException(
          s"nearest as-of stream: right payload is null at (key=$key, ts=${e.tsUs})")
        e.tsUs.foreach { t =>
          rights.find(_._1 == t) match {
            case Some((_, pp)) if pp != e.pay =>
              throw new IllegalArgumentException(
                s"nearest as-of stream: conflicting right rows at (key=$key, ts=$t) — " +
                  "pre-aggregate right to one row per (key, ts)")
            case Some(_) => () // idempotent redelivery
            case None => rights ::= (t, e.pay)
          }
        }
      } else e.tsUs match {
        // a null-ts left can never match: decidable immediately
        case None => immediate += NearMatch(key, None, e.pay, None, None)
        case Some(t) => pend ::= (t, e.pay)
      }
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, still) = pend.partition { case (lt, _) => lt + tolUs < wmUs }
    val decided = ready.sortBy(_._1).map { case (lt, v) =>
      val cands = rights.flatMap { case (rt, p) =>
        val gap = math.abs(rt - lt)
        if (gap <= tolUs) Some(((gap, if (rt <= lt) 0 else 1), (p, rt))) else None
      }
      if (cands.isEmpty) NearMatch(key, Some(lt), v, None, None)
      else {
        val (p, rt) = cands.minBy(_._1)(Ordering.Tuple2[Long, Int])._2
        NearMatch(key, Some(lt), v, Some(p), Some(rt))
      }
    }
    val keepFrom = math.min(
      still.map(_._1).minOption.getOrElse(Long.MaxValue) - tolUs,
      wmUs - tolUs)
    rights = rights.filter(_._1 >= keepFrom)
    if (still.isEmpty && rights.isEmpty) state.remove()
    else {
      state.update(NearState(still, rights))
      // next decision instant: the earliest pending left's horizon, or —
      // rights-only state — the instant the last right becomes
      // unreachable (pure GC); clamped above the watermark (Spark
      // rejects an already-expired timer)
      val deadlineUs =
        if (still.nonEmpty) still.map(_._1).min + tolUs
        else rights.map(_._1).max + 2 * tolUs
      state.setTimeoutTimestamp(
        math.max(deadlineUs / 1000L + 1, state.getCurrentWatermarkMs() + 1))
    }
    (immediate ++ decided).iterator
  }

  /** Streaming twin of [[asOfNearest]]: tag, union, watermark, keyed fold.
    * `delay` is the watermark delay on the union's event time — it bounds
    * how late a row may arrive AND (plus `tolUs`) the decision latency of
    * each left row.
    */
  def asOfNearestStream(left: DataFrame, key: String, leftTs: String, value: String,
                        right: DataFrame, rightTs: String, payload: String,
                        tolUs: Long, delay: String): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val l = left.select(col(key).cast("string").as("k"),
      col(leftTs).cast("timestamp").as("ts"),
      unix_micros(col(leftTs)).as("tsUs"), lit(1).as("side"),
      col(value).cast("string").as("pay"))
    val r = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).cast("string").as("k"),
        col(rightTs).cast("timestamp").as("ts"),
        unix_micros(col(rightTs)).as("tsUs"), lit(0).as("side"),
        col(payload).cast("string").as("pay"))
    l.unionByName(r)
      .withWatermark("ts", delay)
      .as[NearEv]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(foldNearest(tolUs))
      .toDF()
  }
  // ----------------------------------------------------- streaming funnel

  /** Tagged funnel event: side 0 = signup, 1 = view, 2 = purchase,
    * 3 = forget (the erasure control record) — the intra-batch sort
    * order at one instant, mirroring the batch chain's inclusive-<= tie
    * rules (a signup at the view's instant matches it; a view at the
    * purchase's instant matches it; a forget at an instant erases AFTER
    * that instant's purchases attribute — erasure effective from t
    * onward, the same inclusive boundary). `ts` carries the
    * watermark-tagged event time through to the stateful operator (the
    * GateRow convention — the fold itself reads only `tsUs`); null when
    * no horizon is armed.
    */
  final case class FunnelEv(k: String, tsUs: Long, side: Int, id: Long,
                            ts: java.sql.Timestamp = null)

  /** O(1) per-user funnel state: the latest signup, and the latest view
    * WITH the signup that was current when it arrived — the chained
    * as-of, folded forward. `seenTsUs` is the user's LIFETIME max event
    * time (since the last erasure), carried so the horizon deadline
    * never moves backward: a late-arriving OLDER event re-arming the
    * timeout from only its own batch's max would pull an already-armed
    * deadline earlier and evict the user before the documented
    * max-event-time + horizon.
    */
  final case class FunnelSt(sigTs: Option[Long], sigId: Option[Long],
                            viewTs: Option[Long], viewId: Option[Long],
                            viewSigId: Option[Long],
                            seenTsUs: Long = Long.MinValue)

  /** One funnel row per purchase: its as-of view and that view's as-of
    * signup (the w16 semantics — step 2 anchors at the MATCHED VIEW's
    * instant, not the purchase's).
    */
  final case class FunnelRow(user_id: String, purchase_id: Long,
                             view_id: Option[Long], signup_id: Option[Long])

  /** Per-key fold shared by [[funnelStream]] and its spec: rows sort by
    * (instant, side, id); a signup advances the signup state
    * (latest-wins, larger id at the same instant — the batch's
    * per-(user, ts) max(event_id) pre-aggregation); a view advances the
    * view state AND freezes the then-current as-of signup into it (under
    * in-order arrival that is exactly `signup as-of vts`); a purchase
    * emits the stored view at-or-before its own instant, or unmatched —
    * the [[foldAsOf]] no-rewind rule: an out-of-order purchase older
    * than the stored view emits observably unmatched, never matched to
    * its event-time future. A forget record (side 3 — the user's
    * erasure request riding the stream as a control event, the p53
    * delete-list's online form) resets the fold to empty: the erased
    * signup/view can never attribute a later purchase, in this batch or
    * any after, and an all-empty end state is REMOVED, not stored — an
    * erased user leaves no key behind.
    *
    * `horizonMs` is the event-time state horizon (the
    * [[graft.streaming.CurationStream.firstSeen]] precedent): each batch
    * re-arms an event-time timeout at the user's LIFETIME max event time
    * + horizon (tracked in [[FunnelSt.seenTsUs]], reset by a forget),
    * clamped above the current watermark, and a user idle past it is
    * evicted when the watermark passes — the next purchase starts from
    * empty state, exactly as if the user were new. Lifetime, not the
    * batch's max: a late straggler must never pull an armed deadline
    * earlier.
    */
  def foldFunnel(horizonMs: Option[Long])(key: String,
      rows: Iterator[FunnelEv],
      state: org.apache.spark.sql.streaming.GroupState[FunnelSt])
      : Iterator[FunnelRow] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val empty = FunnelSt(None, None, None, None, None)
      var st = state.getOption.getOrElse(empty)
      // lifetime max event time, reset by a forget: an erased user is new
      var seen = st.seenTsUs
      st = st.copy(seenTsUs = Long.MinValue)
      val rs = rows.toSeq.sortBy(e => (e.tsUs, e.side, e.id))
      val out = rs.flatMap { e =>
        if (e.side != 3) seen = math.max(seen, e.tsUs)
        e.side match {
          case 0 =>
            val newer = st.sigTs.forall(t => e.tsUs > t ||
              (e.tsUs == t && st.sigId.forall(e.id > _)))
            if (newer) st = st.copy(sigTs = Some(e.tsUs), sigId = Some(e.id))
            Nil
          case 1 =>
            val newer = st.viewTs.forall(t => e.tsUs > t ||
              (e.tsUs == t && st.viewId.forall(e.id > _)))
            if (newer) {
              val sig =
                if (st.sigTs.exists(_ <= e.tsUs)) st.sigId else None
              st = st.copy(viewTs = Some(e.tsUs), viewId = Some(e.id),
                viewSigId = sig)
            }
            Nil
          case 2 =>
            val ok = st.viewTs.exists(_ <= e.tsUs)
            Seq(FunnelRow(key, e.id,
              if (ok) st.viewId else None,
              if (ok) st.viewSigId else None))
          case _ =>
            st = empty
            seen = Long.MinValue
            Nil
        }
      }
      if (st == empty) {
        // nothing worth storing: a purchase against empty state emits
        // unmatched with or without a stored empty row, and a forget
        // that ends the batch empty must leave NO key behind
        if (state.exists) state.remove()
      } else {
        state.update(st.copy(seenTsUs = seen))
        horizonMs.foreach { h =>
          if (seen != Long.MinValue)
            state.setTimeoutTimestamp(
              math.max(seen / 1000L + h, state.getCurrentWatermarkMs() + 1))
        }
      }
      out.iterator
    }

  /** STREAMING FUNNEL — the w16 chained as-of running continuously: one
    * events stream, per-user keyed state, one emitted row per purchase
    * carrying its as-of view and that view's as-of signup. Equals the
    * batch [[funnel]]'s per-purchase chain exactly when each user's
    * events ARRIVE in event-time order (the [[asOfStream]] contract);
    * intra-batch disorder is absorbed by the (instant, side, id) sort.
    * The same-instant tie rules (signup before view before purchase)
    * are likewise enforceable only WITHIN a micro-batch — a signup at
    * exactly the view's instant that arrives in a LATER batch cannot
    * retro-enter the already-frozen view state, the one equal-timestamp
    * corner where "arrival in event-time order" under-determines the
    * batch order (the asOfStream contract's same caveat).
    *
    * Scale shape: state is FIVE scalars per user — not the user's
    * history — partitioned by key like all keyed state; each micro-batch
    * shuffles once on user_id. WHICH users hold state is the
    * `horizonMs` knob: None keeps a key per EVER-SEEN user (five
    * scalars each — survivable on RocksDB for bounded user populations,
    * and the exact-equals-batch mode), while Some(h) applies the
    * [[graft.streaming.CurationStream.firstSeen]] event-time horizon —
    * users idle past h are evicted when the watermark passes, bounding
    * state by arrival rate × horizon on a years-long rapid; what the
    * horizon trades away is only attribution ACROSS gaps longer than
    * itself (a returning user's pre-gap signup no longer attributes).
    *
    * Erasure reaches the RUNNING query (no restart): a `forget` control
    * event for a user purges the key's state in its micro-batch — the
    * erased signup/view can never attribute a purchase again, and the
    * key itself is removed from the store. The continuous form of the
    * funnel a batch job re-derives from scratch each day.
    */
  def funnelStream(events: DataFrame,
                   horizonMs: Option[Long] = None): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val base0 = events.filter(col("ts").isNotNull &&
      col("event_type").isin("signup", "view", "purchase", "forget"))
    val base = horizonMs match {
      case Some(h) => base0.withWatermark("ts", s"$h milliseconds")
      case None    => base0
    }
    val timeout =
      if (horizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    base
      .select(col("user_id").cast("string").as("k"),
        unix_micros(col("ts")).as("tsUs"),
        when(col("event_type") === "signup", 0)
          .when(col("event_type") === "view", 1)
          .when(col("event_type") === "purchase", 2)
          .otherwise(3).as("side"),
        col("event_id").as("id"),
        col("ts"))
      .as[FunnelEv]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(foldFunnel(horizonMs))
      .toDF()
  }
}

/** Banded event-time RANGE join — as-of's sibling among the operators
  * Spark lacks a scale-safe plan for: all (left, right) pairs within a key
  * where ts_right lands in [ts_left, ts_left + window].
  *
  * A direct `l.key = r.key AND r.ts BETWEEN ...` join keeps the range
  * predicate OUT of the hash key — Spark equi-joins on the key alone and
  * post-filters, so one hot key (a bot user, a boilerplate domain) owns an
  * |L|x|R| pair blowup on a single reducer. The banded form quantizes time
  * into window-width buckets and makes the BUCKET part of the equi-join
  * key: a left row joins only buckets b and b+1 (the two a window starting
  * inside bucket b can reach), so candidate volume is bounded by temporal
  * co-location, not by key cardinality — the same blocking idea as
  * [[Dedup.editDistancePairs]] and the LSH band join, applied to time.
  * Candidates then pass the exact range filter; a pair appears exactly
  * once (the right row lives in one bucket).
  */
object RangeJoin {

  /** Attribution window (microseconds) for the w8 query: purchases within
    * 6 hours of a signup.
    */
  val WindowUs: Long = 6L * 3600 * 1000000

  /** All (left, right) pairs with rightTs in [leftTs, leftTs + windowUs]
    * per key. Caller renames columns so the two sides don't collide.
    */
  def banded(left: DataFrame, key: String, leftTs: String,
             right: DataFrame, rightTs: String, windowUs: Long): DataFrame = {
    // integer `div` keeps bucket math exact at epoch-micros magnitudes
    val lb = expr(s"unix_micros($leftTs) div $windowUs")
    val l = left.withColumn("__b", explode(array(lb, lb + 1)))
    val r = right.withColumn("__b", expr(s"unix_micros($rightTs) div $windowUs"))
    l.join(r, Seq(key, "__b"))
      .filter((unix_micros(col(rightTs)) - unix_micros(col(leftTs)))
        .between(0, windowUs))
      .drop("__b")
  }

  /** Signup-to-purchase attribution (w8): every purchase within
    * [[WindowUs]] of the same user's signup, with the microsecond gap.
    */
  def signupPurchases(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("sts"), col("event_id").as("signup_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    banded(signups, "user_id", "sts", purchases, "pts", WindowUs)
      .select(col("signup_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("pts")) - unix_micros(col("sts"))).as("gap_us"))
      .orderBy(col("signup_id"), col("purchase_id"))
  }

  val sqlSignupPurchases: String =
    s"""WITH s AS (SELECT user_id, ts AS sts, event_id AS signup_id
       |  FROM events WHERE event_type = 'signup'),
       |p AS (SELECT user_id, ts AS pts, event_id AS purchase_id
       |  FROM events WHERE event_type = 'purchase')
       |SELECT s.signup_id, p.purchase_id, s.user_id,
       |  (epoch_us(p.pts) - epoch_us(s.sts))::BIGINT AS gap_us
       |FROM s JOIN p ON s.user_id = p.user_id
       |  AND epoch_us(p.pts) - epoch_us(s.sts) BETWEEN 0 AND $WindowUs
       |ORDER BY signup_id, purchase_id""".stripMargin

  /** STREAM-STREAM interval join — [[signupPurchases]] with BOTH sides
    * unbounded (the one join Structured Streaming can run without keyed
    * state code): watermarks on both event times plus the two-sided time
    * condition let Spark bound the join state — a signup can be evicted
    * once the purchase-side watermark passes sts + window (no purchase
    * that could still match is in flight), so state is watermark-horizon
    * × arrival-rate, not stream length. Inner join in append mode emits
    * each pair exactly once; under ordered-within-watermark ingest the
    * emitted set EQUALS the batch [[signupPurchases]] pairs.
    *
    * At 100 TB-rates this replaces the banded batch join for the online
    * path: same pair semantics, state bounded by the same window that
    * bounds the batch candidate volume.
    */
  def signupPurchasesStream(signups: DataFrame, purchases: DataFrame,
                            delay: String = "1 hour"): DataFrame = {
    val s = signups
      .select(col("user_id").as("s_user"), col("ts").as("sts"),
        col("event_id").as("signup_id"))
      .withWatermark("sts", delay)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        col("event_id").as("purchase_id"))
      .withWatermark("pts", delay)
    s.join(p,
        col("s_user") === col("p_user") &&
          col("pts") >= col("sts") &&
          col("pts") <= col("sts") + expr(s"INTERVAL $WindowUs MICROSECOND"))
      .select(col("signup_id"), col("purchase_id"), col("s_user").as("user_id"),
        (unix_micros(col("pts")) - unix_micros(col("sts"))).as("gap_us"))
  }

  // --------------------------------------------- w25 multi-touch attribution

  /** Lookback window for multi-touch attribution: 3 days in micros. */
  val TouchWindowUs: Long = 3L * 86400 * 1000000

  /** Linear multi-touch attribution (w25): each purchase's value splits
    * EQUALLY across every click/view by the same user in the strict 3-day
    * lookback (t.ts < p.ts), rolled up to attributed revenue per (purchase
    * day, touch type); purchases with no touch in window land whole under
    * 'direct'. The marketing-attribution twin of w7's last-touch as-of.
    *
    * Exactness: value is carried as 6-dp integer micro-currency (the w22
    * decimal trick, folded to BIGINT), each touch's share is the integer
    * `(xvm · n_type) div n_touches` — truncation loses at most
    * n_touches−1 micro-units per (purchase, type), deterministically in
    * both engines — and every sum after is integer. `attr_micro` is the
    * exact ledger; `attributed` is its 6-dp display form.
    *
    * Scale shape: candidate pairs come from [[banded]] (time-bucketed
    * equi-join, per-pair exactly once); the per-purchase normalizer is a
    * window over (purchase_id) — purchases×types rows, bounded fan-in;
    * the 'direct' remainder is a left-anti on purchase_id. No per-key
    * |L|×|R| blowup anywhere.
    */
  def multiTouch(events: DataFrame): DataFrame = {
    val xvm = (round(col("value"), 6).cast("decimal(18,6)") * lit(1000000))
      .cast("long")
    val touches = events
      .filter(col("event_type").isin("click", "view") && col("ts").isNotNull)
      .select(col("user_id"), col("ts").as("tts"), col("event_type").as("touch_type"))
    val purchases = events
      .filter(col("event_type") === "purchase" && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"), xvm.as("xvm"))
    val pairs = banded(touches, "user_id", "tts", purchases, "pts", TouchWindowUs)
      .filter(unix_micros(col("pts")) - unix_micros(col("tts")) >= 1)
      .select(col("purchase_id"), to_date(col("pts")).as("day"), col("xvm"),
        col("touch_type"))
    val g = pairs.groupBy(col("purchase_id"), col("day"), col("xvm"), col("touch_type"))
      .agg(count(lit(1)).as("n_t"))
      .withColumn("n", sum(col("n_t"))
        .over(Window.partitionBy(col("purchase_id"))))
    val attr = g.select(col("day"), col("touch_type"), col("purchase_id"),
      col("n_t"), expr("(xvm * n_t) div n").as("amt"))
    val direct = purchases
      .join(pairs.select(col("purchase_id")).distinct(), Seq("purchase_id"), "left_anti")
      .select(to_date(col("pts")).as("day"), lit("direct").as("touch_type"),
        col("purchase_id"), lit(0L).as("n_t"), col("xvm").as("amt"))
    attr.unionByName(direct)
      .groupBy(col("day"), col("touch_type"))
      .agg(countDistinct(col("purchase_id")).as("n_purch"),
        sum(col("n_t")).as("n_pairs"), sum(col("amt")).as("attr_micro"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("touch_type"),
        col("n_purch"), col("n_pairs"), col("attr_micro"),
        round(col("attr_micro").cast("double") / 1000000, 6).as("attributed"))
      .orderBy(col("day"), col("touch_type"))
  }

  /** Oracle for [[multiTouch]]: plain range predicate stands in for the
    * banded candidate join (identical pair set); same integer ledger.
    */
  val sqlMultiTouch: String =
    s"""WITH t AS (SELECT user_id, ts AS tts, event_type AS touch_type
       |  FROM events WHERE event_type IN ('click', 'view') AND ts IS NOT NULL),
       |p AS (SELECT event_id AS purchase_id, user_id, ts AS pts,
       |    CAST(round(value, 6)::DECIMAL(18,6) * 1000000 AS BIGINT) AS xvm
       |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
       |    AND value IS NOT NULL),
       |pr AS (SELECT p.purchase_id, p.pts::DATE AS day, p.xvm, t.touch_type
       |  FROM p JOIN t ON t.user_id = p.user_id
       |    AND epoch_us(p.pts) - epoch_us(t.tts) BETWEEN 1 AND $TouchWindowUs),
       |g AS (SELECT purchase_id, day, xvm, touch_type, count(*)::BIGINT AS n_t
       |  FROM pr GROUP BY 1, 2, 3, 4),
       |gn AS (SELECT *, sum(n_t) OVER (PARTITION BY purchase_id) AS n FROM g),
       |attr AS (SELECT day, touch_type, purchase_id, n_t,
       |    ((xvm * n_t) // n)::BIGINT AS amt FROM gn
       |  UNION ALL
       |  SELECT pts::DATE AS day, 'direct' AS touch_type, purchase_id,
       |    0::BIGINT AS n_t, xvm AS amt
       |  FROM p WHERE purchase_id NOT IN (SELECT purchase_id FROM pr))
       |SELECT strftime(day, '%Y-%m-%d') AS day, touch_type,
       |  count(DISTINCT purchase_id)::BIGINT AS n_purch,
       |  sum(n_t)::BIGINT AS n_pairs, sum(amt)::BIGINT AS attr_micro,
       |  round(sum(amt)::DOUBLE / 1000000, 6) AS attributed
       |FROM attr GROUP BY 1, 2 ORDER BY day, touch_type""".stripMargin
}
