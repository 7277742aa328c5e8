package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time windowing over the events stream-table: tumbling windows,
  * gap-based sessionization, latest-per-key dedup. Batch forms here (oracle-
  * checkable); the same expressions run under Structured Streaming with
  * withWatermark (graft.streaming).
  */
object EventWindows {

  /** Session gap in microseconds (30 min). */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Tumbling 1-hour window counts/sums per event_type — the watermarked
    * windowed agg of SURVEY §2.7 in batch form (window() aligns to epoch,
    * identical to date_trunc for whole-hour widths).
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("hour"), col("event_type"))

  val sqlTumblingHourly: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Trailing time-RANGE frame width (1 hour, microseconds). */
  val RangeFrameUs: Long = 3600L * 1000000

  /** Per-user trailing 1-HOUR window at every event (w10): count and
    * value-sum over the TIME-based frame [t − 1h, t] — the frame a row
    * frame (w4) cannot express: "last N rows" is "last hour" only for a
    * perfectly regular stream; for a bursty user N rows spans seconds and
    * for an idle one days. RANGE puts the boundary in event time, which
    * is what rate limits, rolling exposure counts and activity scores
    * actually mean.
    *
    * Scale shape: one hash exchange on user_id + one partition-local sort
    * — identical cost to any per-key window; the frame bound adds no
    * shuffle. A pathological hot key serializes its own scan (inherent to
    * per-key ordering); the w9 bucketing idea applies if one key owns the
    * stream.
    */
  def rangeFrame(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-RangeFrameUs, Window.currentRow)
    // null event times are EXCLUDED explicitly: a row with no event time
    // has no place on a time axis, and leaving it in would also diverge
    // cross-engine (Spark sorts NULLS FIRST, DuckDB NULLS LAST — the
    // null "frame peers" group differs). The filter pins the semantics
    // identically in both plans instead of relying on fixture luck.
    events.filter(col("ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value")).over(w), 2).as("sum_1h"))
      .orderBy(col("event_id"))
  }

  val sqlRangeFrame: String =
    s"""SELECT event_id, user_id,
       |  CAST(count(*) OVER win AS BIGINT) AS n_1h,
       |  round(sum(value) OVER win, 2) AS sum_1h
       |FROM events
       |WHERE ts IS NOT NULL
       |WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |  RANGE BETWEEN $RangeFrameUs PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** w22 minimum history: an anomaly verdict needs at least this many
    * strictly-earlier events in the trailing day.
    */
  val AnomMinHist = 5

  /** w22 trailing-history frame: 24 hours in microseconds — sized to the
    * fixture's event density (~2 events per user-day); a verdict needs a
    * day of personal history, not an hour.
    */
  val AnomFrameUs = 86400000000L

  /** TRAILING-HISTORY ANOMALY Z-SCORE (w22) — each event scored against
    * its user's OWN trailing day, current event excluded: z = (x − μ)/σ over
    * the RANGE frame [t−24h, t), |z| > 3 flags the anomaly. The
    * self-calibrating rate/value monitor (fraud spikes, sensor glitches,
    * abuse bursts) — w10's event-time frame turned into a verdict.
    *
    * FP contract: the frame aggregates are DECIMAL sums of the 6-dp
    * rounded value and its square — exact in ANY accumulation order, so
    * the segment-tree vs running-accumulator difference between engines
    * cannot surface. The variance numerator n·Σx² − (Σx)² stays in exact
    * integer/decimal arithmetic; only the final two divisions and the
    * sqrt run in double, in one fixed expression order. σ = 0 (constant
    * history) yields a null z in both engines by an explicit guard, never
    * an engine-specific inf/NaN.
    *
    * Scale shape: identical to w10 — one hash exchange on user_id, one
    * partition-local sort, three frame aggregates off the same run.
    */
  def anomalyZ(events: DataFrame): DataFrame = {
    val x = round(col("value"), 6).cast("decimal(18,6)")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-AnomFrameUs, -1L)
    val framed = events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"), x.as("xv"),
        count(lit(1)).over(w).as("n_hist"),
        sum(x).over(w).as("s"),
        sum((x * x).cast("decimal(38,12)")).over(w).as("ss"))
      .filter(col("n_hist") >= AnomMinHist)
    val varNum = (col("n_hist") * col("ss") - (col("s") * col("s")).cast("decimal(38,12)"))
      .cast("double")
    val variance = varNum / (col("n_hist") * (col("n_hist") - 1)).cast("double")
    val sd = sqrt(variance)
    val z = when(variance > 0.0,
      (col("xv").cast("double") - col("s").cast("double") / col("n_hist")) / sd)
    framed.select(col("event_id"), col("user_id"), col("n_hist"),
        round(z, 4).as("z"),
        (z.isNotNull && abs(z) > 3.0).as("is_anom"))
      .orderBy(col("event_id"))
  }

  /** Input row for [[anomalyZStream]] — `v` is the RAW value; the 6-dp
    * decimal rounding happens inside the fold with the exact Java
    * sequence Spark's round() uses, so the streamed arithmetic replays
    * the batch expression bit-for-bit. `op` is the
    * [[graft.streaming.CurationStream.OpForget]] control tag ("add" when
    * the input has no op column); `ts` carries the watermark-tagged
    * event time when a horizon is armed (the GateRow convention).
    */
  final case class AnomEv(k: Long, tsUs: Long, eventId: Long, v: Double,
                          op: String = "add",
                          ts: java.sql.Timestamp = null)

  /** One streamed anomaly verdict (same columns as the batch w22). */
  final case class AnomOut(event_id: Long, user_id: Long, n_hist: Long,
                           z: Option[Double], is_anom: Boolean)

  /** STREAMING anomaly z-score — [[anomalyZ]] as keyed state: each user's
    * trailing-day history ((tsUs, 6-dp decimal) pairs) lives in state;
    * an arriving event is scored against the history BEFORE insertion,
    * with same-instant peers scored together first (the batch frame's
    * exclusive upper bound excludes ts-peers — the fold preserves that by
    * batching same-tsUs arrivals). Entries older than the frame are
    * evicted on every arrival, so per-key state is bounded by
    * arrival-rate × frame width BY CONSTRUCTION. Under per-key ordered
    * ingest the streamed verdicts EQUAL the batch w22 rows.
    *
    * Arithmetic contract: the fold replays the batch expression sequence
    * verbatim — BigDecimal.valueOf(raw).setScale(6, HALF_UP) (Spark's
    * round()), exact decimal sums of x and x², the exact decimal
    * variance numerator, then the identical double divisions/sqrt and
    * the HALF_UP 4-dp z rounding.
    *
    * Per-key state is bounded by arrival-rate × frame BY CONSTRUCTION,
    * but WHICH users hold a key is the `horizonMs` knob (the
    * [[graft.streaming.CurationStream.firstSeen]] convention): None
    * keeps a key per ever-seen user forever; Some(h) arms an event-time
    * timeout at the user's max HELD event time + h (the history's newest
    * entry — the lifetime max, so a late straggler never pulls an armed
    * deadline earlier) and evicts idle users when the watermark passes —
    * the next arrival rebuilds history from empty, exactly the
    * > 24h-idle case where the batch frame is empty anyway, so verdicts
    * within the horizon are unchanged whenever h ≥ the frame width.
    *
    * Erasure reaches the RUNNING query: an `op = "forget"` control
    * record (the [[graft.streaming.CurationStream.OpForget]] convention
    * — optional `op` column, absent means "add") purges the user's held
    * history in its micro-batch; the erased values can never enter
    * another event's μ/σ, and a history left empty removes the key from
    * the store. Within a batch the forget applies AFTER same-instant
    * arrivals (erasure effective from its instant onward).
    */
  def anomalyZStream(events: DataFrame,
                     horizonMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.streaming.CurationStream.{opCol, OpForget}
    val s = events.sparkSession
    import s.implicits._
    val base0 = events.filter(col("ts").isNotNull &&
      (col("value").isNotNull || opCol(events) === OpForget))
    val base = horizonMs match {
      case Some(h) => base0.withWatermark("ts", s"$h milliseconds")
      case None    => base0
    }
    val timeout =
      if (horizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    base
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"),
        coalesce(col("value"), lit(0.0)).as("v"),
        opCol(events).as("op"), col("ts"))
      .as[AnomEv]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(anomFold(horizonMs))
      .toDF()
  }

  /** Per-user state transition of [[anomalyZStream]]. State rows carry
    * the decimal's unscaled long (scale 6) so the encoder stays exact.
    */
  private def anomFold(horizonMs: Option[Long])(k: Long,
      rows: Iterator[AnomEv],
      state: org.apache.spark.sql.streaming.GroupState[List[(Long, Long)]])
      : Iterator[AnomOut] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import graft.streaming.CurationStream.{opRank, OpForget}
    def dec6(raw: Double): JBD = JBD.valueOf(raw).setScale(6, RoundingMode.HALF_UP)
    val rs = rows.toArray.sortBy(r => (r.tsUs, opRank(r.op), r.eventId))
    var hist = state.getOption.getOrElse(Nil)
      .map { case (ts, unscaled) => (ts, JBD.valueOf(unscaled, 6)) }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnomOut]
    var i = 0
    while (i < rs.length) {
      // all arrivals at this exact instant score against the SAME
      // pre-insertion history (the batch frame's ts-peer exclusion);
      // a same-instant forget sorts after them and applies last
      var j = i
      while (j < rs.length && rs(j).tsUs == rs(i).tsUs) j += 1
      val adds = (i until j).filter(r => rs(r).op != OpForget)
      val t = rs(i).tsUs
      if (adds.nonEmpty) {
        hist = hist.filter { case (ts, _) => ts >= t - AnomFrameUs }
        val inFrame = hist.filter { case (ts, _) => ts <= t - 1 }
        val n = inFrame.size.toLong
        if (n >= AnomMinHist) {
          val s6 = inFrame.map(_._2).reduce(_.add(_))
          val ss = inFrame.map { case (_, x) => x.multiply(x) }.reduce(_.add(_))
          val varNum = JBD.valueOf(n).multiply(ss)
            .subtract(s6.multiply(s6)).doubleValue()
          val variance = varNum / (n * (n - 1)).toDouble
          adds.foreach { r =>
            val xv = dec6(rs(r).v)
            val z = if (variance > 0.0)
              Some((xv.doubleValue() - s6.doubleValue() / n) / math.sqrt(variance))
            else None
            val z4 = z.map(zz => JBD.valueOf(zz)
              .setScale(4, RoundingMode.HALF_UP).doubleValue())
            out += AnomOut(rs(r).eventId, k, n, z4, z.exists(math.abs(_) > 3.0))
          }
        }
        adds.foreach(r => hist ::= (rs(r).tsUs, dec6(rs(r).v)))
      }
      // the forget purges everything held so far (including this batch's
      // earlier arrivals); later arrivals rebuild from empty
      if (adds.length < j - i) hist = Nil
      i = j
    }
    if (hist.isEmpty) {
      // an erased (or never-built) history leaves NO key behind
      if (state.exists) state.remove()
    } else {
      state.update(hist.map { case (ts, d) => (ts, d.unscaledValue().longValueExact()) })
      horizonMs.foreach { h =>
        // the newest held entry IS the lifetime max event time (inserts
        // always keep the max; eviction only drops older entries)
        state.setTimeoutTimestamp(math.max(
          hist.iterator.map(_._1).max / 1000L + h,
          state.getCurrentWatermarkMs() + 1))
      }
    }
    out.iterator
  }

  /** Oracle for w22: identical decimal frame sums, identical variance
    * numerator in exact arithmetic, identical final double sequence.
    */
  val sqlAnomalyZ: String =
    s"""WITH f AS (SELECT event_id, user_id,
       |    round(value, 6)::DECIMAL(18,6) AS xv,
       |    CAST(count(*) OVER win AS BIGINT) AS n_hist,
       |    sum(round(value, 6)::DECIMAL(18,6)) OVER win AS s,
       |    sum((round(value, 6)::DECIMAL(18,6) * round(value, 6)::DECIMAL(18,6))::DECIMAL(38,12)) OVER win AS ss
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
       |  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
       |    RANGE BETWEEN $AnomFrameUs PRECEDING AND 1 PRECEDING)),
       |g AS (SELECT event_id, user_id, n_hist,
       |    (n_hist * ss - (s * s)::DECIMAL(38,12))::DOUBLE
       |      / (n_hist * (n_hist - 1))::DOUBLE AS var,
       |    xv::DOUBLE - s::DOUBLE / n_hist AS dx
       |  FROM f WHERE n_hist >= $AnomMinHist)
       |SELECT event_id, user_id, n_hist,
       |  round(CASE WHEN var > 0.0 THEN dx / sqrt(var) END, 4) AS z,
       |  CASE WHEN var > 0.0 THEN abs(CASE WHEN var > 0.0 THEN dx / sqrt(var) END) > 3.0
       |    ELSE FALSE END AS is_anom
       |FROM g ORDER BY event_id""".stripMargin

  /** Hopping-window parameters (w13): 1-hour windows sliding every 15
    * minutes — every event lands in exactly WindowUs/SlideUs = 4
    * overlapping windows. The slide in microseconds is the oracle's
    * alignment constant.
    */
  val HopWindowDur = "1 hour"
  val HopSlideDur = "15 minutes"
  val HopSlideUs: Long = 15L * 60 * 1000000
  val HopSlots: Int = 4

  /** Hopping (sliding) windows per event_type (w13) — the window family
    * member tumbling can't express: a trailing-exposure dashboard wants
    * "events in the last hour, refreshed every 15 min", which is one
    * 1-hour window STARTING at every 15-minute slide boundary. Spark's
    * `window(ts, win, slide)` replicates each event into its
    * win/slide = 4 covering windows (half-open [start, start+win),
    * starts aligned to slide multiples of the epoch) and the aggregate
    * proceeds as a plain partial-aggregated groupBy.
    *
    * Scale shape: the explode multiplies rows by a CONSTANT 4 before the
    * map-side combine collapses them to (window, type) groups — shuffle
    * volume is bounded by distinct windows × types, not events. The same
    * expression runs under Structured Streaming with a watermark (append
    * mode emits each window once the watermark passes its end — parity
    * pinned in StreamingSpec).
    *
    * Null event times are excluded explicitly (the w10 convention): a
    * row with no event time has no place on a time axis.
    */
  def hopping(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), HopWindowDur, HopSlideDur).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("win_start"), col("event_type"))

  /** Oracle twin: each event's 4 covering window starts are the slide
    * multiples in (t − window, t] — epoch-microsecond FLOOR alignment,
    * exactly Spark's epoch-aligned assignment. Floor is spelled with the
    * sign-safe double-mod `x − ((x % s + s) % s)` rather than DuckDB's
    * `//`, which truncates toward zero and would mis-align any pre-1970
    * timestamp (negative epoch micros) relative to Spark's floor.
    */
  val sqlHopping: String =
    s"""WITH hops AS (
       |  SELECT make_timestamp(epoch_us(ts)
       |      - ((epoch_us(ts) % $HopSlideUs + $HopSlideUs) % $HopSlideUs)
       |      - i * $HopSlideUs) AS ws,
       |    event_type, value
       |  FROM events, LATERAL unnest(range(0, $HopSlots)) t(i)
       |  WHERE ts IS NOT NULL)
       |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
       |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
       |FROM hops GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Gap-based sessionization per user: a new session starts when the gap
    * since the previous event reaches SessionGapUs. `>=` matches Spark's
    * session_window half-open [start, last + gap) semantics exactly — an
    * event landing precisely on the close boundary opens a new session —
    * keeping this form and [[sessionWindowCounts]] equivalent.
    */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    events
      .withColumn("new_sess", when(gap.isNull || gap >= SessionGapUs, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val sqlSessionize: String =
    s"""WITH g AS (SELECT user_id,
       |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
       |  FROM events)
       |SELECT user_id,
       |  CAST(sum(CASE WHEN gap IS NULL OR gap >= $SessionGapUs THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Session windows via Spark's native session_window — the streaming-
    * ready form of [[sessionize]] (state-store backed under Structured
    * Streaming with a watermark). Per-user session count must agree with
    * the lag/cumsum batch form (tested).
    */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))

  /** Gap threshold for [[heartbeatGaps]] (w15): 2 hours in microseconds. */
  val GapThresholdUs: Long = 2L * 3600 * 1000000

  /** Heartbeat-gap detection per user (w15) — the monitoring query
    * sessionization implies but doesn't emit: every silence longer than
    * [[GapThresholdUs]] between a user's consecutive events, with its
    * bounds and duration. The ops counterpart of w2: w2 counts sessions,
    * this SHOWS the outages between them.
    *
    * Scale shape: one lag over the per-user event-time order — the same
    * single exchange + partition-local sort as every per-key window; the
    * output is gaps only, a tiny fraction of events.
    */
  def heartbeatGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .filter(col("prev_ts").isNotNull && col("gap_us") > GapThresholdUs)
      .select(col("user_id"),
        date_format(col("prev_ts"), "yyyy-MM-dd HH:mm:ss").as("gap_start"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("gap_end"),
        expr("gap_us div 1000000").as("gap_s"))
      .orderBy(col("user_id"), col("gap_start"))
  }

  val sqlHeartbeatGaps: String =
    s"""WITH g AS (SELECT user_id, event_id, ts,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events WHERE ts IS NOT NULL)
       |SELECT user_id,
       |  strftime(prev_ts, '%Y-%m-%d %H:%M:%S') AS gap_start,
       |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS gap_end,
       |  ((epoch_us(ts) - epoch_us(prev_ts)) // 1000000)::BIGINT AS gap_s
       |FROM g
       |WHERE prev_ts IS NOT NULL
       |  AND epoch_us(ts) - epoch_us(prev_ts) > $GapThresholdUs
       |ORDER BY user_id, gap_start""".stripMargin

  /** OHLC candle rollup per (hour, event_type) (w14) — the telemetry
    * downsampling every metrics store ships: open (earliest value in the
    * window), high, low, close (latest value), count. Open/close are
    * `min`/`max` over a (ts, event_id, value) STRUCT — lexicographic
    * struct ordering makes first/last a pure partial-aggregable hash
    * aggregate with a deterministic event_id tie-break, the q2-style "no
    * rank window for a top-1" idiom: nothing is sorted, nothing shuffles
    * but the (window, type) groups.
    */
  def ohlc(events: DataFrame): DataFrame = {
    val tagged = struct(unix_micros(col("ts")).as("t"),
      col("event_id").as("e"), col("value").as("v"))
    events.filter(col("ts").isNotNull)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(
        min(tagged).as("o"),
        max(tagged).as("c"),
        round(max(col("value")), 2).as("high"),
        round(min(col("value")), 2).as("low"),
        count(lit(1)).as("n"))
      .select(date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        round(col("o.v"), 2).as("open"), col("high"), col("low"),
        round(col("c.v"), 2).as("close"), col("n"))
      .orderBy(col("hour"), col("event_type"))
  }

  val sqlOhlc: String =
    """WITH e AS (SELECT date_trunc('hour', ts) AS h, event_type, ts, event_id, value
      |  FROM events WHERE ts IS NOT NULL),
      |w AS (SELECT h, event_type, value,
      |    row_number() OVER (PARTITION BY h, event_type ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY h, event_type ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM e)
      |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
      |  round(max(value), 2) AS high, round(min(value), 2) AS low,
      |  round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
      |  count(*)::BIGINT AS n
      |FROM w GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Cohort retention matrix (w17) — the product-analytics staple: users
    * grouped by their FIRST-ACTIVITY week (the cohort), counted in each
    * subsequent week they were active, keyed by whole-week offset. Both
    * engines truncate weeks to Monday and the offset is integer day
    * arithmetic — no session state, no windows: two partial-aggregated
    * passes (per-user first week; distinct (user, week)) and a
    * cohort-sized rollup.
    */
  def retention(events: DataFrame): DataFrame = {
    val weeks = events.filter(col("ts").isNotNull)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    weeks.join(cohorts, "user_id")
      .groupBy(col("cw"), expr("datediff(wk, cw) div 7").as("offset_weeks"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("offset_weeks"), col("n_users"))
      .orderBy(col("cohort_week"), col("offset_weeks"))
  }

  val sqlRetention: String =
    """WITH weeks AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |  FROM events WHERE ts IS NOT NULL),
      |cohorts AS (SELECT user_id, min(wk) AS cw FROM weeks GROUP BY user_id)
      |SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
      |  (date_diff('day', c.cw, w.wk) // 7)::BIGINT AS offset_weeks,
      |  count(DISTINCT w.user_id)::BIGINT AS n_users
      |FROM weeks w JOIN cohorts c ON c.user_id = w.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week, offset_weeks""".stripMargin

  /** COHORT LIFETIME VALUE (w29, w17's revenue companion): purchase
    * revenue attributed to the buyer's FIRST-ACTIVITY-week cohort at its
    * week offset, with the cumulative LTV curve per cohort. Revenue
    * rides the exact micro-currency ledger; the cumulative window runs
    * over the bounded (cohort × offset) table — never events.
    */
  def cohortLtv(events: DataFrame): DataFrame = {
    val active = events.filter(col("ts").isNotNull)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohorts = active.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val rev = events
      .filter(col("event_type") === "purchase" && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
        (round(col("value"), 6).cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
    val cell = rev.join(cohorts, "user_id")
      .groupBy(col("cw"), expr("datediff(wk, cw) div 7").as("offset_weeks"))
      .agg(count(lit(1)).as("n_purch"), sum(col("vm")).as("rev_micro"))
    val wc = Window.partitionBy(col("cw")).orderBy(col("offset_weeks"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell.withColumn("cum_micro", sum(col("rev_micro")).over(wc))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("offset_weeks"), col("n_purch"), col("rev_micro"),
        col("cum_micro"))
      .orderBy(col("cohort_week"), col("offset_weeks"))
  }

  /** Oracle for [[cohortLtv]]: same first-week cohorts, micro ledger,
    * and bounded cumulative window.
    */
  val sqlCohortLtv: String =
    """WITH active AS (SELECT user_id, date_trunc('week', ts) AS wk
      |  FROM events WHERE ts IS NOT NULL),
      |cohorts AS (SELECT user_id, min(wk) AS cw FROM active GROUP BY user_id),
      |rev AS (SELECT user_id, date_trunc('week', ts) AS wk,
      |    CAST(round(value, 6)::DECIMAL(18,6) * 1000000 AS BIGINT) AS vm
      |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      |    AND value IS NOT NULL),
      |cell AS (SELECT c.cw, (date_diff('day', c.cw, r.wk) // 7)::BIGINT AS offset_weeks,
      |    count(*)::BIGINT AS n_purch, sum(r.vm)::BIGINT AS rev_micro
      |  FROM rev r JOIN cohorts c ON c.user_id = r.user_id
      |  GROUP BY 1, 2)
      |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, offset_weeks, n_purch,
      |  rev_micro,
      |  (sum(rev_micro) OVER (PARTITION BY cw ORDER BY offset_weeks
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_micro
      |FROM cell ORDER BY cohort_week, offset_weeks""".stripMargin

  /** Mergeable-sketch rollup (w18) — the pre-aggregation pattern every
    * incremental metrics pipeline lives on: per-DAY HLL sketches of
    * distinct users, then the WEEK's distinct-user estimate computed by
    * UNIONING the daily sketches — never re-reading the day's raw
    * events. The verdict row per week pins the claims that make the
    * pattern trustworthy, each at the strength it actually has:
    *  - `merge_associative` (EXACT, pinned as equality): union of the
    *    daily sketches equals union of pre-unioned halves — register
    *    merge is order- and grouping-free, which is what lets a pipeline
    *    roll days into weeks into months without re-reading anything.
    *  - `within_tol` / `within_tol_merged` (~6-sigma 10% band, vs the
    *    exact count): both the direct and the rolled-up estimates are
    *    accurate.
    * A round-11 sf0.1 sweep caught the EARLIER form of this verdict
    * pinning merged == direct-from-raw: that equality is a SPARSE-MODE
    * ACCIDENT. Once a sketch goes dense, DataSketches serves a
    * directly-built sketch from its HIP estimator but a union result
    * from the composite estimator (merging invalidates HIP), so the two
    * estimates legitimately differ (observed 1488 vs 1494 on 1500) even
    * though the registers merged losslessly. The associativity claim is
    * the true invariant — both sides of IT are union results, served by
    * the same estimator.
    */
  def hllRollup(events: DataFrame): DataFrame = {
    val base = events.filter(col("ts").isNotNull)
      .select(date_trunc("week", col("ts")).as("wk"),
        date_trunc("day", col("ts")).as("day"), col("user_id"))
    val daily = base.groupBy(col("wk"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val merged = daily.groupBy(col("wk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
    // the same dailies pre-unioned into two arbitrary half-groups, then
    // unioned — a different merge tree over the same registers
    val regrouped = daily
      .groupBy(col("wk"), (dayofmonth(col("day")) % 2).as("h"))
      .agg(expr("hll_union_agg(sk)").as("hsk"))
      .groupBy(col("wk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(hsk))").as("est_regrouped"))
    val direct = base.groupBy(col("wk"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_direct"),
        countDistinct(col("user_id")).as("exact"))
    merged.join(regrouped, "wk").join(direct, "wk")
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
        (col("est_merged") === col("est_regrouped")).as("merge_associative"),
        // 10% ≈ 6 sigma at lgK=12's ~1.6% std error — robust across
        // datasets where a 5% (3-sigma) pin would go spurious
        (abs(col("est_direct").cast("double") - col("exact")) / col("exact") <= 0.10)
          .as("within_tol"),
        (abs(col("est_merged").cast("double") - col("exact")) / col("exact") <= 0.10)
          .as("within_tol_merged"))
      .orderBy(col("week"))
  }

  /** Oracle: the exact weekly distinct in DuckDB expects all three
    * verdicts true for every week (the q19/q20 sketch-verdict
    * convention).
    */
  val sqlHllRollup: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
      |  true AS merge_associative, true AS within_tol, true AS within_tol_merged
      |FROM events WHERE ts IS NOT NULL
      |GROUP BY 1 ORDER BY week""".stripMargin

  /** w20 histogram shape: unit-width bins over [0, [[HistBins]]); the top
    * bin absorbs overflow, negatives clamp to bin 0.
    */
  val HistBins = 1024

  /** Weekly value quantiles from MERGED DAILY HISTOGRAMS (w20) — w18's
    * union-of-dailies story for a numeric column: each day reduces to a
    * fixed-bin count vector (the mergeable sketch — integer counts, so
    * the daily->weekly merge is an EXACT sum in any order, the property
    * HLL only approximates), and the weekly quantile reads off the
    * cumulative histogram with within-bin linear interpolation. The
    * t-digest/HDR-histogram deployment shape: ship tiny per-day
    * artifacts, answer any quantile over any day range later without
    * touching raw events.
    *
    * Estimate contract (identical in the oracle): rank = ceil(q*N); the
    * answering bin is the one whose cumulative range covers the rank;
    * est = bin_lo + (rank - cum_prev)/cnt (unit bins). Accuracy is
    * bounded by the bin width by construction — a DETERMINISTIC bound,
    * not a probabilistic one, so the oracle replays the numbers
    * themselves, no tolerance verdict needed.
    *
    * Scale shape: two partial-aggregated groupBys (events -> daily bins
    * -> weekly bins, each key space bounded by days x [[HistBins]]), one
    * window over the weekly vectors (at most [[HistBins]] rows per
    * week), quantile explode on the bounded table. Nothing scales with
    * the event count past the first map-side combine.
    */
  def histogramQuantileRollup(events: DataFrame): DataFrame = {
    val base = events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(date_trunc("week", col("ts")).as("wk"),
        date_trunc("day", col("ts")).as("day"),
        least(greatest(floor(col("value")), lit(0L)), lit(HistBins - 1L))
          .cast("int").as("bin"))
    val daily = base.groupBy(col("wk"), col("day"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val weekly = daily.groupBy(col("wk"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
    val wCum = Window.partitionBy(col("wk")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("wk"))
    val cum = weekly.select(col("wk"), col("bin"), col("cnt"),
      sum(col("cnt")).over(wCum).as("cum"),
      sum(col("cnt")).over(wTot).as("n"))
    cum.select(col("wk"), col("bin"), col("cnt"), col("cum"), col("n"),
        explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
      .withColumn("rank", ceil(col("q") * col("n")))
      .filter(col("cum") >= col("rank") && col("cum") - col("cnt") < col("rank"))
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"), col("q"),
        round(col("bin") +
          (col("rank") - (col("cum") - col("cnt"))).cast("double") / col("cnt"), 6)
          .as("est"),
        col("n").as("n_events"))
      .orderBy(col("week"), col("q"))
  }

  /** Oracle for w20: the identical daily-bin -> weekly-sum -> cumulative
    * -> rank walk (quantile literals forced DOUBLE so neither engine
    * slips into decimal arithmetic).
    */
  val sqlHistogramQuantileRollup: String =
    s"""WITH b AS (SELECT date_trunc('week', ts) AS wk, date_trunc('day', ts) AS day,
       |    least(greatest(floor(value), 0), ${HistBins - 1})::INT AS bin
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
       |daily AS (SELECT wk, day, bin, CAST(count(*) AS BIGINT) AS cnt
       |  FROM b GROUP BY 1, 2, 3),
       |weekly AS (SELECT wk, bin, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM daily GROUP BY 1, 2),
       |cum AS (SELECT wk, bin, cnt,
       |    CAST(sum(cnt) OVER (PARTITION BY wk ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(cnt) OVER (PARTITION BY wk) AS BIGINT) AS n
       |  FROM weekly),
       |e AS (SELECT wk, q, bin, cnt, cum, n, ceil(q * n)::BIGINT AS rank
       |  FROM cum, LATERAL unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) t(q))
       |SELECT strftime(wk, '%Y-%m-%d') AS week, q,
       |  round(bin + ((rank - (cum - cnt))::DOUBLE / cnt), 6) AS est,
       |  n AS n_events
       |FROM e WHERE cum >= rank AND cum - cnt < rank
       |ORDER BY week, q""".stripMargin

  /** RUN-LENGTH STATUS INTERVALS (w21) — the SCD Type-2 derivation from a
    * changelog: consecutive same-type events per user collapse into one
    * validity interval [valid_from, valid_to), valid_to = the next run's
    * start, open (null + is_current) for the live run. The
    * gaps-and-islands pattern every warehouse uses to build a type-2
    * dimension from an event stream: lag flags the change points, a
    * running sum numbers the runs, one bounded aggregate per run.
    *
    * Scale shape: ONE exchange on the user key; the lag flag and the
    * running run-number share the same partition-local sort; the run
    * aggregate is partial (map-side combines within a run) and the
    * valid_to lead runs over the RUNS table — rows = state changes, not
    * events. Determinism: exact-ts ties order by event_id in both
    * engines.
    */
  def statusIntervals(events: DataFrame): DataFrame = {
    val base = events.filter(col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(w)
    val flagged = base.withColumn("chg",
      when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
    val grp = flagged.withColumn("grp",
      sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = grp.groupBy(col("user_id"), col("grp"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val wr = Window.partitionBy(col("user_id")).orderBy(col("grp"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"), col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Input row for the streaming [[statusIntervalsStream]]. `op` is the
    * erasure control tag, `ts` the watermark carrier (both the
    * [[AnomEv]] convention).
    */
  final case class RunEv(k: Long, tsUs: Long, eventId: Long, typ: String,
                         op: String = "add",
                         ts: java.sql.Timestamp = null)

  /** The open run per user: its type, start, event count, and the
    * user's lifetime max event time (`lastTsUs` — the horizon deadline
    * anchor, so a late straggler never pulls an armed deadline earlier).
    */
  final case class OpenRun(typ: String, fromUs: Long, n: Long,
                           lastTsUs: Long = Long.MinValue)

  /** One CLOSED interval emitted by the stream (micros; the open run
    * stays in state — append mode cannot retract a "current" row).
    */
  final case class ClosedRun(user_id: Long, event_type: String,
                             valid_from_us: Long, valid_to_us: Long,
                             n_events: Long)

  /** STREAMING status intervals — [[statusIntervals]] maintained as
    * events arrive: keyed state holds each user's ONE open run; a type
    * change closes it (emit) and opens the next. Emits CLOSED intervals
    * only — append mode cannot retract, and the open run is by definition
    * still mutable — so under per-key ordered ingest (the packStream
    * precondition: sticky key partitioning gives it) the streamed output
    * EQUALS the batch w21 rows with is_current = false; the state itself
    * is the is_current row. Within a micro-batch, rows sort by
    * (ts, event_id) — the batch tie rule — so intra-batch disorder is
    * absorbed.
    *
    * Scale shape: state is ONE small run record per live user (the
    * dimension's size, not the stream's history), shuffled once per
    * micro-batch on the user key like all keyed state. WHICH users hold
    * a record is the `horizonMs` knob (the
    * [[graft.streaming.CurationStream.firstSeen]] convention): None
    * keeps every ever-seen user's open run forever (exact batch
    * equality); Some(h) evicts a user idle past h when the watermark
    * passes — SILENTLY, emitting nothing: the open run is by definition
    * still mutable and append mode cannot retract, so eviction trades
    * away only the close of a run whose continuation gap exceeded the
    * horizon (the returning user starts a fresh run). The deadline arms
    * at the lifetime max event time + h ([[OpenRun.lastTsUs]]).
    *
    * Erasure reaches the RUNNING query: an `op = "forget"` control
    * record purges the user's open run in its micro-batch WITHOUT
    * emitting it (the run's data is erased, not published) and removes
    * the key; later events open a fresh run.
    */
  def statusIntervalsStream(events: DataFrame,
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
      .select(col("user_id").as("k"), unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eventId"), col("event_type").as("typ"),
        opCol(events).as("op"), col("ts"))
      .as[RunEv]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(runFold(horizonMs))
      .toDF()
  }

  /** Per-user state transition of [[statusIntervalsStream]]: fold the
    * batch's (ts, op, event_id)-sorted arrivals over the stored open
    * run — the w21 change-point rule verbatim, plus the forget purge.
    */
  private def runFold(horizonMs: Option[Long])(k: Long,
      rows: Iterator[RunEv],
      state: org.apache.spark.sql.streaming.GroupState[OpenRun]): Iterator[ClosedRun] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      import graft.streaming.CurationStream.{opRank, OpForget}
      val rs = rows.toArray.sortBy(r => (r.tsUs, opRank(r.op), r.eventId))
      var open = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedRun]
      rs.foreach { r =>
        if (r.op == OpForget) open = None
        else open match {
          case Some(o) if o.typ == r.typ =>
            open = Some(o.copy(n = o.n + 1,
              lastTsUs = math.max(o.lastTsUs, r.tsUs)))
          case Some(o) =>
            out += ClosedRun(k, o.typ, o.fromUs, r.tsUs, o.n)
            open = Some(OpenRun(r.typ, r.tsUs, 1L,
              math.max(o.lastTsUs, r.tsUs)))
          case None => open = Some(OpenRun(r.typ, r.tsUs, 1L, r.tsUs))
        }
      }
      open match {
        case Some(o) =>
          state.update(o)
          horizonMs.foreach(h => state.setTimeoutTimestamp(math.max(
            o.lastTsUs / 1000L + h, state.getCurrentWatermarkMs() + 1)))
        case None =>
          // an erased open run leaves NO key behind (and emits nothing)
          if (state.exists) state.remove()
      }
      out.iterator
    }

  /** Oracle for w21: the identical lag-flag -> run-number -> per-run
    * aggregate -> lead walk.
    */
  val sqlStatusIntervals: String =
    """WITH b AS (SELECT user_id, ts, event_id, event_type FROM events
      |  WHERE ts IS NOT NULL),
      |f AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
      |  FROM f),
      |runs AS (SELECT user_id, grp, event_type, min(ts) AS valid_from,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM g GROUP BY 1, 2, 3)
      |SELECT user_id, event_type, valid_from, valid_to, n_events,
      |  valid_to IS NULL AS is_current FROM (
      |  SELECT user_id, event_type, valid_from, n_events,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to
      |  FROM runs)
      |ORDER BY user_id, valid_from""".stripMargin

  /** Latest event per user — keyed dedup keeping the newest (the batch
    * analogue of dropDuplicates-with-watermark, SURVEY §2.7).
    */
  def latestPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy(col("user_id"))
  }

  val sqlLatestPerUser: String =
    """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM (SELECT user_id, event_id, ts,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------- trending items

  /** Items kept per window by the trending report. */
  val TrendTopK = 3

  /** TRENDING ITEMS (w23) — the "what's hot right now" dashboard over a
    * high-cardinality item key (the JSON `k` prop): per tumbling day,
    * the top-[[TrendTopK]] items by event count, each carrying its rank
    * and its DELTA vs the same item's count in the previous day — volume
    * says what's big, the delta says what's RISING; a rank-by-volume
    * table that also exposes growth is what an ops dashboard actually
    * plots.
    *
    * Scale shape: raw events collapse to (day, item) counts in ONE
    * map-side combined aggregate — nothing past that first combine
    * scales with event volume. The lag runs per ITEM over its few day
    * rows (bounded by the calendar, partitioned by the high-cardinality
    * key — no skew); the top-K rank per day partial-limits before its
    * exchange (WindowGroupLimit), so what shuffles for ranking is K rows
    * per (day, input partition).
    */
  def trendingItems(events: DataFrame): DataFrame = {
    val daily = events.filter(col("ts").isNotNull && col("props").isNotNull)
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .groupBy(col("day"), col("item")).agg(count(lit(1)).as("n"))
    val wItem = Window.partitionBy(col("item")).orderBy(col("day"))
    val wDay = Window.partitionBy(col("day"))
      .orderBy(col("n").desc, col("item"))
    daily
      .withColumn("prev_day", lag(col("day"), 1).over(wItem))
      .withColumn("prev_n", lag(col("n"), 1).over(wItem))
      // only an ADJACENT calendar day counts as "previous" for the delta
      .withColumn("delta", col("n") - when(
        datediff(col("day"), col("prev_day")) === 1, col("prev_n"))
        .otherwise(lit(0L)))
      .withColumn("rank", row_number().over(wDay))
      .filter(col("rank") <= TrendTopK)
      .select(col("day"), col("rank"), col("item"), col("n"), col("delta"))
      .orderBy(col("day"), col("rank"))
  }

  /** TIME-WEIGHTED AVERAGE VALUE (w28, the TWAP companion of w14's
    * OHLC): per (user, day), each event's value weighted by how long it
    * held — the interval to the next event — over the span from first
    * to last event; days with a single event have no held interval and
    * emit nothing. Same-instant events get zero weight (order-free).
    *
    * Exactness: values ride as 6-dp decimals, interval lengths as exact
    * micros, each product and the sum in decimal(38,6) — magnitude-safe
    * (1e9 value-micro × 1e11 us ≪ 38 digits) and order-free; the single
    * double division at the end is the only float step. One window pass
    * (lead) + one partial aggregate.
    */
  def twap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val vm = round(col("value"), 6).cast("decimal(18,6)")
    val base = events.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_id"), vm.as("xv"))
      .withColumn("dur", unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("dur").isNotNull)
    base.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_held"),
        sum(col("dur")).as("span_us"),
        sum((col("xv") * col("dur")).cast("decimal(38,6)")).as("vw"))
      .filter(col("span_us") > 0)
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_held"), col("span_us"),
        (round(col("vw").cast("double") / col("span_us"), 6) + 0.0).as("twap"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Oracle for [[twap]]: identical decimal products, exact micro spans,
    * one double division.
    */
  val sqlTwap: String =
    """WITH b AS (SELECT user_id, ts::DATE AS day, ts, event_id,
      |    round(value, 6)::DECIMAL(18,6) AS xv
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      |d AS (SELECT *, epoch_us(lead(ts) OVER (PARTITION BY user_id, day
      |      ORDER BY ts, event_id)) - epoch_us(ts) AS dur
      |  FROM b),
      |g AS (SELECT user_id, day, count(*)::BIGINT AS n_held,
      |    sum(dur)::BIGINT AS span_us,
      |    sum((xv * dur)::DECIMAL(38,6)) AS vw
      |  FROM d WHERE dur IS NOT NULL GROUP BY 1, 2)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_held, span_us,
      |  round(vw::DOUBLE / span_us, 6) + 0.0 AS twap
      |FROM g WHERE span_us > 0 ORDER BY user_id, day""".stripMargin

  /** One streamed arrival for [[twapStream]] (raw value; 6-dp rounding
    * happens inside the fold with Spark's exact round sequence).
    */
  final case class TwapEv(k: Long, day: String, tsUs: Long, eventId: Long,
                          v: Double, op: String = "add",
                          ts: java.sql.Timestamp = null)

  /** One streamed TWAP snapshot (same columns as the batch [[twap]]). */
  final case class TwapOut(user_id: Long, day: String, n_held: Long,
                           span_us: Long, twap: Option[Double])

  /** Per-(user, day) fold state. The weighted accumulator is a
    * decimal(·,6)·micros product sum whose unscaled value exceeds a
    * long (xv_unscaled·dur ≈ 3e19), so it rides as the BigInteger's
    * decimal string — exact, like the batch decimal(38,6) column.
    */
  final case class TwapState(lastTsUs: Long, lastVmUnscaled: Long,
                             accUnscaled: String, spanUs: Long, nHeld: Long)

  /** STREAMING TWAP — [[twap]] as keyed state: each (user, day) holds its
    * last event's (ts, 6-dp value) plus the exact running weighted sum;
    * an arrival credits the PREVIOUS value with the elapsed interval
    * (the lead-delta fold inverted), so under per-key ordered ingest the
    * final snapshot per key EQUALS the batch row. State is four longs
    * and one decimal string per open (user, day) — bounded by key
    * construction, not by arrival count — BUT the (user, day) key SET
    * accretes one key per user per calendar day forever unless a
    * horizon is armed: `horizonMs = Some(h)` (the
    * [[graft.streaming.CurationStream.firstSeen]] convention) evicts a
    * key idle past h when the watermark passes, which is exactly "the
    * day closed h ago" — bounding live state to users × open days. The
    * deadline arms at the key's max event time + h (tracked across
    * batches via the stored last instant) so a late straggler never
    * pulls it earlier; what eviction trades away is only the re-emission
    * of an already-final snapshot if a beyond-horizon straggler arrives
    * (it restarts the day from empty — observable as a fresh, smaller
    * snapshot, never a corrupted one).
    *
    * Erasure reaches the RUNNING query: an `op = "forget"` control
    * record purges the (user, day-of-its-ts) key's state in its
    * micro-batch and emits nothing — the composed p53 sweep names each
    * (user, day) it erases, one control record per day, exactly as it
    * names each saved artifact. Snapshots already emitted to the sink
    * are append-mode history — [[graft.operators.Forget.rtbfSweep]]'s
    * jurisdiction, not the state's.
    */
  def twapStream(events: DataFrame,
                 horizonMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.streaming.CurationStream.{opCol, OpForget}
    val s = events.sparkSession
    import s.implicits._
    val base0 = events.filter(col("ts").isNotNull &&
      (col("value").isNotNull || opCol(events) === OpForget))
    val base = horizonMs match {
      case Some(h) => base0.withWatermark("ts", s"$h milliseconds")
      case None    => base0
    }
    val timeout =
      if (horizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    base
      .select(col("user_id").as("k"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("tsUs"), col("event_id").as("eventId"),
        coalesce(col("value"), lit(0.0)).as("v"),
        opCol(events).as("op"), col("ts"))
      .as[TwapEv]
      .groupByKey(e => (e.k, e.day))
      .flatMapGroupsWithState(OutputMode.Append, timeout)(twapFold(horizonMs))
      .toDF()
  }

  private def twapFold(horizonMs: Option[Long])(key: (Long, String),
      rows: Iterator[TwapEv],
      state: org.apache.spark.sql.streaming.GroupState[TwapState])
      : Iterator[TwapOut] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import graft.streaming.CurationStream.{opRank, OpForget}
    val init = TwapState(-1L, 0L, "0", 0L, 0L)
    val rs = rows.toArray.sortBy(r => (r.tsUs, opRank(r.op), r.eventId))
    var st = state.getOption.getOrElse(init)
    var acc = new JBD(new java.math.BigInteger(st.accUnscaled), 6)
    // lifetime max event time (the horizon anchor); reset by a forget
    var seen = st.lastTsUs
    rs.foreach { r =>
      if (r.op == OpForget) {
        st = init
        acc = new JBD(java.math.BigInteger.ZERO, 6)
        seen = -1L
      } else {
        seen = math.max(seen, r.tsUs)
        if (st.lastTsUs >= 0) {
          val dur = r.tsUs - st.lastTsUs
          acc = acc.add(JBD.valueOf(st.lastVmUnscaled, 6)
            .multiply(JBD.valueOf(dur)))
          st = st.copy(spanUs = st.spanUs + dur, nHeld = st.nHeld + 1)
        }
        val vm = JBD.valueOf(r.v).setScale(6, RoundingMode.HALF_UP)
        st = st.copy(lastTsUs = r.tsUs,
          lastVmUnscaled = vm.unscaledValue().longValueExact())
      }
    }
    if (st.lastTsUs < 0) {
      // an erased (user, day) leaves NO key behind and emits nothing
      if (state.exists) state.remove()
      Iterator.empty
    } else {
      state.update(st.copy(accUnscaled = acc.unscaledValue().toString))
      horizonMs.foreach(h => state.setTimeoutTimestamp(math.max(
        seen / 1000L + h, state.getCurrentWatermarkMs() + 1)))
      val twapVal = if (st.spanUs > 0)
        Some(JBD.valueOf(acc.doubleValue() / st.spanUs)
          .setScale(6, RoundingMode.HALF_UP).doubleValue() + 0.0)
      else None
      Iterator.single(TwapOut(key._1, key._2, st.nHeld, st.spanUs, twapVal))
    }
  }

  /** DAY-OVER-DAY CHURN (w26) — the set-difference companion of w24's
    * rolling DAU: for each day with an ADJACENT previous calendar day in
    * the data, how many of yesterday's actives returned (retained), how
    * many went silent (churned), and how many are new. Pure equi-joins
    * over the distinct (day, user) pairs — yesterday's set arrives as the
    * same table keyed one day later, so each day is one join key and no
    * window or cross product appears; days without an adjacent
    * predecessor emit nothing (a gap day would otherwise read as 100%
    * churn).
    *
    * churn_rate = churned/yesterday as ONE double division of two exact
    * integers, rounded — deterministic in both engines.
    */
  def dayChurn(events: DataFrame): DataFrame = {
    val du = events.filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val prev = du.select(date_add(col("day"), 1).as("day"),
      col("user_id").as("prev_user"))
    val days = du.select(col("day")).distinct()
    val prevDays = days.select(date_add(col("day"), 1).as("day"))
    val adjacent = days.join(prevDays, Seq("day"), "left_semi")
    val joined = du.join(adjacent, Seq("day"), "left_semi").as("t")
      .join(prev.as("y"),
        col("t.day") === col("y.day") && col("t.user_id") === col("y.prev_user"),
        "full_outer")
      .select(coalesce(col("t.day"), col("y.day")).as("day"),
        col("t.user_id").isNotNull.as("today"),
        col("y.prev_user").isNotNull.as("yesterday"))
      .join(adjacent, Seq("day"), "left_semi")
    joined.groupBy(col("day"))
      .agg(sum(when(col("today") && col("yesterday"), 1L).otherwise(0L)).as("retained"),
        sum(when(!col("today") && col("yesterday"), 1L).otherwise(0L)).as("churned"),
        sum(when(col("today") && !col("yesterday"), 1L).otherwise(0L)).as("new_users"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("retained"), col("churned"), col("new_users"),
        (round(col("churned").cast("double")
          / (col("retained") + col("churned")), 4) + 0.0).as("churn_rate"))
      .orderBy(col("day"))
  }

  /** Oracle for [[dayChurn]]: the same shifted self-join over distinct
    * (day, user) pairs, restricted to adjacent-day pairs.
    */
  val sqlDayChurn: String =
    """WITH du AS (SELECT DISTINCT ts::DATE AS day, user_id
      |  FROM events WHERE ts IS NOT NULL),
      |days AS (SELECT DISTINCT day FROM du),
      |adj AS (SELECT day FROM days
      |  WHERE day IN (SELECT day + 1 FROM days)),
      |t AS (SELECT du.day, du.user_id FROM du WHERE du.day IN (SELECT day FROM adj)),
      |y AS (SELECT du.day + 1 AS day, du.user_id AS prev_user FROM du),
      |j AS (SELECT coalesce(t.day, y.day) AS day,
      |    t.user_id IS NOT NULL AS today,
      |    y.prev_user IS NOT NULL AS yesterday
      |  FROM t FULL OUTER JOIN y ON t.day = y.day AND t.user_id = y.prev_user)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  sum(CASE WHEN today AND yesterday THEN 1 ELSE 0 END)::BIGINT AS retained,
      |  sum(CASE WHEN NOT today AND yesterday THEN 1 ELSE 0 END)::BIGINT AS churned,
      |  sum(CASE WHEN today AND NOT yesterday THEN 1 ELSE 0 END)::BIGINT AS new_users,
      |  round(sum(CASE WHEN NOT today AND yesterday THEN 1 ELSE 0 END)::DOUBLE
      |    / (sum(CASE WHEN today AND yesterday THEN 1 ELSE 0 END)
      |       + sum(CASE WHEN NOT today AND yesterday THEN 1 ELSE 0 END)), 4) + 0.0
      |    AS churn_rate
      |FROM j WHERE day IN (SELECT day FROM adj)
      |GROUP BY day ORDER BY day""".stripMargin

  /** Oracle for [[trendingItems]]: same (day, item) rollup, adjacent-day
    * lag and rank tie-breaks.
    */
  val sqlTrendingItems: String =
    s"""WITH daily AS (
       |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |    json_extract(props, '$$.k')::INT AS item,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events WHERE ts IS NOT NULL AND props IS NOT NULL
       |    AND json_extract(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2),
       |lagd AS (SELECT *,
       |    lag(day) OVER (PARTITION BY item ORDER BY day) AS prev_day,
       |    lag(n) OVER (PARTITION BY item ORDER BY day) AS prev_n
       |  FROM daily),
       |ranked AS (SELECT day, item, n,
       |    n - CASE WHEN date_diff('day', prev_day::DATE, day::DATE) = 1
       |      THEN prev_n ELSE 0 END AS delta,
       |    row_number() OVER (PARTITION BY day ORDER BY n DESC, item) AS rank
       |  FROM lagd)
       |SELECT day, rank, item, n, delta FROM ranked
       |WHERE rank <= $TrendTopK ORDER BY day, rank""".stripMargin

  // -------------------------------------- seasonal decomposition (w32)

  /** STL-LITE SEASONAL DECOMPOSITION (w32): daily purchase revenue split
    * into trend + day-of-week seasonal + remainder — trend is the
    * centered 7-observation moving average (null at the edges where the
    * frame is short), the seasonal index is the mean detrended value per
    * ISO weekday, and the remainder is what anomaly review reads (w22's
    * z-score gives per-event anomalies; this gives the series-level
    * decomposition a weekly business cycle needs before any threshold
    * is meaningful).
    *
    * Determinism: daily totals and every cross-row reduction accumulate
    * in DECIMAL (exact, order-free); doubles appear only in per-row
    * divisions and the final rounding, so no float sum ever crosses a
    * partition boundary.
    *
    * Scale shape: one corpus-sized groupBy(day); everything after runs
    * on the bounded daily table (corpus age in days), where the
    * single-partition centered window is a window over dozens of rows.
    */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("ts").isNotNull && col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("yd"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val tr = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("s7", sum(col("yd")).over(w7))
      .withColumn("trend",
        when(col("n7") === 7, col("s7").cast("double") / 7.0))
      .withColumn("det",
        round(col("yd").cast("double") - col("trend"), 6).cast("decimal(18,6)"))
      .withColumn("dow", weekday(col("day")) + 1)
    val seas = tr.filter(col("det").isNotNull)
      .groupBy(col("dow"))
      .agg((sum(col("det")).cast("double") / count(lit(1))).as("seasonal0"))
    tr.join(broadcast(seas), Seq("dow"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("yd").cast("double").as("y"),
        round(col("trend"), 4).as("trend"),
        when(col("det").isNotNull, round(col("seasonal0"), 4)).as("seasonal"),
        round(col("det").cast("double") - col("seasonal0"), 4).as("resid"))
      .orderBy(col("day"))
  }

  /** Oracle for [[seasonalDecompose]]: identical decimal accumulation,
    * 7-row centered frame, isodow seasonal means and rounding.
    */
  val sqlSeasonalDecompose: String =
    """WITH daily AS (SELECT ts::DATE AS day,
      |    sum(value::DECIMAL(18,2)) AS yd
      |  FROM events WHERE ts IS NOT NULL AND event_type = 'purchase'
      |  GROUP BY 1),
      |tr AS (SELECT day, yd,
      |    count(*) OVER w7 AS n7,
      |    sum(yd) OVER w7 AS s7
      |  FROM daily
      |  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (SELECT day, yd,
      |    CASE WHEN n7 = 7 THEN s7::DOUBLE / 7.0 END AS trend,
      |    round(yd::DOUBLE - (CASE WHEN n7 = 7 THEN s7::DOUBLE / 7.0 END),
      |      6)::DECIMAL(18,6) AS det,
      |    isodow(day) AS dow
      |  FROM tr),
      |se AS (SELECT dow, sum(det)::DOUBLE / count(*) AS seasonal0
      |  FROM dt WHERE det IS NOT NULL GROUP BY 1)
      |SELECT strftime(dt.day, '%Y-%m-%d') AS day, dt.yd::DOUBLE AS y,
      |  round(dt.trend, 4) AS trend,
      |  CASE WHEN dt.det IS NOT NULL THEN round(se.seasonal0, 4) END AS seasonal,
      |  round(dt.det::DOUBLE - se.seasonal0, 4) AS resid
      |FROM dt LEFT JOIN se ON se.dow = dt.dow
      |ORDER BY day""".stripMargin

  // ------------------------------------------ Kaplan-Meier survival (w30)

  /** A purchase above this value is the "conversion" event w30 measures
    * time-to; users who never convert are right-censored at corpus end.
    */
  val SurvValueFloor = 120.0

  /** Kaplan-Meier survival curve (w30): time in whole days from a user's
    * first event to their first high-value purchase (value >
    * [[SurvValueFloor]]); users who never convert are right-CENSORED at
    * the end of the observation window (corpus max ts) — they leave the
    * risk set at their observed span without counting as an event. The
    * product-limit estimator S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) is
    * emitted at every conversion time — the censoring-aware
    * time-to-convert distribution w26's day-over-day churn rate and
    * w16's funnel counts cannot give (dropping the censored users would
    * bias conversion fast; counting them as non-converts would bias it
    * slow; KM is the unbiased middle).
    *
    * Determinism: day buckets are exact integer division (remainder
    * subtracted before the double divide, so the quotient is an exact
    * multiple); the cumulative product runs as a prefix sum of ln terms
    * under one total order (prefix sums are order-deterministic in both
    * engines), exp'd and rounded; the everyone-converts collapse to zero
    * survivors is pinned to 0.0 explicitly rather than through ln(0).
    *
    * Scale shape: one groupBy(user_id) over events (the corpus-sized
    * shuffle), then everything runs on the per-distinct-duration table —
    * bounded by the observation window in days, so the single-partition
    * prefix windows run over hundreds of rows, not data-sized input.
    */
  def kmSurvival(events: DataFrame): DataFrame = {
    val day = 86400000000L
    val ev = events.filter(col("ts").isNotNull)
    val per = ev.groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("f"),
        min(when(col("event_type") === "purchase" && col("value") > SurvValueFloor,
          unix_micros(col("ts")))).as("p"))
    val mx = ev.agg(max(unix_micros(col("ts"))).as("m"))
    val dd = coalesce(col("p"), col("m")) - col("f")
    val du = per.crossJoin(broadcast(mx))
      .select(((dd - pmod(dd, lit(day))) / lit(day)).cast("long").as("t_days"),
        col("p").isNotNull.as("converted"))
    val byT = du.groupBy(col("t_days"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_conv"))
    val n = du.agg(count(lit(1)).as("n_users"))
    val wBefore = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(n))
      .withColumn("n_risk",
        col("n_users") - coalesce(sum(col("n_all")).over(wBefore), lit(0L)))
      .filter(col("n_conv") > 0)
    val wCum = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val lnTerm = when(col("n_conv") < col("n_risk"),
      log((col("n_risk") - col("n_conv")).cast("double") / col("n_risk")))
    risk
      .withColumn("dead",
        max(when(col("n_conv") >= col("n_risk"), 1).otherwise(0)).over(wCum))
      .withColumn("surv", when(col("dead") === 1, lit(0.0))
        .otherwise(round(exp(sum(lnTerm).over(wCum)), 6)))
      .select(col("t_days"), col("n_risk"), col("n_conv"), col("surv"))
      .orderBy(col("t_days"))
  }

  /** Oracle for [[kmSurvival]]: identical duration bucketing (`//` on
    * non-negative micros matches the remainder-subtracted divide), risk
    * prefix sums and ln-prefix product under the same total order.
    */
  val sqlKmSurvival: String =
    s"""WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS e
       |  FROM events WHERE ts IS NOT NULL),
       |per AS (SELECT user_id, min(e) AS f,
       |    min(CASE WHEN event_type = 'purchase' AND value > $SurvValueFloor
       |      THEN e END) AS p
       |  FROM ev GROUP BY 1),
       |mx AS (SELECT max(e) AS m FROM ev),
       |du AS (SELECT (coalesce(p, mx.m) - f) // 86400000000 AS t_days,
       |    p IS NOT NULL AS converted
       |  FROM per, mx),
       |byt AS (SELECT t_days, count(*)::BIGINT AS n_all,
       |    sum(CASE WHEN converted THEN 1 ELSE 0 END)::BIGINT AS n_conv
       |  FROM du GROUP BY 1),
       |n AS (SELECT count(*)::BIGINT AS n_users FROM du),
       |risk AS (SELECT t_days, n_conv,
       |    (n.n_users - coalesce(sum(n_all) OVER (ORDER BY t_days
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n_risk
       |  FROM byt, n),
       |evs AS (SELECT * FROM risk WHERE n_conv > 0),
       |km AS (SELECT t_days, n_risk, n_conv,
       |    max(CASE WHEN n_conv >= n_risk THEN 1 ELSE 0 END) OVER w AS dead,
       |    sum(CASE WHEN n_conv < n_risk
       |      THEN ln((n_risk - n_conv)::DOUBLE / n_risk) END) OVER w AS s
       |  FROM evs
       |  WINDOW w AS (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT t_days, n_risk, n_conv,
       |  CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(s), 6) END AS surv
       |FROM km ORDER BY t_days""".stripMargin
}
