package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed cases for the window-family rollups the oracle gates at
  * corpus scale: OHLC candles (w14) and heartbeat gaps (w15).
  */
class EventWindowsSpec extends AnyFunSuite {

  private def events(rows: (Long, String, String, Double)*) = {
    val s = TestSpark.spark
    import s.implicits._
    rows.toSeq.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"), lit(0L).as("user_id"), lit("").as("props"))
  }

  test("OHLC: open/high/low/close by event time, event_id breaks exact ts ties") {
    val d = events(
      (1L, "2024-01-01 00:05:00", "x", 3.0),
      (2L, "2024-01-01 00:10:00", "x", 9.0),
      (3L, "2024-01-01 00:20:00", "x", 1.0),
      // exact-ts tie with id 5: the LOWER id must be the close loser,
      // the HIGHER id wins max(struct) — deterministic either way
      (4L, "2024-01-01 00:40:00", "x", 5.0),
      (5L, "2024-01-01 00:40:00", "x", 7.0))
    val r = EventWindows.ohlc(d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "2024-01-01 00:00:00" && row.getString(1) == "x")
    assert((row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5),
      row.getLong(6)) == ((3.0, 9.0, 1.0, 7.0, 5L)),
      s"hand candle diverged: $row")
  }

  test("funnel: chain anchors at the VIEW's time — a signup after the view is not a conversion") {
    val s = TestSpark.spark
    import s.implicits._
    val rows = Seq(
      // user 1: signup -> view -> purchase, properly ordered: FULL
      (1L, "2024-01-01 09:00:00", "signup", 10L),
      (2L, "2024-01-01 10:00:00", "view", 10L),
      (3L, "2024-01-01 11:00:00", "purchase", 10L),
      // user 2: view -> purchase, no signup: view only
      (4L, "2024-01-01 10:00:00", "view", 20L),
      (5L, "2024-01-01 11:00:00", "purchase", 20L),
      // user 3: bare purchase: neither
      (6L, "2024-01-01 11:00:00", "purchase", 30L),
      // user 4: view -> signup -> purchase: the signup is AFTER the view,
      // so the ORDERED chain must not count it
      (7L, "2024-01-01 10:00:00", "view", 40L),
      (8L, "2024-01-01 10:30:00", "signup", 40L),
      (9L, "2024-01-01 11:00:00", "purchase", 40L))
    val d = rows.toDF("event_id", "ts_s", "event_type", "user_id")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("user_id"), lit(0.0).as("value"), lit("").as("props"))
    val r = AsOf.funnel(d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      == ((4L, 3L, 1L, 0.75, 0.3333)), s"funnel diverged: $r")
  }

  test("heartbeat gaps: only silences past the threshold emit, bounds and seconds exact") {
    val d = events(
      (1L, "2024-01-01 00:00:00", "hb", 0.0),
      (2L, "2024-01-01 01:00:00", "hb", 0.0), // 1h gap: below threshold
      (3L, "2024-01-01 04:00:00", "hb", 0.0), // 3h gap: emitted
      (4L, "2024-01-01 04:30:00", "hb", 0.0))
    val r = EventWindows.heartbeatGaps(d).collect()
      .map(x => (x.getString(1), x.getString(2), x.getLong(3)))
    assert(r.toSeq == Seq(("2024-01-01 01:00:00", "2024-01-01 04:00:00", 10800L)),
      s"gaps diverged: ${r.toSeq}")
  }

  test("status intervals: runs collapse, a re-entered type opens a NEW interval, last run is current") {
    val r = EventWindows.statusIntervals(events(
      (1L, "2024-01-01 10:00:00", "view", 0.0),
      (2L, "2024-01-01 11:00:00", "view", 0.0),   // same run
      (3L, "2024-01-01 12:00:00", "click", 0.0),  // change point
      (4L, "2024-01-01 13:00:00", "view", 0.0)    // view RE-ENTERED: new run
    )).collect().map(x => (x.getString(1), x.getTimestamp(2).toString,
      Option(x.getTimestamp(3)).map(_.toString), x.getLong(4), x.getBoolean(5)))
    assert(r.toSeq == Seq(
      ("view",  "2024-01-01 10:00:00.0", Some("2024-01-01 12:00:00.0"), 2L, false),
      ("click", "2024-01-01 12:00:00.0", Some("2024-01-01 13:00:00.0"), 1L, false),
      ("view",  "2024-01-01 13:00:00.0", None, 1L, true)), s"intervals diverged: ${r.toSeq}")
  }

  test("anomaly z: planted spike flags, normal tail doesn't, constant history yields null z") {
    // 6 calm events then a spike, all within one user's trailing day
    val calm = (0 until 6).map(i => (i.toLong, f"2024-01-01 ${10 + i}%02d:00:00", "x", 10.0 + i % 2))
    val spike = Seq((6L, "2024-01-01 16:30:00", "x", 500.0),
                    (7L, "2024-01-01 17:00:00", "x", 10.0))
    val r = EventWindows.anomalyZ(events(calm ++ spike: _*)).collect()
      .map(x => x.getLong(0) ->
        (Option(x.get(3)).map(_.toString.toDouble), x.getBoolean(4)))
      .toMap
    // events 0-4 lack history (n_hist < 5) and never appear
    assert(!r.contains(4L) && r.contains(5L), s"min-history cut diverged: $r")
    assert(r(6L)._2, s"spike must flag: ${r(6L)}")          // 500 vs calm history
    assert(!r(5L)._2, s"calm event must not flag: ${r(5L)}")
    // event 7 scores against a history CONTAINING the spike: huge sd, no flag
    assert(!r(7L)._2, s"post-spike event must absorb the spike into sd: ${r(7L)}")

    // constant history: sd = 0 -> z null, is_anom false (never inf/NaN)
    val const = (0 until 6).map(i => (i.toLong, f"2024-01-01 ${10 + i}%02d:00:00", "x", 7.0))
    val c = EventWindows.anomalyZ(events(const: _*)).collect()
      .map(x => (Option(x.get(3)), x.getBoolean(4)))
    assert(c.nonEmpty && c.forall { case (z, a) => z.isEmpty && !a }, s"constant history: ${c.toSeq}")
  }

  test("streaming status intervals equal the batch CLOSED rows across micro-batch boundaries") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "view", 0.0),
      (2L, "2024-01-01 11:00:00", "view", 0.0),
      (3L, "2024-01-01 12:00:00", "click", 0.0),
      (4L, "2024-01-01 13:00:00", "view", 0.0),
      (5L, "2024-01-01 14:00:00", "view", 0.0))
    val batch = EventWindows.statusIntervals(events(rows: _*))
      .filter(!col("is_current"))
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(2).getTime * 1000,
        r.getTimestamp(3).getTime * 1000, r.getLong(4))).toSet

    // parity must hold in the unbounded mode AND with a horizon wider
    // than the fixture's idle gaps (the within-horizon contract)
    Seq(None, Some(86400000L)).foreach { hz =>
      val in = MemoryStream[(Long, String, String, Double)](
        implicitly[org.apache.spark.sql.Encoder[(Long, String, String, Double)]], spark)
      val streamed = EventWindows.statusIntervalsStream(
        in.toDF().toDF("event_id", "ts_s", "event_type", "value")
          .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
            col("event_type"), lit(0L).as("user_id")), hz)
      val q = streamed.writeStream.outputMode("append")
        .format("memory").queryName(s"scd_stream_${hz.isDefined}").start()
      try {
        // a run SPLIT across micro-batches must not close at the boundary
        in.addData(rows.take(2): _*); q.processAllAvailable()
        in.addData(rows.drop(2): _*); q.processAllAvailable()
        val got = spark.table(s"scd_stream_${hz.isDefined}").collect()
          .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
        assert(got == batch, s"horizon=$hz: stream=$got\nbatch=$batch")
      } finally q.stop()
    }
  }

  test("streaming anomaly z equals batch across micro-batches, ts-peers and the eviction horizon") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // 7 calm events, a spike, a SAME-INSTANT peer pair, then a row two
    // days later (everything before it must be evicted -> no verdict)
    val rows = (0 until 7).map(i =>
      (i.toLong, f"2024-01-01 ${8 + i}%02d:00:00", "x", 10.0 + (i % 3) * 0.7)) ++ Seq(
      (7L, "2024-01-01 16:00:00", "x", 400.0),
      (8L, "2024-01-01 17:00:00", "x", 11.1),
      (9L, "2024-01-01 17:00:00", "x", 12.2),   // exact ts peer of 8
      (10L, "2024-01-03 18:00:00", "x", 10.0))  // > 24h after everything
    val batch = EventWindows.anomalyZ(events(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toSet
    assert(batch.exists(_._1 == 8L) && batch.exists(_._1 == 9L)
      && !batch.exists(_._1 == 10L), s"fixture must exercise peers+eviction: $batch")

    // parity in unbounded mode AND with the horizon equal to the frame
    // width: eviction then coincides with the frame going empty, so
    // within-horizon verdicts are unchanged even across the 2-day gap
    Seq(None, Some(EventWindows.AnomFrameUs / 1000L)).foreach { hz =>
      val in = MemoryStream[(Long, String, String, Double)](
        implicitly[org.apache.spark.sql.Encoder[(Long, String, String, Double)]], spark)
      val streamed = EventWindows.anomalyZStream(
        in.toDF().toDF("event_id", "ts_s", "event_type", "value")
          .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
            col("value"), lit(0L).as("user_id")), hz)
      val q = streamed.writeStream.outputMode("append")
        .format("memory").queryName(s"anom_stream_${hz.isDefined}").start()
      try {
        // split so history accumulates ACROSS batches and the peer pair
        // arrives in one batch
        in.addData(rows.take(6): _*); q.processAllAvailable()
        in.addData(rows.drop(6): _*); q.processAllAvailable()
        val got = spark.table(s"anom_stream_${hz.isDefined}").collect()
          .map(r => (r.getLong(0), r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toSet
        assert(got == batch, s"horizon=$hz: stream=$got\nbatch=$batch")
      } finally q.stop()
    }
  }

  test("histogram quantiles: rank walk hand-exact, day split merges exactly, clamps hold") {
    // ten values 0.5..9.5 spread across THREE days of one week: the
    // weekly histogram must equal the single-day one (integer-sum merge)
    val rows = (0 until 10).map { i =>
      val d = 1 + i % 3 // Jan 1-3, 2024 — Mon-Wed of one ISO week
      (i.toLong, f"2024-01-0$d 12:00:00", "x", i + 0.5)
    }
    val r = EventWindows.histogramQuantileRollup(events(rows: _*)).collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2), x.getLong(3)))
    // N=10: p50 rank 5 -> bin 4 filled to its top edge (est 5.0);
    // p90 rank 9 -> bin 8 -> 9.0; p99 rank ceil(9.9)=10 -> bin 9 -> 10.0
    assert(r.toSeq == Seq(
      ("2024-01-01", 0.5, 5.0, 10L),
      ("2024-01-01", 0.9, 9.0, 10L),
      ("2024-01-01", 0.99, 10.0, 10L)), s"quantiles diverged: ${r.toSeq}")

    // clamps: a negative and an overflow value land in the edge bins
    val extreme = events(
      (1L, "2024-01-01 12:00:00", "x", -5.0),
      (2L, "2024-01-01 13:00:00", "x", 2000.0))
    val e = EventWindows.histogramQuantileRollup(extreme).collect()
      .map(x => (x.getDouble(1), x.getDouble(2))).toMap
    assert(e(0.5) == 1.0 && e(0.99) == 1024.0, s"clamps diverged: $e")
  }

  test("streaming TWAP equals batch across micro-batches, ts-peers and single-event days") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // day 1: four intervals incl. a zero-width ts-peer pair; day 2: a
    // single event (no held interval — batch emits nothing)
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "x", 10.0),
      (2L, "2024-01-01 11:00:00", "x", 20.125),
      (3L, "2024-01-01 11:00:00", "x", 30.0),   // exact ts peer of 2
      (4L, "2024-01-01 12:30:00", "x", 7.5),
      (5L, "2024-01-02 09:00:00", "x", 99.0))
    val batch = EventWindows.twap(events(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(batch.size == 1 && batch.head._2 == "2024-01-01",
      s"fixture must leave exactly the one multi-event day: $batch")

    // parity in unbounded mode AND with a horizon wider than the
    // fixture's day-to-day gap (the within-horizon contract)
    Seq(None, Some(86400000L)).foreach { hz =>
      val in = MemoryStream[(Long, String, Double)](
        implicitly[org.apache.spark.sql.Encoder[(Long, String, Double)]], spark)
      val streamed = EventWindows.twapStream(
        in.toDF().toDF("event_id", "ts_s", "value")
          .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
            col("value"), lit(0L).as("user_id")), hz)
      val q = streamed.writeStream.outputMode("append")
        .format("memory").queryName(s"twap_stream_${hz.isDefined}").start()
      try {
        val feed = rows.map(r => (r._1, r._2, r._4))
        // split mid-day so the held interval crosses the batch boundary
        in.addData(feed.take(2): _*); q.processAllAvailable()
        in.addData(feed.drop(2): _*); q.processAllAvailable()
        val got = spark.table(s"twap_stream_${hz.isDefined}")
          .withColumn("seq", monotonically_increasing_id())
          .collect().sortBy(_.getLong(5))
          .map(r => (r.getLong(0), r.getString(1)) ->
            ((r.getLong(2), r.getLong(3), Option(r.get(4)))))
          .toMap // last emission per key wins
        val gotFinal = got.collect {
          case ((u, d), (n, span, Some(t: Double))) if span > 0 => (u, d, n, span, t)
        }.toSet
        assert(gotFinal == batch, s"horizon=$hz: stream=$gotFinal\nbatch=$batch")
        // the single-event day is an open position: present, zero span
        assert(got((0L, "2024-01-02")) == ((0L, 0L, None)),
          s"single-event day must hold state with no estimate: $got")
      } finally q.stop()
    }
  }

  test("trending: volume ranks with item tie-break; delta only credits the ADJACENT previous day") {
    val s = TestSpark.spark
    import s.implicits._
    def ev(id: Long, day: String, item: Int) =
      (id, s"$day 12:00:00", s"""{"k": $item}""")
    // day 1: item 7 x3, item 9 x1; day 2: item 9 x4 (rising), item 7 x2
    // (falling); day 4 (gap!): item 7 x2 -> prev day is day 2, NOT
    // adjacent, so its delta is the full count
    val rows = Seq(
      ev(1, "2024-01-01", 7), ev(2, "2024-01-01", 7), ev(3, "2024-01-01", 7),
      ev(4, "2024-01-01", 9),
      ev(5, "2024-01-02", 9), ev(6, "2024-01-02", 9), ev(7, "2024-01-02", 9),
      ev(8, "2024-01-02", 9), ev(9, "2024-01-02", 7), ev(10, "2024-01-02", 7),
      ev(11, "2024-01-04", 7), ev(12, "2024-01-04", 7))
    val d = rows.toDF("event_id", "ts_s", "props")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("props"),
        lit(0L).as("user_id"), lit("x").as("event_type"), lit(0.0).as("value"))
    val got = EventWindows.trendingItems(d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 1, 7, 3L, 3L), ("2024-01-01", 2, 9, 1L, 1L),
      ("2024-01-02", 1, 9, 4L, 3L), ("2024-01-02", 2, 7, 2L, -1L),
      ("2024-01-04", 1, 7, 2L, 2L)), s"${got.toSeq}")
  }

  test("seasonal decomposition: a pure weekly pattern leaves zero residuals") {
    val s = TestSpark.spark
    import s.implicits._
    // one purchase per day for 14 days from Monday 2024-01-01, value
    // 100 + 10*(isodow-1): the 7-obs MA is the constant 130, the
    // seasonal index absorbs the rest, residuals must be exactly 0.
    val rows = (0 until 14).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      val dow = day.getDayOfWeek.getValue
      (i.toLong, s"$day 12:00:00", 100.0 + 10.0 * (dow - 1))
    }
    val d = rows.toDF("event_id", "ts_s", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        lit(1L).as("user_id"), lit("purchase").as("event_type"),
        col("value"), lit("").as("props"))
    val got = EventWindows.seasonalDecompose(d).collect()
    assert(got.length == 14)
    val full = got.filter(!_.isNullAt(2)) // rows with a full 7-obs window
    assert(full.length == 8, s"expected 8 full-window days, ${full.length}")
    full.foreach { r =>
      assert(r.getDouble(2) == 130.0, s"trend ${r.getString(0)}: ${r.getDouble(2)}")
      assert(r.getDouble(4) == 0.0, s"resid ${r.getString(0)}: ${r.getDouble(4)}")
    }
    val monday = full.find(_.getString(0) == "2024-01-08").get
    assert(monday.getDouble(3) == -30.0, s"monday seasonal: $monday")
  }

  test("KM survival: censored users stay at risk until their span, never count as events") {
    val s = TestSpark.spark
    import s.implicits._
    // A converts on day 2, C on day 0; B never converts (its purchase is
    // below the value floor) and is censored at the corpus end (day 10).
    // Hand KM: t=0 -> 1 - 1/3 = 2/3; t=2 -> 2/3 * (1 - 1/2) = 1/3.
    // B's censoring at day 10 emits NO row but kept it in t=2's risk set.
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "view", 0.0),
      (2L, "2024-01-03 01:00:00", 10L, "purchase", 200.0), // A: day 2
      (3L, "2024-01-01 00:00:00", 20L, "view", 0.0),
      (4L, "2024-01-05 00:00:00", 20L, "purchase", 50.0),  // B: below floor
      (5L, "2024-01-11 00:00:00", 20L, "view", 0.0),       // corpus max
      (6L, "2024-01-01 00:00:00", 30L, "purchase", 130.0)) // C: day 0
    val d = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("").as("props"))
    val got = EventWindows.kmSurvival(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 3L, 1L, 0.666667), (2L, 2L, 1L, 0.333333)),
      s"hand KM diverged: ${got.toSeq}")
  }

  test("KM survival: everyone converting pins the tail to exactly 0.0, not ln(0)") {
    val s = TestSpark.spark
    import s.implicits._
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "view", 0.0),
      (2L, "2024-01-02 00:00:00", 10L, "purchase", 500.0),
      (3L, "2024-01-01 00:00:00", 20L, "purchase", 500.0))
    val d = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("").as("props"))
    val got = EventWindows.kmSurvival(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 2L, 1L, 0.5), (1L, 1L, 1L, 0.0)),
      s"${got.toSeq}")
  }

  test("anomaly z forget: the erased history never scores a later event; survivors and rebuilds unaffected") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val calm1 = (0 until 6).map(i =>
      (i.toLong, f"2024-01-01 ${8 + i}%02d:00:00", 10.0 + i % 2, 1L, "add"))
    val calm2 = (0 until 6).map(i =>
      (100L + i, f"2024-01-01 ${8 + i}%02d:00:00", 10.0 + i % 2, 2L, "add"))
    val in = MemoryStream[(Long, String, Double, Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, Double, Long, String)]],
      spark)
    val q = EventWindows.anomalyZStream(
        in.toDF().toDF("event_id", "ts_s", "value", "user_id", "op")
          .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
            col("value"), col("user_id"), col("op")))
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_forget").start()
    try {
      in.addData(calm1 ++ calm2: _*); q.processAllAvailable()
      // erase user 1's held history mid-stream (value unused on a forget)
      in.addData((999L, "2024-01-01 14:30:00", 0.0, 1L, "forget"))
      q.processAllAvailable()
      // probe both users: the survivor scores against its 6-event
      // history; the erased user has NO history to score against
      in.addData((7L, "2024-01-01 15:00:00", 400.0, 1L, "add"),
        (107L, "2024-01-01 15:00:00", 400.0, 2L, "add"))
      q.processAllAvailable()
      val got = spark.table("anom_forget").collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
      assert(!got.contains(7L), s"erased history must not score the probe: $got")
      assert(got(107L) == ((6L, true)),
        s"survivor must flag the spike against its full history: $got")
      // post-forget arrivals rebuild from EMPTY (no ghost of the erased
      // values): 4 more events give the next probe exactly 5 of history
      in.addData((8 until 12).map(i =>
        (i.toLong, f"2024-01-01 15:${(i - 7) * 10}%02d:00", 10.0, 1L, "add")): _*)
      q.processAllAvailable()
      in.addData((12L, "2024-01-01 16:30:00", 10.0, 1L, "add"))
      q.processAllAvailable()
      val n12 = spark.table("anom_forget").collect()
        .find(_.getLong(0) == 12L).map(_.getLong(2))
      assert(n12.contains(5L),
        s"history must rebuild from empty after the forget: n_hist=$n12")
    } finally q.stop()
  }

  test("anomaly z forget survives crash-and-replay: the redelivered forget batch re-purges identically") {
    val spark = TestSpark.spark
    import spark.implicits._
    def at(hm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00")
    val dataDir = java.nio.file.Files.createTempDirectory("graft-anomcr-data").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-anomcr-ckpt").toString
    val schema = Seq((1L, at("08:00"), 1.0, 1L, "add"))
      .toDF("event_id", "ts", "value", "user_id", "op").schema
    def land(i: Int, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-anomcr-chunk").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val dest = new java.io.File(dataDir, f"chunk-$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      assert(dest.setLastModified(System.currentTimeMillis() - 3600000L + i * 60000L))
      ()
    }
    land(0, ((0 until 6).map(i => (i.toLong, at(f"${8 + i}%02d:00"), 10.0 + i % 2, 1L, "add")) ++
      (0 until 6).map(i => (100L + i, at(f"${8 + i}%02d:00"), 10.0 + i % 2, 2L, "add")))
      .toDF("event_id", "ts", "value", "user_id", "op"))
    land(1, Seq((999L, at("14:30"), 0.0, 1L, "forget"))
      .toDF("event_id", "ts", "value", "user_id", "op"))
    land(2, Seq((7L, at("15:00"), 400.0, 1L, "add"),
      (107L, at("15:00"), 400.0, 2L, "add"))
      .toDF("event_id", "ts", "value", "user_id", "op"))

    val byId = scala.collection.concurrent.TrieMap.empty[Long, Long]
    @volatile var crashOnce = true
    def startQuery() = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
      EventWindows.anomalyZStream(stream).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.collect().foreach(r => byId.put(r.getLong(0), r.getLong(2)))
          // die on the FORGET batch, after the side effect and before the
          // state commit: the restart must redeliver it and re-purge
          if (id == 1L && crashOnce) { crashOnce = false; sys.error("injected crash") }
          ()
        }.start()
    }
    val q1 = startQuery()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q1.awaitTermination(60000))
    val q2 = startQuery()
    assert(q2.awaitTermination(120000), "restarted query did not finish in time")
    q2.stop()
    assert(!crashOnce, "the injected crash must have fired")
    assert(!byId.contains(7L),
      s"the replayed forget must still purge user 1's history: $byId")
    assert(byId.get(107L).contains(6L),
      s"the survivor must score against its full history: $byId")
  }

  test("anomaly z horizon: idle users physically evict from the checkpoint; active users keep their history") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-anomh-ckpt").toString
    val in = MemoryStream[(Long, java.sql.Timestamp, Double, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, java.sql.Timestamp, Double, Long)]],
      spark)
    // 10-second event-time horizon
    val q = EventWindows.anomalyZStream(
        in.toDF().toDF("event_id", "ts", "value", "user_id"),
        horizonMs = Some(10000L))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("anom_horizon").start()
    try {
      // user 1 active early; user 2 keeps the stream (and watermark) alive
      in.addData((0 until 6).map(i => (i.toLong, at(i), 10.0 + i % 2, 1L)) :+
        ((100L, at(1), 11.0, 2L))); q.processAllAvailable()
      in.addData((101L, at(100), 12.0, 2L)); q.processAllAvailable()
      // the batch-2 watermark (100s − 10s) passes user 1's deadline
      // (5s + 10s); this batch fires the timer
      in.addData((102L, at(101), 13.0, 2L)); q.processAllAvailable()
    } finally q.stop()
    val keys = graft.streaming.StateAudit.stateTable(spark, ckpt)
      .select(col("key").getField("value")).collect()
      .map(_.getLong(0)).toSet
    assert(keys == Set(2L),
      s"idle user must be physically evicted from the state store: $keys")
  }

  test("status intervals forget: the open run is erased unpublished; horizon evicts idle users silently") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000)
    val in = MemoryStream[(Long, java.sql.Timestamp, String, Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, java.sql.Timestamp, String, Long, String)]],
      spark)
    // 10-second horizon exercises eviction in the same query
    val q = EventWindows.statusIntervalsStream(
        in.toDF().toDF("event_id", "ts", "event_type", "user_id", "op"),
        horizonMs = Some(10000L))
      .writeStream.outputMode("append")
      .format("memory").queryName("scd_forget").start()
    try {
      // user 1: view run closes at the click; the click run stays open.
      // user 3: a view run that will be EVICTED by the horizon, not closed
      in.addData((1L, at(0), "view", 1L, "add"), (2L, at(1), "view", 1L, "add"),
        (3L, at(2), "click", 1L, "add"), (30L, at(0), "view", 3L, "add"))
      q.processAllAvailable()
      // erase user 1's open click run — it must never be emitted
      in.addData((0L, at(3), null.asInstanceOf[String], 1L, "forget"))
      q.processAllAvailable()
      // user 1 returns: a fresh view run opens (no close of the erased
      // click run), then a click closes IT; user 3 idles past the horizon
      in.addData((4L, at(4), "view", 1L, "add"))
      q.processAllAvailable()
      in.addData((5L, at(5), "click", 1L, "add"), (90L, at(100), "view", 9L, "add"))
      q.processAllAvailable()
      in.addData((91L, at(101), "view", 9L, "add"))
      q.processAllAvailable()
      // user 3 re-appears AFTER eviction: opens fresh, then closes — the
      // pre-gap view run from t=0 must never close (it was evicted)
      in.addData((31L, at(102), "click", 3L, "add"), (32L, at(103), "view", 3L, "add"))
      q.processAllAvailable()
      val got = spark.table("scd_forget").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 1000000L,
          r.getLong(3) / 1000000L)).toSet
      val t0s = t0 / 1000
      assert(got.contains((1L, "view", t0s + 0, t0s + 2)),
        s"the pre-forget closed run must emit: $got")
      assert(!got.exists(r => r._1 == 1L && r._2 == "click"),
        s"the erased open click run must never be published: $got")
      assert(got.contains((1L, "view", t0s + 4, t0s + 5)),
        s"the post-forget fresh run must close normally: $got")
      assert(!got.exists(r => r._1 == 3L && r._3 == t0s),
        s"the evicted pre-gap run must never close (silent eviction): $got")
      assert(got.contains((3L, "click", t0s + 102, t0s + 103)),
        s"the returning user's fresh run must close normally: $got")
    } finally q.stop()
  }

  test("streaming TWAP forget: the (user, day) key purges unpublished and rebuilds fresh; survivors untouched") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String, Double, Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, Double, Long, String)]],
      spark)
    val q = EventWindows.twapStream(
        in.toDF().toDF("event_id", "ts_s", "value", "user_id", "op")
          .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
            col("value"), col("user_id"), col("op")))
      .writeStream.outputMode("append")
      .format("memory").queryName("twap_forget").start()
    try {
      in.addData((1L, "2024-01-01 10:00:00", 10.0, 1L, "add"),
        (2L, "2024-01-01 11:00:00", 20.0, 1L, "add"),
        (11L, "2024-01-01 10:00:00", 30.0, 2L, "add"),
        (12L, "2024-01-01 11:00:00", 40.0, 2L, "add"))
      q.processAllAvailable()
      val before = spark.table("twap_forget").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(before((1L, "2024-01-01")) == 1L && before((2L, "2024-01-01")) == 1L,
        s"both users must hold a day-1 position: $before")
      // erase user 1's day-1 state: the forget batch emits NOTHING for it
      in.addData((0L, "2024-01-01 12:00:00", 0.0, 1L, "forget"))
      q.processAllAvailable()
      val afterForget = spark.table("twap_forget")
        .withColumn("seq", monotonically_increasing_id()).collect()
      assert(afterForget.length == before.size,
        s"a forget-only batch must emit no snapshot: ${afterForget.length} rows")
      // user 1 returns on day 1: the fold restarts from EMPTY (one event,
      // no held interval) — the erased 10:00–11:00 interval is gone
      in.addData((3L, "2024-01-01 13:00:00", 50.0, 1L, "add"))
      q.processAllAvailable()
      val rebuilt = spark.table("twap_forget")
        .withColumn("seq", monotonically_increasing_id())
        .collect().sortBy(_.getLong(5)).last
      assert((rebuilt.getLong(0), rebuilt.getString(1), rebuilt.getLong(2),
        rebuilt.getLong(3)) == ((1L, "2024-01-01", 0L, 0L)),
        s"post-forget rebuild must start from empty state: $rebuilt")
    } finally q.stop()
  }
}
