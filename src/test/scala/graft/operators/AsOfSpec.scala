package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AS-OF join semantics on a hand-computed fixture: inclusive <=,
  * latest-wins, null before the first right row, per-key isolation.
  */
class AsOfSpec extends AnyFunSuite {

  private def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("each left row matches the latest right row at or before it, per key") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clicks = Seq(
      (1L, ts(0), 100L), // before any view -> null
      (1L, ts(2), 101L), // between views  -> view at t1
      (1L, ts(3), 102L), // simultaneous   -> view at t3 (inclusive <=)
      (1L, ts(9), 103L), // after all      -> latest view t3
      (2L, ts(5), 104L)  // other user: only ITS views count -> null
    ).toDF("user_id", "ts", "event_id")
    val views = Seq((1L, ts(1), 900L), (1L, ts(3), 901L))
      .toDF("user_id", "vts", "view_id")
    val got = AsOf.asOf(clicks, "user_id", "ts", views, "vts", "view_id")
      .select(col("event_id"), col("__match"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(100L -> -1L, 101L -> 900L, 102L -> 901L, 103L -> 901L, 104L -> -1L))
  }

  test("null join keys never match — join semantics, not window-partition semantics") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clicks = Seq((Option.empty[Long], ts(5), 100L), (Some(1L), ts(5), 101L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((Option.empty[Long], ts(1), 900L), (Some(1L), ts(1), 901L))
      .toDF("user_id", "vts", "view_id")
    val got = AsOf.asOf(clicks, "user_id", "ts", views, "vts", "view_id")
      .select(col("event_id"), col("__match"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // the null-key click must NOT attribute to the null-key view (an ASOF
    // JOIN never matches NULL = NULL); the real key still matches
    assert(got == Map(100L -> -1L, 101L -> 901L))
  }

  test("banded range join finds exactly the in-window pairs, each once") {
    val spark = TestSpark.spark
    import spark.implicits._
    // window = 10s; left at t5 reaches [5, 15]: catches t5 (inclusive
    // start), t12 (bucket boundary crossed), t15 (inclusive end); misses
    // t4 (before) and t16 (after). Pair (t5, t12) spans two buckets —
    // the explode must find it exactly once.
    val left = Seq((1L, ts(5), 10L)).toDF("k", "lt", "lid")
    val right = Seq((1L, ts(4), 20L), (1L, ts(5), 21L), (1L, ts(12), 22L),
      (1L, ts(15), 23L), (1L, ts(16), 24L), (2L, ts(6), 25L))
      .toDF("k", "rt", "rid")
    val got = RangeJoin.banded(left, "k", "lt", right, "rt", 10L * 1000000).collect()
      .map(r => (r.getAs[Long]("lid"), r.getAs[Long]("rid")))
    assert(got.sorted.sameElements(Array((10L, 21L), (10L, 22L), (10L, 23L))),
      s"got ${got.toSeq}")
    assert(got.length == got.distinct.length, "each pair exactly once")
  }

  test("segmented as-of matches plain as-of, carry-ins crossing bucket boundaries") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clicks = Seq(
      (1L, ts(0), 100L),  // before any view -> null
      (1L, ts(2), 101L),  // same bucket as the t1 view
      (1L, ts(3), 102L),  // simultaneous view (inclusive <=)
      (1L, ts(9), 103L),  // THIRD bucket: match must carry in from bucket 0
      (1L, ts(30), 105L), // many empty buckets later: carry still reaches
      (2L, ts(5), 104L)   // other key, no views -> null
    ).toDF("user_id", "ts", "event_id")
    val views = Seq((1L, ts(1), 900L), (1L, ts(3), 901L))
      .toDF("user_id", "vts", "view_id")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("__match"), col("__mts"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getTimestamp(2))).toSet
    // 4-second buckets: t9 and t30 land in buckets with no views at all,
    // so their matches exist ONLY via the carry-in pass
    val seg = run(AsOf.asOfSegmented(clicks, "user_id", "ts", views, "vts",
      "view_id", 4L * 1000000))
    val plain = run(AsOf.asOf(clicks, "user_id", "ts", views, "vts", "view_id"))
    assert(seg == plain, s"segmented $seg != plain $plain")
    assert(seg.contains((103L, 901L, ts(3))) && seg.contains((105L, 901L, ts(3))))
  }

  test("null right timestamps never match — vts <= ts is never true for NULL") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clicks = Seq((1L, ts(5), 100L)).toDF("user_id", "ts", "event_id")
    // a null-ts view would sort FIRST under the window's nulls-first order
    // and silently match every click if it weren't dropped
    val views = Seq((1L, Option.empty[Timestamp], 900L), (1L, Some(ts(2)), 901L))
      .toDF("user_id", "vts", "view_id")
    for (result <- Seq(
        AsOf.asOf(clicks, "user_id", "ts", views, "vts", "view_id"),
        AsOf.asOfSegmented(clicks, "user_id", "ts", views, "vts", "view_id",
          4L * 1000000))) {
      val r = result.collect().head
      assert(r.getAs[Long]("__match") == 901L)
      assert(r.getAs[Timestamp]("__mts") == ts(2))
    }
    // two null-ts right rows are dropped, not flagged as duplicates
    val twoNulls = Seq((1L, Option.empty[Timestamp], 900L),
      (1L, Option.empty[Timestamp], 902L)).toDF("user_id", "vts", "view_id")
    val unmatched = AsOf.asOf(clicks, "user_id", "ts", twoNulls, "vts", "view_id")
      .collect().head
    assert(unmatched.isNullAt(unmatched.fieldIndex("__match")))
  }

  test("a null right payload fails loudly, never reads as 'no match yet'") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, ts(5), 100L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(1), Option.empty[Long]), (1L, ts(2), Some(7L)))
      .toDF("k", "rt", "v")
    val ex = intercept[Exception](
      AsOf.asOf(left, "k", "t", right, "rt", "v").collect())
    assert(ex.getMessage.contains("payload 'v' is null"),
      s"expected the null-payload guard, got: ${ex.getMessage}")
  }

  test("duplicate right rows per (key, ts) fail loudly, never pick a winner") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, ts(5), 100L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(2), 7L), (1L, ts(2), 8L)).toDF("k", "rt", "v")
    val ex = intercept[Exception](
      AsOf.asOf(left, "k", "t", right, "rt", "v").collect())
    assert(ex.getMessage.contains("duplicate right rows"),
      s"expected the duplicate guard, got: ${ex.getMessage}")
    // same instant on DIFFERENT keys is fine (uniqueness is per key)
    val ok = Seq((1L, ts(2), 7L), (2L, ts(2), 8L)).toDF("k", "rt", "v")
    assert(AsOf.asOf(left, "k", "t", ok, "rt", "v")
      .collect().head.getAs[Long]("__match") == 7L)
  }

  test("matched timestamp rides along and left columns pass through") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, ts(5), "payload")).toDF("k", "t", "extra")
    val right = Seq((1L, ts(2), 7L)).toDF("k", "rt", "v")
    val r = AsOf.asOf(left, "k", "t", right, "rt", "v").collect().head
    assert(r.getAs[String]("extra") == "payload")
    assert(r.getAs[Long]("__match") == 7L)
    assert(r.getAs[Timestamp]("__mts") == ts(2))
  }

  test("streaming as-of equals the batch as-of when keys arrive in event order") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the batch ground truth on the same fixture as the semantics test
    val clicks = Seq(
      (1L, ts(0), 100L), (1L, ts(2), 101L), (1L, ts(3), 102L),
      (1L, ts(9), 103L), (2L, ts(5), 104L)
    ).toDF("user_id", "ts", "event_id")
    val views = Seq((1L, ts(1), 900L), (1L, ts(3), 901L))
      .toDF("user_id", "vts", "view_id")
    val expected = AsOf.asOf(clicks, "user_id", "ts", views, "vts", "view_id")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("__match"))) -1L else r.getAs[Long]("__match")))
      .toMap

    val lIn = MemoryStream[(Long, Timestamp, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp, Long)]], spark)
    val rIn = MemoryStream[(Long, Timestamp, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp, Long)]], spark)
    val out = AsOf.asOfStream(
      lIn.toDF().toDF("user_id", "ts", "event_id"), "user_id", "ts", "event_id",
      rIn.toDF().toDF("user_id", "vts", "view_id"), "vts", "view_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_stream").start()
    // batch 1: events up to t2, in event order (t3 view NOT yet seen)
    rIn.addData((1L, ts(1), 900L))
    lIn.addData((1L, ts(0), 100L), (1L, ts(2), 101L))
    q.processAllAvailable()
    // batch 2: the rest — the simultaneous view+click land in ONE batch,
    // so the intra-batch sort applies the inclusive-<= tie rule
    rIn.addData((1L, ts(3), 901L))
    lIn.addData((1L, ts(3), 102L), (1L, ts(9), 103L), (2L, ts(5), 104L))
    q.processAllAvailable()
    val got = spark.table("asof_stream")
      .collect()
      .map(r => r.getAs[String]("value").toLong ->
        Option(r.getAs[String]("match_pay")).map(_.toLong).getOrElse(-1L))
      .toMap
    q.stop()
    assert(got == expected,
      s"stream-order as-of must equal batch as-of on in-order arrival: $got vs $expected")
  }

  test("streaming as-of enforces the batch preconditions; idempotent redelivery and stale rights are safe") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def start(name: String) = {
      val lIn = MemoryStream[(String, Timestamp, String)](
        implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
      val rIn = MemoryStream[(String, Timestamp, String)](
        implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
      val q = AsOf.asOfStream(
        lIn.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
        rIn.toDF().toDF("k", "rts", "pay"), "rts", "pay")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      (lIn, rIn, q)
    }
    // conflicting duplicate right rows at one (key, ts): the query DIES
    // (the rapid error-stop contract — batch raise_errors the same input)
    val (_, rDup, qDup) = start("asof_dup_conflict")
    rDup.addData(("u1", ts(1), "a"), ("u1", ts(1), "b"))
    val died = intercept[Exception](qDup.processAllAvailable())
    assert(died.getMessage.contains("conflicting right rows")
      || Option(died.getCause).exists(_.getMessage.contains("conflicting right rows")))
    qDup.stop()
    // null right payload: dies too (indistinguishable from "no match yet")
    val (_, rNull, qNull) = start("asof_null_pay")
    rNull.addData(("u1", ts(1), null))
    val died2 = intercept[Exception](qNull.processAllAvailable())
    assert(died2.getMessage.contains("right payload is null")
      || Option(died2.getCause).exists(_.getMessage.contains("right payload is null")))
    qNull.stop()
    // conflicting duplicates OLDER than the carried state still die: the
    // within-batch check is state-independent (the stale branch must not
    // swallow them)
    val (_, rOld, qOld) = start("asof_dup_old")
    rOld.addData(("u1", ts(5), "newer"))
    qOld.processAllAvailable()
    rOld.addData(("u1", ts(1), "a"), ("u1", ts(1), "b")) // both older than state ts(5)
    val died3 = intercept[Exception](qOld.processAllAvailable())
    assert(died3.getMessage.contains("conflicting right rows")
      || Option(died3.getCause).exists(_.getMessage.contains("conflicting right rows")))
    qOld.stop()
    // identical redelivery (at-least-once) is a no-op; a LATE right row
    // older than the state never regresses "latest wins"
    val (lOk, rOk, qOk) = start("asof_redeliver")
    rOk.addData(("u1", ts(2), "new"))
    qOk.processAllAvailable()
    rOk.addData(("u1", ts(2), "new"), ("u1", ts(1), "stale"))
    lOk.addData(("u1", ts(5), "left"))
    qOk.processAllAvailable()
    val got = spark.table("asof_redeliver").collect()
      .map(r => r.getAs[String]("value") -> r.getAs[String]("match_pay")).toMap
    qOk.stop()
    assert(got == Map("left" -> "new"), s"got $got")
  }

  test("an out-of-order left row older than the carried state emits UNMATCHED, never a future payload") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val rIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val q = AsOf.asOfStream(
      lIn.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
      rIn.toDF().toDF("k", "rts", "pay"), "rts", "pay")
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_ooo_left").start()
    // state advances to ts(5) first
    rIn.addData(("u1", ts(5), "future"))
    q.processAllAvailable()
    // then a LATE left row at ts(2): the state can't rewind to whatever
    // held at ts(2), and "future" is from the row's event-time FUTURE —
    // the in-order contract is violated, so the row must surface as
    // unmatched (observable) instead of silently event-time-wrong...
    lIn.addData(("u1", ts(2), "late"))
    // ...while an in-order left row after the state matches normally
    lIn.addData(("u1", ts(7), "ontime"))
    q.processAllAvailable()
    val rows = spark.table("asof_ooo_left").collect()
      .map(r => r.getAs[String]("value") ->
        (Option(r.getAs[String]("match_pay")), Option(r.getAs[java.lang.Long]("match_ts_us"))))
      .toMap
    q.stop()
    assert(rows("late") == (None, None), s"late row must not match its future: $rows")
    assert(rows("ontime")._1 == Some("future"), s"in-order row must match: $rows")
  }

  test("streaming as-of null semantics match the batch join: null keys/ts never match, never crash") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val rIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val out = AsOf.asOfStream(
      lIn.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
      rIn.toDF().toDF("k", "rts", "pay"), "rts", "pay")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_stream_nulls").start()
    // a null-key right row and a null-ts right row: both DROPPED (batch
    // prepSides semantics) — the null-key left row below must NOT see them
    rIn.addData((null, ts(1), "ghost"), ("u1", null, "ghost2"), ("u1", ts(1), "real"))
    // null-key left, null-ts left, and a normal left that matches "real"
    lIn.addData((null, ts(5), "nullkey"), ("u1", null, "nullts"), ("u1", ts(5), "ok"))
    q.processAllAvailable()
    val rows = spark.table("asof_stream_nulls").collect()
      .map(r => r.getAs[String]("value") -> Option(r.getAs[String]("match_pay")))
      .toMap
    q.stop()
    assert(rows == Map(
      "nullkey" -> None, // null key: no right row can match (join, not window, semantics)
      "nullts" -> None,  // vts <= NULL is never true
      "ok" -> Some("real")), s"got $rows")
  }

  test("nearest as-of: closer side wins, exact tie goes backward, tolerance cuts off") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clicks = Seq(
      (1L, ts(50), 100L), // views at 30 and 55: forward is closer (5 < 20)
      (2L, ts(45), 200L), // views at 35 and 55: equidistant -> BACKWARD wins
      (3L, ts(50), 300L), // view exactly AT 50: backward, gap 0
      (4L, ts(50), 400L), // only view at 20: |30s| > 10s tolerance -> unmatched
      (5L, ts(50), 500L)  // only view ahead at 56: forward within tolerance
    ).toDF("user_id", "ts", "event_id")
    val views = Seq(
      (1L, ts(30), 11L), (1L, ts(55), 12L),
      (2L, ts(35), 21L), (2L, ts(55), 22L),
      (3L, ts(50), 31L),
      (4L, ts(20), 41L),
      (5L, ts(56), 51L)
    ).toDF("user_id", "vts", "view_id")
    val got = AsOf.asOfNearest(clicks, "user_id", "ts", views, "vts", "view_id",
        10L * 1000000)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("__match")).map(_.longValue))
      .toMap
    assert(got == Map(
      100L -> Some(12L), 200L -> Some(21L), 300L -> Some(31L),
      400L -> None, 500L -> Some(51L)), s"got $got")
  }

  test("streaming nearest as-of decides at the watermark horizon and matches the batch rule") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val lIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val rIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val out = AsOf.asOfNearestStream(
      lIn.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
      rIn.toDF().toDF("k", "rts", "pay"), "rts", "pay",
      10L * 1000000, "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("nearest_stream").start()
    rIn.addData(("u1", ts(30), "p30"), ("u1", ts(55), "p55"),
      ("u2", ts(35), "q35"), ("u2", ts(55), "q55"))
    lIn.addData(
      ("u1", ts(50), "c50"),   // back 30 out of tol, fwd 55 gap 5 -> p55
      ("u1", ts(58), "c58"),   // back 55 gap 3 -> p55
      ("u2", ts(45), "c45"),   // tie: 35 and 55 both gap 10 -> BACKWARD q35
      ("u3", ts(50), "alone"), // no rights -> unmatched
      ("u4", null, "nullts"))  // null event time -> immediate unmatched
    q.processAllAvailable()
    // nothing with lt + tol past the watermark may have emitted yet; the
    // sentinel pushes the watermark beyond every horizon
    rIn.addData(("zz", Timestamp.valueOf("2024-01-01 02:00:00"), "sentinel"))
    q.processAllAvailable()
    val got = spark.table("nearest_stream").collect()
      .map(r => r.getAs[String]("value") -> Option(r.getAs[String]("match_pay")))
      .toMap
    q.stop()
    assert(got == Map(
      "c50" -> Some("p55"), "c58" -> Some("p55"), "c45" -> Some("q35"),
      "alone" -> None, "nullts" -> None), s"got $got")
  }

  test("nearest fold evicts unreachable rights: state bounded by the horizon, not the stream") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val tolUs = 10L * 1000000
    def st(s: Option[AsOf.NearState], wmMs: Long) =
      TestGroupState.create[AsOf.NearState](
        org.apache.spark.api.java.Optional.ofNullable(s.orNull),
        GroupStateTimeout.EventTimeTimeout, 0L,
        org.apache.spark.api.java.Optional.of(wmMs),
        hasTimedOut = false)
    def right(sec: Long) = AsOf.NearEv("k", ts(0), Some(sec * 1000000), 0, s"p$sec")
    // batch 1 (watermark 0): two rights buffer, no pending lefts
    val s1 = st(None, 0L)
    assert(AsOf.foldNearest(tolUs)("k", Iterator(right(20), right(40)), s1).isEmpty)
    assert(s1.exists && s1.get.rights.size == 2)
    // batch 2: watermark at 35s -> the 20s right is unreachable by ANY
    // pending (none) or future left (lt >= 35s, horizon 25s) and is
    // evicted; the 40s right survives
    val s2 = st(Some(s1.get), 35000L)
    assert(AsOf.foldNearest(tolUs)("k", Iterator.empty, s2).isEmpty)
    assert(s2.exists && s2.get.rights.map(_._1) == List(40000000L),
      s"state ${s2.get}")
    // batch 3: watermark past every right's GC horizon -> state removed
    val s3 = st(Some(s2.get), 70000L)
    assert(AsOf.foldNearest(tolUs)("k", Iterator.empty, s3).isEmpty)
    assert(s3.isRemoved, "rights-only state must clean itself up")
  }

  test("nearest as-of equals the reference nearest semantics on random histories, plain AND segmented") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 10).foreach { round =>
      val rnd = new scala.util.Random(7000 + round)
      val nl = 1 + rnd.nextInt(20)
      val nr = rnd.nextInt(20)
      val lefts = (0 until nl).map(i =>
        (1L + rnd.nextInt(3), rnd.nextInt(1800).toLong, i.toLong))
      val rights = (0 until nr).map(i =>
        (1L + rnd.nextInt(3), rnd.nextInt(1800).toLong, 1000L + i))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (key, ts)
      val tolSec = (30 + rnd.nextInt(400)).toLong
      val lDf = lefts.toDF("k", "sec", "lid")
        .select(col("k"), col("sec").cast("timestamp").as("ts"), col("lid"))
      val rDf = rights.toDF("k", "rsec", "pay")
        .select(col("k"), col("rsec").cast("timestamp").as("rts"), col("pay"))
      def run(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("lid") ->
          Option(r.getAs[java.lang.Long]("__match")).map(_.longValue)).toMap
      val got = run(AsOf.asOfNearest(lDf, "k", "ts", rDf, "rts", "pay", tolSec * 1000000))
      val seg = run(AsOf.asOfNearestSegmented(lDf, "k", "ts", rDf, "rts", "pay",
        tolSec * 1000000, 300L * 1000000))
      val want = lefts.map { case (k, ls, id) =>
        val cands = rights.filter(_._1 == k).flatMap { case (_, rs, pay) =>
          val gap = math.abs(rs - ls)
          val fwd = if (rs <= ls) 0 else 1
          if (gap <= tolSec) Some(((gap, fwd), pay)) else None
        }
        id -> (if (cands.isEmpty) None
               else Some(cands.minBy(_._1)(Ordering.Tuple2[Long, Int])._2))
      }.toMap
      assert(got == want, s"round $round: plain $got vs reference $want (tol $tolSec)")
      assert(seg == want, s"round $round: segmented $seg vs reference $want (tol $tolSec)")
    }
  }

  test("segmented nearest matches plain nearest, carries crossing buckets BOTH directions") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 5-second buckets force the backward candidate of the t=22 click into
    // an earlier bucket (view at 18) and the forward candidate of the t=27
    // click into a later bucket (view at 33)
    val clicks = Seq(
      (1L, ts(22), 100L), (1L, ts(27), 200L), (2L, ts(40), 300L)
    ).toDF("user_id", "ts", "event_id")
    val views = Seq(
      (1L, ts(18), 11L), (1L, ts(33), 12L), (2L, ts(39), 21L)
    ).toDF("user_id", "vts", "view_id")
    val tol = 10L * 1000000
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("__match")).map(_.longValue),
          Option(r.getAs[java.sql.Timestamp]("__mts")))))
      .toMap
    val plain = res(AsOf.asOfNearest(clicks, "user_id", "ts", views, "vts", "view_id", tol))
    val seg = res(AsOf.asOfNearestSegmented(clicks, "user_id", "ts", views, "vts",
      "view_id", tol, 5L * 1000000))
    assert(seg == plain, s"segmented must equal plain: $seg vs $plain")
    // and the carries really were exercised: 100 matched backward across a
    // bucket boundary, 200 forward across one
    assert(plain(100L)._1 == Some(11L) && plain(200L)._1 == Some(12L), s"$plain")
  }

  test("interpolation as-of: lerp between brackets, one-sided clamps, exact instant, no-bracket null") {
    val spark = TestSpark.spark
    import spark.implicits._
    val clicks = Seq(
      (1L, ts(0), 100L),  // before first view -> clamp forward to 10.0
      (1L, ts(4), 101L),  // 3/4 between t1 (10) and t5 (30) -> 25.0
      (1L, ts(5), 102L),  // exactly at a view -> factor 0 -> 30.0
      (1L, ts(9), 103L),  // after last view -> clamp backward to 30.0
      (2L, ts(5), 104L)   // user with no views -> null
    ).toDF("user_id", "ts", "event_id")
    val views = Seq((1L, ts(1), 10.0), (1L, ts(5), 30.0))
      .toDF("user_id", "vts", "v")
    val got = AsOf.asOfInterpolate(clicks, "user_id", "ts", views, "vts", "v")
      .select(col("event_id"), col("__interp"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(100L -> Some(10.0), 101L -> Some(25.0), 102L -> Some(30.0),
      103L -> Some(30.0), 104L -> None), s"$got")
  }

  test("streaming funnel equals the batch chain per purchase on in-order arrival") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evs = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("ts").isNotNull)
    // batch ground truth: the funnel operator's own chain, per purchase
    val purchases = evs.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = evs.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("vts0"))
      .agg(max(col("event_id")).as("view_id"))
    val signups = evs.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("sts0"))
      .agg(max(col("event_id")).as("signup_id"))
    val st1 = AsOf.asOf(purchases, "user_id", "ts", views, "vts0", "view_id")
      .select(col("user_id"), col("event_id"),
        col("__match").as("view_id"), col("__mts").as("vts"))
    val st2 = AsOf.asOf(st1.filter(col("view_id").isNotNull),
        "user_id", "vts", signups, "sts0", "signup_id")
      .select(col("event_id"), col("__match").as("signup_id"))
    val sigOf = st2.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = st1.collect().map { r =>
      val pid = r.getLong(1)
      val v = if (r.isNullAt(2)) None else Some(r.getLong(2))
      pid -> ((v, if (v.isEmpty) None else sigOf.getOrElse(pid, None)))
    }.toMap
    assert(expected.nonEmpty && expected.values.exists(_._1.nonEmpty),
      "fixture must exercise matched purchases")

    // stream the SAME events in event-time order, chopped in two batches
    val rows = evs.filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._2.getTime, x._4))
    val in = MemoryStream[(Long, Timestamp, String, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp, String, Long)]],
      spark)
    val q = AsOf.funnelStream(
        in.toDF().toDF("user_id", "ts", "event_type", "event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_stream").start()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    in.addData(h1.toIndexedSeq); q.processAllAvailable()
    in.addData(h2.toIndexedSeq); q.processAllAvailable()
    val got = spark.table("funnel_stream").collect().map { r =>
      r.getAs[Long]("purchase_id") -> ((
        Option(r.getAs[java.lang.Long]("view_id")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("signup_id")).map(_.longValue)))
    }.toMap
    q.stop()
    assert(got == expected,
      s"diff=${(got.toSet -- expected.toSet).take(5)} vs ${(expected.toSet -- got.toSet).take(5)}")
  }

  test("streaming funnel no-rewind: an out-of-order purchase older than the stored view emits unmatched") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def st(s: Option[AsOf.FunnelSt]) = TestGroupState.create[AsOf.FunnelSt](
      org.apache.spark.api.java.Optional.ofNullable(s.orNull),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long], hasTimedOut = false)
    // batch 1: signup@1, view@5 (captures signup), state advances
    val s1 = st(None)
    assert(AsOf.foldFunnel(None)("u", Iterator(
      AsOf.FunnelEv("u", 1000000L, 0, 10L),
      AsOf.FunnelEv("u", 5000000L, 1, 20L)), s1).isEmpty)
    // batch 2: a LATE purchase at t=3 (older than the stored view at t=5)
    // must emit unmatched — never matched to its event-time future
    val s2 = st(Some(s1.get))
    val out = AsOf.foldFunnel(None)("u", Iterator(
      AsOf.FunnelEv("u", 3000000L, 2, 30L)), s2).toList
    assert(out == List(AsOf.FunnelRow("u", 30L, None, None)), s"$out")
    // an in-order purchase at t=9 then matches view 20 + signup 10
    val s3 = st(Some(s2.get))
    val out2 = AsOf.foldFunnel(None)("u", Iterator(
      AsOf.FunnelEv("u", 9000000L, 2, 31L)), s3).toList
    assert(out2 == List(AsOf.FunnelRow("u", 31L, Some(20L), Some(10L))), s"$out2")
  }

  test("funnel forget control: the erased user's signup/view can never attribute again; the key leaves the store") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def st(s: Option[AsOf.FunnelSt]) = TestGroupState.create[AsOf.FunnelSt](
      org.apache.spark.api.java.Optional.ofNullable(s.orNull),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long], hasTimedOut = false)
    // build state: signup@1, view@5
    val s1 = st(None)
    AsOf.foldFunnel(None)("u", Iterator(
      AsOf.FunnelEv("u", 1000000L, 0, 10L),
      AsOf.FunnelEv("u", 5000000L, 1, 20L)), s1)
    assert(s1.exists, "state must exist before the forget")
    // forget-only batch: the key is REMOVED, not stored empty
    val s2 = st(Some(s1.get))
    assert(AsOf.foldFunnel(None)("u", Iterator(
      AsOf.FunnelEv("u", 6000000L, 3, 0L)), s2).isEmpty)
    assert(s2.isRemoved, "a forget that ends the batch empty must remove the key")
    // same-batch ordering: purchase@7 AFTER forget@6 emits unmatched;
    // purchase@6 (the forget's own instant, side order 2 < 3) still
    // attributes — erasure is effective from its instant onward
    val s3 = st(Some(s1.get))
    val out = AsOf.foldFunnel(None)("u", Iterator(
      AsOf.FunnelEv("u", 7000000L, 2, 31L),
      AsOf.FunnelEv("u", 6000000L, 3, 0L),
      AsOf.FunnelEv("u", 6000000L, 2, 30L)), s3).toList
    assert(out == List(
      AsOf.FunnelRow("u", 30L, Some(20L), Some(10L)),
      AsOf.FunnelRow("u", 31L, None, None)), s"$out")
    // and NEW events after the forget rebuild from scratch (no ghost)
    val s4 = st(None)
    val out2 = AsOf.foldFunnel(None)("u", Iterator(
      AsOf.FunnelEv("u", 8000000L, 1, 40L),
      AsOf.FunnelEv("u", 9000000L, 2, 41L)), s4).toList
    assert(out2 == List(AsOf.FunnelRow("u", 41L, Some(40L), None)),
      "post-forget events see a fresh fold: view matches, erased signup does not")
  }

  test("funnel horizon: idle users evict when the watermark passes; within-horizon attribution unchanged") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(sec: Long) = new Timestamp(t0 + sec * 1000)
    val in = MemoryStream[(Long, Timestamp, String, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, Timestamp, String, Long)]],
      spark)
    // 10-second event-time horizon
    val q = AsOf.funnelStream(
        in.toDF().toDF("user_id", "ts", "event_type", "event_id"),
        horizonMs = Some(10000L))
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_horizon").start()
    // batch 1: user 1 signs up and views; user 2 views
    in.addData(Seq((1L, at(0), "signup", 10L), (1L, at(1), "view", 11L),
      (2L, at(1), "view", 21L)))
    q.processAllAvailable()
    // batch 2: user 2 stays active far in the future — the watermark
    // advances past user 1's deadline (t=1s + 10s), evicting user 1
    in.addData(Seq((2L, at(100), "view", 22L)))
    q.processAllAvailable()
    // batch 3 (exists only to let the batch-2 watermark move first):
    // user 2 purchases within its horizon — attribution unchanged;
    // user 1 purchases after its idle gap — state was evicted, unmatched
    in.addData(Seq((1L, at(101), "purchase", 12L),
      (2L, at(101), "purchase", 23L)))
    q.processAllAvailable()
    val got = spark.table("funnel_horizon").collect().map { r =>
      r.getAs[Long]("purchase_id") ->
        Option(r.getAs[java.lang.Long]("view_id")).map(_.longValue)
    }.toMap
    q.stop()
    assert(got(23L).contains(22L),
      s"within-horizon purchase must still attribute: $got")
    assert(got(12L).isEmpty,
      s"the idle user's pre-gap view must be gone after eviction: $got")
  }

  test("as-of forget control: the carried payload purges, the key leaves the store, replay is identical") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def st(s: Option[(Long, String)]) = TestGroupState.create[(Long, String)](
      org.apache.spark.api.java.Optional.ofNullable(s.orNull),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long], hasTimedOut = false)
    // carry a right payload
    val s1 = st(None)
    AsOf.foldAsOf(None)("u",
      Iterator(AsOf.StreamEv("u", Some(1000000L), 0, "p1")), s1)
    assert(s1.exists, "state must exist before the forget")
    // one batch: left@2 (matches p1), forget@3, left@4 (must be unmatched)
    val batch = Seq(
      AsOf.StreamEv("u", Some(4000000L), 1, "l2"),
      AsOf.StreamEv("u", Some(3000000L), 2, null),
      AsOf.StreamEv("u", Some(2000000L), 1, "l1"))
    val s2 = st(Some(s1.get))
    val out = AsOf.foldAsOf(None)("u", batch.iterator, s2).toList
    assert(out == List(
      AsOf.StreamMatch("u", Some(2000000L), "l1", Some("p1"), Some(1000000L)),
      AsOf.StreamMatch("u", Some(4000000L), "l2", None, None)), s"$out")
    assert(s2.isRemoved, "a forget that ends the batch empty must remove the key")
    // crash-and-replay: state rolls back with the batch, so redelivering
    // the identical batch must produce the identical output and removal
    val s3 = st(Some(s1.get))
    val out2 = AsOf.foldAsOf(None)("u", batch.iterator, s3).toList
    assert(out2 == out && s3.isRemoved, "replayed forget batch must re-purge identically")
    // a right row AFTER the forget in the same batch rebuilds fresh state
    val s4 = st(Some(s1.get))
    val out3 = AsOf.foldAsOf(None)("u", Iterator(
      AsOf.StreamEv("u", Some(3000000L), 2, null),
      AsOf.StreamEv("u", Some(5000000L), 0, "p2"),
      AsOf.StreamEv("u", Some(6000000L), 1, "l3")), s4).toList
    assert(out3 == List(
      AsOf.StreamMatch("u", Some(6000000L), "l3", Some("p2"), Some(5000000L))),
      s"post-forget right must enrich fresh: $out3")
    assert(s4.get == ((5000000L, "p2")), "rebuilt state must carry only the post-forget right")
  }

  test("as-of horizon: keys idle on both sides evict when the watermark passes; active keys enrich unchanged") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(sec: Long) = new Timestamp(t0 + sec * 1000)
    val rIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val lIn = MemoryStream[(String, Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, Timestamp, String)]], spark)
    val q = AsOf.asOfStream(
        lIn.toDF().toDF("k", "ts", "v"), "k", "ts", "v",
        rIn.toDF().toDF("k", "ts", "p"), "ts", "p",
        horizonMs = Some(10000L))
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_horizon").start()
    try {
      // rights for keys a and b
      rIn.addData(("a", at(0), "pa"), ("b", at(1), "pb")); q.processAllAvailable()
      // key b stays active far in the future — the watermark passes key
      // a's deadline (0s + 10s), evicting it
      rIn.addData(("b", at(100), "pb2")); q.processAllAvailable()
      // probes (a later batch so the batch-2 watermark applies): key a
      // arrives after its idle gap — unenriched, as if new; key b is
      // within its horizon — enriched with its latest right
      lIn.addData(("a", at(101), "la"), ("b", at(101), "lb"))
      q.processAllAvailable()
      val got = spark.table("asof_horizon").collect()
        .map(r => r.getString(2) -> Option(r.getString(3))).toMap
      assert(got("lb").contains("pb2"),
        s"the active key must enrich from its latest right: $got")
      assert(got("la").isEmpty,
        s"the idle key's carried right must be gone after eviction: $got")
    } finally q.stop()
  }
}
