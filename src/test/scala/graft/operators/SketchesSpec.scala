package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KMV sketch family: the streaming daily estimator must equal its batch
  * twin across micro-batch boundaries, stay bounded at k state entries no
  * matter the arrival count, and be redelivery-proof by set idempotence.
  * (q28/w24 arithmetic is oracle-gated; this spec owns the streaming leg.)
  */
class SketchesSpec extends AnyFunSuite {

  private def events(rows: (Long, String, Long)*): DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    rows.toDF("event_id", "ts_s", "user_id")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), lit("x").as("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"))
  }

  // 200 distinct users on day 1 (> k=64, estimator active), 10 on day 2
  // (sketch IS the set, estimate exact), with repeat arrivals sprinkled in
  private val fixture: Seq[(Long, String, Long)] =
    (0 until 200).map(i => (i.toLong, "2024-03-01 10:00:00", 1000L + i)) ++
    (0 until 50).map(i => (300L + i, "2024-03-01 11:00:00", 1000L + i * 4)) ++ // repeats
    (0 until 10).map(i => (400L + i, "2024-03-02 09:00:00", 2000L + i))

  test("streaming daily KMV equals batch across micro-batches; state bounded at k") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val batch = Sketches.dailyKmv(events(fixture: _*)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val day1 = batch.find(_._1 == "2024-03-01").get
    val day2 = batch.find(_._1 == "2024-03-02").get
    assert(day1._2 == Sketches.KmvK.toLong, s"day1 must saturate the sketch: $day1")
    assert(day2 == (("2024-03-02", 10L, 10L)), s"under-k day must be exact: $day2")

    val in = MemoryStream[(Long, String, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, Long)]], spark)
    val streamed = Sketches.kmvDauStream(
      in.toDF().toDF("event_id", "ts_s", "user_id")
        .select(to_timestamp(col("ts_s")).as("ts"), col("user_id")))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("kmv_stream").start()
    try {
      // split so day 1 accumulates ACROSS batches
      in.addData(fixture.take(120): _*); q.processAllAvailable()
      in.addData(fixture.drop(120): _*); q.processAllAvailable()
      def lastPerDay(): Map[String, (Long, Long)] = spark.table("kmv_stream")
        .withColumn("seq", monotonically_increasing_id())
        .collect()
        .sortBy(_.getLong(3))
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val got = lastPerDay()
      assert(got == batch.map(b => b._1 -> ((b._2, b._3))).toMap,
        s"stream=$got\nbatch=$batch")
      assert(got.values.forall(_._1 <= Sketches.KmvK.toLong),
        s"state exceeded k: $got")

      // at-least-once redelivery: re-deliver the whole corpus — set
      // idempotence means no estimate may move
      in.addData(fixture: _*); q.processAllAvailable()
      assert(lastPerDay() == got, "redelivery changed an estimate")
    } finally q.stop()
  }

  test("streaming heavy hitters: exact under capacity; SpaceSaving bounds hold over it") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // one skewed day: items 1/2/3 heavy (50/30/20), 37 distinct singletons
    // interleaved — domain 40 > the 16-counter capacity
    val heavy = Seq.fill(50)(1) ++ Seq.fill(30)(2) ++ Seq.fill(20)(3)
    val cold = (100 until 137).toSeq
    // deterministic interleave: round-robin heavy/cold so evictions happen
    // mid-stream, not only at the tail
    val items = (heavy.grouped(3).toSeq.zipAll(cold.grouped(1).toSeq, Nil, Nil)
      .flatMap { case (h, c) => h ++ c })
    val rows = items.zipWithIndex.map { case (it, i) =>
      (i.toLong, "2024-04-01 10:00:00", s"""{"k": $it}""")
    }
    val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong

    val in = MemoryStream[(Long, String, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, String)]], spark)
    val streamed = Sketches.heavyHittersStream(
      in.toDF().toDF("event_id", "ts_s", "props")
        .select(to_timestamp(col("ts_s")).as("ts"), col("props")))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("ss_stream").start()
    try {
      in.addData(rows.take(60): _*); q.processAllAvailable()
      in.addData(rows.drop(60): _*); q.processAllAvailable()
      // final emission per (day, item) = the last micro-batch's summary
      val finalRows = spark.table("ss_stream")
        .withColumn("seq", monotonically_increasing_id())
        .collect().sortBy(_.getLong(5))
        .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap // later emissions overwrite earlier ones
      val tracked = finalRows.filter(_._2._3 == n) // rows from the final state
      assert(tracked.nonEmpty && tracked.size <= Sketches.SsCounters,
        s"summary must stay within capacity: ${tracked.size}")
      // SpaceSaving guarantees, deterministic: est−err ≤ true ≤ est,
      // err ≤ n/C, and every item with true > n/C is tracked
      tracked.foreach { case (item, (est, err, _)) =>
        val t = trueCounts.getOrElse(item, 0L)
        assert(est - err <= t && t <= est, s"bound broke for $item: est=$est err=$err true=$t")
        assert(err <= n / Sketches.SsCounters, s"err too big for $item: $err")
      }
      Seq(1, 2, 3).foreach { hh =>
        assert(tracked.contains(hh), s"heavy item $hh missing (true=${trueCounts(hh)})")
        assert(tracked(hh)._1 - tracked(hh)._2 <= trueCounts(hh))
      }
    } finally q.stop()

    // under-capacity domain: the summary IS the exact count table
    val small = (0 until 30).map(i => (i.toLong, "2024-04-02 09:00:00",
      s"""{"k": ${i % 5}}"""))
    val in2 = MemoryStream[(Long, String, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, String)]], spark)
    val q2 = Sketches.heavyHittersStream(
      in2.toDF().toDF("event_id", "ts_s", "props")
        .select(to_timestamp(col("ts_s")).as("ts"), col("props")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_stream2").start()
    try {
      in2.addData(small: _*); q2.processAllAvailable()
      val got = spark.table("ss_stream2").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == (0 until 5).map(i => (i, 6L, 0L)).toSet, s"exact path diverged: $got")
    } finally q2.stop()
  }

  test("KMV forget: the erased user's hash physically leaves the sketch; the day re-estimates; replay idempotent") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // an under-k day: the sketch IS the distinct set, so the estimate
    // must drop exactly by one on the forget
    val adds = (0 until 10).map(i =>
      (i.toLong, "2024-03-05 09:00:00", 5000L + i, "add"))
    val in = MemoryStream[(Long, String, Long, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, Long, String)]],
      spark)
    val q = Sketches.kmvDauStream(
        in.toDF().toDF("event_id", "ts_s", "user_id", "op")
          .select(to_timestamp(col("ts_s")).as("ts"), col("user_id"), col("op")))
      .writeStream.outputMode("append")
      .format("memory").queryName("kmv_forget").start()
    def last(): (Long, Long) = spark.table("kmv_forget")
      .withColumn("seq", monotonically_increasing_id())
      .collect().sortBy(_.getLong(3)).last match {
        case r => (r.getLong(1), r.getLong(2))
      }
    try {
      in.addData(adds: _*); q.processAllAvailable()
      assert(last() == ((10L, 10L)), s"pre-forget snapshot: ${last()}")
      // erase user 5005: same hash expression, removal from the k-min set
      in.addData((99L, "2024-03-05 10:00:00", 5005L, "forget"))
      q.processAllAvailable()
      assert(last() == ((9L, 9L)),
        s"the erased user's hash must leave the sketch: ${last()}")
      // at-least-once replay of the forget: removal is idempotent
      in.addData((99L, "2024-03-05 10:00:00", 5005L, "forget"))
      q.processAllAvailable()
      assert(last() == ((9L, 9L)), s"replayed forget must be a no-op: ${last()}")
      // the user returns later: a fresh add re-enters the sketch
      in.addData((100L, "2024-03-05 11:00:00", 5005L, "add"))
      q.processAllAvailable()
      assert(last() == ((10L, 10L)), s"re-added user must count again: ${last()}")
    } finally q.stop()
  }

  test("KMV horizon: a closed day physically evicts from the checkpoint; the open day survives") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kmvh-ckpt").toString
    val in = MemoryStream[(Long, String, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, Long)]], spark)
    // 1-hour horizon: a day with no arrivals for an hour of event time
    // is final and evicts
    val q = Sketches.kmvDauStream(
        in.toDF().toDF("event_id", "ts_s", "user_id")
          .select(to_timestamp(col("ts_s")).as("ts"), col("user_id")),
        horizonMs = Some(3600L * 1000))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("kmv_horizon").start()
    try {
      in.addData((1L, "2024-03-05 09:00:00", 1L), (2L, "2024-03-05 09:10:00", 2L))
      q.processAllAvailable()
      // day 2 arrivals push the watermark past day 1's deadline
      in.addData((3L, "2024-03-06 12:00:00", 3L)); q.processAllAvailable()
      in.addData((4L, "2024-03-06 12:10:00", 4L)); q.processAllAvailable()
    } finally q.stop()
    val keys = graft.streaming.StateAudit.stateTable(spark, ckpt)
      .select(col("key").getField("value")).collect()
      .map(_.getString(0)).toSet
    assert(keys == Set("2024-03-06"),
      s"the closed day must be physically evicted: $keys")
  }

  test("heavy-hitter forget: the item's counter is erased (others' bounds untouched); a re-add starts fresh") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // under-capacity exact path: items 0..4, six arrivals each
    val adds = (0 until 30).map(i =>
      (i.toLong, "2024-04-03 09:00:00", s"""{"k": ${i % 5}}""", "add"))
    val in = MemoryStream[(Long, String, String, String)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, String, String)]],
      spark)
    val q = Sketches.heavyHittersStream(
        in.toDF().toDF("event_id", "ts_s", "props", "op")
          .select(to_timestamp(col("ts_s")).as("ts"), col("props"), col("op")))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_forget").start()
    def lastByItem(): Map[Int, (Long, Long, Long)] = spark.table("ss_forget")
      .withColumn("seq", monotonically_increasing_id())
      .collect().sortBy(_.getLong(5))
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    try {
      in.addData(adds: _*); q.processAllAvailable()
      assert(lastByItem() == (0 until 5).map(i => i -> ((6L, 0L, 30L))).toMap,
        s"exact pre-forget table: ${lastByItem()}")
      // erase item 2: its counter goes; survivors re-emit unchanged
      // (n_seen is the day's arrival total — an aggregate, it stands)
      in.addData((99L, "2024-04-03 10:00:00", """{"k": 2}""", "forget"))
      q.processAllAvailable()
      val after = lastByItem()
      assert(!spark.table("ss_forget")
        .withColumn("seq", monotonically_increasing_id())
        .collect().sortBy(_.getLong(5)).reverse.take(4).exists(_.getInt(1) == 2),
        s"the erased item must not be in the post-forget emission")
      (Seq(0, 1, 3, 4)).foreach(i => assert(after(i) == ((6L, 0L, 30L)),
        s"survivor $i must be untouched: $after"))
      // a re-added item starts from a FRESH counter, not the erased one
      in.addData((100L, "2024-04-03 11:00:00", """{"k": 2}""", "add"))
      q.processAllAvailable()
      assert(lastByItem()(2) == ((1L, 0L, 31L)),
        s"re-added item must start fresh: ${lastByItem()(2)}")
    } finally q.stop()
  }
}
