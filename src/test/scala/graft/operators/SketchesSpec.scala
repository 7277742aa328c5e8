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
}
