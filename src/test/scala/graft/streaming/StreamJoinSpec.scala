package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.RangeJoin

/** Stream-stream interval join: both sides unbounded, state bounded by the
  * watermark + two-sided time condition. The streamed pair set must equal
  * the batch banded range join's on the same events.
  */
class StreamJoinSpec extends AnyFunSuite {

  private def events(rows: (Long, String, String, Long)*): DataFrame = {
    val s = TestSpark.spark
    import s.implicits._
    rows.toDF("event_id", "ts_s", "event_type", "user_id")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("user_id"), lit(0.0).as("value"),
        lit("{}").as("props"))
  }

  test("stream-stream interval join equals the batch banded range join across micro-batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // user 1: purchase inside the 6h window, one outside, one BEFORE the
    // signup; user 2: two signups sharing one purchase (both pair); user 3:
    // purchase only (no signup — never emits)
    val rows = Seq(
      (1L, "2024-01-01 08:00:00", "signup", 1L),
      (2L, "2024-01-01 09:30:00", "purchase", 1L),   // +1.5h: pairs
      (3L, "2024-01-01 15:00:00", "purchase", 1L),   // +7h: outside window
      (4L, "2024-01-01 07:00:00", "purchase", 1L),   // before signup: no pair
      (5L, "2024-01-01 10:00:00", "signup", 2L),
      (6L, "2024-01-01 11:00:00", "signup", 2L),
      (7L, "2024-01-01 12:30:00", "purchase", 2L),   // pairs with BOTH signups
      (8L, "2024-01-01 12:00:00", "purchase", 3L))
    val batch = RangeJoin.signupPurchases(events(rows: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch == Set((1L, 2L, 1L, 5400000000L),
      (5L, 7L, 2L, 9000000000L), (6L, 7L, 2L, 5400000000L)),
      s"batch fixture shape moved: $batch")

    val sIn = MemoryStream[(Long, String, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, Long)]], spark)
    val pIn = MemoryStream[(Long, String, Long)](
      implicitly[org.apache.spark.sql.Encoder[(Long, String, Long)]], spark)
    def shape(df: DataFrame): DataFrame = df
      .toDF("event_id", "ts_s", "user_id")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("user_id"))
    val q = RangeJoin.signupPurchasesStream(shape(sIn.toDF()), shape(pIn.toDF()))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_stream").start()
    try {
      val sg = rows.filter(_._3 == "signup").map(r => (r._1, r._2, r._4))
      val pu = rows.filter(_._3 == "purchase").map(r => (r._1, r._2, r._4))
      // purchases arrive over TWO batches, signups over two — pairs must
      // form across batch boundaries in both directions
      sIn.addData(sg.take(1): _*); pIn.addData(pu.take(2): _*)
      q.processAllAvailable()
      sIn.addData(sg.drop(1): _*); pIn.addData(pu.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("ssj_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == batch, s"stream=$got\nbatch=$batch")
    } finally q.stop()
  }
}
