package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale-path operators: salted aggregation equivalence; the windowed-agg
  * expression layer running under real Structured Streaming with a
  * watermark (same expressions as the batch w1 query — SURVEY's
  * "same expression layer both ways" claim, exercised).
  */
class ScaleOpsSpec extends AnyFunSuite {

  test("salted aggregation equals direct aggregation exactly on counts, ~ on sums") {
    val spark = TestSpark.spark
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val direct = events.groupBy(col("event_type").as("k"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(events, col("event_type"), col("value"), salt = 8)
    val j = direct.as("d").join(salted.as("s"), col("d.k") === col("s.k")).collect()
    assert(j.length == direct.count())
    j.foreach { r =>
      assert(r.getLong(2) == r.getLong(5)) // counts exact
      val (a, b) = (r.getDouble(1), r.getDouble(4))
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(a))) // fp order differs
    }
  }

  test("tumbling window agg runs under streaming with watermark, append mode") {
    val spark = TestSpark.spark
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)](
      implicitly[org.apache.spark.sql.Encoder[(java.sql.Timestamp, String, Double)]], spark)
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("stream_win").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((ts(1, 5), "click", 1.0), (ts(1, 20), "click", 2.0), (ts(1, 30), "view", 3.0))
    q.processAllAvailable()
    // advance watermark past hour-1 close (01:59:59 + 10min)
    input.addData((ts(3, 0), "click", 9.0))
    q.processAllAvailable()
    val rows = spark.table("stream_win")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("total"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 01:00:00", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 01:00:00", "view", 1L, 3.0)))
  }
}
