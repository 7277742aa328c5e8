package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the optimized + executed plan and codegen status for the river
  * status projection (throwaway analysis tool).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)

    val json = to_json(struct(
      md5(col("event_id").cast("string")).as("@id"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("@opprettet"),
      col("event_type").as("@event_name"),
      lit(0).as("system_read_count"),
      col("event_id")))

    import graft.messages.{River, Validation}
    val river5 = River().validate(
      Validation.requireKey("@id"), Validation.requireKey("@opprettet"),
      Validation.requireKey("@event_name"), Validation.requireKey("system_read_count"),
      Validation.requireKey("event_id"))
    val q = river5.attach(ev, json).all.select(col("status"))
      .filter(length(col("status")) > 0)

    println("===== OPTIMIZED =====")
    println(q.queryExecution.optimizedPlan.treeString)
    println("===== EXECUTED =====")
    println(q.queryExecution.executedPlan.treeString)
    q.count()
    spark.stop()
  }
}
