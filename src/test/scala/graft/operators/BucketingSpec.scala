package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing: pre-partitioned co-located joins — the storage-layout half of
  * the 100 TB join strategy (broadcast covers small dims; bucketing covers
  * fact-fact joins on a shared key). The test proves the property that
  * matters: a join between two tables bucketed on the join key plans with
  * NO shuffle exchange.
  */
class BucketingSpec extends AnyFunSuite {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    graft.Tables.orders(spark, dir)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    graft.Tables.lineitem(spark, dir)
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself reads bucketed layout: no ShuffleExchange below it
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") || plan.contains("SortMergeJoin"),
        s"expected sort-merge join of bucketed tables in:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join should not shuffle, but plan was:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
