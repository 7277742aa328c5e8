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

  test("embedding store bucketed by trained cell: the SemDeDup/IVF verify self-join plans shuffle-free") {
    // the claim the SemDeDup/IVF docs make — "at 100 TB the cluster id is
    // the bucket key of the embedding store and each cluster's pair block
    // is one co-located task" — made executable: train the cells, bucket
    // the store by them, and the within-cell pair join needs NO exchange
    val spark = TestSpark.spark
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (_, assigned) = Similarity.kmeansModel(emb, 4, 2)
    spark.sql("DROP TABLE IF EXISTS emb_bkt")
    emb.join(assigned, "vec_id")
      .write.mode("overwrite").bucketBy(8, "c").sortBy("c")
      .saveAsTable("emb_bkt")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = spark.table("emb_bkt")
      val a = e.select(col("c"), col("vec_id").as("ia"), col("embedding").as("va"))
      val b = e.select(col("c"), col("vec_id").as("ib"), col("embedding").as("vb"))
      val pairs = a.join(b, "c").filter(col("ia") < col("ib"))
        .select(graft.functions.VectorExprs.dot(
          org.apache.spark.sql.functions.transform(col("va"), x => x.cast("double")),
          org.apache.spark.sql.functions.transform(col("vb"), x => x.cast("double"))).as("d"))
      assert(pairs.count() > 0)
      val plan = pairs.queryExecution.executedPlan.toString
      val joinSection = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"),
        s"expected the co-bucketed self-join in:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"the within-cell verify must read co-located buckets, not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS emb_bkt")
    }
  }
}
