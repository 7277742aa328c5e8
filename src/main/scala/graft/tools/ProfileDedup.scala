package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of d2_ngram_jaccard (throwaway analysis tool). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, dir).cache()
    println(s"docs: ${docs.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label ($n rows)")
    }

    import graft.operators.Dedup
    time("tokens only")(docs.select(explode(graft.functions.Portable.tokens(col("text"))).as("w")).count())
    time("shingles (incl distinct+rare)")(Dedup.shingles(docs).count())
    val sh = Dedup.shingles(docs).cache()
    time("shingles cached")(sh.count())
    time("self-join pairs")(
      sh.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))).count())
    time("full d2")(Dedup.jaccardPairs(docs).count())
    time("full d2 again")(Dedup.jaccardPairs(docs).count())
    spark.stop()
  }
}
