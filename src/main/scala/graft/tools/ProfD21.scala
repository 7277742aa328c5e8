package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-volume profiler for the d21/d22 prefix-join family. */
object ProfD21 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark,
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.1")
    val sh = graft.operators.Dedup.hashedShingles(docs).localCheckpoint(true)
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"$n: ${(System.nanoTime - t0) / 1e9}%.2f s -> $r"); r
    }
    t("sh")(sh.count())
    val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfreq, "g")
    val cnt = ranked.groupBy(col("doc_id")).agg(count(lit(1)).as("m"))
    val prefix = ranked.join(cnt, "doc_id")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .filter(col("pos") <= col("m") - ceil(lit(0.5) * col("m")) + 1)
      .select(col("doc_id"), col("g")).cache()
    t("prefix")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .distinct().cache()
    t("cand")(cand.count())
    val inter = cand
      .join(sh.select(col("doc_id").as("ia"), col("g")), "ia")
      .join(sh.select(col("doc_id").as("ib"), col("g")), Seq("ib", "g"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("inter"))
    t("inter")(inter.count())
    spark.stop()
  }
}
