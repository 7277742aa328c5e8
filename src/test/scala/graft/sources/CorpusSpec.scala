package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus I/O round-trips on the real fixtures. */
class CorpusSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("documents round-trip through JSONL byte-faithfully") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    Corpus.writeJsonl(docs, out)
    val back = Corpus.readJsonl(spark, out,
      Some("doc_id bigint, text string, lang string, source string, n_chars bigint"))
    assert(back.count() == docs.count())
    val a = docs.orderBy(col("doc_id")).collect().map(_.toString)
    val b = back.select(docs.columns.map(col): _*)
      .orderBy(col("doc_id")).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("partitioned sized parquet write: partition dirs exist, files bounded") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("graft-part-out").toString
    Corpus.writeParquet(docs, out, partitionCols = Seq("lang"),
      sortCol = Some("doc_id"), maxRecordsPerFile = 50)
    val langDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
    val back = Corpus.readParquet(spark, out)
    assert(back.count() == docs.count())
    // maxRecordsPerFile=50 forces multiple files for any 100+-doc partition
    val biggest = back.groupBy(col("lang")).count().agg(max("count")).first().getLong(0)
    if (biggest > 50) {
      val files = langDirs.flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
      assert(files > langDirs.length, "expected rolled files under maxRecordsPerFile")
    }
  }
}
