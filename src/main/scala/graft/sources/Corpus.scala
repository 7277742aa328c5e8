package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus file I/O for the training-data pipeline: parquet and JSONL
  * (the interchange staple for text corpora), with write-side controls
  * that matter at 100 TB.
  *
  * Write design:
  *  - `maxRecordsPerFile` bounds output file size without an extra
  *    repartition (the writer rolls files as it streams);
  *  - optional hive partitioning by low-cardinality columns (source,
  *    lang) for downstream partition pruning;
  *  - `sortWithinPartitions` on the primary key gives row-group locality
  *    (parquet min/max pushdown on doc_id ranges) with NO global sort.
  */
object Corpus {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines corpus: one JSON object per line. Schema inference is a
    * full extra pass — pass a DDL schema at scale.
    */
  def readJsonl(spark: SparkSession, path: String, ddl: Option[String] = None): DataFrame = {
    val r = spark.read
    ddl.fold(r)(s => r.schema(s)).json(path)
  }

  def writeJsonl(df: DataFrame, path: String, maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite").json(path)

  def writeParquet(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      sortCol: Option[String] = None,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val sorted = sortCol.fold(df)(c => df.sortWithinPartitions(c))
    val w = sorted.write.option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }
}
