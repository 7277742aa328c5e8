package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One-column DataFrame of JSON message strings. */
  def messages(msgs: String*): DataFrame = {
    val s = spark
    import s.implicits._
    msgs.toDF("value")
  }
}
