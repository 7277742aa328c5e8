package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  * One parquet file per table; schema documented in FIXTURES.md §B.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** events.parquet has shipped with two physical ts encodings across
    * fixture generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long, floor-truncate to micros exactly like
    * DuckDB: .179575175ns -> .179575, integer `div` because doubles lose
    * precision at epoch-nanos magnitudes) and plain timestamp[us] (arrives
    * as TIMESTAMP_NTZ — cast to session-TZ timestamp; the session is pinned
    * UTC so the instant is unchanged). Detect which by the loaded dtype.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is only consulted during the EAGER schema inference inside
    // spark.read.parquet (verified: materializing ts after restoring the conf
    // succeeds), so scope the session-conf flip to the load instead of
    // leaking it into every later parquet read in the session
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = load(spark, dir, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
