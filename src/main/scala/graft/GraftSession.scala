package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's required settings. Designed for a real
  * cluster (the settings are per-scale knobs, not local hacks); tested on
  * local[N].
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Coalesce toward advisoryPartitionSizeInBytes instead of preserving
      // parallelism-many tiny partitions (the setting Spark's tuning guide
      // recommends for production): post-shuffle tasks then match the data,
      // not the cluster width.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // map upsert semantics for mutate-then-republish (Envelope.scala)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Apply the engine-required runtime confs to an existing session (used by
    * Verify/Bench which build their own session per the driver contract).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.plans.GraftExtensions.register(spark)
    spark
  }

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
