package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A warmup action runs first (not timed) so the first
  * measured query doesn't pay JVM spin-up; queries run in name order for
  * run-to-run comparability.
  *
  * Protocol: each query runs twice and the MINIMUM is reported (declared as
  * "protocol":"min-of-2" in the JSON). At sf0.1 a single cold run is
  * dominated by per-plan Janino compilation + JIT (measured ~2-4s of the
  * slowest queries' time), a fixed cost that amortizes to zero over a real
  * corpus; min-of-N is the standard steady-state throughput protocol.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.entry(spark).count() // warmup: session, codegen, parquet footers

    val runs = 2
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // a fast failure must not masquerade as a fast result: min over
      // SUCCESSFUL runs only; all-failed is reported in "failed", not as
      // a timing
      val good = timed.filter(_._2).map(_._1)
      name -> good.minOption
    }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","protocol":"min-of-$runs","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
