package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A warmup action runs first (not timed) so the first
  * measured query doesn't pay JVM spin-up; queries run in name order for
  * run-to-run comparability.
  *
  * Protocol: each query runs once UNTIMED (per-plan Janino compilation +
  * JIT, measured ~2-4s cold vs ~0.6s warm on the slowest queries — a fixed
  * cost that amortizes to zero over a real corpus), then SPARK_GRAFT_RUNS
  * timed runs (default 3); "queries" carries the MINIMUM (steady-state
  * throughput), "queries_median" the MEDIAN, and "noisy" lists queries whose
  * max/min spread exceeds 3x — this machine has co-tenants (observed 1.7x
  * cross-round variance), and recording both stops one noisy run from
  * masquerading as a regression or a win.
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

    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // one discarded warm-up per query: the FIRST execution of a plan pays
      // Janino codegen + JIT (~5s vs ~0.6s warm on the m-suite) — a fixed
      // per-plan cost that amortizes to zero over a real corpus and would
      // otherwise pollute even a min-of-N when every run lands cold
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // a fast failure must not masquerade as a fast result: stats over
      // SUCCESSFUL runs only; all-failed is reported in "failed", not as
      // a timing
      val good = timed.filter(_._2).map(_._1).sorted
      name -> good
    }
    def median(xs: Seq[Double]): Double = // xs sorted, nonempty
      if (xs.size % 2 == 1) xs(xs.size / 2)
      else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2
    val ok = results.collect { case (k, v) if v.nonEmpty => (k, v) }
    val failed = results.collect { case (k, v) if v.isEmpty => k }
    def obj(f: Seq[Double] => Double) = ok
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val noisy = ok.collect { case (k, v) if v.last > 3 * v.head => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val noisyJson = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2.head).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","protocol":"warm+min-of-$runs","queries":${obj(_.head)},"queries_median":${obj(median)},"noisy":$noisyJson,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
