package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single named query: tools/run.sh graft.tools.TimeQuery <name> <sfDir> [runs] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    // same session shape as Bench/Verify (honors SPARK_GRAFT_CPUS) so
    // timings are comparable
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"run $r: ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n rows)")
    }
    spark.stop()
  }
}
