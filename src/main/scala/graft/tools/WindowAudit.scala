package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints every unpartitioned logical Window in the named queries' plans
  * with its order spec and the plan line directly beneath it — the
  * evidence a WindowLintSpec allowlist entry cites. Usage:
  * WindowAudit q1,q2,... [sfDir]
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("window-audit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      println(s"=== $n: ${wins.size} unpartitioned window(s)")
      wins.foreach { w =>
        println(s"  exprs: ${w.windowExpressions.map(_.sql).mkString("; ")}")
        println(s"  order: ${w.orderSpec.map(_.sql).mkString(", ")}")
        println(s"  child: ${w.child.getClass.getSimpleName} -> " +
          w.child.toString.linesIterator.take(2).mkString(" | "))
      }
    }
    spark.stop()
  }
}
