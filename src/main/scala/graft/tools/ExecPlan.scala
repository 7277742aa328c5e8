package graft.tools
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    spark.stop()
  }
}
