package graft.tools
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("p27_gopher_rules", "t25_hash_features", "w11_asof_nearest", "p28_best_canonical")) {
      println(s"===== $n")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
