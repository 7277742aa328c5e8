package graft.tools

/** Dump the formatted physical plan of one or more named queries — the
  * plan-audit loop run after every new operator lands:
  *   tools/run.sh graft.tools.ExplainNew q1_agg[,w11_asof_nearest,...] [sfDir]
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("p27_gopher_rules", "t25_hash_features", "w11_asof_nearest",
        "p28_best_canonical")
    val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
