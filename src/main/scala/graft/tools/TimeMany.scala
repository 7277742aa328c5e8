package graft.tools

/** Time several named queries in ONE JVM (throwaway analysis tool — the
  * TimeQuery loop without the per-query JVM spin-up):
  *   tools/run.sh graft.tools.TimeMany q1,q2,... [sfDir] [runs]
  * Per query: run 1 warms (codegen + memoized artifacts, excluded),
  * reported = min of the remaining runs.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    // Bench's protocol in miniature: one untimed warm pass over the whole
    // list (codegen + JIT + memoized artifacts), then `runs` timed passes
    // INTERLEAVED round-robin so a noisy window lands on one sample of
    // each query, not every sample of one query.
    names.foreach(n => graft.SparkEntry.queries(n)(spark, dir).count())
    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to runs; n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
    }
    // true median: mean of the two middle samples for even n (the upper-
    // middle pick biased the med column used in A/B comparisons)
    def med(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    names.foreach { n =>
      val ts = samples(n)
      println(f"$n%-26s min=${ts.min}%6.2f med=${med(ts)}%6.2f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
