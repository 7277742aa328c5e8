package graft.tools
object Count {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.size
    val o = graft.SparkEntry.oracleSql.size
    println(s"queries=$q oracle=$o")
  }
}
