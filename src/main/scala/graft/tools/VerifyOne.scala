package graft.tools

import java.nio.file.{Files, Paths}

/** Dump ONE named query + its oracle for tools/compare.py — the local
  * fast loop while iterating on a single operator:
  *   tools/run.sh graft.tools.VerifyOne q1_agg[,q2_topk,...] <sfDir> <outDir>
  *   python3 tools/compare.py <sfDir> <outDir>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: VerifyOne <query1[,query2,...]> [sfDir] [outDir]")
      sys.exit(1)
    }
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"known: ${graft.SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val out = if (args.length > 2) args(2) else "/tmp/verify_one"
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
