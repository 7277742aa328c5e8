package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SQL exposure of the native expressions via the extension point. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("dot_product and fence are callable from SQL after register") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d,
        |       fence(1 + 1) AS f""".stripMargin).first()
    assert(r.getDouble(0) == 32.0)
    assert(r.getInt(1) == 2)
  }

  test("fence blocks filter pushdown through its projection in SQL too") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    spark.range(10).createOrReplaceTempView("ext_n")
    val q = spark.sql(
      "SELECT * FROM (SELECT id, fence(id * 2) AS v FROM ext_n) WHERE v > 5")
    assert(q.collect().map(_.getLong(0)).toSet == Set(3L, 4L, 5L, 6L, 7L, 8L, 9L))
    // the filter must sit ABOVE the projection, reading the computed column
    val optimized = q.queryExecution.optimizedPlan.treeString
    assert(optimized.indexOf("Filter") < optimized.indexOf("fence"),
      s"expected Filter above the fenced Project in:\n$optimized")
  }

  test("conf-based extension class applies cleanly") {
    new GraftExtensions().apply(new SparkSessionExtensions) // must not throw
  }
}
