package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions.{DotProduct, OptimizerFence}

/** Catalyst extension point: registers graft's native expressions as SQL
  * functions, so `spark.sql("SELECT dot_product(a, b) ...")` works on any
  * cluster with `spark.sql.extensions=graft.plans.GraftExtensions` — the
  * standard deployment route for a Catalyst-extending library. For sessions
  * the library did not create, [[GraftExtensions.register]] is the runtime
  * equivalent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        (args: Seq[Expression]) => builder(args)))
    }
}

object GraftExtensions {

  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name,
          "expectedNum" -> n.toString, "actualNum" -> args.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
      b(args)
    }

  /** (name, usage, builder) for every SQL-exposed native expression. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", "dot_product(array<double>, array<double>) - codegen'd dot product",
      arity("dot_product", 2)(args => DotProduct(args(0), args(1)))),
    ("fence", "fence(expr) - identity marked non-deterministic: pins the enclosing projection against collapse/pushdown",
      arity("fence", 1)(args => OptimizerFence(args.head))))

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      Bridge.registerTempFunction(spark, name, builder)
    }
}
