package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 split Column off from Catalyst
  * (sql-api vs classic); the converters live in the sql-private
  * ExpressionUtils, so extension libraries shipping native expressions
  * (graft.functions.DotProduct) expose them via a package-nested object —
  * the standard pattern for Catalyst-extending libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder as a session-scoped SQL function on an EXISTING
    * session (the conf-based `spark.sql.extensions` route only applies at
    * session build; this is the runtime equivalent for sessions the library
    * didn't create).
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
}
