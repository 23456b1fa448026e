package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression conversions (Spark 4
  * moved Column to a connect-agnostic representation). Lives inside the
  * org.apache.spark.sql package hierarchy purely to satisfy the access
  * modifier; no Spark internals are modified. */
object ColumnGlue {
  def col(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Function registry of a live session (for registering the engine's SQL
    * functions on sessions built without GraftExtensions). */
  def functionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.sessionState.functionRegistry
}
