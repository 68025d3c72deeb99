package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge for graft's custom expressions.
  *
  * Spark 4 made the converters (`classic.ExpressionUtils`) `private[sql]`;
  * the supported way for a library to register custom Catalyst nodes from
  * the public Column API is a shim in the `org.apache.spark.sql` package —
  * the same approach third-party Spark extensions use.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Runtime function registration into an existing session (the
    * build-time path is `SparkSessionExtensions.injectFunction`). */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
