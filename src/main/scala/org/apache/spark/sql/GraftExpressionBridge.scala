package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column factories.
  *
  * Spark 4 removed the public `new Column(expr: Expression)`
  * constructor (Column now wraps a connect-compatible ColumnNode), so a
  * library registering custom Catalyst expressions needs this one-line
  * shim living inside the `org.apache.spark.sql` package. Only public
  * Spark classes are touched; nothing here depends on internals beyond
  * `classic.ExpressionUtils` (the same helper Spark's own
  * `functions.scala` uses).
  */
object GraftExpressionBridge {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a custom expression as a session SQL function, so the
    * EP2 surface (`spark.sql`) sees the same operators the Dataset API
    * does — e.g. `SELECT float_dot(a, b) FROM t`. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
