package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(Expression)` constructor; the
  * supported bridge lives in `classic.ExpressionUtils`, visible only
  * inside the `org.apache.spark.sql` namespace — hence this one-file
  * shim package. Lets graft expose custom Catalyst expressions as
  * Columns without registry round-trips.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
