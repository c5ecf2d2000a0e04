package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Expression converters, the
  * supported Spark-4 path for wrapping a custom Catalyst `Expression` as a
  * user-facing `Column` (the pre-4.0 `new Column(expr)` constructor is
  * gone). Lives in the `org.apache.spark.sql` package solely to satisfy
  * the access qualifier; contains no logic. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4, so an expression
    * outside this package can't write the `ExpectsInputTypes.inputTypes`
    * signature; this public alias re-exports it. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
