package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ↔ Expression converters (the
  * Spark 4 Column API wraps ColumnNode rather than Expression).
  * Lives under the spark.sql package solely to see the private[sql]
  * symbols; keep every other graft source outside it.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
