/* Bridge into Spark's private[sql] Column <-> Expression conversion.
 * Spark 4 made `Column` a ColumnNode wrapper with no public Expression
 * accessor; libraries that define native Catalyst expressions use a
 * same-package bridge (the established pattern in open-source Spark
 * extension libraries).
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
