package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column ↔ catalyst-Expression conversion package-
  * private (`classic.ExpressionUtils`); this bridge re-exports the two
  * functions for graft's native expressions. No Spark internals are
  * reimplemented here.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
