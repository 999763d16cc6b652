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

  /** Build a DataFrame from a hand-constructed logical plan (the
    * entry point for graft's custom plan nodes, e.g. AsofJoinNode).
    */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** The public extra-strategies hook, typed through the classic
    * session (Spark 4 moved `experimental` off the API interface).
    */
  def experimentalMethods(s: SparkSession): ExperimentalMethods =
    s.asInstanceOf[classic.SparkSession].experimental
}
