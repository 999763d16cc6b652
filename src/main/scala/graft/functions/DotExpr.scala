package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: in-order dot product of two
  * `array<double>` columns — the kernel under every embedding operator
  * (brute/batch/LSH/IVF kNN, hard negatives, semantic dedup, cosine
  * near-dup pairs).
  *
  * Semantically identical to the declarative form
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, x) => acc + x)`
  * — same left-to-right fold, so results are bit-identical and every
  * DuckDB oracle (`list_inner_product`, also an in-order fold) still
  * matches. The difference is execution: higher-order functions
  * evaluate their lambdas interpreted (one closure call per element,
  * per pair), while this is one tight primitive loop with real
  * `doGenCode` — on the pair fan-out phases that touch every candidate
  * at 100 TB, the interpreted-lambda overhead is the dominant cost.
  *
  * Null contract matches the lambda fold: a null array, length
  * mismatch, or any null element yields null.
  */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects (array<double>, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotExpr.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Double ${ev.value}Box = graft.functions.DotExpr.kernel($a, $b);
         |if (${ev.value}Box == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Box.doubleValue();
         |}
       """.stripMargin
    })
    res
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

object DotExpr {
  /** Static kernel shared by interpreted eval and generated code.
    * Boxed return: null encodes the lambda fold's null propagation
    * (length mismatch or null element).
    */
  def kernel(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column form (Spark 4: Column↔Expression via the sql-package bridge). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: `SELECT graft_dot(a, b) …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotExpr(exprs(0), exprs(1)), "built-in")
}
