package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer-vector kernels for the micro-unit (`BIGINT`)
  * embedding paths: squared L2 distance and dot product. Same
  * motivation as [[DotExpr]] — the declarative
  * `aggregate(zip_with(...))` forms evaluate their lambdas interpreted
  * per element, and these folds sit in the hottest loops the engine
  * has (k-means: every vector × k centroids × iterations; PQ encode:
  * every vector × 16 codewords × 8 subspaces; int8 candidate scan:
  * every vector). Integer sums are order-independent, so the values
  * are identical to the lambda folds and the SQL oracles by
  * construction. Null contract matches the lambda fold: null array,
  * length mismatch, or null element yields null.
  */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sqdist expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongVecExprs.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Long ${ev.value}Box = graft.functions.LongVecExprs.sqDist($a, $b);
         |if (${ev.value}Box == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Box.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sqdist"
}

case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot_long expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongVecExprs.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |Long ${ev.value}Box = graft.functions.LongVecExprs.dotLong($a, $b);
         |if (${ev.value}Box == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Box.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_long"
}

object LongVecExprs {
  /** Static kernels shared by interpreted eval and generated code. */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def sqDist(a: Column, b: Column): Column =
    GraftBridge.column(SqDistExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def dotLong(a: Column, b: Column): Column =
    GraftBridge.column(DotLongExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
