package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native ordered-pair enumeration over a SORTED `array<bigint>`:
  * emits one `struct<sa, sb>` per index pair (i < j) with a[i] < a[j]
  * — exactly the row-set a self-equi-join with an `a < b` residual
  * would produce per group, including multiplicity under duplicates
  * (equal elements pair with later larger ones but never with each
  * other).
  *
  * Exists because the declarative formulation —
  * `flatten(transform(ss, (x,i) => transform(filter(slice(...)...))))`
  * — evaluates three nested interpreted lambdas and copies a tail
  * slice per element: the graph family's edge-derivation stage spent
  * ~12 s CPU and ~1.5 s GC per execution at sf0.1 in exactly this
  * expression (bench trace, round 12). The kernel builds each pair
  * struct once, no slices, and ships `doGenCode`, so the enclosing
  * projection stays inside whole-stage codegen. Null contract: null
  * array → null; null elements are skipped (cannot occur after
  * `collect_list`, which drops nulls).
  */
case class SortedPairsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("sa", LongType, nullable = false),
      StructField("sb", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sorted_pairs expects array<bigint>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    PairsExpr.sortedPairs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PairsExpr.sortedPairs($a);")

  override protected def withNewChildInternal(newChild: Expression)
      : SortedPairsExpr = copy(child = newChild)
  override def prettyName: String = "graft_sorted_pairs"
}

object PairsExpr {
  /** Static kernel shared by interpreted eval and generated code.
    * Input must be sorted ascending (the caller's `array_sort`); the
    * strict `<` then reduces to skipping equal-element pairs.
    */
  def sortedPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        var j = i + 1
        while (j < n) {
          if (!a.isNullAt(j) && a.getLong(j) > a.getLong(i)) count += 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getLong(i)
        var j = i + 1
        while (j < n) {
          if (!a.isNullAt(j) && a.getLong(j) > x) {
            out(k) = new GenericInternalRow(
              Array[Any](x, a.getLong(j))): InternalRow
            k += 1
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def sortedPairs(a: Column): Column =
    GraftBridge.column(SortedPairsExpr(GraftBridge.expression(a)))
}
