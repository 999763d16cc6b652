package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 16-permutation MinHash signature of
  * a token array in ONE row-local pass — md5 per distinct token, 16
  * xor-mixed minima (identical arithmetic to the explode+groupBy
  * formulation in ops.Dedup and its SQL oracle: the token hash is the
  * first 15 hex chars of the md5, i.e. the big-endian first 8 bytes
  * shifted right a nibble).
  *
  * Why it exists: the declarative formulation explodes every distinct
  * word and shuffles (doc_id, word-hash) pairs to a 16-min aggregate —
  * at 100 TB that shuffle moves the entire tokenized corpus. As a
  * narrow map the signature costs one scan, nothing moves, and LSH
  * banding consumes it directly — the same shuffle-elimination
  * SimHashExpr buys, on the operator that feeds the main dedup path.
  *
  * Ships real `doGenCode`; null tokens are skipped (the exploded
  * form's aggregate ignores the null hash they produce).
  */
case class MinHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashExpr.kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashExpr.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashExpr = copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

object MinHashExpr {
  /** Golden-ratio odd multiples, masked positive — the single source
    * of truth for the MinHash permutation seeds (ops.Dedup and the SQL
    * oracles reference these values).
    */
  val seeds: Array[Long] =
    (0 until 16).map(i => (0x9E3779B97F4A7C15L * (2 * i + 1)) & Long.MaxValue)
      .toArray

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[String](n * 2)
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    val mdd = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (seen.add(w)) { // distinct tokens (matches array_distinct)
          val d = mdd.digest(w.getBytes("UTF-8"))
          // first 15 hex chars == big-endian first 8 bytes >>> 4
          var be = 0L
          var k = 0
          while (k < 8) { be = (be << 8) | (d(k) & 0xffL); k += 1 }
          val h = be >>> 4
          var j = 0
          while (j < seeds.length) {
            val v = h ^ seeds(j)
            if (v < mins(j)) mins(j) = v
            j += 1
          }
          mdd.reset()
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column form (Spark 4: Column↔Expression via the sql-package bridge). */
  def minhash(c: Column): Column =
    GraftBridge.column(MinHashExpr(GraftBridge.expression(c)))

  /** SQL registration: `SELECT graft_minhash(split(text, ' ')) …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashExpr(exprs.head), "built-in")
}
