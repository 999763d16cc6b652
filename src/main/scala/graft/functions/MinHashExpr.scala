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

  /** One MD5 instance per thread: `getInstance` does a provider lookup
    * and allocates per call, and the kernel ran it once per ROW — with
    * the digest buffer reused via `digest(out, 0, 16)` the whole token
    * loop is now allocation-free except the token's UTF-8 byte copy.
    * (r19 trace: the LSH family spent ~40 % of its CPU in GC; this
    * kernel was the allocator.)
    */
  private val localMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel shared by interpreted eval and generated code.
    *
    * Duplicate tokens are hashed rather than deduped: min is
    * idempotent, so a repeated token changes nothing — the old
    * per-row HashSet[String] (plus a String decode per token) existed
    * only to SAVE the duplicate's md5, and cost more in allocation/GC
    * than the md5 it saved. Bit-identical to the array_distinct
    * formulation by construction (MinHashExprSpec pins it).
    */
  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    val mdd = localMd.get()
    val out = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        mdd.reset()
        mdd.update(arr.getUTF8String(i).getBytes)
        mdd.digest(out, 0, 16)
        // first 15 hex chars == big-endian first 8 bytes >>> 4
        var be = 0L
        var k = 0
        while (k < 8) { be = (be << 8) | (out(k) & 0xffL); k += 1 }
        val h = be >>> 4
        var j = 0
        while (j < seeds.length) {
          val v = h ^ seeds(j)
          if (v < mins(j)) mins(j) = v
          j += 1
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
