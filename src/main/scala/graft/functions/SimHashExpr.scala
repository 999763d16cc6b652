package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 16-bit SimHash of a token array in one
  * pass — per-bit majority vote over the md5-derived hash of each
  * distinct token (identical semantics to ops.Dedup.simhash's
  * explode+groupBy formulation and its SQL oracle, but row-local: no
  * explode, no shuffle — the whole operator becomes a narrow map,
  * which is the difference between one scan and scan+shuffle at
  * 100 TB).
  *
  * Ships real `doGenCode`: whole-stage codegen calls the static kernel
  * directly instead of falling back to interpreted eval.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashExpr.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashExpr = copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

object SimHashExpr {
  private val bits = 16

  /** Per-thread MD5 + reused digest buffer — same allocation diet as
    * MinHashExpr (r19): `getInstance` per row and a byte[16] per token
    * were pure GC debt. UNLIKE MinHash, the `seen` set here is
    * SEMANTIC (votes count distinct tokens — a duplicate would vote
    * twice and flip boundary bits), so it stays; it just keys on the
    * UTF8String (bytes-equality, no String decode per token).
    *
    * ASSUMPTION (round 20, ADVICE): byte equality assumes valid UTF-8
    * tokens. Two distinct INVALID byte sequences that decode to the
    * same String (replacement chars) were deduped under the old
    * String-keyed set and now vote separately — a divergence from the
    * md5-of-decoded-string oracle path only for malformed input, which
    * the fixtures (and any text tokenizer upstream) never produce. A
    * future binary-token caller must decode first.
    */
  private val localMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](n * 2)
    val votes = new Array[Int](bits)
    val mdd = localMd.get()
    val dig = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        if (seen.add(w)) { // distinct tokens only (matches the oracle)
          mdd.reset()
          mdd.update(w.getBytes)
          mdd.digest(dig, 0, 16)
          // first 4 hex chars == first 2 bytes, big-endian
          val h = ((dig(0) & 0xff) << 8) | (dig(1) & 0xff)
          var b = 0
          while (b < bits) {
            votes(b) += (if (((h >> b) & 1) == 1) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column form (Spark 4: Column↔Expression via the sql-package bridge). */
  def simhash(c: Column): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(c)))

  /** SQL registration: `SELECT graft_simhash(split(text, ' ')) …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashExpr(exprs.head), "built-in")
}
