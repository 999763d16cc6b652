package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: count of whitespace-delimited tokens of
  * `child` that are in a fixed word set, in ONE byte-level pass over
  * the string — no token array, no per-token UTF8String allocation.
  *
  * Exactly equivalent to `size(filter(split(text, " "), isin(words)))`
  * for non-empty words (empty tokens from repeated/trailing spaces
  * match nothing in either form, so the split-limit subtleties cannot
  * change the count; a spec pins the equivalence). The declarative
  * form allocates the full token array plus a filtered copy per word
  * set — the language-ID scorer evaluates FOUR sets per document, i.e.
  * eight corpus-sized array materializations per scan that this
  * expression removes. At 100 TB the text-quality pass is pure
  * per-byte CPU; this is the same narrow-map saving MinHashExpr buys
  * the dedup path.
  *
  * Ships real `doGenCode`; null text yields null (matching
  * size(split(null)) under non-legacy semantics).
  */
case class StopwordHitsExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty && words.forall(_.nonEmpty),
    "graft_stopword_hits needs non-empty words")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_stopword_hits expects string, got $t")
    }

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    StopwordHitsExpr.kernel(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", wordBytes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StopwordHitsExpr.kernel($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : StopwordHitsExpr = copy(child = newChild)
  override def prettyName: String = "graft_stopword_hits"
}

object StopwordHitsExpr {
  /** Static kernel shared by interpreted eval and generated code:
    * single scan, token boundaries at 0x20 (the tokenizer's separator),
    * byte-exact match against the word set (UTF-8 byte equality IS
    * string equality).
    */
  def kernel(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val b = s.getBytes
    val n = b.length
    var count = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        val len = i - start
        if (len > 0) {
          var w = 0
          var matched = false
          while (w < words.length && !matched) {
            val wb = words(w)
            if (wb.length == len) {
              var k = 0
              while (k < len && wb(k) == b(start + k)) k += 1
              if (k == len) matched = true
            }
            w += 1
          }
          if (matched) count += 1
        }
        start = i + 1
      }
      i += 1
    }
    count
  }

  /** Column form (Spark 4: Column↔Expression via the sql-package bridge). */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    GraftBridge.column(StopwordHitsExpr(GraftBridge.expression(c), words))

  /** SQL form: `graft_stopword_hits(text, 'the,a,of,and,is')` — the
    * word set as one comma-joined STRING LITERAL (foldable), split at
    * registration time so the kernel still sees a static byte table.
    */
  def fromExprs(exprs: Seq[Expression]): StopwordHitsExpr = {
    require(exprs.length == 2 && exprs(1).foldable,
      "graft_stopword_hits(text, 'w1,w2,...') needs a literal word list")
    val lit = exprs(1).eval(null)
    require(lit != null, "graft_stopword_hits word list must not be null")
    StopwordHitsExpr(exprs.head,
      lit.toString.split(",").toSeq.filter(_.nonEmpty))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_stopword_hits", fromExprs, "built-in")
}
