package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native W-token window hashing for exact-substring overlap dedup:
  * input `array<string>` (the document's tokens), output `array<bigint>`
  * of the DISTINCT 64-bit hashes of every W-consecutive-token window.
  *
  * Replaces `transform(sequence(...), i => md5(concat_ws(" ",
  * slice(tk, i, W))))` + a post-explode `.distinct()`:
  *  - the lambda evaluated interpreted and copied an 8-token slice +
  *    built a window string + a 32-char hex string PER TOKEN POSITION
  *    (~13 s CPU + ~1.8 s GC per execution at sf0.1 — round-12 trace);
  *    the kernel streams the same window bytes through FNV-1a with zero
  *    per-window allocation,
  *  - per-document dedup happens ROW-LOCALLY (sort + unique on the
  *    hash array), which deletes the corpus-token-wide DISTINCT
  *    shuffle from the plan entirely — the window table now goes
  *    straight from the explode into the per-hash count.
  *
  * The hash frames the window exactly as the string form did (token
  * bytes joined by 0x20, which no token can contain after a
  * split-on-space), so hash equality ⟺ window-text equality modulo
  * 64-bit collisions — the same equivalence the md5 form relied on,
  * and the DuckDB oracle compares RESULTING PAIRS, not hashes. Null
  * array → null; null tokens are skipped (cannot occur after
  * `filter(split(...))`). Windows are only emitted when the array has
  * ≥ W tokens — short docs yield an empty array, never a fabricated
  * window (the sequence(1,0) downward-step trap).
  */
case class WindowHash64Expr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_window_hash expects array<string>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    TokenWindowExpr.windowHashes(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenWindowExpr.windowHashes($a, $w);")

  override protected def withNewChildInternal(newChild: Expression)
      : WindowHash64Expr = copy(child = newChild)
  override def prettyName: String = "graft_window_hash"
}

object TokenWindowExpr {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over the bytes of tokens [i, i+w), joined by 0x20 —
    * byte-identical framing to hashing the window STRING. Static kernel
    * shared by interpreted eval and generated code.
    */
  def windowHashes(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val m = n - w + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = FnvOffset
      var j = i
      while (j < i + w) {
        if (!a.isNullAt(j)) {
          val b = a.getUTF8String(j).getBytes
          var k = 0
          while (k < b.length) {
            h = (h ^ (b(k) & 0xffL)) * FnvPrime
            k += 1
          }
        }
        if (j < i + w - 1) h = (h ^ 0x20L) * FnvPrime
        j += 1
      }
      hs(i) = h
      i += 1
    }
    // row-local dedup: sort + unique (no per-element boxing)
    java.util.Arrays.sort(hs)
    var uniq = 1
    i = 1
    while (i < m) {
      if (hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, uniq))
  }

  def windowHashes(a: Column, w: Int): Column =
    GraftBridge.column(WindowHash64Expr(GraftBridge.expression(a), w))

  /** SQL-surface helper: the window width must be a foldable integer
    * literal (it is baked into the expression instance).
    */
  def wFromExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case lit if lit.foldable =>
        lit.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_window_hash width must be an integer literal, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"graft_window_hash width must be a foldable literal, got $other")
    }
}
