package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library packaging for the native Catalyst expressions: a
  * `SparkSessionExtensions` hook, so a user enables everything with
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`), and `graft_simhash` /
  * `graft_edit_within` resolve in ANY session of that application —
  * including sessions created on executors' behalf by thrift/connect
  * servers — without a per-session `register` call. The per-session
  * `SimHashExpr.register`/`EditWithinExpr.register` helpers stay for
  * ad-hoc use; this is the deployment path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteLevenshteinGuard)
    ext.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(tokens) - 16-bit SimHash of a token array"),
      (exprs: Seq[Expression]) => SimHashExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(tokens) - 16-permutation MinHash signature"),
      (exprs: Seq[Expression]) => MinHashExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - in-order dot product of two double arrays"),
      (exprs: Seq[Expression]) => DotExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      info("graft_sqdist",
        "graft_sqdist(a, b) - exact squared L2 over two bigint arrays"),
      (exprs: Seq[Expression]) => SqDistExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_long"),
      info("graft_dot_long",
        "graft_dot_long(a, b) - exact dot product of two bigint arrays"),
      (exprs: Seq[Expression]) => DotLongExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_pairs"),
      info("graft_sorted_pairs",
        "graft_sorted_pairs(sorted_bigints) - all (a<b) element pairs " +
          "as struct<sa,sb>, one per index pair"),
      (exprs: Seq[Expression]) => SortedPairsExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_window_hash"),
      info("graft_window_hash",
        "graft_window_hash(tokens, w) - distinct 64-bit hashes of every " +
          "w-consecutive-token window"),
      (exprs: Seq[Expression]) => WindowHash64Expr(exprs(0),
        TokenWindowExpr.wFromExpr(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_stopword_hits"),
      info("graft_stopword_hits",
        "graft_stopword_hits(text, 'w1,w2,...') - single-pass stopword count"),
      StopwordHitsExpr.fromExprs _))
    ext.injectFunction((
      FunctionIdentifier("graft_edit_within"),
      info("graft_edit_within",
        "graft_edit_within(a, b, k) - true if levenshtein(a, b) <= k"),
      (exprs: Seq[Expression]) => EditWithinExpr(exprs(0), exprs(1),
        EditWithinExpr.kFromExpr(exprs(2)))))
  }
}
