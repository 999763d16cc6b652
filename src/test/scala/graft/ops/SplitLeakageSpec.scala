package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The split-leakage pair: the audit must DETECT the hazard on the
  * content-keyed split (near-dup groups scattered across splits), and
  * the group-keyed split must make it impossible by construction.
  */
class SplitLeakageSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("content-keyed split scatters at least one near-dup group") {
    val leaks = Curation.splitLeakage(TestSpark.spark, dir)
    assert(leaks.count() >= 1,
      "fixture has near-dup groups whose members hash to different " +
        "splits — the audit must surface them")
  }

  test("group-keyed split has zero leakage and covers every document") {
    val s = TestSpark.spark
    val gs = Curation.groupSplit(s, dir).cache()
    try {
      val leaky = gs.groupBy("grp")
        .agg(countDistinct(col("split")).as("k"))
        .filter(col("k") > 1).count()
      assert(leaky == 0, "a near-dup group straddles the split boundary")
      val nDocs = graft.Tables.documents(s, dir).count()
      assert(gs.count() == nDocs, "split must assign every document once")
      // the group hash keeps the 98/1/1 shape: train strictly dominates
      val bySplit = gs.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L)
        && bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
    } finally gs.unpersist()
  }

  test("bm25 ranks by the exact-rational score under a total order") {
    val s = TestSpark.spark
    val rows = TextAnalysis.bm25(s, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getLong(2))
    assert(scores.forall(_ > 0), "only term-matching docs may score")
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "descending score order")
    val ids = rows.map(_.getLong(0))
    assert(rows.zip(rows.tail).forall { case (a, b) =>
      a.getLong(2) > b.getLong(2) || a.getLong(0) < b.getLong(0) },
      "doc_id tiebreak makes the top-k deterministic")
    assert(ids.distinct.length == ids.length)
  }
}
