package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.operators.AsofJoin

/** The custom physical as-of ([[AsofJoinExec]]) against the composed
  * union+window formulation (`AsofJoin.asof`): identical semantics on
  * every contract the window form pins — strict/inclusive bounds,
  * largest-payload tie-break, matched-null vs no-match, null keys —
  * plus the physical properties that justify a custom operator at all
  * (the exec appears in the plan; no extra exchange beyond the two
  * key shuffles; left-side order preserved).
  */
class AsofExecSpec extends AnyFunSuite {

  test("exec picks the latest strictly-earlier right row per key") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100L), (1L, 10L, 200L), (1L, 19L, 300L),
      (3L, 1L, 900L)).toDF("k", "t", "pid")
    val strict = AsofExec.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid", strict = true)
      .select("tag", "last_pid").as[(String, Option[Long])]
      .collect().toMap
    assert(strict == Map("a" -> Some(100L), "b" -> Some(300L), "c" -> None))

    val inclusive = AsofExec.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid", strict = false)
      .select("tag", "last_pid").as[(String, Option[Long])]
      .collect().toMap
    assert(inclusive("a") == Some(200L), "equal time included when non-strict")
  }

  test("right-side ties resolve to the largest payload, nulls lowest") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, Some(7L)), (1L, 5L, Some(9L)),
      (1L, 5L, Option.empty[Long]), (1L, 5L, Some(8L))).toDF("k", "t", "pid")
    val out = AsofExec.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid").select("last_pid").as[Option[Long]].head()
    assert(out == Some(9L))
  }

  test("matched-null payload stays distinct from no-match; null keys never match") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((Some(1L), 10L, "a"), (None: Option[Long], 10L, "nk"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), 5L, Some(100L)), (Some(1L), 8L, None),
      (None: Option[Long], 5L, Some(777L))).toDF("k", "t", "pid")
    val out = AsofExec.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid")
      .select("tag", "last_pid").as[(String, Option[Long])]
      .collect().toMap
    assert(out == Map("a" -> None, "nk" -> None), out.toString)
  }

  test("exec equals the window formulation on the full events table") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val viaWindow = AsofJoin.j7Asof(spark, d)
    val viaExec = AsofJoin.j12AsofExec(spark, d)
    assert(viaExec.count() == viaWindow.count())
    assert(viaExec.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaExec).isEmpty,
      "custom exec and window as-of disagree")
  }

  test("string keys merge correctly (interpreted ordering path)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(("b", 10L), ("a", 10L), ("c", 10L)).toDF("k", "t")
    val right = Seq(("a", 1L, 11L), ("b", 2L, 22L), ("b", 9L, 23L),
      ("d", 1L, 44L)).toDF("k", "t", "pid")
    val out = AsofExec.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid")
      .select("k", "last_pid").as[(String, Option[Long])]
      .collect().toMap
    assert(out == Map("a" -> Some(11L), "b" -> Some(23L), "c" -> None))
  }

  test("plan shape: AsofJoinExec present, exactly two exchanges, order kept") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "t")
    val right = (1L to 1000L).map(i => (i % 7, i - 1, i * 10)).toDF("k", "t", "pid")
    val df = AsofExec.asof(left, right, "k", "k", "t", "t", "pid", "p")
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsofJoin"), s"custom exec missing from plan:\n$s")
    val exchanges = s.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2, s"expected 2 exchanges (one per side), got $exchanges:\n$s")
    // a downstream per-key aggregation must not add a third exchange:
    // the exec declares its left child's hash partitioning as its own
    val agg = df.groupBy("k").agg(max("p"))
    val aggEx = agg.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(aggEx == 2, s"groupBy after as-of re-shuffled:\n${agg.queryExecution.executedPlan}")
  }
}
