package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** As-of / bounded-range join semantics on handcrafted rows, plus the
  * plan shape that makes them scale (equi shuffle, no nested loop).
  */
class AsofJoinSpec extends AnyFunSuite {

  test("asof picks the latest strictly-earlier right row per key") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100L), (1L, 10L, 200L), (1L, 19L, 300L),
      (3L, 1L, 900L)).toDF("k", "t", "pid")
    val strict = AsofJoin.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid", strict = true)
      .select("tag", "last_pid").as[(String, Option[Long])]
      .collect().toMap
    // at t=10 the equal-time right row (200) is excluded under strict
    assert(strict == Map("a" -> Some(100L), "b" -> Some(300L), "c" -> None))

    val inclusive = AsofJoin.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid", strict = false)
      .select("tag", "last_pid").as[(String, Option[Long])]
      .collect().toMap
    assert(inclusive("a") == Some(200L), "equal time included when non-strict")
  }

  test("asof right-side ties resolve to the largest payload") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 7L), (1L, 5L, 9L), (1L, 5L, 8L)).toDF("k", "t", "pid")
    val out = AsofJoin.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid").select("last_pid").as[Long].head()
    assert(out == 9L)
  }

  test("asof distinguishes matched-null payloads and never matches null keys") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((Some(1L), 10L, "a"), (None: Option[Long], 10L, "nk"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), 5L, Some(100L)), (Some(1L), 8L, None),
      (None: Option[Long], 5L, Some(777L))).toDF("k", "t", "pid")
    val out = AsofJoin.asof(left, right, "k", "k", "t", "t",
      "pid", "last_pid")
      .select("tag", "last_pid").as[(String, Option[Long])]
      .collect().toMap
    // the most recent right row (t=8) has a NULL payload: the answer is
    // null, not the older 100; a null-key left matches nothing
    assert(out == Map("a" -> None, "nk" -> None), out.toString)
  }

  test("range join buckets do not double-count and keep zero-match rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    // three events for one user, 30 s apart: each sees only the one
    // within the preceding 60 s window
    val df = AsofJoin.j8Range(spark, "/root/testdata/sf0.001")
    val total = df.agg(sum(col("n_prior_minute"))).head().getLong(0)
    val viaSql = {
      val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), col("user_id"),
          expr("ts_ns div 1000").as("ts_us"))
      ev.alias("e").join(ev.alias("r"),
          col("r.user_id") === col("e.user_id") &&
            col("r.ts_us") >= col("e.ts_us") - 60000000L &&
            col("r.ts_us") < col("e.ts_us"))
        .count()
    }
    assert(total == viaSql, s"bucketed count $total != naive count $viaSql")
    assert(df.count() ==
      graft.Tables.events(spark, "/root/testdata/sf0.001").count(),
      "every event must appear, including zero-match ones")
  }

  test("both operators avoid nested-loop joins in the physical plan") {
    val spark = TestSpark.spark
    Seq("q_j7_asof", "q_j8_range").foreach { q =>
      val p = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$q plan:\n$p")
    }
  }
}
