package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Pins the round-15 iteration PLAN shape for the distributed graph
  * twins: the persisted, key-partitioned graph frame plus alias-aware
  * aggregate partitioning make every per-round join plan WITHOUT an
  * exchange on either side, so the total shuffle count is a small
  * constant — the E-row edge frame is NOT re-exchanged once per round.
  * A regression back to a checkpointed edge frame (RDD scan, unknown
  * partitioning) adds per-round join exchanges and these exact counts
  * catch it at plan time, no timing needed.
  *
  * Broadcast joins are disabled inside the test: at fixture scale the
  * rank/label side would broadcast and hide the join's distribution
  * requirement, making old and new shapes indistinguishable — the
  * 100 TB regime (where nothing broadcasts) is exactly where the
  * partitioning visibility matters, and SMJ planning reproduces it.
  */
class PlanShapeSpec extends AnyFunSuite {
  private def spark = graft.etl.TestSpark.spark

  private def edges: DataFrame = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("sa", "sb").localCheckpoint(true)
  }

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case _: ShuffleExchangeExec => 1
    }.sum

  /** Exchange count INSIDE a persisted frame's cached plan: once a
    * frame is persisted, its own executedPlan collapses to an
    * InMemoryTableScan, so the per-round exchanges live in
    * relation.cachedPlan (still excluding any deeper cache boundary —
    * the nested scan of the graph frame is a leaf there too).
    */
  private def cachedExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        s.relation.cachedPlan.collect { case _: ShuffleExchangeExec => 1 }.sum
    }.sum

  private def noBroadcast[T](f: => T): T = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val was = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try graft.Tables.withStaticParts(spark, 4)(f)
    finally spark.conf.set(k, was)
  }

  // The counts below exclude exchanges INSIDE the persisted frame's
  // cached plan (collect does not descend into InMemoryRelation) —
  // which is the point: everything the iteration re-executes per
  // round is outside the cache boundary, and only the combinable vote
  // aggregations remain there.

  test("pagerank: exactly one aggregation exchange per round, no join exchanges") {
    noBroadcast {
      val (pr, handles) = GraphOps.pagerankRounds(edges)
      try assert(exchanges(pr) == 3, // 3 rounds x 1 groupBy(v)
        pr.queryExecution.executedPlan.toString)
      finally handles.foreach(_.unpersist(true))
    }
  }

  test("ppr: same exchange-free round shape as pagerank") {
    noBroadcast {
      val (pr, handles) = GraphOps.pprRounds(edges)
      try assert(exchanges(pr) == 3,
        pr.queryExecution.executedPlan.toString)
      finally handles.foreach(_.unpersist(true))
    }
  }

  test("labelprop: two vote exchanges per later round, round 1 rides the cache partitioning") {
    noBroadcast {
      val (lab, handles) = GraphOps.labelpropRounds(edges)
      // round 1's (u,label) count needs no exchange — label IS the
      // partition column v there — so: 1 + 3 x 2
      try assert(exchanges(lab) == 7,
        lab.queryExecution.executedPlan.toString)
      finally handles.foreach(_.unpersist(true))
    }
  }

  test("pagerank k>3: persist boundary bounds plan depth, one exchange per round") {
    // the 20-round / 100 TB regime (round 16): at rounds >
    // iterPersistEvery the carried rank frame persists every k rounds,
    // so the FINAL plan replans only the post-boundary suffix while
    // the boundary's own plan carries exactly one aggregation exchange
    // per pre-boundary round — total shuffles stay one per round AND
    // depth is bounded. A regression to unbounded chaining shows up as
    // `rounds` exchanges in the final plan; a regression to per-round
    // checkpointing shows up as join re-exchanges in both counts.
    noBroadcast {
      val rounds = 10
      val k = GraphOps.iterPersistEvery
      assert(rounds > k, "test must cross the persist boundary")
      val (pr, handles) = GraphOps.pagerankRounds(edges, rounds)
      try {
        // handles = graph frame + exactly one boundary (rounds < 2k)
        assert(handles.size == 2, s"expected 1 boundary, got ${handles.size - 1}")
        assert(exchanges(pr) == rounds - k, // post-boundary suffix only
          pr.queryExecution.executedPlan.toString)
        assert(cachedExchanges(handles(1)) == k, // one agg exchange per round
          handles(1).queryExecution.executedPlan.toString)
      } finally handles.foreach(_.unpersist(true))
    }
  }

  test("labelprop k>3: same bounded-depth persist boundary") {
    noBroadcast {
      val rounds = 10
      val k = GraphOps.iterPersistEvery
      assert(rounds > k, "test must cross the persist boundary")
      val (lab, handles) = GraphOps.labelpropRounds(edges, rounds)
      try {
        assert(handles.size == 2, s"expected 1 boundary, got ${handles.size - 1}")
        // two vote exchanges per post-boundary round
        assert(exchanges(lab) == 2 * (rounds - k),
          lab.queryExecution.executedPlan.toString)
        // boundary plan: round 1 rides the cache partitioning (one
        // exchange), rounds 2..k pay two each
        assert(cachedExchanges(handles(1)) == 1 + 2 * (k - 1),
          handles(1).queryExecution.executedPlan.toString)
      } finally handles.foreach(_.unpersist(true))
    }
  }

  test("pagerank k>3: boundary-crossing iteration stays bit-equal to the CSR kernel") {
    // the depth-bound machinery must not change a single rank: 10
    // distributed rounds (one persist boundary) vs 10 local CSR rounds
    noBroadcast {
      val e = edges
      assert(10 > GraphOps.iterPersistEvery,
        "test must cross the persist boundary it is named for")
      val local = GraphOps.pagerankLocal(
        e.collect().map(r => (r.getLong(0), r.getLong(1))), 10).toMap
      val (pr, handles) = GraphOps.pagerankRounds(e, 10)
      try {
        val dist = pr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(dist == local)
      } finally handles.foreach(_.unpersist(true))
    }
  }
}
