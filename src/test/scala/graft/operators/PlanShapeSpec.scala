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
      val (pr, g) = GraphOps.pagerankRounds(edges)
      try assert(exchanges(pr) == 3, // 3 rounds x 1 groupBy(v)
        pr.queryExecution.executedPlan.toString)
      finally g.unpersist(true)
    }
  }

  test("ppr: same exchange-free round shape as pagerank") {
    noBroadcast {
      val (pr, g) = GraphOps.pprRounds(edges)
      try assert(exchanges(pr) == 3,
        pr.queryExecution.executedPlan.toString)
      finally g.unpersist(true)
    }
  }

  test("labelprop: two vote exchanges per later round, round 1 rides the cache partitioning") {
    noBroadcast {
      val (lab, dir) = GraphOps.labelpropRounds(edges)
      // round 1's (u,label) count needs no exchange — label IS the
      // partition column v there — so: 1 + 3 x 2
      try assert(exchanges(lab) == 7,
        lab.queryExecution.executedPlan.toString)
      finally dir.unpersist(true)
    }
  }
}
