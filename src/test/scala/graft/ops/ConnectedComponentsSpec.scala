package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Connected components must converge within the round cap even on
  * graphs whose diameter far exceeds it — that is what the per-round
  * pointer jump buys (O(log d) rounds). A 500-edge path graph has
  * diameter 500: hop-only propagation would need 500 rounds.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  test("a 500-long chain collapses to one component within 20 rounds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val chain = (0L until 500L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain).collect()
    assert(labels.length == 501)
    assert(labels.forall(_.getLong(1) == 0L),
      s"all labels must be the component min, got ${labels.take(5).toSeq}")
  }

  test("separate components keep separate minimum labels") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val m = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }
}
