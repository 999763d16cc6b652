package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Personalized PageRank: forced local and distributed paths must be
  * bit-equal (same exact-integer contract as pagerank), the teleport
  * floor must hold at every seed, and total mass can only LEAK through
  * integer truncation — never grow past the injected prScale.
  */
class PprSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private val prScale = 1000000000000L // GraphOps contract (oracle splices it)

  private def forced[T](v: String)(f: => T): T = {
    val s = TestSpark.spark
    val k = "graft.graph.broadcastEdges"
    val prev = s.conf.getOption(k)
    s.conf.set(k, v)
    try f finally prev.fold(s.conf.unset(k))(s.conf.set(k, _))
  }

  test("forced local and distributed PPR agree bit-for-bit") {
    def run() = GraphOps.ppr(TestSpark.spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = forced(Long.MaxValue.toString)(run())
    val dist = forced("0")(run())
    assert(local.nonEmpty, "fixture affinity graph must be non-empty")
    assert(local == dist)
  }

  test("planted path graph: support is exactly the 3-hop ball around seeds") {
    // path 0-1-2-...-29; seeds are the 3 smallest ids {0,1,2}. After 3
    // propagation rounds, rank is nonzero exactly for vertices within
    // 3 hops of the seed set (ids ≤ 5) — the teleport-locality contract
    // that distinguishes PPR from global pagerank, whose uniform init
    // ranks every vertex.
    val edges = (0L until 29L).map(i => (i, i + 1)).toArray
    val ranks = GraphOps.pprLocal(edges).toMap
    (0L to 29L).foreach { v =>
      val inBall = v <= 5L
      assert((ranks(v) > 0L) == inBall,
        s"vertex $v: rank ${ranks(v)} — support must be the 3-hop ball")
    }
    // decay along the path: each hop away from the seeds ranks lower
    assert(ranks(3L) > ranks(4L) && ranks(4L) > ranks(5L))
  }

  test("seed teleport floor holds and mass never exceeds the injection") {
    val ranks = GraphOps.ppr(TestSpark.spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeds = ranks.keys.toSeq.sorted.take(3)
    val sbase = (15L * (prScale / seeds.length)) / 100L
    seeds.foreach(v => assert(ranks(v) >= sbase,
      s"seed $v rank ${ranks(v)} below its teleport floor $sbase"))
    assert(ranks.values.forall(_ >= 0L))
    assert(ranks.values.sum <= prScale,
      "integer truncation may leak mass but never mint it")
    // personalization: some non-seed vertex far from the seeds must
    // rank strictly below the weakest seed (global pagerank would not
    // guarantee this ordering)
    assert(ranks.values.min < seeds.map(ranks).min)
  }
}
