package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The hierarchical prefix-sum packing must be invariant in the chunk
  * size — any chunking (including one so large it degenerates to the
  * flat single-window formulation) yields the same bins, because
  * addition is associative. This is the property that lets the 100 TB
  * plan and the oracle's flat SQL be the same operator.
  */
class CurationSpec extends AnyFunSuite {
  test("packing bins are invariant in the chunk size") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    def bins(chunkDocs: Int): Seq[(Long, Long)] =
      Curation.pack(spark, d, chunkDocs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3)))
        .sortBy(_._1).toSeq
    val flat = bins(Int.MaxValue) // one chunk ≅ the oracle's flat window
    assert(flat.nonEmpty && flat.exists(_._2 > 0), "need multiple bins")
    Seq(1, 3, 50).foreach { c =>
      assert(bins(c) == flat, s"chunkDocs=$c diverged from flat packing")
    }
  }
}
