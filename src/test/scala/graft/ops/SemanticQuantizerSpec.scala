package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Round-12 quantizer swap: the semantic-dedup pruner runs over
  * TRAINED k-means cells instead of the first-√N raw vectors. The pair
  * kernel only sees WITHIN-cell pairs, so the quantizer's quality IS
  * the pruner's recall — a better clustering co-locates near-duplicates
  * and surfaces more prunable vectors at the identical pair budget.
  * This spec pins that the training actually buys recall (not just a
  * different arbitrary partition) and that the trained path stays
  * deterministic.
  */
class SemanticQuantizerSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("trained cells find at least as many dup witnesses as first-k seeds") {
    val spark = TestSpark.spark
    val trained = Similarity.semanticDedupWith(
      Similarity.dedupAssign(spark, dir))
    val n = graft.Tables.embeddings(spark, dir).count()
    val firstK = Similarity.semanticDedupWith(
      Similarity.ivfAssign(spark, dir, Similarity.dedupCells(n)))
    val nTrained = trained.count()
    val nFirstK = firstK.count()
    info(s"dup witnesses: trained=$nTrained firstK=$nFirstK")
    assert(nTrained >= nFirstK,
      s"k-means cells must not lose dedup recall vs first-k seeds " +
        s"($nTrained < $nFirstK)")
  }

  test("trained assignment is deterministic and total") {
    val spark = TestSpark.spark
    val a1 = Similarity.dedupAssign(spark, dir)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val a2 = Similarity.dedupAssign(spark, dir)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a1 == a2, "assignment must be rep-stable (memo + exact math)")
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(a1.size == n, "every vector must land in exactly one cell")
    // cells are a partition drawn from the seeded id range
    assert(a1.values.forall(c => c >= 0 && c < Similarity.dedupCells(n)))
  }
}
