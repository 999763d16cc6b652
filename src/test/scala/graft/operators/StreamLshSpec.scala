package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The streaming incremental LSH must equal a batch recompute of its
  * arrival-prefix contract: pairs among each band bucket's
  * first-maxBucket members in doc_id order. This is the whole point of
  * sharing Dedup.sigOf/bandArr — stream and batch literally cannot
  * disagree on signatures, only on admission policy, and this pins the
  * policy.
  */
class StreamLshSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("drained stream equals the arrival-prefix batch twin") {
    val s = TestSpark.spark
    val streamed = StreamToolOps.streamLshPairs(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "h").orderBy("doc_id")
    val kept = graft.ops.Dedup.sigOf(
      graft.Tables.documents(s, dir).filter(col("text").isNotNull))
      .select(col("doc_id"),
        posexplode(graft.ops.Dedup.bandArr).as(Seq("band", "h")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= graft.ops.Dedup.maxBucket)
    val a = kept.select(col("band"), col("h"), col("doc_id").as("doc_a"))
    val b = kept.select(col("band").as("b2"), col("h").as("h2"),
      col("doc_id").as("doc_b"))
    val batch = a.join(b, col("band") === col("b2") && col("h") === col("h2")
        && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}, " +
        s"batch-only: ${(batch -- streamed).take(5)}")
    assert(streamed.nonEmpty)
    // emission boundedness: no doc participates in more pairs than the
    // cap admits across 4 bands
    val cap = graft.ops.Dedup.maxBucket
    val degree = streamed.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map(_._2.size).max
    assert(degree <= 4 * (cap - 1),
      s"degree $degree exceeds the 4-band x (cap-1) bound")
  }
}
