package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

class TopKAggSpec extends AnyFunSuite {

  test("aggregator state never exceeds k and merge order is immaterial") {
    val agg = new TopKIds(3)
    val items = Seq(5.0 -> 1L, 2.0 -> 2L, 9.0 -> 3L, 9.0 -> 4L, 1.0 -> 5L,
      7.0 -> 6L).map { case (s, i) => ScoredId(s, i) }
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    assert(whole.size <= 3)
    // every split point and both merge orders give the same result
    (1 until items.size).foreach { cut =>
      val (l, r) = items.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(bl, br)) == agg.finish(whole))
      assert(agg.finish(agg.merge(br, bl)) == agg.finish(whole))
    }
    // ties break on the smaller id: 9.0 twice -> ids 3,4 then 7.0 -> 6
    assert(agg.finish(whole) == "3,4,6")
  }

  test("NaN scores sort deterministically (total order, no contract violation)") {
    val agg = new TopKIds(2)
    val items = Seq(ScoredId(Double.NaN, 7L), ScoredId(1.0, 1L),
      ScoredId(Double.NaN, 3L), ScoredId(2.0, 2L))
    val r = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    // under Double.compare NaN ranks above every number; ties on id
    assert(r == "3,7")
    assert(agg.finish(items.reverse.foldLeft(agg.zero)(agg.reduce)) == r)
  }

  test("udaf equals the window-rank formulation on the fixture") {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    val got = graft.operators.FunctionOps.topkUdaf(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = graft.Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy("o_orderpriority")
      // collect_list order is not guaranteed: collect (rn, key) structs
      // and sort by rank before joining
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("o_orderkey")))),
        x => x.getField("o_orderkey").cast("string")), ",").as("top_keys"))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == ref && got.nonEmpty)
  }
}
