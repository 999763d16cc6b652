package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The round-12 native kernels must equal the declarative forms they
  * replaced, row for row: SortedPairsExpr vs the nested
  * transform/filter/slice pair expansion (graph edge derivation), and
  * WindowHash64Expr vs md5-of-window-string grouping (substring-overlap
  * dedup) — plus CappedSortedIds' saturation/determinism contract.
  */
class PairWindowExprSpec extends AnyFunSuite {

  test("sortedPairs equals the lambda pair expansion on order groups") {
    val spark = TestSpark.spark
    val ss = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").as("ok"), col("l_suppkey"))
      .groupBy("ok")
      .agg(array_sort(collect_list(col("l_suppkey"))).as("ss"))
    val lambdaPairs = flatten(transform(col("ss"), (x, i) =>
      transform(filter(slice(col("ss"), i + lit(2),
        greatest(size(col("ss")) - i - 1, lit(0))), y => y > x),
        y => struct(x.as("sa"), y.as("sb")))))
    val both = ss.select(col("ok"),
      PairsExpr.sortedPairs(col("ss")).as("native"),
      lambdaPairs.as("lambda"))
    // exact multiset equality per group, including duplicate suppliers
    // (equal elements never pair with each other, only with larger)
    val bad = both.filter(col("native") =!= col("lambda")).count()
    assert(bad == 0, "native pair expansion diverges from the lambda form")
    // and at least one group must actually have pairs for this to test
    assert(both.filter(size(col("native")) > 0).count() > 0)
  }

  test("sortedPairs edge cases: empty, singleton, all-equal, dup runs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[Long]),
      (2L, Seq(7L)),
      (3L, Seq(4L, 4L, 4L)),
      (4L, Seq(1L, 1L, 2L)),
      (5L, Seq(1L, 2L, 3L)))
      .toDF("id", "ss")
    val r = df.select(col("id"),
        PairsExpr.sortedPairs(col("ss")).as("p"))
      .orderBy("id").collect()
    def pairs(i: Int): Seq[(Long, Long)] =
      r(i).getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs(0).isEmpty && pairs(1).isEmpty)
    assert(pairs(2).isEmpty, "equal elements must not pair")
    assert(pairs(3) == Seq((1L, 2L), (1L, 2L)),
      "each duplicate pairs with the larger element once")
    assert(pairs(4) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("windowHashes groups window text exactly like the md5 form") {
    val spark = TestSpark.spark
    val W = 8
    val toks = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => length(t) > 0).as("tk"))
      .filter(size(col("tk")) >= W)
    // native: distinct 64-bit hashes per doc; reference: distinct md5
    // window strings per doc — the COUNTS must agree (hash equality ⟺
    // window-text equality on both sides, modulo collisions that would
    // fail this very test)
    val native = toks.select(col("doc_id"),
      size(TokenWindowExpr.windowHashes(col("tk"), W)).as("n"))
    val md5Form = toks.select(col("doc_id"),
      size(array_distinct(transform(
        sequence(lit(1), size(col("tk")) - (W - 1)),
        i => md5(concat_ws(" ", slice(col("tk"), i, lit(W))))))).as("n"))
    val joined = native.as("a").join(md5Form.as("b"), "doc_id")
      .filter(col("a.n") =!= col("b.n"))
    assert(joined.count() == 0,
      "per-doc distinct window count diverges from the md5 reference")
    // and cross-doc: equal windows in different docs must collide into
    // the same bucket — build two docs sharing one 8-token span
    import spark.implicits._
    val twoDocs = Seq(
      (1L, "a b c d e f g h tail1"),
      (2L, "head a b c d e f g h"),
      (3L, "x y z w v u t s")).toDF("doc_id", "text")
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => length(t) > 0).as("tk"))
    val wh = twoDocs.select(col("doc_id"),
        explode(TokenWindowExpr.windowHashes(col("tk"), W)).as("wh"))
      .groupBy("wh").agg(count(lit(1)).as("n"))
    assert(wh.filter(col("n") === 2).count() == 1,
      "the shared a..h window must hash equal across docs")
  }

  test("CappedSortedIds keeps the smallest ids and marks saturation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cap = udaf(new CappedSortedIds(4))
    // group 1: 3 ids (under cap) — full sorted list
    // group 2: 6 ids (over cap) — saturated at cap+1 = 5 smallest
    val df = (Seq((1L, 30L), (1L, 10L), (1L, 20L)) ++
      (1L to 6L).map(i => (2L, 100L - i)))
      .toDF("g", "id")
      .repartition(8) // partial buffers merge across partitions
    val r = df.groupBy("g").agg(cap(col("id")).as("ds"))
      .orderBy("g").collect()
    assert(r(0).getSeq[Long](1) == Seq(10L, 20L, 30L))
    assert(r(1).getSeq[Long](1) == Seq(94L, 95L, 96L, 97L, 98L),
      "saturated group must hold exactly cap+1 smallest ids")
  }
}
