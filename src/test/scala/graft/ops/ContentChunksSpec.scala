package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Content-defined chunking: boundaries are functions of LOCAL content,
  * so a one-token insertion perturbs only the enclosing chunk — the
  * property that makes re-ingest dedup cheap and that fixed windows
  * lack (every downstream fixed window shifts). Plus conservation: the
  * chunk table partitions the token stream exactly.
  */
class ContentChunksSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    val s = TestSpark.spark
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("a one-token insertion perturbs at most the enclosing chunks") {
    // 400 deterministic pseudo-words; the edit inserts one token mid-doc
    val words = (0 until 400).map(i => s"w${(i * 2654435761L) % 9973}")
    val original = words.mkString(" ")
    val edited = (words.take(200) ++ Seq("INSERTED") ++ words.drop(200))
      .mkString(" ")
    val chunks = Dedup.chunksOf(mkDocs(Seq(
        (1L, "a", original), (2L, "a", edited))))
      .select(col("doc_id"), col("ch")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    val (a, b) = (chunks(1L), chunks(2L))
    // the insertion rewrites one chunk, possibly splitting it or
    // merging across one removed boundary: ≤ 2 chunks lost, ≤ 3 gained
    assert((a -- b).size <= 2, s"original lost ${(a -- b).size} chunks")
    assert((b -- a).size <= 3, s"edited gained ${(b -- a).size} chunks")
    assert((a & b).size >= a.size - 2, "shared mass must dominate")
    // contrast: fixed 16-token windows shift EVERYWHERE after the edit
    val fixedA = words.grouped(16).map(_.mkString(" ")).toSet
    val fixedB = (words.take(200) ++ Seq("INSERTED") ++ words.drop(200))
      .grouped(16).map(_.mkString(" ")).toSet
    assert((fixedA & fixedB).size < a.size - 2,
      "fixed chunking should lose most shared chunks on an insertion")
  }

  test("chunks partition the token stream exactly (conservation)") {
    val s = TestSpark.spark
    val out = Dedup.contentChunks(s, dir)
      .agg(sum("sum_tokens"), sum("n_chunks")).collect()(0)
    val nTok = graft.Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(size(filter(split(col("text"), " "),
        t => length(t) > 0)).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(out.getLong(0) == nTok, "every token is in exactly one chunk")
    assert(out.getLong(1) > 0)
  }

  test("duplicate documents deduplicate chunk-for-chunk") {
    val text = (0 until 64).map(i => s"t$i").mkString(" ")
    val stats = Dedup.contentChunksOf(mkDocs(Seq(
      (1L, "a", text), (2L, "a", text)))).collect()(0)
    // two identical docs: every chunk occurs twice, dup mass = half
    assert(stats.getAs[Long]("n_chunks") == 2 * stats.getAs[Long]("n_uniq"))
    assert(stats.getAs[Long]("dup_tokens") * 2 ==
      stats.getAs[Long]("sum_tokens"))
  }
}
