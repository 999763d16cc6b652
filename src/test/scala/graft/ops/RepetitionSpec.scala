package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins TextAnalysis.repetitionOf's three intra-document signals on
  * constructed corpora with hand-computable repetition structure —
  * the degenerate shapes (1-token, 2-token, all-identical, all-
  * distinct) and an independently-computed random check of the modal-
  * bigram fold against a plain Scala groupBy count.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = graft.etl.TestSpark.spark

  private def run(texts: Seq[String]): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextAnalysis.repetitionOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("hand-computable corpora land exactly") {
    val m = run(Seq(
      "a",                   // 1 token: no bigrams, no trigrams
      "a b",                 // 2 distinct tokens, one bigram, no trigram
      "x x x x",             // all-identical: max repetition
      "p q r s t",           // all-distinct: zero repetition
      "a b a b a b"))        // period-2 template
    // 1 token: n=1, all zero
    assert(m(0L) == ((1L, 0L, 0L, 0L)))
    // "a b": n=2 distinct, modal bigram "a b" count 1 → 2*1/2 = 1.0
    assert(m(1L) == ((2L, 0L, 1000000L, 0L)))
    // "x x x x": dup_token = (4-1)/4; bigram "x x" ×3 → capped 1.0;
    // trigrams "x x x" ×2, 1 distinct → dup 1/2
    assert(m(2L) == ((4L, 750000L, 1000000L, 500000L)))
    // all-distinct: dup_token 0; modal bigram count 1 → 2/5; trigrams
    // all distinct → 0
    assert(m(3L) == ((5L, 0L, 400000L, 0L)))
    // "a b a b a b": n=6, 2 distinct → dup 4/6; bigrams
    // [ab, ba, ab, ba, ab] modal 3 → 2*3/6 = 1.0; trigrams
    // [aba, bab, aba, bab] → 2 distinct of 4 → 1/2
    assert(m(4L) == ((6L, 666666L, 1000000L, 500000L)))
  }

  test("null and empty-ish texts drop out; empty tokens count like the oracle's split") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, "a  b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(!out.contains(1L), "null text must drop out")
    // "a  b" splits to [a, "", b] — 3 distinct tokens under the plain
    // space split both engines share
    assert(out(2L)._1 == 3L && out(2L)._2 == 0L)
  }

  test("modal-bigram fold matches an independent groupBy count on random docs") {
    val rnd = new scala.util.Random(41)
    val texts = (1 to 30).map { _ =>
      val n = rnd.nextInt(40) + 2
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar.toString)
        .mkString(" ")
    }
    val got = run(texts)
    texts.zipWithIndex.foreach { case (txt, i) =>
      val t = txt.split(" ", -1)
      val bgs = t.sliding(2).map(_.mkString(" ")).toSeq
      val best = bgs.groupBy(identity).values.map(_.size).max.toLong
      val wantTop = math.min(1000000L, 1000000L * 2 * best / t.length)
      assert(got(i.toLong)._3 == wantTop,
        s"doc $i '$txt': top_bigram ${got(i.toLong)._3} != $wantTop")
    }
  }
}
