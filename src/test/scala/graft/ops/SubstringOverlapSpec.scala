package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Pins `Dedup.substringOverlap` against an independent in-memory
  * reference (plain Scala windowing + counting, sharing no code with
  * the DataFrame plan) on randomized corpora with PLANTED verbatim
  * spans — the adversarial cases the fixture gate can't sweep: spans
  * exactly at the W=8 boundary, multi-doc shared spans near the bucket
  * cap, repeated windows inside one document (must count once), and
  * short documents (no windows at all).
  */
class SubstringOverlapSpec extends AnyFunSuite {
  private val W = 8

  private def refPairs(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val wins: Seq[(Long, String)] = docs.flatMap { case (id, text) =>
      val tk = Option(text).toSeq.flatMap(_.split(" ")).filter(_.nonEmpty)
      tk.sliding(W).filter(_.size == W).map(w => (id, w.mkString(" "))).toSeq
        .distinct
    }
    val byWin = wins.groupBy(_._2).filter { case (_, ds) =>
      ds.size >= 2 && ds.size <= 64 }
    byWin.values.flatMap { ds =>
      val ids = ds.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size)
        yield (ids(i), ids(j))
    }.groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }
      .filter(_._3 >= 2).toSet
  }

  private def opPairs(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("substr_spec").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    Dedup.substringOverlap(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("planted spans: boundary lengths, within-doc repeats, short docs") {
    val span = (1 to W).map(i => s"s$i").mkString(" ")           // exactly W
    val long = (1 to W + 3).map(i => s"s$i").mkString(" ")       // W+3 → 4 windows
    val docs = Seq(
      1L -> s"a b c $span d e f",
      2L -> s"x y $span z",                       // shares 1 window with 1 → BELOW minShared
      3L -> s"p $long q",
      4L -> s"$long",                             // shares 4 windows with 3
      5L -> s"$span $span x y z w v u",           // repeated span: window set, not bag
      6L -> "tiny doc under the window",          // < W tokens → no windows
      7L -> null.asInstanceOf[String])
    val got = opPairs(docs)
    val want = refPairs(docs)
    assert(got == want, s"got=$got want=$want")
    // the W+3-token shared run yields exactly 4 shared windows for (3,4)
    assert(want.exists { case (a, b, n) => a == 3L && b == 4L && n == 4L })
    // single-shared-window pairs are filtered by minShared=2
    assert(!want.exists { case (a, b, _) => Set(a, b) == Set(1L, 2L) })
  }

  test("bucket cap: a window shared by >64 docs contributes no pairs") {
    val span = (1 to W).map(i => s"c$i").mkString(" ")
    val extra = (1 to W).map(i => s"e$i").mkString(" ")
    // 70 docs all carry the capped span; docs 1 and 2 ALSO share a
    // private 2-window run that must survive the cap
    val docs = (1L to 70L).map { id =>
      val priv = if (id <= 2) s" $extra x" else ""
      id -> s"d$id $span$priv"
    }
    val got = opPairs(docs)
    val want = refPairs(docs)
    assert(got == want, s"got=${got.size} want=${want.size}")
    // the capped span (shared by all 70) contributes nothing: the only
    // surviving pair is docs 1–2 via their private run (whose c-tail/
    // e-head straddle windows are each shared by exactly those two)
    assert(got.map { case (a, b, _) => (a, b) } == Set((1L, 2L)),
      s"only the private run may pair: $got")
  }

  test("randomized corpora agree with the reference") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (round <- 1 to 5) {
      val docs = (1L to 40L).map { id =>
        val n = 3 + rnd.nextInt(30)
        id -> (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      assert(opPairs(docs) == refPairs(docs), s"round $round diverged")
    }
  }
}
