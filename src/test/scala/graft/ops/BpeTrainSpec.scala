package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Pins the multi-round BPE trainer against an independent in-memory
  * reference: plain Scala pair counting over a word→count map and a
  * greedy left-to-right merge, sharing NO code with the operator's
  * codegen `aggregate` fold. The operator's contract (all-adjacent
  * pair counting, argmax tie-break by (freq desc, left, right),
  * non-overlapping left-to-right merge application) is exercised both
  * on the real sf0.001 corpus and on a synthetic corpus built to
  * stress the run/overlap cases (`l l l l` → `ll ll`).
  */
class BpeTrainSpec extends AnyFunSuite {
  private val d = "/root/testdata/sf0.001"

  /** Reference greedy non-overlapping left-to-right merge. */
  private def mergeRef(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer over a word→count table (CODE POINTS as seed
    * symbols — Spark's substring splits by code point, not UTF-16
    * unit; ALL adjacent pairs counted — overlaps included — weighted
    * by word count, ties broken by (left, right) ascending in UTF-8
    * BYTE order, the ordering both Spark and DuckDB compare with).
    */
  private def utf8Key(s: String): Seq[Int] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(_ & 0xff).toSeq

  private def trainRef(words: Map[String, Long], rounds: Int): Seq[(Long, String, String, Long)] = {
    var state: Map[Vector[String], Long] =
      words.map { case (w, c) =>
        (w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))), c) }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) =>
          (-n, utf8Key(a), utf8Key(b)) }(
          Ordering.Tuple3(Ordering.Long, Ordering.Implicits.seqOrdering,
            Ordering.Implicits.seqOrdering))
        out += ((r.toLong, a, b, n))
        state = state.toSeq.map { case (syms, c) => (mergeRef(syms, a, b), c) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        r += 1
      }
    }
    out.result()
  }

  private def wordCounts(texts: Seq[String]): Map[String, Long] =
    texts.filter(_ != null).flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  test("merge table matches the reference on the sf0.001 corpus") {
    val spark = TestSpark.spark
    assume(new java.io.File(s"$d/documents.parquet").exists)
    val texts = graft.Tables.documents(spark, d)
      .select("text").collect().map(_.getString(0)).toSeq
    val expect = trainRef(wordCounts(texts), 8)
    val got = TextAnalysis.bpeTrain(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect)
    assert(got.nonEmpty, "sf0.001 corpus must yield at least one merge")
    // max pair frequency is non-increasing across rounds: a pair born
    // from a merge occurs at most as often as its rarer constituent
    got.map(_._4).sliding(2).foreach {
      case Seq(x, y) => assert(x >= y, s"freq rose $x -> $y")
      case _         => ()
    }
  }

  test("synthetic corpus: runs merge non-overlapping, ties break lexically") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_train").toString
    // "llll" stresses the overlap rule: pair (l,l) counts 3 per word
    // (overlaps included) but merging yields "ll","ll" (non-overlap).
    // After round 1 the corpus holds (ll,ll)×3 and (a,b)×3 — a genuine
    // tie, broken lexically toward (a,b). 1-char words must not
    // fabricate pairs (the sequence(1,0) trap).
    val texts = Seq(
      (1L, "llll llll ab ab ba x y z"),
      (2L, "llll ab ba"),
      (3L, "x"),
      (4L, null.asInstanceOf[String]))
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val expect = trainRef(wordCounts(texts.map(_._2)), 8)
    val got = TextAnalysis.bpeTrain(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == expect)
    // the first merge must be (l,l) with count 9: three llll words at
    // 3 adjacent pairs each (counting overlaps)
    assert(got.head == ((1L, "l", "l", 9L)))
    // and round 2 must see "ll ll" (non-overlapping remerge), so (ll,ll)
    // exists with count 3 — one per llll occurrence
    assert(got.exists { case (_, a, b, _) => a == "ll" && b == "ll" })
  }

  test("forced distributed merge loop equals the local solve") {
    val spark = TestSpark.spark
    assume(new java.io.File(s"$d/documents.parquet").exists)
    def table() = TextAnalysis.bpeTrain(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val local = table() // sf0.001 vocabulary is far under the budget
    spark.conf.set("graft.bpe.localWords", "0")
    try assert(table() == local)
    finally spark.conf.unset("graft.bpe.localWords")
  }

  test("encode reports the reference token bill per source") {
    val spark = TestSpark.spark
    assume(new java.io.File(s"$d/documents.parquet").exists)
    val docs = graft.Tables.documents(spark, d)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val merges = trainRef(wordCounts(docs.map(_._2)), 8)
    def encode(w: String): Int =
      merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (_, a, b, _)) => mergeRef(syms, a, b)
      }.length
    val expect = docs
      .flatMap { case (src, t) =>
        Option(t).toSeq.flatMap(_.split(" ")).filter(_.nonEmpty)
          .map(w => (src, w)) }
      .groupMapReduce(_._1) { case (_, w) =>
        (1L, w.length.toLong, encode(w).toLong) } {
        case ((a1, b1, c1), (a2, b2, c2)) => (a1 + a2, b1 + b2, c1 + c2) }
      .map { case (src, (nw, nc, nb)) => (src, nw, nc, nb, nc * 1000L / nb) }
      .toSet
    val got = TextAnalysis.bpeEncode(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
  }

  test("non-BMP ties: code-point symbols, UTF-8 byte-order tie-break") {
    // U+FFFF is three UTF-8 bytes (EF BF BF); 😀 (U+1F600) is four
    // (F0 9F 98 80) but a SMALLER UTF-16 lead unit (D83D), so the two
    // orderings disagree exactly here: UTF-8 picks the U+FFFF pair,
    // UTF-16 would pick the emoji pair. The emoji also pins code-point
    // symbol splitting — a UTF-16 split would halve its surrogates.
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_nonbmp").toString
    val texts = Seq((1L, "￿￿ ￿￿ 😀😀 😀😀"))
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def table() = TextAnalysis.bpeTrain(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val local = table()
    assert(local == trainRef(wordCounts(texts.map(_._2)), 8))
    assert(local.head._2 == "￿" && local.head._3 == "￿",
      s"tie must break toward the UTF-8-smaller pair, got ${local.head}")
    // and the forced-distributed path agrees on the same corpus
    spark.conf.set("graft.bpe.localWords", "0")
    try assert(table() == local)
    finally spark.conf.unset("graft.bpe.localWords")
  }

  test("NUL-bearing tokens survive the distributed merge fold") {
    // Dirty web text can contain literal U+0000. A sentinel-based fold
    // (pend = NUL meaning "none") fabricates a merge at word start —
    // the initial "no pending" state compares equal to a NUL left
    // symbol — so the distributed path diverged from the driver solve
    // and the oracle exactly on this input. The fold now tracks
    // pending-presence as an explicit boolean.
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_nul").toString
    val nul = 0.toChar.toString
    val texts = Seq((1L, s"$nul$nul $nul$nul ab x$nul"))
    texts.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def table() = TextAnalysis.bpeTrain(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val local = table()
    assert(local == trainRef(wordCounts(texts.map(_._2)), 8))
    assert(local.head == ((1L, nul, nul, 2L)),
      s"first merge must be the NUL pair with count 2, got ${local.head}")
    spark.conf.set("graft.bpe.localWords", "0")
    try assert(table() == local)
    finally spark.conf.unset("graft.bpe.localWords")
  }

  test("all-single-char corpus terminates with an empty merge table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpe_single").toString
    Seq((1L, "a b c a"), (2L, "c b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.bpeTrain(spark, tmp)
    assert(got.count() == 0)
    assert(got.columns.toSeq == Seq("step", "lhs", "rhs", "freq"))
  }
}
