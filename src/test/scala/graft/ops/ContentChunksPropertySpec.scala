package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** Randomized pin of the distributed content-defined chunker against
  * an independent in-memory reference: same md5 boundary rule, same
  * chunk hashing, computed with plain Scala collections. Seeded
  * generators — deterministic corpora with skewed doc lengths, shared
  * spans (verbatim copies with small edits), and repeated tokens that
  * stress boundary runs.
  */
class ContentChunksPropertySpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The reference chunker: boundary BEFORE token i (i ≥ 1) iff the
    * first 4 hex digits of md5("prev cur") taken as an integer land
    * ≡ 0 (mod 16) — the exact contract of Dedup.chunksOf.
    */
  private def referenceChunks(toks: Seq[String]): Seq[(String, Int)] = {
    if (toks.isEmpty) return Seq.empty
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
    var cur = Vector(toks.head)
    toks.sliding(2).foreach {
      case Seq(a, b) =>
        if (java.lang.Long.parseLong(md5hex(s"$a $b").take(4), 16) % 16 == 0) {
          chunks += cur; cur = Vector(b)
        } else cur :+= b
      case _ =>
    }
    chunks += cur
    chunks.map(c => (md5hex(c.mkString(" ")), c.length)).toSeq
  }

  test("distributed chunks equal the in-memory reference on 40 random docs") {
    val s = TestSpark.spark
    import s.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    // skewed lengths 1..300; a small vocabulary forces repeated tokens
    // (boundary-pair runs) and cross-doc shared spans
    val docs = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(300)
      val toks = Vector.fill(n)(s"w${rnd.nextInt(50)}")
      (id, if (id % 2 == 0) "even" else "odd", toks.mkString(" "))
    }
    val got = Dedup.chunksOf(docs.toDF("doc_id", "source", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getString(3), r.getLong(4).toInt))
        .sortBy(_._1).toSeq).toMap
    docs.foreach { case (id, _, text) =>
      val expected = referenceChunks(
        text.split(" ").toSeq.filter(_.nonEmpty)).sortBy(_._1)
      assert(got.getOrElse(id, Seq.empty) == expected, s"doc $id")
    }
  }

  test("single-token and boundary-at-every-pair docs chunk sanely") {
    val s = TestSpark.spark
    import s.implicits._
    // hunt a token pair whose hash IS a boundary, then tile it
    val boundaryPair = (0 until 10000).map(i => (s"a$i", s"b$i"))
      .find { case (a, b) =>
        java.lang.Long.parseLong(md5hex(s"$a $b").take(4), 16) % 16 == 0 }
      .get
    val tiled = Seq.fill(10)(s"${boundaryPair._1} ${boundaryPair._2}")
      .mkString(" ")
    val docs = Seq((1L, "x", "solo"), (2L, "x", tiled))
      .toDF("doc_id", "source", "text")
    val chunks = Dedup.chunksOf(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(chunks(1L) == 1, "a 1-token doc is exactly one chunk")
    val expected = referenceChunks(tiled.split(" ").toSeq).length
    assert(chunks(2L) == expected,
      "a boundary-dense doc matches the reference chunk count")
  }
}
