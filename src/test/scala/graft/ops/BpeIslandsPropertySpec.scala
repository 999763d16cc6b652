package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The BPE oracle (TextAnalysis.bpeStages) does not apply the greedy
  * fold — it uses a closed form: within each maximal run of
  * CONSECUTIVE pair-match positions, merge the alternating positions
  * starting at the run head. This property spec pins that closed form
  * equal to the operator's greedy left-to-right semantics on random
  * symbol sequences — including the adversarial shapes: long
  * same-symbol runs (where matches overlap, stride 1) and a == b
  * merges at run boundaries. If this holds pointwise, the oracle's
  * per-round transform is correct for ANY corpus, not just the three
  * fixture vocabularies the end-to-end check replays.
  */
class BpeIslandsPropertySpec extends AnyFunSuite {

  /** Greedy left-to-right non-overlapping merge — the operator's fold
    * semantics (mirrors TextAnalysis.mergeFold / BpeTrainSpec.mergeRef).
    */
  private def foldMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The oracle's gaps-and-islands closed form, transcribed from the
    * SQL: match(i) = (syms(i)=a ∧ syms(i+1)=b); group consecutive match
    * positions into runs; a position is a merge START iff it is a match
    * and its offset from its run head is even; a position is CONSUMED
    * iff the previous position is a merge start; output merged symbol
    * at starts, drop consumed, keep the rest.
    */
  private def islandsMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val n = syms.length
    val m = Array.tabulate(n)(i =>
      i + 1 < n && syms(i) == a && syms(i + 1) == b)
    val runHead = new Array[Int](n)
    for (i <- 0 until n if m(i))
      runHead(i) = if (i > 0 && m(i - 1)) runHead(i - 1) else i
    val ms = Array.tabulate(n)(i => m(i) && (i - runHead(i)) % 2 == 0)
    val consumed = Array.tabulate(n)(i => i > 0 && ms(i - 1))
    (0 until n).iterator
      .filterNot(consumed)
      .map(i => if (ms(i)) a + b else syms(i))
      .toVector
  }

  test("islands closed form equals the greedy fold on random sequences") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = Vector("x", "y", "z")
    for (caseNo <- 1 to 500) {
      // biased generator: frequent same-symbol runs so stride-1 match
      // runs (the only non-trivial islands) appear constantly
      val len = 1 + rnd.nextInt(14)
      val syms = Vector.newBuilder[String]
      var last = alphabet(rnd.nextInt(3))
      syms += last
      for (_ <- 2 to len) {
        if (rnd.nextInt(10) < 6) () // repeat previous symbol
        else last = alphabet(rnd.nextInt(3))
        syms += last
      }
      val s = syms.result()
      val a = alphabet(rnd.nextInt(3))
      val b = alphabet(rnd.nextInt(3))
      assert(islandsMerge(s, a, b) == foldMerge(s, a, b),
        s"case $caseNo: merge ($a,$b) on ${s.mkString}")
    }
  }

  test("islands closed form on the canonical boundary shapes") {
    // odd/even same-symbol runs, isolated matches, back-to-back
    // distinct-pair matches sharing no symbol
    def v(s: String) = s.map(_.toString).toVector
    for ((s, a, b) <- Seq(
      ("llll", "l", "l"), ("lllll", "l", "l"), ("lll", "l", "l"),
      ("ll", "l", "l"), ("l", "l", "l"),
      ("abab", "a", "b"), ("aab", "a", "b"), ("abba", "b", "a"),
      ("aaabaaa", "a", "a"), ("ababa", "b", "a")))
      assert(islandsMerge(v(s), a, b) == foldMerge(v(s), a, b), s"$s ($a,$b)")
  }
}
