package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** The banded kernel must agree with the full DP for every (pair, k) —
  * band clipping and the early exit are pure optimizations, never a
  * semantics change.
  */
class EditWithinExprSpec extends AnyFunSuite {

  private def full(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    dp(a.length)(b.length)
  }

  private def within(a: String, b: String, k: Int): Boolean =
    EditWithinExpr.kernel(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("edge cases") {
    assert(within("", "", 0))
    assert(within("", "a", 1) && !within("", "ab", 1))
    assert(within("abc", "abc", 0))
    assert(!within("abc", "abd", 0) && within("abc", "abd", 1))
    assert(within("abc", "ac", 1))  // deletion
    assert(within("abc", "abxc", 1)) // insertion
    assert(!within("abc", "xbz", 1) && within("abc", "xbz", 2))
    assert(within("käße", "käse", 1)) // BMP unicode, substitution
  }

  test("agrees with the full DP on 2000 seeded random pairs, k in 0..3") {
    val rnd = new scala.util.Random(42)
    val alpha = "ab01#"
    def word(): String =
      Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
    (1 to 2000).foreach { _ =>
      val (a, b) = (word(), word())
      val d = full(a, b)
      (0 to 3).foreach { k =>
        assert(within(a, b, k) == (d <= k),
          s"a='$a' b='$b' k=$k full=$d banded=${within(a, b, k)}")
      }
    }
  }

  test("SQL registration evaluates inside codegen") {
    val spark = graft.etl.TestSpark.spark
    EditWithinExpr.register(spark)
    val got = spark.sql(
      """SELECT graft_edit_within('kitten', 'sitten', 1) AS a,
        |       graft_edit_within('kitten', 'sitting', 1) AS b""".stripMargin)
      .collect().head
    assert(got.getBoolean(0) && !got.getBoolean(1))
  }
}
