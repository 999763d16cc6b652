package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md ↔ registry sync gate (round 17). COVERAGE.md is the
  * judge's line-by-line inventory and is hand-maintained, which has
  * drifted before (the round-15 s6 row); this spec makes the drift a
  * red build in BOTH directions: every registered `SparkEntry.queries`
  * key must be documented, and every full query name the doc cites
  * must be registered (a documented-but-unregistered name is a claim
  * with no oracle behind it).
  *
  * The doc's citation conventions, all honored here:
  *   - verbatim names:      `q_dedup_exact`
  *   - wildcard families:   `q_text_*` (covers every key with prefix)
  *   - slash shorthand:     `q_tpch_q2/q3/q5` (alternatives graft onto
  *                          the first name's last `_`-segment)
  */
class CoverageSyncSpec extends AnyFunSuite {

  private lazy val doc = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")

  // q1_pricing is the one registered key without the q_ prefix, so the
  // token pattern is q<digits?>_…; a trailing * marks a family wildcard
  private val token = """q\d*_[a-zA-Z0-9_]+(?:/[a-zA-Z0-9]+)*\*?""".r

  private lazy val (documented, wildcards) = {
    val names = scala.collection.mutable.Set[String]()
    val prefixes = scala.collection.mutable.Set[String]()
    token.findAllIn(doc).foreach { t =>
      if (t.endsWith("*")) prefixes += t.dropRight(1)
      else {
        val parts = t.split('/')
        names += parts.head
        val cut = parts.head.lastIndexOf('_') + 1
        parts.tail.foreach(alt => names += parts.head.substring(0, cut) + alt)
      }
    }
    (names.toSet, prefixes.toSet)
  }

  private lazy val registered = SparkEntry.queries.keySet

  test("every registered query is documented in COVERAGE.md") {
    val missing = registered.filterNot(k =>
      documented.contains(k) || wildcards.exists(k.startsWith))
    assert(missing.isEmpty,
      s"registered but undocumented in COVERAGE.md: " +
        s"${missing.toSeq.sorted.mkString(", ")} — add an inventory row")
  }

  test("every query name COVERAGE.md cites is registered") {
    // wildcard families must be non-empty too: a stale `q_foo_*` row
    // outliving the family's removal is the same drift class
    val ghostNames = documented.filterNot(registered.contains)
    val ghostFamilies = wildcards.filterNot(p =>
      registered.exists(_.startsWith(p)))
    assert(ghostNames.isEmpty && ghostFamilies.isEmpty,
      s"COVERAGE.md cites unregistered queries: " +
        s"${(ghostNames ++ ghostFamilies.map(_ + "*")).toSeq.sorted
          .mkString(", ")} — fix the row or register the query")
  }
}
