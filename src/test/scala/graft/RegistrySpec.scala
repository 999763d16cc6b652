package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: module maps must not shadow each other,
  * every oracle must have a query, and the flagship must return rows.
  */
class RegistrySpec extends AnyFunSuite {

  test("no query name collides across modules") {
    // derived from the registry's own module list so adding a module
    // cannot silently shadow another's query names
    val total = SparkEntry.modules.map(_._1.size).sum
    assert(total == SparkEntry.queries.size,
      s"name collision: modules declare $total, registry has ${SparkEntry.queries.size}")
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracle-gated (no rows-only checks)") {
    // the engine's standing invariant since round 4: 100% of the
    // registered surface hash-compares against DuckDB — a new query
    // without an oracle silently downgrades its own gate to rows-only,
    // which this pins against
    val unguarded = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unguarded.isEmpty, s"queries without oracles: $unguarded")
  }

  test("README's stated query count equals the registry (no hand-drift)") {
    // rounds 11 and 12 both shipped a hand-written count that new
    // queries outran mid-round; same discipline as ScalingDocSpec —
    // a number the code can check, the code checks
    val p = java.nio.file.Paths.get("README.md")
    assume(java.nio.file.Files.exists(p), "no README.md (not repo root?)")
    val readme = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val m = "(\\d+) registered queries".r.findFirstMatchIn(readme)
      .getOrElse(fail("README lost the 'N registered queries' phrase " +
        "this spec pins — keep the phrase or update the pin"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} registered queries, registry has " +
        s"${SparkEntry.queries.size} — update README.md")
  }

  test("flagship entry returns rows") {
    val n = SparkEntry.entry(graft.etl.TestSpark.spark).count()
    assert(n > 0)
  }
}
