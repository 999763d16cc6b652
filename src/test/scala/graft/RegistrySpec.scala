package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: module maps must not shadow each other,
  * every oracle must have a query, and the flagship must return rows.
  */
class RegistrySpec extends AnyFunSuite {

  test("no query name collides across modules") {
    val perModule = Seq(
      operators.Relational.queries.keySet,
      operators.TpchStyle.queries.keySet,
      operators.EtlOps.queries.keySet,
      operators.Windows.queries.keySet,
      operators.StreamToolOps.queries.keySet,
      operators.AsofJoin.queries.keySet,
      operators.ScaleJoins.queries.keySet,
      operators.GraphOps.queries.keySet,
      operators.FunctionOps.queries.keySet,
      ops.Dedup.queries.keySet,
      ops.Similarity.queries.keySet,
      ops.TextAnalysis.queries.keySet,
      ops.Multimodal.queries.keySet,
      ops.Curation.queries.keySet)
    val total = perModule.map(_.size).sum
    assert(total == SparkEntry.queries.size,
      s"name collision: modules declare $total, registry has ${SparkEntry.queries.size}")
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows") {
    val n = SparkEntry.entry(graft.etl.TestSpark.spark).count()
    assert(n > 0)
  }
}
