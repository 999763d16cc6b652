package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark

/** The mergeSchema read must union the two parquet generations into
  * one evolved schema, null-fill the legacy rows' missing column, and
  * lose nothing — counts and char mass reconcile exactly with the
  * original table.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("merged scan reconciles exactly with the unsplit table") {
    val s = TestSpark.spark
    val audit = graft.tools.SchemaEvolution.roundTrip(s, dir)
      .agg(sum("n_docs"), sum("n_legacy"), sum("n_evolved"),
        sum("sum_chars")).collect()(0)
    val docs = graft.Tables.documents(s, dir)
    val base = docs.agg(count(lit(1)),
      sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)),
      sum(col("n_chars"))).collect()(0)
    assert(audit.getLong(0) == base.getLong(0))
    assert(audit.getLong(1) == base.getLong(1))
    assert(audit.getLong(2) == base.getLong(0) - base.getLong(1))
    assert(audit.getLong(3) == base.getLong(2))
  }

  test("legacy rows null-fill the evolved column; evolved rows keep it") {
    val s = TestSpark.spark
    // re-stage via the op, then inspect the merged frame row-level
    graft.tools.SchemaEvolution.roundTrip(s, dir).collect()
    val base = graft.tools.JsonlTools.dumpDir(dir, "schevo")
    val merged = s.read.option("mergeSchema", "true")
      .parquet(base + "/gen1", base + "/gen2")
    assert(merged.columns.toSet == Set("doc_id", "source", "n_chars", "lang"))
    assert(merged.filter(col("doc_id") % 2 === 0
      && col("lang").isNotNull).count() == 0)
    assert(merged.filter(col("doc_id") % 2 === 1
      && col("lang").isNull).count() == 0)
  }
}
