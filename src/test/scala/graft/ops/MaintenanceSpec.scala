package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.Tables._

/** The maintenance planners' contracts beyond the DuckDB oracle:
  * the MV merge must equal the full recompute (the algebraic-merge
  * identity), a compaction bin must never be fed more than one
  * target's worth of bytes beyond its last file's start, and the
  * date-clustered layout must dominate the hash layout on skipping —
  * otherwise the audit would recommend rewrites that don't pay.
  */
class MaintenanceSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("mv merge of base+delta partials equals the full recompute") {
    val spark = TestSpark.spark
    val merged = Maintenance.mvMerge(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val full = orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_total"),
        max(dec(col("o_totalprice"))).cast("double").as("max_total"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(merged == full)
  }

  test("compaction bins are contiguous from 0 and respect the fill rule") {
    val spark = TestSpark.spark
    val plan = Maintenance.compactionPlan(spark, dir)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.nonEmpty)
    assert(plan.map(_._1).toSeq == (0L until plan.length).toSeq,
      "bins must be the contiguous prefix 0..n-1 (no empty bins under bin-fill)")
    // bin-fill invariant: a bin holds at most target bytes plus the
    // overhang of its final file (which STARTED inside the target span)
    val target = 8000000L
    plan.foreach { case (bin, nFiles, bytes) =>
      assert(nFiles > 0)
      assert(bytes < 2 * target, s"bin $bin grossly overfilled: $bytes")
    }
    // conservation: bins partition the small-file inventory exactly
    val invBytes = Maintenance.inventory(spark, dir)
      .filter(col("size_bytes") < target)
      .agg(sum("size_bytes")).collect()(0).getLong(0)
    assert(invBytes == plan.map(_._3).sum)
  }

  test("skipping strictly orders clustered > zordered > hashed") {
    val spark = TestSpark.spark
    val rows = Maintenance.skippingAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (cChunks, cSkip, cRows) = rows("clustered")
    val (zChunks, _, zRows) = rows("zordered")
    val (hChunks, _, hRows) = rows("hashed")
    assert(cChunks > 0 && zChunks > 0 && hChunks > 0)
    // month-clustered zone maps skip every chunk outside the 3-month
    // predicate window; z-cells keep coarse date bands (partial skip);
    // hash chunks span the full date range so their stats can exclude
    // (essentially) nothing
    assert(cSkip.toDouble / cChunks > 0.9,
      s"clustered layout should skip >90% of chunks, got $cSkip/$cChunks")
    assert(cRows > zRows && zRows > hRows,
      s"skipped-row order violated: clustered=$cRows zordered=$zRows hashed=$hRows")
  }
}
