package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TestSpark
import graft.Tables._

/** The two write-time layouts must change the PLAN, not the answer:
  * the SMB join's inputs arrive pre-bucketed (zero exchanges below the
  * join), and the partitioned read's month predicate becomes a
  * partition filter over a one-directory-per-month layout. Answers are
  * oracle-gated; these tests pin the physical shapes the layouts exist
  * to buy.
  */
class LayoutSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("smb join equals the plain join and plans zero input exchanges") {
    val spark = TestSpark.spark
    val df = ScaleJoins.smbJoin(spark, dir)
    // inspect the plan BEFORE executing: post-execution AQE rewraps the
    // exchanges as query stages (and toString repeats the tree under
    // "== Initial Plan ==", which a string count would double-count)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // structural assertions (round 17, was toString matching): the
    // operator classes and FileSourceScanExec fields are the physical
    // facts themselves, stable across Spark's plan-formatting changes
    val p = plan.toString
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.nonEmpty, s"no SortMergeJoin in plan:\n$p")
    // the single exchange is the post-join aggregation; the join's
    // inputs come straight off the bucketed scans
    val exchanges = plan.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
    }.sum
    assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges:\n$p")
    // both inputs must be BUCKET-AWARE scans (output partitioning from
    // the bucket spec), not plain file scans that happen to be joined
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 2, s"expected 2 file scans, got ${scans.size}:\n$p")
    assert(scans.forall(f =>
      f.relation.bucketSpec.isDefined && f.bucketedScan),
      s"a join input planned as a non-bucketed scan:\n$p")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = lineitem(spark, dir)
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == plain)
  }

  test("partitioned read prunes to the selected month's directory") {
    val spark = TestSpark.spark
    val df = graft.tools.ParquetLayout.partitionedRead(spark, dir)
    assert(df.count() > 0)
    // structural assertions (round 17, was toString matching on
    // "PartitionFilters"/"DataFilters: []"): read the scan node's own
    // filter fields, which survive Spark formatting changes. collect
    // does not descend through the AQE wrapper — unwrap it first.
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"expected 1 file scan:\n$plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty &&
      scan.partitionFilters.mkString(",").contains("1996-03"),
      s"month predicate did not become a partition filter: " +
        s"${scan.partitionFilters}")
    // pure directory-level pruning: nothing left to evaluate per row
    assert(scan.dataFilters.isEmpty,
      s"month predicate leaked into the per-row data filters: " +
        s"${scan.dataFilters}")
    // the layout on disk is one directory per month, so pruning has
    // something to prune: the month directories exist
    val months = Option(new java.io.File(
        graft.tools.ParquetLayout.layoutDir(dir)).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("o_month="))
    assert(months.length > 12, s"expected >12 month dirs, got ${months.length}")
  }

  test("streaming file sink lands manifest-committed date partitions") {
    val spark = TestSpark.spark
    val got = graft.tools.ParquetLayout.streamPartitionedSink(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = events(spark, dir)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-15")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == batch)
    val out = new java.io.File(
      graft.tools.JsonlTools.dumpDir(dir, "stream_part"))
    val entries = Option(out.listFiles()).getOrElse(Array.empty).map(_.getName)
    assert(entries.contains("_spark_metadata"),
      s"file sink wrote no manifest: ${entries.mkString(",")}")
    val days = entries.count(_.startsWith("event_date="))
    assert(days >= 28, s"expected ~30 date partitions, got $days")
  }
}
