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
    val p = plan.toString
    assert(p.contains("SortMergeJoin"), p)
    // the single exchange is the post-join aggregation; the join's
    // inputs come straight off the bucketed scans (SelectedBucketsCount
    // proves the scans are bucket-aware, not plain file scans)
    val exchanges = plan.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
    }.sum
    assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges:\n$p")
    assert(p.contains("SelectedBucketsCount"), p)
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
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("1996-03"),
      s"month predicate did not become a partition filter:\n$p")
    // pure directory-level pruning: nothing left to evaluate per row
    assert(p.contains("DataFilters: []"),
      s"month predicate leaked into the per-row data filters:\n$p")
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
